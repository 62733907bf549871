package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.MultiModal

class MultiModalSpec extends AnyFunSuite with SparkSpec {

  test("media table synthesizes typed binary records") {
    val m = MultiModal.mediaTable(spark, sf)
    assert(m.count() === 500)
    val r = m.head()
    assert(r.payload.nonEmpty)
    assert(Set("image", "audio", "video")(r.format))
  }

  test("feature extraction is deterministic and complete") {
    val f1 = MultiModal.extractFeatures(MultiModal.mediaTable(spark, sf))
      .collect().map(f => f.media_id -> f).toMap
    val f2 = MultiModal.extractFeatures(MultiModal.mediaTable(spark, sf))
      .collect().map(f => f.media_id -> f).toMap
    assert(f1.size === 500)
    assert(f1.keySet === f2.keySet)
    for ((id, f) <- f1) {
      assert(f.n_bytes > 0)
      assert(f.mean_byte > 0.0)
      assert(f.head_hex === f2(id).head_hex)
    }
  }

  test("decodeImages: real PNG/BMP pixel decode with exact channel/luma means") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    import spark.implicits._

    // fixture images rendered HERE, pixel by pixel — the expected
    // stats are recomputed below from the same pixel function, so the
    // decode path (magic sniff → ImageIO → bulk getRGB → integer
    // sums) is pinned byte-exactly end to end. PNG and BMP are
    // lossless RGB containers, so encode→decode must round-trip.
    def render(w: Int, h: Int, f: (Int, Int) => Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
      img
    }
    def bytesOf(img: BufferedImage, fmt: String): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, bos), s"no $fmt writer in this JDK")
      bos.toByteArray
    }
    def expected(w: Int, h: Int, f: (Int, Int) => Int): (Double, Double, Double, Double) = {
      var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val p = f(x, y)
        val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
        sr += r; sg += g; sb += b; sl += 299L * r + 587L * g + 114L * b
      }
      val n = (w * h).toDouble
      (sr / n, sg / n, sb / n, sl / (1000.0 * n))
    }

    val pxPng = (x: Int, y: Int) => ((x * 50) << 16) | ((y * 60) << 8) | (x * 20 + y * 30)
    val pxBmp = (x: Int, y: Int) => ((255 - x * 3) << 16) | ((x * 7 % 256) << 8) | (y * 11 % 256)
    val recs = Seq(
      MultiModal.MediaRecord(1L, "image", bytesOf(render(5, 4, pxPng), "png")),
      MultiModal.MediaRecord(2L, "image", bytesOf(render(7, 3, pxBmp), "bmp")),
      MultiModal.MediaRecord(3L, "audio", "definitely not an image".getBytes("UTF-8")),
      MultiModal.MediaRecord(4L, "image",
        Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
          Array.fill[Byte](16)(0x7f)))
    val out = MultiModal.decodeImages(spark.createDataset(recs))
      .collect().map(s => s.media_id -> s).toMap

    val (r1, g1, b1, l1) = expected(5, 4, pxPng)
    assert(out(1L).codec === "png" && out(1L).width === 5 && out(1L).height === 4)
    assert((out(1L).mean_r, out(1L).mean_g, out(1L).mean_b, out(1L).mean_luma)
      === ((r1, g1, b1, l1)), "PNG pixel means must be exact")

    val (r2, g2, b2, l2) = expected(7, 3, pxBmp)
    assert(out(2L).codec === "bmp" && out(2L).width === 7 && out(2L).height === 3)
    assert((out(2L).mean_r, out(2L).mean_g, out(2L).mean_b, out(2L).mean_luma)
      === ((r2, g2, b2, l2)), "BMP pixel means must be exact")

    // non-image payloads quarantine, they don't fail the batch
    assert(out(3L).codec === "unknown" && out(3L).width === 0)
    assert(out(4L).codec === "corrupt" && out(4L).width === 0)

    // the synthetic corpus payloads are utf-8 text: every row flows
    // through as unknown — the mixed-corpus contract
    val corpus = MultiModal.decodeImages(MultiModal.mediaTable(spark, sf))
      .collect()
    assert(corpus.length === 500)
    assert(corpus.forall(_.codec === "unknown"))
  }

  test("frame sampling emits every 4th 64-byte chunk of video payloads") {
    val media = MultiModal.mediaTable(spark, sf)
    val videos = media.filter(_.format == "video").collect()
    val frames = MultiModal.sampleFrames(media).collect()
    val perMedia = frames.groupBy(_.media_id)
    assert(perMedia.keySet === videos.map(_.media_id).toSet)
    for (v <- videos) {
      val nChunks = (v.payload.length + 63) / 64
      val expected = (0 until nChunks).count(_ % 4 == 0)
      assert(perMedia(v.media_id).length === expected)
    }
  }

  test("decodeAudio: real WAV sample decode with exact PCM statistics") {
    import java.io.ByteArrayOutputStream
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    import spark.implicits._

    // fixture audio rendered HERE, sample by sample: a deterministic
    // 16-bit signed PCM ramp written through the JDK's own WAV writer,
    // with the expected peak / mean|s| / rms recomputed from the same
    // sample function — pins the decode path (magic sniff →
    // AudioSystem → PCM16 normalize → integer sums) end to end. WAV
    // PCM is lossless, so encode→decode must round-trip the samples.
    def samples(n: Int): Array[Short] =
      Array.tabulate(n)(i => ((i * 257) % 20001 - 10000).toShort)
    def wavBytes(s: Array[Short], rate: Float, channels: Int): Array[Byte] = {
      val bytes = new Array[Byte](2 * s.length)
      for (i <- s.indices) {
        bytes(2 * i) = (s(i) & 0xff).toByte
        bytes(2 * i + 1) = ((s(i) >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16,
        channels, 2 * channels, rate, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt,
        s.length / channels)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    def expected(s: Array[Short]): (Int, Double, Double) = {
      var sAbs = 0L; var sSq = 0L; var peak = 0
      for (v <- s) {
        val a = math.abs(v.toInt)
        if (a > peak) peak = a
        sAbs += a; sSq += v.toLong * v
      }
      (peak, sAbs.toDouble / s.length, math.sqrt(sSq.toDouble / s.length))
    }

    val mono = samples(480)
    val stereo = samples(400) // 200 frames x 2 channels
    val recs = Seq(
      MultiModal.MediaRecord(1L, "audio", wavBytes(mono, 8000f, 1)),
      MultiModal.MediaRecord(2L, "audio", wavBytes(stereo, 44100f, 2)),
      MultiModal.MediaRecord(3L, "image", "not audio at all".getBytes("UTF-8")),
      MultiModal.MediaRecord(4L, "audio",
        "RIFFxxxxWAVE then garbage that is no wav chunk".getBytes("UTF-8")))
    val out = MultiModal.decodeAudio(spark.createDataset(recs))
      .collect().map(s => s.media_id -> s).toMap

    val (p1, m1, r1) = expected(mono)
    assert(out(1L).codec === "wav" && out(1L).sample_rate === 8000 &&
      out(1L).channels === 1 && out(1L).n_frames === 480L)
    assert((out(1L).peak, out(1L).mean_abs, out(1L).rms) === ((p1, m1, r1)),
      "mono PCM stats must be exact")

    val (p2, m2, r2) = expected(stereo)
    assert(out(2L).codec === "wav" && out(2L).sample_rate === 44100 &&
      out(2L).channels === 2 && out(2L).n_frames === 200L)
    assert((out(2L).peak, out(2L).mean_abs, out(2L).rms) === ((p2, m2, r2)),
      "stereo PCM stats must be exact")

    // quarantine rows tag, they don't fail the batch
    assert(out(3L).codec === "unknown" && out(3L).n_frames === 0L)
    assert(out(4L).codec === "corrupt" && out(4L).n_frames === 0L)

    // the synthetic corpus payloads are utf-8 text: all quarantine
    val corpus = MultiModal.decodeAudio(MultiModal.mediaTable(spark, sf)).collect()
    assert(corpus.length === 500 && corpus.forall(_.codec === "unknown"))
  }
}
