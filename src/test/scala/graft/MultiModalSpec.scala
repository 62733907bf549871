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

  // ---- AVI fixture writer: minimal RIFF/AVI-1.0 layout, rendered
  // HERE byte by byte so the video tests pin the container walk
  // (avih/strh/strf/movi) against a structure the test controls ----
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def cc(s: String): Array[Byte] = {
    assert(s.length == 4); s.getBytes("ISO-8859-1")
  }
  private def chunk(id: String, data: Array[Byte]): Array[Byte] =
    cc(id) ++ le32(data.length.toLong) ++ data ++
      (if (data.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
  private def riffList(tpe: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", cc(tpe) ++ body)

  /** frames are raw chunk payloads; compression = le32(0) for BI_RGB
    * or cc("MJPG"); biHeight may be negative (top-down DIB).
    */
  private def aviBytes(frames: Seq[Array[Byte]], w: Int, h: Int,
      usPerFrame: Long, handler: String, bitCount: Int,
      compression: Array[Byte], frameId: String, biHeight: Int): Array[Byte] = {
    val avih = le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames.length.toLong) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w.toLong) ++ le32(h.toLong) ++ Array.fill(16)(0.toByte)
    val strh = cc("vids") ++ cc(handler) ++ le32(0) ++ le16(0) ++ le16(0) ++
      le32(0) ++ le32(1) ++ le32(25) ++ le32(0) ++
      le32(frames.length.toLong) ++ le32(0) ++ le32(0) ++ le32(0) ++
      Array.fill(12)(0.toByte)
    val strf = le32(40) ++ le32(w.toLong) ++ le32(biHeight.toLong & 0xffffffffL) ++
      le16(1) ++ le16(bitCount) ++ compression ++ Array.fill(20)(0.toByte)
    val hdrl = riffList("hdrl", chunk("avih", avih) ++
      riffList("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = riffList("movi",
      frames.flatMap(f => chunk(frameId, f)).toArray)
    val body = cc("AVI ") ++ hdrl ++ movi
    cc("RIFF") ++ le32(body.length.toLong) ++ body
  }

  private def pixelSums(w: Int, h: Int, f: (Int, Int) => Int): (Double, Double, Double, Double) = {
    var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val p = f(x, y)
      val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
      sr += r; sg += g; sb += b; sl += 299L * r + 587L * g + 114L * b
    }
    val n = (w * h).toDouble
    (sr / n, sg / n, sb / n, sl / (1000.0 * n))
  }

  test("decodeVideoMeta/decodeVideoFrames: AVI-MJPEG container parse + sampled JPEG decode") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    import spark.implicits._

    // five JPEG frames rendered here; expected stats come from an
    // INDEPENDENT ImageIO decode of the same frame bytes below, so
    // the pipeline is pinned end to end (chunk walk → sample → decode
    // → integer sums) without assuming JPEG losslessness
    def frameImg(k: Int): BufferedImage = {
      val img = new BufferedImage(16, 12, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 12; x <- 0 until 16)
        img.setRGB(x, y, ((x * 16 + k * 40) % 256 << 16) |
          ((y * 21) % 256 << 8) | ((x * 7 + y * 5 + k * 11) % 256))
      img
    }
    def jpegOf(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, "jpg", bos), "no jpg writer in this JDK")
      bos.toByteArray
    }
    val jpegs = (0 until 5).map(k => jpegOf(frameImg(k)))
    val payload = aviBytes(jpegs, 16, 12, 40000L, "MJPG", 24,
      cc("MJPG"), "00dc", 12)
    val recs = Seq(
      MultiModal.MediaRecord(1L, "video", payload),
      MultiModal.MediaRecord(2L, "video", "no container here".getBytes("UTF-8")),
      MultiModal.MediaRecord(3L, "video",
        ("RIFF" + " " * 4 + "AVI " + "garbage beyond the magic x").getBytes("ISO-8859-1")))
    val ds = spark.createDataset(recs)

    val meta = MultiModal.decodeVideoMeta(ds).collect().map(m => m.media_id -> m).toMap
    assert(meta(1L).codec === "avi" && meta(1L).width === 16 && meta(1L).height === 12)
    assert(meta(1L).fps === 25.0 && meta(1L).n_frames === 5L && meta(1L).n_chunks === 5)
    assert(meta(2L).codec === "unknown")
    assert(meta(3L).codec === "corrupt")

    val frames = MultiModal.decodeVideoFrames(ds, every = 2).collect()
    assert(frames.map(_.media_id).toSet === Set(1L), "only the real AVI emits frames")
    assert(frames.map(_.frame_idx).sorted.toSeq === Seq(0, 2, 4),
      "every 2nd chunk sampled")
    for (f <- frames) {
      assert(f.frame_codec === "mjpeg" && f.width === 16 && f.height === 12)
      val img = ImageIO.read(new java.io.ByteArrayInputStream(jpegs(f.frame_idx)))
      val px = img.getRGB(0, 0, 16, 12, null, 0, 16)
      val (er, eg, eb, el) = pixelSums(16, 12, (x, y) => px(y * 16 + x))
      assert((f.mean_r, f.mean_g, f.mean_b, f.mean_luma) === ((er, eg, eb, el)),
        s"frame ${f.frame_idx} stats must be exact")
    }

    // the synthetic corpus payloads are utf-8 text: metadata
    // quarantines every row, the frame pass emits nothing
    val corpus = MultiModal.mediaTable(spark, sf)
    assert(MultiModal.decodeVideoMeta(corpus).collect().forall(_.codec === "unknown"))
    assert(MultiModal.decodeVideoFrames(corpus).isEmpty)
  }

  test("decodeVideoFrames: uncompressed 24-bit DIB frames decode byte-exactly") {
    import spark.implicits._

    // lossless fixture: raw BGR rows packed here from a pixel
    // function, expected means recomputed from the same function —
    // the DIB leg's decode is pinned byte-exactly (the MJPEG test
    // can't do this because JPEG is lossy)
    val w = 7; val h = 5
    def px(k: Int)(x: Int, y: Int): Int =
      (((x * 31 + k) % 256) << 16) | (((y * 47 + 2 * k) % 256) << 8) |
        ((x * 13 + y * 17) % 256)
    def dibFrame(f: (Int, Int) => Int, topDown: Boolean): Array[Byte] = {
      val rowSize = ((w * 3 + 3) / 4) * 4
      val out = new Array[Byte](rowSize * h)
      for (y <- 0 until h; x <- 0 until w) {
        val p = f(x, y)
        val storedRow = if (topDown) y else h - 1 - y
        val o = storedRow * rowSize + x * 3
        out(o) = (p & 0xff).toByte            // B
        out(o + 1) = ((p >> 8) & 0xff).toByte // G
        out(o + 2) = ((p >> 16) & 0xff).toByte // R
      }
      out
    }

    val bottomUp = aviBytes(Seq(dibFrame(px(0), topDown = false),
      dibFrame(px(1), topDown = false)), w, h, 100000L, "DIB ", 24,
      le32(0), "00db", h)
    val topDown = aviBytes(Seq(dibFrame(px(2), topDown = true)), w, h,
      100000L, "DIB ", 24, le32(0), "00db", -h)
    // 32-bit claims quarantine at frame level, not batch level
    val odd = aviBytes(Seq(Array.fill(w * h * 4)(3.toByte)), w, h,
      100000L, "DIB ", 32, le32(0), "00db", h)
    val ds = spark.createDataset(Seq(
      MultiModal.MediaRecord(1L, "video", bottomUp),
      MultiModal.MediaRecord(2L, "video", topDown),
      MultiModal.MediaRecord(3L, "video", odd)))

    val out = MultiModal.decodeVideoFrames(ds, every = 1).collect()
      .map(f => (f.media_id, f.frame_idx) -> f).toMap
    assert(out.size === 4)
    for ((id, k) <- Seq((1L, 0), (1L, 1), (2L, 0))) {
      val f = out((id, k.toInt))
      val fn: (Int, Int) => Int = if (id == 2L) px(2) else px(k)
      assert(f.frame_codec === "rgb24" && f.width === w && f.height === h)
      assert((f.mean_r, f.mean_g, f.mean_b, f.mean_luma) === pixelSums(w, h, fn),
        s"DIB frame ($id,$k) stats must be exact")
    }
    assert(out((3L, 0)).frame_codec === "unsupported")

    val meta = MultiModal.decodeVideoMeta(ds).collect().map(m => m.media_id -> m).toMap
    assert(meta(1L).n_chunks === 2 && meta(2L).n_chunks === 1)
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

  // ---- ISO-BMFF fixture writer: minimal MP4 layout, rendered HERE
  // byte by byte so the MP4 tests pin the box-tree walk (ftyp/moov/
  // trak/mdia/stbl + stsd/stts/stsc/stsz/stco) against a structure the
  // test controls — the same discipline as the AVI fixtures ----
  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def mbox(tpe: String, data: Array[Byte]): Array[Byte] =
    be32(data.length + 8L) ++ cc(tpe) ++ data
  private def zeros(n: Int): Array[Byte] = Array.fill(n)(0.toByte)

  test("decodeMp4Meta/decodeMp4Frames: ISO-BMFF box walk + sampled JPEG decode") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    import spark.implicits._

    // five JPEG samples rendered here, split 2+3 across two chunks so
    // the stsc run expansion (chunk 1 carries 2 samples, chunks 2+
    // carry 3) and the within-chunk cumulative offsets are both
    // exercised; expected stats come from an INDEPENDENT ImageIO
    // decode of the same sample bytes
    def frameImg(k: Int): BufferedImage = {
      val img = new BufferedImage(16, 12, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 12; x <- 0 until 16)
        img.setRGB(x, y, ((x * 9 + k * 31) % 256 << 16) |
          ((y * 19 + k) % 256 << 8) | ((x * 3 + y * 11 + k * 7) % 256))
      img
    }
    def jpegOf(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, "jpg", bos), "no jpg writer in this JDK")
      bos.toByteArray
    }
    val jpegs = (0 until 5).map(k => jpegOf(frameImg(k)))

    val ftyp = mbox("ftyp", cc("isom") ++ be32(512) ++ cc("isom") ++ cc("mp41"))
    val mdat = mbox("mdat", jpegs.reduce(_ ++ _))
    val base = ftyp.length + 8L // first sample's absolute offset
    val chunk2Off = base + jpegs(0).length + jpegs(1).length

    val mvhd = mbox("mvhd",
      be32(0) ++ be32(0) ++ be32(0) ++ be32(1000) ++ be32(200) ++ zeros(80))
    // an AUDIO track FIRST: its mdhd timing must not leak into the
    // video metadata, and its (empty) stbl must be skipped by the
    // vide-handler gate
    val audioTrak = mbox("trak", mbox("mdia",
      mbox("mdhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(44100) ++
        be32(88200) ++ zeros(4)) ++
      mbox("hdlr", be32(0) ++ be32(0) ++ cc("soun") ++ zeros(12)) ++
      mbox("minf", mbox("stbl", Array.empty[Byte]))))
    val stsdEntry = be32(86) ++ cc("jpeg") ++ zeros(6) ++ be16(1) ++
      zeros(16) ++ be16(16) ++ be16(12) ++ zeros(50)
    val stbl = mbox("stbl",
      mbox("stsd", be32(0) ++ be32(1) ++ stsdEntry) ++
      mbox("stts", be32(0) ++ be32(1) ++ be32(5) ++ be32(3600)) ++
      mbox("stsc", be32(0) ++ be32(2) ++
        be32(1) ++ be32(2) ++ be32(1) ++
        be32(2) ++ be32(3) ++ be32(1)) ++
      mbox("stsz", be32(0) ++ be32(0) ++ be32(5) ++
        jpegs.flatMap(j => be32(j.length.toLong)).toArray) ++
      mbox("stco", be32(0) ++ be32(2) ++ be32(base) ++ be32(chunk2Off)))
    val videoTrak = mbox("trak",
      mbox("tkhd", zeros(84)) ++
      mbox("mdia",
        mbox("mdhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(90000) ++
          be32(18000) ++ zeros(4)) ++
        mbox("hdlr", be32(0) ++ be32(0) ++ cc("vide") ++ zeros(12)) ++
        mbox("minf", stbl)))
    val moov = mbox("moov", mvhd ++ audioTrak ++ videoTrak)
    val payload = ftyp ++ mdat ++ moov

    val recs = Seq(
      MultiModal.MediaRecord(1L, "video", payload),
      MultiModal.MediaRecord(2L, "video", "no container here".getBytes("UTF-8")),
      // valid ftyp, then a box whose declared size overruns the file
      MultiModal.MediaRecord(3L, "video",
        ftyp ++ be32(1 << 30) ++ cc("moov") ++ zeros(8)))
    val ds = spark.createDataset(recs)

    val meta = MultiModal.decodeMp4Meta(ds).collect().map(m => m.media_id -> m).toMap
    assert(meta(1L).codec === "mp4" && meta(1L).brand === "isom")
    assert(meta(1L).sample_codec === "jpeg")
    assert(meta(1L).width === 16 && meta(1L).height === 12)
    // video mdhd: 18000 / 90000 = 0.2 s; 5 samples -> 25 fps (the
    // audio track's 44100/88200 must NOT be what shows here)
    assert(meta(1L).duration_s === 0.2 && meta(1L).fps === 25.0)
    assert(meta(1L).n_samples === 5)
    assert(meta(2L).codec === "unknown")
    assert(meta(3L).codec === "corrupt")

    val frames = MultiModal.decodeMp4Frames(ds, every = 2).collect()
    assert(frames.map(_.media_id).toSet === Set(1L), "only the real MP4 emits frames")
    assert(frames.map(_.frame_idx).sorted.toSeq === Seq(0, 2, 4),
      "every 2nd sample decoded")
    for (f <- frames) {
      assert(f.frame_codec === "mjpeg" && f.width === 16 && f.height === 12)
      val img = ImageIO.read(new java.io.ByteArrayInputStream(jpegs(f.frame_idx)))
      val px = img.getRGB(0, 0, 16, 12, null, 0, 16)
      val (er, eg, eb, el) = pixelSums(16, 12, (x, y) => px(y * 16 + x))
      assert((f.mean_r, f.mean_g, f.mean_b, f.mean_luma) === ((er, eg, eb, el)),
        s"sample ${f.frame_idx} stats must be exact")
    }

    // a non-ImageIO sample table (avc1) quarantines at frame level
    // with the container still parsing: same fixture, codec swapped
    val stblAvc = mbox("stbl",
      mbox("stsd", be32(0) ++ be32(1) ++
        (be32(86) ++ cc("avc1") ++ zeros(6) ++ be16(1) ++
          zeros(16) ++ be16(16) ++ be16(12) ++ zeros(50))) ++
      mbox("stsc", be32(0) ++ be32(1) ++ be32(1) ++ be32(5) ++ be32(1)) ++
      mbox("stsz", be32(0) ++ be32(0) ++ be32(5) ++
        jpegs.flatMap(j => be32(j.length.toLong)).toArray) ++
      mbox("stco", be32(0) ++ be32(1) ++ be32(base)))
    val avcPayload = ftyp ++ mdat ++ mbox("moov", mvhd ++ mbox("trak",
      mbox("mdia",
        mbox("mdhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(90000) ++
          be32(18000) ++ zeros(4)) ++
        mbox("hdlr", be32(0) ++ be32(0) ++ cc("vide") ++ zeros(12)) ++
        mbox("minf", stblAvc))))
    val dsAvc = spark.createDataset(Seq(
      MultiModal.MediaRecord(9L, "video", avcPayload)))
    val metaAvc = MultiModal.decodeMp4Meta(dsAvc).collect().head
    assert(metaAvc.codec === "mp4" && metaAvc.sample_codec === "avc1")
    // frames still sniff as JPEG bytes here (the fixture reuses jpeg
    // payloads), so force the unsupported path with non-JPEG samples
    val rawMdat = mbox("mdat", zeros(500))
    val rawBase = ftyp.length + 8L
    val rawPayload = ftyp ++ rawMdat ++ mbox("moov", mvhd ++ mbox("trak",
      mbox("mdia",
        mbox("mdhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(90000) ++
          be32(18000) ++ zeros(4)) ++
        mbox("hdlr", be32(0) ++ be32(0) ++ cc("vide") ++ zeros(12)) ++
        mbox("minf", mbox("stbl",
          mbox("stsd", be32(0) ++ be32(1) ++
            (be32(86) ++ cc("avc1") ++ zeros(6) ++ be16(1) ++
              zeros(16) ++ be16(16) ++ be16(12) ++ zeros(50))) ++
          mbox("stsc", be32(0) ++ be32(1) ++ be32(1) ++ be32(5) ++ be32(1)) ++
          mbox("stsz", be32(0) ++ be32(100) ++ be32(5)) ++
          mbox("stco", be32(0) ++ be32(1) ++ be32(rawBase)))))))
    val rawFrames = MultiModal.decodeMp4Frames(spark.createDataset(Seq(
      MultiModal.MediaRecord(10L, "video", rawPayload))), every = 1).collect()
    assert(rawFrames.length === 5 &&
      rawFrames.forall(_.frame_codec === "unsupported"))

    // the synthetic corpus payloads are utf-8 text: metadata
    // quarantines every row, the frame pass emits nothing
    val corpus = MultiModal.mediaTable(spark, sf)
    assert(MultiModal.decodeMp4Meta(corpus).collect().forall(_.codec === "unknown"))
    assert(MultiModal.decodeMp4Frames(corpus).isEmpty)
  }

  test("decodeMp4: version-1 timing boxes, 64-bit sizes, and co64 offsets parse identically") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    import spark.implicits._

    def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    // a box carrying the size==1 + 64-bit largesize header form
    def mbox64(tpe: String, data: Array[Byte]): Array[Byte] =
      be32(1) ++ cc(tpe) ++ be64(data.length + 16L) ++ data

    def jpegOf(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, "jpg", bos), "no jpg writer in this JDK")
      bos.toByteArray
    }
    val img = new BufferedImage(8, 6, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 8)
      img.setRGB(x, y, ((x * 30) % 256 << 16) | ((y * 40) % 256 << 8) | 77)
    val jpegs = (0 until 3).map(_ => jpegOf(img))

    val ftyp = mbox("ftyp", cc("iso6") ++ be32(0) ++ cc("iso6"))
    // mdat in the 64-bit-size header form: sample offsets shift by the
    // extra 8 header bytes, which co64 must carry exactly
    val mdat = mbox64("mdat", jpegs.reduce(_ ++ _))
    val base = ftyp.length + 16L
    // mvhd/mdhd VERSION 1: 64-bit creation/modification/duration,
    // timescale at +20, duration at +24
    val mvhd = mbox("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
      be32(1000) ++ be64(400) ++ zeros(80))
    val mdhd = mbox("mdhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
      be32(30000) ++ be64(3000) ++ zeros(4))
    val stsdEntry = be32(86) ++ cc("jpeg") ++ zeros(6) ++ be16(1) ++
      zeros(16) ++ be16(8) ++ be16(6) ++ zeros(50)
    val stbl = mbox("stbl",
      mbox("stsd", be32(0) ++ be32(1) ++ stsdEntry) ++
      mbox("stsc", be32(0) ++ be32(1) ++ be32(1) ++ be32(3) ++ be32(1)) ++
      mbox("stsz", be32(0) ++ be32(0) ++ be32(3) ++
        jpegs.flatMap(j => be32(j.length.toLong)).toArray) ++
      mbox("co64", be32(0) ++ be32(1) ++ be64(base)))
    val payload = ftyp ++ mdat ++ mbox("moov", mvhd ++ mbox("trak",
      mbox("mdia", mdhd ++
        mbox("hdlr", be32(0) ++ be32(0) ++ cc("vide") ++ zeros(12)) ++
        mbox("minf", stbl))))

    val ds = spark.createDataset(Seq(
      MultiModal.MediaRecord(1L, "video", payload)))
    val m = MultiModal.decodeMp4Meta(ds).collect().head
    assert(m.codec === "mp4" && m.brand === "iso6")
    assert(m.sample_codec === "jpeg" && m.width === 8 && m.height === 6)
    // v1 mdhd: 3000 / 30000 = 0.1 s; 3 samples -> 30 fps
    assert(m.duration_s === 0.1 && m.fps === 30.0 && m.n_samples === 3)

    val frames = MultiModal.decodeMp4Frames(ds, every = 1).collect()
    assert(frames.length === 3 && frames.forall(_.frame_codec === "mjpeg"))
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(jpegs(0)))
    val px = ref.getRGB(0, 0, 8, 6, null, 0, 8)
    val exp = pixelSums(8, 6, (x, y) => px(y * 8 + x))
    frames.foreach(f =>
      assert((f.mean_r, f.mean_g, f.mean_b, f.mean_luma) === exp,
        s"v1/co64 sample ${f.frame_idx} stats must be exact"))

    // mdia child ORDER is not mandated by ISO-BMFF: the same track
    // with (hdlr, minf, mdhd) — timing box LAST — must parse the same
    // timing (the per-trak staging commit, round-11 review)
    val lateMdhd = ftyp ++ mdat ++ mbox("moov", mvhd ++ mbox("trak",
      mbox("mdia",
        mbox("hdlr", be32(0) ++ be32(0) ++ cc("vide") ++ zeros(12)) ++
        mbox("minf", stbl) ++ mdhd)))
    val m2 = MultiModal.decodeMp4Meta(spark.createDataset(Seq(
      MultiModal.MediaRecord(2L, "video", lateMdhd)))).collect().head
    assert(m2.codec === "mp4" && m2.duration_s === 0.1 && m2.fps === 30.0,
      "mdhd after minf must still supply the video timing")
  }
}
