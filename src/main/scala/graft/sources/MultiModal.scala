package graft.sources

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by per-partition batch
  * functions (the Scala analogue of pandas-UDF `mapInPandas` batches).
  *
  * Two decode tiers:
  *
  *   - [[decodeImages]] — REAL pixel decode for the container formats
  *     the JDK's ImageIO reads out of the box (PNG, BMP, GIF, JPEG —
  *     pure-JVM, no native codec dependency): width/height plus exact
  *     integer-arithmetic channel means and BT.601 luminance. Payloads
  *     that aren't a recognized image (sniffed by magic bytes) pass
  *     through with `codec = "unknown"` and zeroed pixel stats, so the
  *     same call runs over a mixed corpus — the real-image subset gets
  *     real features.
  *   - [[decodeAudio]] — REAL sample decode for the audio containers
  *     the JDK's javax.sound reads out of the box (WAV, AIFF, AU —
  *     pure-JVM): sample rate, channels, frame count, and exact
  *     integer-arithmetic peak / mean-|s| / RMS over the PCM samples.
  *     Non-audio payloads quarantine as `codec = "unknown"`, valid
  *     magic with unreadable bytes as `codec = "corrupt"`.
  *   - [[extractFeatures]] — byte-level statistics for ANY payload
  *     (the x17 surface, oracle-checked byte-exactly): video codecs
  *     are genuinely not in this environment, so that format keeps
  *     the deterministic byte-feature fallback.
  *
  * The Spark-side plumbing — schema, typed Datasets, mapPartitions
  * batching with per-partition decoder init, explode of frame samples
  * — is identical for both tiers; swapping in a JNI video decoder
  * changes one function body, nothing in the plan.
  */
object MultiModal {

  case class MediaRecord(media_id: Long, format: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, format: String, n_bytes: Int,
      mean_byte: Double, head_hex: String)
  case class FrameSample(media_id: Long, frame_idx: Int, frame_bytes: Int,
      frame_hash: String)

  /** Decoded-pixel statistics for one image payload. Means are exact:
    * integer channel sums over all pixels, ONE floating division at
    * the end — bit-identical to any independent recomputation from
    * the same pixels (MultiModalSpec pins this against fixture images
    * it renders itself). `mean_luma` is BT.601 integer-weighted
    * (299 R + 587 G + 114 B) / 1000.
    */
  case class ImageStats(media_id: Long, format: String, codec: String,
      width: Int, height: Int, mean_r: Double, mean_g: Double,
      mean_b: Double, mean_luma: Double)

  /** Synthesize a media table from documents: payload = utf-8 bytes
    * (stands in for image/audio blobs; deterministic).
    */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, lit("image"))
          .when(col("doc_id") % 3 === 1, lit("audio"))
          .otherwise(lit("video")).as("format"),
        encode(col("text"), "utf-8").as("payload"))
      .as[MediaRecord]
  }

  /** Container sniff by magic bytes — decides whether a payload even
    * reaches the decoder (feeding ImageIO arbitrary bytes to learn
    * "not an image" would allocate a reader probe per corpus row).
    */
  private[sources] def sniffCodec(b: Array[Byte]): String =
    if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
      b(2) == 'N' && b(3) == 'G') "png"
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b.length >= 3 && (b(0) & 0xff) == 0xff &&
      (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff) "jpeg"
    else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8') "gif"
    else "unknown"

  /** REAL image decode over a media table — pixel dimensions and
    * exact channel/luminance means for every payload whose container
    * ImageIO reads; non-image payloads flow through as
    * `codec = "unknown"` (and unreadable bytes behind a valid magic
    * as `codec = "corrupt"`) with zeroed stats rather than failing
    * the batch — at corpus scale a decode stage must quarantine bad
    * rows, not die on them.
    */
  def decodeImages(media: Dataset[MediaRecord]): Dataset[ImageStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init: no temp-file cache (ImageIO's
      // default spills to disk per read), amortized across the batch
      javax.imageio.ImageIO.setUseCache(false)
      it.map(decodeOne)
    }
  }

  private def decodeOne(r: MediaRecord): ImageStats = {
    val codec = sniffCodec(r.payload)
    if (codec == "unknown")
      return ImageStats(r.media_id, r.format, codec, 0, 0, 0.0, 0.0, 0.0, 0.0)
    val img =
      try javax.imageio.ImageIO.read(new ByteArrayInputStream(r.payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null)
      return ImageStats(r.media_id, r.format, "corrupt", 0, 0, 0.0, 0.0, 0.0, 0.0)
    val w = img.getWidth
    val h = img.getHeight
    // one bulk ARGB fetch (not per-pixel getRGB calls), integer sums
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val red = (p >> 16) & 0xff
      val grn = (p >> 8) & 0xff
      val blu = p & 0xff
      sr += red; sg += grn; sb += blu
      sl += 299L * red + 587L * grn + 114L * blu
      i += 1
    }
    val n = px.length.toDouble
    ImageStats(r.media_id, r.format, codec, w, h,
      sr / n, sg / n, sb / n, sl / (1000.0 * n))
  }

  /** Decoded-sample statistics for one audio payload. All sums are
    * integer over the 16-bit signed PCM samples (every JDK-supported
    * container converts losslessly or by defined downconversion to
    * PCM_SIGNED 16-bit); mean_abs and rms each do ONE floating
    * division (and one sqrt) at the end, so any independent
    * recomputation from the same samples is bit-identical —
    * MultiModalSpec pins this against WAV fixtures it renders itself.
    */
  case class AudioStats(media_id: Long, format: String, codec: String,
      sample_rate: Int, channels: Int, n_frames: Long, peak: Int,
      mean_abs: Double, rms: Double)

  /** Audio container sniff by magic bytes — same gate as
    * [[sniffCodec]]: arbitrary bytes never reach the audio system's
    * provider probing.
    */
  private[sources] def sniffAudio(b: Array[Byte]): String =
    if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')
      "wav"
    else if (b.length >= 12 && b(0) == 'F' && b(1) == 'O' && b(2) == 'R' &&
      b(3) == 'M' && b(8) == 'A' && b(9) == 'I' && b(10) == 'F')
      "aiff"
    else if (b.length >= 4 && b(0) == '.' && b(1) == 's' && b(2) == 'n' &&
      b(3) == 'd')
      "au"
    else "unknown"

  /** REAL audio decode over a media table — per-partition batches, the
    * same quarantine discipline as [[decodeImages]]: a decode stage at
    * corpus scale must pass bad rows through tagged, not die on them.
    */
  def decodeAudio(media: Dataset[MediaRecord]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeOneAudio))
  }

  private def decodeOneAudio(r: MediaRecord): AudioStats = {
    val codec = sniffAudio(r.payload)
    if (codec == "unknown")
      return AudioStats(r.media_id, r.format, codec, 0, 0, 0L, 0, 0.0, 0.0)
    val st =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(r.payload))
        val f = in.getFormat
        // normalize to signed 16-bit PCM, native rate/channels: the
        // JDK converts u8/a-law/mu-law/be-endian inputs to one
        // arithmetic domain so the stats mean the same thing per codec
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          f.getSampleRate, 16, f.getChannels, 2 * f.getChannels,
          f.getSampleRate, false)
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
        val bytes = pcm.readAllBytes()
        var i = 0
        var n = 0L; var sAbs = 0L; var sSq = 0L; var peak = 0
        while (i + 1 < bytes.length) {
          val s = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toInt
          val a = math.abs(s)
          if (a > peak) peak = a
          sAbs += a; sSq += s.toLong * s; n += 1
          i += 2
        }
        val ch = target.getChannels
        val frames = if (ch > 0) n / ch else 0L
        if (n == 0L)
          AudioStats(r.media_id, r.format, "corrupt", 0, 0, 0L, 0, 0.0, 0.0)
        else
          AudioStats(r.media_id, r.format, codec,
            math.round(f.getSampleRate), ch, frames, peak,
            sAbs.toDouble / n, math.sqrt(sSq.toDouble / n))
      } catch {
        case scala.util.control.NonFatal(_) =>
          AudioStats(r.media_id, r.format, "corrupt", 0, 0, 0L, 0, 0.0, 0.0)
      }
    st
  }

  /** Byte-level feature extraction for ANY payload as a per-partition
    * batch map — deterministic statistics that need no codec (the
    * video stand-in until a real decoder is linked; images get true
    * pixel features from [[decodeImages]], audio from
    * [[decodeAudio]]).
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition "decoder" init would go here
      it.map(byteFeatures)
    }
  }

  private def byteFeatures(r: MediaRecord): MediaFeatures = {
    val bytes = r.payload
    val mean =
      if (bytes.isEmpty) 0.0
      else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length
    val head = bytes.take(8).map("%02x".format(_)).mkString
    MediaFeatures(r.media_id, r.format, bytes.length, mean, head)
  }

  /** Frame sampling for "video" payloads: split the payload into
    * fixed-size chunks and emit every k-th chunk. flatMap keeps it
    * distributed; no driver-side collection.
    */
  def sampleFrames(media: Dataset[MediaRecord], frameSize: Int = 64,
      every: Int = 4): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(_.format == "video").flatMap { r =>
      r.payload.grouped(frameSize).zipWithIndex.collect {
        case (chunk, i) if i % every == 0 =>
          val md = java.security.MessageDigest.getInstance("MD5")
          FrameSample(r.media_id, i, chunk.length,
            md.digest(chunk).map("%02x".format(_)).mkString)
      }
    }
  }
}
