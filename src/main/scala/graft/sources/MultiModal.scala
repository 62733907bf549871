package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by per-partition batch
  * functions (the Scala analogue of pandas-UDF `mapInPandas` batches).
  *
  * The actual media codecs are NOT available in this environment, so
  * [[decodeStub]] is a clearly-marked deterministic fake; the Spark-side
  * plumbing — schema, typed Datasets, mapPartitions batching, explode of
  * frame samples — is real and tested. Swap `decodeStub` for a JNI/
  * library decode and nothing else changes.
  */
object MultiModal {

  case class MediaRecord(media_id: Long, format: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, format: String, n_bytes: Int,
      mean_byte: Double, head_hex: String)
  case class FrameSample(media_id: Long, frame_idx: Int, frame_bytes: Int,
      frame_hash: String)

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

  /** STUB decode: real impl would JNI into an image/audio codec here.
    * Deterministic byte statistics stand in for decoded features.
    */
  private def decodeStub(r: MediaRecord): MediaFeatures = {
    val bytes = r.payload
    val mean =
      if (bytes.isEmpty) 0.0
      else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length
    val head = bytes.take(8).map("%02x".format(_)).mkString
    MediaFeatures(r.media_id, r.format, bytes.length, mean, head)
  }

  /** Feature extraction as a per-partition batch map — one decoder
    * instance per partition (the expensive init amortizes across the
    * batch exactly like a pandas-UDF iterator).
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition "decoder" init would go here
      it.map(decodeStub)
    }
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
