package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2 P11): image/audio/video as
  * opaque `binary` columns with typed metadata, processed per-partition
  * in batches.
  *
  * The decode step is a STUB — this container has no image/audio codecs
  * — replaced by a deterministic fake that derives "dimensions" from the
  * byte content. Everything Spark-side is real and scale-shaped: binary
  * column schema, typed Dataset rows, `mapPartitions` batching (one
  * decoder init per partition, the same shape a JNI/FFI decoder needs),
  * and narrow no-shuffle execution.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, mime: String, media: Array[Byte])
  case class MediaFeatures(
      doc_id: Long, mime: String, byte_len: Long,
      width: Int, height: Int, n_frames: Int)

  /** Build a binary media table. In production this is the parquet/
    * Lance/tar-shard reader; here we derive bytes from `documents.text`
    * so the pipeline runs on the driver's test tables. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image/fake")
        .when(col("doc_id") % 3 === 1, "audio/fake")
        .otherwise("video/fake").as("mime"),
      encode(col("text"), "UTF-8").as("media"))

  /** STUB decoder: a real implementation would decode the media bytes
    * (e.g. libjpeg/ffmpeg via FFI) inside the partition loop. The fake
    * is deterministic in the bytes so results are reproducible. */
  private def fakeDecode(r: MediaRecord): MediaFeatures = {
    var h = 1125899906842597L // deterministic FNV-ish fold of the bytes
    var i = 0
    while (i < r.media.length) { h = h * 31 + (r.media(i) & 0xff); i += 1 }
    val w = 16 + (math.abs(h % 512)).toInt
    val ht = 16 + (math.abs((h >> 16) % 512)).toInt
    val frames = if (r.mime.startsWith("video")) 1 + (math.abs((h >> 32) % 120)).toInt else 1
    MediaFeatures(r.doc_id, r.mime, r.media.length.toLong, w, ht, frames)
  }

  /** Per-partition batched decode: one iterator pass, decoder state (the
    * stub has none) initialized once per partition. */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    implicit val recEnc = Encoders.product[MediaRecord]
    implicit val featEnc = Encoders.product[MediaFeatures]
    media.as[MediaRecord].mapPartitions(it => it.map(fakeDecode))
  }

  /** End-to-end: documents → binary media table → decoded features. */
  def features(docs: DataFrame): DataFrame =
    decodeFeatures(mediaTable(docs)).toDF()

  /** Frame sampling for video media: every `stride`-th frame index,
    * with a stub "decoded frame" (a deterministic byte slice standing in
    * for the real frame decode). The explode keeps the operation narrow
    * — each media row fans out to its sampled frames with no shuffle,
    * which is the shape a 100 TB video pipeline needs (frame work
    * scales with output frames, not input bytes moved). */
  def sampleFrames(docs: DataFrame, stride: Int = 10): DataFrame = {
    require(stride > 0, "stride must be positive")
    val media = mediaTable(docs)
    val feats = decodeFeatures(media).toDF()
    feats.join(media.select(col("doc_id"), col("media")), Seq("doc_id"))
      .filter(col("mime") === "video/fake")
      .select(col("doc_id"), col("n_frames"),
        explode(expr(s"sequence(0, n_frames - 1, $stride)")).as("frame_idx"),
        col("media"))
      .withColumn("frame_bytes",
        expr("substring(media, frame_idx % 16 * 8 + 1, 16)"))
      .select("doc_id", "frame_idx", "frame_bytes")
  }
}
