package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star §7.6): media as opaque
  * `binary` payloads + typed metadata struct, with decode/feature
  * extraction as a batched partition-local transform.
  *
  * The decode step is STUBBED — this container has no image/audio codec
  * libraries — with a deterministic fake (byte-level stats standing in
  * for pixel/sample features). Everything Spark-side is real: the binary
  * column schema, the metadata struct, partition-local batched
  * processing via `mapPartitions` on a typed Dataset (the Scala analog
  * of `mapInPandas` batch processing), and the downstream aggregation.
  */
object MultimodalOp {

  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
                                 n_frames: Long, mean_byte: Double)

  /** Wrap documents as media rows: payload = UTF-8 bytes of the text
    * (stand-in for image/audio bytes), kind assigned round-robin, plus a
    * metadata struct of the shape a real pipeline carries.
    */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3).cast("int") + 1).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        col("source").as("origin"),
        col("n_chars").as("content_length"),
        (col("doc_id") % 3 === 0).as("has_alpha")).as("meta"))

  /** Batched partition-local "decode" + feature extraction. In a real
    * deployment the body of the loop calls the codec; here it computes
    * deterministic byte statistics so the plumbing is testable.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("kind"), col("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // One batch context per partition (where a codec would be
        // initialized once); rows processed streaming, never collected.
        rows.map { r =>
          val n = r.payload.length.toLong
          // STUB decode: byte mean stands in for decoded features.
          var sum = 0L
          var i = 0
          while (i < r.payload.length) { sum += r.payload(i) & 0xff; i += 1 }
          val mean = if (n == 0) 0.0 else sum.toDouble / n
          MediaFeatures(r.doc_id, r.kind, n, (n + 1023L) / 1024L, mean)
        }
      }
  }

  /** Oracle-checkable projection of the media pipeline (byte lengths and
    * frame counts are codec-independent facts; `mean_byte` is exercised
    * in the scalatest suite instead — DuckDB can't fold over blob bytes).
    */
  def mediaSummary(docs: DataFrame): DataFrame =
    extractFeatures(asMedia(docs)).toDF()
      .select(col("doc_id"), col("kind"), col("n_bytes"), col("n_frames"))
      .orderBy("doc_id")
}
