package graft.model

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Reference domain model, clean-room from SURVEY.md §1.2
  * (`traffic/model/package.scala:10-45`): telco events carried over two
  * Kafka topics. Schemas derive from the case classes via product
  * encoders; JSON codecs are `from_json`/`to_json` (the Catalyst-native
  * analog of the reference's play-json `Format`s).
  */
final case class LatLng(lat: Double, lng: Double)

final case class Celltower(mcc: Int, mnc: Int, cell: Int, area: Int,
                           location: LatLng)

final case class Subscriber(id: Int, imsi: String, msisdn: String,
                            imei: String, lastName: String, firstName: String,
                            address: String, city: String, zip: String,
                            country: String)

/** `ts` is epoch millis, as on the reference wire format. */
final case class AttachEvent(bearerId: String, subscriber: Subscriber,
                             topic: String, ts: Long)

final case class CelltowerEvent(celltower: Celltower, bearerId: String,
                                metrics: Map[String, Double], topic: String,
                                ts: Long)

object Model {
  implicit val attachEncoder: Encoder[AttachEvent] = Encoders.product[AttachEvent]
  implicit val celltowerEncoder: Encoder[CelltowerEvent] = Encoders.product[CelltowerEvent]

  val attachSchema: StructType = attachEncoder.schema
  val celltowerSchema: StructType = celltowerEncoder.schema

  /** Kafka-shaped JSON decode (reference S3,
    * `TrafficStreamProcessor.scala:37-39,47-49`): parse `value` as JSON;
    * undecodable records are silently dropped — the analog of
    * `flatMap(_.asOpt[T])`. Spark's PERMISSIVE `from_json` yields an
    * all-null struct for malformed input (never a null row), so "decoded"
    * is enforced as: the required fields are present. Works identically
    * on batch and streaming frames.
    */
  def decodeJson(raw: DataFrame, schema: StructType,
                 requiredFields: Seq[String] = Seq.empty): DataFrame = {
    val required =
      if (requiredFields.nonEmpty) requiredFields
      else Seq(schema.fields.head.name)
    raw.select(from_json(col("value").cast("string"), schema).as("parsed"))
      .where(required.map(f => col(s"parsed.$f").isNotNull).reduce(_ && _))
      .select(col("parsed.*"))
  }

  /** Sink-side JSON encode (reference F1: every output is a JSON string
    * to Kafka).
    */
  def encodeJson(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))

  /** Event-time column from the wire-format epoch millis. */
  def eventTime(tsMillis: Column): Column = timestamp_millis(tsMillis)
}
