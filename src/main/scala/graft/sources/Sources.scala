package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.StructType
import graft.model.Model

/** Source/sink surface (SURVEY.md §2.1). The Kafka builders mirror the
  * reference's two-topic ingestion (S1/S2,
  * `TrafficStreamProcessor.scala:35-49`) on the Structured Streaming
  * Direct API; they require the `spark-sql-kafka-0-10` connector on the
  * deploy classpath (not shipped in this container — the JSON
  * decode/encode stages, which carry all the semantics, are fully
  * exercised in tests via MemoryStream instead).
  */
object Sources {

  /** S1/S2 + S3: Kafka topic → typed rows; undecodable payloads dropped. */
  def kafkaJson(spark: SparkSession, brokers: String, topic: String,
                schema: StructType, required: Seq[String] = Seq.empty): DataFrame =
    Model.decodeJson(
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", "latest")
        .load(),
      schema, required)

  /** S5: JSON-encoded Kafka sink (at-least-once; the built-in sink pools
    * producers per executor — the per-partition producer churn of the
    * reference's `KafkaStreamPublisher.scala:12-21` doesn't exist here).
    */
  def kafkaJsonSink(df: DataFrame, brokers: String, topic: String,
                    checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    Model.encodeJson(df).writeStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)

  /** S7: debug print sink (reference `AppUtil.printStream`). */
  def consolePreview(df: DataFrame, numRows: Int = 5): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.format("console").option("numRows", numRows)

  /** File-drop streaming source: the fence-file pattern (S6) and any
    * landing-zone ingestion — new files under `path` are picked up per
    * micro-batch.
    */
  def jsonDir(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(path)
}
