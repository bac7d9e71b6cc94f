package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Last-write-wins keyed store backed by parquet — the engine's stand-in
  * for the reference's Cassandra `attach_event` table (S4/W5:
  * `TrafficStreamProcessor.scala:42`, `prepare_cassandra.sh:24-30`:
  * PRIMARY KEY(bearer_id) ⇒ upsert). Called from `foreachBatch`: each
  * micro-batch is merged into the store. On a cluster the same pattern
  * runs against Delta/Iceberg MERGE; this keeps the semantics with zero
  * extra dependencies.
  *
  * Scale design: the store is HASH-BUCKETED by key
  * (`bucket=N` partition dirs, N = pmod(hash(key), numBuckets)), and an
  * upsert rewrites ONLY the buckets its batch touches — cost is
  * O(touched buckets), not O(store). A micro-batch whose keys land in 3
  * of 64 buckets leaves the other 61 buckets' files untouched
  * byte-for-byte (asserted in PipelineSpec). The reference's Cassandra
  * table gets the same effect from per-partition-key writes.
  */
class KeyedUpsertStore(spark: SparkSession, path: String,
                       key: String, tsCol: String, numBuckets: Int = 16) {

  private def bucketDir(b: Int): Path = Paths.get(path, s"bucket=$b")

  private def bucketDirs: Seq[Path] =
    if (!Files.exists(Paths.get(path))) Nil
    else {
      val s = Files.list(Paths.get(path))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(_.getFileName.toString.startsWith("bucket=")).toList
      } finally s.close()
    }

  /** Current store contents (empty-schema-safe: caller sees rows only
    * after the first upsert). The `bucket` partition column is internal
    * and stripped.
    */
  def current: Option[DataFrame] =
    if (bucketDirs.isEmpty) None
    else Some(spark.read.parquet(path).drop("bucket"))

  /** Merge a batch: per touched bucket, union with that bucket's rows,
    * keep latest per key, swap the bucket dir in. Untouched buckets are
    * not read, rewritten, or moved.
    */
  def upsert(batch: DataFrame): Unit = {
    val bucketed = batch
      .withColumn("__b", pmod(hash(col(key)), lit(numBuckets)))
      .persist()
    try {
      val touched = bucketed.select(col("__b")).distinct()
        .collect().map(_.getInt(0)).sorted
      if (touched.nonEmpty) Files.createDirectories(Paths.get(path))
      touched.foreach { b =>
        val slice = bucketed.where(col("__b") === b).drop("__b")
        val merged =
          if (Files.exists(bucketDir(b)))
            spark.read.parquet(bucketDir(b).toString).unionByName(slice)
          else slice
        val deduped = StreamOps.latestByKey(merged, key, tsCol)
        // dot-prefixed staging dir: invisible to parquet partition
        // discovery, so a concurrent `current` never sees half a swap
        val tmp = Paths.get(path, s".tmp_bucket_$b")
        deleteRecursive(tmp)
        deduped.write.mode("overwrite").parquet(tmp.toString)
        // swap: the store is driver-owned, single-writer
        if (Files.exists(bucketDir(b))) {
          val old = Paths.get(path, s".old_bucket_$b")
          deleteRecursive(old)
          Files.move(bucketDir(b), old, StandardCopyOption.ATOMIC_MOVE)
          Files.move(tmp, bucketDir(b), StandardCopyOption.ATOMIC_MOVE)
          deleteRecursive(old)
        } else {
          Files.move(tmp, bucketDir(b), StandardCopyOption.ATOMIC_MOVE)
        }
      }
    } finally bucketed.unpersist()
  }

  private def deleteRecursive(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
}
