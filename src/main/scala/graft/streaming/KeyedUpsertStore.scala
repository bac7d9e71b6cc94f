package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Last-write-wins keyed store backed by parquet — the engine's stand-in
  * for the reference's Cassandra `attach_event` table (S4/W5:
  * `TrafficStreamProcessor.scala:42`, `prepare_cassandra.sh:24-30`:
  * PRIMARY KEY(bearer_id) ⇒ upsert). Called from `foreachBatch`: each
  * micro-batch is merged with the current store, deduped to the latest
  * row per key, and atomically swapped in. On a cluster the same
  * pattern runs against Delta/Iceberg MERGE; the parquet swap keeps the
  * semantics with zero extra dependencies.
  */
class KeyedUpsertStore(spark: SparkSession, path: String,
                       key: String, tsCol: String) {

  private def exists: Boolean = Files.exists(Paths.get(path))

  /** Current store contents (empty-schema-safe: caller sees rows only
    * after the first upsert).
    */
  def current: Option[DataFrame] =
    if (exists) Some(spark.read.parquet(path)) else None

  /** Merge a batch: union with current, keep latest per key, swap. */
  def upsert(batch: DataFrame): Unit = {
    val merged = current match {
      case Some(cur) => cur.unionByName(batch)
      case None      => batch
    }
    val deduped = StreamOps.latestByKey(merged, key, tsCol)
    val tmp = path + ".tmp"
    deduped.write.mode("overwrite").parquet(tmp)
    // swap: the store is driver-owned, single-writer
    val target = Paths.get(path)
    if (exists) {
      val old = Paths.get(path + ".old")
      deleteRecursive(old)
      Files.move(target, old, StandardCopyOption.ATOMIC_MOVE)
      Files.move(Paths.get(tmp), target, StandardCopyOption.ATOMIC_MOVE)
      deleteRecursive(old)
    } else {
      Files.move(Paths.get(tmp), target, StandardCopyOption.ATOMIC_MOVE)
    }
  }

  private def deleteRecursive(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
}
