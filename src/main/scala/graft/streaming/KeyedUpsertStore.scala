package graft.streaming

import java.nio.charset.StandardCharsets
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
  * Scale design — two properties a 100 TB store needs:
  *
  *  - '''Bucketed writes''': rows hash into `numBuckets` buckets by key
  *    (`pmod(hash(key), numBuckets)`), and an upsert rewrites ONLY the
  *    buckets its batch touches — cost is O(touched buckets), not
  *    O(store). Untouched buckets' files are not read, rewritten, or
  *    moved (byte-identity asserted in PipelineSpec).
  *  - '''Snapshot reads via a manifest''': the set of live bucket
  *    directories is recorded in a manifest file that is swapped with
  *    one ATOMIC_MOVE — the miniature form of a table format's
  *    transaction log. A reader resolves the manifest once and reads
  *    exactly the directories it names, so it can never observe a
  *    half-finished multi-bucket swap (the naive move-directories
  *    scheme has a window where a bucket dir is simply absent — a
  *    SILENT missing-rows read). Superseded bucket versions are kept
  *    for one generation and vacuumed on the following upsert, so a
  *    reader holding the previous manifest stays consistent through
  *    one concurrent upsert (the Delta/Iceberg retention idea, scaled
  *    to the single-writer driver-owned case).
  */
class KeyedUpsertStore(spark: SparkSession, path: String,
                       key: String, tsCol: String, numBuckets: Int = 16) {

  private def manifestPath: Path = Paths.get(path, "manifest.json")

  /** manifest = bucket index → live dir name (e.g. "b3_v7"). */
  private def readManifest(): Map[Int, String] =
    if (!Files.exists(manifestPath)) Map.empty
    else {
      import org.json4s._
      org.json4s.jackson.JsonMethods.parse(
        new String(Files.readAllBytes(manifestPath), StandardCharsets.UTF_8)) match {
        case JObject(fs) => fs.collect {
          case (b, JString(dir)) => b.toInt -> dir
        }.toMap
        case _ => Map.empty
      }
    }

  private def writeManifest(m: Map[Int, String]): Unit = {
    val json = m.toSeq.sortBy(_._1)
      .map { case (b, dir) => s""""$b": "$dir"""" }
      .mkString("{", ", ", "}")
    val tmp = Paths.get(path, ".manifest.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def versionOf(dir: String): Long = dir.drop(dir.indexOf("_v") + 2).toLong

  /** Live-looking bucket dirs on disk (staging dirs excluded) — used only
    * by the lost-manifest guard in `upsert`.
    */
  private def bucketDirs: Seq[Path] = {
    val root = Paths.get(path)
    if (!Files.exists(root)) Nil
    else {
      import scala.jdk.CollectionConverters._
      val s = Files.list(root)
      try s.iterator.asScala
        .filter(p => p.getFileName.toString.matches("b\\d+_v\\d+")).toSeq
      finally s.close()
    }
  }

  /** Current store contents as of the manifest snapshot (empty-schema-
    * safe: caller sees rows only after the first upsert).
    */
  def current: Option[DataFrame] = {
    val m = readManifest()
    if (m.isEmpty) None
    else Some(spark.read.parquet(
      m.values.toSeq.sorted.map(d => s"$path/$d"): _*))
  }

  /** Merge a batch: per touched bucket, union with that bucket's live
    * rows, keep latest per key, write a NEW versioned dir; then one
    * atomic manifest swap publishes all touched buckets at once.
    * Untouched buckets are not read, rewritten, or moved. The previous
    * version of each touched bucket survives until the NEXT upsert
    * touching it (one-generation retention for in-flight readers).
    */
  def upsert(batch: DataFrame): Unit = {
    val bucketed = batch
      .withColumn("__b", pmod(hash(col(key)), lit(numBuckets)))
      .persist()
    try {
      val touched = bucketed.select(col("__b")).distinct()
        .collect().map(_.getInt(0)).sorted
      if (touched.isEmpty) return
      Files.createDirectories(Paths.get(path))
      val manifest = readManifest()
      // Fail loud rather than clobber: bucket dirs with NO manifest mean
      // the manifest was lost or deleted — an empty map would make every
      // live dir look like an orphan and the writes below would destroy
      // real data silently.
      if (manifest.isEmpty && bucketDirs.nonEmpty)
        throw new IllegalStateException(
          s"KeyedUpsertStore at $path has bucket dirs but no readable " +
            "manifest.json — refusing to upsert over possibly-live data; " +
            "restore or remove the store directory")
      val updates = touched.map { b =>
        val slice = bucketed.where(col("__b") === b).drop("__b")
        val live = manifest.get(b)
        val merged = live match {
          case Some(dir) => spark.read.parquet(s"$path/$dir").unionByName(slice)
          case None      => slice
        }
        val deduped = StreamOps.latestByKey(merged, key, tsCol)
        val newDir = s"b${b}_v${live.map(versionOf).getOrElse(0L) + 1L}"
        // write to a dot-prefixed staging dir, then one atomic rename —
        // the dir appears fully-formed or not at all. A pre-existing
        // `newDir` can only be an orphan of a crashed/failed upsert
        // (the manifest never referenced it, since the manifest still
        // names the PREVIOUS version) — clobber it, or the store would
        // wedge on FileAlreadyExists forever after one mid-loop failure.
        val staging = Paths.get(path, s".stage_$newDir")
        deleteRecursive(staging)
        deleteRecursive(Paths.get(path, newDir))
        deduped.write.mode("overwrite").parquet(staging.toString)
        Files.move(staging, Paths.get(path, newDir), StandardCopyOption.ATOMIC_MOVE)
        b -> newDir
      }
      // single ATOMIC_MOVE publishes every touched bucket at once
      writeManifest(manifest ++ updates)
      // vacuum exactly the newly superseded generation (vNew−2): O(1)
      // per touched bucket — earlier versions were vacuumed by earlier
      // upserts, so rescanning from v1 would be O(stream lifetime)
      touched.foreach { b =>
        val vNew = versionOf((manifest ++ updates)(b))
        if (vNew >= 3L) deleteRecursive(Paths.get(path, s"b${b}_v${vNew - 2L}"))
      }
    } finally bucketed.unpersist()
  }

  private def deleteRecursive(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
}
