package graft

import graft.model._
import graft.streaming.{IncrementalKMeans, KeyedUpsertStore, TelcoPipelines}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{hash, lit, pmod}

/** End-to-end reference topology: two streams in, upsert store,
  * enrichment, three fan-out consumers — driven through MemoryStream
  * exactly as a deployment drives Kafka topics.
  */
class PipelineSpec extends SparkSuite {
  import spark.implicits._

  private def sub(id: Int) = Subscriber(id, s"imsi$id", s"+32$id", s"imei$id",
    "Last", "First", "Addr", "City", "1000", "BE")

  private def attach(bearer: String, id: Int, ts: Long) =
    AttachEvent(bearer, sub(id), "attach-topic", ts)

  private def ct(bearer: String, ts: Long, rtt: Double, loss: Double,
                 lat: Double = 50.85, lng: Double = 4.35) =
    CelltowerEvent(Celltower(206, 10, 1234, 40, LatLng(lat, lng)),
      bearer, Map("rtt" -> rtt, "byteLoss" -> loss), "celltower-topic", ts)

  test("keyed upsert store is last-write-wins across batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-store").toString
    val store = new KeyedUpsertStore(spark, s"$dir/attach", "bearerId", "ts")
    assert(store.current.isEmpty)
    store.upsert(Seq(attach("b1", 1, 1000L), attach("b2", 2, 1000L)).toDF())
    store.upsert(Seq(attach("b1", 9, 2000L)).toDF()) // b1 re-attaches
    val cur = store.current.get
    assert(cur.count() === 2)
    assert(cur.where($"bearerId" === "b1").select($"subscriber.id")
      .as[Int].head() === 9)
  }

  test("full telco topology end-to-end via two MemoryStreams") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-e2e").toString
    val attachMem = MemoryStream[AttachEvent]
    val ctMem = MemoryStream[CelltowerEvent]
    val km = new IncrementalKMeans(k = 2, dims = 2, decay = 1.0, seed = 1L)

    @volatile var lastOut: Option[TelcoPipelines.Outputs] = None
    val queries = TelcoPipelines.start(
      attachMem.toDF(), ctMem.toDF(), s"$dir/attach", km,
      (out, _) => lastOut = Some(out))
    try {
      // batch 1: attach events land first (store fills)
      attachMem.addData(attach("b1", 1, 1000L), attach("b2", 2, 1000L))
      queries.foreach(_.processAllAvailable())
      // batch 2: celltower traffic; bX has no attach -> dropped by J1
      ctMem.addData(
        ct("b1", 10000L, 10.0, 0.1), ct("b1", 12000L, 12.0, 0.2),
        ct("b2", 11000L, 100.0, 5.0, lat = 40.0, lng = 1.0),
        ct("bX", 13000L, 1.0, 0.0))
      queries.foreach(_.processAllAvailable())

      val out = lastOut.get
      // use case 1: windowed stats per subscriber (b1 -> sub 1, b2 -> sub 2)
      val stats = out.subscriberStats.collect()
      val subs = stats.map(_.getAs[Int]("subscriber_id")).toSet
      assert(subs === Set(1, 2)) // bX dropped
      val b1rtt = out.subscriberStats
        .where($"subscriber_id" === 1 && $"metric" === "rtt")
        .select($"n", $"mean").as[(Long, Double)].collect()
      assert(b1rtt.exists { case (n, m) => n === 2L && math.abs(m - 11.0) < 1e-9 })
      // use case 2: b1/b2 in Brussels-area fences; the (40,1) event in none
      val hits = out.geofenceHits.collect()
      assert(hits.forall(_.getAs[String]("id") === "b1"))
      assert(hits.nonEmpty)
      // use case 3: anomalies frame computes (small batch => n<=4 per
      // cluster => no flags, the reference's n<=4 guard)
      assert(out.anomalies.count() === 0)
    } finally queries.foreach(_.stop())
  }

  test("upsert rewrites only touched buckets: untouched bucket files stay byte-identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    val store = new KeyedUpsertStore(spark, s"$dir/attach", "bearerId", "ts")
    store.upsert((1 to 40).map(i => attach(s"b$i", i, 1000L)).toDF())
    val root = java.nio.file.Paths.get(s"$dir/attach")
    def snapshot(): Map[String, Seq[Byte]] = {
      val s = java.nio.file.Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
          .map(p => root.relativize(p).toString ->
            java.nio.file.Files.readAllBytes(p).toSeq)
          .toMap
      } finally s.close()
    }
    val before = snapshot()
    // second batch touches exactly one key -> exactly one bucket
    store.upsert(Seq(attach("b1", 99, 2000L)).toDF())
    val after = snapshot()
    val touched = spark.range(1)
      .select(pmod(hash(lit("b1")), lit(16))).as[Int].head()
    def isTouched(f: String) =
      f.startsWith(s"b${touched}_v") || f == "manifest.json"
    // every file outside the touched bucket (and the manifest) survives
    // byte-for-byte — untouched buckets are never rewritten
    before.filterNot(t => isTouched(t._1)).foreach { case (f, bytes) =>
      assert(after.get(f).contains(bytes), s"untouched file changed: $f")
    }
    // the touched bucket published a NEW version; the superseded one is
    // retained one generation for in-flight readers of the old manifest
    assert(java.nio.file.Files.exists(root.resolve(s"b${touched}_v1")))
    assert(java.nio.file.Files.exists(root.resolve(s"b${touched}_v2")))
    val cur = store.current.get
    assert(cur.count() === 40)
    assert(cur.where($"bearerId" === "b1").select($"subscriber.id")
      .as[Int].head() === 99)
    // a third upsert to the same bucket vacuums v1, keeps v2 + v3
    store.upsert(Seq(attach("b1", 7, 3000L)).toDF())
    assert(!java.nio.file.Files.exists(root.resolve(s"b${touched}_v1")))
    assert(java.nio.file.Files.exists(root.resolve(s"b${touched}_v2")))
    assert(java.nio.file.Files.exists(root.resolve(s"b${touched}_v3")))
    assert(store.current.get.where($"bearerId" === "b1")
      .select($"subscriber.id").as[Int].head() === 7)
  }

  test("store recovers from an orphaned version dir left by a crashed upsert") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orphan").toString
    val store = new KeyedUpsertStore(spark, s"$dir/attach", "bearerId", "ts")
    store.upsert(Seq(attach("b1", 1, 1000L)).toDF())
    val touched = spark.range(1)
      .select(pmod(hash(lit("b1")), lit(16))).as[Int].head()
    // simulate a crash AFTER the bucket move but BEFORE the manifest
    // swap: the next version dir exists (with junk), manifest points at v1
    val orphan = java.nio.file.Paths.get(s"$dir/attach/b${touched}_v2")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.write(orphan.resolve("junk"), Array[Byte](1, 2, 3))
    // the next upsert must clobber the orphan, not wedge on the rename
    store.upsert(Seq(attach("b1", 99, 2000L)).toDF())
    assert(store.current.get.where($"bearerId" === "b1")
      .select($"subscriber.id").as[Int].head() === 99)
    assert(!java.nio.file.Files.exists(orphan.resolve("junk")))
  }

  test("processBatch persists the shared enrichment prefix; release() drops it (S8)") {
    val attachDf = Seq(attach("b1", 1, 1000L)).toDF()
    val ctDf = Seq(ct("b1", 10000L, 10.0, 0.1), ct("b1", 12000L, 12.0, 0.2)).toDF()
    val km = new IncrementalKMeans(k = 2, dims = 2, decay = 1.0, seed = 1L)
    val out = TelcoPipelines.processBatch(ctDf, Some(attachDf), km)
    assert(out.cached.nonEmpty)
    out.cached.foreach(df =>
      assert(df.storageLevel.useMemory, "shared prefix not cached"))
    assert(out.subscriberStats.count() > 0) // sinks run against the cache
    out.release()
    out.cached.foreach(df =>
      assert(df.storageLevel === org.apache.spark.storage.StorageLevel.NONE))
  }

  test("PipelineConfig: defaults, file round-trip, unknown keys fail loudly") {
    val d = streaming.PipelineConfig()
    assert(d.batchMillis === 1000L && d.kmeansK === 3 && d.kmeansDecay === 1.0)
    assert(d.metricsWindow === "30000 milliseconds")
    val dir = java.nio.file.Files.createTempDirectory("graft-conf")
    val f = dir.resolve("pipeline.json")
    java.nio.file.Files.write(f,
      """{"batchMillis": 500, "metricsWindowMillis": 10000,
        | "metricsSlideMillis": 10000, "kmeansDimensions": ["rtt"],
        | "kmeansK": 2, "kmeansDecay": 0.5, "storePath": "/tmp/s",
        | "checkpoint": "/tmp/cp"}""".stripMargin.getBytes("UTF-8"))
    val c = streaming.PipelineConfig.fromJsonFile(f.toString)
    assert(c.batchMillis === 500L)
    assert(c.metricsWindow === "10000 milliseconds")
    assert(c.kmeansDimensions === Seq("rtt"))
    assert(c.kmeansK === 2 && c.kmeansDecay === 0.5)
    assert(c.checkpoint === Some("/tmp/cp"))
    assert(c.attachTopic === "attach-topic") // absent key keeps default
    val err = intercept[IllegalArgumentException] {
      streaming.PipelineConfig.fromJson("""{"kmaensK": 2}""")
    }
    assert(err.getMessage.contains("kmaensK"))
  }

  test("config fixture drives the whole topology (windows, k, dims, fence file)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-cfg-e2e")
    // one square fence around Brussels, in the reference wire shape
    val fenceFile = dir.resolve("fences.json")
    java.nio.file.Files.write(fenceFile,
      ("""[{"name":"bxl","path":"x","polygon":[""" +
        """{"lat":50.0,"lng":4.0},{"lat":51.5,"lng":4.0},""" +
        """{"lat":51.5,"lng":5.0},{"lat":50.0,"lng":5.0}]}]""").getBytes("UTF-8"))
    val confFile = dir.resolve("pipeline.json")
    java.nio.file.Files.write(confFile,
      (s"""{"storePath": "$dir/attach", "metricsWindowMillis": 60000,
         | "metricsSlideMillis": 60000, "kmeansDimensions": ["rtt", "byteLoss"],
         | "kmeansK": 2, "geofenceFile": "$fenceFile"}""").stripMargin.getBytes("UTF-8"))
    val config = streaming.PipelineConfig.fromJsonFile(confFile.toString)
    val attachMem = MemoryStream[AttachEvent]
    val ctMem = MemoryStream[CelltowerEvent]
    @volatile var lastOut: Option[TelcoPipelines.Outputs] = None
    val (queries, km) = TelcoPipelines.start(config, attachMem.toDF(), ctMem.toDF(),
      (out, _) => lastOut = Some(out))
    try {
      attachMem.addData(attach("b1", 1, 1000L))
      queries.foreach(_.processAllAvailable())
      ctMem.addData(ct("b1", 10000L, 10.0, 0.1), ct("b1", 12000L, 12.0, 0.2))
      queries.foreach(_.processAllAvailable())
      val out = lastOut.get
      // tumbling 60 s window from config -> both events in ONE window row
      val rtt = out.subscriberStats.where($"metric" === "rtt").collect()
      assert(rtt.length === 1)
      assert(rtt.head.getAs[Long]("n") === 2L)
      // fence file from config -> hits against the fixture fence name
      val hits = out.geofenceHits.collect()
      assert(hits.nonEmpty)
      assert(hits.forall(_.getAs[String]("fence_name") === "bxl"))
      // k from config
      assert(km.k === 2)
    } finally queries.foreach(_.stop())
  }

  test("gatherJson collapses a frame to one sorted JSON array record (A5)") {
    val df = Seq((2, "b"), (1, "a")).toDF("k", "s")
    val out = TelcoPipelines.gatherJson(df).as[String].collect()
    assert(out.length === 1)
    assert(out.head === """{"points": [{"k":1,"s":"a"},{"k":2,"s":"b"}]}""")
  }

  test("metricsVector projects declared dimension order (P4)") {
    val df = Seq(Map("byteLoss" -> 0.5, "rtt" -> 9.0, "x" -> 1.0))
      .toDF("metrics")
    val v = df.select(TelcoPipelines.metricsVector(Seq("rtt", "byteLoss")))
      .as[Seq[Double]].head()
    assert(v === Seq(9.0, 0.5))
  }
}
