package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: build an N×-scaled rehearsal dir from an sf dir, for
  * empirically validating the dedup/ANN tier's documented scale shapes
  * (the "would this hold at 10×?" question, measured instead of
  * argued). Not part of the driver contract.
  *
  * Construction — the point is that the WORKLOAD scales linearly, not
  * just the row count:
  *   - `documents`: N copies; copy i > 0 rewrites the text through a
  *     per-copy AFFINE SUBSTITUTION CIPHER on a-z (`translate`; char c
  *     → a·c + b mod 26 with gcd(a,26)=1 — 311 distinct non-identity
  *     maps), so each copy is a DISJOINT corpus (the 31-token vocab's
  *     images under two distinct maps share an expected ≈0.06 tokens
  *     and ~zero 3-token shingles) with internal near-dup structure
  *     identical to the original and — crucially — IDENTICAL token
  *     lengths and alphabet. True pair/candidate counts therefore grow
  *     ~×N with iid per-copy jitter — the honest construction for
  *     checking near-linear candidate-generation cost. (Naive
  *     replication with distinct ids but identical text would grow
  *     pairs ×N², by construction, and prove nothing.) Two rejected
  *     constructions, both measured (Prof26, ×30 vs the 255-pair
  *     unsuffixed baseline): a `_i` decimal token SUFFIX pushed real
  *     shingle chars out of the 8-char window of the portable hash
  *     ([[graft.functions.PortableHashExpr]], oracle-portable by
  *     design) — the 3-char cohort read 4,030 est-Jaccard pairs/copy,
  *     16× inflated; a 1-char out-of-alphabet tag still read
  *     255-1,000/copy depending on the tag char because short tokens
  *     keep the tag inside the hash window. The cipher adds zero
  *     chars, so the hash window sees exactly the baseline's entropy.
  *   - `embeddings`: N copies; copy i circularly shifts the dimension
  *     order by i. The synthetic dims are identically distributed, so
  *     the marginal distribution is preserved while cross-copy cosine
  *     behaves like an independent pair — cells/buckets grow ×N in
  *     population, not in near-duplicate pathology.
  *   - `lineitem`/`orders` (mode `graph` or `all`): N copies with
  *     every graph-bearing key strided (`l_orderkey`/`l_partkey`/
  *     `l_suppkey`, `o_orderkey`/`o_custkey`), so the co-purchase
  *     graph ([[graft.operators.GraphOps.copurchaseEdges]] family) and
  *     the customer↔supplier bipartite graph
  *     ([[graft.operators.GraphOps.custSuppEdges]]) each become N
  *     DISJOINT isomorphic components — |V| and |E| grow exactly ×N
  *     with per-copy degree structure identical to the original, the
  *     honest construction for the iterative graph tier (a naive
  *     row-copy without strides would multiply edge WEIGHTS, not the
  *     graph, and densify every join superlinearly). Non-key columns
  *     ride unchanged. NOTE: the scaled dims are NOT FK-consistent
  *     with the symlinked customer/supplier tables — graph-mode dirs
  *     are for the graph/relational-agg tier only, not dim joins.
  *   - every other table: symlinked from the source dir unchanged.
  *
  * Usage: ScaleUp <srcSfDir> <outDir> [factor=10] [mode=docs|graph|all]
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val n = if (args.length > 2) args(2).toInt else 10
    val mode = if (args.length > 3) args(3) else "docs"
    require(Set("docs", "graph", "all")(mode), s"bad mode $mode")
    val doDocs = mode != "graph"
    val doGraph = mode != "docs"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Stride must clear every id domain it offsets (doc_id, vec_id,
    // event_id, user_id) or copies collide and the disjoint-population
    // / uniqueness-honesty claims below silently break. Derive it from
    // the actual maxima instead of assuming 1M, rounded up to a power
    // of ten so scaled ids stay eyeball-decodable (copy = id / stride).
    val idStride = {
      val maxDoc = spark.read.parquet(s"$src/documents.parquet")
        .agg(max(col("doc_id"))).head.getLong(0)
      val maxVec = spark.read.parquet(s"$src/embeddings.parquet")
        .agg(max(col("vec_id"))).head.getLong(0)
      val evm = spark.read.parquet(s"$src/events.parquet")
        .agg(max(col("event_id")), max(col("user_id"))).head
      val lim = spark.read.parquet(s"$src/lineitem.parquet")
        .agg(max(col("l_orderkey")), max(col("l_partkey")),
          max(col("l_suppkey"))).head
      val om = spark.read.parquet(s"$src/orders.parquet")
        .agg(max(col("o_orderkey")), max(col("o_custkey"))).head
      val maxId = Seq(maxDoc, maxVec, evm.getLong(0), evm.getLong(1),
        lim.getLong(0), lim.getLong(1), lim.getLong(2),
        om.getLong(0), om.getLong(1),
        999999L).max
      var s = 1000000L
      while (s <= maxId) s *= 10L
      s
    }

    val copies = spark.range(0, n).select(col("id").as("copy"))

    if (doDocs) {
    val docs = spark.read.parquet(s"$src/documents.parquet")
    // per-copy affine cipher alphabets (see Scaladoc): copy 0 is the
    // identity; copy i > 0 takes the i-th non-identity (a, b) pair.
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val units = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
    val maps = for (a <- units; b <- 0 until 26
                    if !(a == 1 && b == 0)) yield (a, b)
    require(n <= 1 + maps.size,
      s"docs mode supports factor <= ${1 + maps.size}")
    def cipherAlpha(i: Int): String = {
      val (a, b) = maps(i - 1)
      alpha.map(c => ('a' + (a * (c - 'a') + b) % 26).toChar)
    }
    val scaledDocs = (0 until n).map { i =>
      docs.select(
        (col("doc_id") + lit(i.toLong) * idStride).as("doc_id"),
        (if (i == 0) col("text")
         else translate(col("text"), alpha, cipherAlpha(i))).as("text"),
        col("lang"), col("source"))
    }.reduce(_ unionByName _)
      .withColumn("n_chars", length(col("text")).cast("long"))
    scaledDocs.repartition(32).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val dim = 64
    val scaledEmb = emb.crossJoin(copies)
      .select(
        (col("vec_id") + col("copy") * idStride).as("vec_id"),
        when(col("copy") === 0L, col("embedding"))
          .otherwise(concat(
            slice(col("embedding"), (col("copy") % dim + 1).cast("int"),
              lit(dim)),
            slice(col("embedding"), lit(1),
              (col("copy") % dim).cast("int"))))
          .as("embedding"),
        col("label"))
    scaledEmb.repartition(32).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")

    // events: N copies over DISJOINT user populations (user_id + copy
    // stride) on the SAME time span — more users in the same window is
    // how an event stream actually grows; per-user series structure
    // (gaps, LOCF runs, seasonal buckets) is identical per copy, so
    // per-user-keyed work (q82 resample grids, q04 latest-per-key)
    // grows exactly ×N while the hour/dow bucket COUNT stays fixed.
    // event_id strided too so uniqueness-keyed paths stay honest.
    val ev = spark.read.parquet(s"$src/events.parquet")
    ev.crossJoin(copies)
      .select(
        (col("event_id") + col("copy") * idStride).as("event_id"),
        col("ts"),
        (col("user_id") + col("copy") * idStride).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(32).write.mode("overwrite")
      .parquet(s"$out/events.parquet")
    }

    if (doGraph) {
      val li = spark.read.parquet(s"$src/lineitem.parquet")
      li.crossJoin(copies)
        .select(
          (col("l_orderkey") + col("copy") * idStride).as("l_orderkey"),
          (col("l_partkey") + col("copy") * idStride).as("l_partkey"),
          (col("l_suppkey") + col("copy") * idStride).as("l_suppkey"),
          col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax"), col("l_returnflag"),
          col("l_linestatus"), col("l_shipdate"))
        .repartition(32).write.mode("overwrite")
        .parquet(s"$out/lineitem.parquet")
      val o = spark.read.parquet(s"$src/orders.parquet")
      o.crossJoin(copies)
        .select(
          (col("o_orderkey") + col("copy") * idStride).as("o_orderkey"),
          (col("o_custkey") + col("copy") * idStride).as("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
          col("o_orderpriority"))
        .repartition(32).write.mode("overwrite")
        .parquet(s"$out/orders.parquet")
    }

    val linked = Seq("region", "nation", "customer", "supplier", "part") ++
      (if (doGraph) Nil else Seq("orders", "lineitem")) ++
      (if (doDocs) Nil
       else Seq("documents", "embeddings", "events"))
    for (t <- linked) {
      val link = Paths.get(s"$out/$t.parquet")
      if (!Files.exists(link))
        Files.createSymbolicLink(link, Paths.get(s"$src/$t.parquet"))
    }
    println(s"[scaleup] wrote $out at factor $n mode $mode: " +
      s"docs=${spark.read.parquet(s"$out/documents.parquet").count()}, " +
      s"emb=${spark.read.parquet(s"$out/embeddings.parquet").count()}, " +
      s"lineitem=${spark.read.parquet(s"$out/lineitem.parquet").count()}")
    spark.stop()
  }
}
