package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Text-analysis operators over the `documents` table (north-star
  * LLM-pipeline surface): quality scoring, language ID, token stats,
  * fingerprinting. All per-document metrics are computed with
  * higher-order array functions — row-local, zero shuffle, fully inside
  * whole-stage codegen — so they scale linearly with the scan.
  */
object TextOps {

  val EnStop: Seq[String] = Seq("the", "a", "of", "and", "is", "to", "in")

  /** Small marker vocabularies per language for the n-gram/stopword
    * language-ID heuristic. (The synthetic corpus is English-ish word
    * soup, so `en` dominates; the operator is the point, not the corpus.)
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "is", "to"),
    "es" -> Seq("el", "los", "las", "y", "es", "que"),
    "fr" -> Seq("le", "les", "et", "est", "une", "que"),
    "zh" -> Seq("de5", "le5", "shi4", "bu4", "wo3", "ni3"))

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** Per-document quality metrics: token count, mean token length,
    * stopword ratio, unique-token ratio, punctuation ratio.
    */
  def quality(docs: DataFrame): DataFrame = {
    import graft.functions.DetAgg.ratio
    val toks = tokens(col("text"))
    val n = size(toks).cast("long")
    val sumLen = aggregate(transform(toks, t => length(t).cast("long")),
      lit(0L), (s, x) => s + x)
    val punct = length(regexp_replace(col("text"), "[^.,!?;:]", "")).cast("long")
    // int/int ratios via exact integer rounding (DetAgg) — float round
    // of small-denominator rationals diverges between engines
    docs.select(
      col("doc_id"),
      n.as("n_tokens"),
      ratio(sumLen, n).as("avg_token_len"),
      ratio(countIn(toks, EnStop), n).as("stop_ratio"),
      ratio(size(array_distinct(toks)), n).as("uniq_ratio"),
      ratio(punct, col("n_chars")).as("punct_ratio"))
      .orderBy("doc_id")
  }

  /** Stopword-scoring language ID: argmax of per-language marker hits,
    * alphabetical tie-break, `unknown` when nothing matches.
    */
  def langId(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val scores = LangMarkers.map { case (l, ws) => l -> countIn(toks, ws) }
    val m = greatest(scores.map(_._2): _*)
    val pred = scores.foldRight(lit("unknown")) { case ((l, sc), other) =>
      when(sc === m && m > 0, lit(l)).otherwise(other)
    }
    docs.select(col("doc_id"), col("lang"), pred.as("pred_lang"))
      .orderBy("doc_id")
  }

  /** Token counting, whitespace vs regex ("BPE-ish" alphanumeric-run)
    * tokenizations side by side (north-star text-analysis surface). Both
    * are row-local array ops — no shuffle.
    */
  def tokenCounts(docs: DataFrame): DataFrame = {
    val ws = tokens(col("text"))
    val re = filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= "")
    docs.select(
      col("doc_id"),
      size(ws).cast("long").as("n_ws_tokens"),
      size(re).cast("long").as("n_re_tokens"),
      col("n_chars"))
      .orderBy("doc_id")
  }

  def tokenCountsOracle: String =
    """SELECT d.doc_id,
      |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_ws_tokens,
      |  (SELECT count(*) FROM (
      |     SELECT unnest(string_split_regex(lower(d.text), '[^a-z0-9]+')) AS tok) u
      |   WHERE u.tok <> '') AS n_re_tokens,
      |  d.n_chars
      |FROM documents d ORDER BY d.doc_id""".stripMargin

  /** Global token frequency top-k: explode → partial-aggregated count →
    * TakeOrdered. The explode is narrow; only (token, count) pairs
    * shuffle.
    */
  def tokenTopK(docs: DataFrame, k: Int = 20): DataFrame =
    docs.select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  /** Winnowing (MOSS) rolling-hash fingerprints: hash every w-shingle
    * at its POSITION, take the window minimum over each run of `win`
    * consecutive shingle hashes, and fingerprint the document as the
    * distinct set of those minima. The standard local-fingerprinting
    * guarantee: any shared substring of ≥ w+win−1 tokens contributes at
    * least one IDENTICAL fingerprint to both documents, while only
    * ~1/win of positions are retained.
    *
    * Scale shape: positional shingles are a narrow Generate off the
    * scan; the rolling min is one window pass partitioned by doc (the
    * per-doc shingle run always fits a partition); the summary is one
    * partial+final aggregate. No self-joins, no row blowup beyond the
    * shingle stream.
    */
  def winnowingFingerprints(docs: DataFrame, w: Int = 3,
                            win: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shingled = docs.select(col("doc_id"),
      posexplode(shingles(tokens(col("text")), w)).as(Seq("pos", "sh")))
    val rollMin = min(portableHash(col("sh"))).over(
      Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(-(win - 1), 0))
    shingled
      .select(col("doc_id"), col("pos"), rollMin.as("mh"))
      .where(col("pos") >= win - 1) // full windows only
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("mh")).as("n_fp"),
        min(col("mh")).as("min_fp"), max(col("mh")).as("max_fp"))
      .orderBy("doc_id")
  }

  def winnowingOracle(w: Int = 3, win: Int = 4): String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |s AS (
       |  SELECT doc_id, i AS pos,
       |    ${DedupOp.shingleConcatSql(w)} AS sh
       |  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - ${w - 1})) AS i
       |        FROM toks WHERE len(tk) >= $w) t
       |), h AS (
       |  SELECT doc_id, pos, ${portableHashSql("sh")} AS hx FROM s
       |), m AS (
       |  SELECT doc_id, pos,
       |    min(hx) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN ${win - 1} PRECEDING AND CURRENT ROW) AS mh
       |  FROM h
       |)
       |SELECT doc_id, count(DISTINCT mh) AS n_fp,
       |  min(mh) AS min_fp, max(mh) AS max_fp
       |FROM m WHERE pos >= $win GROUP BY 1 ORDER BY 1""".stripMargin

  /** Normalized content fingerprint (lower + whitespace-collapse + md5)
    * aggregated per source: duplicate-rate profiling.
    */
  def fingerprintBySource(docs: DataFrame): DataFrame = {
    val fp = md5(regexp_replace(lower(trim(col("text"))), "\\s+", " "))
    docs.select(col("source"), fp.as("fp"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           countDistinct(col("fp")).as("n_unique"))
      .orderBy("source")
  }

  // ---- DuckDB oracle generators (same constants as the Column forms) ----

  // Lambda-free SQL (DuckDB's `->` lambda syntax is deprecated in newer
  // versions; unnest-based long form is stable across all of them).

  private def inList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("(", ", ", ")")

  def qualityOracle: String = {
    import graft.functions.DetAgg.ratioSql
    s"""WITH d AS (SELECT doc_id, text, n_chars, string_split(text, ' ') AS tk
       |           FROM documents),
       |t AS (SELECT doc_id, unnest(tk) AS tok FROM d),
       |ag AS (
       |  SELECT doc_id, count(*) AS n_tokens, sum(len(tok)) AS sum_len,
       |    sum(CASE WHEN tok IN ${inList(EnStop)} THEN 1 ELSE 0 END) AS stops,
       |    count(DISTINCT tok) AS uniq
       |  FROM t GROUP BY 1)
       |SELECT d.doc_id,
       |  CAST(ag.n_tokens AS BIGINT) AS n_tokens,
       |  ${ratioSql("ag.sum_len", "ag.n_tokens")} AS avg_token_len,
       |  ${ratioSql("ag.stops", "ag.n_tokens")} AS stop_ratio,
       |  ${ratioSql("ag.uniq", "ag.n_tokens")} AS uniq_ratio,
       |  ${ratioSql("length(regexp_replace(d.text, '[^.,!?;:]', '', 'g'))", "d.n_chars")} AS punct_ratio
       |FROM d JOIN ag USING (doc_id) ORDER BY doc_id""".stripMargin
  }

  def langIdOracle: String = {
    val scoreCols = LangMarkers.map { case (l, ws) =>
      s"sum(CASE WHEN tok IN ${inList(ws)} THEN 1 ELSE 0 END) AS s_$l"
    }.mkString(",\n    ")
    val m = LangMarkers.map { case (l, _) => s"s_$l" }.mkString("greatest(", ", ", ")")
    val cases = LangMarkers
      .map { case (l, _) => s"WHEN s_$l = m THEN '$l'" }.mkString(" ")
    s"""WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS tk
       |           FROM documents),
       |t AS (SELECT doc_id, unnest(tk) AS tok FROM d),
       |sc AS (
       |  SELECT doc_id,
       |    $scoreCols
       |  FROM t GROUP BY 1)
       |SELECT d.doc_id, d.lang,
       |  CASE WHEN m = 0 THEN 'unknown' $cases ELSE 'unknown' END AS pred_lang
       |FROM (SELECT doc_id, $m AS m, s_de, s_en, s_es, s_fr, s_zh FROM sc) j
       |JOIN d USING (doc_id) ORDER BY d.doc_id""".stripMargin
  }

  def tokenTopKOracle(k: Int = 20): String =
    s"""SELECT token, count(*) AS n FROM (
       |  SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
       |GROUP BY 1 ORDER BY n DESC, token LIMIT $k""".stripMargin

  def fingerprintBySourceOracle: String =
    """SELECT source, count(*) AS n_docs,
      |  count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS n_unique
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin
}
