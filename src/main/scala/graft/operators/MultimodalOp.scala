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

  /** Frame sampling: every `stride`-th fixed-size block of the payload
    * becomes a frame row — the row-multiplying Generate shape of real
    * video frame extraction (stub: blocks of the byte stream stand in
    * for decoded frames; the schema, the explode, and the per-frame
    * byte slicing are the real plumbing). Pure expressions
    * (`sequence(0, nf-1, stride)` + binary `substring`), so the whole
    * op runs inside whole-stage codegen with no UDF and scales as a
    * narrow map + Generate — no shuffle.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 1024,
                   stride: Int = 4): DataFrame = {
    val nBytes = length(col("payload")).cast("long")
    // Column `/` is double division; exact for byte counts < 2^53
    val nf = ((nBytes + (frameBytes - 1)) / frameBytes).cast("long")
    media
      .select(col("doc_id"), col("kind"), col("payload"), nf.as("n_frames"))
      .where(col("n_frames") > 0)
      .select(col("doc_id"), col("kind"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong)))
          .as("frame_idx"),
        col("payload"))
      .select(col("doc_id"), col("kind"), col("n_frames"), col("frame_idx"),
        col("payload").substr((col("frame_idx") * frameBytes + 1).cast("int"),
          lit(frameBytes)).as("frame"))
  }

  /** Oracled summary of [[sampleFrames]]: frames per doc, frames kept by
    * the stride, and the byte mass of the kept frames (all codec-
    * independent facts DuckDB derives from the text's UTF-8 length).
    */
  def frameSampleSummary(docs: DataFrame, frameBytes: Int = 1024,
                         stride: Int = 4): DataFrame =
    sampleFrames(asMedia(docs), frameBytes, stride)
      .groupBy(col("doc_id"), col("kind"))
      .agg(max(col("n_frames")).as("n_frames"),
        count(lit(1)).as("n_sampled"),
        sum(length(col("frame")).cast("long")).as("sampled_bytes"))
      .orderBy("doc_id")

  def frameSampleOracle(frameBytes: Int = 1024, stride: Int = 4): String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       |      ELSE 'video' END AS kind,
       |    octet_length(encode(text)) AS n FROM documents
       |), f AS (
       |  SELECT doc_id, kind, (n + ${frameBytes - 1}) // $frameBytes AS nf, n
       |  FROM m WHERE n > 0
       |), s AS (
       |  SELECT doc_id, kind, nf,
       |    unnest(generate_series(0, CAST(nf - 1 AS BIGINT), $stride)) AS idx, n
       |  FROM f
       |)
       |SELECT doc_id, kind, CAST(nf AS BIGINT) AS n_frames,
       |  count(*) AS n_sampled,
       |  CAST(sum(least($frameBytes, n - idx * $frameBytes)) AS BIGINT)
       |    AS sampled_bytes
       |FROM s GROUP BY 1, 2, 3 ORDER BY doc_id""".stripMargin

  final case class BinRow(kind: String, bin: Int, n: Long)

  /** Byte-value histogram per media kind — the "pixel/sample value
    * distribution" audit a media pipeline runs to catch corrupt or
    * mis-encoded payloads (a spike at 0x00, a missing high band). The
    * 16 bins are computed in the batched partition-local decode loop
    * (where a real codec would emit sample values); the oracle
    * re-derives the same counts INDEPENDENTLY from the text stand-in's
    * character codes — the payload is its UTF-8 bytes and the corpus
    * is ASCII, so byte values ARE character codes.
    */
  def byteHistogram(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("kind"), col("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val bins = new Array[Long](16)
          var i = 0
          while (i < r.payload.length) {
            bins((r.payload(i) & 0xff) >> 4) += 1; i += 1
          }
          (0 until 16).iterator.filter(bins(_) > 0)
            .map(b => BinRow(r.kind, b, bins(b)))
        }
      }
      .toDF()
      .groupBy(col("kind"), col("bin"))
      .agg(sum(col("n")).as("n_bytes"))
      .select(col("kind"), col("bin").cast("long").as("bin"), col("n_bytes"))
      .orderBy("kind", "bin")
  }

  /** Oracle SQL twin of [[byteHistogram]] — character codes of the
    * text stand-in, bucketed the same way. */
  def byteHistogramOracle: String =
    s"""WITH ch AS (
       |  SELECT doc_id,
       |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       |      ELSE 'video' END AS kind,
       |    ascii(substr(text, i, 1)) AS c
       |  FROM (SELECT doc_id, text,
       |          unnest(generate_series(1, len(text))) AS i
       |        FROM documents) t
       |)
       |SELECT kind, CAST(c // 16 AS BIGINT) AS bin, count(*) AS n_bytes
       |FROM ch GROUP BY 1, 2 ORDER BY kind, bin""".stripMargin

  final case class WindowEnergy(doc_id: Long, kind: String, widx: Long,
                                energy: Long)

  /** Overlapping window-energy framing — the audio STFT framing shape
    * (window `win`, hop `hop`, FULL windows only), with per-window
    * energy = sum of byte values computed in the batch decode loop
    * (stand-in for a real spectral feature). Distinct from
    * [[sampleFrames]]'s non-overlapping stride: overlap is what makes
    * framing a row-multiplying transform with shared input bytes, and
    * the plumbing (typed Dataset, per-partition batch context, one row
    * per (doc, window)) is exactly a real feature extractor's. Rolled
    * up per doc for the gate; the oracle re-derives window sums from
    * character codes.
    */
  /** The shared batched partition-local window-energy extractor —
    * ONE definition of the framing + energy fold for [[windowEnergies]]
    * and [[mediaFingerprintDedup]].
    */
  private def windowEnergyRows(media: DataFrame, win: Int,
                               hop: Int): Dataset[WindowEnergy] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("kind"), col("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val n = r.payload.length
          val nw = if (n < win) 0 else (n - win) / hop + 1
          (0 until nw).iterator.map { w =>
            var s = 0L
            var i = w * hop
            val end = w * hop + win
            while (i < end) { s += r.payload(i) & 0xff; i += 1 }
            WindowEnergy(r.doc_id, r.kind, w.toLong, s)
          }
        }
      }
  }

  def windowEnergies(media: DataFrame, win: Int = 64,
                     hop: Int = 32): DataFrame = {
    windowEnergyRows(media, win, hop)
      .toDF()
      .groupBy(col("doc_id"), col("kind"))
      .agg(count(lit(1)).as("n_windows"),
        sum(col("energy")).as("total_energy"),
        max(col("energy")).as("max_energy"))
      .orderBy("doc_id")
  }

  /** The framing CTE chain of [[windowEnergiesOracle]] — ends in
    * `e(doc_id, kind, wx, energy)`, composable (q293's ACF consumes
    * the same framed series). */
  private def windowEnergyCtes(win: Int, hop: Int): String =
    s"""m AS (
       |  SELECT doc_id,
       |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       |      ELSE 'video' END AS kind,
       |    text, len(text) AS n
       |  FROM documents WHERE len(text) >= $win
       |), w AS (
       |  SELECT doc_id, kind, text,
       |    unnest(generate_series(0, CAST((n - $win) // $hop AS BIGINT))) AS wx
       |  FROM m
       |), e AS (
       |  SELECT doc_id, kind, wx,
       |    (SELECT sum(ascii(substr(w.text, CAST(w.wx * $hop + j.j AS INTEGER), 1)))
       |     FROM range(1, ${win + 1}) j(j)) AS energy
       |  FROM w
       |)""".stripMargin

  /** Oracle SQL twin of [[windowEnergies]]. */
  def windowEnergiesOracle(win: Int = 64, hop: Int = 32): String =
    s"""WITH ${windowEnergyCtes(win, hop)}
       |SELECT doc_id, kind, count(*) AS n_windows,
       |  CAST(sum(energy) AS BIGINT) AS total_energy,
       |  CAST(max(energy) AS BIGINT) AS max_energy
       |FROM e GROUP BY 1, 2 ORDER BY doc_id""".stripMargin

  /** q293: dominant-period histogram — per blob, the lag L ∈ [1, 8]
    * maximizing the window-energy autocorrelation (exact Pearson ppm,
    * [[graft.functions.DetAgg.corrPpm]]), rolled up per media kind.
    * The cheap pitch/tempo/frame-rate detector of classical audio
    * pipelines on the [[windowEnergies]] framing: a strong best-lag
    * mode across a kind says the corpus shares a periodic structure
    * (codec block size, beat, carrier) a feature extractor should
    * align to; a flat histogram says the energy series is aperiodic.
    * Ties break to the SMALLEST lag (the fundamental, not its
    * harmonic) and blobs need ≥ 8 overlap pairs at a lag to count —
    * both rules in the oracle verbatim.
    *
    * Scale shape: the framed series is batch-extracted per partition
    * ([[windowEnergies]]'s decode shape), the lag self-join is keyed
    * by (doc, widx) — per-doc local, never cross-doc — and the argmax
    * is a per-doc window over ≤ 8 rows; rollup is |kinds|·8 rows.
    */
  def acfLagHistogram(media: DataFrame, win: Int = 64, hop: Int = 32,
                      maxLag: Int = 8): DataFrame = {
    import graft.functions.DetAgg.corrPpm
    import org.apache.spark.sql.expressions.Window
    val spark = media.sparkSession
    import spark.implicits._
    val e = windowEnergyRows(media, win, hop).toDF()
    val lagDf = (1 to maxLag).map(_.toLong).toDF("lag")
    val acf = e.crossJoin(broadcast(lagDf))
      .join(e.select(col("doc_id").as("d2"), col("widx").as("w2"),
          col("energy").as("ey")),
        col("d2") === col("doc_id") && col("w2") === col("widx") + col("lag"))
      .groupBy(col("doc_id"), col("kind"), col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("energy")).as("sx"), sum(col("ey")).as("sy"),
        sum(col("energy") * col("energy")).as("sxx"),
        sum(col("ey") * col("ey")).as("syy"),
        sum(col("energy") * col("ey")).as("sxy"))
      .select(col("doc_id"), col("kind"), col("lag"),
        corrPpm(col("n"), col("sx"), col("sy"),
          col("sxx"), col("syy"), col("sxy")).as("acf_ppm"),
        col("n"))
      .where(col("n") >= 8L && col("acf_ppm").isNotNull)
    acf.withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("acf_ppm").desc, col("lag"))))
      .where(col("rk") === 1)
      .groupBy(col("kind"), col("lag").as("best_lag"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("kind", "best_lag")
  }

  /** Oracle SQL twin of [[acfLagHistogram]]. */
  def acfLagHistogramOracle(win: Int = 64, hop: Int = 32,
                            maxLag: Int = 8): String = {
    import graft.functions.DetAgg.corrPpmSql
    s"""WITH ${windowEnergyCtes(win, hop)},
       |l AS (SELECT CAST(lg AS BIGINT) AS lag FROM
       |      (VALUES ${(1 to maxLag).map(l => s"($l)").mkString(", ")}) t(lg)),
       |p AS (
       |  SELECT a.doc_id, a.kind, l.lag, a.energy AS ex, b.energy AS ey
       |  FROM e a CROSS JOIN l
       |  JOIN e b ON b.doc_id = a.doc_id AND b.wx = a.wx + l.lag
       |), mo AS (
       |  SELECT doc_id, kind, lag, count(*) AS n,
       |    CAST(sum(ex) AS BIGINT) AS sx, CAST(sum(ey) AS BIGINT) AS sy,
       |    CAST(sum(ex * ex) AS BIGINT) AS sxx,
       |    CAST(sum(ey * ey) AS BIGINT) AS syy,
       |    CAST(sum(ex * ey) AS BIGINT) AS sxy
       |  FROM p GROUP BY 1, 2, 3
       |), ac AS (
       |  SELECT doc_id, kind, lag,
       |    ${corrPpmSql("n", "sx", "sy", "sxx", "syy", "sxy")} AS acf_ppm
       |  FROM mo WHERE n >= 8
       |), rk AS (
       |  SELECT kind, lag,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY acf_ppm DESC, lag) AS rk
       |  FROM ac WHERE acf_ppm IS NOT NULL
       |)
       |SELECT kind, lag AS best_lag, count(*) AS n_docs
       |FROM rk WHERE rk = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  final case class WindowFlips(doc_id: Long, kind: String, widx: Long,
                               flips: Long)

  /** Zero-crossing-rate analog over the byte stream — the cheap
    * voiced/unvoiced (speech vs tone vs noise) discriminator of
    * classical audio pipelines, framed exactly like
    * [[windowEnergies]]: per overlapping window, the count of
    * DIRECTION CHANGES in the sample sequence (positions where the
    * first difference flips sign — the byte-domain stand-in for sign
    * crossings of a centered waveform; a real codec would feed decoded
    * PCM through the identical fold). High-flip windows ≈ noise;
    * low-flip ≈ silence/tonal — the complement of energy, which cannot
    * tell loud noise from a loud tone.
    *
    * Scale shape: identical to [[windowEnergies]] — partition-local
    * batched extraction (opaque payload decoding is not a Catalyst
    * Expression), one map-side-combined per-doc rollup.
    */
  def zcrSegments(media: DataFrame, win: Int = 64,
                  hop: Int = 32): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("kind"), col("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val n = r.payload.length
          val nw = if (n < win) 0 else (n - win) / hop + 1
          (0 until nw).iterator.map { w =>
            val start = w * hop
            val end = start + win
            var f = 0L
            var i = start + 1
            while (i < end - 1) {
              val d0 = (r.payload(i) & 0xff) - (r.payload(i - 1) & 0xff)
              val d1 = (r.payload(i + 1) & 0xff) - (r.payload(i) & 0xff)
              if (d0 * d1 < 0) f += 1
              i += 1
            }
            WindowFlips(r.doc_id, r.kind, w.toLong, f)
          }
        }
      }
      .toDF()
      .groupBy(col("doc_id"), col("kind"))
      .agg(count(lit(1)).as("n_windows"),
        sum(col("flips")).as("total_flips"),
        max(col("flips")).as("max_flips"))
      .orderBy("doc_id")
  }

  /** Oracle SQL twin of [[zcrSegments]] — re-derives the per-window
    * direction-change counts from character codes, the
    * [[windowEnergiesOracle]] framing. */
  def zcrSegmentsOracle(win: Int = 64, hop: Int = 32): String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       |      ELSE 'video' END AS kind,
       |    text, len(text) AS n
       |  FROM documents WHERE len(text) >= $win
       |), w AS (
       |  SELECT doc_id, kind, text,
       |    unnest(generate_series(0, CAST((n - $win) // $hop AS BIGINT))) AS wx
       |  FROM m
       |), f AS (
       |  SELECT doc_id, kind, wx,
       |    (SELECT sum(CASE WHEN
       |        (ascii(substr(w.text, CAST(w.wx * $hop + j.j + 1 AS INTEGER), 1))
       |          - ascii(substr(w.text, CAST(w.wx * $hop + j.j AS INTEGER), 1)))
       |        * (ascii(substr(w.text, CAST(w.wx * $hop + j.j AS INTEGER), 1))
       |          - ascii(substr(w.text, CAST(w.wx * $hop + j.j - 1 AS INTEGER), 1)))
       |        < 0 THEN 1 ELSE 0 END)
       |     FROM range(2, $win) j(j)) AS flips
       |  FROM w
       |)
       |SELECT doc_id, kind, count(*) AS n_windows,
       |  CAST(sum(flips) AS BIGINT) AS total_flips,
       |  CAST(max(flips) AS BIGINT) AS max_flips
       |FROM f GROUP BY 1, 2 ORDER BY doc_id""".stripMargin

  /** Perceptual-hash media dedup — the multimodal twin of q21's exact
    * text dedup: each payload's fingerprint is the md5 of its ordered
    * [[windowEnergyRows]] energy sequence (the stand-in for a
    * chromaprint/PDQ-style spectral hash; a real codec would feed
    * decoded samples through the same fold), and payloads sharing a
    * (kind, fingerprint) bucket collapse under the min-id keeper.
    * Payloads shorter than one window carry no fingerprint and are
    * skipped — a real pipeline routes those to a byte-exact md5 tier.
    *
    * Scale shape: feature extraction is partition-local; only
    * (doc_id, kind, 32-byte fp) rows shuffle into the bucket count —
    * the [[graft.operators.DedupOp.exact]] shape on a derived key.
    */
  def mediaFingerprintDedup(media: DataFrame, win: Int = 64,
                            hop: Int = 32): DataFrame =
    mediaFingerprints(media, win, hop)
      .groupBy(col("kind"), col("fp_md5"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .where(col("n_copies") >= 2L)
      .orderBy("kind", "fp_md5")

  /** ONE definition of the per-payload perceptual fingerprint
    * (md5 of the ordered [[windowEnergyRows]] energy sequence), shared
    * by [[mediaFingerprintDedup]] and [[crossModalDupAgreement]]. */
  private def mediaFingerprints(media: DataFrame, win: Int,
                                hop: Int): DataFrame =
    windowEnergyRows(media, win, hop)
      .toDF()
      .groupBy(col("doc_id"), col("kind"))
      .agg(md5(array_join(transform(
        array_sort(collect_list(struct(col("widx"), col("energy")))),
        x => x.getField("energy").cast("string")), ",")).as("fp_md5"))

  /** Oracle SQL twin of [[mediaFingerprintDedup]] (reuses the
    * [[windowEnergiesOracle]] energy derivation).
    */
  def mediaFingerprintDedupOracle(win: Int = 64, hop: Int = 32): String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       |      ELSE 'video' END AS kind,
       |    text, len(text) AS n
       |  FROM documents WHERE len(text) >= $win
       |), w AS (
       |  SELECT doc_id, kind, text,
       |    unnest(generate_series(0, CAST((n - $win) // $hop AS BIGINT))) AS wx
       |  FROM m
       |), e AS (
       |  SELECT doc_id, kind, wx,
       |    (SELECT sum(ascii(substr(w.text, CAST(w.wx * $hop + j.j AS INTEGER), 1)))
       |     FROM range(1, ${win + 1}) j(j)) AS energy
       |  FROM w
       |), fp AS (
       |  SELECT doc_id, kind,
       |    md5(string_agg(energy::VARCHAR, ',' ORDER BY wx)) AS fp_md5
       |  FROM e GROUP BY 1, 2
       |)
       |SELECT kind, fp_md5, min(doc_id) AS keeper, count(*) AS n_copies
       |FROM fp GROUP BY 1, 2 HAVING count(*) >= 2
       |ORDER BY kind, fp_md5""".stripMargin

  /** q242: cross-modal NEAR-DUP detector agreement — do the token-space
    * tier (MinHash-LSH verified pairs, the q26 detector) and a
    * perceptual media tier flag the SAME near-duplicate pairs? The
    * media detector here is the partial-match form a real pipeline
    * runs (chromaprint/PDQ segment matching): two payloads pair when
    * they share at least `minShared` POSITION-ALIGNED window energies —
    * the exact-sequence fingerprint of q221 cannot see near-dups at
    * all (one changed token breaks the md5), while position-aligned
    * windows survive localized edits. Measured on this corpus the two
    * tiers agree on most pairs with small one-sided residues — the
    * routing evidence a layered dedup pipeline needs (which modality's
    * detector to trust where), measured instead of assumed.
    *
    * Scale shape: the MinHash side is the existing banded one-scan
    * plan; the media side blocks on (window-index, energy) keys —
    * high-entropy by construction (position-qualified), df-capped at
    * `maxDf` (the MaxShingleDf stance, mirrored in the oracle) so no
    * key can go quadratic — then counts shared keys per candidate
    * pair. Three 1-row aggregates broadcast-join into the output row.
    * Deliberately kind-agnostic: perceptual fingerprints match across
    * container modalities.
    */
  def crossModalDupAgreement(docs: DataFrame, win: Int = 64,
                             hop: Int = 32, minShared: Int = 6,
                             maxDf: Int = 64): DataFrame = {
    import graft.functions.DetAgg.halfUpDiv
    val textPairs = graft.operators.DedupOp.minhashLsh(docs)
      .select(col("da").as("a"), col("db").as("b"))
    val e = windowEnergyRows(asMedia(docs), win, hop).toDF()
      .select(col("doc_id"), col("widx"), col("energy"))
    val keys = e.groupBy(col("widx"), col("energy"))
      .agg(count(lit(1)).as("kdf"))
      .where(col("kdf") <= maxDf.toLong)
      .select(col("widx"), col("energy"))
    val capped = e.join(keys, Seq("widx", "energy"))
    val mediaPairs = capped
      .select(col("widx"), col("energy"), col("doc_id").as("a"))
      .join(capped.select(col("widx"), col("energy"),
        col("doc_id").as("b")), Seq("widx", "energy"))
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared.toLong)
      .select(col("a"), col("b"))
    val nt = textPairs.agg(count(lit(1)).as("n_text_pairs"))
    val nm = mediaPairs.agg(count(lit(1)).as("n_media_pairs"))
    val nb = textPairs.join(mediaPairs, Seq("a", "b"))
      .agg(count(lit(1)).as("n_both"))
    nt.crossJoin(nm).crossJoin(nb)
      .select(col("n_text_pairs"), col("n_media_pairs"), col("n_both"),
        (col("n_text_pairs") - col("n_both")).as("text_only"),
        (col("n_media_pairs") - col("n_both")).as("media_only"),
        when(col("n_text_pairs") + col("n_media_pairs") - col("n_both") > 0,
          halfUpDiv(col("n_both") * 1000000L,
            col("n_text_pairs") + col("n_media_pairs") - col("n_both")))
          .otherwise(0L).as("agree_jacc_ppm"))
  }

  /** Oracle SQL twin of [[crossModalDupAgreement]] — the MinHash pair
    * chain composed from [[graft.operators.DedupOp.minhashPairCtes]]
    * (one definition with q26), the media tier re-derived from
    * character codes with the same df cap and share threshold. */
  def crossModalDupAgreementOracle(win: Int = 64, hop: Int = 32,
                                   minShared: Int = 6,
                                   maxDf: Int = 64): String = {
    import graft.functions.DetAgg.halfUpDivSql
    s"""WITH ${graft.operators.DedupOp.minhashPairCtes(0.5)},
       |tp AS (SELECT da AS a, db AS b FROM mhp),
       |m AS (
       |  SELECT doc_id, text, len(text) AS n
       |  FROM documents WHERE len(text) >= $win
       |), w AS (
       |  SELECT doc_id, text,
       |    unnest(generate_series(0, CAST((n - $win) // $hop AS BIGINT)))
       |      AS wx
       |  FROM m
       |), e AS (
       |  SELECT doc_id, wx,
       |    (SELECT sum(ascii(substr(w.text,
       |        CAST(w.wx * $hop + j.j AS INTEGER), 1)))
       |     FROM range(1, ${win + 1}) j(j)) AS energy
       |  FROM w
       |), kdf AS (
       |  SELECT wx, energy FROM e GROUP BY 1, 2
       |  HAVING count(*) <= $maxDf
       |), ec AS (
       |  SELECT e.doc_id, e.wx, e.energy
       |  FROM e JOIN kdf ON kdf.wx = e.wx AND kdf.energy = e.energy
       |), mp AS (
       |  SELECT a, b FROM (
       |    SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared
       |    FROM ec x JOIN ec y
       |      ON x.wx = y.wx AND x.energy = y.energy
       |        AND x.doc_id < y.doc_id
       |    GROUP BY 1, 2) t
       |  WHERE shared >= $minShared
       |), nt AS (SELECT count(*) AS n_text_pairs FROM tp),
       |nm AS (SELECT count(*) AS n_media_pairs FROM mp),
       |nb AS (
       |  SELECT count(*) AS n_both
       |  FROM tp JOIN mp ON tp.a = mp.a AND tp.b = mp.b
       |)
       |SELECT CAST(n_text_pairs AS BIGINT) AS n_text_pairs,
       |  CAST(n_media_pairs AS BIGINT) AS n_media_pairs,
       |  CAST(n_both AS BIGINT) AS n_both,
       |  CAST(n_text_pairs - n_both AS BIGINT) AS text_only,
       |  CAST(n_media_pairs - n_both AS BIGINT) AS media_only,
       |  CASE WHEN n_text_pairs + n_media_pairs - n_both > 0
       |    THEN ${halfUpDivSql("n_both * 1000000",
                 "n_text_pairs + n_media_pairs - n_both")}
       |    ELSE 0 END AS agree_jacc_ppm
       |FROM nt, nm, nb""".stripMargin
  }

  final case class FrameDiff(doc_id: Long, kind: String, fidx: Long,
                             diff: Long)

  /** Scene-change (cut) detection — the video-segmentation primitive:
    * frame the payload into FULL `frameBytes` blocks, per-frame
    * "luma" = exact byte sum (the codec stand-in, computed in the same
    * batched partition-local decode loop as [[byteHistogram]]), flag a
    * cut wherever the adjacent-frame absolute difference exceeds
    * `cutMin`. Real scene detection thresholds exactly this statistic
    * over decoded luma planes; every Spark-side piece (typed Dataset
    * batch loop, per-doc transition rows, threshold roll-up) is the
    * production plumbing. Docs shorter than two full frames have no
    * transitions and drop out, mirrored by the oracle.
    */
  def sceneChanges(media: DataFrame, frameBytes: Int = 256,
                   cutMin: Long = 300L): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("kind"), col("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val nf = r.payload.length / frameBytes
          if (nf < 2) Iterator.empty
          else {
            val sums = new Array[Long](nf)
            var f = 0
            while (f < nf) {
              var s = 0L
              var i = f * frameBytes
              val end = i + frameBytes
              while (i < end) { s += r.payload(i) & 0xff; i += 1 }
              sums(f) = s; f += 1
            }
            (1 until nf).iterator.map(j =>
              FrameDiff(r.doc_id, r.kind, j.toLong,
                math.abs(sums(j) - sums(j - 1))))
          }
        }
      }
      .toDF()
      .groupBy(col("doc_id"), col("kind"))
      .agg(count(lit(1)).as("n_transitions"),
        sum(when(col("diff") > cutMin, 1L).otherwise(0L)).as("n_cuts"),
        max(col("diff")).as("max_diff"),
        sum(col("diff")).as("sum_diff"))
      .orderBy("doc_id")
  }

  /** Oracle SQL twin of [[sceneChanges]] — frame sums re-derived
    * independently from character codes (ASCII corpus: bytes ARE char
    * codes), adjacent diffs via lag().
    */
  def sceneChangesOracle(frameBytes: Int = 256,
                         cutMin: Long = 300L): String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       |      ELSE 'video' END AS kind,
       |    text, len(text) // $frameBytes AS nf
       |  FROM documents WHERE len(text) >= ${2 * frameBytes}
       |), f AS (
       |  SELECT doc_id, kind, text,
       |    unnest(generate_series(0, CAST(nf - 1 AS BIGINT))) AS fx
       |  FROM m
       |), s AS (
       |  SELECT doc_id, kind, fx,
       |    (SELECT sum(ascii(substr(f.text,
       |        CAST(f.fx * $frameBytes + j.j AS INTEGER), 1)))
       |     FROM range(1, ${frameBytes + 1}) j(j)) AS fsum
       |  FROM f
       |), d AS (
       |  SELECT doc_id, kind, fx,
       |    abs(fsum - lag(fsum) OVER (PARTITION BY doc_id ORDER BY fx))
       |      AS diff
       |  FROM s
       |)
       |SELECT doc_id, kind, count(*) AS n_transitions,
       |  CAST(sum(CASE WHEN diff > $cutMin THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_cuts,
       |  CAST(max(diff) AS BIGINT) AS max_diff,
       |  CAST(sum(diff) AS BIGINT) AS sum_diff
       |FROM d WHERE diff IS NOT NULL
       |GROUP BY 1, 2 ORDER BY doc_id""".stripMargin

  /** q239: silence-segment detection — the audio-preprocessing
    * primitive that trims dead air before a corpus is packed: windows
    * whose energy falls below `silMax` are "silent", and CONSECUTIVE
    * silent windows coalesce into segments via gaps-and-islands on the
    * window index (the q207 streaks kernel applied to the
    * [[windowEnergyRows]] framing). Per payload: window/silence
    * counts, the segment count, the longest segment, and the silent
    * fraction in ppm — the numbers a trimming pass needs to decide
    * what to cut and whether a source is mostly dead air. `silMax`
    * defaults to ≈ p15 of the corpus energy distribution (measured, so
    * the branch is non-degenerate at every sf — the q227 rule).
    *
    * Scale shape: the decode loop emits (doc, widx, energy) rows once;
    * the lag/row_number windows partition BY PAYLOAD (windows per doc
    * are payload-length-bounded, never corpus-sized); the island
    * rollup is two map-side-combined groupBys. Payloads shorter than
    * one window drop out (the q187 contract).
    */
  def silenceSegments(media: DataFrame, win: Int = 64, hop: Int = 32,
                      silMax: Long = 5940L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.DetAgg.halfUpDiv
    val e = windowEnergyRows(media, win, hop).toDF()
      .withColumn("silent", col("energy") < silMax)
    val totals = e.groupBy(col("doc_id"), col("kind"))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("silent"), 1L).otherwise(0L)).as("n_silent"))
    val sil = e.filter(col("silent"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("widx"))))
      .groupBy(col("doc_id"), col("kind"), (col("widx") - col("rn")).as("g"))
      .agg(count(lit(1)).as("run_len"))
      .groupBy(col("doc_id"), col("kind"))
      .agg(count(lit(1)).as("n_segments"), max(col("run_len")).as("max_run"))
    totals.join(sil, Seq("doc_id", "kind"), "left")
      .select(col("doc_id"), col("kind"), col("n_windows"), col("n_silent"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("max_run"), lit(0L)).as("max_run"),
        halfUpDiv(col("n_silent") * 1000000L, col("n_windows"))
          .as("silent_ppm"))
      .orderBy("doc_id")
  }

  /** Oracle SQL twin of [[silenceSegments]] — energies re-derived from
    * character codes (the [[windowEnergiesOracle]] derivation), islands
    * via row_number difference.
    */
  def silenceSegmentsOracle(win: Int = 64, hop: Int = 32,
                            silMax: Long = 5940L): String = {
    import graft.functions.DetAgg.halfUpDivSql
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       |      ELSE 'video' END AS kind,
       |    text, len(text) AS n
       |  FROM documents WHERE len(text) >= $win
       |), w AS (
       |  SELECT doc_id, kind, text,
       |    unnest(generate_series(0, CAST((n - $win) // $hop AS BIGINT)))
       |      AS wx
       |  FROM m
       |), e AS (
       |  SELECT doc_id, kind, wx,
       |    (SELECT sum(ascii(substr(w.text,
       |        CAST(w.wx * $hop + j.j AS INTEGER), 1)))
       |     FROM range(1, ${win + 1}) j(j)) < $silMax AS silent
       |  FROM w
       |), tot AS (
       |  SELECT doc_id, kind, count(*) AS n_windows,
       |    CAST(sum(CASE WHEN silent THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_silent
       |  FROM e GROUP BY 1, 2
       |), runs AS (
       |  SELECT doc_id, kind, g, count(*) AS run_len FROM (
       |    SELECT doc_id, kind, wx,
       |      wx - row_number() OVER (PARTITION BY doc_id ORDER BY wx) AS g
       |    FROM e WHERE silent) t
       |  GROUP BY 1, 2, 3
       |), segs AS (
       |  SELECT doc_id, kind, count(*) AS n_segments,
       |    CAST(max(run_len) AS BIGINT) AS max_run
       |  FROM runs GROUP BY 1, 2
       |)
       |SELECT t.doc_id, t.kind, t.n_windows, t.n_silent,
       |  CAST(coalesce(s.n_segments, 0) AS BIGINT) AS n_segments,
       |  coalesce(s.max_run, 0) AS max_run,
       |  ${halfUpDivSql("t.n_silent * 1000000", "t.n_windows")}
       |    AS silent_ppm
       |FROM tot t
       |LEFT JOIN segs s ON s.doc_id = t.doc_id AND s.kind = t.kind
       |ORDER BY t.doc_id""".stripMargin
  }

  /** Batched partition-local "resize": keeps every `factor`-th byte —
    * the stub stand-in for a codec's resample, with the real plumbing
    * (typed Dataset, one batch context per partition, binary-in/
    * binary-out schema, metadata untouched upstream). Deterministic so
    * the spec can assert shape and content.
    */
  def resizeStub(media: DataFrame, factor: Int = 4): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    require(factor >= 1)
    media.select(col("doc_id"), col("kind"), col("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val out = new Array[Byte]((r.payload.length + factor - 1) / factor)
          var i = 0
          while (i < out.length) { out(i) = r.payload(i * factor); i += 1 }
          MediaRow(r.doc_id, r.kind, out)
        }
      }
  }
}
