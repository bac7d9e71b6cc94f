package graft.tools

/** Mechanical scale-anchor comparison — BenchDiff's sibling for the
  * ×10/×30/×100 rehearsal family (r16 pickup item 2).
  *
  * SCALE_ANCHORS.json records (query, scale) → runs_sec across rounds;
  * the recorded anchor statistic is MIN-of-N (the ×100 rows showed
  * ±45% run-to-run scatter at that scale — q262's phantom "exponent
  * 1.27" was a single inflated run, resolved by a fresh ×3 series).
  * This tool joins a fresh anchor file against the committed one the
  * same way BenchDiff joins two bench maps: per-key ratio of the MIN
  * statistics, median ratio over all keys = the box-noise line for the
  * window, and only residuals beyond the line are real scale
  * regressions.
  *
  * Usage:
  *   runMain graft.tools.ScaleDiff OLD.json NEW.json
  *
  * Both files use the SCALE_ANCHORS.json schema (an "anchors" array of
  * flat objects with "query", "scale", "runs_sec", "round_measured").
  * When a (query, scale) key appears in several rows of one file
  * (rounds append rather than overwrite), the row with the highest
  * round_measured is the comparand — the freshest measurement window.
  * Output: one human block + one SCALEDIFF_JSON machine line.
  */
object ScaleDiff {

  final case class Anchor(query: String, scale: String,
                          runs: Seq[Double], round: Int) {
    /** MIN-of-N — the recorded anchor statistic for scale rows. */
    def stat: Double = runs.min
  }

  /** Parse the "anchors" array of a SCALE_ANCHORS-schema file. The
    * anchor objects are flat (no nested braces), so a dependency-free
    * regex over `{...}` spans after the "anchors" key is exact — the
    * BenchDiff parsing stance.
    */
  private[graft] def parseAnchors(json: String): Seq[Anchor] = {
    val start = json.indexOf("\"anchors\"")
    require(start >= 0, "no \"anchors\" array found")
    val body = json.substring(start)
    val obj = """\{[^{}]*\}""".r
    def field(o: String, k: String): Option[String] =
      (""""""" + k + """"\s*:\s*("([^"]*)"|\[[^\]]*\]|[-0-9.eE]+)""").r
        .findFirstMatchIn(o).map(m =>
          Option(m.group(2)).getOrElse(m.group(1)))
    obj.findAllIn(body).toSeq.flatMap { o =>
      for {
        q <- field(o, "query")
        s <- field(o, "scale")
        r <- field(o, "runs_sec")
      } yield Anchor(q, s,
        """[-0-9.eE]+""".r.findAllIn(r).map(_.toDouble).toSeq,
        field(o, "round_measured").map(_.takeWhile(_.isDigit))
          .filter(_.nonEmpty).map(_.toInt).getOrElse(0))
    }
  }

  /** Keep the freshest row per (query, scale). */
  private[graft] def freshest(as: Seq[Anchor]): Map[(String, String), Anchor] =
    as.groupBy(a => (a.query, a.scale)).map { case (k, rows) =>
      k -> rows.maxBy(_.round)
    }

  final case class Diff(noiseLine: Double, n: Int,
                        regressions: Seq[(String, Double, Double, Double)],
                        improvements: Seq[(String, Double, Double, Double)])

  /** Per-key ratio newMin/oldMin; the line is the median ratio; a
    * residual = ratio/line. Scale runs are long (seconds to minutes),
    * so no minSec floor is needed — every key is signal-sized.
    */
  private[graft] def analyze(oldA: Seq[Anchor], newA: Seq[Anchor],
                             flag: Double = 1.30): Diff = {
    val o = freshest(oldA); val n = freshest(newA)
    val keys = (o.keySet intersect n.keySet).toSeq.sortBy(k => (k._1, k._2))
    val rows = keys.map { k =>
      val os = o(k).stat; val ns = n(k).stat
      (s"${k._1}@${k._2}", os, ns, ns / os)
    }
    val line = BenchDiff.median(rows.map(_._4))
    val resid = rows.map { case (k, os, ns, r) => (k, os, ns, r / line) }
    Diff(line, keys.size,
      regressions = resid.filter(_._4 > flag).sortBy(-_._4),
      improvements = resid.filter(_._4 < 1.0 / flag).sortBy(_._4))
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleDiff OLD.json NEW.json")
    def read(p: String) = parseAnchors(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8"))
    val d = analyze(read(args(0)), read(args(1)))
    println(f"scale noise line (median newMin/oldMin over ${d.n} " +
      f"(query,scale) keys): ${d.noiseLine}%.3fx")
    def block(t: String, rows: Seq[(String, Double, Double, Double)]): Unit = {
      println(s"-- $t (${rows.size})")
      rows.foreach { case (k, os, ns, res) =>
        println(f"  $k%-36s ${os}%8.1fs -> ${ns}%8.1fs  residual ${res}%5.2fx") }
    }
    block("scale regressions beyond the line (residual > 1.30x)",
      d.regressions)
    block("improvements beyond the line", d.improvements)
    println("SCALEDIFF_JSON " + s"""{"noise_line":${d.noiseLine},""" +
      s""""n_keys":${d.n},""" +
      s""""regressions":[${d.regressions.map(t => s""""${t._1}"""").mkString(",")}],""" +
      s""""improvements":[${d.improvements.map(t => s""""${t._1}"""").mkString(",")}]}""")
  }
}
