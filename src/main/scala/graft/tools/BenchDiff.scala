package graft.tools

/** Mechanical round-over-round bench comparison (r16 verdict item 3).
  *
  * The driver box's throughput swings ±40% between rounds (r13→r15
  * measured), so a raw total ratio cannot distinguish a real
  * regression from box noise. The analysis that cleared r15 — done by
  * hand twice — is: take the queries whose code did NOT change, their
  * median new/old ratio IS the box-noise line for the window, and
  * only per-query residuals above that line are real signals. This
  * tool runs that analysis off two committed bench artifacts.
  *
  * Usage:
  *   runMain graft.tools.BenchDiff OLD.json NEW.json [touched,names]
  *
  * where the optional third argument is a comma-separated list of
  * query names whose code changed between the two artifacts (they are
  * excluded from the noise-line estimate and reported separately).
  * Output: one human block + one machine-readable JSON line.
  */
object BenchDiff {

  /** Extract the flat {"name":sec,...} map inside "queries":{...} of a
    * one-line bench artifact. Regex is deliberate: the artifact is
    * machine-written by Bench.scala, flat, and dependency-free parsing
    * keeps this tool runnable anywhere sbt runs.
    */
  private[graft] def parseQueries(json: String): Map[String, Double] = {
    val start = json.indexOf("\"queries\":{")
    require(start >= 0, "no \"queries\" object found")
    val body = json.substring(start + "\"queries\":{".length,
      json.indexOf('}', start))
    """"([^"]+)":([-0-9.eE]+)""".r.findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  private[graft] def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) Double.NaN
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  final case class Diff(noiseLine: Double, nUntouched: Int,
                        regressions: Seq[(String, Double, Double, Double)],
                        improvements: Seq[(String, Double, Double, Double)],
                        touched: Seq[(String, Double, Double, Double)])

  /** Core analysis: per-query ratio new/old; the noise line is the
    * median ratio over UNTOUCHED queries; a residual = ratio/noiseLine.
    * Queries slower than `flag`× the line (and ≥ `minSec` in the new
    * run — sub-100 ms swings are scheduling jitter, not signal) are
    * regressions; symmetric for improvements.
    */
  private[graft] def analyze(oldQ: Map[String, Double],
                             newQ: Map[String, Double],
                             touchedNames: Set[String],
                             flag: Double = 1.30,
                             minSec: Double = 0.15): Diff = {
    val common = (oldQ.keySet intersect newQ.keySet).toSeq.sorted
    def row(n: String) = {
      val o = oldQ(n); val x = newQ(n)
      (n, o, x, if (o > 0) x / o else Double.NaN)
    }
    val untouched = common.filterNot(touchedNames)
    val line = median(untouched.map(n => newQ(n) / oldQ(n))
      .filterNot(_.isNaN))
    val resid = untouched.map(row).map { case (n, o, x, r) =>
      (n, o, x, r / line) }
    Diff(line, untouched.size,
      regressions = resid.filter(t => t._4 > flag && t._3 >= minSec)
        .sortBy(-_._4),
      improvements = resid.filter(t => t._4 < 1.0 / flag && t._2 >= minSec)
        .sortBy(_._4),
      touched = common.filter(touchedNames).map(row)
        .map { case (n, o, x, r) => (n, o, x, r / line) }.sortBy(-_._4))
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: BenchDiff OLD.json NEW.json [touched,query,names]")
    def read(p: String) = parseQueries(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8"))
    val oldQ = read(args(0))
    val newQ = read(args(1))
    val touchedNames: Set[String] =
      if (args.length >= 3) args(2).split(",").map(_.trim).toSet else Set.empty
    val d = analyze(oldQ, newQ, touchedNames)
    val only = (oldQ.keySet diff newQ.keySet, newQ.keySet diff oldQ.keySet)

    println(f"noise line (median new/old over ${d.nUntouched} untouched " +
      f"queries): ${d.noiseLine}%.3fx")
    def block(title: String, rows: Seq[(String, Double, Double, Double)]): Unit = {
      println(s"-- $title (${rows.size})")
      rows.foreach { case (n, o, x, res) =>
        println(f"  $n%-40s ${o}%7.2fs -> ${x}%7.2fs  residual ${res}%5.2fx") }
    }
    block("regressions beyond the line (residual > 1.30x, new >= 0.15s)",
      d.regressions)
    block("improvements beyond the line", d.improvements)
    if (d.touched.nonEmpty) block("touched this round (vs the line)", d.touched)
    if (only._1.nonEmpty) println(s"-- only in OLD: ${only._1.toSeq.sorted.mkString(",")}")
    if (only._2.nonEmpty) println(s"-- only in NEW: ${only._2.toSeq.sorted.mkString(",")}")
    // machine line for round-over-round tracking
    println("BENCHDIFF_JSON " + s"""{"noise_line":${d.noiseLine},""" +
      s""""n_untouched":${d.nUntouched},""" +
      s""""regressions":[${d.regressions.map(t => s""""${t._1}"""").mkString(",")}],""" +
      s""""improvements":[${d.improvements.map(t => s""""${t._1}"""").mkString(",")}]}""")
  }
}
