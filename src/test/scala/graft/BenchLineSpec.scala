package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench→driver stdout contract (r16 verdict item 2): every
  * BENCH_r08..r16 artifact arrived `parsed: null` because the
  * harness keeps the last ~2000 chars of stdout and parses the
  * literal LAST line — which was sbt's `[success]` banner, not the
  * JSON. build.sbt now pins `run / outputStrategy := StdoutOutput` +
  * `Global / showSuccess := false` so the compact line IS the last
  * stdout line; this spec simulates exactly that tail-capture parse
  * against the line renderers Bench prints.
  */
class BenchLineSpec extends AnyFunSuite {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  private val results: Seq[(String, Double)] =
    (1 to 300).map(i => f"q$i%03d_name" -> (0.05 + (i % 17) * 0.13))
  private val total = results.map(_._2).sum

  /** The driver-shaped parse: keep the last 2000 chars, take the last
    * non-empty line, json-parse it. */
  private def tailParse(stdout: String): JValue = {
    val tail = stdout.takeRight(2000)
    val last = tail.split('\n').filter(_.nonEmpty).last
    JsonMethods.parse(last)
  }

  test("compact line survives a last-2000-chars/last-line parse after " +
       "realistic preceding stdout noise") {
    val line = Bench.compactJsonLine(results, failed = 0, total,
      "/root/testdata/sf0.1")
    assert(!line.contains("\n"))
    assert(line.length < 1500, s"compact line too long: ${line.length}")
    val stdout = "[info] welcome to sbt\n" +
      "[info] running (fork) graft.Bench\n" +
      ("x" * 5000) + "\n" + line + "\n"
    val j = tailParse(stdout)
    assert((j \ "metric") === JString("total"))
    assert((j \ "failed") === JInt(0))
    val qs = (j \ "queries").asInstanceOf[JObject].obj
    assert(qs.size === 12) // worst-12 of 300
    val JInt(n) = (j \ "n_queries"): @unchecked
    assert(n === 300)
  }

  test("mass-failure compact line still fits the tail buffer and keeps " +
       "total = -1 sentinel") {
    val failedResults = results.map { case (k, _) => k -> -1.0 }
    val line = Bench.compactJsonLine(failedResults, failed = 300, -1.0,
      "/root/testdata/sf0.1")
    assert(!line.contains("\n") && line.length < 1500)
    val j = tailParse("noise\n" + line + "\n")
    val JDouble(v) = (j \ "value"): @unchecked
    assert(v === -1.0)
    assert((j \ "failed") === JInt(300))
  }

  test("full line carries every query and parses") {
    val line = Bench.fullJsonLine(results, failed = 0, total, "sf")
    val j = JsonMethods.parse(line)
    assert((j \ "queries").asInstanceOf[JObject].obj.size === 300)
  }
}
