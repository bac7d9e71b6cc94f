package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.BenchDiff

/** The round-over-round noise-line analysis (tools/BenchDiff): the
  * median ratio over untouched queries defines the box-noise line and
  * only residuals above it are flagged — the by-hand analysis that
  * cleared r15, made mechanical.
  */
class BenchDiffSpec extends AnyFunSuite {

  test("parseQueries reads the flat bench artifact shape") {
    val json = """{"metric":"total","value":12.5,"unit":"sec","failed":0,""" +
      """"queries":{"q01_a":0.83,"q02_b":1.5,"q03_c":0.007},"sf":"sf0.1"}"""
    assert(BenchDiff.parseQueries(json) ===
      Map("q01_a" -> 0.83, "q02_b" -> 1.5, "q03_c" -> 0.007))
  }

  test("uniform box inflation is absorbed by the noise line; a real " +
       "regression and a real win stand out as residuals") {
    // old run; new run = 1.4x box noise on everything, except q_bad
    // regressed 3x beyond it and q_good improved 2x beyond it
    val old = Map("q1" -> 1.0, "q2" -> 2.0, "q3" -> 0.5, "q4" -> 1.5,
      "q_bad" -> 1.0, "q_good" -> 2.0, "q_tiny" -> 0.01)
    val nw = old.map { case (k, v) =>
      k -> (v * 1.4 * (k match {
        case "q_bad" => 3.0
        case "q_good" => 0.5
        case "q_tiny" => 5.0 // huge ratio but sub-minSec: jitter, ignored
        case _ => 1.0
      }))
    }
    val d = BenchDiff.analyze(old, nw, touchedNames = Set.empty)
    assert(math.abs(d.noiseLine - 1.4) < 1e-9)
    assert(d.regressions.map(_._1) === Seq("q_bad"))
    assert(math.abs(d.regressions.head._4 - 3.0) < 1e-9)
    assert(d.improvements.map(_._1) === Seq("q_good"))
  }

  test("touched queries are excluded from the line and reported apart") {
    val old = Map("q1" -> 1.0, "q2" -> 1.0, "q3" -> 1.0, "q_new" -> 10.0)
    val nw = Map("q1" -> 2.0, "q2" -> 2.0, "q3" -> 2.0, "q_new" -> 5.0)
    val d = BenchDiff.analyze(old, nw, touchedNames = Set("q_new"))
    assert(d.noiseLine === 2.0)
    assert(d.nUntouched === 3)
    assert(d.regressions.isEmpty) // the 2x is the line, not a signal
    assert(d.touched.map(_._1) === Seq("q_new"))
    assert(math.abs(d.touched.head._4 - 0.25) < 1e-9) // 0.5x / 2.0 line
  }

  test("queries present in only one artifact never crash the analysis") {
    val d = BenchDiff.analyze(Map("q1" -> 1.0, "gone" -> 1.0),
      Map("q1" -> 1.1, "added" -> 9.9), Set.empty)
    assert(d.nUntouched === 1)
    assert(math.abs(d.noiseLine - 1.1) < 1e-9)
  }
}
