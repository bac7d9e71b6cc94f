package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.ScaleDiff
import graft.tools.ScaleDiff.Anchor

/** The scale-anchor residual analysis (tools/ScaleDiff): MIN-of-N per
  * (query, scale) key, freshest round wins when rounds append rows,
  * median ratio = box line — the SCALE_ANCHORS.json cadence made
  * mechanical the way BenchDiff mechanized the bench compare.
  */
class ScaleDiffSpec extends AnyFunSuite {

  private val sample =
    """{
      |  "round": 16,
      |  "box_calibration": {"note": "nested object must not confuse the parser",
      |    "expansion_floor_x30_sec": [26.78, 20.36]},
      |  "anchors": [
      |    {"query": "q206_mutual_knn", "scale": "x30", "pairs": 400000000,
      |     "runs_sec": [64.08, 39.80, 44.39], "round_measured": 16,
      |     "note": "steady 39.8"},
      |    {"query": "q206_mutual_knn", "scale": "x30",
      |     "runs_sec": [80.0, 70.0], "round_measured": 15,
      |     "note": "stale row - freshest (r16) must win"},
      |    {"query": "q188_binary_recall", "scale": "x100",
      |     "runs_sec": [1500.24, 1184.60], "round_measured": 16}
      |  ]
      |}""".stripMargin

  test("parseAnchors reads flat anchor objects past a nested calibration " +
       "object; missing round_measured defaults to 0") {
    val as = ScaleDiff.parseAnchors(sample)
    assert(as.size === 3)
    assert(as.head === Anchor("q206_mutual_knn", "x30",
      Seq(64.08, 39.80, 44.39), 16))
    val noRound = ScaleDiff.parseAnchors(
      """"anchors":[{"query":"q","scale":"x10","runs_sec":[1.0,2.0]}]""")
    assert(noRound === Seq(Anchor("q", "x10", Seq(1.0, 2.0), 0)))
  }

  test("freshest keeps the highest-round row per key; stat is MIN-of-N") {
    val f = ScaleDiff.freshest(ScaleDiff.parseAnchors(sample))
    assert(f(("q206_mutual_knn", "x30")).runs === Seq(64.08, 39.80, 44.39))
    assert(math.abs(f(("q206_mutual_knn", "x30")).stat - 39.80) < 1e-9)
  }

  test("uniform scale-window inflation is the line; a real scale " +
       "regression stands out as a residual") {
    def a(q: String, s: String, r: Double*) = Anchor(q, s, r, 16)
    val old = Seq(a("q206", "x30", 40.0, 44.0), a("q262", "x30", 31.3),
      a("q188", "x30", 154.0, 166.0), a("q107", "x30", 3.3),
      a("q206", "x100", 502.5))
    // new window runs 1.2x hot everywhere except q188 regressed 2x more
    val nw = old.map(x => x.copy(runs = x.runs.map(_ * 1.2 *
      (if (x.query == "q188") 2.0 else 1.0))))
    val d = ScaleDiff.analyze(old, nw)
    assert(math.abs(d.noiseLine - 1.2) < 1e-9)
    assert(d.regressions.map(_._1) === Seq("q188@x30"))
    assert(math.abs(d.regressions.head._4 - 2.0) < 1e-9)
    assert(d.improvements.isEmpty)
  }

  test("keys present in only one file never crash the analysis") {
    val d = ScaleDiff.analyze(
      Seq(Anchor("q1", "x30", Seq(10.0), 15), Anchor("gone", "x30", Seq(1.0), 15)),
      Seq(Anchor("q1", "x30", Seq(11.0), 16), Anchor("new", "x100", Seq(9.0), 16)))
    assert(d.n === 1)
    assert(math.abs(d.noiseLine - 1.1) < 1e-9)
  }
}
