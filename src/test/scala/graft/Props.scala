package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.functions.GeoFunctions

/** Property-based suites (SURVEY.md §5.3) — pure-Scala properties of the
  * kernels whose semantics the engine's operators rely on. ScalaCheck's
  * own runner (sbt detects `Properties` natively; no scalatest bridge).
  */
object GeoProps extends Properties("PNPOLY") {

  /** Independent winding-number oracle (same as GeoSpec). */
  private def winding(lat: Double, lng: Double,
                      lats: Seq[Double], lngs: Seq[Double]): Boolean = {
    var total = 0.0
    val n = lats.length
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      val a1 = math.atan2(lats(i) - lat, lngs(i) - lng)
      val a2 = math.atan2(lats(j) - lat, lngs(j) - lng)
      var d = a2 - a1
      while (d > math.Pi) d -= 2 * math.Pi
      while (d < -math.Pi) d += 2 * math.Pi
      total += d
      i += 1
    }
    math.abs(total) > math.Pi
  }

  /** Random convex polygon: points on a circle at sorted angles. */
  private val convexPolyGen: Gen[(Seq[Double], Seq[Double])] = for {
    n <- Gen.choose(3, 12)
    angles <- Gen.listOfN(n, Gen.choose(0.0, 2 * math.Pi)).map(_.distinct.sorted)
    if angles.length >= 3
    r <- Gen.choose(0.5, 2.0)
  } yield (angles.map(a => r * math.sin(a)), angles.map(a => r * math.cos(a)))

  property("agrees with winding-number oracle on random convex polygons") =
    forAll(convexPolyGen, Gen.choose(-2.5, 2.5), Gen.choose(-2.5, 2.5)) {
      case ((lats, lngs), lat, lng) =>
        GeoFunctions.containsPoint(lat, lng, lats, lngs) ==
          winding(lat, lng, lats, lngs)
    }

  property("polygon centroid of a convex polygon is inside") =
    forAll(convexPolyGen) { case (lats, lngs) =>
      val cLat = lats.sum / lats.length
      val cLng = lngs.sum / lngs.length
      GeoFunctions.containsPoint(cLat, cLng, lats, lngs)
    }
}

object HashProps extends Properties("PortableHash") {
  private def recipe(s: String): Long = {
    val padded = s.padTo(8, '#').take(8)
    val h = padded.foldLeft(0L)((h, c) => (h * 131 + c.toLong) % 1000000007L)
    (h * 131 + s.length) % 1000000007L
  }

  private val asciiStr = Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)

  property("JVM helper matches the documented SQL recipe") =
    forAll(asciiStr) { s =>
      graft.functions.PortableHashExpr.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)) == recipe(s)
    }

  property("range stays within [0, 1e9+7)") = forAll(asciiStr) { s =>
    val h = recipe(s); h >= 0L && h < 1000000007L
  }
}

object ComponentsProps extends Properties("KeepSetUnionFind") {

  /** BFS reference components (independent of union-find). */
  private def bfsRoots(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
    edges.foreach { case (a, b) =>
      adj(a) = b :: adj.getOrElse(a, Nil); adj(b) = a :: adj.getOrElse(b, Nil)
    }
    val roots = scala.collection.mutable.Map.empty[Long, Long]
    adj.keys.toSeq.sorted.foreach { start =>
      if (!roots.contains(start)) {
        var frontier = List(start); val seen = scala.collection.mutable.Set(start)
        while (frontier.nonEmpty) {
          val next = frontier.flatMap(adj(_)).filterNot(seen)
          seen ++= next; frontier = next
        }
        val root = seen.min
        seen.foreach(v => roots(v) = root)
      }
    }
    roots.toMap
  }

  /** Same union-find as DedupOp.keepSet's driver path. */
  private def ufRoots(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x; while (parent(r) != r) r = parent(r)
      var c = x; while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private val edgesGen =
    Gen.listOf(Gen.zip(Gen.choose(0L, 30L), Gen.choose(0L, 30L)))
      .map(_.filter(e => e._1 != e._2))

  property("min-root union-find equals BFS components") =
    forAll(edgesGen) { edges => ufRoots(edges) == bfsRoots(edges) }
}

object IqrProps extends Properties("IqrRule") {
  /** Reference quartile indexing (ClusterAnalyser.scala:157-170). */
  private def band(vs: Seq[Double]): Option[(Double, Double)] = {
    val n = vs.length
    if (n <= 4) None
    else {
      val s = vs.sorted
      val q1 = s(n / 4); val q3 = s(n / 4 * 3)
      Some((q1 - (q3 - q1) * 1.5, q3 + (q3 - q1) * 1.5))
    }
  }

  property("n <= 4 flags nothing") =
    forAll(Gen.listOfN(4, Gen.choose(-1e6, 1e6))) { vs => band(vs).isEmpty }

  property("quartile values are members; band contains the IQR box") =
    forAll(Gen.listOf(Gen.choose(-1e3, 1e3)).suchThat(_.length > 4)) { vs =>
      val s = vs.sorted
      val (lo, hi) = band(vs).get
      val q1 = s(vs.length / 4); val q3 = s(vs.length / 4 * 3)
      vs.contains(q1) && vs.contains(q3) && lo <= q1 && hi >= q3
    }

  property("all-equal values flag nothing") =
    forAll(Gen.choose(5, 50), Gen.choose(-1e3, 1e3)) { (n, v) =>
      val vs = Seq.fill(n)(v)
      val (lo, hi) = band(vs).get
      !vs.exists(x => x < lo || x > hi)
    }
}

object ShingleProps extends Properties("ShinglesExpr") {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String

  /** Independent reference: sliding windows joined by one space. */
  private def ref(toks: Seq[String], w: Int): Seq[String] =
    if (toks.length < w) Seq.empty
    else toks.sliding(w).map(_.mkString(" ")).toSeq

  private val tokGen = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(6)), Gen.const(""), Gen.const("a b"))
  private val toksGen = Gen.listOf(tokGen)

  property("equals the sliding-window reference for w in 1..5") =
    forAll(toksGen, Gen.choose(1, 5)) { (toks, w) =>
      val in = new GenericArrayData(
        toks.map(UTF8String.fromString).toArray[Any])
      val out = graft.functions.ShinglesExpr.shingle(in, w)
      val got = (0 until out.numElements())
        .map(i => out.getUTF8String(i).toString)
      got == ref(toks, w)
    }
}

object SketchProps extends Properties("SignSketchExpr") {
  /** Independent reference: per-hyperplane left-fold dot (ascending d —
    * the summation order the expression, the built-ins formulation, and
    * the DuckDB oracle all share).
    */
  private def ref(v: Seq[Double], numBands: Int, bandBits: Int): Seq[Long] =
    (0 until numBands).map { b =>
      (0 until bandBits).foldLeft(0L) { (acc, k) =>
        val j = b * bandBits + k
        val dot = v.zipWithIndex.foldLeft(0.0) { case (s, (x, d)) =>
          s + x * (((j * 37 + d * 101) % 13) - 6)
        }
        if (dot > 0.0) acc | (1L << k) else acc
      }
    }

  property("equals the fold reference on random vectors") =
    forAll(Gen.listOf(Gen.choose(-5.0, 5.0)), Gen.choose(1, 4),
      Gen.choose(1, 16)) { (v, nb, bb) =>
      graft.functions.SignSketchExpr.sketchOf(v.toArray, nb, bb).toSeq ==
        ref(v, nb, bb)
    }
}
