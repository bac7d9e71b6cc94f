package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Point-in-polygon containment (reference use case 2: geofencing —
  * `traffic/process/Geofencer.scala:27-31` calls
  * `GeoUtil.containsLocation`, a standard ray-casting test; the geo lib
  * is not on disk, so this is the classic PNPOLY even-odd algorithm,
  * public domain, W. Randolph Franklin).
  *
  * The edge test is written with an exact, documented operation order —
  * `(bLng-aLng)*(lat-aLat)/(bLat-aLat)+aLng` — so the DuckDB oracle can
  * reproduce it bit-for-bit (IEEE 754 ops are deterministic given the
  * same operand order). Points exactly on an edge are boundary-undefined,
  * as in every even-odd implementation.
  */
object GeoFunctions {

  /** Ray-cast parity test. `lats`/`lngs` are the polygon vertices in
    * order (not closed; the wrap edge n-1→0 is implied).
    */
  def containsPoint(lat: Double, lng: Double,
                    lats: Seq[Double], lngs: Seq[Double]): Boolean = {
    val n = lats.length
    var inside = false
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      val aLat = lats(i); val aLng = lngs(i)
      val bLat = lats(j); val bLng = lngs(j)
      if (((aLat > lat) != (bLat > lat)) &&
          (lng < (bLng - aLng) * (lat - aLat) / (bLat - aLat) + aLng))
        inside = !inside
      i += 1
    }
    inside
  }

  /** Column form. A Scala UDF is sufficient here (SURVEY.md §7.5): the
    * polygon side is a handful of broadcast rows, so the UDF runs once
    * per (point, fence) pair after a BroadcastNestedLoopJoin — never the
    * hot inner loop of a scan.
    */
  val stContains =
    udf((lat: Double, lng: Double, lats: Seq[Double], lngs: Seq[Double]) =>
      containsPoint(lat, lng, lats, lngs))

  def st_contains(lat: Column, lng: Column, lats: Column, lngs: Column): Column =
    stContains(lat, lng, lats, lngs)
}
