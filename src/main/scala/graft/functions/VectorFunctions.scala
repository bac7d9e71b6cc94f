package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector kernels over `ArrayType` columns, built entirely from
  * codegen'd higher-order functions — no UDFs, so they stay inside
  * whole-stage codegen (SURVEY.md M3: the reference's euclidean `dist`,
  * `traffic/process/ClusterAnalyser.scala:186-188`, generalized).
  *
  * `aggregate(zip_with(...))` folds left-to-right, giving a fixed
  * summation order — required for cross-engine float parity.
  * Squares are written `x*x` (never `pow`) so DuckDB matches bitwise.
  */
object VectorFunctions {

  /** array<float> → array<double> (embeddings are float32 on disk). */
  def toDoubleArray(a: Column): Column = transform(a, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, v) => s + v)

  def normSq(a: Column): Column = dot(a, a)

  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (s, v) => s + v))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Sign-sketch for cosine LSH: `bits` hyperplanes with deterministic
    * integer weights w(j,d) = ((j*mulJ + d*mulD) % mod) - mod/2; local
    * bit k set iff dot(v, w_{offset+k}) > 0. `offset` selects an
    * independent band of hyperplanes (band b of width `bits` passes
    * offset = b*bits), so multi-band LSH reuses one global hyperplane
    * family. Engine-portable pure arithmetic (no RNG), so the DuckDB
    * oracle computes the identical sketch. Weight-family choice (and why
    * the default modulus is too narrow for ANN): [[SignSketchExpr]].
    */
  def signSketch(v: Column, bits: Int = 8, dims: Int = 64,
                 offset: Int = 0, mulJ: Int = 37, mulD: Int = 101,
                 mod: Int = 13): Column =
    (0 until bits).map { k =>
      val j = offset + k
      val d = aggregate(
        zip_with(v, sequence(lit(0), lit(dims - 1)),
          (x, i) => x * ((lit(j) * mulJ + i * mulD) % mod - mod / 2).cast("double")),
        lit(0.0), (s, x) => s + x)
      when(d > 0.0, lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _).as("sketch")
}
