package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float|double>` columns via higher-order
  * functions — codegen'd elementwise ops, no UDFs, no linear-algebra
  * dependency. Computations are done in double, summed left-to-right, so a
  * DuckDB oracle running the same naive loop matches bit-for-bit (both are
  * then rounded before hashing anyway).
  */
object Vectors {

  def toDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** Random-hyperplane LSH bucket id: `nPlanes` sign bits packed into a
    * long. Plane weights are ±1 derived deterministically from (plane,
    * dimension) via a splitmix-style avalanche, so executors need no
    * broadcast state and the bucketing is reproducible across runs.
    */
  def hyperplaneBucket(v: Column, nPlanes: Int, dim: Int,
      seed: Long = 42L): Column = {
    val planes: Seq[Column] = (0 until nPlanes).map { p =>
      val weights = (0 until dim).map { i =>
        if (mix64(seed + p * 1000003L + i) < 0) -1.0 else 1.0
      }
      val w = array(weights.map(lit): _*)
      val proj = aggregate(
        zip_with(toDouble(v), w, (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    planes.reduce(_ + _)
  }

  /** splitmix64 finalizer — cheap, well-distributed, dependency-free. */
  private def mix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
}
