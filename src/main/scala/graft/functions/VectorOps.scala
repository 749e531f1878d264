package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType/DoubleType)` embedding columns,
  * expressed with Spark's higher-order functions (`zip_with`,
  * `aggregate`, `transform`) so the arithmetic stays inside codegen —
  * no UDF serialization, no JVM-object churn per row.
  *
  * Summation order is the array's element order (a sequential
  * left-fold), so results are bit-deterministic across partitionings —
  * required for the DuckDB oracle compare.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ as a left-fold in DOUBLE. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** ‖a‖₂ in DOUBLE. */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Cosine similarity; null-safe on zero vectors (returns 0.0). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(d / (na * nb))
  }

  /** a / ‖a‖₂ — pre-normalizing lets downstream cosine become a plain
    * dot product (saves two norms per candidate pair in a top-k scan). */
  def normalize(a: Column): Column = {
    val n = norm(a)
    transform(a, x => x.cast("double") / n)
  }

  /** Deterministic pseudo-random hyperplane signature for LSH: bit i of
    * the signature is sign(Σⱼ h(i,j)·vⱼ) where h(i,j) is a hash-derived
    * weight in [-1,1). Everything is Column arithmetic — the planes are
    * never materialized driver-side, so the same code runs identically
    * on a 1000-executor cluster. */
  def hyperplaneSignature(vec: Column, bits: Int, seed: Int = 42): Column = {
    val bitCols = (0 until bits).map { i =>
      // weight h(i,j): xxhash64 of (seed, i, j) scaled to [-1, 1)
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, j) =>
          x.cast("double") *
            (pmod(xxhash64(lit(seed), lit(i), j), lit(1000000)).cast("double") / 500000.0 - 1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0.0, lit(1L << i)).otherwise(0L)
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }
}
