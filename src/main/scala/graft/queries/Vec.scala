package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Array-native vector math over embedding columns (Array[Float]).
  *
  * Dot products fold per-dimension products through DECIMAL(25,10) with a
  * DECIMAL(38,10) accumulator: each float32 element is widened to double
  * (exact), the double product is cast to decimal (deterministic), and
  * decimal addition is exact — so the fold equals any other summation
  * order, including a SQL engine's explode + GROUP BY SUM. The whole
  * expression stays inside whole-stage codegen: no explode, no shuffle,
  * no UDF.
  */
object Vec {

  // acc 35 digits, product 25: their sum types as DECIMAL(36,10) — still
  // inside the 38-digit cap, so the scale (and exactness) is preserved.
  // A 38-digit accumulator would overflow on addition and make Spark
  // silently drop to scale 9, breaking the bit-exact oracle match.
  private val accType = DecimalType(35, 10)
  private val prodType = DecimalType(25, 10)

  private def fold(products: Column): Column =
    aggregate(products, lit(0).cast(accType),
      (acc, v) => (acc + v).cast(accType)).cast("double")

  /** Exact-sum dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    fold(zip_with(a, b, (x, y) =>
      (x.cast("double") * y.cast("double")).cast(prodType)))

  /** Exact-sum squared L2 norm of a float-array column. */
  def norm2(a: Column): Column =
    fold(transform(a, x => (x.cast("double") * x.cast("double")).cast(prodType)))

  /** Cosine similarity given precomputed squared norms. */
  def cosine(a: Column, b: Column, n2a: Column, n2b: Column): Column =
    dot(a, b) / (sqrt(n2a) * sqrt(n2b))
}
