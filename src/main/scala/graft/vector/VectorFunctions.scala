package graft.vector

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>`/`array<double>` columns, built
  * from Spark's higher-order functions (`zip_with`/`aggregate`) so the
  * whole computation stays inside Catalyst — no UDF serialization, no
  * driver round-trips, and the expressions distribute with the scan.
  *
  * All math is done in double with a left-to-right sequential fold, which
  * makes results deterministic across partitionings (the fold happens
  * per-row, never across rows).
  */
object VectorFunctions {

  /** Cast any numeric array column to array<double>. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Sequential dot product (native codegen'd expression). */
  def dot(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.dot(asDouble(a), asDouble(b))

  /** HOF reference implementation of dot — kept for differential tests
    * against the native expression. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  /** Sum of squares (squared L2 norm). */
  def normSq(a: Column): Column =
    aggregate(asDouble(a), lit(0.0), (acc, x) => acc + x * x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity: dot / (|a|·|b|) — native single-pass expression. */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.cosine(asDouble(a), asDouble(b))

  /** HOF reference implementation of cosine (differential tests). */
  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (norm(a) * norm(b))

  /** Cosine rounded to `scale` decimals — rounding before any threshold
    * compare or ranking absorbs last-ulp differences between engines
    * (e.g. DuckDB fusing the norm multiply differently). */
  def cosineRounded(a: Column, b: Column, scale: Int = 3): Column =
    round(cosine(a, b), scale)

  /** Elementwise add (for centroid accumulation). */
  def add(a: Column, b: Column): Column =
    zip_with(asDouble(a), asDouble(b), (x, y) => x + y)

  /** Scale a vector by a scalar column. */
  def scale(a: Column, s: Column): Column =
    transform(asDouble(a), x => x * s)
}
