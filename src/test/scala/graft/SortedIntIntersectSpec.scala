package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Differential test for the native merge-intersection: against Spark's
  * own `array_intersect` on randomized sorted inputs, in BOTH the
  * codegen path (plain select over a DataFrame) and the interpreted
  * path (eval after codegen is disabled for the plan via a
  * non-codegen-able context is hard to force reliably, so instead the
  * expression's `nullSafeEval` is exercised directly). The expression
  * replaced `array_intersect` in the triangle close — an oracle-checked
  * path — so equivalence is pinned here at the unit level too. */
class SortedIntIntersectSpec extends SparkSuite {

  private def randSorted(rng: scala.util.Random, n: Int, bound: Int): Seq[Int] =
    Seq.fill(n)(rng.nextInt(bound)).distinct.sorted

  test("matches array_intersect on randomized sorted arrays (codegen)") {
    val rng = new scala.util.Random(42)
    val rows = (1 to 500).map { i =>
      Row(i,
        randSorted(rng, rng.nextInt(50), 200),
        randSorted(rng, rng.nextInt(50), 200))
    }
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("a", ArrayType(IntegerType, containsNull = false)),
      StructField("b", ArrayType(IntegerType, containsNull = false))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val got = df.select(col("id"),
        graft.expressions.SortedIntIntersect(col("a"), col("b")).as("x"),
        array_sort(array_intersect(col("a"), col("b"))).as("y"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"id=${r.getInt(0)}: ${r.getSeq[Int](1)} vs ${r.getSeq[Int](2)}")
    }
  }

  test("interpreted eval agrees with codegen on edge shapes") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    def ev(a: Seq[Int], b: Seq[Int]): Seq[Int] = {
      val e = graft.expressions.SortedIntIntersect(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          a, ArrayType(IntegerType, containsNull = false)),
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          b, ArrayType(IntegerType, containsNull = false)))
      e.eval(null).asInstanceOf[ArrayData].toIntArray().toSeq
    }
    assert(ev(Nil, Nil) == Nil)
    assert(ev(Seq(1, 2, 3), Nil) == Nil)
    assert(ev(Nil, Seq(1)) == Nil)
    assert(ev(Seq(1, 2, 3), Seq(1, 2, 3)) == Seq(1, 2, 3))
    assert(ev(Seq(1, 3, 5), Seq(2, 4, 6)) == Nil)
    assert(ev(Seq(Int.MinValue, 0, Int.MaxValue),
      Seq(Int.MinValue, Int.MaxValue)) == Seq(Int.MinValue, Int.MaxValue))
    assert(ev(Seq(1, 2, 100), Seq(2, 100, 200)) == Seq(2, 100))
  }

  test("duplicate inputs: MULTISET semantics (min count), documented divergence from array_intersect") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    def ev(a: Seq[Int], b: Seq[Int]): Seq[Int] = {
      val e = graft.expressions.SortedIntIntersect(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          a, ArrayType(IntegerType, containsNull = false)),
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          b, ArrayType(IntegerType, containsNull = false)))
      e.eval(null).asInstanceOf[ArrayData].toIntArray().toSeq
    }
    // the contract the scaladoc states: a value with counts cA/cB is
    // emitted min(cA, cB) times — NOT deduplicated like array_intersect.
    // Callers feeding non-distinct arrays must array_distinct first.
    assert(ev(Seq(1, 1, 2), Seq(1, 1, 1, 2)) == Seq(1, 1, 2))
    assert(ev(Seq(5, 5, 5), Seq(5)) == Seq(5))
    assert(ev(Seq(2, 2), Seq(2, 2)) == Seq(2, 2))
    // distinct-elements precondition holds => set semantics coincide
    assert(ev(Seq(1, 2, 3), Seq(2, 3, 4)) == Seq(2, 3))
  }
}
