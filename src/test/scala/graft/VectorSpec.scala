package graft

import graft.vector.VectorFunctions
import org.apache.spark.sql.functions._

/** Differential test: the native codegen'd expressions must agree with
  * the HOF reference implementations (same sequential fold order →
  * bit-identical doubles). */
class VectorSpec extends SparkSuite {
  import spark.implicits._

  test("native dot/cosine == HOF reference on random vectors") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)(
      (Array.fill(64)(rnd.nextDouble() - 0.5), Array.fill(64)(rnd.nextDouble() - 0.5)))
    val df = spark.createDataset(rows).toDF("a", "b")
    val diff = df.select(
        abs(VectorFunctions.dot(col("a"), col("b")) -
            VectorFunctions.dotHof(col("a"), col("b"))).as("dd"),
        abs(VectorFunctions.cosine(col("a"), col("b")) -
            VectorFunctions.cosineHof(col("a"), col("b"))).as("dc"))
      .agg(max("dd"), max("dc")).head()
    assert(diff.getDouble(0) == 0.0, s"dot differs by ${diff.getDouble(0)}")
    assert(diff.getDouble(1) < 1e-12, s"cosine differs by ${diff.getDouble(1)}")
  }

  test("native expressions callable from SQL after registration") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_cosine(array(1d,2d,3d), array(1d,2d,3d)) AS c,
        |       graft_dot(array(1d,2d), array(3d,4d)) AS d,
        |       graft_simhash64('a b c a') AS s,
        |       size(graft_shingles('a b c d')) AS ns""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 11.0)
    assert(r.getLong(2) != 0L)
    assert(r.getInt(3) == 2)
  }

  test("cosine of identical vectors is 1, zero vector is 0") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0)),
      (Array(0.0, 0.0, 0.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
    val got = df.select(round(VectorFunctions.cosine(col("a"), col("b")), 9))
      .collect().map(_.getDouble(0))
    assert(got(0) == 1.0 && got(1) == 0.0)
  }
}
