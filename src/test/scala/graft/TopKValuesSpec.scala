package graft

import org.apache.spark.sql.functions._

/** TypedImperativeAggregate exemplar: bounded-heap top-k values. */
class TopKValuesSpec extends SparkSuite {

  test("result is partitioning-independent and matches a sort") {
    graft.functions.GraftFunctions.register(spark)
    val li = Tables.lineitem(spark, sfDir)
    def run(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Double]] = {
      df.createOrReplaceTempView("tkv")
      spark.sql(
        "SELECT l_returnflag, graft_topk_vals(l_extendedprice, 5) AS t " +
          "FROM tkv GROUP BY l_returnflag").collect()
        .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    }
    val base = run(li)
    val repart = run(li.repartition(17, col("l_orderkey")))
    assert(base == repart)
    // against an explicit sort
    val expect = li.select(col("l_returnflag"), col("l_extendedprice"))
      .collect().groupBy(_.getString(0))
      .map { case (k, rs) =>
        k -> rs.map(_.getDouble(1)).sorted(Ordering[Double].reverse).take(5).toSeq
      }
    assert(base == expect)
    // heap stays bounded: k larger than the group is fine
    spark.sql("SELECT graft_topk_vals(l_extendedprice, 1000000) AS t " +
        "FROM tkv WHERE l_orderkey = 1").collect()
  }
}
