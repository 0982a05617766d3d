package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sampling, Upsert}

class UpsertSamplingSpec extends SparkSuite {
  import spark.implicits._

  test("hash sample rate lands near the cutoff fraction and is deterministic") {
    val li = Tables.lineitem(spark, sfDir)
    val key = concat_ws("-", col("l_orderkey"), col("l_linenumber"))
    val n = li.count().toDouble
    val s1 = Sampling.hashSample(li, key, "1a", "s0")
    val rate = s1.count() / n // 0x1a/0x100 = 10.16% expected
    assert(rate > 0.07 && rate < 0.14, s"rate was $rate")
    // deterministic: same keys selected on a re-run with different partitioning
    val s2 = Sampling.hashSample(li.repartition(7), key, "1a", "s0")
    assert(s1.select("l_orderkey", "l_linenumber").except(
      s2.select("l_orderkey", "l_linenumber")).isEmpty)
    // different salt -> different (but similarly sized) sample
    val s3 = Sampling.hashSample(li, key, "1a", "other")
    assert(s3.count() != s1.count() ||
      s1.select("l_orderkey").except(s3.select("l_orderkey")).count() > 0)
  }

  test("sampling is map-side: no exchange in the plan") {
    val plan = SparkEntry.queries("q_sample_hash")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling shuffled:\n$plan")
  }

  test("stratified cutoffs apply per stratum") {
    val docs = Tables.documents(spark, sfDir)
    val s = Sampling.stratifiedHashSample(docs, col("doc_id"), col("lang"),
      Map("en" -> "20"), "80", "s1")
    val rates = s.groupBy("lang").count()
      .join(docs.groupBy("lang").count().withColumnRenamed("count", "total"), "lang")
      .select(col("lang"), (col("count") / col("total")).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates("en") < 0.25, s"en rate ${rates("en")}")
    rates.filterNot(_._1 == "en").foreach { case (l, r) =>
      assert(r > 0.3 && r < 0.7, s"$l rate $r")
    }
  }

  test("merge and broadcast upsert agree for complete-row changesets") {
    val t = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val src = Seq((2L, "b2", 99.0), (9L, "new", 1.0)).toDF("k", "name", "v")
    val viaMerge = Upsert.merge(t, src, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val viaAnti = Upsert.upsertSmallSource(t, src, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val want = Set((1L, "a", 10.0), (2L, "b2", 99.0), (3L, "c", 30.0),
      (9L, "new", 1.0))
    assert(viaMerge == want)
    assert(viaAnti == want)
  }

  test("broadcast upsert never shuffles the target") {
    val t = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    val src = t.filter(col("c_custkey") % 100 === 0)
    val plan = Upsert.upsertSmallSource(t, src, Seq("c_custkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"target side shuffled:\n$plan")
  }
}
