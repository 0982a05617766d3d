package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSuite {
  import spark.implicits._

  // 10k rows, 95% on one hot key — the shape that makes one task a straggler
  private lazy val fact = spark.range(10000)
    .select(when(col("id") % 20 === 0, col("id") % 5).otherwise(lit(1L)).as("k"),
      col("id").as("payload"))
  private lazy val dim = Seq((0L, "zero"), (1L, "one"), (2L, "two"),
    (3L, "three"), (4L, "four")).toDF("k", "name")

  test("salted inner join == plain join on a skewed key") {
    val plain = fact.join(dim, "k")
      .groupBy(col("name")).agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = SkewJoin.saltedJoin(fact, dim, "k", salts = 8)
      .groupBy(col("name")).agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("salted left join preserves unmatched fact rows") {
    val factExtra = fact.union(Seq((99L, -1L)).toDF("k", "payload"))
    val plain = factExtra.join(dim, Seq("k"), "left").count()
    val salted = SkewJoin.saltedJoin(factExtra, dim, "k", 8, "left").count()
    assert(salted == plain)
    assert(SkewJoin.saltedJoin(factExtra, dim, "k", 8, "left")
      .filter(col("k") === 99).count() == 1)
  }

  test("AQE splits the skewed partition at runtime (the automatic path)") {
    // the manual salted join above is the explicit lever; this asserts the
    // AQE lever the engine relies on at cluster scale: a sort-merge join
    // whose hot partition exceeds the (lowered) skew threshold is split
    // into multiple reader slices, visible as "skewed" AQEShuffleReads
    val restore = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val bigFact = spark.range(200000)
        .select(when(col("id") % 50 === 0, col("id") % 5).otherwise(lit(1L)).as("k"),
          col("id").as("payload"))
      val right = spark.range(5).select(col("id").as("k"), (col("id") * 10).as("w"))
        .repartition(4)
      // execute joined's OWN QueryExecution (count() would plan a separate
      // aggregate query, leaving this plan un-finalized by AQE)
      val joined = bigFact.join(right, "k")
      assert(joined.collect().length == 200000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true") && finalPlan.contains("AQEShuffleRead skewed"),
        s"expected AQE skew-split readers in final plan:\n$finalPlan")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("dim-duplicating join types are rejected") {
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(fact, dim, "k", 8, "right")
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(fact, dim, "k", 8, "full_outer")
    }
  }
}
