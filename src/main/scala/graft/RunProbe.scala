package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratch probe: A/B the copurchase edge-build variants at a given
  * fixture (plan shape + min-of-N wall + edge count equality). */
object RunProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .config("spark.local.dir", LocalDirs.dir).master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.shuffle.manager",
        "org.apache.spark.shuffle.graft.GraftShuffleManager")
      .config("spark.io.compression.codec", "snappy")
      .config("spark.io.compression.snappy.blockSize", "128k")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")

    def pkCol = when(col("l_partkey") <= lit(Int.MaxValue.toLong),
      col("l_partkey").cast("int"))
      .otherwise(raise_error(lit("x")).cast("int")).as("pk")

    // current shape: distinct -> self-join -> distinct
    def current(): DataFrame = {
      val li = Tables.lineitem(spark, d)
        .select(col("l_orderkey").as("ok"), pkCol).distinct()
      li.as("x").join(li.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("a"), col("y.pk").as("b")).distinct()
    }

    // variant E: one keyed exchange feeds dedup AND the self-join
    def variantE(): DataFrame = {
      val li = Tables.lineitem(spark, d)
        .select(col("l_orderkey").as("ok"), pkCol)
        .repartition(col("ok"))
        .dropDuplicates("ok", "pk")
      li.as("x").join(li.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("a"), col("y.pk").as("b")).distinct()
    }

    // variant F: dedup only the broadcast/build side; probe side raw
    def variantF(): DataFrame = {
      val raw = Tables.lineitem(spark, d)
        .select(col("l_orderkey").as("ok"), pkCol)
      val liD = raw.distinct()
        .select(col("ok").as("ok2"), col("pk").as("pk2"))
      raw.join(liD, col("ok") === col("ok2") && col("pk") < col("pk2"))
        .select(col("pk").as("a"), col("pk2").as("b")).distinct()
    }

    // variant G: no pre-join dedup at all; the final distinct dedups
    def variantG(): DataFrame = {
      val raw = Tables.lineitem(spark, d)
        .select(col("l_orderkey").as("ok"), pkCol)
      raw.as("x").join(raw.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("a"), col("y.pk").as("b")).distinct()
    }

    // variant J: one shared keyed exchange; dedup only the build side
    def variantJ(): DataFrame = {
      val raw = Tables.lineitem(spark, d)
        .select(col("l_orderkey").as("ok"), pkCol)
        .repartition(col("ok"))
      val liD = raw.dropDuplicates("ok", "pk")
        .select(col("ok").as("ok2"), col("pk").as("pk2"))
      raw.join(liD, col("ok") === col("ok2") && col("pk") < col("pk2"))
        .select(col("pk").as("a"), col("pk2").as("b")).distinct()
    }

    // variant K: one shared keyed exchange, no pre-join dedup at all
    def variantK(): DataFrame = {
      val raw = Tables.lineitem(spark, d)
        .select(col("l_orderkey").as("ok"), pkCol)
        .repartition(col("ok"))
      raw.as("x").join(raw.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("a"), col("y.pk").as("b")).distinct()
    }

    val variants: Seq[(String, () => DataFrame)] =
      Seq("current" -> (() => current()), "variantE" -> (() => variantE()),
        "variantJ" -> (() => variantJ()), "variantK" -> (() => variantK()))
    variants.foreach { case (name, mk) =>
      println(s"===== $name plan =====")
      mk().explain("formatted")
      val walls = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        val df = mk().localCheckpoint()
        val w = (System.nanoTime() - t0) / 1e9
        val cnt = df.count()
        df.unpersist(true)
        (w, cnt)
      }
      println(f"$name%-10s min=${walls.map(_._1).min}%6.2f s " +
        s"walls=${walls.map(w => f"${w._1}%.2f").mkString(",")} " +
        s"edges=${walls.head._2}")
    }
    spark.stop()
  }
}
