package graft

import org.apache.spark.sql.functions._

/** Pins the r12 work-vs-bytes policy (`Tables.scanIsNarrow` /
  * `Tables.widen`): fan-out stages over byte-small inputs gain an
  * explicit-count exchange for eval parallelism, while a wide input —
  * any real lake — passes through untouched, because a corpus-sized
  * exchange there is pure I/O waste. A policy edit that breaks either
  * side breaks this spec instead of surfacing as a serialized bench
  * stage or a pointless 100 TB shuffle. */
class WidenSpec extends SparkSuite {

  test("narrow input gains the explicit-count exchange") {
    val n = spark.sessionState.conf.numShufflePartitions
    val narrow = spark.range(1000).coalesce(1).toDF("id")
    assert(Tables.scanIsNarrow(narrow), "1 partition must read as narrow")
    assert(Tables.widen(narrow, col("id")).rdd.getNumPartitions == n,
      "widen must land exactly on the shuffle width (explicit count, " +
        "so AQE cannot coalesce it back)")
  }

  test("wide input passes through untouched") {
    val n = spark.sessionState.conf.numShufflePartitions
    val wide = spark.range(1000).repartition(n).toDF("id")
    assert(!Tables.scanIsNarrow(wide))
    assert(Tables.widen(wide, col("id")) eq wide,
      "a wide plan must not pay any exchange")
  }
}
