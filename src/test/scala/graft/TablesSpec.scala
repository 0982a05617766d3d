package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `Tables.events` must survive fixture-schema drift: the lake may hold
  * events files whose `ts` is parquet TIMESTAMP(NANOS) (Spark reads a
  * LONG under `nanosAsLong`) or TIMESTAMP_MICROS (Spark reads TIMESTAMP
  * or TIMESTAMP_NTZ). Both encodings must load and expose the same
  * surface: `ts` TIMESTAMP (micros, session-zoned) + `ts_ns` LONG. */
class TablesSpec extends SparkSuite {

  private val microsUtc = 1700000000123456L // 2023-11-14T22:13:20.123456Z

  private def writeEvents(dir: String, tsCol: org.apache.spark.sql.Column,
                          tsType: DataType): Unit = {
    import spark.implicits._
    Seq((1L, microsUtc, 7L, "click", 1.5, """{"k":1}"""))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", tsCol.cast(tsType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("events loads a micros (TIMESTAMP) file") {
    val dir = "/tmp/graft_tables_micros"
    writeEvents(dir, timestamp_micros(col("us")), TimestampType)
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.schema("ts_ns").dataType == LongType)
    val r = df.select("ts_ns").head()
    assert(r.getLong(0) == microsUtc * 1000L)
  }

  test("events loads a micros (TIMESTAMP_NTZ) file") {
    val dir = "/tmp/graft_tables_ntz"
    writeEvents(dir, timestamp_micros(col("us")), TimestampNTZType)
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.schema("ts_ns").dataType == LongType)
    // session tz is UTC, so NTZ->LTZ cast preserves the instant
    assert(df.select("ts_ns").head().getLong(0) == microsUtc * 1000L)
  }

  test("events loads a nanos-as-long file") {
    val dir = "/tmp/graft_tables_nanos"
    // A TIMESTAMP(NANOS) parquet file surfaces as LongType under
    // spark.sql.legacy.parquet.nanosAsLong; a LONG ts column exercises
    // the identical loader branch.
    writeEvents(dir, col("us") * lit(1000L), LongType)
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.schema("ts_ns").dataType == LongType)
    assert(df.select("ts_ns").head().getLong(0) == microsUtc * 1000L)
    assert(df.select(unix_micros(col("ts"))).head().getLong(0) == microsUtc)
  }

  test("both encodings yield the same ts instant") {
    val d1 = "/tmp/graft_tables_micros"; val d2 = "/tmp/graft_tables_nanos"
    writeEvents(d1, timestamp_micros(col("us")), TimestampType)
    writeEvents(d2, col("us") * lit(1000L), LongType)
    val a = Tables.events(spark, d1).select("ts").head().getTimestamp(0)
    val b = Tables.events(spark, d2).select("ts").head().getTimestamp(0)
    assert(a == b)
  }

  test("real fixture loads and ts is usable in time arithmetic") {
    val df = Tables.events(spark, sfDir)
    assert(df.count() > 0)
    // the exact expression shape that broke in r6 must analyze
    val n = df.select(window(col("ts"), "1 hour")).count()
    assert(n > 0)
  }
}
