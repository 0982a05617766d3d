package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Gap-based sessionization (the batch twin of Structured Streaming's
  * `session_window`): events for a key belong to the same session while
  * consecutive gaps are ≤ `gapSeconds`.
  *
  * One exchange on the key + one sort — the canonical "partition by key,
  * order by time" pattern the reference's sorted-merge delivery feeds
  * (SURVEY §2.1 O12). Session ids are 1-based per key and deterministic
  * given a unique (ts, tiebreak) ordering.
  */
object Sessionize {

  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 tiebreakCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(prev.isNull ||
      unix_micros(col(tsCol)) - unix_micros(prev) > gapSeconds * 1000000L, 1)
      .otherwise(0)
    df.withColumn("__is_new", isNew)
      .withColumn("session_id", sum(col("__is_new")).over(cum))
      .drop("__is_new")
  }
}
