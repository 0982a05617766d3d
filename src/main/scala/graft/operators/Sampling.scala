package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling.
  *
  * `df.sample()` is seed-stable only within one Spark version/partitioning
  * and is not replayable by another engine — useless for an auditable
  * pipeline ("which rows were in the training set?"). Hash sampling keys
  * each row by the first hex digits of `md5(key || salt)` and keeps rows
  * below a hex cutoff: uniform (md5 is uniform on any key distribution),
  * stable under repartitioning, reproducible anywhere md5 exists, and
  * consistent — the same key always samples the same way, so a resampled
  * pipeline run touches identical rows, and joins between two tables
  * sampled on the SAME key stay complete.
  *
  * Scale: pure map-side predicate on the scan — no shuffle, no state; the
  * filter sits directly above the parquet reader.
  *
  * The cutoff is lexicographic on lowercase hex, so `cut = "1a"` keeps
  * 0x00..0x19 of 0x00..0xff ≈ 10.2%; digits-of-precision = len(cut)×4 bits.
  */
object Sampling {

  /** Keep rows whose md5(key ++ salt) prefix sorts below `cutHex`. */
  def hashSample(df: DataFrame, key: Column, cutHex: String,
                 salt: String = ""): DataFrame =
    df.filter(samplePredicate(key, cutHex, salt))

  /** Per-stratum cutoffs (e.g. downsample the dominant language, keep the
    * rest): a CASE over `stratum` picks the cutoff, same map-side shape. */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
                           cuts: Map[String, String], defaultCut: String,
                           salt: String = ""): DataFrame = {
    val cut = cuts.foldLeft(lit(defaultCut)) { case (acc, (k, v)) =>
      when(stratum === k, lit(v)).otherwise(acc)
    }
    df.filter(substring(md5(concat(key.cast("string"), lit(salt))), 1, 2) < cut)
  }

  private def samplePredicate(key: Column, cutHex: String, salt: String): Column =
    substring(md5(concat(key.cast("string"), lit(salt))), 1, cutHex.length) <
      lit(cutHex)
}
