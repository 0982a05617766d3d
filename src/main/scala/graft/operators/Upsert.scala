package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch MERGE/upsert: apply a changeset to a snapshot without a
  * lakehouse table format. "Matched → update, not matched → insert" is
  * the refresh step of every incremental pipeline (new crawl snapshot
  * into the corpus, recomputed quality scores into the feature table).
  *
  * Two physical shapes, picked by the caller:
  *
  *  - [[merge]]: full-outer sort-merge join on the key — the general
  *    form (works when the changeset is huge and/or carries partial
  *    rows). Both sides shuffle once on the key; at 100 TB that is the
  *    unavoidable minimum for a symmetric merge.
  *  - [[upsertSmallSource]]: when the changeset carries COMPLETE rows
  *    and is broadcast-sized, the matched-update is just "drop the old
  *    row": a broadcast LEFT ANTI join (the big snapshot never
  *    shuffles) unioned with the changeset. This is the 100 TB fast
  *    path — a full-outer join cannot use a broadcast build side, the
  *    anti join can.
  */
object Upsert {

  /** Full-outer merge: source rows win per-column (`coalesce(s, t)`);
    * schemas must align (same column names/types). */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = target.columns
    require(source.columns.sameElements(cols),
      "merge requires aligned schemas; project the source first")
    val t = target.select(cols.map(c => col(c).as(s"t_$c")).toIndexedSeq: _*)
    val s = source.select(cols.map(c => col(c).as(s"s_$c")).toIndexedSeq: _*)
    val cond = keys.map(k => col(s"t_$k") === col(s"s_$k")).reduce(_ && _)
    t.join(s, cond, "full_outer")
      .select(cols.map(c => coalesce(col(s"s_$c"), col(s"t_$c")).as(c)).toIndexedSeq: _*)
  }

  /** Broadcast upsert for complete-row changesets: target rows whose key
    * appears in the source are dropped via broadcast anti join, then the
    * source is appended. Result is identical to [[merge]] when source
    * rows are complete. */
  def upsertSmallSource(target: DataFrame, source: DataFrame,
                        keys: Seq[String]): DataFrame = {
    require(source.columns.sameElements(target.columns),
      "upsert requires aligned schemas; project the source first")
    val keyTable = source.select(keys.map(col).toIndexedSeq: _*)
    target.join(broadcast(keyTable), keys, "left_anti").union(source)
  }
}
