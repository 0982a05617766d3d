package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * A hash join on a key with a hot value sends every row of that value
  * to one task — the straggler that dominates the stage at 100 TB (the
  * reference fights the same pathology with fetch-order randomization,
  * reference src/Merger/MergeManager.cc:61-63, and credit-based flow
  * control, src/DataNet/RDMAClient.cc:43-125). Salting splits each hot
  * key across `salts` sub-keys:
  *
  *  - fact side: `__salt = uniform random in [0, salts)` per row —
  *    correctness does NOT depend on the salt values (the dim side is
  *    replicated to every salt), so a per-row random is safe;
  *  - dim side: each row exploded to all `salts` sub-keys (×salts rows,
  *    only acceptable because the dim side is small — which is exactly
  *    the regime where skew bites: big-skewed ⋈ small).
  *
  * Fact-preserving join types only (inner / left_outer / left_semi /
  * left_anti): duplicating the dim side would corrupt right/full joins.
  * AQE's skew-split is the first line of defense (it subdivides oversized
  * partitions of a sort-merge join); explicit salting is for when the
  * skew is a single key, which partition splitting cannot divide.
  */
object SkewJoin {

  private val allowed = Set("inner", "left_outer", "leftouter", "left",
    "left_semi", "leftsemi", "left_anti", "leftanti")

  def saltedJoin(fact: DataFrame, dim: DataFrame, joinKey: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(allowed.contains(joinType.toLowerCase),
      s"salted join supports fact-preserving join types only, got $joinType")
    require(salts > 0, "salts must be positive")
    val sf = fact.withColumn("__salt", (rand(42) * salts).cast("int"))
    val sd = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    sf.join(sd, Seq(joinKey, "__salt"), joinType).drop("__salt")
  }
}
