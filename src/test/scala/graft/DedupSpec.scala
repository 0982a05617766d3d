package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSuite {

  private lazy val docs = Tables.documents(spark, sfDir)

  test("minhash-LSH pairs == exact all-pairs Jaccard at threshold") {
    val lsh = Dedup.minhashPairs(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleSize = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact,
      s"LSH missed ${exact -- lsh} / extra ${lsh -- exact}")
  }

  test("exact dedup groups by fingerprint; total copies == corpus size") {
    val d = Dedup.exact(docs)
    assert(d.agg(sum("n_copies")).head.getLong(0) == docs.count())
    // dedup is idempotent: re-deduping the keepers changes nothing
    val keepers = docs.join(d.select(col("keep_id").as("doc_id")), "doc_id")
    assert(Dedup.exact(keepers).count() == keepers.count())
  }

  test("simhash pairs all within declared Hamming distance, ids ordered") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(r => r.getInt(2) <= 3))
    // exhaustive cross-check: blocking at hamming<=3 is exact (pigeonhole
    // over 4 16-bit chunks), so pair count must equal brute force
    val sigs = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == brute)
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val emb = Tables.embeddings(spark, sfDir)
    val pairs = Dedup.embeddingPairs(emb, "vec_id", "embedding", 0.4).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(r => r.getDouble(2) >= 0.4))
  }
}
