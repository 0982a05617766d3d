package graft

import graft.shuffle.KV

/** Property tests for the KV shuffle-merge veneer — the reference's
  * correctness contract: merging k sorted runs equals the sorted
  * concatenation (FIXTURES.md §C). Seeded random inputs (scalatestplus
  * isn't in the offline cache, so no ScalaCheck integration). */
class KVSpec extends SparkSuite {
  import spark.implicits._

  test("mergeSorted: each partition is a key-sorted run; union is a permutation") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val kvs = List.fill(200)((rnd.nextInt(101) - 50, rnd.nextInt(1000).toString))
      val ds = spark.createDataset(kvs)
      val merged = KV.mergeSorted(ds, 4)
      val parts = merged.rdd.glom().collect()
      parts.foreach { p =>
        val ks = p.map(_._1)
        assert(ks.zip(ks.drop(1)).forall { case (a, b) => a <= b },
          "partition not sorted")
      }
      assert(parts.flatten.toList.sorted == kvs.sorted, "not a permutation")
      // same key never lands in two partitions (reduceID routing)
      val keyToParts = parts.zipWithIndex.flatMap { case (p, i) =>
        p.map(kv => (kv._1, i))
      }.groupBy(_._1).map { case (_, v) => v.map(_._2).distinct.size }
      assert(keyToParts.forall(_ == 1), "key split across partitions")
    }
  }

  test("globalSorted is a total order") {
    val kvs = (1 to 500).map(i => ((i * 37) % 101, s"v$i"))
    val got = KV.globalSorted(spark.createDataset(kvs)).collect()
    assert(got.map(_._1).toSeq == kvs.map(_._1).sorted)
  }

  test("reduceByKeyTyped == groupBy sum (wordcount analog)") {
    val kvs = Seq(("a", 1L), ("b", 2L), ("a", 3L), ("c", 4L), ("b", 5L))
    val got = KV.reduceByKeyTyped(spark.createDataset(kvs), (a: Long, b: Long) => a + b)
      .collect().sortBy(_._1)
    assert(got.toSeq == Seq(("a", 4L), ("b", 7L), ("c", 4L)))
  }

  test("mapGroups delivers all values per key") {
    val kvs = Seq((1, "x"), (1, "y"), (2, "z"))
    val got = KV.mapGroups(spark.createDataset(kvs)) {
      (k, it) => (k, it.toSeq.sorted.mkString(","))
    }.collect().sortBy(_._1)
    assert(got.toSeq == Seq((1, "x,y"), (2, "z")))
  }

  test("sortedValueGroups streams each key's values in value order") {
    val rnd = new scala.util.Random(7)
    val kvs = Seq.fill(2000)((rnd.nextInt(20), rnd.nextInt(100000)))
    // concatenating values AS DELIVERED must equal the pre-sorted list —
    // no .sorted inside f: the iterator order is the assertion
    val got = KV.sortedValueGroups(spark.createDataset(kvs), n = 7) {
      (k, it) => (k, it.mkString(","))
    }.collect().toMap
    val expect = kvs.groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).sorted.mkString(",") }
    assert(got == expect)
    // partial consumption must not break subsequent key runs
    val firstOnly = KV.sortedValueGroups(spark.createDataset(kvs), n = 3) {
      (k, it) => (k, it.next())
    }.collect().toMap
    val expectFirst = kvs.groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).min }
    assert(firstOnly == expectFirst)
  }
}
