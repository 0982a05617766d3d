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

  // FIXTURES.md §A edge cases: empty keys/values, degenerate merges
  // (reference: single-segment and num_maps < num_lpqs,
  // src/Merger/MergeManager.cc:242), and byte-wise binary keys
  // (BytesWritable / terasort's 10-byte keys, CompareFunc.cc:70-91).

  test("empty keys and values are ordinary records, sorted first") {
    val kvs = Seq(("", "v-empty-key"), ("a", ""), ("", ""), ("b", "x"))
    val got = KV.globalSorted(spark.createDataset(kvs)).collect().toSeq
    // key order is total; order WITHIN a key tie is unspecified
    assert(got.map(_._1) == kvs.map(_._1).sorted, s"key order wrong: $got")
    assert(got.groupBy(identity) == kvs.groupBy(identity),
      s"empty strings mishandled: $got")
  }

  test("degenerate merges: more partitions than rows, and n=1") {
    val kvs = Seq((3, "c"), (1, "a"), (2, "b"))
    // num_maps < num_lpqs analog: 64 target partitions, 3 rows
    val wide = KV.mergeSorted(spark.createDataset(kvs), 64)
    assert(wide.collect().sorted.toSeq == kvs.sorted)
    // single-segment analog: everything through one partition
    val one = KV.mergeSorted(spark.createDataset(kvs), 1)
    val run = one.rdd.glom().collect().filter(_.nonEmpty)
    assert(run.length == 1 && run.head.map(_._1).toSeq == Seq(1, 2, 3))
  }

  test("binary keys sort byte-wise (terasort 10-byte-key analog)") {
    val rnd = new scala.util.Random(13)
    val kvs = Seq.fill(300)(
      (Array.fill(10)((rnd.nextInt(256) - 128).toByte), rnd.nextInt(100)))
    val got = KV.globalSorted(spark.createDataset(kvs)).collect()
    // Spark's BinaryType ordering is UNSIGNED lexicographic — the same
    // byte_compare contract as the reference (CompareFunc.cc:70-91)
    val cmp = new Ordering[Array[Byte]] {
      def compare(a: Array[Byte], b: Array[Byte]): Int = {
        val n = math.min(a.length, b.length)
        var i = 0
        while (i < n) {
          val d = (a(i) & 0xFF) - (b(i) & 0xFF)
          if (d != 0) return d
          i += 1
        }
        a.length - b.length
      }
    }
    val gotKeys = got.map(_._1).toSeq
    assert(gotKeys.zip(gotKeys.drop(1)).forall { case (a, b) =>
      cmp.compare(a, b) <= 0 }, "binary keys not in unsigned byte order")
    // multiset preserved (TeraValidate's permutation half)
    assert(got.map { case (k, v) => (k.toSeq, v) }.sorted(
        Ordering.by((t: (Seq[Byte], Int)) => (t._1.map(b => b & 0xFF).mkString(","), t._2))).toSeq ==
      kvs.map { case (k, v) => (k.toSeq, v) }.sorted(
        Ordering.by((t: (Seq[Byte], Int)) => (t._1.map(b => b & 0xFF).mkString(","), t._2))).toSeq)
  }
}
