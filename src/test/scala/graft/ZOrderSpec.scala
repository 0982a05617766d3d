package graft

import org.apache.spark.sql.functions._
import graft.expressions.ZOrder
import graft.sources.Layout

/** Morton encoding correctness + the clustering property it buys. */
class ZOrderSpec extends SparkSuite {

  test("interleave places a-bits even, b-bits odd") {
    assert(ZOrder.spread(0L) == 0L)
    assert(ZOrder.spread(1L) == 1L)
    assert(ZOrder.spread(0xFFFFFFFFL) == 0x5555555555555555L)
    assert(ZOrder.interleave(3L, 0L) == 5L)   // 0b11 -> 0b101
    assert(ZOrder.interleave(0L, 3L) == 10L)  // 0b11 -> 0b1010
    assert(ZOrder.interleave(0xFFFFFFFFL, 0xFFFFFFFFL) == -1L)
    // locality: adjacent cells in a 2^16 grid stay within small deltas
    val z00 = ZOrder.interleave(100L, 200L)
    val z01 = ZOrder.interleave(101L, 200L)
    assert(z00 != z01)
  }

  test("z-order layout touches fewer files than linear sort for the 2nd dim") {
    val li = Tables.lineitem(spark, sfDir)
    val zPath = "/tmp/graft_zorder_test/z"
    val linPath = "/tmp/graft_zorder_test/linear"
    Layout.writeZOrdered(li, zPath, 16, col("l_orderkey"), col("l_partkey"))
    li.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.mode("overwrite").parquet(linPath)

    def filesTouched(path: String): Long =
      spark.read.parquet(path)
        .filter(col("l_partkey") < 20)
        .select(input_file_name()).distinct().count()

    val zFiles = filesTouched(zPath)
    val linFiles = filesTouched(linPath)
    // under the linear (orderkey-sorted) layout, partkey values scatter
    // over ~every file; z-ordering confines them to a fraction
    assert(zFiles < linFiles,
      s"z-order touched $zFiles files vs linear $linFiles")
  }

  test("n-dim interleave agrees with 2-dim on the shared prefix bits") {
    // with n=2, interleaveN places bit j of dim i at 2j+i — identical to
    // the mask-shift fast path for 32-bit inputs
    for ((a, b) <- Seq((0L, 0L), (3L, 0L), (0L, 3L), (12345L, 67890L),
        (0xFFFFFFFFL, 0xFFFFFFFFL))) {
      assert(ZOrder.interleaveN(Array(a, b)) == ZOrder.interleave(a, b))
    }
    // 3 dims: bit j of dim i at position 3j+i
    assert(ZOrder.interleaveN(Array(1L, 0L, 0L)) == 1L)
    assert(ZOrder.interleaveN(Array(0L, 1L, 0L)) == 2L)
    assert(ZOrder.interleaveN(Array(0L, 0L, 1L)) == 4L)
    assert(ZOrder.interleaveN(Array(2L, 0L, 0L)) == 8L)
    // expression path: 3-column codes are computed and distinct
    val rows = Tables.lineitem(spark, sfDir).limit(100)
      .select(graft.expressions.ZOrderExpression.interleaveBitsN(
        col("l_orderkey"), col("l_partkey"), col("l_suppkey")).as("z"))
      .collect().map(_.getLong(0))
    assert(rows.distinct.length > 1)
  }

  test("expression matches the scalar helper through codegen") {
    val rows = Tables.lineitem(spark, sfDir).limit(500)
      .select(col("l_orderkey"), col("l_partkey"),
        graft.expressions.ZOrderExpression.interleaveBits(
          col("l_orderkey"), col("l_partkey")).as("z"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) == ZOrder.interleave(r.getLong(0), r.getLong(1)))
    }
  }
}
