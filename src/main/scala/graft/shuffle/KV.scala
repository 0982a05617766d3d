package graft.shuffle

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.functions.col

/** Typed key/value shuffle-merge veneer — the reference's operator
  * surface (partition routing, k-way sorted merge, sorted group
  * delivery) expressed as thin Spark primitives.
  *
  * Mapping (SURVEY §1.5 / §2.1):
  *  - `partitionByKey`  = reduceID routing (O1–O4): hash exchange.
  *  - `mergeSorted`     = the k-way merge (O5–O7): each output partition
  *    is a globally key-sorted run — Spark's ExternalSorter IS the
  *    LPQ/RPQ two-level merge, spill files included.
  *  - `sortedGroups`    = grouped delivery to the reduce function (O12,
  *    J2CQueue): per-key iterator, keys adjacent.
  * Ordering semantics match the reference's comparators: String sorts
  * byte-wise like `text_compare`, numeric types like `byte_compare`,
  * Array[Byte]/BinaryType byte-wise like `bytes_compare`
  * (reference src/Merger/CompareFunc.cc:29-91).
  */
object KV {

  /** Route records to `n` partitions by key hash (reduceID routing). */
  def partitionByKey[K, V](ds: Dataset[(K, V)], n: Int): Dataset[(K, V)] =
    ds.repartition(n, col("_1"))

  /** Partition by key and deliver each partition as a key-sorted run —
    * the network-levitated merge's output contract. */
  def mergeSorted[K, V](ds: Dataset[(K, V)], n: Int): Dataset[(K, V)] =
    ds.repartition(n, col("_1")).sortWithinPartitions(col("_1"))

  /** Globally key-sorted stream (range partition + per-partition sort —
    * the TeraSort pattern). */
  def globalSorted[K, V](ds: Dataset[(K, V)]): Dataset[(K, V)] =
    ds.orderBy(col("_1"))

  /** Sorted-group reduce: the (key, values iterator) delivery the Hadoop
    * reducer sees. Spark chooses hash- or sort-based grouping. */
  def reduceByKeyTyped[K: Encoder, V](ds: Dataset[(K, V)], f: (V, V) => V)(
      implicit kv: Encoder[(K, V)]): Dataset[(K, V)] =
    ds.groupByKey(_._1).reduceGroups((a, b) => (a._1, f(a._2, b._2)))
      .map { case (_, (k, v)) => (k, v) }

  /** Full grouped iteration (arbitrary reduce function over the sorted
    * values of one key). */
  def mapGroups[K: Encoder, V, O: Encoder](ds: Dataset[(K, V)])(
      f: (K, Iterator[V]) => O): Dataset[O] =
    ds.groupByKey(_._1).mapGroups((k, it) => f(k, it.map(_._2)))
}
