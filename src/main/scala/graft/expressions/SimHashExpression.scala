package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a document in one pass: whitespace-tokenize,
  * de-duplicate tokens, hash each token, count per-bit ones; bit b of
  * the result is set iff 2·ones(b) > n_distinct_tokens.
  *
  * Token hash = MD5 digest bytes 8..15 read little-endian — exactly
  * DuckDB's `md5_number_lower`, which is what makes the simhash (and
  * therefore the chunk-blocked near-dup pairs built on it) a FULL
  * cross-engine oracle query instead of an accuracy-gated one: the
  * oracle recomputes every signature from the raw text and the hash
  * compare must agree bit-for-bit. MD5 costs ~3-5× xxhash64 per token,
  * but the signature is one map-side pass per document (no shuffle,
  * no join), so the trade buys engine-independent verifiability for a
  * cost that stays invisible next to the pair join it feeds.
  *
  * Composing this from Spark primitives (explode → 16 packed-lane SUMs →
  * 64-term reassembly) was correct but its expression trees cost seconds
  * of driver-side Catalyst analysis per plan (and AQE re-plans multiply
  * that). One opaque expression makes the signature a plain map-side
  * column: no explode, no aggregation, no shuffle, nothing to optimize.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val md = SimHash64.digests.get()
    val parts = input.asInstanceOf[UTF8String]
      .split(UTF8String.fromString(" "), -1)
    val seen = new java.util.HashSet[UTF8String]()
    val ones = new Array[Int](64)
    var n = 0
    var i = 0
    while (i < parts.length) {
      val t = parts(i)
      if (t.numBytes() > 0 && seen.add(t)) {
        n += 1
        md.reset()
        val d = md.digest(t.getBytes)
        // digest bytes 8..15 little-endian == DuckDB md5_number_lower
        var h = 0L
        var j = 0
        while (j < 8) {
          h |= (d(8 + j) & 0xFFL) << (8 * j)
          j += 1
        }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) ones(b) += 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (2 * ones(b) > n) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object SimHash64 {
  /** MessageDigest is stateful and not thread-safe; expression
    * instances can be evaluated concurrently by many task threads. */
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

object SimHashExpression {
  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))
}
