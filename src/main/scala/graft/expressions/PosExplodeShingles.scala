package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** UDTF exemplar: a custom Catalyst `Generator` (table function) that
  * emits one (pos, shingle) row per distinct word n-gram of `child`,
  * in first-occurrence order — `posexplode(WordShingles(text))` fused
  * into a single generator, usable from SQL as
  * `LATERAL VIEW graft_posexplode_shingles(text, n) g AS pos, shingle`.
  *
  * This is the "custom generator" row of SURVEY §2.2's UDF/UDAF/UDTF
  * category: built-in `explode` covers the common case; this shows the
  * engine's extension point for table functions whose row expansion
  * logic Spark lacks. Shingling semantics match [[WordShingles]]
  * exactly (whitespace split keeping empties, space-joined, distinct by
  * first occurrence) so the two surfaces are differential-testable.
  */
case class PosExplodeShingles(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) return Iterator.empty
    val parts = t.asInstanceOf[UTF8String].split(UTF8String.fromString(" "), -1)
    if (parts.length < n) return Iterator.empty
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    val last = parts.length - n
    while (i <= last) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(parts(i + j).toString)
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val it = seen.iterator()
    new Iterator[InternalRow] {
      private var k = 0
      override def hasNext: Boolean = it.hasNext
      override def next(): InternalRow = {
        val r = InternalRow(k, UTF8String.fromString(it.next()))
        k += 1
        r
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
