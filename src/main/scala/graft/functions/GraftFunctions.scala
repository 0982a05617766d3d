package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF exemplar (SURVEY §7.3 step 4): exact weighted average.
  *
  * The buffer keeps integer cents (price·100 rounded) and integer
  * weights, so the merge is associative/commutative over exact values —
  * the result is independent of partitioning and reproducible in plain
  * SQL (the oracle mirrors the same arithmetic). This is the pattern for
  * any user aggregate that must survive a distributed, order-free
  * reduction: keep the buffer exact, defer floating point to `finish`.
  */
case class WAvgBuf(sumPriceQtyCents: Long, sumQty: Long)

object WeightedAvgCents extends Aggregator[(Double, Double), WAvgBuf, Double] {
  override def zero: WAvgBuf = WAvgBuf(0L, 0L)
  override def reduce(b: WAvgBuf, in: (Double, Double)): WAvgBuf = {
    val cents = math.round(in._1 * 100) // exact for 2-decimal inputs
    val qty = math.round(in._2)
    WAvgBuf(b.sumPriceQtyCents + cents * qty, b.sumQty + qty)
  }
  override def merge(a: WAvgBuf, b: WAvgBuf): WAvgBuf =
    WAvgBuf(a.sumPriceQtyCents + b.sumPriceQtyCents, a.sumQty + b.sumQty)
  override def finish(b: WAvgBuf): Double =
    if (b.sumQty == 0) 0.0 else (b.sumPriceQtyCents.toDouble / 100.0) / b.sumQty
  override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** SQL-surface registration of the engine's functions: native Catalyst
  * expressions (preferred — codegen-friendly), the UDAF, and a scalar
  * UDF exemplar (documented as the LAST resort: a Scala UDF is a
  * black box to Catalyst — no pushdown through it, no codegen).
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    // idempotent PER FUNCTION: a session built with
    // `spark.sql.extensions=graft.GraftSessionExtensions` already has
    // graft_cosine/dot/simhash64/shingles/posexplode_shingles injected,
    // so a whole-registry guard on one sentinel name still re-registers
    // the injected five and spams "replaced a previously registered
    // function" WARNs into bench/verify logs. Check each name.
    val reg = spark.sessionState.functionRegistry
    def temp(name: String)(b: Seq[org.apache.spark.sql.catalyst.expressions.Expression]
        => org.apache.spark.sql.catalyst.expressions.Expression): Unit =
      if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, b, "scala_udf")

    temp("graft_cosine")(exprs => graft.expressions.CosineSimilarity(exprs(0), exprs(1)))
    temp("graft_dot")(exprs => graft.expressions.DotProduct(exprs(0), exprs(1)))
    temp("graft_simhash64")(exprs => graft.expressions.SimHash64(exprs.head))
    temp("graft_shingles")(exprs => graft.expressions.WordShingles(exprs.head, 3))
    // UDTF surface: a custom Generator usable via LATERAL VIEW; the
    // shingle size must be a literal (it shapes the generator itself)
    temp("graft_posexplode_shingles")(exprs =>
      graft.expressions.PosExplodeShingles(exprs(0),
        if (exprs.length > 1)
          exprs(1).eval(InternalRow.empty) match {
            case i: Int => i
            case l: Long => l.toInt
          }
        else 3))
    // native Catalyst aggregate (TypedImperativeAggregate): bounded
    // k-element heap per group, partial+final like any built-in
    temp("graft_topk_vals")(exprs =>
      graft.expressions.TopKValuesAggregate(exprs(0),
        exprs(1).eval(InternalRow.empty) match {
          case i: Int => i
          case l: Long => l.toInt
        }))
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_wavg")))
      spark.udf.register("graft_wavg", udaf(WeightedAvgCents))
    // scalar UDF exemplar — same banding as q_conditional but through
    // the UDF machinery, to exercise that surface deliberately
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_qty_band")))
      spark.udf.register("graft_qty_band", (q: Double) =>
        if (q > 40) "bulk" else if (q > 10) "mid" else "small")
  }
}
