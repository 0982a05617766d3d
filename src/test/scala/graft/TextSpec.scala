package graft

import graft.text.TextFunctions
import org.apache.spark.sql.functions._

class TextSpec extends SparkSuite {
  import spark.implicits._

  test("UDTF generator == posexplode(shingles) on fixtures and edge cases") {
    graft.functions.GraftFunctions.register(spark)
    val edge = Seq((9001L, ""), (9002L, "one"), (9003L, "a b c"),
      (9004L, "dup dup dup dup dup")).toDF("doc_id", "text")
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).union(edge)
    docs.createOrReplaceTempView("docs_udtf_spec")
    val viaGen = spark.sql(
      """SELECT doc_id, pos, shingle FROM docs_udtf_spec
        |LATERAL VIEW graft_posexplode_shingles(text, 3) g AS pos, shingle""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val viaExplode = docs.select(col("doc_id"),
        posexplode(TextFunctions.shingles(col("text"), 3)).as(Seq("pos", "shingle")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(viaGen == viaExplode)
    assert(viaGen.nonEmpty)
  }

  test("native WordShingles == HOF reference on fixtures and edge cases") {
    val edge = Seq("", "one", "a b", "a b c", "a b c d", "x  y z",
      "dup dup dup dup dup").toDF("text")
    val docs = Tables.documents(spark, sfDir).select(col("text"))
      .union(edge)
    val bad = docs.select(
        TextFunctions.shingles(col("text"), 3).as("nat"),
        TextFunctions.shinglesHof(col("text"), 3).as("ref"))
      .filter(col("nat") =!= col("ref")).count()
    assert(bad == 0)
  }

  test("native QualityScoreRaw == HOF reference on fixtures and edge cases") {
    import spark.implicits._
    // null rows pin the null-in-null-out contract on BOTH twins (a null
    // text or null n_chars must yield a null score, not a partial one)
    val edge = Seq[(Option[String], Option[Long])](
      (Some(""), Some(0L)), (Some("one"), Some(3L)), (Some("a b"), Some(3L)),
      (Some("x  y z"), Some(6L)), (Some("dup dup dup dup"), Some(15L)),
      (Some("    "), Some(4L)),
      (Some("unicode héllo wörld ünïcode"), Some(27L)),
      (Some("a" * 600), Some(600L)),
      (None, Some(5L)), (Some("one"), None), (None, None))
      .toDF("text", "n_chars")
    val docs = Tables.documents(spark, sfDir)
      .select(col("text"), col("n_chars")).union(edge)
    val bad = docs.select(
        TextFunctions.qualityScore(col("text"), col("n_chars")).as("nat"),
        TextFunctions.qualityScoreHof(col("text"), col("n_chars")).as("ref"))
      .filter(!(col("nat") <=> col("ref"))).count()
    assert(bad == 0, "native quality score diverges from the HOF reference")
  }

  test("native StopwordRatioRaw == HOF reference on fixtures and edge cases") {
    import spark.implicits._
    val edge = Seq[Option[String]](Some(""), Some("the"), Some("the the the"),
      Some("a  of to"), Some("word"), Some("    "), Some("THE The the"),
      Some("of words and the tally a to"), None).toDF("text")
    val docs = Tables.documents(spark, sfDir).select(col("text")).union(edge)
    val bad = docs.select(
        TextFunctions.stopwordRatio(col("text")).as("nat"),
        TextFunctions.stopwordRatioHof(col("text")).as("ref"))
      .filter(!(col("nat") <=> col("ref"))).count()
    assert(bad == 0, "native stopword ratio diverges from the HOF reference")
  }

  test("quality score in [0,1]; fingerprints stable") {
    val docs = Tables.documents(spark, sfDir)
    val qs = docs.select(
      TextFunctions.qualityScore(col("text"), col("n_chars")).as("q")).collect()
    assert(qs.forall(r => r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0))
    val fp1 = docs.select(TextFunctions.fingerprint(col("text"))).collect()
    val fp2 = docs.select(TextFunctions.fingerprint(col("text"))).collect()
    assert(fp1.sameElements(fp2))
  }
}
