package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSuite {

  test("binary payload features are deterministic and consistent") {
    val docs = Tables.documents(spark, sfDir)
    val feats = Multimodal.extractFeatures(spark, docs).collect()
    assert(feats.length == docs.count())
    feats.foreach { f =>
      assert(f.byte_len >= 0)
      assert(f.width == f.byte_len % 64 + 1)
      assert(f.height == (f.byte_len / 64) % 64 + 1)
      assert(f.channels == 3)
      assert(f.n_frames == math.max(1, (f.byte_len + 255) / 256))
    }
    // run twice: identical output (stub decode must be pure)
    val again = Multimodal.extractFeatures(spark, docs).collect()
    assert(feats.sortBy(_.doc_id).sameElements(again.sortBy(_.doc_id)))
  }

  test("payload round-trips utf-8 text") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir).limit(20)
    val bad = Multimodal.withBinaryPayload(docs)
      .select(decode(col("payload"), "UTF-8").as("t2"), col("text"))
      .filter(col("t2") =!= col("text")).count()
    assert(bad == 0)
  }
}
