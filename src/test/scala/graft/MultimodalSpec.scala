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

  test("frame sampling covers every n_frames-th frame; resize decimates") {
    val docs = Tables.documents(spark, sfDir)
    val feats = Multimodal.extractFeatures(spark, docs).collect()
      .map(f => f.doc_id -> f.n_frames).toMap
    // step=1 samples every frame: per-doc count must equal n_frames
    val all = Multimodal.sampleFrames(spark, docs, step = 1).collect()
    val perDoc = all.groupBy(_.doc_id).view.mapValues(_.length)
    assert(feats.forall { case (id, nf) => perDoc(id) == nf })
    assert(all.forall(f => f.frame_len > 0 && f.frame_len <= 256))
    // step=4 samples ceil(n/4) frames
    val sampled = Multimodal.sampleFrames(spark, docs, step = 4).collect()
      .groupBy(_.doc_id).view.mapValues(_.length)
    assert(feats.forall { case (id, nf) => sampled(id) == (nf + 3) / 4 })

    val resized = Multimodal.resizePayload(spark, docs, factor = 4).collect()
    resized.foreach { r =>
      val (orig, res) = (r.getInt(2), r.getInt(3))
      assert(res == (orig + 3) / 4)
      assert(r.getAs[Array[Byte]]("payload").length == res)
    }
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
