package graft

import graft.multimodal.{MediaMeta, Multimodal}

class MultimodalSpec extends SparkSuite {

  test("header decode is real: parses synthesized BMP/WAV, nulls junk") {
    val data = "payload-bytes".getBytes("UTF-8")
    assert(Multimodal.decodeHeader(Multimodal.bmpPayload(33, 17, data))
      .contains(MediaMeta("bmp", Some(33), Some(17), 3, 1)))
    val wav = Multimodal.decodeHeader(Multimodal.wavPayload(2, data))
    assert(wav.contains(MediaMeta("wav", None, None, 2, data.length / 4)))

    // malformed payloads: None (null-feature row), never a throw
    assert(Multimodal.decodeHeader(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeHeader("BAD!".getBytes).isEmpty)
    assert(Multimodal.decodeHeader("BM tiny".getBytes).isEmpty)
    assert(Multimodal.decodeHeader(Array.fill[Byte](100)(0x7F)).isEmpty)
    // right magic, nonsense dims
    val negW = Multimodal.bmpPayload(-5, 10, data)
    assert(Multimodal.decodeHeader(negW).isEmpty)
    val truncatedWav = Multimodal.wavPayload(1, data).take(30)
    assert(Multimodal.decodeHeader(truncatedWav).isEmpty)
  }

  test("extractFeatures decodes container headers and nulls malformed rows") {
    val docs = Tables.documents(spark, sfDir)
    val feats = Multimodal.extractFeatures(spark, docs).collect()
    assert(feats.length == docs.count())
    feats.foreach { f =>
      if (f.doc_id % 11 == 3) {
        assert(f.kind.isEmpty && f.width.isEmpty && f.height.isEmpty &&
          f.channels.isEmpty && f.n_frames.isEmpty,
          s"junk payload must null-decode: $f")
        assert(f.byte_len == 4 && f.first_byte == 'B'.toInt)
      } else if (f.doc_id % 2 == 0) {
        assert(f.kind.contains("bmp") && f.channels.contains(3) &&
          f.n_frames.contains(1) && f.first_byte == 'B'.toInt)
        assert(f.width.exists(w => w >= 1 && w <= 64) &&
          f.height.exists(h => h >= 1 && h <= 64))
      } else {
        assert(f.kind.contains("wav") && f.width.isEmpty && f.height.isEmpty &&
          f.first_byte == 'R'.toInt)
        assert(f.channels.exists(c => c == 1 || c == 2))
        assert(f.n_frames.exists(_ == (f.byte_len - 44) / (2 * f.channels.get)))
      }
    }
    // run twice: identical output (synthesis + decode must be pure)
    val again = Multimodal.extractFeatures(spark, docs).collect()
    assert(feats.sortBy(_.doc_id).sameElements(again.sortBy(_.doc_id)))
  }

  test("frame sampling covers every n_frames-th frame; resize decimates") {
    val docs = Tables.documents(spark, sfDir)
    val blens = docs.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").getBytes("UTF-8").length).toMap
    val expFrames = blens.view.mapValues(b => math.max(1, (b + 255) / 256)).toMap
    // step=1 samples every frame: per-doc count must equal n_frames
    val all = Multimodal.sampleFrames(spark, docs, step = 1).collect()
    val perDoc = all.groupBy(_.doc_id).view.mapValues(_.length)
    assert(expFrames.forall { case (id, nf) => perDoc(id) == nf })
    assert(all.forall(f => f.frame_len > 0 && f.frame_len <= 256))
    // step=4 samples ceil(n/4) frames
    val sampled = Multimodal.sampleFrames(spark, docs, step = 4).collect()
      .groupBy(_.doc_id).view.mapValues(_.length)
    assert(expFrames.forall { case (id, nf) => sampled(id) == (nf + 3) / 4 })

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
