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

  }

  test("resize is real: stride-aware NN pixels, frame decimation, valid re-encode") {
    // independent reimplementation of the expected checksums straight
    // from the mediaByte formula - if resizeBmp/resizeWav misread a
    // stride, row direction, or offset, these mismatch
    def mb(id: Long, x: Int, y: Int, c: Int): Int =
      ((id * 31 + x * 7 + y * 13 + c * 17) % 256).toInt
    for ((id, nChars) <- Seq((0L, 4L), (2L, 68L), (4L, 553L), (6L, 129L))) {
      val w = (nChars % 64 + 1).toInt; val h = ((nChars / 64) % 64 + 1).toInt
      val (w2, h2) = ((w + 1) / 2, (h + 1) / 2)
      val bytes = Multimodal.synthesizeDecodableMedia(id, nChars)
      val (out, sum) = Multimodal.resizeBmp(bytes)
      val exp = (for (x2 <- 0 until w2; y2 <- 0 until h2; c <- 0 until 3)
        yield mb(id, 2 * x2, 2 * y2, c).toLong *
          (1 + (x2 * 5 + y2 * 3 + c) % 7)).sum
      assert(sum == exp, s"bmp checksum id=$id")
      // the re-encoded output is itself a valid, decodable BMP
      assert(Multimodal.decodeHeader(out)
        .contains(MediaMeta("bmp", Some(w2), Some(h2), 3, 1)))
      // and resizing it again halves dims again (idempotent pipeline)
      assert(Multimodal.decodeHeader(Multimodal.resizeBmp(out)._1)
        .exists(m => m.width.contains((w2 + 1) / 2)))
    }
    for ((id, nChars) <- Seq((1L, 48L), (5L, 101L), (7L, 50L))) {
      val ch = (nChars % 2 + 1).toInt; val nf = (nChars % 50 + 5).toInt
      val nf2 = (nf + 1) / 2
      val bytes = Multimodal.synthesizeDecodableMedia(id, nChars)
      val (out, sum) = Multimodal.resizeWav(bytes)
      val exp = (for (j <- 0 until nf2; c <- 0 until ch; bb <- 0 until 2)
        yield mb(id, 2 * j, bb, c).toLong *
          (1 + (j * 5 + c * 3 + bb) % 7)).sum
      assert(sum == exp, s"wav checksum id=$id")
      assert(Multimodal.decodeHeader(out)
        .contains(MediaMeta("wav", None, None, ch, nf2)))
    }
    // distributed surface: junk ids null out, everything else resamples
    val rm = Multimodal.resizeMedia(spark, Tables.documents(spark, sfDir))
      .collect()
    assert(rm.nonEmpty)
    rm.foreach { r =>
      if (r.doc_id % 11 == 3) assert(r.kind.isEmpty && r.checksum.isEmpty)
      else if (r.doc_id % 2 == 0)
        assert(r.kind.contains("bmp") && r.out_w.nonEmpty && r.checksum.nonEmpty)
      else assert(r.kind.contains("wav") && r.out_frames.nonEmpty)
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
