package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.hadoop.io.WritableUtils
import org.apache.spark.sql.functions._

import graft.sources.ifile.VInt

/** Byte-compat gates for the `graft-ifile` source/sink (SURVEY §7.4):
  * the VInt codec is differential-tested against Hadoop's OWN
  * WritableUtils (on the Spark classpath), and whole files written by
  * one side are parsed by the other — so "same framing as the
  * reference's merge stream" is a tested property, not a comment. */
class IFileSpec extends SparkSuite {

  private def hadoopEncode(v: Long): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    WritableUtils.writeVLong(new DataOutputStream(bos), v)
    bos.toByteArray
  }

  private def ourEncode(v: Long): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    VInt.write(new DataOutputStream(bos), v)
    bos.toByteArray
  }

  // every byte-length boundary of the encoding, both signs, plus the
  // one-byte literal range edges and a deterministic pseudo-random sweep
  private val boundaryValues: Seq[Long] = {
    val powers = (0 to 62).map(1L << _)
    val around = powers.flatMap(p => Seq(p - 1, p, p + 1))
    val basics = Seq(0L, 1L, -1L, 127L, 128L, -112L, -113L, 255L, 256L,
      Long.MaxValue, Long.MinValue, Long.MinValue + 1)
    val rng = new scala.util.Random(42)
    val random = Seq.fill(500)(rng.nextLong())
    (basics ++ around ++ around.map(-_) ++ random).distinct
  }

  test("VInt encode is byte-identical to Hadoop WritableUtils.writeVLong") {
    boundaryValues.foreach { v =>
      val ours = ourEncode(v)
      val hadoop = hadoopEncode(v)
      assert(ours.toSeq == hadoop.toSeq,
        s"$v: ours=${ours.mkString(",")} hadoop=${hadoop.mkString(",")}")
      assert(VInt.size(v) == ours.length, s"size($v)")
    }
  }

  test("VInt decode round-trips ours AND Hadoop's bytes") {
    boundaryValues.foreach { v =>
      assert(VInt.read(new DataInputStream(
        new ByteArrayInputStream(ourEncode(v)))) == v)
      assert(WritableUtils.readVLong(new DataInputStream(
        new ByteArrayInputStream(ourEncode(v)))) == v, s"hadoop reads ours: $v")
      assert(VInt.read(new DataInputStream(
        new ByteArrayInputStream(hadoopEncode(v)))) == v, s"we read hadoop's: $v")
    }
  }

  test("ifile write -> read round-trip preserves every (key, value) pair") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ifile_rt").toString
    // keys/values across the interesting sizes: empty, 1 byte, >127
    // bytes (2-byte VInt length), multi-KB
    val df = spark.range(0, 1000, 1, 7).select(
      when(col("id") % 100 === 0, lit(Array.empty[Byte]))
        .otherwise(unhex(lpad(hex(col("id")), 16, "0"))).as("key"),
      encode(repeat(lit("v"), (col("id") % 300).cast("int")), "utf-8").as("value"))
    df.write.format("graft-ifile").mode("overwrite").save(dir)
    val back = spark.read.format("graft-ifile").load(dir)
    assert(back.count() == 1000)
    val want = df.select(hex(col("key")), hex(col("value")))
      .as[(String, String)].collect().sorted.toSeq
    val got = back.select(hex(col("key")), hex(col("value")))
      .as[(String, String)].collect().sorted.toSeq
    assert(got == want)
    // one file per write partition, the reference's MOF shape
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".ifile"))
    assert(files.length == 7, files.map(_.getName).toSeq.toString)
  }

  test("a file we write parses with Hadoop's reader; and vice versa") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ifile_compat").toString
    val pairs = Seq(("k1", "value-one"), ("key-two", ""), ("", "v3"),
      ("k4" * 100, "v4" * 200))
    pairs.toDF("k", "v")
      .select(encode(col("k"), "utf-8").as("key"), encode(col("v"), "utf-8").as("value"))
      .coalesce(1)
      .write.format("graft-ifile").mode("overwrite").save(dir)

    // parse OUR file with Hadoop's VInt reader, raw stream
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".ifile")).head
    val in = new DataInputStream(new java.io.FileInputStream(f))
    val got = Iterator.continually {
      val kl = WritableUtils.readVInt(in)
      val vl = WritableUtils.readVInt(in)
      if (kl == -1 && vl == -1) None
      else {
        val k = new Array[Byte](kl); in.readFully(k)
        val v = new Array[Byte](vl); in.readFully(v)
        Some((new String(k, "UTF-8"), new String(v, "UTF-8")))
      }
    }.takeWhile(_.isDefined).flatten.toSeq
    in.close()
    assert(got.sorted == pairs.sorted)

    // write a file with Hadoop's VInt writer; OUR source must read it
    val dir2 = java.nio.file.Files.createTempDirectory("ifile_compat2").toString
    val out = new DataOutputStream(
      new java.io.FileOutputStream(s"$dir2/hadoop-written.ifile"))
    pairs.foreach { case (k, v) =>
      val kb = k.getBytes("UTF-8"); val vb = v.getBytes("UTF-8")
      WritableUtils.writeVInt(out, kb.length)
      WritableUtils.writeVInt(out, vb.length)
      out.write(kb); out.write(vb)
    }
    WritableUtils.writeVInt(out, -1)
    WritableUtils.writeVInt(out, -1)
    out.close()
    val back = spark.read.format("graft-ifile").load(dir2)
      .select(decode(col("key"), "utf-8"), decode(col("value"), "utf-8"))
      .as[(String, String)].collect().toSeq
    assert(back.sorted == pairs.sorted)
  }

  test("empty dataframe writes EOF-only files that read back as zero rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ifile_empty").toString
    Seq.empty[(Array[Byte], Array[Byte])].toDF("key", "value")
      .write.format("graft-ifile").mode("overwrite").save(dir)
    assert(spark.read.format("graft-ifile").load(dir).count() == 0)
    // a non-existent path also reads as empty (the empty-increment run)
    assert(spark.read.format("graft-ifile")
      .load(s"$dir/never_written").count() == 0)
  }

  private def kvDf(n: Int, parts: Int) =
    spark.range(0, n, 1, parts)
      .select(unhex(lpad(hex(col("id")), 16, "0")).as("key"),
        encode(concat(lit("payload-"), col("id")), "utf-8").as("value"))

  private def hexPairs(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] = {
    import spark.implicits._
    df.select(hex(col("key")), hex(col("value")))
      .as[(String, String)].collect().sorted.toSeq
  }

  test("compressed round-trip (snappy and zstd) matches raw, self-describes") {
    val want = hexPairs(kvDf(2000, 3))
    Seq("snappy", "zstd").foreach { c =>
      val dir = java.nio.file.Files.createTempDirectory(s"ifile_$c").toString
      kvDf(2000, 3).write.format("graft-ifile")
        .option("compression", c)
        .option("block.size.bytes", "4096")
        .mode("overwrite").save(dir)
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".ifile"))
      assert(files.nonEmpty && files.forall(_.getName.endsWith(s".$c.ifile")),
        s"codec must be in the name: ${files.map(_.getName).toSeq}")
      // compression actually happened (repetitive payloads)
      val rawDir = java.nio.file.Files.createTempDirectory("ifile_raw").toString
      kvDf(2000, 3).write.format("graft-ifile").mode("overwrite").save(rawDir)
      val rawSize = new java.io.File(rawDir).listFiles()
        .filter(_.getName.endsWith(".ifile")).map(_.length).sum
      assert(files.map(_.length).sum < rawSize,
        s"$c produced no size win over raw")
      assert(hexPairs(spark.read.format("graft-ifile").load(dir)) == want)
    }
  }

  test("a corrupt compressed block fails loudly, not with silent data loss") {
    val dir = java.nio.file.Files.createTempDirectory("ifile_corrupt").toString
    kvDf(500, 1).write.format("graft-ifile")
      .option("compression", "snappy").mode("overwrite").save(dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".ifile")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x5a).toByte
    java.nio.file.Files.write(f.toPath, bytes)
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-ifile").load(dir).count()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.toString).mkString("; ")
    assert(msgs.contains("corrupt") || msgs.contains("FAILED_TO_UNCOMPRESS")
      || msgs.contains("IllegalState"), msgs)
  }

  test("lzo is refused loudly by name, never misparsed as raw") {
    // write path: the codec option is rejected before any file exists
    val e1 = intercept[Throwable] {
      kvDf(10, 1).write.format("graft-ifile")
        .option("compression", "lzo").mode("overwrite")
        .save(java.nio.file.Files.createTempDirectory("ifile_lzo_w").toString)
    }
    val m1 = Iterator.iterate(e1)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("; ")
    assert(m1.contains("codec 'lzo' is not supported") &&
      m1.contains("snappy, zstd"), m1)
    // read path: a .lzo.ifile data file must fail at open with the
    // codec named - NOT fall through to the raw-VInt reader and
    // misparse compressed bytes as record frames
    val dir = java.nio.file.Files.createTempDirectory("ifile_lzo_r")
    java.nio.file.Files.write(dir.resolve("part-0.lzo.ifile"),
      Array.fill[Byte](64)(0x11))
    val e2 = intercept[Throwable] {
      spark.read.format("graft-ifile").load(dir.toString).count()
    }
    val m2 = Iterator.iterate(e2)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("; ")
    assert(m2.contains("codec 'lzo' is not supported"), m2)
  }

  test("index sidecar makes one big file read as multiple partitions") {
    val dir = java.nio.file.Files.createTempDirectory("ifile_split").toString
    // ONE file (coalesce(1)), tiny index interval so there are many marks
    kvDf(20000, 1).write.format("graft-ifile")
      .option("index.interval.bytes", "1024")
      .mode("overwrite").save(dir)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".ifile.idx")) == 1, "sidecar missing")
    val whole = spark.read.format("graft-ifile").load(dir)
    val split = spark.read.format("graft-ifile")
      .option("max.split.bytes", "65536").load(dir)
    assert(whole.rdd.getNumPartitions == 1,
      s"default split bytes must not split this file")
    val nParts = split.rdd.getNumPartitions
    assert(nParts > 1, s"expected >1 partitions, got $nParts")
    assert(hexPairs(split) == hexPairs(whole))
    assert(split.count() == 20000)
  }

  test("split reads of a COMPRESSED file also agree with the whole read") {
    val dir = java.nio.file.Files.createTempDirectory("ifile_splitc").toString
    kvDf(20000, 1).write.format("graft-ifile")
      .option("compression", "zstd")
      .option("block.size.bytes", "2048")
      .option("index.interval.bytes", "1024")
      .mode("overwrite").save(dir)
    val whole = spark.read.format("graft-ifile").load(dir)
    val split = spark.read.format("graft-ifile")
      .option("max.split.bytes", "16384").load(dir)
    assert(split.rdd.getNumPartitions > 1)
    assert(hexPairs(split) == hexPairs(whole))
  }

  test("a corrupt index sidecar falls back to one correct partition") {
    val dir = java.nio.file.Files.createTempDirectory("ifile_badidx").toString
    kvDf(8000, 1).write.format("graft-ifile")
      .option("index.interval.bytes", "512")
      .mode("overwrite").save(dir)
    val want = hexPairs(spark.read.format("graft-ifile").load(dir))
    val idx = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".ifile.idx")).head
    // truncate mid-entry: length no longer a multiple of 8
    val bytes = java.nio.file.Files.readAllBytes(idx.toPath)
    java.nio.file.Files.write(idx.toPath, bytes.dropRight(3))
    val df = spark.read.format("graft-ifile")
      .option("max.split.bytes", "1000").load(dir)
    assert(df.rdd.getNumPartitions == 1,
      "corrupt sidecar must not be trusted for splitting")
    assert(hexPairs(df) == want)
    // garbage offsets (non-monotonic / past EOF) are equally rejected
    val out = new java.io.DataOutputStream(new java.io.FileOutputStream(idx))
    out.writeLong(500); out.writeLong(400); out.writeLong(1L << 40)
    out.close()
    val df2 = spark.read.format("graft-ifile")
      .option("max.split.bytes", "1000").load(dir)
    assert(df2.rdd.getNumPartitions == 1)
    assert(hexPairs(df2) == want)
  }

  test("split-size sweep: every max.split.bytes yields the same multiset") {
    // raw and compressed, several split granularities incl. pathological
    // (smaller than one record's stride): partition planning must never
    // drop, duplicate, or tear a record
    Seq(("none", "ifile_sw_raw"), ("snappy", "ifile_sw_sz")).foreach {
      case (codec, tag) =>
        val dir = java.nio.file.Files.createTempDirectory(tag).toString
        kvDf(8000, 1).write.format("graft-ifile")
          .option("compression", codec)
          .option("block.size.bytes", "1024")
          .option("index.interval.bytes", "512")
          .mode("overwrite").save(dir)
        val want = hexPairs(spark.read.format("graft-ifile").load(dir))
        Seq(100, 1000, 9999, 50000, 1 << 20).foreach { sp =>
          val df = spark.read.format("graft-ifile")
            .option("max.split.bytes", sp.toString).load(dir)
          assert(hexPairs(df) == want,
            s"codec=$codec max.split.bytes=$sp diverged " +
              s"(${df.rdd.getNumPartitions} partitions)")
        }
    }
  }

  test("commit refuses to silently drop data when rename fails") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ifile_rn").toString
    // occupy the destination NAME with a directory: local-fs rename
    // "succeeds" by moving the file INSIDE it (HDFS rename-into-dir
    // semantics) — the old commit left data invisible to readers and
    // the job "passed"; renameOrDie must refuse
    new java.io.File(dir, "part-00000.ifile").mkdirs()
    val e = intercept[Throwable] {
      Seq((Array[Byte](1), Array[Byte](2))).toDF("key", "value")
        .coalesce(1).write.format("graft-ifile").mode("append").save(dir)
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.toString).mkString("; ")
    assert(msgs.contains("refusing to drop committed data"), msgs)

    // and the raw false-return path (no clobber-check shortcut): rename
    // under a parent that is a regular FILE returns false, must throw
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val src = new org.apache.hadoop.fs.Path(dir, "src-file")
    fs.create(src, true).close()
    val parentFile = new org.apache.hadoop.fs.Path(dir, "plain-file")
    fs.create(parentFile, true).close()
    val e2 = intercept[java.io.IOException] {
      graft.sources.ifile.IFileKV.renameOrDie(fs, src,
        new org.apache.hadoop.fs.Path(parentFile, "child"))
    }
    // local fs throws its own IOException here; HDFS would return false
    // and renameOrDie raises. Either way: loud, never silent.
    assert(e2.getMessage.contains("refusing to drop committed data") ||
      e2.getMessage.contains("not a directory"), e2.getMessage)
  }

  test("commit cleans only its own staging dir, not concurrent writers'") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ifile_tmp").toString
    // a concurrent write's in-flight staging dir
    val foreign = new java.io.File(s"$dir/_temporary/other-writer-uuid")
    foreign.mkdirs()
    val marker = new java.io.File(foreign, "task-0-0")
    java.nio.file.Files.write(marker.toPath, Array[Byte](1, 2, 3))
    Seq((Array[Byte](1), Array[Byte](2))).toDF("key", "value")
      .coalesce(1).write.format("graft-ifile").mode("overwrite").save(dir)
    assert(marker.exists(),
      "commit deleted a concurrent writer's staging files")
    assert(spark.read.format("graft-ifile").load(dir).count() == 1)
  }

  test("tasks see the session Hadoop conf, not a bare new Configuration") {
    import graft.sources.ifile.{HadoopConfHolder, IFileKV}
    spark.sparkContext.hadoopConfiguration.set("graft.test.marker", "present")
    try {
      val holder = IFileKV.sessionConf()
      assert(holder.value.get("graft.test.marker") == "present")
      // and the value survives the executor-side serialize/rebuild path
      val bos = new ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(holder); oos.close()
      val back = new java.io.ObjectInputStream(
        new ByteArrayInputStream(bos.toByteArray))
        .readObject().asInstanceOf[HadoopConfHolder]
      assert(back.value.get("graft.test.marker") == "present")
    } finally spark.sparkContext.hadoopConfiguration.unset("graft.test.marker")
  }

  test("overwrite truncates previous files; binary sort order matches memcmp") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ifile_ow").toString
    def write(n: Int, parts: Int): Unit =
      spark.range(n).repartition(parts)
        .select(unhex(lpad(hex(col("id")), 16, "0")).as("key"),
          encode(col("id").cast("string"), "utf-8").as("value"))
        .write.format("graft-ifile").mode("overwrite").save(dir)
    write(100, 5)
    write(10, 2) // fewer files; old part-00002..4 must not survive
    val back = spark.read.format("graft-ifile").load(dir)
    assert(back.count() == 10)
    // Spark's BinaryType ordering is unsigned lexicographic — the same
    // contract as the reference's text_compare/bytes_compare memcmp
    // (src/Merger/CompareFunc.cc:82-91); big-endian keys sort numerically
    val sorted = back.orderBy(col("key"))
      .select(decode(col("value"), "utf-8")).as[String].collect().toSeq
    assert(sorted == (0 until 10).map(_.toString))
  }
}
