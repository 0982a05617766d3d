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
