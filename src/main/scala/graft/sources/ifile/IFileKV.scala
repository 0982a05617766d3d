package graft.sources.ifile

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Batch source/sink for the reference's on-the-wire record format:
  * a stream of `<VInt keyLen> <VInt valLen> <key bytes> <val bytes>`
  * records terminated by a `-1/-1` EOF marker — Hadoop IFile framing
  * without the checksums (writer: src/Merger/StreamRW.cc:151-225, EOF
  * constant :20; reader: BaseSegment::nextKVInternal
  * src/Merger/StreamRW.cc:334-404). Registered as format
  * `graft-ifile`; fixed schema `(key BINARY, value BINARY)`.
  *
  * Scale shape (mirrors the reference's MOF layout): ONE file per
  * write task, and on read ONE input partition per file — the framing
  * has no sync markers, so a single file is not splittable, and read
  * parallelism comes from file count exactly as the reference's
  * reducer parallelism comes from segment count. A 1000-executor job
  * writes 1000s of files and reads them 1:1; what never happens is a
  * driver-side pass over record data.
  *
  * Commit protocol: writers stream to `_temporary/<uuid>` names and
  * the driver renames to `part-NNNNN.ifile` only in `commit()`, so a
  * failed/speculative task can never leave a half-written file visible
  * to readers (the same job-level atomicity contract Spark's file
  * sources get from FileOutputCommitter).
  */
class IFileKVSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-ifile"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    IFileKV.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-ifile requires a path"))
    new IFileKVTable(path)
  }
  override def supportsExternalMetadata(): Boolean = true
}

object IFileKV {
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = false),
    StructField("value", BinaryType, nullable = false)))

  private[ifile] val EofMarker = -1

  /** Records that a VInt length field read something other than a
    * non-negative length or the EOF pair — a truncated or foreign file. */
  private[ifile] def badFrame(what: String, v: Int, file: String): Nothing =
    throw new IllegalStateException(
      s"graft-ifile: corrupt frame ($what = $v) in $file")
}

private[ifile] class IFileKVTable(path: String)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-ifile `$path`"
  override def schema(): StructType = IFileKV.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new IFileKVScan(path)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val in = info.schema()
    require(in.length == 2 && in.forall(_.dataType == BinaryType),
      s"graft-ifile writes exactly (key BINARY, value BINARY); got $in")
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new IFileKVBatchWrite(path, doTruncate)
      }
    }
  }
}

// ---------------------------------------------------------------- read

private[ifile] case class IFileInputPartition(file: String)
    extends InputPartition

private[ifile] class IFileKVScan(path: String) extends Scan with Batch {
  override def readSchema(): StructType = IFileKV.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    if (!fs.exists(p)) return Array.empty
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".ifile"))
      .sortBy(_.getPath.getName)
      .map(s => IFileInputPartition(s.getPath.toString): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new IFileKVReader(partition.asInstanceOf[IFileInputPartition].file)
    }
}

private[ifile] class IFileKVReader(file: String)
    extends PartitionReader[InternalRow] {
  private val in = {
    val p = new Path(file)
    new java.io.DataInputStream(new java.io.BufferedInputStream(
      p.getFileSystem(new Configuration()).open(p), 1 << 16))
  }
  private var row: InternalRow = _
  private var eof = false

  override def next(): Boolean = {
    if (eof) return false
    val keyLen = VInt.readInt(in)
    val valLen = VInt.readInt(in)
    if (keyLen == IFileKV.EofMarker && valLen == IFileKV.EofMarker) {
      eof = true
      return false
    }
    if (keyLen < 0) IFileKV.badFrame("keyLen", keyLen, file)
    if (valLen < 0) IFileKV.badFrame("valLen", valLen, file)
    val key = new Array[Byte](keyLen)
    val value = new Array[Byte](valLen)
    in.readFully(key)
    in.readFully(value)
    row = new GenericInternalRow(Array[Any](key, value))
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}

// --------------------------------------------------------------- write

private[ifile] case class IFileCommit(tempFile: String, partitionId: Int)
    extends WriterCommitMessage

private[ifile] class IFileKVBatchWrite(path: String, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // stage under the destination so commit's rename is a same-FS move
    val stage = s"$path/_temporary/${java.util.UUID.randomUUID()}"
    new IFileKVWriterFactory(stage)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dst = new Path(path)
    val fs = dst.getFileSystem(new Configuration())
    if (truncate && fs.exists(dst)) {
      fs.listStatus(dst).filter(s => s.isFile &&
        s.getPath.getName.endsWith(".ifile")).foreach(s => fs.delete(s.getPath, false))
    }
    fs.mkdirs(dst)
    messages.foreach { case IFileCommit(temp, pid) =>
      fs.rename(new Path(temp), new Path(dst, f"part-$pid%05d.ifile"))
    }
    fs.delete(new Path(dst, "_temporary"), true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val dst = new Path(path)
    val fs = dst.getFileSystem(new Configuration())
    fs.delete(new Path(dst, "_temporary"), true)
  }
}

private[ifile] class IFileKVWriterFactory(stageDir: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new IFileKVWriter(s"$stageDir/task-$partitionId-$taskId", partitionId)
}

private[ifile] class IFileKVWriter(tempFile: String, partitionId: Int)
    extends DataWriter[InternalRow] {
  private val p = new Path(tempFile)
  private val fs = p.getFileSystem(new Configuration())
  private val out = new java.io.DataOutputStream(
    new java.io.BufferedOutputStream(fs.create(p, true), 1 << 16))

  override def write(record: InternalRow): Unit = {
    val key = record.getBinary(0)
    val value = record.getBinary(1)
    require(key != null && value != null,
      "graft-ifile: null key/value — frame lengths cannot encode null")
    VInt.write(out, key.length.toLong)
    VInt.write(out, value.length.toLong)
    out.write(key)
    out.write(value)
  }

  override def commit(): WriterCommitMessage = {
    VInt.write(out, IFileKV.EofMarker.toLong)
    VInt.write(out, IFileKV.EofMarker.toLong)
    out.close()
    IFileCommit(tempFile, partitionId)
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(p, false)
  }

  override def close(): Unit = ()
}
