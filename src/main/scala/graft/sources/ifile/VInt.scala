package graft.sources.ifile

import java.io.{DataInput, DataOutput}

/** Hadoop zero-compressed VInt/VLong codec, re-implemented from the
  * public encoding spec so the [[IFileKV]] frames are bit-identical to
  * `org.apache.hadoop.io.WritableUtils.writeVLong` (the reference
  * serializes its merge-stream record headers with exactly this codec:
  * src/CommUtils/IOUtility.cc:208-333, size calc :367-383, first-byte
  * decode :389-396).
  *
  * Encoding: values in [-112, 127] are one literal byte. Anything else
  * is a length-prefix byte in [-113, -120] (positive, 1–8 payload
  * bytes) or [-121, -128] (negative, stored as the one's complement),
  * followed by the magnitude big-endian with leading zero bytes
  * dropped. `IFileSpec` differential-tests every boundary against
  * Hadoop's own WritableUtils on the classpath — the byte-compat
  * fixture SURVEY §7.4 calls for.
  */
object VInt {

  def write(out: DataOutput, value: Long): Unit = {
    if (value >= -112 && value <= 127) {
      out.writeByte(value.toInt)
    } else {
      var len = -112
      var v = value
      if (v < 0) { v ^= -1L; len = -120 }
      var tmp = v
      while (tmp != 0) { tmp >>>= 8; len -= 1 }
      out.writeByte(len)
      val nBytes = if (len < -120) -(len + 120) else -(len + 112)
      var idx = nBytes - 1
      while (idx >= 0) {
        out.writeByte(((v >>> (8 * idx)) & 0xff).toInt)
        idx -= 1
      }
    }
  }

  /** Bytes the encoding of `value` occupies (1–9). */
  def size(value: Long): Int = {
    if (value >= -112 && value <= 127) return 1
    var v = if (value < 0) value ^ -1L else value
    var n = 0
    while (v != 0) { v >>>= 8; n += 1 }
    n + 1
  }

  def read(in: DataInput): Long = readWithFirst(in.readByte(), in)

  /** Decode when the first byte was already consumed (readers that use
    * a raw `InputStream.read()` on the leading byte to distinguish a
    * clean end-of-stream from a frame). */
  def readWithFirst(first: Byte, in: DataInput): Long = {
    val len = decodeSize(first)
    if (len == 1) return first.toLong
    var v = 0L
    var i = 0
    while (i < len - 1) {
      v = (v << 8) | (in.readByte() & 0xff)
      i += 1
    }
    if (isNegative(first)) v ^ -1L else v
  }

  /** Total encoded length implied by the first byte (1–9). */
  def decodeSize(first: Byte): Int =
    if (first >= -112) 1
    else if (first < -120) -119 - first
    else -111 - first

  def isNegative(first: Byte): Boolean =
    first < -120 || (first >= -112 && first < 0)

  /** `read` narrowed to Int with a range check (IFile record headers
    * are VInt-framed ints). */
  def readInt(in: DataInput): Int = {
    val v = read(in)
    require(v >= Int.MinValue && v <= Int.MaxValue, s"VInt out of int range: $v")
    v.toInt
  }
}
