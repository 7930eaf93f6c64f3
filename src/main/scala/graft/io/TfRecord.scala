package graft.io

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, EOFException, InputStream, OutputStream}
import java.util.zip.{CRC32C, GZIPInputStream, GZIPOutputStream}

/** TFRecord container framing (the reference's sink format, written by
  * the inherited TFX `WriteSplit` — invocation at
  * `feast_component/executor.py:181`). Public format spec
  * (tensorflow/core/lib/io/record_writer.h):
  *
  * {{{
  *   uint64 length (LE)
  *   uint32 masked_crc32c(length bytes) (LE)
  *   byte   data[length]
  *   uint32 masked_crc32c(data) (LE)
  * }}}
  *
  * masked_crc = ((crc >> 15) | (crc << 17)) + 0xa282ead8, on CRC-32C
  * (Castagnoli) — `java.util.zip.CRC32C` since JDK 9.
  */
object TfRecord {

  private val MaskDelta = 0xa282ead8L

  private[io] def maskedCrc32c(bytes: Array[Byte]): Int = {
    val crc = new CRC32C
    crc.update(bytes, 0, bytes.length)
    val c = crc.getValue
    ((((c >>> 15) | (c << 17)) + MaskDelta) & 0xffffffffL).toInt
  }

  private def writeIntLE(out: OutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }

  def writeRecord(out: OutputStream, payload: Array[Byte]): Unit = {
    val lenBytes = new Array[Byte](8)
    var l = payload.length.toLong
    var i = 0
    while (i < 8) { lenBytes(i) = (l & 0xff).toByte; l >>>= 8; i += 1 }
    out.write(lenBytes)
    writeIntLE(out, maskedCrc32c(lenBytes))
    out.write(payload)
    writeIntLE(out, maskedCrc32c(payload))
  }

  /** Read one record; None at clean EOF; verifies both CRCs. */
  def readRecord(in: DataInputStream): Option[Array[Byte]] = {
    val lenBytes = new Array[Byte](8)
    val first = in.read(lenBytes, 0, 1)
    if (first < 0) return None
    in.readFully(lenBytes, 1, 7)
    val lenCrc = readIntLE(in)
    require(lenCrc == maskedCrc32c(lenBytes), "TFRecord length CRC mismatch")
    var len = 0L
    var i = 7
    while (i >= 0) { len = (len << 8) | (lenBytes(i) & 0xffL); i -= 1 }
    val payload = new Array[Byte](len.toInt)
    in.readFully(payload)
    val dataCrc = readIntLE(in)
    require(dataCrc == maskedCrc32c(payload), "TFRecord data CRC mismatch")
    Some(payload)
  }

  private def readIntLE(in: DataInputStream): Int = {
    val a = in.read(); val b = in.read(); val c = in.read(); val d = in.read()
    if ((a | b | c | d) < 0) throw new EOFException
    a | (b << 8) | (c << 16) | (d << 24)
  }

  def gzipWriter(raw: OutputStream): OutputStream =
    new BufferedOutputStream(new GZIPOutputStream(raw), 1 << 16)

  def reader(raw: InputStream, gzipped: Boolean): DataInputStream = {
    val base = if (gzipped) new GZIPInputStream(raw) else raw
    new DataInputStream(new BufferedInputStream(base, 1 << 16))
  }

  def readAll(in: InputStream, gzipped: Boolean): Iterator[Array[Byte]] = {
    val din = reader(in, gzipped)
    Iterator.continually(readRecord(din)).takeWhile(_.isDefined).map(_.get)
  }
}
