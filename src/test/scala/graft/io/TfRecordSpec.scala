package graft.io

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TfRecordSpec extends AnyFunSuite {

  test("masked crc32c matches the published test vector") {
    // CRC-32C("123456789") = 0xE3069283; masking is a pure function of it.
    val crc = {
      val c = new java.util.zip.CRC32C
      c.update("123456789".getBytes)
      c.getValue
    }
    assert(crc == 0xE3069283L)
    // masked = ((crc >>> 15) | (crc << 17)) + 0xa282ead8 (mod 2^32)
    val expected = ((((crc >>> 15) | (crc << 17)) + 0xa282ead8L) & 0xffffffffL).toInt
    assert(TfRecord.maskedCrc32c("123456789".getBytes) == expected)
  }

  test("write/read round-trip, plain and with corruption detection") {
    val records = Seq("one".getBytes, Array[Byte](), ("x" * 10000).getBytes)
    val bos = new ByteArrayOutputStream()
    records.foreach(TfRecord.writeRecord(bos, _))
    val bytes = bos.toByteArray

    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val back = Iterator.continually(TfRecord.readRecord(in)).takeWhile(_.isDefined).map(_.get).toSeq
    assert(back.map(_.toSeq) == records.map(_.toSeq))

    // flip a payload byte → CRC failure
    val corrupted = bytes.clone(); corrupted(14) = (corrupted(14) ^ 1).toByte
    val cin = new DataInputStream(new ByteArrayInputStream(corrupted))
    intercept[IllegalArgumentException] { TfRecord.readRecord(cin) }
  }

  test("gzip round-trip") {
    val bos = new ByteArrayOutputStream()
    val out = TfRecord.gzipWriter(bos)
    (1 to 100).foreach(i => TfRecord.writeRecord(out, s"rec$i".getBytes))
    out.close()
    val back = TfRecord.readAll(new ByteArrayInputStream(bos.toByteArray), gzipped = true).toSeq
    assert(back.size == 100 && new String(back.head) == "rec1" && new String(back.last) == "rec100")
  }
}

class TfRecordSinkSpec extends SparkSpec {
  import spark.implicits._

  test("distributed sink writes shards readable back in full") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val payloads = spark.range(1000)
      .map(i => s"payload-$i".getBytes)(org.apache.spark.sql.Encoders.BINARY)
      .repartition(4)
    val n = TfRecordSink.write(payloads, dir, "train")
    assert(n == 1000)
    val back = TfRecordSink.readAll(spark, dir, "train").map(new String(_)).toSet
    assert(back == (0 until 1000).map(i => s"payload-$i").toSet)
  }

  test("distributed source reads shards back without driver materialization") {
    val dir = java.nio.file.Files.createTempDirectory("graft-src").toString
    val payloads = spark.range(5000)
      .map(i => s"rec-$i".getBytes)(org.apache.spark.sql.Encoders.BINARY)
      .repartition(8)
    TfRecordSink.write(payloads, dir, "all")
    val ds = TfRecordSource.read(spark, dir, "all")
    assert(ds.rdd.getNumPartitions > 1) // actually distributed
    val back = ds.map(new String(_))(org.apache.spark.sql.Encoders.STRING)
      .collect().toSet
    assert(back == (0 until 5000).map(i => s"rec-$i").toSet)
    // missing split dir → empty dataset, not an error
    assert(TfRecordSource.read(spark, dir, "nope").count() == 0)
  }

  test("rewrite into the same dir replaces stale shards from a wider run") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stale").toString
    val wide = spark.range(1000)
      .map(i => s"old-$i".getBytes)(org.apache.spark.sql.Encoders.BINARY)
      .repartition(16)
    TfRecordSink.write(wide, dir, "all")
    val narrow = spark.range(100)
      .map(i => s"new-$i".getBytes)(org.apache.spark.sql.Encoders.BINARY)
      .repartition(2)
    val n = TfRecordSink.write(narrow, dir, "all")
    assert(n == 100)
    val back = TfRecordSource.read(spark, dir, "all")
      .map(new String(_))(org.apache.spark.sql.Encoders.STRING).collect().toSet
    assert(back == (0 until 100).map(i => s"new-$i").toSet) // no old-* leftovers
  }
}
