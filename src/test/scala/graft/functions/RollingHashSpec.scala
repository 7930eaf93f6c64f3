package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class RollingHashSpec extends SparkSpec with Matchers {
  import scala.jdk.CollectionConverters._

  private def naive(text: String, window: Int): Long = {
    val bytes = text.getBytes("UTF-8")
    if (bytes.isEmpty) return 0L
    val w = math.min(window, bytes.length)
    val hashes = bytes.sliding(w).map { win =>
      win.foldLeft(0L)((h, b) => h * 257L + (b & 0xff))
    }.toSeq
    hashes.reduce((a, b) => if (java.lang.Long.compareUnsigned(a, b) < 0) a else b)
  }

  test("codegen path matches a naive sliding-window implementation") {
    import org.apache.spark.sql.{Row, types => T}
    val rnd = new scala.util.Random(17)
    val texts = Seq("", "a", "ab", "hello world, hello world", "ümlaut höhe") ++
      Seq.fill(20)(rnd.alphanumeric.take(5 + rnd.nextInt(200)).mkString)
    val df = spark.createDataFrame(
      texts.map(Row(_)).asJava,
      T.StructType(Seq(T.StructField("t", T.StringType, nullable = true))))
    for (w <- Seq(2, 8, 64)) {
      val got = df.select(col("t"), RollingHashFunctions.rollingMinHash(col("t"), w))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      texts.foreach { t => withClue(s"window=$w text=$t: ") { got(t) shouldBe naive(t, w) } }
    }
  }

  test("portable mode matches a naive mod-p window fold") {
    import org.apache.spark.sql.{Row, types => T}
    val p = 2147483647L
    def naiveP(text: String, window: Int): Long = {
      val bytes = text.getBytes("UTF-8")
      if (bytes.isEmpty) return 0L
      val w = math.min(window, bytes.length)
      bytes.sliding(w)
        .map(_.foldLeft(0L)((h, b) => (h * 257L + (b & 0xff)) % p)).min
    }
    val rnd = new scala.util.Random(29)
    val texts = Seq("", "a", "hello world") ++
      Seq.fill(15)(rnd.alphanumeric.take(5 + rnd.nextInt(120)).mkString)
    val df = spark.createDataFrame(
      texts.map(Row(_)).asJava,
      T.StructType(Seq(T.StructField("t", T.StringType, nullable = true))))
    for (w <- Seq(4, 16)) {
      val got = df.select(col("t"),
          RollingHashFunctions.rollingMinHashPortable(col("t"), w))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      texts.foreach { t => withClue(s"window=$w text=$t: ") { got(t) shouldBe naiveP(t, w) } }
    }
  }

  test("near-identical documents share the fingerprint; disjoint ones don't") {
    import org.apache.spark.sql.{Row, types => T}
    val base = ("common prefix content that dominates the document body " * 10)
    val df = spark.createDataFrame(
      Seq(Row(1L, base + "tail one"), Row(2L, base + "different tail"),
        Row(3L, "completely unrelated short text")).asJava,
      T.StructType(Seq(
        T.StructField("id", T.LongType, nullable = false),
        T.StructField("t", T.StringType, nullable = true))))
    val fp = df.select(col("id"), RollingHashFunctions.rollingMinHash(col("t"), 16).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fp(1L) shouldBe fp(2L) // min window lands in the shared body
    fp(1L) should not be fp(3L)
  }

  test("interpreted eval agrees with codegen (literal folding path)") {
    val viaLiteral = spark.range(1)
      .select(RollingHashFunctions.rollingMinHash(lit("abcdefgh"), 4))
      .collect().head.getLong(0)
    viaLiteral shouldBe naive("abcdefgh", 4)
  }
}
