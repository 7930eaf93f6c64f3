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

  /** Naive winnowing in portable mod-p arithmetic: all k-gram hashes
    * by direct fold, min per w-window by direct scan, distinct+sorted. */
  private def naiveWinnowPortable(text: String, k: Int, w: Int): Seq[Long] = {
    val p = 2147483647L
    val bytes = text.getBytes("UTF-8")
    if (bytes.isEmpty) return Seq.empty
    val kk = math.min(k, bytes.length)
    val hs = bytes.sliding(kk).map { g =>
      g.foldLeft(0L)((h, b) => (h * 257L + (b & 0xff)) % p)
    }.toArray
    val ww = math.min(w, hs.length)
    hs.sliding(ww).map(_.min).toArray.distinct.sorted.toSeq
  }

  test("winnowing matches the naive select-min-per-window oracle") {
    import org.apache.spark.sql.{Row, types => T}
    val rnd = new scala.util.Random(23)
    val texts = Seq("", "a", "abcdefgh", "aaaaaaaaaaaaaaaaaaaaaaaa") ++
      Seq.fill(20)(rnd.alphanumeric.take(5 + rnd.nextInt(300)).mkString)
    val df = spark.createDataFrame(
      texts.map(Row(_)).asJava,
      T.StructType(Seq(T.StructField("t", T.StringType, nullable = true))))
    for ((k, w) <- Seq((4, 4), (8, 16))) {
      val got = df.select(col("t"),
        RollingHashFunctions.winnowedFingerprintsPortable(col("t"), k, w)).collect()
      got.foreach { r =>
        withClue(s"k=$k w=$w text='${r.getString(0).take(20)}': ") {
          r.getSeq[Long](1).toSeq shouldBe naiveWinnowPortable(r.getString(0), k, w)
        }
      }
    }
  }

  test("winnowing guarantee: substring of length >= w+k-1 shared => fingerprint shared") {
    import org.apache.spark.sql.{Row, types => T}
    val rnd = new scala.util.Random(41)
    val k = 5; val w = 8
    val shared = rnd.alphanumeric.take(w + k - 1).mkString // minimal guaranteed length
    def noise(n: Int) = rnd.alphanumeric.take(n).mkString
    val docs = Seq(
      (1L, noise(40) + shared + noise(40)),
      (2L, noise(60) + shared + noise(10)),
      (3L, noise(120))) // no shared substring
    val df = spark.createDataFrame(
      docs.map { case (i, t) => Row(i, t) }.asJava,
      T.StructType(Seq(
        T.StructField("id", T.LongType, nullable = false),
        T.StructField("t", T.StringType, nullable = true))))
    val fps = df.select(col("id"),
      RollingHashFunctions.winnowedFingerprints(col("t"), k, w))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    (fps(1L) intersect fps(2L)) should not be empty
    // density: ~2/(w+1) of hashes selected, far fewer than all windows
    fps(3L).size should be < 120
  }

  test("graft_winnow SQL registration works and validates literals") {
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_winnow('abcdefghij', 4, 3) AS f")
      .collect().head.getSeq[Long](0).toSeq
    val viaCol = spark.range(1)
      .select(RollingHashFunctions.winnowedFingerprints(lit("abcdefghij"), 4, 3))
      .collect().head.getSeq[Long](0).toSeq
    viaSql shouldBe viaCol
    intercept[Exception](spark.sql("SELECT graft_winnow('x', 'a', 3)").collect())
  }
}
