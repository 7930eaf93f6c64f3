package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class TextOpsSpec extends SparkSpec with Matchers {
  import scala.jdk.CollectionConverters._

  private def docsDf(docs: Seq[(Long, String)]) = {
    import org.apache.spark.sql.{Row, types => T}
    spark.createDataFrame(
      docs.map { case (i, t) => Row(i, t) }.asJava,
      T.StructType(Seq(
        T.StructField("doc_id", T.LongType, nullable = false),
        T.StructField("text", T.StringType, nullable = true))))
  }

  test("cleaned strips URLs and control chars, collapses whitespace") {
    import org.apache.spark.sql.functions._
    val dirty = Seq(
      1L -> "see https://example.com/x?q=1 for  details",
      2L -> "tabs\tand\u0000\u0007bells   here",
      3L -> "  already clean  ",
      4L -> "http://a.b c https://d.e/f#g d")
    val got = docsDf(dirty)
      .select(col("doc_id"), TextOps.cleaned(col("text")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got(1L) shouldBe "see for details"
    got(2L) shouldBe "tabs andbells here" // BEL removed joins the words
    got(3L) shouldBe "already clean"
    got(4L) shouldBe "c d"
  }

  test("shingles: n-grams in order, short docs yield empty array") {
    val df = docsDf(Seq(1L -> "a b c d", 2L -> "a b", 3L -> "a"))
      .select(col("doc_id"), TextOps.tokens(TextOps.normalized(col("text"))).as("ws"))
      .select(col("doc_id"), TextOps.shingles(col("ws"), 3).as("sh"))
    val out = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    out(1L) shouldBe Seq("a b c", "b c d")
    out(2L) shouldBe Seq.empty
    out(3L) shouldBe Seq.empty
  }

  test("textStats matches hand-computed values") {
    val df = docsDf(Seq(1L -> "the cat sat on the mat"))
    val r = TextOps.textStats(df, "text", Seq("the", "a")).collect().head
    r.getAs[Long]("n_chars_txt") shouldBe 22L
    r.getAs[Long]("n_tokens") shouldBe 6L
    r.getAs[Long]("n_types") shouldBe 5L // "the" twice
    r.getAs[Long]("n_stopwords") shouldBe 2L
    r.getAs[Double]("type_token_ratio") shouldBe (5.0 / 6.0) +- 1e-12
    r.getAs[Double]("stopword_ratio") shouldBe (2.0 / 6.0) +- 1e-12
    r.getAs[Double]("mean_token_len") shouldBe ((22.0 - 5.0) / 6.0) +- 1e-12
  }

  test("langId picks the language with most marker hits; und when none") {
    val markers = Seq(
      "en" -> Seq("the", "and"), "de" -> Seq("der", "und"))
    val df = docsDf(Seq(
      1L -> "the dog and the cat", 2L -> "der hund und die katze",
      3L -> "xyzzy plugh"))
      .select(col("doc_id"), TextOps.langId(col("text"), markers).as("lang"))
    val out = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out shouldBe Map(1L -> "en", 2L -> "de", 3L -> "und")
  }

  test("fingerprint: identical normalized content gives identical fingerprint") {
    val df = docsDf(Seq(
      1L -> "The Quick   Brown Fox Jumps", 2L -> "the quick brown fox jumps",
      3L -> "a completely different document here"))
      .select(col("doc_id"), TextOps.tokens(TextOps.normalized(col("text"))).as("ws"))
      .select(col("doc_id"), TextOps.fingerprint(col("ws"), 4).as("fp"))
    val out = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out(1L) shouldBe out(2L)
    out(1L) should not be out(3L)
  }
}
