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

  test("redactPii scrubs emails, IPs, phones; counts match; clean text untouched") {
    val df = docsDf(Seq(
      1L -> "mail bob.smith+x@corp.example.org now",
      2L -> "server 192.168.0.1 and 10.0.255.7 up",
      3L -> "call 415-555-0042 or 415.555.9999",
      4L -> "nothing sensitive here at all",
      5L -> "a@b.co 1.2.3.4 111-222-3333 all three"))
    val out = df.select(col("doc_id"),
        TextOps.redactPii(col("text")).as("c"),
        TextOps.piiCount(col("text"), TextOps.EmailPattern).as("ne"),
        TextOps.piiCount(col("text"), TextOps.Ipv4Pattern).as("ni"),
        TextOps.piiCount(col("text"), TextOps.PhonePattern).as("np"))
      .collect().map(r => r.getLong(0) -> r).toMap
    out(1L).getString(1) shouldBe "mail <EMAIL> now"
    out(2L).getString(1) shouldBe "server <IP> and <IP> up"
    out(3L).getString(1) shouldBe "call <PHONE> or <PHONE>"
    out(4L).getString(1) shouldBe "nothing sensitive here at all"
    out(5L).getString(1) shouldBe "<EMAIL> <IP> <PHONE> all three"
    (out(5L).getLong(2), out(5L).getLong(3), out(5L).getLong(4)) shouldBe ((1L, 1L, 1L))
    out(4L).getLong(2) + out(4L).getLong(3) + out(4L).getLong(4) shouldBe 0L
  }

  test("repetitionStats matches hand-computed fractions") {
    // "a a a b": top token 'a' 3/4; bigrams [a a, a a, a b] top 2/3;
    // trigrams [a a a, a a b] distinct -> dup frac 0.
    // "x y x y x y": top token 3/6; bigrams [x y, y x, x y, y x, x y]
    // top 3/5; trigrams [x y x, y x y, x y x, y x y] dup frac 2/4.
    val df = docsDf(Seq(1L -> "a a a b", 2L -> "x y x y x y", 3L -> "solo"))
    val out = TextOps.repetitionStats(df, "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    out(1L).getAs[Double]("top_token_frac") shouldBe 0.75 +- 1e-12
    out(1L).getAs[Double]("top_bigram_frac") shouldBe (2.0 / 3) +- 1e-12
    out(1L).getAs[Double]("dup_trigram_frac") shouldBe 0.0 +- 1e-12
    out(2L).getAs[Double]("top_token_frac") shouldBe 0.5 +- 1e-12
    out(2L).getAs[Double]("top_bigram_frac") shouldBe 0.6 +- 1e-12
    out(2L).getAs[Double]("dup_trigram_frac") shouldBe 0.5 +- 1e-12
    out(3L).getAs[Long]("n_tokens") shouldBe 1L
    out(3L).getAs[Double]("top_token_frac") shouldBe 1.0 +- 1e-12
    out(3L).getAs[Double]("top_bigram_frac") shouldBe 0.0 +- 1e-12
    out(3L).getAs[Double]("dup_trigram_frac") shouldBe 0.0 +- 1e-12
  }

  test("chunk: stride==chunk partitions exactly; overlap windows share tokens") {
    val df = docsDf(Seq(1L -> (1 to 10).map(i => s"w$i").mkString(" ")))
    // Non-overlapping: 4+4+2.
    val exact = TextOps.chunk(df, "doc_id", "text", chunkTokens = 4, stride = 4)
      .orderBy("chunk_idx").collect()
    exact.map(_.getAs[String]("chunk_text")) shouldBe Array(
      "w1 w2 w3 w4", "w5 w6 w7 w8", "w9 w10")
    exact.map(_.getAs[Long]("n_chunk_tokens")) shouldBe Array(4L, 4L, 2L)
    // Reassembling non-overlapping chunks recovers the document.
    exact.map(_.getAs[String]("chunk_text")).mkString(" ") shouldBe
      (1 to 10).map(i => s"w$i").mkString(" ")
    // Overlapping: stride 2, width 4 -> starts 0,2,4,6,8.
    val ov = TextOps.chunk(df, "doc_id", "text", chunkTokens = 4, stride = 2)
      .orderBy("chunk_idx").collect()
    ov.length shouldBe 5
    ov(1).getAs[String]("chunk_text") shouldBe "w3 w4 w5 w6"
    ov(4).getAs[String]("chunk_text") shouldBe "w9 w10"
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

  test("ShannonEntropy: hand-computed values, both tails, empty and null") {
    import graft.functions.EntropyFunctions
    val df = docsDf(Seq(
      1L -> "aaaa",          // degenerate: H = 0
      2L -> "ab",            // uniform 2 classes: H = ln 2
      3L -> "aab",           // 2/3, 1/3
      4L -> ""))             // empty: 0 by contract
      .select(col("doc_id"), EntropyFunctions.charEntropy(col("text")).as("h"))
    val out = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out(1L) shouldBe 0.0
    out(2L) shouldBe math.log(2) +- 1e-8
    def t(p: Double) = BigDecimal(-(p * math.log(p)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    out(3L) shouldBe (t(2.0 / 3) + t(1.0 / 3)) +- 1e-12
    out(4L) shouldBe 0.0
    // null text → null entropy (nullSafeEval)
    val withNull = docsDf(Seq(5L -> null.asInstanceOf[String]))
      .select(EntropyFunctions.charEntropy(col("text")).as("h"))
    assert(withNull.head().isNullAt(0))
  }

  test("ShannonEntropy: token mode keys on whole tokens, repetition collapses") {
    import graft.functions.EntropyFunctions
    val df = docsDf(Seq(
      1L -> "spam spam spam spam",          // one type: 0
      2L -> "the cat sat on the mat",       // the×2 + 4 singletons
      3L -> "a b c d e f"))                 // uniform 6: ln 6
      .select(col("doc_id"), EntropyFunctions.tokenEntropy(col("text")).as("h"))
    val out = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out(1L) shouldBe 0.0
    out(3L) shouldBe math.log(6) +- 1e-8
    // natural text sits strictly between the tails
    out(2L) should (be > out(1L) and be < out(3L))
    // repetitive text scores BELOW diverse text of the same length —
    // the filterable signal
    out(1L) should be < out(2L)
  }

  test("ShannonEntropy: supplementary-plane codepoints count once") {
    import graft.functions.EntropyFunctions
    val smile = new String(Character.toChars(0x1F600))
    val df = docsDf(Seq(1L -> (smile + smile + smile)))
      .select(EntropyFunctions.charEntropy(col("text")).as("h"))
    df.head().getDouble(0) shouldBe 0.0 // one symbol class, not surrogates
  }
}
