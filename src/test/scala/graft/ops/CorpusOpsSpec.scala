package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class CorpusOpsSpec extends SparkSpec with Matchers {
  import scala.jdk.CollectionConverters._

  private def docsDf(docs: Seq[(Long, String)]) = {
    import org.apache.spark.sql.{Row, types => T}
    spark.createDataFrame(
      docs.map { case (i, t) => Row(i, t) }.asJava,
      T.StructType(Seq(
        T.StructField("doc_id", T.LongType, nullable = false),
        T.StructField("text", T.StringType, nullable = true))))
  }

  test("stripBoilerplate drops corpus-frequent lines, keeps order, drops empty docs") {
    val boiler = "subscribe to our newsletter"
    val docs = (1L to 5L).map(i =>
      i -> s"unique line $i a\n$boiler\nunique line $i b") :+
      (6L -> boiler) // all-boilerplate doc vanishes
    val out = CorpusOps.stripBoilerplate(docsDf(docs), "doc_id", "text", maxDf = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_lines_kept"), r.getAs[String]("clean_text"))).toMap
    out.keySet shouldBe (1L to 5L).toSet
    (1L to 5L).foreach { i =>
      out(i) shouldBe ((2L, s"unique line $i a\nunique line $i b"))
    }
  }

  test("stripBoilerplate: df counts distinct docs, not occurrences") {
    // One doc repeats a line 5 times; corpus df for it is still 1,
    // so a maxDf=3 strip must keep all copies.
    val docs = Seq(1L -> Seq.fill(5)("echo echo").mkString("\n"), 2L -> "other")
    val out = CorpusOps.stripBoilerplate(docsDf(docs), "doc_id", "text", maxDf = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_lines_kept")).toMap
    out(1L) shouldBe 5L
    out(2L) shouldBe 1L
  }

  test("duplicateSpans flags shared windows, skips sub-window docs") {
    // 40-char docs: 1 window each. Docs 1 and 2 identical -> their
    // window duplicates; doc 3 unique; doc 4 too short for any window.
    val fortyA = "a" * 40
    val docs = Seq(
      1L -> fortyA, 2L -> fortyA,
      3L -> ("b" * 40), 4L -> "short")
    val out = CorpusOps.duplicateSpans(docsDf(docs), "doc_id", "text",
        windowChars = 40, stride = 20)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_windows"), r.getAs[Long]("n_dup_windows"))).toMap
    out.keySet shouldBe Set(1L, 2L, 3L)
    out(1L) shouldBe ((1L, 1L))
    out(2L) shouldBe ((1L, 1L))
    out(3L) shouldBe ((1L, 0L))
  }

  test("duplicateSpans: window count follows stride; within-doc repeats are not cross-doc dups") {
    // len 80, window 40, stride 20 -> starts 0,20,40 -> 3 windows; all
    // windows are "a"*40 but only this doc contains them (df=1).
    val out = CorpusOps.duplicateSpans(
      docsDf(Seq(1L -> ("a" * 80), 2L -> ("c" * 40))), "doc_id", "text",
      windowChars = 40, stride = 20).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_windows"), r.getAs[Long]("n_dup_windows"))).toMap
    out(1L) shouldBe ((3L, 0L))
    out(2L) shouldBe ((1L, 0L))
  }

  test("duplicateSpansRobust catches misaligned cross-doc duplicates the strided audit misses") {
    // 85-char non-periodic span shared by both docs, offset by 7 chars
    // in doc 2 — NOT a multiple of stride 20, so every strided window
    // of doc 1 sits at a different phase of the span than every window
    // of doc 2 and the strided audit sees zero duplication. The
    // winnowed stride-1 form has the alignment-free guarantee
    // (span 85 >= windowChars + winnowW - 1 = 55) and must flag both.
    val span = "the quick brown fox jumps over the lazy dog while seven wizards brew strong black tea"
    val docs = Seq(1L -> span, 2L -> ("z" * 7 + span))
    val strided = CorpusOps.duplicateSpans(docsDf(docs), "doc_id", "text",
        windowChars = 40, stride = 20)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_dup_windows")).toMap
    strided.values.sum shouldBe 0L // the blind spot, pinned
    for (portable <- Seq(false, true)) {
      val robust = CorpusOps.duplicateSpansRobust(docsDf(docs), "doc_id", "text",
          windowChars = 40, winnowW = 16, portable = portable)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_fingerprints"), r.getAs[Long]("n_dup_fingerprints"))).toMap
      withClue(s"portable=$portable: ") {
        robust(1L)._2 should be >= 1L
        robust(2L)._2 should be >= 1L
        // sanity: dup fingerprints never exceed total fingerprints
        robust.values.foreach { case (n, d) => d should be <= n }
      }
    }
  }

  test("duplicateSpansRobust: empty docs emit no row; disjoint docs share nothing") {
    val out = CorpusOps.duplicateSpansRobust(
      docsDf(Seq(1L -> ("a" * 60 + "b" * 30), 2L -> ("c" * 90), 3L -> "")),
      "doc_id", "text", windowChars = 40, winnowW = 16)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_dup_fingerprints")).toMap
    out.keySet shouldBe Set(1L, 2L)
    out.values.foreach(_ shouldBe 0L)
  }

  test("tfidfTopTerms: corpus-common terms rank below doc-specific ones") {
    val docs = Seq(
      1L -> "shared shared apple apple apple",
      2L -> "shared banana",
      3L -> "shared cherry cherry")
    val out = CorpusOps.tfidfTopTerms(docsDf(docs), "doc_id", "text", k = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank")) ->
        (r.getAs[String]("term"), r.getAs[Long]("tf"), r.getAs[Long]("term_df"),
          r.getAs[Double]("tfidf"))).toMap
    // 'shared' df=3 (idf = ln(4/4)+1 = 1); doc-unique terms df=1 (idf = ln(2)+1)
    out((1L, 1L))._1 shouldBe "apple"
    out((1L, 1L))._4 shouldBe 3.0 * (math.log(4.0 / 2.0) + 1.0) +- 1e-12
    out((1L, 2L)) shouldBe (("shared", 2L, 3L, 2.0))
    out((2L, 1L))._1 shouldBe "banana"
    out((3L, 1L))._1 shouldBe "cherry"
    // every doc gets at most k rows, ranks dense from 1
    out.keys.groupBy(_._1).values.foreach { ks =>
      ks.map(_._2).toSeq.sorted shouldBe (1L to ks.size)
    }
  }

  test("removeDuplicateSpans cuts exactly the covered characters, pass-through otherwise") {
    import spark.implicits._
    // W=4, stride=2. Docs 1 and 2 share "ABCD" at different offsets;
    // doc 3 shares nothing.
    val docs = Seq(
      (1L, "ABCDxxxx"),   // windows: ABCD@0, CDxx@2, xxxx@4
      (2L, "zzABCDyy"),   // windows: zzAB@0, ABCD@2, CDyy@4
      (3L, "qqqqqqqq")    // windows: qqqq@0, qqqq@2, qqqq@4 (within-doc only)
    ).toDF("id", "text")
    val out = CorpusOps.removeDuplicateSpans(docs, "id", "text",
      windowChars = 4, stride = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    out(1L) shouldBe ("xxxx", 4L)   // chars 0-3 cut
    out(2L) shouldBe ("zzyy", 4L)   // chars 2-5 cut
    out(3L) shouldBe ("qqqqqqqq", 0L) // within-doc repeats are not cross-doc dups
  }

  test("removeDuplicateSpans: sub-window docs and overlapping cut windows") {
    import spark.implicits._
    val docs = Seq(
      (1L, "ab"),           // shorter than one window — untouched
      (2L, "ABCDEFxx"),     // ABCD@0 and CDEF@2 both duplicated → cut 0..5
      (3L, "yyABCDEFzz")    // ABCD@2, CDEF@4 duplicated
    ).toDF("id", "text")
    val out = CorpusOps.removeDuplicateSpans(docs, "id", "text", 4, 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    out(1L) shouldBe ("ab", 0L)
    out(2L)._1 shouldBe "xx"        // overlapping windows merge into one cut
    out(3L)._1 should (startWith("yy") and endWith("zz"))
    out(3L)._2 shouldBe 6L
  }

  test("crossSourceOverlap counts distinct shared shingles per source pair") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", "w x y z"),        // shingles: "w x y", "x y z"
      (2L, "a", "w x y q"),        // adds "w x y" (dup within source), "x y q"
      (3L, "b", "w x y z"),        // shares both of doc 1's shingles
      (4L, "c", "p q r s")         // shares nothing
    ).toDF("id", "src", "text")
    val out = CorpusOps.crossSourceOverlap(docs, "src", "text", shingleN = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    out(("a", "b")) shouldBe 2L      // "w x y" counted once despite 2 docs in a
    out.get(("a", "c")) shouldBe None
    out.get(("b", "c")) shouldBe None
    out.keySet shouldBe Set(("a", "b"))
  }

  test("dsirLogWeights: target-like documents outscore off-target ones") {
    import spark.implicits._
    // Target distribution = "alpha beta" language; raw corpus adds a
    // disjoint "gamma delta" language. A held-out doc written in the
    // target language must carry a higher importance weight.
    val docs = (
      (1 to 10).map(i => (i.toLong, "alpha beta alpha beta", true)) ++
      (11 to 20).map(i => (i.toLong, "gamma delta gamma delta", false)) ++
      Seq((21L, "alpha beta", false), (22L, "gamma delta", false))
    ).toDF("id", "text", "is_target")
    val w = CorpusOps.dsirLogWeights(docs, "id", "text", col("is_target"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    w(21L) should be > w(22L)        // target-language held-out doc wins
    w(1L) should be > w(11L)         // and in-corpus docs order the same way
    // n_tokens is the full token count.
    val n = CorpusOps.dsirLogWeights(docs, "id", "text", col("is_target"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    n(21L) shouldBe 2L
    n(1L) shouldBe 4L
  }

  test("dsirLogWeights is partitioning-invariant (decimal log-ratio sums)") {
    import spark.implicits._
    val docs = (1L to 40L).map(i =>
      (i, if (i % 3 == 0) "x y z w v" else "a b c d e a b", i % 2 == 0))
      .toDF("id", "text", "t")
    val a = CorpusOps.dsirLogWeights(docs, "id", "text", col("t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val b = CorpusOps.dsirLogWeights(docs.repartition(13), "id", "text", col("t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    a shouldBe b
  }

  test("vocabTopK: frequency order with lexicographic tie-break") {
    val docs = Seq(
      1L -> "a b a b a b", // "a b" x3, "b a" x2
      2L -> "c d c d")     // "c d" x2, "d c" x1
    val out = CorpusOps.vocabTopK(docsDf(docs), "text", n = 2, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    out shouldBe Array(("a b", 3L), ("b a", 2L), ("c d", 2L))
  }

  test("oovRate: hand-computed rates; token-less doc keeps its row with NULL rate; composes with vocabTopK") {
    val vocabDocs = docsDf(Seq(10L -> "the cat sat", 11L -> "the dog sat"))
    val vocab = CorpusOps.vocabTopK(vocabDocs, "text", n = 1, k = 10)
    val scored = docsDf(Seq(
      1L -> "the cat ran",  // ran is OOV -> 1/3
      2L -> "zebra quokka", // all OOV -> 2/2
      3L -> "THE   DOG",    // normalization: lowercase + collapse -> 0/2
      4L -> "   "))         // token-less -> n_tokens 0, NULL rate
    val out = CorpusOps.oovRate(scored, "doc_id", "text", vocab, "ngram")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    out(1L) shouldBe ((3L, 1L, Some(1.0 / 3)))
    out(2L) shouldBe ((2L, 2L, Some(1.0)))
    out(3L) shouldBe ((2L, 0L, Some(0.0)))
    out(4L) shouldBe ((0L, 0L, None))
  }

  test("oovSummary: one row matching oovRate's totals; zero-token frame reports 0/0 with NULL rate") {
    val vocab = CorpusOps.vocabTopK(
      docsDf(Seq(10L -> "the cat sat")), "text", n = 1, k = 10)
    val docs = docsDf(Seq(1L -> "the cat ran", 2L -> "zebra", 3L -> "   "))
    val r = CorpusOps.oovSummary(docs, "text", vocab, "ngram").head()
    r.getLong(0) shouldBe 3L  // n_docs (incl. the token-less one)
    r.getLong(1) shouldBe 4L  // the cat ran zebra
    r.getLong(2) shouldBe 2L  // ran, zebra
    r.getDouble(3) shouldBe 0.5 +- 1e-12
    val empty = CorpusOps.oovSummary(
      docsDf(Seq(9L -> "   ")), "text", vocab, "ngram").head()
    empty.getLong(0) shouldBe 1L
    empty.getLong(1) shouldBe 0L
    empty.getLong(2) shouldBe 0L
    empty.isNullAt(3) shouldBe true
  }

  test("oovStream: per-batch summary equals oovSummary on the same batch rows") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val vocab = CorpusOps.vocabTopK(
      docsDf(Seq(10L -> "the cat sat on the mat")), "text", n = 1, k = 10)
    val batches = Seq(
      Seq((1L, "the cat ran"), (2L, "on the mat")),
      Seq((3L, "quokka zebra wombat")))
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, org.apache.spark.sql.Row)]
    val stream = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps.oovStream(
      stream.toDF().toDF("doc_id", "text"), "text", vocab, "ngram") { (row, id) =>
      got.synchronized { got += ((id, row.head())) }
    }.start()
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      got.size shouldBe 2
      got.sortBy(_._1).map(_._2).zip(batches).foreach { case (streamed, rows) =>
        streamed shouldBe CorpusOps.oovSummary(
          rows.toDF("doc_id", "text"), "text", vocab, "ngram").head()
      }
    } finally q.stop()
  }

  // ---- per-source KL divergence ----

  private def srcDf(rows: Seq[(String, String)]) = {
    import org.apache.spark.sql.{Row, types => T}
    spark.createDataFrame(
      rows.map { case (s, t) => Row(s, t) }.asJava,
      T.StructType(Seq(
        T.StructField("source", T.StringType, nullable = false),
        T.StructField("text", T.StringType, nullable = true))))
  }

  test("sourceDivergence: zero iff the source matches the corpus distribution") {
    // Two sources with IDENTICAL token distributions: pooled corpus ==
    // each source ⇒ KL = 0 for both (Gibbs equality case).
    val out = CorpusOps.sourceDivergence(
      srcDf(Seq("a" -> "x x y", "b" -> "x x y")), "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    out("a") shouldBe 0.0 +- 1e-9
    out("b") shouldBe 0.0 +- 1e-9
  }

  test("sourceDivergence matches a hand-computed mix and is non-negative") {
    // source a: 3×x 1×y (n_s=4); source b: 1×x 3×z (n_s=4).
    // corpus: x=4, y=1, z=3, n=8.
    val out = CorpusOps.sourceDivergence(
      srcDf(Seq("a" -> "x x x y", "b" -> "x z z z")), "source", "text")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    def t(ps: Double, p: Double) = BigDecimal(ps * math.log(ps / p))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val klA = (t(0.75, 0.5) + t(0.25, 1.0 / 8)).toDouble
    val klB = (t(0.25, 0.5) + t(0.75, 3.0 / 8)).toDouble
    out("a") shouldBe ((4L, 2L, klA))
    out("b") shouldBe ((4L, 2L, klB))
    // Gibbs: both strictly positive (distinct distributions)
    out("a")._3 should be > 0.0
    out("b")._3 should be > 0.0
  }

  test("sourceDivergence: the shifted source scores higher than in-mix sources") {
    val inMix = (1 to 8).map(i => s"w${i % 4}").mkString(" ")
    val out = CorpusOps.sourceDivergence(
      srcDf(Seq("a" -> inMix, "b" -> inMix,
        "drift" -> "qq rr ss tt qq rr ss tt")), "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    out("drift") should be > out("a")
    out("drift") should be > out("b")
  }
}
