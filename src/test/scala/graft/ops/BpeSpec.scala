package graft.ops

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class BpeSpec extends SparkSpec with Matchers {
  import org.apache.spark.sql.{Row, types => T}
  import scala.jdk.CollectionConverters._

  private def docsDf(docs: Seq[(Long, String)]) =
    spark.createDataFrame(
      docs.map { case (i, t) => Row(i, t) }.asJava,
      T.StructType(Seq(
        T.StructField("doc_id", T.LongType, nullable = false),
        T.StructField("text", T.StringType, nullable = true))))

  /** Independent naive reference: list-based, rule-by-rule. */
  private def naiveSegment(word: String, rules: Seq[(String, String)]): List[String] = {
    def applyOne(syms: List[String], a: String, b: String): List[String] = syms match {
      case x :: y :: rest if x == a && y == b => (a + b) :: applyOne(rest, a, b)
      case x :: rest => x :: applyOne(rest, a, b)
      case Nil => Nil
    }
    rules.foldLeft(word.map(_.toString).toList) {
      case (s, (a, b)) => applyOne(s, a, b)
    }
  }

  test("train learns the classic merge sequence with deterministic ties") {
    // corpus "aaab aaab ab": round 1 counts (a,a)=4 (a,b)=3 → merge aa;
    // round 2 (aa,a)=2 (a,b)=3 → merge ab; round 3 (aa,ab)=2 → merge aaab
    val df = docsDf(Seq(1L -> "aaab aaab ab"))
    Bpe.train(df, "text", 3) shouldBe Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    // tie on count → lexicographically smaller pair wins
    Bpe.train(docsDf(Seq(1L -> "ab ba")), "text", 1) shouldBe Seq(("a", "b"))
    // more merges than mergeable pairs → stops at exhaustion
    Bpe.train(docsDf(Seq(1L -> "ab")), "text", 5).length should be <= 5
  }

  /** The pre-batching reference: exactly one merge (one argmax job)
    * per round — the classic Sennrich loop the batched train must
    * reproduce bit-for-bit. */
  private def naiveTrain(df: org.apache.spark.sql.DataFrame, nMerges: Int): Seq[(String, String)] = {
    import org.apache.spark.sql.functions._
    var rules = Vector.empty[(String, String)]
    var exhausted = false
    while (rules.length < nMerges && !exhausted) {
      val top = Bpe.pairCounts(df, "text", rules)
        .orderBy(col("cnt").desc, col("pair").asc).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val parts = top.head.getString(0).split(' ')
        rules = rules :+ ((parts(0), parts(1)))
      }
    }
    rules
  }

  test("batched train equals the one-merge-per-job classic loop on random corpora") {
    for (seed <- Seq(5, 17, 101)) {
      val rnd = new scala.util.Random(seed)
      // small alphabet → dense pair interactions, the regime where a
      // wrong batch bound would reorder merges
      val words = Seq.fill(40)(
        (0 until 1 + rnd.nextInt(6)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
      val docs = words.grouped(8).zipWithIndex
        .map { case (ws, i) => (i + 1).toLong -> ws.mkString(" ") }.toSeq
      val df = docsDf(docs)
      withClue(s"seed $seed: ") {
        Bpe.train(df, "text", 8) shouldBe naiveTrain(df, 8)
      }
    }
  }

  test("dict-loop train stays exact on corpora with large pair vocabularies") {
    // >64 distinct adjacent pairs: dense multi-symbol interactions,
    // many same-count ties — the regime where an ordering or
    // incremental-count bug in the driver loop would reorder merges.
    for (seed <- Seq(7, 31)) {
      val rnd = new scala.util.Random(seed)
      val words = Seq.fill(300)(
        (0 until 4 + rnd.nextInt(5)).map(_ => ('a' + rnd.nextInt(12)).toChar).mkString)
      val docs = words.grouped(25).zipWithIndex
        .map { case (ws, i) => (i + 1).toLong -> ws.mkString(" ") }.toSeq
      val df = docsDf(docs)
      val distinctPairs = Bpe.pairCounts(df, "text").count()
      withClue(s"seed $seed (distinct pairs $distinctPairs): ") {
        distinctPairs should be > 64L // genuinely large pair table
        Bpe.train(df, "text", 6) shouldBe naiveTrain(df, 6)
      }
    }
  }

  test("train fails fast when the vocabulary exceeds maxVocab instead of silently truncating") {
    val df = docsDf(Seq(1L -> "alpha beta gamma delta epsilon"))
    val e = intercept[IllegalArgumentException] {
      Bpe.train(df, "text", 2, maxVocab = 3)
    }
    e.getMessage should include("distinct words")
    // at the cap exactly, training proceeds and stays classic-exact
    Bpe.train(df, "text", 2, maxVocab = 5) shouldBe naiveTrain(df, 2)
    // Int.MaxValue is a legal (if unwise) cap under the staged-count
    // guard — no limit() arithmetic left to overflow
    Bpe.train(df, "text", 2, maxVocab = Int.MaxValue) shouldBe naiveTrain(df, 2)
  }

  test("train's staged-count guard fires before any driver collect, with the exact count in the message") {
    // 2000 distinct words vs cap 100: the guard is a distributed
    // count over the staged dict frame — the driver never sees a row
    val big = docsDf((0 until 100).map(i =>
      i.toLong -> (0 until 20).map(j => s"w${i}x$j").mkString(" ")))
    val e = intercept[IllegalArgumentException] {
      Bpe.train(big, "text", 2, maxVocab = 100)
    }
    e.getMessage should include("2000 distinct words (cap 100)")
    // one-over-the-cap fails exactly; at-the-cap trains
    val marginal = docsDf(Seq(
      1L -> (0 until 101).map(j => s"m$j").mkString(" ")))
    intercept[IllegalArgumentException] {
      Bpe.train(marginal, "text", 2, maxVocab = 100)
    }.getMessage should include("101 distinct words (cap 100)")
    Bpe.train(marginal, "text", 2, maxVocab = 101).size shouldBe 2
  }

  test("disjoint top pairs batch into one round: job count independent of merge count") {
    // the dictionary reduction makes training ONE job for any merge
    // count; this corpus keeps the classic sequence trivially ordered
    val text = (Seq.fill(8)("ab") ++ Seq.fill(6)("cd") ++
      Seq.fill(4)("ef") ++ Seq.fill(2)("gh")).mkString(" ")
    val df = docsDf(Seq(1L -> text))
    def jobsDuring(group: String)(body: => Unit): Int = {
      spark.sparkContext.setJobGroup(group, group)
      try body finally spark.sparkContext.clearJobGroup()
      // status store fills asynchronously — poll until stable
      var last = -1
      var cur = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
      var spins = 0
      while (cur != last && spins < 50) {
        last = cur; Thread.sleep(100)
        cur = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
        spins += 1
      }
      cur
    }
    var r2: Seq[(String, String)] = Nil
    var r4: Seq[(String, String)] = Nil
    val j2 = jobsDuring("bpe-train-2") { r2 = Bpe.train(df, "text", 2) }
    val j4 = jobsDuring("bpe-train-4") { r4 = Bpe.train(df, "text", 4) }
    r4 shouldBe Seq(("a", "b"), ("c", "d"), ("e", "f"), ("g", "h"))
    r2 shouldBe r4.take(2)
    // ONE dictionary job regardless of merge count — doubling the
    // merge count must not add a single Spark job
    j4 shouldBe j2
  }

  test("tokenize matches the naive reference and reassembles every word") {
    val rnd = new scala.util.Random(89)
    val words = Seq("lower", "newest", "lowest", "wider", "low", "a") ++
      Seq.fill(20)(rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString.toLowerCase)
    val docs = words.grouped(5).zipWithIndex
      .map { case (ws, i) => (i + 1).toLong -> ws.mkString(" ") }.toSeq
    val df = docsDf(docs)
    val rules = Bpe.train(df, "text", 10)
    rules.length shouldBe 10
    val toks = Bpe.tokenize(df, "doc_id", "text", rules)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    // per doc: tokens in position order == naive segmentation of each word
    docs.foreach { case (id, text) =>
      val expected = text.split(' ').filter(_.nonEmpty)
        .flatMap(w => naiveSegment(w, rules)).toSeq
      val got = toks.filter(_._1 == id).sortBy(_._2).map(_._3).toSeq
      withClue(s"doc $id: ") { got shouldBe expected }
    }
    // segmentation is lossless: concatenated tokens == the words
    docs.foreach { case (id, text) =>
      toks.filter(_._1 == id).sortBy(_._2).map(_._3).mkString("") shouldBe
        text.replace(" ", "")
    }
  }

  test("segmentation is codepoint-based: supplementary-plane chars survive intact") {
    val emoji = new String(Character.toChars(0x1F600)) // outside the BMP
    val df = docsDf(Seq(1L -> s"${emoji}ab ${emoji}ab"))
    val rules = Bpe.train(df, "text", 1)
    // the pair (emoji, a) and (a, b) both have count 2; "\uD83D..." vs "a":
    // the emoji-led pair string sorts after "a b", so (a, b) merges first
    rules shouldBe Seq(("a", "b"))
    val toks = Bpe.tokenize(df, "doc_id", "text", rules)
      .collect().sortBy(_.getInt(1)).map(_.getString(2))
    toks.toSeq shouldBe Seq(emoji, "ab", emoji, "ab")
    toks.mkString("") shouldBe s"${emoji}ab${emoji}ab"
  }

  test("pairCounts under rules equals counting over naive-segmented words") {
    val df = docsDf(Seq(1L -> "banana bandana", 2L -> "an an banana"))
    val rules = Seq(("a", "n"))
    val got = Bpe.pairCounts(df, "text", rules)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val words = Seq("banana", "bandana", "an", "an", "banana")
    val expected = words.flatMap { w =>
      val s = naiveSegment(w, rules)
      s.zip(s.tail).map { case (a, b) => s"$a $b" }
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    got shouldBe expected
  }

  test("saveRules/loadRules round-trips the merge table in rank order") {
    val df = docsDf(Seq(1L -> "aaab aaab ab ba caab"))
    val rules = Bpe.train(df, "text", 4)
    val dir = java.nio.file.Files
      .createTempDirectory("bpe-rules").toString
    Bpe.saveRules(rules, dir, spark)
    val loaded = Bpe.loadRules(spark, dir)
    loaded shouldBe rules // order is the model — must survive exactly
    val a = Bpe.tokenize(df, "doc_id", "text", rules).collect().toSeq
    val b = Bpe.tokenize(df, "doc_id", "text", loaded).collect().toSeq
    b should contain theSameElementsAs a
  }
}
