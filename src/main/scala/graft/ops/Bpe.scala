package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BpeFunctions

/** Byte-pair-encoding vocabulary training over the corpus — the real
  * form of the "BPE-ish" token-count proxy: learn the merge table from
  * the data, then tokenize with it.
  *
  * Training runs in ONE Spark job regardless of merge count: because
  * BPE statistics never cross word boundaries, the corpus reduces
  * exactly to its word-frequency dictionary (one hash-agg with
  * map-side combine, bounded by the vocabulary), and the classic
  * Sennrich merge loop runs driver-side over that dict with
  * incremental pair-count maintenance — the HF-tokenizers /
  * SentencePiece shape. Tokenization with the frozen rules is a
  * codegen'd per-row projection ([[graft.functions.BpeSegment]]) over
  * the full corpus. [[pairCounts]] keeps the fully distributed
  * statistic for verification (the dict loop must and does reproduce
  * it).
  *
  * Determinism: ties break on the pair string ascending in UTF-8 byte
  * order, so the merge table is a pure function of the corpus.
  */
object Bpe {

  /** Adjacent character-pair counts after segmenting under `rules`
    * (rules = Nil gives the raw character statistic of round 1). */
  def pairCounts(
      df: DataFrame, textCol: String,
      rules: Seq[(String, String)] = Nil): DataFrame =
    OpsUtil.widen(df)
      .select(explode(
        BpeFunctions.bpePairs(TextOps.normalized(col(textCol)), rules))
        .as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))

  /** Train `nMerges` merge rules. Returns them in rank order —
    * bit-identical to a one-merge-per-job classic loop, in ONE Spark
    * job for ANY merge count.
    *
    * The key fact: BPE statistics never cross word boundaries, so the
    * corpus reduces EXACTLY to its word-frequency dictionary — a word
    * appearing c times contributes c × (its adjacent pairs) to every
    * round's counts. One hash-agg job collects (distinct word, count),
    * bounded by the vocabulary, and the entire merge loop then runs on
    * the driver over that dict — which is what a tokenizer trainer IS
    * (the Sennrich / HF-tokenizers / SentencePiece shape). An earlier
    * revision batched provably-safe merges from per-round top-K pair
    * summaries; on natural text the top pairs share letters, the
    * safety bound almost never fires, and it degenerated to one job
    * per merge (measured: 85 jobs for 64 merges) — the dictionary
    * reduction is the real scale path.
    *
    * `maxVocab` caps driver memory by FAILING FAST, not by silently
    * truncating: a dropped count-1 tail CAN change even the first
    * merge (millions of distinct rare words sharing one pair sum to a
    * dominant count), so a corpus whose distinct-word count exceeds
    * the cap raises with the remedies — pre-sample the corpus
    * (`Sampling.deterministicSample` composes) or raise the cap. The
    * result is therefore ALWAYS bit-identical to the distributed
    * pairCounts statistic. Ties break on the pair string ascending in
    * UTF-8 byte order (Spark's string order), and segmentation is
    * codepoint-based — both identical to pairCounts.
    *
    * The fail-fast is guarded BEFORE the driver collect (r10 advisory:
    * at a multi-million cap the collect itself could pull hundreds of
    * MB onto the driver before the require fired): the narrow
    * (word, count) dict frame is staged once (lazily) so one
    * tokenization pass feeds both the exact distributed `count()`
    * guard and — only when the guard passes — the collect. An
    * over-cap corpus therefore costs one aggregate in EXECUTOR
    * memory/disk (spillable) and zero driver bytes; the happy path
    * tokenizes once, not once per action. The default cap is 2^20
    * (~1M words, tens of MB of driver heap) — a web-scale corpus
    * wanting the old 2^22 can pass it explicitly and owns the
    * correspondingly larger driver allocation. */
  def train(
      df: DataFrame, textCol: String, nMerges: Int,
      maxVocab: Int = 1 << 20): Seq[(String, String)] = {
    require(nMerges > 0 && maxVocab > 0,
      s"Bpe.train: nMerges and maxVocab must be > 0 " +
        s"(got nMerges=$nMerges, maxVocab=$maxVocab)")
    val dict = TextOps.wordDict(df, textCol, maxVocab, "Bpe.train")
    trainOnDict(dict, nMerges)
  }

  /** UTF-8 byte order — what Spark's UTF8String comparisons use. Java
    * String.compareTo is UTF-16 code-UNIT order, which disagrees for
    * supplementary characters vs BMP chars in [U+E000, U+FFFF]. */
  private val utf8Order: Ordering[String] =
    (a: String, b: String) => java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def toSymbols(w: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** Classic greedy merge loop over a word-count dictionary, with
    * incremental pair-count maintenance: applying a merge touches only
    * the words containing that pair (tracked in an inverted index), so
    * per-merge cost is proportional to the affected words plus one
    * argmax scan of the live pair table. */
  private def trainOnDict(
      dict: Array[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    val words = dict.map { case (w, _) => toSymbols(w) }
    val counts = dict.map(_._2)
    val pairCnt = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def addPairs(i: Int, sign: Long): Unit = {
      val s = words(i)
      var j = 0
      while (j + 1 < s.length) {
        val p = (s(j), s(j + 1))
        val c = pairCnt.getOrElse(p, 0L) + sign * counts(i)
        if (c == 0L) pairCnt.remove(p) else pairCnt(p) = c
        if (sign > 0) pairWords.getOrElseUpdate(p, mutable.Set.empty) += i
        else pairWords.get(p).foreach { ws => // prune the inverted index
          ws -= i
          if (ws.isEmpty) pairWords.remove(p)
        }
        j += 1
      }
    }
    words.indices.foreach(addPairs(_, 1L))
    // Allocation-free argmax scan: compare Long counts first and build
    // the joined "a b" strings only on count TIES — a comparator-based
    // min over boxed tuples would allocate per element per merge.
    def argmax: (String, String) = {
      var best: (String, String) = null
      var bestC = Long.MinValue
      pairCnt.foreach { case (p, c) =>
        if (c > bestC) { best = p; bestC = c }
        else if (c == bestC &&
          utf8Order.compare(p._1 + " " + p._2, best._1 + " " + best._2) < 0)
          best = p
      }
      best
    }
    var rules = Vector.empty[(String, String)]
    while (rules.length < nMerges && pairCnt.nonEmpty) {
      val (a, b) = argmax
      rules = rules :+ ((a, b))
      // Re-segment only the words that contain the pair. The pruned
      // index is exact; the adjacency re-check is defense in depth.
      val affected = pairWords.getOrElse((a, b), mutable.Set.empty).toArray
      affected.foreach { i =>
        val s = words(i)
        var j = 0
        var has = false
        while (!has && j + 1 < s.length) {
          has = s(j) == a && s(j + 1) == b; j += 1
        }
        if (has) {
          addPairs(i, -1L)
          val out = mutable.ArrayBuffer.empty[String]
          var t = 0
          while (t < s.length) {
            if (t + 1 < s.length && s(t) == a && s(t + 1) == b) {
              out += a + b; t += 2
            } else { out += s(t); t += 1 }
          }
          words(i) = out.toArray
          addPairs(i, 1L)
        }
      }
    }
    rules
  }

  /** Tokenize: one row per (doc, token) with the token's position —
    * the shape a vocab join or a token-count aggregate consumes. */
  def tokenize(
      df: DataFrame, idCol: String, textCol: String,
      rules: Seq[(String, String)]): DataFrame =
    OpsUtil.widen(df)
      .select(col(idCol),
        posexplode(BpeFunctions.bpeTokens(TextOps.normalized(col(textCol)), rules))
          .as(Seq("token_pos", "token")))

  /** Persist a merge-rule table as parquet (rank, lhs, rhs) — the
    * saveWeights / saveIndex pattern: rules apply IN RANK ORDER, so
    * the rank column IS the model; a loaded table reproduces
    * [[tokenize]] bit-identically. */
  def saveRules(rules: Seq[(String, String)], path: String,
      spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    rules.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("rank", "lhs", "rhs")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Load a persisted merge-rule table (inverse of [[saveRules]]). */
  def loadRules(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, String)] =
    spark.read.parquet(path).orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
}
