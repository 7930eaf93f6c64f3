package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level text operators — the cleaning stages that need to see
  * the whole corpus, not one document at a time (cross-document line
  * frequency, global n-gram statistics). Unlike [[TextOps]] these
  * shuffle by necessity; the design keeps every shuffle on small
  * fixed-width keys (16-byte md5 line hashes, n-gram strings) with
  * map-side partial aggregation, and the "hot" sets that drive
  * filtering are small by construction (df-capped) so the planner can
  * broadcast them — without forcing a broadcast that would OOM on a
  * pathological corpus.
  */
object CorpusOps {

  /** C4-style boilerplate removal: drop every line that occurs in more
    * than `maxDf` distinct documents (nav bars, cookie banners, license
    * headers), then reassemble the surviving lines in document order.
    * Documents whose lines are all boilerplate are dropped (C4 drops
    * empty documents too).
    *
    * Scale shape: (1) explode to lines — map-side, no shuffle; (2) one
    * hash-agg shuffle on the 16-byte line hash for document frequency
    * (partial aggregation collapses repeats before the wire); (3) the
    * boilerplate set — by construction ≤ corpus_lines / maxDf entries —
    * anti-joins against the line table with the strategy left to
    * AQE: it broadcasts when the measured size fits
    * autoBroadcastJoinThreshold, and falls back to a shuffle join when
    * a pathological corpus makes the hot set big (a forced broadcast
    * would OOM the driver there); (4) one shuffle on doc id to
    * reassemble. Nothing is ever keyed on raw line text.
    */
  def stripBoilerplate(
      df: DataFrame, idCol: String, textCol: String, maxDf: Int): DataFrame = {
    require(maxDf > 0)
    // Consumed by both the df-count branch and the anti-join branch —
    // materialized once (lazily) instead of re-exploding the corpus
    // per consumer.
    val lines = OpsUtil.widen(df)
      .select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("line_pos", "line")))
      .withColumn("line_key", md5(col("line")))
      .localCheckpoint(false)
    val boilerplate = lines
      .groupBy(col("line_key"))
      .agg(countDistinct(col(idCol)).as("line_df"))
      .filter(col("line_df") > maxDf)
      .select("line_key")
    lines
      .join(boilerplate, Seq("line_key"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lines_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("line_pos"), col("line")))),
            s => s.getField("line")),
          "\n").as("clean_text"))
  }

  /** Exact substring-duplication audit (the "deduplicating training
    * data" shape): slide fixed-width character windows across every
    * document at a stride, hash each window, and count how many
    * distinct documents share each window hash. Emits per-document
    * window counts and the fraction of windows that also appear in
    * some other document — the signal a span-removal or doc-drop
    * policy consumes. Documents shorter than one window emit no row.
    *
    * Scale shape: windows are a per-row projection + explode (no
    * shuffle, and stride controls the blowup: len/stride rows per
    * doc); the corpus-wide frequency count shuffles only
    * `(16-byte md5, doc_id)` with map-side partial aggregation, and
    * the count joins back on the same hash key — two shuffles total
    * on fixed-width keys, raw text never leaves the scan stage.
    */
  def duplicateSpans(
      df: DataFrame, idCol: String, textCol: String,
      windowChars: Int, stride: Int): DataFrame = {
    require(windowChars > 0 && stride > 0 && stride <= windowChars)
    val t = col(textCol)
    // Window starts 0, stride, 2*stride … while start + windowChars <= len;
    // guarded so sub-window docs yield an empty array (sequence(0, -1)
    // would count DOWN, not produce an empty sequence).
    val nWin = (floor((length(t) - windowChars) / stride) + 1).cast("int")
    val winArr = when(length(t) >= windowChars,
      transform(sequence(lit(0), nWin - 1),
        i => t.substr(i * stride + 1, lit(windowChars))))
      .otherwise(array().cast("array<string>"))
    // ~40 bytes/row, consumed by both the frequency count and the
    // join-back — materialized once (lazily) instead of re-windowing
    // and re-hashing the corpus text per consumer.
    val wins = OpsUtil.widen(df)
      .select(col(idCol), posexplode(winArr).as(Seq("win_pos", "win")))
      .select(col(idCol), col("win_pos"), md5(col("win")).as("win_hash"))
      .localCheckpoint(false)
    val winDf = wins
      .groupBy(col("win_hash"))
      .agg(countDistinct(col(idCol)).as("win_df"))
    wins
      .join(winDf, Seq("win_hash"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_windows"),
        sum(when(col("win_df") >= 2, 1L).otherwise(0L)).as("n_dup_windows"))
      .withColumn("dup_window_frac",
        col("n_dup_windows").cast("double") / col("n_windows").cast("double"))
  }

  /** Stride-robust duplicate-span audit: the alignment-proof sibling of
    * [[duplicateSpans]]. The strided form hashes windows at offsets
    * 0, stride, 2·stride, … — a span duplicated across documents at
    * offsets that differ by a non-multiple of the stride lands windows
    * at different phases and is missed entirely (no window of one doc
    * byte-equals any window of the other). This form instead rolls a
    * `windowChars`-gram hash at stride 1 and keeps only the winnowed
    * selection (the minimum of every `winnowW` consecutive hashes —
    * Schleimer/Wilkerson/Aiken), which carries the winnowing
    * GUARANTEE: any span of ≥ `windowChars + winnowW − 1` chars shared
    * by two documents contributes at least one shared fingerprint, at
    * ANY relative alignment — while keeping only ~2/(winnowW+1) of the
    * stride-1 hashes, i.e. the same rows-per-doc budget as the strided
    * audit at stride ≈ winnowW/2.
    *
    * Output mirrors [[duplicateSpans]]: per-doc fingerprint count, how
    * many of those fingerprints also occur in another document, and
    * the duplicated fraction. Empty documents emit no row (they have
    * no fingerprints); sub-window documents fingerprint their full
    * text (length-capped k, as [[graft.functions.WinnowedFingerprints]]
    * defines).
    *
    * Scale shape: identical to the strided form — the fingerprint
    * projection is a codegen'd single pass over the scan (O(n) rolling
    * hash + monotonic-deque minima, no shuffle), and the corpus-wide
    * frequency count + join-back shuffle only 8-byte hashes. Raw text
    * never leaves the scan stage, and winnowing caps the exploded
    * row count the same way the stride does. `portable = true` uses
    * mod-(2³¹−1) char-fold arithmetic whose SQL mirror the oracle
    * replays verbatim. */
  def duplicateSpansRobust(
      df: DataFrame, idCol: String, textCol: String,
      windowChars: Int, winnowW: Int = 16, portable: Boolean = false): DataFrame = {
    import graft.functions.RollingHashFunctions
    val fpCol =
      if (portable)
        RollingHashFunctions.winnowedFingerprintsPortable(col(textCol), windowChars, winnowW)
      else RollingHashFunctions.winnowedFingerprints(col(textCol), windowChars, winnowW)
    // Consumed by the frequency count and the join-back — materialized
    // once (lazily) instead of re-winnowing the corpus per consumer.
    val fps = OpsUtil.widen(df)
      .select(col(idCol), explode(fpCol).as("fp"))
      .localCheckpoint(false)
    val fpDf = fps
      .groupBy(col("fp"))
      .agg(countDistinct(col(idCol)).as("fp_df"))
    fps
      .join(fpDf, Seq("fp"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_fingerprints"),
        sum(when(col("fp_df") >= 2, 1L).otherwise(0L)).as("n_dup_fingerprints"))
      .withColumn("dup_fp_frac",
        col("n_dup_fingerprints").cast("double") / col("n_fingerprints").cast("double"))
  }

  /** Per-document top-k TF-IDF terms (keyword extraction). TF is the
    * in-document term count, IDF the smoothed `ln((N+1)/(df+1)) + 1`
    * over distinct-document frequency; ties break lexicographically.
    *
    * Scale shape: one (doc, term) hash-agg for TF (map-side combined),
    * one term-keyed agg for DF, and a join of the exploded terms
    * against the DF table — vocab-sized, so AQE broadcasts it in
    * practice; high-df (stopword-like) terms are exactly the rows a
    * skewed term join would hot-spot on, and they arrive pre-collapsed
    * to one row each by the DF aggregation. The doc count N is a
    * 1-value driver aggregate embedded as a literal (index-build
    * pattern, same as the PIT join's min/max bounds). */
  def tfidfTopTerms(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val terms = OpsUtil.widen(df)
      .select(col(idCol),
        explode(TextOps.tokens(TextOps.normalized(col(textCol)))).as("term"))
      .localCheckpoint(false) // feeds TF, DF, and N — explode once
    val nDocs = terms.select(col(idCol)).distinct().count()
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfTab = terms.groupBy(col("term"))
      .agg(countDistinct(col(idCol)).as("term_df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(dfTab, Seq("term"))
      .withColumn("tfidf",
        col("tf") * (log((lit(nDocs) + 1.0) / (col("term_df") + 1.0)) + 1.0))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank").cast("long").as("rank"),
        col("term"), col("tf"), col("term_df"),
        col("tfidf"))
  }

  /** DSIR-style importance weights (Data Selection via Importance
    * Resampling, Xie et al. 2023): score every document by how much
    * its hashed n-gram feature distribution looks like a TARGET corpus
    * rather than the RAW corpus — `w(doc) = Σ_tokens ln(p_target(b) /
    * p_raw(b))` over hashed feature buckets b, with add-one smoothing.
    * High-weight documents are the ones importance resampling keeps.
    *
    * Buckets are the first `hexChars` hex digits of md5(token) —
    * engine-portable (no xxhash), 16^hexChars buckets. Per-bucket log
    * ratios are rounded to 6 dp and summed as DECIMAL so the per-doc
    * reduction is order-independent (bit-identical on any engine or
    * partitioning).
    *
    * Scale shape: the two distributions aggregate over 16-byte-prefix
    * keys with map-side combine into bucket-count tables of AT MOST
    * 16^hexChars rows — broadcast-sized by construction — and the
    * per-token join against them is a broadcast hash join feeding one
    * final per-doc hash-agg. The corpus is scanned twice (target
    * predicate + scoring), never joined to itself.
    */
  def dsirLogWeights(
      df: DataFrame, idCol: String, textCol: String,
      targetPred: org.apache.spark.sql.Column, hexChars: Int = 2): DataFrame = {
    require(hexChars >= 1 && hexChars <= 8)
    val nBuckets = math.pow(16, hexChars).toLong
    val toks = OpsUtil.widen(df)
      .select(col(idCol), targetPred.as("__graft_tgt"),
        explode(TextOps.tokens(TextOps.normalized(col(textCol)))).as("tk"))
      // Empty/whitespace text splits to [""] — not a feature. Without
      // this an empty doc gets n_tokens=1 and a weight from the md5("")
      // bucket, skewing both distributions (and diverging from
      // [[Classifier.trainScoreLogistic]]'s feature extraction).
      .filter(col("tk") =!= "")
      .withColumn("b", substring(md5(col("tk")), 1, hexChars))
      .localCheckpoint(false) // feeds both distributions + the scorer
    def dist(frame: DataFrame, cnt: String, tot: String): DataFrame = {
      val c = frame.groupBy(col("b")).agg(count(lit(1)).as(cnt))
      c.crossJoin(broadcast(c.agg(sum(col(cnt)).as(tot))))
    }
    // Fail fast on an empty target slice: the distributions would empty
    // the ratio table and every document would silently score to zero
    // rows — a resampler downstream would keep NOTHING with no signal.
    // Probed on the RAW frame (limit-1 scan, stops at the first match)
    // so the guard never materializes the tokenized corpus.
    require(!df.filter(targetPred).isEmpty,
      "dsirLogWeights: no target documents (empty corpus or targetPred matches nothing)")
    val target = dist(toks.filter(col("__graft_tgt")), "c_t", "n_t")
    val raw = dist(toks, "c_r", "n_r")
    // Smoothed log ratio per bucket, on the tiny joined bucket table;
    // buckets absent from the target keep c_t = 0 via the left join.
    val ratios = raw
      .join(target.select("b", "c_t"), Seq("b"), "left")
      .crossJoin(broadcast(target.select("n_t").distinct()))
      .withColumn("log_ratio", round(
        log((coalesce(col("c_t"), lit(0L)) + 1.0).cast("double")
            / (col("n_t") + nBuckets).cast("double"))
          - log((col("c_r") + 1.0).cast("double")
            / (col("n_r") + nBuckets).cast("double")), 6)
        .cast("decimal(28,6)"))
      .select("b", "log_ratio")
    toks.join(broadcast(ratios), Seq("b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("log_ratio")).cast("double").as("dsir_weight"))
  }

  /** Per-source unigram KL divergence against the whole corpus — the
    * composition-shift audit of a multi-source training mix: a source
    * whose token distribution sits far from the pooled corpus is
    * either a genuinely distinct domain (keep, maybe upweight) or a
    * contamination/extraction bug (investigate); either way the
    * number to watch per ingest round is
    *
    *   KL(P_source ‖ P_corpus) = Σ_w p_s(w) · ln(p_s(w) / p(w))
    *
    * (≥ 0 by Gibbs; 0 iff the source IS the corpus distribution —
    * both pinned by spec). Because every source is part of the
    * corpus, p(w) > 0 wherever p_s(w) > 0 and the sum is always
    * finite — no smoothing needed.
    *
    * Scale shape: ONE shuffle keyed by (source, token) builds the
    * per-source counts; corpus counts, per-source totals, and the
    * grand total all derive from that aggregate (the wire carries one
    * row per DISTINCT (source, token) after the first shuffle, never
    * per occurrence). The per-source total table is sources-sized
    * (broadcast), the grand total is 1 row. Terms round to 9 dp and
    * sum through DECIMAL — order-free, engine-portable.
    *
    * Output: (source, n_tokens, n_types, kl_vs_corpus). */
  def sourceDivergence(
      df: DataFrame, srcCol: String, textCol: String): DataFrame = {
    val toks = OpsUtil.widen(df)
      .select(col(srcCol).as("src"),
        explode(TextOps.tokens(TextOps.normalized(col(textCol)))).as("tk"))
      .filter(col("tk") =!= "")
    // feeds the corpus rollup, per-source totals, grand total, AND the
    // scoring join — materialize the (source, token) aggregate once.
    val perSrc = toks.groupBy("src", "tk").agg(count(lit(1)).as("c_sw"))
      .localCheckpoint(false)
    val cW = perSrc.groupBy("tk").agg(sum(col("c_sw")).as("c_w"))
    val nS = perSrc.groupBy("src").agg(sum(col("c_sw")).as("n_s"))
    val n = perSrc.agg(sum(col("c_sw")).as("n"))
    val ps = col("c_sw").cast("double") / col("n_s").cast("double")
    val p = col("c_w").cast("double") / col("n").cast("double")
    val term = round(ps * log(ps / p), 9).cast("decimal(24,9)")
    perSrc
      .join(cW, Seq("tk"))
      .join(nS, Seq("src"))
      .crossJoin(broadcast(n))
      .groupBy(col("src").as(srcCol))
      .agg(
        sum(col("c_sw")).cast("long").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(term).cast("double").as("kl_vs_corpus"))
  }

  /** Exact duplicate-span REMOVAL (the surgery the [[duplicateSpans]]
    * audit motivates — Lee et al. 2022's "deduplicating training data"
    * cuts repeated substrings instead of dropping whole documents):
    * every character covered by a strided window whose hash appears in
    * ≥ `minDocs` DISTINCT documents is deleted; the survivors
    * concatenate in order. Emits (id, clean_text, n_removed_chars).
    *
    * Scale shape: same two fixed-width-key shuffles as the audit
    * (window-hash df + hash join-back) plus a per-doc collect of the
    * duplicate START OFFSETS only (few longs per doc — never text).
    * The final cut is a per-row projection: a position mask over the
    * doc's own characters (O(len · dup_windows) interpreted HOF —
    * fine for the cut step because dup windows per doc are few; a
    * production build would swap the mask for a codegen expression,
    * the surrounding plan is unchanged). Documents with no duplicated
    * window pass through untouched via the left join.
    */
  def removeDuplicateSpans(
      df: DataFrame, idCol: String, textCol: String,
      windowChars: Int, stride: Int, minDocs: Int = 2): DataFrame = {
    require(windowChars > 0 && stride > 0 && stride <= windowChars && minDocs >= 2)
    val t = col(textCol)
    val nWin = (floor((length(t) - windowChars) / stride) + 1).cast("int")
    val winArr = when(length(t) >= windowChars,
      transform(sequence(lit(0), nWin - 1),
        i => struct((i * stride).as("start"),
          md5(t.substr(i * stride + 1, lit(windowChars))).as("h"))))
      .otherwise(array().cast("array<struct<start:int,h:string>>"))
    val wins = OpsUtil.widen(df)
      .select(col(idCol), explode(winArr).as("w"))
      .select(col(idCol), col("w.start").as("start"), col("w.h").as("h"))
      .localCheckpoint(false) // feeds the df count and the join-back
    val dup = wins.groupBy(col("h"))
      .agg(countDistinct(col(idCol)).as("wdf"))
      .filter(col("wdf") >= minDocs).select("h")
    val dupStarts = wins.join(dup, Seq("h"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_set(col("start"))).as("__graft_cuts"))
    // Character p (0-based) survives iff no duplicate window covers it;
    // array_join concatenates survivors in one linear pass.
    val masked = array_join(
      filter(
        transform(sequence(lit(0), length(t) - 1),
          p => when(
            exists(col("__graft_cuts"),
              s => p >= s && p < s + windowChars),
            lit(null).cast("string"))
            .otherwise(t.substr(p + 1, lit(1)))),
        c => c.isNotNull),
      "")
    OpsUtil.widen(df)
      .join(dupStarts, Seq(idCol), "left")
      .withColumn("clean_text",
        when(col("__graft_cuts").isNull, t).otherwise(masked))
      .withColumn("n_removed_chars",
        (length(t) - length(col("clean_text"))).cast("long"))
      .select(col(idCol), col("clean_text"), col("n_removed_chars"))
  }

  /** Cross-source contamination matrix: for every pair of sources, how
    * many distinct word n-grams they share — the corpus-governance
    * statistic behind "is split A leaking into split B" and "which
    * scrapes overlap enough to merge". Shingles reduce to DISTINCT
    * (source, md5) pairs first, so the self-join input is bounded by
    * sources × vocabulary (not corpus rows) and each shared shingle
    * contributes ≤ C(sources, 2) pairs — there is no per-document
    * quadratic anywhere. md5 keys keep the join off raw text while
    * staying engine-reproducible (the oracle counts the same hashes).
    */
  def crossSourceOverlap(
      df: DataFrame, srcCol: String, textCol: String,
      shingleN: Int): DataFrame = {
    // shingleN = 0 would emit the empty shingle from EVERY document
    // (every source pair "overlaps"); negative values crash inside
    // element_at under ANSI. Fail at the API boundary instead.
    require(shingleN >= 1, s"shingleN must be >= 1, got $shingleN")
    val sh = OpsUtil.widen(df)
      .select(col(srcCol).as("src"),
        TextOps.tokens(TextOps.normalized(col(textCol))).as("ws"))
      .select(col("src"),
        explode(TextOps.shingles(col("ws"), shingleN)).as("sh_txt"))
      .select(col("src"), md5(col("sh_txt")).as("sh"))
      .distinct() // (source, shingle) pairs — the join input
      .localCheckpoint(false)
    sh.as("x").join(sh.as("y"), Seq("sh"))
      .filter(col("x.src") < col("y.src"))
      .groupBy(col("x.src").as("source_a"), col("y.src").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Top-k most frequent word n-grams across the corpus — the vocab /
    * merge-table prep statistic. One map-side-combined hash-agg shuffle
    * on the n-gram string, then a TakeOrderedAndProject (no global
    * sort materializes). Ties break lexicographically so the result is
    * total-ordered and engine-reproducible. */
  def vocabTopK(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame = {
    val ws = col("__graft_ws")
    OpsUtil.widen(df)
      .withColumn("__graft_ws", TextOps.tokens(TextOps.normalized(col(textCol))))
      .select(explode(TextOps.shingles(ws, n)).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("ngram"))
      .limit(k)
  }

  /** Per-document OUT-OF-VOCABULARY rate against a reference
    * vocabulary — the corpus-QA statistic behind "does the tokenizer/
    * vocab trained yesterday still cover today's data" (its drift over
    * ingestion batches is the retraining signal). Same normalization +
    * whitespace tokens as [[vocabTopK]], so a vocab built there scores
    * here without convention drift. Shape: one explode, one BROADCAST
    * left join on the token string (a vocabulary is dimension-sized by
    * definition), one per-doc map-side-combined hash-agg — no
    * corpus-sized shuffle. Every input document emits a row; a
    * token-less (empty/whitespace) document reports n_tokens = 0 with
    * a NULL oov_rate (there is nothing to cover). */
  def oovRate(
      df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, termCol: String): DataFrame = {
    val toks = OpsUtil.widen(df)
      .select(col(idCol).as("id"),
        explode(TextOps.tokens(TextOps.normalized(col(textCol)))).as("tok"))
      .filter(length(col("tok")) > 0)
    val inVocab = broadcast(
      vocab.select(col(termCol).cast("string").as("tok")).distinct()
        .withColumn("__graft_v", lit(1)))
    val perDoc = toks.join(inVocab, Seq("tok"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__graft_v").isNull, 1L).otherwise(0L)).as("n_oov"))
    OpsUtil.widen(df).select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .as("oov_rate"))
  }

  /** Corpus-level OOV summary — ONE row (n_docs, n_tokens, n_oov,
    * oov_rate) over [[oovRate]]'s tokenization contract: the number a
    * coverage gate actually thresholds, and the per-micro-batch row of
    * the streaming monitor. A batch with zero tokens reports 0/0 with
    * a NULL rate (nothing to cover), never NULL counts — sink gates
    * must stay fire-able on empty micro-batches. */
  def oovSummary(
      df: DataFrame, textCol: String,
      vocab: DataFrame, termCol: String): DataFrame = {
    val toks = OpsUtil.widen(df)
      .select(explode(TextOps.tokens(TextOps.normalized(col(textCol)))).as("tok"))
      .filter(length(col("tok")) > 0)
    val inVocab = broadcast(
      vocab.select(col(termCol).cast("string").as("tok")).distinct()
        .withColumn("__graft_v", lit(1)))
    val nDocs = df.count() // one cheap count; the agg below owns tokens
    toks.join(inVocab, Seq("tok"), "left")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__graft_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(lit(nDocs).as("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        (coalesce(col("n_oov"), lit(0L)).cast("double") /
          when(coalesce(col("n_tokens"), lit(0L)) > 0,
            col("n_tokens").cast("double"))).as("oov_rate"))
  }
}
