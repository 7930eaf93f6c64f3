package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BpeFunctions

/** Byte-pair-encoding vocabulary training over the corpus — the real
  * form of the "BPE-ish" token-count proxy: learn the merge table from
  * the data, then tokenize with it. Training is the classic Sennrich
  * loop re-expressed Spark-first:
  *
  *   round r: segment every word under the current rules (a codegen'd
  *   per-row projection, [[graft.functions.BpeSegment]]), count
  *   adjacent symbol pairs (ONE hash-agg shuffle on short pair
  *   strings, map-side partial aggregation), take the global argmax
  *   (a 1-row `orderBy(count desc, pair asc).limit(1)` —
  *   TakeOrderedAndProject, no global sort), append the merge.
  *
  * Per round the driver receives exactly one (pair, count) row — the
  * model stays distributed; only the rule table (merges × few bytes)
  * ever lives on the driver, which is what a tokenizer IS. At 100 TB
  * you train on a deterministic sample (pass a pre-sampled frame —
  * `Sampling.deterministicSample` composes) and tokenize the full
  * corpus with the frozen rules.
  *
  * Determinism: ties break on the pair string ascending, so the merge
  * table is a pure function of the corpus.
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
    * bit-identical to the one-merge-per-job classic loop, but each
    * Spark ROUND collects one bounded top-K pair summary
    * (TakeOrderedAndProject — never a global sort) and the driver
    * applies as many merges from it as provably match the classic
    * sequence, so the job count is O(rounds), not O(merges) (a
    * 32k-merge vocabulary would otherwise be 32k Spark jobs).
    *
    * Batch-safety argument: applying merge (a,b) can only change the
    * count of pairs CONTAINING a or b (old neighbors decrease; greedy
    * left-to-right merging leaves the applied pair itself at count 0),
    * and a NEW pair (x,ab)/(ab,y) inherits count ≤ the stale count of
    * the tainted pair (x,a)/(b,y) it came from — for a ≠ b that
    * bounding pair is never the applied pair itself (its right symbol
    * would have to be a, which was untainted at apply time), but for a
    * SELF-merge (a,a) chains like (aa,a)/(aa,aa) are bounded only by
    * the applied pair's own stale count, so self-merges stay in the
    * bound. A later candidate whose symbols are disjoint from every
    * applied merge's {a, b, ab} still carries its true count, and it
    * is the true next argmax as long as that count STRICTLY exceeds
    * every tainted pair's stale count (minus applied non-self pairs)
    * and the summary's cutoff (the K-th count bounds everything
    * uncollected). First candidate of a round is the fresh argmax and
    * always applies. Ties break on the pair string ascending, exactly
    * like the single-merge loop. */
  def train(
      df: DataFrame, textCol: String, nMerges: Int): Seq[(String, String)] = {
    require(nMerges > 0)
    // The loop re-reads the corpus once per ROUND — materialize the
    // normalized text once so the upstream plan (joins, filters) isn't
    // re-executed per round. normalized() is idempotent, so pairCounts
    // re-normalizing the staged column is a no-op.
    val staged = OpsUtil.widen(df)
      .select(TextOps.normalized(col(textCol)).as("__graft_bpe_t"))
      .localCheckpoint(false)
    var rules = Vector.empty[(String, String)]
    var exhausted = false
    while (rules.length < nMerges && !exhausted) {
      val k = math.min(4096, math.max(64, 4 * (nMerges - rules.length)))
      val top = pairCounts(staged, "__graft_bpe_t", rules)
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(k).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      if (top.isEmpty) exhausted = true
      else {
        // Stale counts of pairs OUTSIDE the collected summary are
        // bounded by the K-th collected count (0 if fully collected).
        val cutoff = if (top.length < k) 0L else top.last._2
        var tainted = Set.empty[String]
        var appliedNonSelf = Set.empty[String] // their true count is 0 now
        def taintedMax: Long = top.iterator.collect {
          case (p, c) if !appliedNonSelf(p) && {
            val Array(a, b) = p.split(' '); tainted(a) || tainted(b)
          } => c
        }.foldLeft(cutoff)(math.max)
        var applied = 0
        var i = 0
        var open = true
        while (i < top.length && rules.length < nMerges && open) {
          val (pairStr, cnt) = top(i)
          val Array(a, b) = pairStr.split(' ')
          if (tainted(a) || tainted(b)) i += 1 // stale — invisible this round
          else if (applied == 0 || cnt > taintedMax) {
            rules = rules :+ ((a, b))
            tainted = tainted + a + b + (a + b)
            if (a != b) appliedNonSelf = appliedNonSelf + pairStr
            applied += 1
            i += 1
          } else open = false // provability lost — next round recounts
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
}
