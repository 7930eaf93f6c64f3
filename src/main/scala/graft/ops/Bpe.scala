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

  /** Train `nMerges` merge rules. Returns them in rank order. */
  def train(
      df: DataFrame, textCol: String, nMerges: Int): Seq[(String, String)] = {
    require(nMerges > 0)
    // The loop re-reads the corpus once per merge round — materialize
    // the normalized text once so the upstream plan (joins, filters)
    // isn't re-executed nMerges times. normalized() is idempotent, so
    // pairCounts re-normalizing the staged column is a no-op.
    val staged = OpsUtil.widen(df)
      .select(TextOps.normalized(col(textCol)).as("__graft_bpe_t"))
      .localCheckpoint(false)
    var rules = Vector.empty[(String, String)]
    var r = 0
    var exhausted = false
    while (r < nMerges && !exhausted) {
      val top = pairCounts(staged, "__graft_bpe_t", rules)
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val parts = top.head.getString(0).split(' ')
        rules = rules :+ ((parts(0), parts(1)))
      }
      r += 1
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
