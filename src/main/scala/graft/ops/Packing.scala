package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training batches: assign documents to
  * fixed-token-budget training sequences.
  *
  * Distributed shape: documents are hash-partitioned into `buckets`
  * independent packing groups and packed contiguously WITHIN each
  * group — embarrassingly parallel (one window per bucket, never a
  * global sort), deterministic (hash order, not arrival order), and
  * the per-bucket remainder waste is bounded by one sequence per
  * bucket. A global greedy packing would serialize on one partition
  * at 100 TB for a ~0.1% fill improvement.
  *
  * Size `buckets` to the cluster, not the data: each bucket is one
  * sort partition, so buckets ≈ a few × total cores keeps partitions
  * executor-sized at any corpus scale while the remainder waste
  * (≤ one sequence per bucket) stays negligible.
  */
object Packing {

  /** Assign each doc its (bucket, seq_idx) training sequence: docs are
    * ordered by portable hash within their bucket, token counts
    * prefix-summed, and a doc starts in sequence
    * `floor(tokens_before / seqLen)`. Output keeps the doc row plus
    * `pack_bucket`, `seq_idx`, `tokens_before`. */
  def assignSequences(
      df: DataFrame, idCol: String, nTokensCol: String,
      seqLen: Int, buckets: Int): DataFrame = {
    require(seqLen > 0 && buckets > 0)
    val bucket = Sampling.hashBucket(col(idCol), buckets)
    val w = Window.partitionBy(col("pack_bucket"))
      .orderBy(Sampling.hashBucket(col(idCol), 1000003), col(idCol))
    df.withColumn("pack_bucket", bucket)
      .withColumn("tokens_before",
        coalesce(sum(col(nTokensCol))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("seq_idx", (col("tokens_before") / seqLen).cast("long"))
  }

  /** Per-sequence packing stats: docs packed, tokens packed, fill
    * ratio vs the budget (straddling docs count toward the sequence
    * they start in — the splitter downstream handles the carry). */
  def sequenceStats(
      df: DataFrame, idCol: String, nTokensCol: String,
      seqLen: Int, buckets: Int): DataFrame =
    assignSequences(df, idCol, nTokensCol, seqLen, buckets)
      .groupBy(col("pack_bucket"), col("seq_idx"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(nTokensCol)).as("n_tokens"))
      .withColumn("fill_ratio",
        least(col("n_tokens").cast("double") / seqLen, lit(1.0)))
}
