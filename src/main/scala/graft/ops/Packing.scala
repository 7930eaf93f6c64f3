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

  /** The splitter: one row per (document, training sequence) overlap.
    * A document occupying tokens `[tokens_before, tokens_before + n)`
    * of its bucket's stream straddles every sequence whose
    * `[seq_idx·seqLen, (seq_idx+1)·seqLen)` window it intersects; each
    * overlap row carries the half-open token span of the document that
    * lands in that sequence (`doc_token_start/end`) and where the span
    * starts inside the sequence (`seq_offset`). Concatenating spans in
    * (seq_idx, seq_offset) order reconstructs each training sequence
    * exactly; spans of one doc concatenate back to the doc (asserted
    * in spec). Pure arithmetic on the [[assignSequences]] output — the
    * explode adds ≤ n/seqLen extra rows per doc, and no new shuffle
    * beyond the packing window itself. */
  def splitSegments(
      df: DataFrame, idCol: String, nTokensCol: String,
      seqLen: Int, buckets: Int): DataFrame =
    segmented(df, idCol, nTokensCol, seqLen, buckets, carry = Nil)

  /** The one splitter both [[splitSegments]] and [[packTokens]] run —
    * the span arithmetic (lastSeq, doc_token_start/end, seq_offset)
    * exists exactly once so the two public faces cannot drift (the
    * LanguageModel-ngrams review lesson, applied here before it
    * bites). `carry` columns ride through the explode unchanged, for
    * consumers that need per-segment payloads (packTokens carries the
    * token array it slices). */
  private def segmented(
      df: DataFrame, idCol: String, nTokensCol: String,
      seqLen: Int, buckets: Int, carry: Seq[String]): DataFrame = {
    require(seqLen > 0 && buckets > 0)
    val tb = col("tokens_before")
    val n = col(nTokensCol)
    val lastSeq = floor((tb + n - 1) / seqLen).cast("long")
    assignSequences(df, idCol, nTokensCol, seqLen, buckets)
      .filter(n > 0)
      .select(Seq(col("pack_bucket"), col(idCol), tb, n,
        explode(sequence(col("seq_idx"), lastSeq)).as("seq_idx")) ++
        carry.map(col): _*)
      .select(Seq(
        col("pack_bucket"), col("seq_idx"), col(idCol),
        greatest(col("seq_idx") * seqLen - tb, lit(0L)).as("doc_token_start"),
        least((col("seq_idx") + 1) * seqLen - tb, n).as("doc_token_end"),
        greatest(tb - col("seq_idx") * seqLen, lit(0L)).as("seq_offset")) ++
        carry.map(col): _*)
  }

  /** [[splitSegments]] carrying the ACTUAL token slices: one row per
    * (document, training sequence) overlap whose `seq_tokens` is the
    * document's tokens landing in that sequence —
    * `slice(tokens, doc_token_start+1, doc_token_end-doc_token_start)`
    * computed in the same projection, no join back to the corpus.
    * `tokensCol` is an `array<string>` column (the tokenizers' serving
    * shape with the explode elided); its size IS the token count, so
    * the count column can never drift from the array it describes.
    * NULL arrays count as 0 tokens (content-free rows pack nothing and
    * emit no segments — the index-gate bypass contract's packing
    * analogue). Span arithmetic is per-document, so the int casts for
    * `slice` are safe for any document under 2^31 tokens — bucket
    * streams (tokens_before) stay long. */
  def packTokens(
      df: DataFrame, idCol: String, tokensCol: String,
      seqLen: Int, buckets: Int): DataFrame =
    segmented(
        df.withColumn("__graft_nt",
          coalesce(size(col(tokensCol)).cast("long"), lit(0L))),
        idCol, "__graft_nt", seqLen, buckets, carry = Seq(tokensCol))
      .withColumn("seq_tokens",
        slice(col(tokensCol), (col("doc_token_start") + 1).cast("int"),
          (col("doc_token_end") - col("doc_token_start")).cast("int")))
      .drop(tokensCol)

  /** Assembled training sequences: one row per (pack_bucket, seq_idx)
    * whose `tokens` is the concatenation of its [[packTokens]] segments
    * in seq_offset order — exactly `seqLen` tokens everywhere except
    * each bucket's tail sequence (the ≤-one-sequence-per-bucket
    * remainder). This is the shape a pre-training pipeline WRITES:
    * clean → filter → dedup → tokenize → pack → TFRecord, one record
    * per fixed-budget sequence. One extra hash-agg shuffle on
    * (bucket, seq) beyond the packing window; segment spans are
    * disjoint per sequence so `seq_offset` is a total order and the
    * in-group `array_sort` on (offset, segment) structs reassembles
    * deterministically. */
  def packedSequences(
      df: DataFrame, idCol: String, tokensCol: String,
      seqLen: Int, buckets: Int): DataFrame =
    packTokens(df, idCol, tokensCol, seqLen, buckets)
      .groupBy(col("pack_bucket"), col("seq_idx"))
      .agg(
        flatten(transform(
          array_sort(collect_list(struct(col("seq_offset"), col("seq_tokens")))),
          s => s.getField("seq_tokens"))).as("tokens"),
        count(lit(1)).as("n_docs"))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))

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
