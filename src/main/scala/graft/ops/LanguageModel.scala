package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the CCNet/Gopher
  * "perplexity filter" stage of a pre-training pipeline: train a
  * smoothed bigram model on the corpus itself (or a clean reference
  * corpus), score every document's per-token cross-entropy under it,
  * and drop the tail. A real system trains a 5-gram KenLM offline; the
  * statistical machinery (counts, add-k smoothing, per-doc average
  * log-loss) is identical and everything here is expressible as Spark
  * relational ops, so the 100 TB shape falls out of Catalyst:
  *
  *   - bigram/prefix counts: one hash-aggregate shuffle each over the
  *     ONCE-materialized exploded bigram table, both with map-side
  *     partial aggregation (the wire carries one row per DISTINCT
  *     n-gram, not per occurrence);
  *   - vocabulary size: a 1-row aggregate that broadcasts;
  *   - scoring: the exploded (doc, bigram) table joins the count tables
  *     on narrow string keys — shuffle joins that AQE converts to
  *     broadcasts when a count table fits — then one final aggregate on
  *     doc id.
  *
  * Nothing is ever keyed on document text; no driver-side model object
  * exists (the "model" stays a distributed table, which is what makes
  * this trainable on the full corpus rather than a sample).
  */
object LanguageModel {

  /** Per-document cross-entropy under an add-k-smoothed bigram model
    * trained on `train` (pass the same frame to self-score a corpus):
    *
    *   P(w2 | w1) = (c(w1 w2) + k) / (c(w1 ·) + k·V)
    *   cross_entropy(doc) = -mean over bigrams of ln P(w2 | w1)
    *
    * Bigrams unseen in training score through the smoothing mass
    * (c counts coalesce to 0), so out-of-domain documents land where a
    * perplexity filter needs them: at the high-loss tail.
    *
    * Output: (doc_id, n_bigrams, cross_entropy). Documents with fewer
    * than 2 tokens have no bigrams and are absent (nothing to score).
    * The per-term log-losses sum through DECIMAL (order-free) so the
    * result is deterministic under any partitioning.
    */
  def bigramCrossEntropy(
      score: DataFrame, train: DataFrame, idCol: String, textCol: String,
      k: Double = 1.0): DataFrame = {
    require(k > 0, "add-k smoothing needs k > 0")
    def bigrams(d: DataFrame) = OpsUtil.widen(d)
      .select(col(idCol).as("id"),
        TextOps.tokens(TextOps.normalized(col(textCol))).as("ws"))
      .select(col("id"), explode(TextOps.shingles(col("ws"), 2)).as("bg"))
    // The exploded bigram table feeds the c12 aggregate, the c1
    // aggregate, and (when self-scoring) the scoring side — three
    // consumers that would each re-tokenize the corpus. Materialize it
    // once; self-scoring (score eq train) reuses the same frame.
    val trainBg = bigrams(train).localCheckpoint(false)
    val scoreBg = if (score eq train) trainBg else bigrams(score)
    // c(w1 w2) and c(w1 ·) — two aggregates over the same exploded
    // frame; prefix counts aggregate the bigram string's first token so
    // both group-bys read the one exploded column.
    val c12 = trainBg.groupBy("bg").agg(count(lit(1)).as("c12"))
    val c1 = trainBg
      .groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(count(lit(1)).as("c1"))
    // V = distinct token count of the training corpus (1 row, broadcast).
    val vocab = OpsUtil.widen(train)
      .select(explode(TextOps.tokens(TextOps.normalized(col(textCol)))).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    // LEFT joins + coalesce(count, 0): a bigram the model never saw is
    // the highest-loss (most informative) event for a quality filter —
    // it must score via smoothing (k / (c1 + kV), or 1/V for an unseen
    // prefix), not silently drop out of the average.
    val term = -log(
      (coalesce(col("c12"), lit(0L)) + lit(k)) /
        (coalesce(col("c1"), lit(0L)) + lit(k) * col("v")))
    scoreBg
      .join(c12, Seq("bg"), "left")
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        // Exact decimal sum (order-free), ONE double division at the
        // end — both engines perform the identical IEEE operation.
        (sum(term.cast("decimal(28,12)")).cast("double") /
          count(lit(1)).cast("double")).as("cross_entropy"))
      .withColumnRenamed("id", idCol)
  }
}
