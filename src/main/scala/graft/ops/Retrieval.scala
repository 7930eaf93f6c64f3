package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval over the corpus — the BM25 scoring a
  * training-data pipeline uses for decontamination probes, quality
  * probes ("does this document answer common queries"), and as the
  * lexical arm of hybrid (BM25 + dense) retrieval next to
  * [[Similarity]]'s ANN arm.
  *
  * Scale shape: the query term set is filtered IMMEDIATELY after the
  * token explode — before any shuffle — so the per-term aggregations
  * run over only rows matching the (tiny) query vocabulary, not the
  * corpus vocabulary. Document length rides along with the exploded
  * terms, so no second join against a per-document table is needed.
  * The per-term statistics table is |query|-sized and broadcasts; the
  * final top-k compiles to TakeOrderedAndProject (no global sort).
  */
object Retrieval {

  /** Okapi BM25 top-k: score every document containing at least one of
    * `queryTerms` and return the `k` best as (doc id, n_hit_terms,
    * score), ties broken by id. `k1`/`b` are the standard saturation /
    * length-normalization knobs; IDF is the Lucene-style
    * `ln(1 + (N - df + 0.5)/(df + 0.5))` (never negative).
    *
    * Corpus statistics (N, avg doc length) are a single 1-row driver
    * aggregate embedded as literals — the same index-build pattern as
    * the PIT join's bounds and tf-idf's N (index metadata, not a
    * per-row dependency).
    */
  def bm25TopK(
      df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && k > 0)
    // Tokenization feeds BOTH the corpus-stats aggregate and the
    // scoring explode — materialized once (lazily) instead of running
    // the normalize/split projection over the corpus twice.
    val docs = OpsUtil.widen(df)
      .select(col(idCol),
        TextOps.tokens(TextOps.normalized(col(textCol))).as("__graft_ws"))
      .select(col(idCol), col("__graft_ws"),
        size(col("__graft_ws")).cast("long").as("dl"))
      .localCheckpoint(false)
    // One tiny aggregate: corpus size + total token count (exact — a
    // long sum), from which avgdl derives; embedded as plan literals.
    val statsRow = docs.agg(count(lit(1)), sum(col("dl"))).head()
    val nDocs = statsRow.getLong(0)
    // Empty corpus → no hits anyway; any avgdl avoids the 0/0 NaN.
    val avgdl = if (nDocs == 0) 1.0 else statsRow.getLong(1).toDouble / nDocs.toDouble
    // Explode → filter to the query vocabulary BEFORE any shuffle: the
    // scan emits only (id, dl, matching term) rows.
    val hits = docs
      .select(col(idCol), col("dl"), explode(col("__graft_ws")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
    val tf = hits.groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // Per-term document frequency: |query|-row table, broadcast join.
    val dfTab = tf.groupBy(col("term")).agg(count(lit(1)).as("term_df"))
    val idf = log(lit(1.0) +
      (lit(nDocs.toDouble) - col("term_df") + 0.5) / (col("term_df") + 0.5))
    val termScore = idf * (col("tf") * (lit(k1) + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / avgdl))
    // Rank on the 6-dp-rounded score: the raw double sum is sensitive
    // to addition order in its last bits, and a rank boundary between
    // two near-tied documents must fall identically in every engine.
    tf.join(broadcast(dfTab), Seq("term"))
      .withColumn("term_score", termScore)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hit_terms"),
        round(sum(col("term_score")), 6).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** Batch BM25: score a whole QUERY TABLE (query_id, query_text) in
    * one plan — the serving shape for decontamination probes and eval
    * retrieval, where thousands of queries amortize a single corpus
    * scan. Per-term statistics are computed once (they are
    * query-independent); each query then reduces over its own term
    * subset. Output: (query_id, doc, n_hit_terms, score, rank ≤ k).
    *
    * Scale shape: the query table is tiny by definition — its exploded
    * (query_id, term) set broadcasts twice (scan-side vocabulary
    * filter, per-query reduction); the corpus cost is one tokenize +
    * explode + two map-side-combined aggs regardless of query count.
    * The per-query top-k windows partition by query_id (parallel
    * across queries, never a global sort). */
  def bm25TopKBatch(
      df: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0)
    val docs = OpsUtil.widen(df)
      .select(col(idCol),
        TextOps.tokens(TextOps.normalized(col(textCol))).as("__graft_ws"))
      .select(col(idCol), col("__graft_ws"),
        size(col("__graft_ws")).cast("long").as("dl"))
      .localCheckpoint(false)
    val statsRow = docs.agg(count(lit(1)), sum(col("dl"))).head()
    val nDocs = statsRow.getLong(0)
    val avgdl = if (nDocs == 0) 1.0 else statsRow.getLong(1).toDouble / nDocs.toDouble
    val qTerms = queries.select(col(queryIdCol).as("query_id"),
        explode(TextOps.tokens(TextOps.normalized(col(queryTextCol)))).as("term"))
      .distinct()
    val vocab = qTerms.select("term").distinct()
    val hits = docs
      .select(col(idCol), col("dl"), explode(col("__graft_ws")).as("term"))
      .join(broadcast(vocab), Seq("term")) // scan-side vocabulary prune
    val tf = hits.groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfTab = tf.groupBy(col("term")).agg(count(lit(1)).as("term_df"))
    val idf = log(lit(1.0) +
      (lit(nDocs.toDouble) - col("term_df") + 0.5) / (col("term_df") + 0.5))
    val termScore = idf * (col("tf") * (lit(k1) + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / avgdl))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("score"), col(idCol))
    tf.join(broadcast(dfTab), Seq("term"))
      .withColumn("term_score", termScore)
      .join(broadcast(qTerms), Seq("term"))
      .groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).as("n_hit_terms"),
        round(sum(col("term_score")), 6).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
