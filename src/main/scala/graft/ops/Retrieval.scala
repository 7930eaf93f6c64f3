package graft.ops

import org.apache.spark.sql.DataFrame
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
}
