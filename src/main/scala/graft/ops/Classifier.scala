package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine quality classifier: logistic regression over hashed
  * binary token-bucket features (the fastText-style quality /
  * language / domain scorer of a pre-training pipeline), trained by
  * full-batch gradient descent expressed ENTIRELY as relational
  * operators — no driver-side math, no model library.
  *
  * Features are md5-prefix buckets (16^hexChars of them, same portable
  * scheme as [[CorpusOps.dsirLogWeights]]), binary per document. Each
  * GD iteration is: score = Σ w(b) over the document's buckets →
  * p = σ(score) → per-bucket gradient Σ (y − p) → weight update
  * w += lr·grad/N. Intermediates are pinned to 6-dp DECIMAL at every
  * step, so training is partition-invariant and engine-reproducible
  * (double math happens only inside a round(…, 6)).
  *
  * Scale shape: the feature frame (doc, bucket) is materialized once
  * and reused by every iteration; the weight table is ≤ 16^hexChars
  * rows — broadcast-hinted while that bound is driver-sized
  * (hexChars ≤ 4), AQE-chosen above it — so each iteration costs one
  * broadcast join + per-doc hash-agg and one per-bucket hash-agg
  * (both map-side combined). N is a 1-value driver aggregate (index
  * metadata). Iterations unroll into one lazy plan.
  */
object Classifier {

  private def sigmoid6(s: Column): Column =
    round(lit(1.0) / (lit(1.0) + exp(-s.cast("double"))), 6)
      .cast("decimal(28,6)")

  // "Broadcast by construction" only holds while 16^hexChars is
  // driver-sized: at hexChars ≥ 5 the weight table is bounded by
  // min(vocab, ≥1M) rows and a FORCED broadcast can OOM the driver —
  // past that, leave strategy choice to AQE (the join stays a plain
  // equi-join on `b`).
  private def weightHint(hexChars: Int): DataFrame => DataFrame =
    if (hexChars <= 4) broadcast(_) else identity

  /** Binary features: DISTINCT (doc, [label,] bucket) — THE single
    * copy of the feature extraction, shared by training (label
    * present) and inference ([[scoreLogistic]], label absent) so the
    * tokenize→md5-bucket pipeline cannot drift one-sided. Callers that
    * read it more than once (the GD loop: scoring + gradient per
    * iteration) add their own localCheckpoint. */
  private def featurize(
      df: DataFrame, idCol: String, textCol: String, label: Option[Column],
      hexChars: Int): DataFrame = {
    val tokens = OpsUtil.widen(df)
      .select(col(idCol) +: label.map(_.cast("int").as("y")).toSeq :+
        explode(TextOps.tokens(TextOps.normalized(col(textCol)))).as("tk"): _*)
      .filter(col("tk") =!= "") // empty text → [""] under split; not a feature
    tokens
      .select(col(idCol) +: label.map(_ => col("y")).toSeq :+
        substring(md5(col("tk")), 1, hexChars).as("b"): _*)
      .distinct()
  }

  /** The full-batch GD loop over a featurized frame → final weight
    * table (b, w). THE single copy of the training arithmetic: both
    * train entry points call this, so train/serve parity cannot drift
    * through a one-sided edit. */
  private def gdWeights(
      feats: DataFrame, idCol: String, hexChars: Int,
      iters: Int, lr: Double): DataFrame = {
    val hintW = weightHint(hexChars)
    val nDocs = feats.select(col(idCol)).distinct().count()
    require(nDocs > 0, "empty corpus")
    var w = feats.select(col("b")).distinct()
      .withColumn("w", lit(0).cast("decimal(28,6)"))
    for (_ <- 1 to iters) {
      val scored = feats.join(hintW(w), Seq("b"))
        .groupBy(col(idCol), col("y"))
        .agg(sum(col("w")).as("s"))
        .withColumn("p", sigmoid6(col("s")))
        .withColumn("r", col("y").cast("decimal(28,6)") - col("p"))
      val grad = feats
        .join(scored.select(col(idCol), col("r")), Seq(idCol))
        .groupBy(col("b"))
        .agg(sum(col("r")).as("g"))
      w = w.join(grad, Seq("b"))
        .withColumn("w",
          col("w") + round(lit(lr) * col("g").cast("double") / nDocs, 6)
            .cast("decimal(28,6)"))
        .select("b", "w")
    }
    w
  }

  /** Train `iters` full-batch GD steps on (`labelCol` ∈ {0,1}) and
    * score every document with the final weights. Output:
    * (id, label, score) — score is the 6-dp calibrated probability.
    * Documents with no tokens carry no features and are dropped
    * (unclassifiable by a bag-of-buckets model).
    */
  def trainScoreLogistic(
      df: DataFrame, idCol: String, textCol: String, labelCol: Column,
      hexChars: Int = 2, iters: Int = 2, lr: Double = 0.5): DataFrame = {
    require(hexChars >= 1 && hexChars <= 8 && iters >= 1)
    val feats = featurize(df, idCol, textCol, Some(labelCol), hexChars)
      .localCheckpoint(false)
    val w = gdWeights(feats, idCol, hexChars, iters, lr)
    feats.join(weightHint(hexChars)(w), Seq("b"))
      .groupBy(col(idCol), col("y"))
      .agg(sum(col("w")).as("s"))
      .select(col(idCol), col("y").as("label"),
        sigmoid6(col("s")).cast("double").as("score"))
  }

  /** Train and return the WEIGHT TABLE (b, w) instead of scores — the
    * fit-once half of fit-once/serve-many (the [[graft.ops.Similarity.AnnIndex]]
    * pattern for the classifier): a production pipeline trains on a
    * labeled slice, persists the weights ([[saveWeights]]), and scores
    * arbitrary unlabeled corpora later with [[scoreLogistic]]. Same
    * relational GD loop as [[trainScoreLogistic]] — literally [[gdWeights]],
    * not a copy — so that op's final scoring over these exact weights
    * reproduces its output bit-for-bit (spec-asserted). */
  def trainLogistic(
      df: DataFrame, idCol: String, textCol: String, labelCol: Column,
      hexChars: Int = 2, iters: Int = 2, lr: Double = 0.5): DataFrame = {
    require(hexChars >= 1 && hexChars <= 8 && iters >= 1)
    gdWeights(
      featurize(df, idCol, textCol, Some(labelCol), hexChars)
        .localCheckpoint(false),
      idCol, hexChars, iters, lr)
  }

  /** Inference-only scoring with a frozen weight table — the
    * serve-many half: no labels needed, no training jobs, one
    * (hint-gated) weight join + per-doc hash-agg over any corpus.
    * Output (id, score); documents with no in-vocabulary feature are
    * dropped, exactly as in training. A document's score over the
    * SAME corpus/weights equals [[trainScoreLogistic]]'s (the per-doc
    * feature set distinct (id, b) sums the same weights). */
  def scoreLogistic(
      df: DataFrame, idCol: String, textCol: String, weights: DataFrame,
      hexChars: Int = 2): DataFrame = {
    require(hexChars >= 1 && hexChars <= 8)
    featurize(df, idCol, textCol, None, hexChars) // single consumer — no checkpoint
      .join(weightHint(hexChars)(
        weights.select(col("b"), col("w").cast("decimal(28,6)"))), Seq("b"))
      .groupBy(col(idCol))
      .agg(sum(col("w")).as("s"))
      .select(col(idCol), sigmoid6(col("s")).cast("double").as("score"))
  }

  /** Persist a weight table as parquet — engine-agnostic, diffable,
    * versionable beside the corpus it scores (the saveIndex pattern). */
  def saveWeights(weights: DataFrame, path: String): Unit =
    weights.select(col("b"), col("w").cast("decimal(28,6)"))
      .repartition(1).write.mode("overwrite").parquet(path)

  /** Load a persisted weight table (inverse of [[saveWeights]]). */
  def loadWeights(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select(col("b"), col("w"))
}
