package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Relational logistic-regression training: learning, calibration
  * direction, determinism, and the no-feature edge case. */
class ClassifierSpec extends SparkSpec with Matchers {

  private def corpus = {
    import spark.implicits._
    // Two disjoint vocabularies: positives speak alpha/beta,
    // negatives speak gamma/delta.
    ((1 to 20).map(i => (i.toLong, "alpha beta alpha", 1)) ++
      (21 to 40).map(i => (i.toLong, "gamma delta gamma", 0)))
      .toDF("id", "text", "y")
  }

  test("separable classes separate after two GD steps") {
    val out = Classifier.trainScoreLogistic(
      corpus, "id", "text", col("y") === 1, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val pos = out.filter(_._2 == 1).map(_._3)
    val neg = out.filter(_._2 == 0).map(_._3)
    pos.min should be > neg.max      // perfect ordering on disjoint vocab
    pos.head should be > 0.5         // calibrated direction
    neg.head should be < 0.5
  }

  test("train/save/load/score path reproduces trainScoreLogistic bit-for-bit") {
    val endToEnd = Classifier.trainScoreLogistic(
      corpus, "id", "text", col("y") === 1, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val w = Classifier.trainLogistic(corpus, "id", "text", col("y") === 1, iters = 2)
    val path = "/tmp/graft-clf-spec-weights"
    Classifier.saveWeights(w, path)
    val served = Classifier.scoreLogistic(
      corpus, "id", "text", Classifier.loadWeights(spark, path))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    served shouldBe endToEnd // exact double equality — same decimal sums
    // frozen weights score UNSEEN docs from the learned vocabulary
    import spark.implicits._
    val unseen = Seq((100L, "alpha beta"), (101L, "gamma delta"),
      (102L, "omega")).toDF("id", "text") // omega: out-of-vocab → dropped
    val inf = Classifier.scoreLogistic(
      unseen, "id", "text", Classifier.loadWeights(spark, path))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    inf.keySet shouldBe Set(100L, 101L)
    inf(100L) should be > 0.5
    inf(101L) should be < 0.5
  }

  test("training is partitioning-invariant (decimal-pinned intermediates)") {
    val a = Classifier.trainScoreLogistic(corpus, "id", "text", col("y") === 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val b = Classifier.trainScoreLogistic(
      corpus.repartition(7), "id", "text", col("y") === 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    a shouldBe b
  }

  test("more iterations sharpen a separable fit") {
    def spread(iters: Int): Double = {
      val out = Classifier.trainScoreLogistic(
        corpus, "id", "text", col("y") === 1, iters = iters)
        .collect().map(r => (r.getInt(1), r.getDouble(2)))
      out.filter(_._1 == 1).map(_._2).min - out.filter(_._1 == 0).map(_._2).max
    }
    spread(3) should be > spread(1)
  }

  test("every weight-table join broadcasts — no sort-merge join in the plan") {
    val df = Classifier.trainScoreLogistic(corpus, "id", "text", col("y") === 1)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  test("empty-text documents are dropped, not scored") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta", 1), (2L, "", 0), (3L, "gamma", 0))
      .toDF("id", "text", "y")
    val ids = Classifier.trainScoreLogistic(df, "id", "text", col("y") === 1)
      .collect().map(_.getLong(0)).toSet
    ids shouldBe Set(1L, 3L)
  }
}
