package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Hash-sampling robustness beyond what the oracles cover: extreme and
  * negative keys (the 100 TB id space), and mixture rate semantics. */
class SamplingSpec extends SparkSpec with Matchers
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {

  test("hashBucket stays in range for huge and negative keys") {
    import spark.implicits._
    val keys = Seq(0L, 1L, 999999L, 4000000000L, Long.MaxValue, -1L, Long.MinValue + 1)
      .toDF("k")
    val rows = keys.select(col("k"), Sampling.hashBucket(col("k")).as("b")).collect()
    rows.foreach { r =>
      withClue(s"key ${r.getLong(0)}: ") {
        r.getLong(1) should (be >= 0L and be < 100L)
      }
    }
  }

  test("mixtureSample: rate 0 excludes a stratum entirely, rate 100 keeps it") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("k", "s")
    val kept = Sampling.mixtureSample(df, "k", "s", Map("a" -> 100, "b" -> 0))
      .collect().map(r => r.getString(1)).toSet
    kept shouldBe Set("a")
    Sampling.mixtureSample(df, "k", "s", Map("a" -> 100), defaultPct = 0).count() shouldBe 500L
  }

  test("deterministicSample keeps roughly pct% and is key-stable") {
    import spark.implicits._
    val df = (1L to 10000L).toDF("k")
    val s1 = Sampling.deterministicSample(df, "k", 10).collect().map(_.getLong(0)).toSet
    val s2 = Sampling.deterministicSample(df.repartition(13), "k", 10)
      .collect().map(_.getLong(0)).toSet
    s1 shouldBe s2
    s1.size.toDouble should (be > 700.0 and be < 1300.0)
  }

  test("temperatureSample: alpha=0 flattens strata toward uniform; alpha=1 preserves proportions") {
    import spark.implicits._
    // Heavily skewed strata: 1600 'big', 100 'small'.
    val df = ((1L to 1600L).map(i => (i, "big")) ++
      (10001L to 10100L).map(i => (i, "small"))).toDF("k", "s")
    def counts(alpha: Double, target: Long): Map[String, Long] =
      Sampling.temperatureSample(df, "k", "s", alpha, target)
        .groupBy("s").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    // alpha=0: both strata weighted equally → ~200 each from target=400;
    // 'small' (100 rows < its 200 quota) is kept whole, never upsampled.
    val flat = counts(0.0, 400)
    flat("small") shouldBe 100L
    flat("big").toDouble shouldBe 200.0 +- 60.0
    // alpha=1: proportional — 'big' keeps ~16× more than 'small'.
    val prop = counts(1.0, 400)
    (prop("big").toDouble / prop.getOrElse("small", 1L).toDouble) should be > 8.0
    // Deterministic under repartitioning.
    val a = Sampling.temperatureSample(df, "k", "s", 0.5, 400)
      .collect().map(_.getAs[Long]("k")).toSet
    val b = Sampling.temperatureSample(df.repartition(13), "k", "s", 0.5, 400)
      .collect().map(_.getAs[Long]("k")).toSet
    a shouldBe b
  }

  test("budgetSelect equals the naive global-window prefix and stays distributed") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 5000L).map(i => (i, i * 2654435761L % 997L, 1L + i % 37L))
      .toDF("k", "score", "cost")
    val budget = 20000L
    val got = Sampling.budgetSelect(df, "k", "score", "cost", budget, buckets = 16)
      .select("k", "cum_cost").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = df.withColumn("cum",
        sum(col("cost")).over(Window.orderBy(col("score").desc, col("k"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum") <= budget)
      .select("k", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe naive
    // Every kept row within budget; the selection is a maximal prefix.
    got.values.max should be <= budget
    // Scale shape: the DATA window partitions by bucket; the only
    // single-partition exchange feeds the 16-row bucket-totals window.
    // (Assert on the optimized plan text — AQE hides exchange nodes
    // from collect() on the executed root.)
    val planStr = Sampling.budgetSelect(df, "k", "score", "cost", budget, buckets = 16)
      .queryExecution.optimizedPlan.toString.toLowerCase
    // The running-sum window spec partitions by the bucket column.
    "windowspecdefinition\\(__graft_rb".r.findAllIn(planStr).size should be >= 1
  }

  test("budgetSelect: NULL-score rows are excluded and do not corrupt cum_cost") {
    import spark.implicits._
    val df = Seq(
      (1L, None: Option[Long], 1000L),  // null score, huge cost
      (2L, Option(5L), 10L),
      (3L, Option(4L), 10L)
    ).toDF("k", "score", "cost")
    val out = Sampling.budgetSelect(df, "k", "score", "cost", budget = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    out shouldBe Map(2L -> 10L, 3L -> 20L) // null row neither kept nor counted
  }

  test("temperatureSample: NULL strata are sampled, schema and column order preserved") {
    import spark.implicits._
    val df = ((1L to 200L).map(i => (i, Option("a"))) ++
      (201L to 400L).map(i => (i, None: Option[String]))).toDF("k", "s")
    val out = Sampling.temperatureSample(df, "k", "s", alpha = 1.0, targetRows = 400)
    out.columns.toSeq shouldBe Seq("k", "s") // no keep_rate leak, no reorder
    val by = out.collect().map(r => Option(r.getString(1)))
    by.count(_.isEmpty) shouldBe 200L // target >= n keeps ALL, null stratum included
    by.count(_.isDefined) shouldBe 200L
  }

  test("budgetSelect handles ties at the bucket boundary and empty input") {
    import spark.implicits._
    // All scores identical → one bucket; order falls to the key.
    val flat = (1L to 100L).map(i => (i, 5L, 10L)).toDF("k", "score", "cost")
    val kept = Sampling.budgetSelect(flat, "k", "score", "cost", budget = 250L)
      .collect().map(_.getLong(0)).sorted
    kept shouldBe (1L to 25L).toArray
    val empty = Seq.empty[(Long, Long, Long)].toDF("k", "score", "cost")
    Sampling.budgetSelect(empty, "k", "score", "cost", 10L).count() shouldBe 0L
  }

  test("exactNSample returns exactly n, deterministically, via TakeOrdered") {
    import spark.implicits._
    val df = (1L to 5000L).toDF("k")
    val a = Sampling.exactNSample(df, "k", 50).collect().map(_.getLong(0)).toSet
    val b = Sampling.exactNSample(df.repartition(11), "k", 50)
      .collect().map(_.getLong(0)).toSet
    a.size shouldBe 50
    a shouldBe b
    val plan = Sampling.exactNSample(df, "k", 50)
      .queryExecution.executedPlan.toString
    plan should include("TakeOrderedAndProject")
  }

  test("weightedSample: inclusion tracks weight, no replacement, deterministic") {
    import spark.implicits._
    // 500 light rows (w=1) + 500 heavy rows (w=50): the heavy half
    // must dominate a 200-row draw.
    val df = ((1L to 500L).map(i => (i, 1.0)) ++
      (1001L to 1500L).map(i => (i, 50.0))).toDF("k", "w")
    val a = Sampling.weightedSample(df, "k", "w", 200)
      .collect().map(_.getLong(0))
    a.length shouldBe 200
    a.distinct.length shouldBe 200 // without replacement
    a.count(_ > 1000L).toDouble should be > 150.0 // heavy rows dominate
    val b = Sampling.weightedSample(df.repartition(9), "k", "w", 200)
      .collect().map(_.getLong(0))
    b.sorted.toSeq shouldBe a.sorted.toSeq
    // non-positive and NULL weights are never drawn
    val withBad = df.union(Seq((9001L, 0.0), (9002L, -3.0)).toDF("k", "w"))
    Sampling.weightedSample(withBad, "k", "w", 2000)
      .collect().map(_.getLong(0)).filter(_ >= 9000L) shouldBe empty
  }

  test("weightedSample: priorities stay discriminative at huge weights") {
    import spark.implicits._
    // Weights ~1e8: the old powered-priority form collapsed u^(1/w)
    // into a handful of 9-dp ties, degenerating into key order. The
    // exponential-keys form must still track the (uniform) hash, not
    // the key: the drawn set must not be a key-ordered prefix.
    val df = (1L to 2000L).map(i => (i, 1e8 + (i % 7))).toDF("k", "w")
    val got = Sampling.weightedSample(df, "k", "w", 100)
      .collect().map(_.getLong(0)).sorted
    got.length shouldBe 100
    got.toSeq should not be (1L to 100L).toSeq // not a low-key prefix
    got.max should be > 1500L // draws reach the high-key tail
  }

  test("leakageSafeSplit keeps every cluster member in one split") {
    import spark.implicits._
    val docs = (1L to 400L).toDF("id")
    // clusters: ids 1..40 in 10 clusters of 4, rep = min member
    val clusters = (1L to 40L).map(i => (i, ((i - 1) / 4) * 4 + 1))
      .toDF("id", "cluster")
    val out = Sampling.leakageSafeSplit(docs, "id", clusters, trainPct = 80)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    out.length shouldBe 400
    // cluster-atomic, grouped by the CONSTRUCTED cluster (not the
    // output group_key — split is a function of group_key, so grouping
    // by it could never fail): every known 4-member cluster maps to
    // its rep's group key and one shared split.
    out.filter(_._1 <= 40).groupBy(r => ((r._1 - 1) / 4) * 4 + 1)
      .foreach { case (rep, members) =>
        members.length shouldBe 4
        members.map(_._2).toSet shouldBe Set(rep) // group_key == rep
        members.map(_._3).toSet.size shouldBe 1   // one split
      }
    // singletons keep their own id as group key
    out.filter(_._1 > 40).foreach { case (id, gk, _) => gk shouldBe id }
    // both splits are populated at 80/20-ish
    val evalFrac = out.count(_._3 == "eval").toDouble / 400
    evalFrac should (be > 0.1 and be < 0.35)
  }

  test("shuffleAssign: dense per-shard positions, partition-stable, no global window") {
    import spark.implicits._
    val df = (1L to 2000L).toDF("k")
    val a1 = Sampling.shuffleAssign(df, "k", shards = 8)
    val rows = a1.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.length shouldBe 2000
    // every shard's positions are exactly 1..n (a permutation address)
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      withClue(s"shard $shard: ") {
        rs.map(_._3).sorted.toSeq shouldBe (1L to rs.length).toSeq
      }
    }
    // reproducible under a different input partitioning
    val a2 = Sampling.shuffleAssign(df.repartition(13), "k", shards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    a2.sortBy(_._1).toSeq shouldBe rows.sortBy(_._1).toSeq
    // scale shape: the window runs per shard — no single-partition
    // exchange anywhere in the executed plan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    val plan = a1.queryExecution.executedPlan
    val single = plan.collect {
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition => e
    }
    single shouldBe empty
  }

  test("negativeSample: deterministic, in-range, never a positive of the same user") {
    import spark.implicits._
    val inter = Seq(
      (1L, 3L), (1L, 7L), (1L, 12L),
      (2L, 0L), (2L, 19L),
      (3L, 5L)).toDF("user_id", "item_id")
    val out = Sampling.negativeSample(inter, "user_id", "item_id", nItems = 20L, k = 4)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    val positives = Map(1L -> Set(3L, 7L, 12L), 2L -> Set(0L, 19L), 3L -> Set(5L))
    rows.foreach { case (u, _, idx, neg) =>
      neg should (be >= 0L and be < 20L)
      idx should (be >= 0 and be < 4)
      positives(u) should not contain neg
    }
    // at most k draws per interaction; some survive for every pair
    rows.groupBy(t => (t._1, t._2)).values.foreach(_.length should be <= 4)
    // deterministic: a second evaluation is identical
    val again = Sampling.negativeSample(inter, "user_id", "item_id", 20L, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    again.sorted.toSeq shouldBe rows.sorted.toSeq
    // scale shape: the anti-join is a real equi-join on narrow keys —
    // no cartesian / nested-loop anywhere in the executed plan.
    // collectWithSubqueries, NOT plan.collect: under AQE the executed
    // plan root is an AdaptiveSparkPlanExec LEAF and a plain collect
    // would assert vacuously on it. Also positively assert the join
    // operators we DO expect, so the probe can't silently match
    // nothing.
    val plan = out.queryExecution.executedPlan
    import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
    collectWithSubqueries(plan) { case j: BaseJoinExec => j } should not be empty
    collectWithSubqueries(plan) { case j: CartesianProductExec => j } shouldBe empty
    collectWithSubqueries(plan) { case j: BroadcastNestedLoopJoinExec => j } shouldBe empty
  }

  test("negativeSample: draws for one interaction are decorrelated, not an arithmetic progression") {
    import spark.implicits._
    val inter = Seq((11L, 2L)).toDF("user_id", "item_id")
    val negs = Sampling.negativeSample(inter, "user_id", "item_id", nItems = 1000L, k = 6)
      .orderBy("neg_idx").collect().map(_.getLong(3))
    negs.length should be >= 4
    // consecutive gaps mod nItems must NOT all be equal (the pre-mix
    // bug produced stride-69061 progressions)
    val gaps = negs.sliding(2).map(p => ((p(1) - p(0)) % 1000 + 1000) % 1000).toSeq
    gaps.distinct.size should be > 1
  }

  test("negativeSample: million-item catalog draws are in-range and decile-uniform") {
    import spark.implicits._
    val n = 1000000L
    val inter = (for (u <- 0L until 1000L; i <- 0L until 4L) yield (u, i * 7 + 1))
      .toDF("user_id", "item_id")
    val negs = Sampling.negativeSample(inter, "user_id", "item_id", nItems = n, k = 3)
      .select("neg_item").collect().map(_.getLong(0))
    negs.length should be >= 11000 // 12000 draws minus rare positive collisions
    negs.foreach(_ should (be >= 0L and be < n))
    // the old quadratic-residue draw capped the catalog at 10k ids —
    // the 64-bit draw must actually reach the upper catalog
    negs.count(_ >= 10000L) should be > negs.length / 2
    // decile frequencies uniform to ±10% (Poisson sd at ~1.2k/bucket is ~3%)
    val byDecile = negs.groupBy(v => v * 10 / n).map(_._2.length)
    val exp = negs.length / 10.0
    byDecile.foreach(c => math.abs(c - exp) / exp should be < 0.10)
  }

  test("negativeSample: catalog cap and non-castable keys fail fast") {
    import spark.implicits._
    val inter = Seq((1L, 2L)).toDF("user_id", "item_id")
    val e = intercept[IllegalArgumentException] {
      Sampling.negativeSample(inter, "user_id", "item_id",
        nItems = Sampling.MaxNegCatalog + 1, k = 1)
    }
    e.getMessage should include("catalog size")
    // the cap itself is accepted (the require is inclusive)
    Sampling.negativeSample(inter, "user_id", "item_id",
      nItems = Sampling.MaxNegCatalog, k = 1).count() shouldBe 1L
    // Non-castable key fails fast on EITHER path: under ANSI (Spark 4
    // default) the cast itself throws CAST_INVALID_INPUT; under
    // non-ANSI the longKey raise_error guard fires ("not castable").
    val bad = Seq(("u-1", 2L)).toDF("user_id", "item_id")
    val err = intercept[Exception] {
      Sampling.negativeSample(bad, "user_id", "item_id", nItems = 100L, k = 1).collect()
    }
    err.getMessage.toLowerCase should include("cast")
  }

  test("temporalSplit: boundaries are half-open, embargo absorbs the gap and NULL ts") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-12 00:00:00")
    val rows = Seq(
      ("a", Option(java.sql.Timestamp.valueOf("2024-01-09 23:59:59"))), // train
      ("b", Option(t0)),                                                // embargo (ts == trainEnd)
      ("c", Option(java.sql.Timestamp.valueOf("2024-01-11 12:00:00"))), // embargo
      ("d", Option(t1)),                                                // eval (ts == evalStart)
      ("e", None))                                                      // NULL ts -> embargo
      .toDF("entity", "ts")
    val out = Sampling.temporalSplit(rows, "entity", "ts", lit(t0), lit(t1))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    out shouldBe Map("a" -> "train", "b" -> "embargo", "c" -> "embargo",
      "d" -> "eval", "e" -> "embargo")
  }

  test("temporalSplit: coldStartEval purges eval rows of train-seen entities only") {
    import spark.implicits._
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    val rows = Seq(
      ("u1", ts(2)), ("u1", ts(20)), // seen in train -> eval row purged
      ("u2", ts(20)),                // cold entity -> eval survives
      ("u3", ts(9)))                 // embargo only -> NOT a train sighting
      .toDF("entity", "ts")
    val out = Sampling.temporalSplit(rows, "entity", "ts",
      lit(ts(8)), lit(ts(10)), coldStartEval = true)
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getString(2)))
    out.toSet shouldBe Set(
      ("u1", ts(2), "train"), ("u1", ts(20), "purged"),
      ("u2", ts(20), "eval"), ("u3", ts(9), "embargo"))
    // no silent drops: every input row comes back labeled
    out.length shouldBe 4
  }

  test("temporalSplit: inverted bounds fail fast instead of mislabeling the overlap") {
    import spark.implicits._
    val rows = Seq(("a", java.sql.Timestamp.valueOf("2024-01-11 00:00:00")))
      .toDF("entity", "ts")
    val err = intercept[Exception] {
      Sampling.temporalSplit(rows, "entity", "ts",
        lit(java.sql.Timestamp.valueOf("2024-01-12 00:00:00")),   // trainEnd
        lit(java.sql.Timestamp.valueOf("2024-01-10 00:00:00")))   // evalStart < trainEnd
        .collect()
    }
    err.getMessage should include("temporalSplit")
  }
}
