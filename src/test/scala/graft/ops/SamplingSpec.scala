package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Hash-sampling robustness beyond what the oracles cover: extreme and
  * negative keys (the 100 TB id space), and mixture rate semantics. */
class SamplingSpec extends SparkSpec with Matchers {

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
}
