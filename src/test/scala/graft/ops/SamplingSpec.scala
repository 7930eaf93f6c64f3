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
}
