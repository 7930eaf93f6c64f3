package graft.sources

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Co-located joins: two tables bucketed on the join key must join
  * with NO Exchange (shuffle) in the physical plan, with results
  * identical to the plain join. */
class BucketedTablesSpec extends SparkSpec with Matchers {

  test("join of co-bucketed tables is shuffle-free and correct") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    val facts = (1L to 5000L).map(i => (i % 97, i, i * 2.5)).toDF("k", "fact_id", "v")
    val dims = (0L until 97L).map(k => (k, s"dim_$k")).toDF("k", "name")

    BucketedTables.writeBucketed(facts, "graft_facts_b", s"$dir/facts", Seq("k"), 8)
    BucketedTables.writeBucketed(dims, "graft_dims_b", s"$dir/dims", Seq("k"), 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val f = BucketedTables.table(spark, "graft_facts_b")
      val d = BucketedTables.table(spark, "graft_dims_b")
      val joined = f.join(d, "k")

      val exchanges = joined.queryExecution.executedPlan.collect { case e: Exchange => e }
      exchanges shouldBe empty // bucketing replaced the shuffle

      val got = joined.select("k", "fact_id", "name").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
      val plain = facts.join(dims, "k").select("k", "fact_id", "name").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
      got shouldBe plain

      // and a bucketed-key aggregation is shuffle-free too
      val agg = f.groupBy("k").agg(sum("v"))
      agg.queryExecution.executedPlan.collect { case e: Exchange => e } shouldBe empty
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_facts_b")
      spark.sql("DROP TABLE IF EXISTS graft_dims_b")
    }
  }
}
