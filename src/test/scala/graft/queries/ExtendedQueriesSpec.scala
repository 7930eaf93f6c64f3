package graft.queries

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Sanity for queries whose values can't be oracle-checked exactly. */
class ExtendedQueriesSpec extends SparkSpec with Matchers {

  test("approx sketches land near exact answers on sf0.001") {
    import org.apache.spark.sql.functions._
    val out = graft.SparkEntry.queries("q16_approx_sketches")(spark, sf())
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    val exact = QueryDef.table(spark, sf(), "orders")
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("cd"),
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    exact.foreach { case (prio, t) =>
      val (cd: Long, p50: Double, lo: Double, hi: Double) = t
      val (acd: Long, ap50: Double, n: Long) = out(prio)
      withClue(s"$prio: ") {
        math.abs(acd - cd).toDouble / cd.toDouble should be < 0.1
        ap50 should (be >= lo and be <= hi)
        math.abs(ap50 - p50) / p50 should be < 0.25
        n should be > 0L
      }
    }
  }
}
