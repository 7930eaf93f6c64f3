package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class SessionizeSpec extends SparkSpec with Matchers {

  test("retentionCohorts: cohort by first-activity week, distinct users per cell") {
    import spark.implicits._
    // week of 2024-01-01 is a Monday — cohort boundaries land exactly
    val rows = Seq(
      (1L, "2024-01-01 10:00:00"), // u1 cohort w0
      (1L, "2024-01-03 10:00:00"), // same week → same cell
      (1L, "2024-01-09 10:00:00"), // w0 cohort active in w1
      (2L, "2024-01-02 10:00:00"), // u2 cohort w0
      (2L, "2024-01-16 10:00:00"), // w0 cohort active in w2
      (3L, "2024-01-10 10:00:00")  // u3 cohort w1, never returns
    ).toDF("user_id", "s").select(col("user_id"), to_timestamp(col("s")).as("ts"))
    val out = Sessionize.retentionCohorts(rows, "user_id", "ts")
      .collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1)) -> r.getLong(2))
      .toMap
    out shouldBe Map(
      ("2024-01-01", 0L) -> 2L, // u1+u2 in their own week
      ("2024-01-01", 1L) -> 1L, // u1 returned in week 1
      ("2024-01-01", 2L) -> 1L, // u2 returned in week 2
      ("2024-01-08", 0L) -> 1L) // u3's own cohort
  }

  test("retentionCohorts: offset 0 cell equals cohort size") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (1 to 300).map { i =>
      val u = (i % 40).toLong
      val day = rnd.nextInt(28)
      (u, f"2024-01-${day + 1}%02d 12:00:00")
    }.toDF("user_id", "s").select(col("user_id"), to_timestamp(col("s")).as("ts"))
    val out = Sessionize.retentionCohorts(rows, "user_id", "ts")
    val cohortSizes = out.filter(col("week_offset") === 0)
      .agg(sum(col("n_users"))).head().getLong(0)
    cohortSizes shouldBe 40L // every user appears in exactly one offset-0 cell
    // no cell can exceed its cohort's size
    val byCohort = out.collect()
      .groupBy(_.getTimestamp(0)).view.mapValues { rs =>
        val size = rs.find(_.getLong(1) == 0L).map(_.getLong(2)).getOrElse(0L)
        rs.forall(_.getLong(2) <= size)
      }
    byCohort.values.foreach(_ shouldBe true)
  }
}
