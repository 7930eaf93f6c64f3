package graft.join

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.ops.Sessionize

case class Tick(id: Long, user: Long, ts: Timestamp)

class IntervalJoinSpec extends SparkSpec with Matchers {

  private def t(s: String) = Timestamp.valueOf(s)

  private def ticks = {
    import spark.implicits._
    Seq(
      Tick(1, 1, t("2024-01-01 10:00:00")),
      Tick(2, 1, t("2024-01-01 10:10:00")),
      Tick(3, 1, t("2024-01-01 11:30:00")),
      Tick(4, 2, t("2024-01-01 10:05:00")),
      Tick(5, 2, t("2024-01-02 09:00:00")),
      Tick(6, 3, t("2024-01-01 10:00:00"))).toDF()
  }

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    val a = df.select(col("id").as("a_id"), col("user").as("a_user"), col("ts").as("a_ts"))
    val b = ticks.select(col("id").as("b_id"), col("user").as("b_user"), col("ts").as("b_ts"))
    IntervalJoin.join(a, "a_ts", b, "b_ts", Seq("a_user" -> "b_user"), 0L, 1800L)
      .filter(col("a_id") =!= col("b_id"))
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
  }

  test("keyed interval join: only same-user pairs within the window") {
    pairs(ticks) shouldBe Set((1L, 2L)) // 10 min apart; 3 is 80 min after 2
  }

  test("joinBinned gives exactly the same pairs as the plain range join") {
    val a = ticks.select(col("id").as("a_id"), col("user").as("a_user"), col("ts").as("a_ts"))
    val b = ticks.select(col("id").as("b_id"), col("user").as("b_user"), col("ts").as("b_ts"))
    def collectPairs(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("a_id") =!= col("b_id"))
        .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val plain = collectPairs(
      IntervalJoin.join(a, "a_ts", b, "b_ts", Seq("a_user" -> "b_user"), 0L, 1800L))
    val binned = collectPairs(
      IntervalJoin.joinBinned(a, "a_ts", b, "b_ts", Seq("a_user" -> "b_user"), 0L, 1800L))
    binned shouldBe plain
    // and a window with a negative lower bound (symmetric ±30 min)
    val plainSym = collectPairs(
      IntervalJoin.join(a, "a_ts", b, "b_ts", Seq("a_user" -> "b_user"), -1800L, 1800L))
    val binnedSym = collectPairs(
      IntervalJoin.joinBinned(a, "a_ts", b, "b_ts", Seq("a_user" -> "b_user"), -1800L, 1800L))
    binnedSym shouldBe plainSym
    plainSym should contain((2L, 1L)) // symmetric window includes the reverse pair
  }

  test("sessionize: gap threshold splits sessions; counts and bounds correct") {
    val out = Sessionize.sessionStats(ticks, "user", "ts", "id", gapSec = 1800L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getTimestamp(3), r.getTimestamp(4))).toMap
    out(1L -> 1L) shouldBe ((2L, t("2024-01-01 10:00:00"), t("2024-01-01 10:10:00")))
    out(1L -> 2L) shouldBe ((1L, t("2024-01-01 11:30:00"), t("2024-01-01 11:30:00")))
    out(2L -> 1L)._1 shouldBe 1L
    out(2L -> 2L)._1 shouldBe 1L
    out(3L -> 1L)._1 shouldBe 1L
  }
}
