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

  test("funnel: strictly-ordered steps, dropouts null from the missed step on") {
    import spark.implicits._
    def ev(u: Long, ty: String, hm: String) = (u, ty, t(s"2024-01-01 $hm:00"))
    val events = Seq(
      // user 1: full funnel in order
      ev(1L, "view", "09:00"), ev(1L, "click", "09:05"), ev(1L, "purchase", "09:30"),
      // user 2: clicks BEFORE the first view — click doesn't count; no purchase
      ev(2L, "click", "08:00"), ev(2L, "view", "08:30"),
      // user 3: purchase before the qualifying click — purchase must not count
      ev(3L, "view", "10:00"), ev(3L, "purchase", "10:10"), ev(3L, "click", "10:20"),
      // user 4: never views (absent from output despite click+purchase)
      ev(4L, "click", "11:00"), ev(4L, "purchase", "11:30")
    ).toDF("user", "event_type", "ts")
    val out = Sessionize.funnel(events, "user", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        (r.getTimestamp(1), Option(r.getTimestamp(2)), Option(r.getTimestamp(3)))).toMap
    out.keySet shouldBe Set(1L, 2L, 3L)
    out(1L) shouldBe ((t("2024-01-01 09:00:00"),
      Some(t("2024-01-01 09:05:00")), Some(t("2024-01-01 09:30:00"))))
    out(2L) shouldBe ((t("2024-01-01 08:30:00"), None, None))
    out(3L) shouldBe ((t("2024-01-01 10:00:00"),
      Some(t("2024-01-01 10:20:00")), None))
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
