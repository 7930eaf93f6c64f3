package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of the same user belong
  * to one session while the inter-event gap stays within `gapSec`; a
  * larger gap starts a new session. The classic two-window formulation:
  * flag rows whose gap from the previous event exceeds the threshold,
  * then running-sum the flags to number sessions. One shuffle
  * (partition by user); sessions never span partitions because the
  * partition key IS the user.
  */
object Sessionize {

  /** Adds `session_idx` (1-based per user, in time order). Ordering is
    * total via `(tsCol, tieBreakCol)` so results are deterministic under
    * equal timestamps. */
  def withSessionIdx(
      df: DataFrame, userCol: String, tsCol: String, tieBreakCol: String,
      gapSec: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieBreakCol))
    val prevTs = lag(col(tsCol), 1).over(w)
    val newSession = when(
      prevTs.isNull ||
        col(tsCol).cast("double") - prevTs.cast("double") > gapSec, 1L)
      .otherwise(0L)
    df.withColumn("session_idx",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session aggregate: bounds, event count, summed value. */
  def sessionStats(
      df: DataFrame, userCol: String, tsCol: String, tieBreakCol: String,
      gapSec: Long): DataFrame =
    withSessionIdx(df, userCol, tsCol, tieBreakCol, gapSec)
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))

  /** Ordered conversion funnel: for each key, the earliest completion
    * time of every step, where step i+1 must occur STRICTLY AFTER the
    * key's earliest completion of step i (the standard product-funnel
    * definition; a key that never reaches step i has NULL from there
    * on). One row per key that completed step 1, with t1..tN columns.
    *
    * Scale shape: one filtered aggregate for step 1, then per step one
    * left join + regroup — every shuffle is on the narrow key column,
    * the per-step event subsets are type-filtered at the scan
    * (pushdown), and no window over the full event stream exists. N is
    * the funnel length (small, fixed), not data-dependent. */
  def funnel(
      df: DataFrame, keyCol: String, typeCol: String, tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var acc = df.filter(col(typeCol) === steps.head)
      .groupBy(col(keyCol).as("key"))
      .agg(min(col(tsCol)).as("t1"))
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      val nxt = df.filter(col(typeCol) === st)
        .select(col(keyCol).as("key"), col(tsCol).as("__graft_ts"))
      val groupCols = col("key") +: (1 to i).map(j => col(s"t$j"))
      acc = acc.join(nxt, Seq("key"), "left")
        .groupBy(groupCols: _*)
        .agg(min(when(col("__graft_ts") > col(s"t$i"), col("__graft_ts")))
          .as(s"t${i + 1}"))
    }
    acc.withColumnRenamed("key", keyCol)
  }

  /** Weekly retention cohorts: users cohort by the ISO week of their
    * FIRST event; every (cohort, activity week) cell counts the
    * cohort's users active that week — the standard retention triangle
    * a product/engagement pipeline derives from the event stream.
    * Output: (cohort_week, week_offset, n_users), offset 0 = the
    * cohort's own week (n_users there = cohort size).
    *
    * Scale shape: one groupBy(user) for first-activity (map-side
    * combined min), one equi-join back on the unique user key
    * (skew-free — each user joins its single cohort row), one
    * distinct-user aggregate per cell. date_trunc('week') is
    * ISO-Monday in Spark and DuckDB alike, so the cells mirror into
    * SQL exactly. */
  def retentionCohorts(
      df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val weeks = df.select(col(userCol).as("u"),
      date_trunc("week", col(tsCol)).as("w"))
    val cohorts = weeks.groupBy(col("u")).agg(min(col("w")).as("cohort_week"))
    weeks.join(cohorts, Seq("u"))
      // DAY difference, not epoch-second difference: both instants are
      // local Monday-midnights, so under a DST-shifting session
      // timezone their second gap is 604800 ± 3600 and epoch division
      // would misplace post-transition weeks; calendar datediff is
      // exactly 7·k days in any timezone.
      .groupBy(col("cohort_week"),
        floor(datediff(to_date(col("w")), to_date(col("cohort_week"))) / 7)
          .cast("long").as("week_offset"))
      .agg(count_distinct(col("u")).as("n_users"))
  }
}
