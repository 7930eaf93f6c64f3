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
}
