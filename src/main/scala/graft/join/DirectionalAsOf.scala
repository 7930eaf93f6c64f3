package graft.join

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Directional as-of joins: the forward ("first event at-or-after") and
  * nearest ("closest event within a tolerance") siblings of the
  * backward point-in-time join in [[PointInTimeJoin]].
  *
  * The reference's retrieval contract (Feast `get_historical_features`,
  * invoked at `/root/reference/feast_component/executor.py:87`) is
  * strictly backward-looking; label construction for training data
  * needs the forward direction ("what did the user do AFTER the
  * snapshot") and sensor/log alignment needs nearest-within-tolerance —
  * both standard as-of variants (pandas `merge_asof(direction=
  * 'forward'|'nearest')`, DuckDB `ASOF JOIN` is backward-only too).
  *
  * Scale posture (100 TB):
  *   - The horizon/tolerance bound is REQUIRED, not optional: it is what
  *     keeps the candidate join linear (each entity row admits a bounded
  *     time slice of the view) and it prunes the view scan to
  *     `[min(entityTs), max(entityTs) + horizon]` via one 2-value
  *     driver aggregate — the same bounded-scan pattern as the PIT
  *     join's TTL pruning.
  *   - Reduction is `min(struct(orderKey…, features…))` per spine row:
  *     map-side partial aggregation, one shuffle of pre-combined rows,
  *     no window sort. Spine ids are unique so the shuffle cannot skew.
  *   - Unmatched spine rows come back NULL via a left stitch join on
  *     the unique row id (never by re-joining the raw entity).
  */
object DirectionalAsOf {

  private val RowId = "__graft_asof_row_id"
  private val Vts = "__graft_asof_view_ts"
  private val Packed = "__graft_asof_packed"

  /** For each entity row, the EARLIEST view row with
    * `viewTs in [entityTs, entityTs + horizonSeconds]` (both inclusive).
    * Ties on `viewTs` break on least feature values, in `features`
    * order. Unmatched rows keep NULL features (left semantics).
    *
    * @param rowIdCol a column of `entity` unique per row (stitch key)
    * @param keepViewTs when true, emit the matched view timestamp as
    *                   an output column named after `viewTs`
    */
  def forward(
      entity: DataFrame, entityTs: String,
      view: DataFrame, viewTs: String,
      joinKeys: Seq[(String, String)],
      features: Seq[String],
      horizonSeconds: Long,
      rowIdCol: String,
      keepViewTs: Boolean = false): DataFrame =
    directional(entity, entityTs, view, viewTs, joinKeys, features,
      horizonSeconds, rowIdCol, keepViewTs, nearestMode = false)

  /** For each entity row, the view row with the smallest
    * `|viewTs - entityTs|`, admitted only within `toleranceSeconds`
    * either side. Ties (equidistant past/future) prefer the EARLIER
    * view row, then least feature values. Unmatched rows keep NULL
    * features. */
  def nearest(
      entity: DataFrame, entityTs: String,
      view: DataFrame, viewTs: String,
      joinKeys: Seq[(String, String)],
      features: Seq[String],
      toleranceSeconds: Long,
      rowIdCol: String,
      keepViewTs: Boolean = false): DataFrame =
    directional(entity, entityTs, view, viewTs, joinKeys, features,
      toleranceSeconds, rowIdCol, keepViewTs, nearestMode = true)

  private def directional(
      entity: DataFrame, entityTs: String,
      view: DataFrame, viewTs: String,
      joinKeys: Seq[(String, String)],
      features: Seq[String],
      windowSeconds: Long,
      rowIdCol: String,
      keepViewTs: Boolean,
      nearestMode: Boolean): DataFrame = {
    require(joinKeys.nonEmpty, "directional as-of needs equi-join keys")
    require(windowSeconds > 0, "horizon/tolerance must be positive")

    // Widen the probe side: if the planner broadcasts the (pruned) view,
    // probe parallelism is inherited from the entity scan's input splits.
    val spine = graft.ops.OpsUtil.widen(entity).withColumn(RowId, col(rowIdCol))

    // Bounded-scan pruning — one 2-value driver aggregate, pushed into
    // the view's parquet row-group filters by Catalyst.
    val bounds = spine.agg(min(col(entityTs)), max(col(entityTs))).head()
    if (bounds.isNullAt(0))
      return spine.drop(RowId) // empty spine: nothing to stitch

    val horizon = expr(s"INTERVAL $windowSeconds SECONDS")
    val (lo, hi) =
      if (nearestMode) (lit(bounds.get(0)).cast("timestamp") - horizon,
        lit(bounds.get(1)).cast("timestamp") + horizon)
      else (lit(bounds.get(0)).cast("timestamp"),
        lit(bounds.get(1)).cast("timestamp") + horizon)
    val pruned = view
      .filter(col(viewTs) >= lo && col(viewTs) <= hi)
      .select(((viewTs +: joinKeys.map(_._2)) ++ features).distinct.map(col): _*)
      .withColumnRenamed(viewTs, Vts)

    val left = spine.select(
      (Seq(RowId, entityTs) ++ joinKeys.map(_._1)).distinct.map(col): _*)
    val keyCond = joinKeys.map { case (e, v) => left(e) === pruned(v) }.reduce(_ && _)
    val rangeCond =
      if (nearestMode)
        pruned(Vts) >= left(entityTs) - horizon && pruned(Vts) <= left(entityTs) + horizon
      else
        pruned(Vts) >= left(entityTs) && pruned(Vts) <= left(entityTs) + horizon

    val candidates = left.join(pruned, keyCond && rangeCond, "inner")

    // Reduction key: (|Δt|,) viewTs, features… — lexicographic struct
    // min == the documented pick order, with map-side partial agg.
    val orderFields: Seq[Column] =
      (if (nearestMode)
        Seq(abs(unix_micros(col(Vts)) - unix_micros(col(entityTs))).as("__graft_diff"))
      else Nil) ++ (col(Vts) +: features.map(col))
    val reduced = candidates
      .groupBy(RowId)
      .agg(min(struct(orderFields: _*)).as(Packed))
    val keep =
      (if (keepViewTs) Seq(col(Packed)(Vts).as(viewTs)) else Nil) ++
        features.map(f => col(Packed)(f).as(f))

    spine
      .join(reduced.select(col(RowId) +: keep: _*), Seq(RowId), "left")
      .drop(RowId)
  }
}
