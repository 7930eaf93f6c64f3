package graft.join

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed interval (range) join: pairs where the right row's timestamp
  * falls in `[left.ts + lowerSec, left.ts + upperSec]` and the equi-keys
  * match — the temporal-correlation sibling of the as-of join
  * (PointInTimeJoin keeps only the latest admissible row; this keeps
  * them all).
  *
  * Scale posture: with equi-keys the planner runs a hash/sort-merge
  * join on the keys and applies the range as a post-join filter — fine
  * when keys are selective (the normal case: per-user, per-order).
  * For keyless or hot-key workloads use [[joinBinned]]: both sides are
  * bucketed into fixed time bins (left rows replicated to each bin
  * their window overlaps), turning the range predicate into an
  * equi-join on `(keys..., bin)` with bounded per-bin fan-in — the
  * standard distributed range-join technique.
  */
object IntervalJoin {

  def join(
      left: DataFrame, leftTs: String,
      right: DataFrame, rightTs: String,
      keys: Seq[(String, String)],
      lowerSec: Long, upperSec: Long): DataFrame = {
    require(keys.nonEmpty, "keyless interval join: use joinBinned")
    require(lowerSec <= upperSec, "lowerSec must be <= upperSec")
    // Widen the probe side: when the planner broadcasts the build side,
    // probe parallelism is inherited from the left scan's input splits —
    // a single-file scan would evaluate every candidate pair on one
    // core. No-op once input splits >= cluster slots.
    val l = graft.ops.OpsUtil.widen(left)
    val keyCond = keys.map { case (a, b) => l(a) === right(b) }.reduce(_ && _)
    val rangeCond =
      right(rightTs) >= l(leftTs) + expr(s"INTERVAL $lowerSec SECONDS") &&
        right(rightTs) <= l(leftTs) + expr(s"INTERVAL $upperSec SECONDS")
    l.join(right, keyCond && rangeCond)
  }

  /** Bin-bucketed interval join for keyless / hot-key inputs: bin width
    * is the window span, so each left row lands in at most 2 bins and
    * each right row in exactly 1; the join is a pure equi-join on bin
    * (+ any keys) followed by the exact range filter. */
  def joinBinned(
      left: DataFrame, leftTs: String,
      right: DataFrame, rightTs: String,
      keys: Seq[(String, String)],
      lowerSec: Long, upperSec: Long): DataFrame = {
    require(lowerSec <= upperSec, "lowerSec must be <= upperSec")
    val spanSec = math.max(upperSec - lowerSec, 1L)
    def bin(epoch: org.apache.spark.sql.Column) =
      floor(epoch.cast("double") / spanSec.toDouble).cast("long")
    val binL = explode(sequence(
      bin(unix_timestamp(col(leftTs)) + lowerSec),
      bin(unix_timestamp(col(leftTs)) + upperSec)))
    val l = graft.ops.OpsUtil.widen(left).withColumn("__graft_bin", binL)
    val r = right.withColumn("__graft_bin", bin(unix_timestamp(col(rightTs))))
    val keyCond = (keys.map { case (a, b) => l(a) === r(b) } :+
      (l("__graft_bin") === r("__graft_bin"))).reduce(_ && _)
    val rangeCond =
      r(rightTs) >= l(leftTs) + expr(s"INTERVAL $lowerSec SECONDS") &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $upperSec SECONDS")
    l.join(r, keyCond && rangeCond).drop("__graft_bin")
  }
}
