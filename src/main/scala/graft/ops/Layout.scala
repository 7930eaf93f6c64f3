package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for multi-dimensional scan pruning: Z-order
  * (Morton) interleaving maps correlated dimensions onto one
  * sort/partition key, so files written in z-order carry tight min/max
  * ranges on EVERY interleaved dimension and parquet row-group /
  * partition pruning works for predicates on any of them — the
  * standard lakehouse OPTIMIZE ZORDER BY shape.
  *
  * The z-value is a pure per-row bit expression (codegen'd, zero
  * shuffle, SQL-portable — plain shifts/masks any engine reproduces);
  * the layout step is one range repartition on it.
  */
object Layout {

  /** Interleave the low `bits` of non-negative x (even positions) and
    * y (odd positions) into a Morton code. Plain `&`/`<<`/`|` fold —
    * stays inside whole-stage codegen and mirrors verbatim into SQL. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31)
    val xs = x.cast("long"); val ys = y.cast("long")
    (0 until bits).map { i =>
      (xs.bitwiseAND(lit(1L << i)) * lit(1L << i))
        .bitwiseOR(ys.bitwiseAND(lit(1L << i)) * lit(2L << i))
    }.reduce(_ bitwiseOR _)
  }

  /** Deterministic value-range file assignment over the z-curve:
    * `files` equal z-value ranges from one 2-value bounds aggregate
    * (driver literal — the index-build pattern; unlike
    * `repartitionByRange` there is no sampled-boundary
    * nondeterminism). Returns rows + (`z`, `file_id`). Writers then
    * `.repartition(col("file_id")).sortWithinPartitions("z")` for the
    * actual clustered write.
    */
  def zorderAssign(
      df: DataFrame, xCol: String, yCol: String,
      bits: Int = 16, files: Int = 64): DataFrame = {
    // (z - lo) * files is computed as a long but DIVIDED as a double,
    // so the numerator must stay exactly representable in a double
    // (2^53): 2·bits + ceil(log2(files)) ≤ 52. Beyond that, rounding
    // in the long→double conversion can push floor(...) to `files` —
    // an out-of-range file_id (long overflow at 63 bits is the laxer,
    // insufficient bound).
    require(files > 0 &&
      2 * bits + (64 - java.lang.Long.numberOfLeadingZeros(files.toLong - 1)) <= 52,
      s"zorderAssign: 2*bits + log2(files) must be <= 52 (got bits=$bits files=$files)")
    val withZ = df.withColumn("z", zValue(col(xCol), col(yCol), bits))
    val b = withZ.agg(min(col("z")), max(col("z"))).head()
    if (b.isNullAt(0)) return withZ.withColumn("file_id", lit(0)).limit(0)
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val span = math.max(hi - lo + 1L, 1L)
    // file = floor((z - lo) * files / span). The numerator stays exact
    // in a double (guarded above), `/` divides as double identically in
    // every IEEE engine, and the floor is EXPLICIT — engines disagree
    // on double→int casts (truncate vs round), floor they agree on.
    val fileId = floor((col("z") - lo) * files / span).cast("int")
    withZ.withColumn("file_id", fileId)
  }
}
