package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

private[graft] object OpsUtil {

  /** The shared core of every two-phase distributed prefix computation
    * (budgetSelect's running cost, bucketize's rank, rocAuc's
    * midranks): coarse-bucket rows by the VALUE range of `orderAsc`
    * (bounds from one 2-value driver aggregate — deterministic, unlike
    * repartitionByRange's sampling), aggregate `weight` per bucket,
    * and window those totals into per-bucket offsets. The only
    * single-partition window runs over ≤ `buckets` summary rows —
    * never over data. Returns None on empty input; otherwise the rows
    * with a `__graft_rb` bucket column plus the broadcastable
    * (`__graft_rb`, `rb_off`) offsets frame. Because bucketing is
    * monotone in `orderAsc`, (bucket, within-bucket order) equals the
    * global order.
    */
  def rangeBucketOffsets(
      df: DataFrame, orderAsc: Column, weight: Column,
      buckets: Int, partitionCols: Seq[String] = Nil): Option[(DataFrame, DataFrame)] = {
    require(buckets > 0)
    val b = df.agg(min(orderAsc).cast("double"), max(orderAsc).cast("double")).head()
    if (b.isNullAt(0)) return None
    val (lo, hi) = (b.getDouble(0), b.getDouble(1))
    // MIN_NORMAL guards the constant-value corner: width 0 would put
    // every row in bucket NaN instead of bucket 0. With partitionCols
    // the bounds stay GLOBAL — bucketing is monotone within every
    // partition, which is all the prefix logic needs — and the offsets
    // window runs per partition over ≤ partitions × buckets rows.
    val width = math.max((hi - lo) / buckets, java.lang.Double.MIN_NORMAL)
    val bucket = least(lit(buckets - 1),
      floor((orderAsc.cast("double") - lo) / width).cast("int"))
    val rows = df.withColumn("__graft_rb", bucket)
    // The unpartitioned form runs over ≤ `buckets` SUMMARY rows (never
    // data) — safe by construction, but an empty partitionSpec makes
    // WindowExec log a "No Partition Defined … single partition" warning
    // on every run, noise that would scare an operator reading logs at
    // scale. Partition by a constant-valued but NON-FOLDABLE expression
    // (a literal gets constant-folded out of the spec): identical
    // semantics — all ≤ `buckets` summary rows land in one partition —
    // and silent logs. `__graft_rb` is never NULL (floor/least over
    // non-NULL bounds), so pmod(rb, 1) is always exactly 0 — and unlike
    // rb*0 (simplified to a literal and then eliminated from the spec)
    // no optimizer rule folds it.
    val offWindow =
      (if (partitionCols.isEmpty)
         Window.partitionBy(pmod(col("__graft_rb"), lit(1))).orderBy(col("__graft_rb"))
       else Window.partitionBy(partitionCols.map(col): _*).orderBy(col("__graft_rb")))
        .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = rows.groupBy((partitionCols :+ "__graft_rb").map(col): _*)
      .agg(sum(weight).as("rb_w"))
      .withColumn("rb_off", coalesce(sum(col("rb_w")).over(offWindow), lit(0L)))
      .select((partitionCols :+ "__graft_rb" :+ "rb_off").map(col): _*)
    Some((rows, offsets))
  }

  /** Decouple compute-bound projection parallelism from input-split
    * parallelism: when the scan yields fewer partitions than the
    * cluster has slots (small files, single row groups), redistribute
    * rows round-robin so per-row work (signatures, shingles, vector
    * math) uses every core. The shuffle moves each row once, before
    * any expensive expression runs; when input splits already meet or
    * exceed the slot count — the normal case at scale — this is a
    * no-op with zero added shuffle.
    */
  def widen(df: DataFrame): DataFrame = {
    // Streaming frames can't be partition-probed (df.rdd throws) and
    // micro-batch parallelism is the source's concern — pass through.
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
