package graft.ops

import org.apache.spark.sql.DataFrame

private[graft] object OpsUtil {

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
