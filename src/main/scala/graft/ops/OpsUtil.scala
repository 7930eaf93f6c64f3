package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

private[graft] object OpsUtil {

  /** Run several INDEPENDENT write actions as concurrent Spark jobs
    * (guide §2.6, overlap independent jobs): the scheduler back-fills
    * executors freed by one write's task tail with the next write's
    * tasks, so k serial job+commit latencies collapse toward the
    * slowest one — the fixed-cost lever for every save that persists
    * a model as several small tables. Bounded pool (enough in flight
    * to fill the tail, not so many they fight for memory); the first
    * failure (in submission order) propagates only after EVERY action
    * has settled — each action runs under Try, so Future.sequence
    * cannot fail fast while sibling writes are still running (r16
    * ADVICE: a caller that cleaned up or retried the save path on
    * failure would otherwise race two overwrite writers against the
    * same directories). Safe only for writes with no ordering
    * dependency — disjoint output paths. */
  def runConcurrently(actions: Seq[() => Unit], parallelism: Int = 4): Unit =
    if (actions.size <= 1) actions.foreach(_())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(parallelism, actions.size))
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try {
        val settled = scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(
            actions.map(a =>
              scala.concurrent.Future(scala.util.Try(a())))),
          scala.concurrent.duration.Duration.Inf)
        settled.foreach(_.get)
      } finally pool.shutdown()
    }

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

  /** Materializer for iterative operators' per-round lineage
    * truncation — the durability dial shared by [[Graph.pageRank]] and
    * [[Dedup.clusters]] (one implementation so a cleanup/robustness
    * fix can never land in only one of them). With `scratchDir` unset:
    * eager non-replicated `localCheckpoint` (fast; an executor loss
    * mid-run kills the chain — batch-local usage). With it set: each
    * materialization writes scratch parquet under ONE UUID-named run
    * dir (per call, so concurrent runs never collide) and reads it
    * back — durable on the job's storage; `tag` keeps every
    * materialization at its own path because overwriting a path a lazy
    * downstream scan still reads would corrupt the run. The run dir is
    * registered for deletion at JVM exit via Hadoop
    * `FileSystem.deleteOnExit` (scheme-agnostic, ordered shutdown); a
    * crashed driver can orphan it, so prefer a TTL'd scratch location.
    */
  def scratchPersist(
      anchor: DataFrame, scratchDir: Option[String],
      prefix: String): (DataFrame, String) => DataFrame =
    scratchDir match {
      case Some(dir) =>
        val base = s"$dir/$prefix-${java.util.UUID.randomUUID()}"
        val sess = anchor.sparkSession
        val hp = new org.apache.hadoop.fs.Path(base)
        hp.getFileSystem(sess.sparkContext.hadoopConfiguration)
          .deleteOnExit(hp): Unit
        (df, tag) => {
          df.write.mode("overwrite").parquet(s"$base/$tag")
          sess.read.parquet(s"$base/$tag")
        }
      case None => (df, _) => df.localCheckpoint(true)
    }

  /** Key(s) → partition bucket of every hash-partitioned serve layout
    * (bm25 terms, exact content hashes, winnow fingerprints, LSH band
    * hashes, SimHash (band, chunk) pairs). ONE implementation because
    * each layout's save- and serve-side bucket expressions must stay
    * bit-identical or partition pruning silently drops matching index
    * rows — a divergence here is invisible to the compiler. INT cast
    * to match what parquet partition-directory type inference reads
    * back. */
  def hashBucket(n: Int, keys: Column*): Column =
    pmod(xxhash64(keys: _*), lit(n.toLong)).cast("int")

  /** Rewrite a hash-partitioned parquet layout down to ONE file per
    * partition directory — the compaction step of the append-
    * maintained serve indexes ([[Similarity.appendEncodedCorpus]],
    * [[Dedup.appendSimhashBandIndex]]), whose batch-cadence appends
    * grow FILE counts linearly in batches (≤ 1 file per touched
    * directory per append) even though row counts only grow with
    * data. Reads the layout, rewrites it repartitioned on the
    * partition column (all rows of a value land in one task ⇒ exactly
    * one file per directory), then swaps: write to a sibling temp
    * dir, delete the original, rename into place. The swap is atomic
    * on HDFS/local rename semantics; on object stores rename is
    * copy+delete, so run compaction from the maintenance job that
    * owns the index, never concurrently with a serve. Rows are
    * untouched by construction (spec-pinned: compacted ≡ original,
    * one file per directory).
    *
    * Crash-safety of the swap: the original is renamed ASIDE first,
    * the compacted temp renamed into place second, and only then is
    * the old data deleted — at every intermediate point a full copy of
    * the index exists on disk (at `dir`, `dir.__graft_old`, or both),
    * so a driver kill mid-swap never leaves the path empty; recovery
    * is renaming `.__graft_old` back. */
  def compactPartitionedDir(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      partitionCol: String): Unit =
    compactDirWith(spark, dir, Some(partitionCol))(identity)

  /** The generic form: read `dir`, apply `rewrite` (identity for pure
    * file compaction; a semantic fold for delta tables like the CMS
    * cell deltas), write beside, crash-safe rename-aside swap. Same
    * swap contract as above: at every intermediate point a full copy
    * exists at `dir`, `dir.__graft_old`, or both. */
  def compactDirWith(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      partitionCol: Option[String] = None)(
      rewrite: DataFrame => DataFrame): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(dir + ".__graft_compact")
    val old = new org.apache.hadoop.fs.Path(dir + ".__graft_old")
    require(!fs.exists(old),
      s"compact: $old exists — a previous compaction died mid-swap; " +
        "restore or remove it before compacting again")
    fs.delete(tmp, true)
    val out = rewrite(spark.read.parquet(dir))
    (partitionCol match {
      case Some(c) =>
        out.repartition(col(c)).write.mode("overwrite").partitionBy(c)
      case None => out.write.mode("overwrite")
    }).parquet(tmp.toString)
    require(fs.rename(p, old), s"compact: rename $p -> $old failed")
    require(fs.rename(tmp, p), s"compact: rename $tmp -> $p failed " +
      s"(original preserved at $old)")
    fs.delete(old, true): Unit
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
