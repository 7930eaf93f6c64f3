package graft.tools

import org.apache.spark.sql.SparkSession

/** Maintenance entry point for the append-maintained serve layouts —
  * the runnable job the r12 verdict asked for: the layouts whose
  * freshness path is APPEND ([[graft.ops.Similarity.appendEncodedCorpus]]
  * cid partitions, [[graft.ops.Dedup.appendSimhashBandIndex]] and
  * [[graft.ops.Dedup.appendLshBandIndex]] band buckets) grow FILE
  * counts linearly in batches even though rows only grow with data;
  * this folds every partition directory back to one file, rows
  * untouched (spec-pinned), with the crash-safe rename-aside swap of
  * [[graft.ops.OpsUtil.compactPartitionedDir]] — a mid-compaction
  * crash leaves a `.__graft_old` sibling that BLOCKS the next run
  * with the named recovery path instead of silently double-compacting.
  *
  * Layout is auto-detected from the directory's own structure. The
  * two band indexes share the `bands/ + stats/` shape, so the STATS
  * SIDECAR SCHEMA disambiguates (the r13-verdict mislabel fix — a
  * MinHash index must never be reported as a SimHash one):
  *   - `bands` + `stats` with `k`/`bands` columns → MinHash LSH band
  *     index (append-maintained only when built UNCAPPED; a capped
  *     build is rebuild-maintained — see
  *     [[graft.ops.Dedup.appendLshBandIndex]] — but compaction is
  *     row-preserving either way, so both are accepted here)
  *   - `bands` + `stats` without them → SimHash band index
  *   - `cid=*` partition directories → encoded corpus (PQ codes)
  *
  * Run it from the maintenance job that owns the index, never under a
  * live serve (object-store rename is copy+delete).
  *
  * Usage: runMain graft.tools.Maintain <index-dir> [<index-dir> ...]
  * Prints one JSON line per directory: layout, files before/after.
  */
object Maintain {

  /** Detect + compact one index directory. Returns (layout,
    * filesBefore, filesAfter). Factored off `main` so specs drive it
    * without a process boundary. */
  def run(spark: SparkSession, dir: String): (String, Long, Long) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    require(fs.exists(root), s"maintain: $dir does not exist")
    def dataFiles(p: org.apache.hadoop.fs.Path): Long = {
      val it = fs.listFiles(p, true)
      var n = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) n += 1
      }
      n
    }
    val bands = new org.apache.hadoop.fs.Path(root, "bands")
    val stats = new org.apache.hadoop.fs.Path(root, "stats")
    val isBandIndex = fs.exists(bands) && fs.exists(stats)
    val isEncoded = !isBandIndex &&
      fs.listStatus(root).exists(_.getPath.getName.startsWith("cid="))
    require(isBandIndex || isEncoded,
      s"maintain: $dir is neither a band index (bands/ + stats/: " +
        "MinHash LSH or SimHash, told apart by the stats schema) nor a " +
        "cid-partitioned encoded corpus (cid=* directories) — only the " +
        "APPEND-maintained layouts need compaction; the " +
        "rebuild-maintained ones (exact, winnow, bm25, and any " +
        "CAPPED-build minhash LSH index) are rewritten whole by their " +
        "merge/rebuild step")
    if (isBandIndex) {
      // Both band indexes persist bands/ + stats/; the sidecar schema
      // names the layout (simhash: portable + hash_buckets only;
      // minhash adds k, bands, shingle_n, max_bucket). Compaction is
      // mechanically identical (same BandBucket partition column,
      // row-preserving) — the distinction is the REPORT and the
      // append contract documented above.
      val sidecar = spark.read.parquet(s"$dir/stats").schema.fieldNames.toSet
      val isMinhash = sidecar.contains("k") && sidecar.contains("bands")
      val before = dataFiles(bands)
      if (isMinhash) graft.ops.Dedup.compactLshBandIndex(spark, dir)
      else graft.ops.Dedup.compactSimhashBandIndex(spark, dir)
      (if (isMinhash) "minhash_band_index" else "simhash_band_index",
        before, dataFiles(bands))
    } else {
      val before = dataFiles(root)
      graft.ops.Similarity.compactEncodedCorpus(spark, dir)
      ("encoded_corpus", before, dataFiles(root))
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: Maintain <index-dir> [<index-dir> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val (layout, before, after) = run(spark, dir)
      println(s"""{"dir":"$dir","layout":"$layout",""" +
        s""""files_before":$before,"files_after":$after}""")
    }
    spark.stop()
  }
}
