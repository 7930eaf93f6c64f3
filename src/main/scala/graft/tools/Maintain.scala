package graft.tools

import org.apache.spark.sql.SparkSession

/** Maintenance entry point for the append-maintained serve layouts —
  * the runnable job the r12 verdict asked for: the two layouts whose
  * freshness path is APPEND ([[graft.ops.Similarity.appendEncodedCorpus]]
  * cid partitions, [[graft.ops.Dedup.appendSimhashBandIndex]] band
  * buckets) grow FILE counts linearly in batches even though rows only
  * grow with data; this folds every partition directory back to one
  * file, rows untouched (spec-pinned), with the crash-safe
  * rename-aside swap of [[graft.ops.OpsUtil.compactPartitionedDir]] —
  * a mid-compaction crash leaves a `.__graft_old` sibling that BLOCKS
  * the next run with the named recovery path instead of silently
  * double-compacting.
  *
  * Layout is auto-detected from the directory's own structure (the
  * transform-DSL sidecar-sniff pattern):
  *   - `<dir>/bands` + `<dir>/stats`  → SimHash band index
  *   - `cid=*` partition directories  → encoded corpus (PQ codes)
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
      s"maintain: $dir is neither a SimHash band index (bands/ + stats/) " +
        "nor a cid-partitioned encoded corpus (cid=* directories) — " +
        "only the APPEND-maintained layouts need compaction; the " +
        "rebuild-maintained ones (exact, winnow, bm25) are rewritten " +
        "whole by their merge step")
    if (isBandIndex) {
      val before = dataFiles(bands)
      graft.ops.Dedup.compactSimhashBandIndex(spark, dir)
      ("simhash_band_index", before, dataFiles(bands))
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
