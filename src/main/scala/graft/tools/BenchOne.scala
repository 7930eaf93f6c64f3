package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Run a single named query from [[SparkEntry.defs]] with timing and an
  * optional formatted plan dump — the inner loop for plan tuning.
  *
  * Usage: runMain graft.tools.BenchOne <queryName> [sfDir] [explain] [show]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val doExplain = args.contains("explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    // Time build + full materialization together (matching Bench's
    // noop-sink harness — count() would let Catalyst prune agg lists
    // and join payloads, underpricing the query; see SURVEY §8.9.1).
    // Some operators do eager work at DataFrame construction (index
    // fits, checkpoints). In explain mode the one built DataFrame
    // serves both the plan dump and the run, so eager-at-build queries
    // run their job once (timing then excludes the build — use
    // non-explain mode to time).
    def materialize(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); -1L
    }
    val t0 = System.nanoTime()
    val n = if (doExplain || args.contains("show")) {
      val df = fn(spark, sfDir)
      if (doExplain) df.explain("formatted")
      if (args.contains("show")) df.show(50, false)
      materialize(df)
    } else materialize(fn(spark, sfDir))
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"query":"$name","rows":$n,"sec":$sec%.3f}""")
    spark.stop()
  }
}
