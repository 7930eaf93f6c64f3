package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-level wall/CPU/volume profile for one SparkEntry query under
  * the bench harness (noop sink, warm second run) — answers "where did
  * the seconds go" when a bench number looks wrong.
  * Usage: runMain graft.tools.StageProfile <queryName> [sfDir]
  * Prints one line per completed stage of the TIMED (second) run.
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
        val recs = si.taskMetrics.inputMetrics.recordsRead +
          si.taskMetrics.shuffleReadMetrics.recordsRead
        val out = si.taskMetrics.shuffleWriteMetrics.recordsWritten
        val cpu = si.taskMetrics.executorRunTime / 1000.0
        val spill = si.taskMetrics.memoryBytesSpilled + si.taskMetrics.diskBytesSpilled
        // si.name carries the action's callsite ("parquet at X.scala:N")
        // — the only attribution a multi-job query offers (bench
        // queries set no job descriptions).
        stages.add(f"stage=${si.stageId}%4d wall=${wall}%7.2fs taskSum=${cpu}%8.2fs " +
          f"inRecs=$recs%10d shufOut=$out%10d spill=$spill%d tasks=${si.numTasks} " +
          f"name=${si.name.takeWhile(_ != '\n').take(70)}")
      }
    })
    def run(): Unit = graft.SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    run() // warmup (JIT + page cache), untimed
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    spark.sqlContext.clearCache()
    Thread.sleep(300)
    stages.clear()
    val t0 = System.nanoTime()
    run()
    val t = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sorted.foreach(println)
    println(f"TOTAL $name wall=${t}%.2fs")
    spark.stop()
  }
}
