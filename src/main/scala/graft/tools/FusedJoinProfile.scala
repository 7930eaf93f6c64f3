package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.join.PointInTimeJoin

/** Stage-level profile of ONE side of the fused-join canary — where
  * does the wall time actually go. Usage:
  *   runMain graft.tools.FusedJoinProfile <fold|fused> [sfDir] [N] [bcThreshold]
  * Prints one line per completed stage: wall, task time sum, records.
  */
object FusedJoinProfile {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 16
    val bc = if (args.length > 3) args(3) else "10485760"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", bc)
      .config("spark.sql.files.maxPartitionBytes", "131072")
      .config("spark.sql.files.openCostInBytes", "16384")
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
        stages.add(f"stage=${si.stageId}%3d wall=${wall}%7.2fs taskSum=${cpu}%8.2fs " +
          f"inRecs=$recs%10d shufOut=$out%10d spill=$spill%d  ${si.name.takeWhile(_ != '\n')}")
      }
    })
    val (entity, vs) = FusedJoinCanary.views(spark, sfDir, n)
    def run(): Unit = {
      val df =
        if (mode == "fold") PointInTimeJoin.join(entity, "ts", vs, rowIdCol = Some("event_id"))
        else PointInTimeJoin.joinFused(entity, "ts", vs, rowIdCol = Some("event_id"))
      df.write.format("noop").mode("overwrite").save()
    }
    run() // warmup
    stages.clear()
    val t0 = System.nanoTime()
    run()
    val t = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sorted.foreach(println)
    println(f"TOTAL $mode wall=${t}%.2fs")
    spark.stop()
  }
}
