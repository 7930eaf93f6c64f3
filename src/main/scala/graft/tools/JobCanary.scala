package graft.tools

import org.apache.spark.sql.SparkSession

import graft.registry.YamlRegistry
import graft.run.{JobConfig, Runner}
import graft.sources.ParquetTables

/** End-to-end JOB canary: the full `Runner.run` path (entity SQL →
  * PIT join → flatten → tf.Example encode → hash-split TFRecord write
  * → manifest) at 1× and k× amplified inputs, measuring that WALL
  * TIME grows ≤ ~linearly with zero task failures. [[ScaleCanary]]
  * covers operator families; this covers the COMPOSED job including
  * the output sink — the one stage the op canary never times — with a
  * padded passthrough column sizing the k× output into the GB range
  * so the write path is actually exercised, not rounding error.
  *
  * Amplified tables are MATERIALIZED to a scratch data dir under the
  * same file names, so the job's registry + entity SQL — and the
  * independent stdlib TFRecord checker (`tools/check_tfrecords.py`,
  * pointed at the scratch dir) — run byte-for-byte unchanged against
  * them. Entity/order/customer ids offset per replica
  * ([[Amplify.offsetIds]]): per-key order history is identical in
  * every replica, so PIT work per entity row is constant and total
  * job work linear.
  *
  * Usage: runMain graft.tools.JobCanary [sfDir] [k] [maxRatio]
  * Prints one JSON line per scale plus a summary:
  *   {"metric":"job_canary","t1":…,"tk":…,"k":…,"ratio":…,
  *    "records1":…,"recordsk":…,"bytes1":…,"bytesk":…,
  *    "files1":…,"filesk":…,"task_failures":…,"ok":…}
  * Exits 1 on a super-linear ratio, a record-count mismatch against
  * the amplified spine, or any task failure. Scratch data survives at
  * the printed path so the Python checker can run against it.
  */
object JobCanary {

  private val registryYaml =
    """project: graft-canary
      |views:
      |  - name: order_features
      |    source: orders.parquet
      |    entities: [o_custkey]
      |    timestamp: o_orderdate
      |    createdTimestamp: o_orderdate
      |    features: [o_totalprice, o_orderstatus]
      |services:
      |  - name: training_service
      |    features: ["order_features:o_totalprice", "order_features:o_orderstatus"]
      |""".stripMargin

  // The runner_e2e entity shape plus a ~1.5 KB deterministic pad so
  // k× output lands in the GB range (the write path under test).
  private val entitySql =
    """SELECT event_id, user_id AS o_custkey, ts AS event_timestamp, event_type,
      |       repeat(concat_ws('-', event_type, CAST(user_id AS STRING)), 128) AS pad
      |FROM events""".stripMargin

  private def dirBytes(p: java.io.File): Long = {
    val kids = p.listFiles()
    if (kids == null) p.length()
    else kids.map(dirBytes).sum
  }

  private def partFiles(p: java.io.File): Int = {
    val kids = p.listFiles()
    if (kids == null) 0
    else kids.count(_.getName.startsWith("part-")) + kids.map(partFiles).sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = if (args.length > 1) args(1).toInt else 10
    val maxRatio = if (args.length > 2) args(2).toDouble else 13.0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val taskFailures = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.reason != org.apache.spark.Success) taskFailures.incrementAndGet()
    })
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)

    val scratch = java.nio.file.Files.createTempDirectory("graft-job-canary").toString
    def prep(rep: Int): String = {
      val d = s"$scratch/data$rep"
      def tbl(n: String) = ParquetTables.load(spark, s"$sfDir/$n.parquet")
      Amplify.offsetIds(tbl("events"), rep, Seq("event_id", "user_id"))
        .write.mode("overwrite").parquet(s"$d/events.parquet")
      Amplify.offsetIds(tbl("orders"), rep, Seq("o_orderkey", "o_custkey"))
        .write.mode("overwrite").parquet(s"$d/orders.parquet")
      d
    }
    // Spine mode (args(3)): "natural" (default — event_id, no
    // materialization, the 100 TB recommendation), "synthetic"
    // (localCheckpoint of the full wide spine), or "scratch"
    // (synthetic id over compressed scratch parquet). The three runs
    // together price the spine strategies on a wide payload.
    val mode = if (args.length > 3) args(3) else "natural"
    val rowId = if (mode == "natural") Some("event_id") else None
    val spineDir = if (mode == "scratch") Some(s"$scratch/spine") else None
    def runOnce(rep: Int, timedTag: String): (Double, Long, Long, Int) = {
      val dataDir = prep(rep) // prep is canary overhead, outside the clock
      val out = s"$scratch/out$timedTag"
      val job = JobConfig(
        registry = YamlRegistry.load(registryYaml),
        dataDir = dataDir,
        features = Right("training_service"),
        entityQuery = entitySql,
        entityTs = "event_timestamp",
        outputSplits = Seq("train" -> 2, "eval" -> 1),
        outputPath = out,
        entityRowId = rowId,
        spineScratchDir = spineDir)
      val t0 = System.nanoTime()
      val results = Runner.run(spark, job)
      val t = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.sqlContext.clearCache()
      val records = results.map(_.records).sum
      val spine = spark.read.parquet(s"$dataDir/events.parquet").count()
      require(records == spine,
        s"job_canary: records $records != amplified spine $spine at $rep×")
      (t, records, dirBytes(new java.io.File(out)), partFiles(new java.io.File(out)))
    }

    runOnce(1, "warm") // untimed JIT/codegen warmup
    val (t1, rec1, by1, f1) = runOnce(1, "1")
    val (tk, reck, byk, fk) = runOnce(k, "k")
    Thread.sleep(1000) // drain the async listener bus
    val ratio = tk / math.max(t1, 1e-9)
    val tf = taskFailures.get()
    val ok = ratio <= maxRatio && tf == 0
    println(s"""{"metric":"job_canary","mode":"$mode","t1":${fmt(t1)},"tk":${fmt(tk)},"k":$k,""" +
      s""""ratio":${fmt(ratio)},"records1":$rec1,"recordsk":$reck,""" +
      s""""bytes1":$by1,"bytesk":$byk,"files1":$f1,"filesk":$fk,""" +
      s""""task_failures":$tf,"ok":$ok,"scratch":"$scratch"}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
