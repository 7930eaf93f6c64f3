package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.encode.TfExample
import graft.io.TfRecordSink
import graft.registry.YamlRegistry
import graft.run.{JobConfig, Runner, Transforms}
import graft.sources.ParquetTables

/** End-to-end CORPUS-PREP job canary — the feature-less sibling of
  * [[JobCanary]]: the complete pre-training pipeline
  * (clean → tokenize_against → pack_sequences → TFRecord) through
  * `Runner.run` at 1× and k× amplified documents, measuring that WALL
  * TIME grows ≤ ~linearly with zero task failures and that TOKEN
  * COUNTS SURVIVE THE WIRE at both scales: the sum of decoded
  * `n_tokens` over every TFRecord equals the packed-token total of
  * the transform chain applied directly — the gate that catches a
  * scale-dependent packing or codec defect that a wall-clock ratio
  * never would.
  *
  * The tokenizer artifact is fitted ONCE on the 1× corpus and served
  * at both scales — artifact reuse is the deployment shape
  * (fit-once/serve-many), so the fit is canary setup, outside the
  * clock. Amplified documents are MATERIALIZED to a scratch data dir
  * under the production file name, so the job's entity SQL — and the
  * independent stdlib TFRecord checker, pointed at the printed out
  * dirs — run byte-for-byte unchanged.
  *
  * Usage: runMain graft.tools.CorpusJobCanary [sfDir] [k] [maxRatio]
  * Prints one JSON line:
  *   {"metric":"corpus_job_canary","t1":…,"tk":…,"k":…,"ratio":…,
  *    "records1":…,"recordsk":…,"tokens1":…,"tokensk":…,
  *    "task_failures":…,"ok":…}
  * Exits 1 on a super-linear ratio, a token-conservation miss at
  * either scale, or any task failure. */
object CorpusJobCanary {

  private val registryYaml =
    """project: graft-corpus-canary
      |views:
      |  - name: unused_features
      |    source: orders.parquet
      |    entities: [o_custkey]
      |    timestamp: o_orderdate
      |    createdTimestamp: o_orderdate
      |    features: [o_totalprice]
      |""".stripMargin

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

    val scratch = java.nio.file.Files.createTempDirectory("graft-corpus-canary").toString
    val docs = ParquetTables.load(spark, s"$sfDir/documents.parquet")
    // Fit-once: the unigram artifact all runs serve.
    val uniDir = s"$scratch/uni"
    graft.ops.Unigram.saveModel(
      graft.ops.Unigram.train(docs, "text", vocabSize = 200), uniDir, spark)
    val chain = "clean_text(cols=text);" +
      s"tokenize_against(key=doc_id,col=text,model=$uniDir,family=unigram);" +
      "pack_sequences(key=doc_id,col=tokens,max_len=128,buckets=8)"

    def prep(rep: Int): String = {
      val d = s"$scratch/data$rep"
      Amplify.offsetIds(docs, rep, Seq("doc_id"))
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
      d
    }
    def runOnce(rep: Int, timedTag: String): (Double, Long, Long) = {
      val dataDir = prep(rep) // canary overhead, outside the clock
      val out = s"$scratch/out$timedTag"
      val job = JobConfig(
        registry = YamlRegistry.load(registryYaml),
        dataDir = dataDir,
        features = Left(Seq.empty), // feature-less: the chain IS the job
        entityQuery = "SELECT doc_id, text FROM documents",
        outputSplits = Seq("train" -> 2, "eval" -> 1),
        outputPath = out,
        transforms = Transforms.parse(chain))
      val t0 = System.nanoTime()
      val results = Runner.run(spark, job)
      val t = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.sqlContext.clearCache()
      // Wire-level token conservation: decode EVERY record with the
      // engine's own reader and compare against the chain applied
      // directly to the amplified corpus (the RunnerSpec gate, at
      // canary scale).
      val wireTokens = Seq("train", "eval").map { split =>
        TfRecordSink.readAll(spark, out, split).map { rec =>
          TfExample.decode(rec)("n_tokens") match {
            case TfExample.Int64s(xs) => xs.head
            case other => sys.error(s"n_tokens decoded as $other")
          }
        }.sum
      }.sum
      val corpusTokens = Transforms.applyAll(
          ParquetTables.load(spark, s"$dataDir/documents.parquet")
            .select("doc_id", "text"),
          Transforms.parse(chain))
        .agg(sum(col("n_tokens"))).head().getLong(0)
      require(wireTokens == corpusTokens,
        s"corpus_job_canary: wire tokens $wireTokens != packed corpus " +
          s"tokens $corpusTokens at $rep×")
      (t, results.map(_.records).sum, wireTokens)
    }

    runOnce(1, "warm") // untimed JIT/codegen warmup
    val (t1, rec1, tok1) = runOnce(1, "1")
    val (tk, reck, tokk) = runOnce(k, "k")
    Thread.sleep(1000) // drain the async listener bus
    val ratio = tk / math.max(t1, 1e-9)
    val tf = taskFailures.get()
    val ok = ratio <= maxRatio && tf == 0
    println(s"""{"metric":"corpus_job_canary","t1":${fmt(t1)},"tk":${fmt(tk)},"k":$k,""" +
      s""""ratio":${fmt(ratio)},"records1":$rec1,"recordsk":$reck,""" +
      s""""tokens1":$tok1,"tokensk":$tokk,""" +
      s""""task_failures":$tf,"ok":$ok,"scratch":"$scratch"}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
