package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.sources.ParquetTables

/** Measure the semantic-serve adcMargin dial's cost curve with the
  * [[Similarity.nearDupAgainst]] `serveStats` observation (r14 verdict
  * #7 follow-through: the 0.46 → 0.82 recall fix widened the margin on
  * a guessed cost; this prints the measured cost so the NEXT margin
  * decision reads a table). Geometry is dedup_semantic_serve's
  * verbatim: even-id history fitted at 16 centroids / m=8 / kSub=16,
  * odd-id arrivals, threshold 0.42, nProbe 8 — swept over margins.
  * Per margin: `adc_candidates` admitted to exact refinement (the
  * observation, riding the serve's own count action), candidates per
  * probe row, emitted pairs, and the wall.
  *
  * Usage: runMain graft.tools.AdcCostProbe [sfDir] [margins-csv]
  * (defaults: /root/testdata/sf0.1 and 0.05,0.15,0.3,0.5,2.0).
  */
object AdcCostProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val margins = (if (args.length > 1) args(1) else "0.05,0.15,0.3,0.5,2.0")
      .split(',').map(_.trim.toDouble).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)

    val emb = ParquetTables.load(spark, s"$sfDir/embeddings.parquet")
    val hist = emb.filter(col("vec_id") % 2 === 0).localCheckpoint(true)
    val arr = emb.filter(col("vec_id") % 2 =!= 0).localCheckpoint(true)
    val nArr = arr.count()
    val nProbe = 8
    val idx = Similarity.fitIndex(hist, "vec_id", "embedding",
      nCentroids = 16, m = 8, kSub = 16)
    val encoded = Similarity
      .encodeCorpus(hist, "vec_id", "embedding", idx, storeVectors = true)
      .localCheckpoint(true)

    // Baseline block set: the eager hist/arr/encoded checkpoints stay
    // resident for the whole sweep; each margin's nearDupAgainst
    // localCheckpoints its OWN staged arrivals, and those must be
    // released between iterations or later margins time under earlier
    // margins' resident blocks — the exact contamination class the
    // r15 Kn5GeometryCanary release-before-clock fix addressed
    // (ADVICE r15 #3). The Kn5GeometryCanary baseline-set pattern.
    val sc = spark.sparkContext
    val baseline = sc.getPersistentRDDs.keySet

    margins.foreach { m =>
      val obs = new org.apache.spark.sql.Observation()
      val t0 = System.nanoTime()
      val pairs = Similarity.nearDupAgainst(
        arr, hist.limit(0), encoded, "vec_id", "embedding", idx,
        threshold = 0.42, nProbe = nProbe, adcMargin = m,
        serveStats = Some(obs)).count()
      val wall = (System.nanoTime() - t0) / 1e9
      sc.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!baseline.contains(id)) rdd.unpersist(false)
      }
      val got = obs.get
      val cand = got("adc_candidates").asInstanceOf[Long]
      println(s"""{"adc_margin":$m,"adc_candidates":$cand,""" +
        s""""candidates_per_probe":${fmt(cand.toDouble / (nArr * nProbe))},""" +
        s""""pairs":$pairs,"sec":${fmt(wall)}}""")
    }
    spark.stop()
  }
}
