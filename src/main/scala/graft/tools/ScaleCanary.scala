package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.join.{PointInTimeJoin, ResolvedView}
import graft.ops.{Dedup, LanguageModel, Sampling, Similarity}
import graft.sources.ParquetTables

/** Deterministic in-engine data amplification: replicate a table k×
  * with per-replica transforms chosen so the WORKLOAD scales linearly
  * — the shape a 1000-executor cluster sees at 100 TB, synthesized
  * from the sf0.1 tables without any new testdata.
  *
  * The transform per table family is what makes the scaling honest:
  *   - documents: per-replica character rotation (lower/upper/digit
  *     alphabets rotated in parallel). Replica r's shingle vocabulary
  *     is disjoint from replica 0's, so document-frequency caps
  *     (maxDf) filter each replica exactly as they filter the
  *     original, duplicate-pair counts grow k× (NOT k²×, which naive
  *     replication would cause — every copy near-dups its siblings),
  *     and connected components keep their per-replica diameter.
  *   - embeddings: per-replica dimension rotation. Rotation is an
  *     isometry, so within-replica neighbor structure is preserved
  *     exactly while cross-replica similarities decorrelate; corpus
  *     cost per query grows linearly.
  *   - entity tables: id offsets (1e9 per replica). Per-entity join
  *     fan-in/fan-out is identical in every replica, so a PIT join's
  *     per-key work is constant and total work linear.
  */
object Amplify {

  /** Replica id stride — far above every testdata id, so amplified id
    * spaces are disjoint and replica 0 ids are the originals. */
  val IdOffset = 1000000000L

  private val lower = "abcdefghijklmnopqrstuvwxyz"
  private val upper = lower.toUpperCase
  private val digits = "0123456789"

  private def affine(alpha: String, a: Int, b: Int): String = {
    val n = alpha.length
    (0 until n).map(i => alpha((a * i + b) % n)).mkString
  }

  /** Distinct-permutation bound for the substitution family below:
    * the LETTER family (4 units × 26 offsets, distinct (a, b) pairs
    * through r = 103) is what the disjoint-vocabulary argument needs —
    * the testdata corpus is letters-and-spaces only. The DIGIT family
    * recycles after 40 replicas (4 units × 10 offsets), so a corpus
    * with pure-digit tokens keeps strict disjointness only to 40;
    * ServeCanary's hit-set gates verify the property empirically
    * either way. */
  private[tools] val MaxReplicas = 104

  /** Per-replica substitution alphabet: case-parallel AFFINE character
    * maps i → a·i + b (mod |alphabet|) on each alphabet, replica 0 the
    * identity. Rotations alone (a = 1) are pairwise-distinct only up
    * to the alphabet size — the old digit bound of 10 replicas; with
    * the multiplier cycling through units of the modulus the (a, b)
    * pairs stay distinct through [[MaxReplicas]]. Two distinct affine
    * maps agree on at most gcd(a_r − a_s, n) characters, so a
    * cross-replica 3-shingle collision needs all three characters in
    * that set — a ≲(2/26)³ sliver, preserving the disjoint-vocabulary
    * linearity argument through the second decade. Case-parallel so
    * lowercasing in downstream text normalization cannot re-collide
    * two replicas. */
  private[tools] def substituted(r: Int): String = {
    val la = Seq(1, 3, 5, 7)((r / 26) % 4)
    val lb = (r * 7) % 26
    val da = Seq(1, 3, 7, 9)((r / 10) % 4)
    val db = r % 10
    affine(lower, la, lb) + affine(upper, la, lb) + affine(digits, da, db)
  }

  private val matching = lower + upper + digits

  /** Cross rows with replica ids 0..k-1 (replica 0 = the original). */
  private def withRep(df: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"Amplify: k must be >= 1, got $k")
    df.withColumn("__rep", explode(sequence(lit(0), lit(k - 1))))
  }

  /** k-branch CASE of static translates — each branch stays a codegen
    * expression; k is single-digit so the CASE is cheap. */
  private def rotateText(text: Column, rep: Column, k: Int): Column =
    (1 until k)
      .foldLeft(when(rep === 0, text)) { (acc, r) =>
        acc.when(rep === r, translate(text, matching, substituted(r)))
      }
      .otherwise(text)

  def documents(df: DataFrame, k: Int, rotate: Boolean): DataFrame = {
    // Substitution distinctness holds through MaxReplicas (the affine
    // (a, b) pair space) — past that, replicas would silently share
    // shingles and the linearity argument breaks.
    require(!rotate || k <= MaxReplicas,
      s"Amplify.documents: substitution supports k <= $MaxReplicas, got $k")
    withRep(df.select("doc_id", "text", "lang", "source"), k).select(
      (col("doc_id") + col("__rep") * IdOffset).as("doc_id"),
      (if (rotate) rotateText(col("text"), col("__rep"), k) else col("text"))
        .as("text"),
      col("lang"), col("source"))
  }

  def embeddings(df: DataFrame, k: Int): DataFrame = {
    // Replicas 0..63: dimension rotation by __rep (an isometry; the
    // slice arithmetic needs rotation < dim = 64). Replicas 64+:
    // rotation by __rep mod 64 COMPOSED with a per-replica
    // deterministic sign-flip pattern (also an isometry — hash-chosen
    // signs per dimension), so every replica's within-replica neighbor
    // structure is exact while any two replicas differ by rotation,
    // flips, or both and decorrelate. Second-decade bound: 2 × 64
    // distinct (rotation, flip-epoch) combinations is far more than
    // [[MaxReplicas]] needs.
    require(k <= 128, s"Amplify.embeddings: supports k <= 128, got $k")
    val e = col("embedding")
    val rot = pmod(col("__rep"), lit(64))
    val rotatedVec = when(rot === 0, e).otherwise(concat(
      slice(e, rot + 1, size(e) - rot),
      slice(e, lit(1), rot)))
    val signedVec = when(col("__rep") < 64, rotatedVec)
      .otherwise(zip_with(rotatedVec,
        sequence(lit(0), size(e) - 1),
        (v, i) => v * (lit(1.0f) -
          lit(2.0f) * pmod(xxhash64(col("__rep"), i), lit(2)).cast("float"))))
    withRep(df, k).select(
      (col("vec_id") + col("__rep") * IdOffset).as("vec_id"),
      signedVec.as("embedding"), col("label"))
  }

  /** Generic entity-table amplification: offset the id columns, keep
    * everything else verbatim. */
  def offsetIds(df: DataFrame, k: Int, idCols: Seq[String]): DataFrame = {
    val rdf = withRep(df, k)
    rdf.select(df.columns.toSeq.map { c =>
      if (idCols.contains(c)) (col(c) + col("__rep") * IdOffset).as(c)
      else col(c)
    }: _*)
  }
}

/** 10× scale canary: run the heaviest operator families at 1× and k×
  * amplified sf0.1 inputs and MEASURE that runtime grows ≤ ~linearly
  * with zero task failures — converting SCALE.md's plan-audit posture
  * ("this shape survives 100×") into an executed data point.
  *
  * Usage: runMain graft.tools.ScaleCanary [sfDir] [k] [maxRatio] [op...]
  * Prints one JSON line per op:
  *   {"op":…,"t1":…,"tk":…,"k":10,"ratio":…,"rows1":…,"rowsk":…}
  * and a final summary line; exits 1 on a super-linear op (ratio >
  * maxRatio, default 13 ≈ linear + constant overheads + measurement
  * slack) or any task failure.
  *
  * Query-vs-corpus scaling is chosen per family to mirror a real
  * deployment: ANN holds the QUERY set fixed (replica 0's sample)
  * while the indexed corpus grows — query rate is a product property,
  * corpus size a data property; everything else grows its full input.
  */
object ScaleCanary {

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    ParquetTables.load(s, s"$dir/$name.parquet")

  /** The five heaviest families from BENCH_r07, amplification-aware:
    * (name, build(spark, sfDir, k)). k = 1 must reproduce the bench
    * query's working set (replica 0 is the identity replica). */
  def ops: Seq[(String, (SparkSession, String, Int) => DataFrame)] = Seq(
    "dedup_survivors" -> { (s, dir, k) =>
      val docs = Amplify.documents(tbl(s, dir, "documents"), k, rotate = true)
      val removed = Dedup.clusters(
        Dedup.ngramJaccard(docs, "doc_id", "text", shingleN = 3,
          threshold = 0.08, maxDf = 100))
        .filter(col("id") =!= col("cluster"))
      docs.join(removed, docs("doc_id") === removed("id"), "left_anti")
        .select(col("doc_id"), col("lang"))
    },
    "sim_topk_pq" -> { (s, dir, k) =>
      val emb = Amplify.embeddings(tbl(s, dir, "embeddings"), k)
      // Fixed query set (replica 0's portable 10% sample), growing
      // corpus — the production ANN scaling regime. Fixed centroids:
      // assignment is O(N·C) and scan O(Q·nProbe·N/C), both linear in
      // N when Q and C are held.
      Similarity.ivfpqTopK(emb, "vec_id", "embedding", k = 5,
        nCentroids = 64, nProbe = 24, m = 8, kSub = 16, refine = 256,
        queryPred = Some(Sampling.hashBucket(col("vec_id")) < 10 &&
          col("vec_id") < Amplify.IdOffset))
    },
    "text_langid_score" -> { (s, dir, k) =>
      val docs = tbl(s, dir, "documents")
      // Model fit on the FIXED even half (the trained artifact does
      // not grow with serving volume); the scored half grows k×.
      // No rotation: language ID must see real char distributions.
      LanguageModel.charNgramLangId(
        Amplify.documents(docs.filter(col("doc_id") % 2 === 1), k,
          rotate = false),
        docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", "lang")
    },
    "split_leakage_safe" -> { (s, dir, k) =>
      val docs = Amplify.documents(tbl(s, dir, "documents"), k, rotate = true)
      val clusters = Dedup.clusters(
        Dedup.ngramJaccard(docs, "doc_id", "text", shingleN = 3,
          threshold = 0.08, maxDf = 100))
      Sampling.leakageSafeSplit(
        docs.select("doc_id", "source"), "doc_id", clusters, trainPct = 80)
    },
    "pit_skew_hotkey" -> { (s, dir, k) =>
      // Skew GROWS with scale: 10% of every replica's events route to
      // ONE un-offset hot user (hot key volume k×) while its order
      // history stays 1× (only replica 0 carries o_custkey = 1) and
      // every other key keeps constant per-key work. Total work is
      // still linear — what the canary measures is whether the
      // runtime keeps it parallel (AQE skew-split) as one sort-merge
      // partition grows k× denser than its neighbors.
      val entity = Amplify.offsetIds(
          tbl(s, dir, "events").select("event_id", "user_id", "ts"), k,
          Seq("event_id", "user_id"))
        .withColumn("user_id",
          when(pmod(col("event_id") % Amplify.IdOffset, lit(10)) === 0, lit(1L))
            .otherwise(col("user_id")))
      val view = ResolvedView(
        name = "order_features",
        source = Amplify.offsetIds(
          tbl(s, dir, "orders"), k, Seq("o_orderkey", "o_custkey")),
        joinKeys = Seq("user_id" -> "o_custkey"),
        tsCol = "o_orderdate",
        features = Seq("o_totalprice", "o_orderstatus"))
      PointInTimeJoin.join(entity, "ts", Seq(view), rowIdCol = Some("event_id"))
    },
    "pack_training_sequences" -> { (s, dir, k) =>
      // The pipeline's LAST shaping stage at k× corpus: fixed bucket
      // count (buckets are sized to the cluster, not the data — the
      // Packing contract), so per-bucket token streams grow k× and the
      // canary measures whether the per-bucket window sort + the
      // (bucket, seq) reassembly agg stay ~linear.
      val docs = Amplify.documents(tbl(s, dir, "documents"), k, rotate = true)
        .select(col("doc_id"),
          graft.ops.TextOps.tokens(
            graft.ops.TextOps.normalized(col("text"))).as("toks"))
      graft.ops.Packing.packedSequences(
        docs, "doc_id", "toks", seqLen = 2048, buckets = 8)
    },
    "pit_manyviews" -> { (s, dir, k) =>
      // The 8-view PIT stitch from the bench, entity spaces k×: per-key
      // order history is identical in every replica, so the argmax
      // dedup and row-id stitch do constant work per key.
      val entity = Amplify.offsetIds(
        tbl(s, dir, "events").select("event_id", "user_id", "ts"), k,
        Seq("event_id", "user_id"))
      val orders = Amplify.offsetIds(
        tbl(s, dir, "orders"), k, Seq("o_orderkey", "o_custkey"))
      val customer = Amplify.offsetIds(
          tbl(s, dir, "customer"), k, Seq("c_custkey"))
        .withColumn("static_ts", lit("1970-01-01 00:00:00").cast("timestamp"))
      def ov(nm: String, pfx: String, pred: Column, ttlDays: Option[Long],
             feats: Seq[String]) = ResolvedView(
        name = nm, source = orders.filter(pred),
        joinKeys = Seq("user_id" -> "o_custkey"), tsCol = "o_orderdate",
        features = feats, ttlSeconds = ttlDays.map(_ * 86400),
        outputPrefix = Some(pfx))
      def cv(nm: String, pfx: String, feats: Seq[String]) = ResolvedView(
        name = nm, source = customer,
        joinKeys = Seq("user_id" -> "c_custkey"),
        tsCol = "static_ts", features = feats, outputPrefix = Some(pfx))
      PointInTimeJoin.join(entity, "ts", Seq(
        ov("ord_all", "a", lit(true), None, Seq("o_totalprice")),
        ov("ord_urgent", "u", col("o_orderpriority") === "1-URGENT",
          Some(180L), Seq("o_totalprice")),
        ov("ord_open", "o", col("o_orderstatus") === "O",
          Some(90L), Seq("o_totalprice", "o_orderpriority")),
        ov("ord_big", "b", col("o_totalprice") > 100000.0,
          Some(365L), Seq("o_totalprice")),
        ov("ord_done", "f", col("o_orderstatus") === "F",
          None, Seq("o_orderpriority")),
        ov("ord_low", "lo", col("o_orderpriority") === "5-LOW",
          Some(120L), Seq("o_totalprice")),
        cv("cust_bal", "c", Seq("c_acctbal")),
        cv("cust_seg", "c2", Seq("c_mktsegment", "c_nationkey"))),
        rowIdCol = Some("event_id"))
    })

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = if (args.length > 1) args(1).toInt else 10
    val maxRatio = if (args.length > 2) args(2).toDouble else 13.0
    val only = args.drop(3).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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
    def run(fn: (SparkSession, String, Int) => DataFrame, rep: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir, rep).count()
      val t = (System.nanoTime() - t0) / 1e9
      // Same isolation as Bench: drop this run's localCheckpoint/
      // persist blocks so the next op's timing isn't squeezed by
      // accumulated memory pressure (which would inflate ratios of
      // whatever happens to run late).
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.sqlContext.clearCache()
      (t, rows)
    }
    val selected = ops.filter { case (n, _) => only.isEmpty || only(n) }
    var worst = 0.0
    selected.foreach { case (name, fn) =>
      run(fn, 1) // untimed JIT/codegen warmup at 1×
      val (t1, rows1) = run(fn, 1)
      val (tk, rowsk) = run(fn, k)
      val ratio = tk / math.max(t1, 1e-9)
      worst = math.max(worst, ratio)
      println(s"""{"op":"$name","t1":${fmt(t1)},"tk":${fmt(tk)},"k":$k,""" +
        s""""ratio":${fmt(ratio)},"rows1":$rows1,"rowsk":$rowsk}""")
    }
    Thread.sleep(1000) // drain the async listener bus
    val tf = taskFailures.get()
    val ok = worst <= maxRatio && tf == 0
    println(s"""{"metric":"scale_canary","k":$k,"max_ratio":${fmt(worst)},""" +
      s""""budget":${fmt(maxRatio)},"task_failures":$tf,"ok":$ok,"sf":"$sfDir"}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
