package graft.ops

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.VectorFunctions

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers, mirroring what a 100 TB pipeline needs:
  *  - [[bruteForceTopK]]: exact cosine top-k via self-join — the
  *    correctness baseline. O(n²·d); fine for verification scale,
  *    broadcast-joined when one side is small.
  *  - [[lshTopK]]: random-hyperplane (sign-LSH) bucketing — only
  *    vectors sharing a bucket are compared, the scale path. Plane
  *    weights are derived deterministically from xxhash64 and embedded
  *    as literals, so no fitted state and identical results across runs.
  *
  * Dot products run through [[graft.functions.DotProduct]] — a codegen'd
  * primitive loop with left-to-right IEEE addition (bit-for-bit the same
  * result as the interpreted `aggregate(zip_with(...))` composition, at
  * ~100× the throughput on the O(n²) pair stage).
  */
object Similarity {

  /** Codegen'd sequential dot product of two double arrays. */
  def dot(a: Column, b: Column): Column = VectorFunctions.dot(a, b)

  def norm(a: Column): Column = VectorFunctions.norm(a)

  /** Cosine with NULL-on-zero-divisor semantics: a zero-norm endpoint
    * yields NULL (not an ANSI DIVIDE_BY_ZERO error), which threshold
    * filters drop and desc orderings rank last. One degenerate row must
    * never kill a 100 TB job. */
  def cosine(a: Column, b: Column): Column = try_divide(dot(a, b), norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Shared all-pairs exact top-k core: query side (optionally
    * filtered, optionally carrying ONE extra column that is also
    * mirrored to the candidate side as `__graft_nx` for use in
    * `pairCond`) cross-joined to the full candidate corpus, cosine-
    * ranked per query with the neighbor-id tie-break. The Option-typed
    * parameter states the real contract — exactly zero or one mirrored
    * attribute — rather than advertising a generality the candidate
    * side doesn't implement. Both public exact baselines are thin
    * wrappers so their tie-break/NULL/rank conventions can never
    * drift apart. */
  private def allPairsTopK(
      df: DataFrame, idCol: String, vecCol: String, k: Int,
      extraCol: Option[(String, String)], pairCond: Column,
      queryPred: Option[Column]): DataFrame = {
    val src = OpsUtil.widen(df)
    val q = queryPred.fold(src)(src.filter)
      .select(col(idCol).as("query_id") +:
        extraCol.toSeq.map { case (from, to) => col(from).as(to) } :+
        asDouble(col(vecCol)).as("qv"): _*)
      .withColumn("qn", norm(col("qv")))
    val c = src.select(
      col(idCol).as("neighbor_id") +:
        extraCol.toSeq.map(e => col(e._1).as("__graft_nx")) :+
        asDouble(col(vecCol)).as("cv"): _*)
      .withColumn("cn", norm(col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), col("neighbor_id"))
    q.join(c, pairCond)
      // try_divide: zero-norm endpoints yield NULL cos (ranked last by
      // desc = NULLS LAST) instead of an ANSI DIVIDE_BY_ZERO job abort
      .withColumn("cos", try_divide(dot(col("qv"), col("cv")), col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id") +: extraCol.toSeq.map(e => col(e._2)) :+
        col("neighbor_id") :+ col("rank"): _*)
  }

  /** Exact top-k cosine neighbors for every vector (excluding itself).
    * Output: (query_id, neighbor_id, rank), rank 1..k by cosine desc,
    * ties broken by neighbor id. `queryPred` restricts the QUERY side
    * only (the candidate corpus stays full) — the exact-recall
    * baseline for ANN verification runs over a deterministic sample
    * instead of all n² pairs. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
      queryPred: Option[Column] = None): DataFrame =
    if (ExactPairs.eligible(df, idCol, None))
      ExactPairs.topK(df, idCol, vecCol, k, None, "", excludeSameLabel = false,
        queryPred)
    else bruteForceTopKNlj(df, idCol, vecCol, k, queryPred)

  /** Reference nested-loop plan for [[bruteForceTopK]] — the parity
    * contract for the blocked kernel; fallback for non-integral ids. */
  private[graft] def bruteForceTopKNlj(df: DataFrame, idCol: String,
      vecCol: String, k: Int, queryPred: Option[Column] = None): DataFrame =
    allPairsTopK(df, idCol, vecCol, k, None,
      col("query_id") =!= col("neighbor_id"), queryPred)

  /** Hard-negative mining for contrastive / embedding training: for
    * every anchor, the `k` most cosine-similar vectors with a DIFFERENT
    * label — the near-misses a triplet or InfoNCE loss learns most
    * from. Exact (all-pairs) form, same contract as [[bruteForceTopK]]:
    * this is the verification baseline; at corpus scale route candidate
    * generation through [[lshTopK]]'s bucketed join and apply the same
    * label filter to its candidate stream.
    * Output: (query_id, query_label, neighbor_id, rank). */
  def hardNegatives(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int, queryPred: Option[Column] = None): DataFrame =
    if (ExactPairs.eligible(df, idCol, Some(labelCol)))
      ExactPairs.topK(df, idCol, vecCol, k, Some(labelCol), "query_label",
        excludeSameLabel = true, queryPred)
    else hardNegativesNlj(df, idCol, vecCol, labelCol, k, queryPred)

  /** Reference nested-loop plan for [[hardNegatives]] — the parity
    * contract for the blocked kernel; fallback for non-integral
    * id/label types. */
  private[graft] def hardNegativesNlj(df: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int,
      queryPred: Option[Column] = None): DataFrame =
    allPairsTopK(df, idCol, vecCol, k,
      Some(labelCol -> "query_label"),
      col("query_label") =!= col("__graft_nx"), queryPred)

  /** Deterministic hyperplane weights: w(plane, dim) = zero-mean integer
    * from xxhash64(plane, dim), evaluated once at plan-build time and
    * embedded as an `array<double>` literal (constant across rows — no
    * per-row hash evaluation, unlike deriving them inside the plan). */
  private[graft] def planeWeights(plane: Int, dim: Int): Seq[Double] =
    (0 until dim).map { i =>
      val h = XxHash64(Seq(Literal(plane.toLong), Literal(i)), 42L)
        .eval(InternalRow.empty).asInstanceOf[Long]
      val m = 2000001L
      (((h % m) + m) % m - 1000000L).toDouble
    }

  /** Sign-LSH bucket id from `nPlanes` deterministic hyperplanes: bit p
    * set iff the vector's projection onto plane p is positive. */
  def lshBucket(vec: Column, dim: Int, nPlanes: Int): Column =
    (0 until nPlanes).map { p =>
      val plane = array(planeWeights(p, dim).map(lit): _*)
      when(dot(vec, plane) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Within-bucket candidate pairs for one hash table (planes seeded by
    * `tableIdx` so multiple tables are independent). With `labelCol`
    * set, both sides carry the label (query side as `query_label`,
    * candidate side as `__graft_nx`) — same one-mirrored-attribute
    * contract as [[allPairsTopK]]. */
  private def lshCandidates(
      df: DataFrame, idCol: String, vecCol: String,
      dim: Int, nPlanes: Int, tableIdx: Int,
      labelCol: Option[String] = None,
      queryPred: Option[Column] = None): DataFrame = {
    val src = OpsUtil.widen(df)
    val prep = (frame: DataFrame) => frame
      .select(col(idCol).as("id") +:
        labelCol.toSeq.map(l => col(l).as("__graft_lbl")) :+
        asDouble(col(vecCol)).as("v"): _*)
      .withColumn("bucket", lshBucketSeeded(col("v"), dim, nPlanes, tableIdx))
      .withColumn("n", norm(col("v")))
    val v = prep(src)
    // queryPred restricts the QUERY side only; candidates stay full.
    val vq = queryPred.fold(v)(p => prep(src.filter(p)))
    val a = vq.select(col("bucket") +: col("id").as("query_id") +:
      labelCol.toSeq.map(_ => col("__graft_lbl").as("query_label")) :+
      col("v").as("qv") :+ col("n").as("qn"): _*)
    val b = v.select(col("bucket") +: col("id").as("neighbor_id") +:
      labelCol.toSeq.map(_ => col("__graft_lbl").as("__graft_nx")) :+
      col("v").as("cv") :+ col("n").as("cn"): _*)
    val outCols = Seq("query_id", "neighbor_id") ++
      labelCol.toSeq.flatMap(_ => Seq("query_label", "__graft_nx")) ++
      Seq("qv", "qn", "cv", "cn")
    a.join(b, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(outCols.map(col): _*)
  }

  private def lshBucketSeeded(vec: Column, dim: Int, nPlanes: Int, tableIdx: Int): Column =
    (0 until nPlanes).map { p =>
      val plane = array(planeWeights(tableIdx * nPlanes + p, dim).map(lit): _*)
      when(dot(vec, plane) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Score candidate pairs and keep each query's top-k. With `dedup`
    * (multi-table/multi-probe callers), duplicate pairs are dropped
    * AFTER the cosine projection narrows each row to 3 small columns
    * (+carry) — the dedup shuffle then ships ~40 bytes/row instead of
    * both raw vectors (2·dim doubles); the result is identical because
    * cos is a pure function of the pair. */
  private def rankTopK(cand: DataFrame, k: Int, carry: Seq[String] = Nil,
      dedup: Boolean = false): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cos"), col("neighbor_id"))
    val scored = cand
      // try_divide: zero-norm endpoints → NULL cos, ranked last, no abort
      .withColumn("cos", try_divide(dot(col("qv"), col("cv")), col("qn") * col("cn")))
      .select(("query_id" +: carry ++: Seq("neighbor_id", "cos")).map(col): _*)
    (if (dedup) scored.dropDuplicates("query_id", "neighbor_id") else scored)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(("query_id" +: carry ++: Seq("neighbor_id", "rank", "cos")).map(col): _*)
  }

  /** Approximate top-k: compare only vectors sharing an LSH bucket.
    * Returns (query_id, neighbor_id, rank) within-bucket; recall rises
    * with fewer planes (bigger buckets) or multiple tables. */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
      dim: Int, nPlanes: Int = 8): DataFrame =
    rankTopK(lshCandidates(df, idCol, vecCol, dim, nPlanes, tableIdx = 0), k)

  /** Within-bucket candidate ID PAIRS for one table — the narrow form
    * of [[lshCandidates]] for multi-table callers (guide §8: shuffle
    * ids and decide, attach payloads once): the bucket join carries
    * (bucket, id[, label]) only — never the vectors — so a candidate
    * row costs ~2 longs instead of 2·dim doubles, and the multi-table
    * union dedups BEFORE any cosine exists. Tables overlap heavily by
    * design (that is the recall dial), so the same pair arrives from
    * many tables — measured 358,698 candidate rows for 7,880 distinct
    * pairs at sf0.1 (45×): scoring after the dedup does 45× less
    * cosine work and the join stages copy no vector bytes per pair. */
  private def lshCandidateIdPairs(
      df: DataFrame, idCol: String, vecCol: String,
      dim: Int, nPlanes: Int, tableIdx: Int,
      labelCol: Option[String] = None,
      queryPred: Option[Column] = None): DataFrame = {
    val src = OpsUtil.widen(df)
    val prep = (frame: DataFrame) => frame
      .select(col(idCol).as("id") +:
        labelCol.toSeq.map(l => col(l).as("__graft_lbl")) :+
        asDouble(col(vecCol)).as("v"): _*)
      .withColumn("bucket", lshBucketSeeded(col("v"), dim, nPlanes, tableIdx))
      .drop("v")
    val v = prep(src)
    val vq = queryPred.fold(v)(p => prep(src.filter(p)))
    val a = vq.select(col("bucket") +: col("id").as("query_id") +:
      labelCol.toSeq.map(_ => col("__graft_lbl").as("query_label")): _*)
    val b = v.select(col("bucket") +: col("id").as("neighbor_id") +:
      labelCol.toSeq.map(_ => col("__graft_lbl").as("__graft_nx")): _*)
    a.join(b, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(("query_id" +: "neighbor_id" +:
        labelCol.toSeq.flatMap(_ => Seq("query_label", "__graft_nx"))).map(col): _*)
  }

  /** Re-attach both endpoints' vectors (and norms) to DISTINCT id
    * pairs by unique id — the payload-moves-once step after the narrow
    * candidate dedup. */
  private def attachPairVectors(
      df: DataFrame, idCol: String, vecCol: String,
      pairs: DataFrame): DataFrame = {
    val src = OpsUtil.widen(df)
    val vq = src.select(col(idCol).as("query_id"),
        asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val vc = src.select(col(idCol).as("neighbor_id"),
        asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
    pairs.join(vq, Seq("query_id")).join(vc, Seq("neighbor_id"))
  }

  /** Multi-table LSH top-k: union candidates from `tables` independent
    * plane sets before ranking — recall rises as 1-(1-p)^tables while
    * each table keeps the same bucket-join shuffle structure (the
    * standard recall/compute dial for LSH ANN at scale). Candidates
    * travel as ID PAIRS and dedup before vectors attach and the cosine
    * is computed once per distinct pair ([[lshCandidateIdPairs]]) —
    * same pairs, same cosines, same ranks as scoring every duplicate. */
  def lshTopKMultiTable(
      df: DataFrame, idCol: String, vecCol: String, k: Int,
      dim: Int, nPlanes: Int = 8, tables: Int = 4): DataFrame = {
    require(tables >= 1)
    // coalesce before the dedup exchange: the union multiplies map
    // tasks by `tables`, and each map task of the dedup shuffle writes
    // one file per reducer (guide §2.2 — measured as the dominant cost
    // of this stage: 256 map tasks × 32 reducers of bypass-merge file
    // creations for 2-long rows). Slot-count partitions keep compute
    // fully parallel, and the map-side partial dedup then collapses
    // cross-table duplicates BEFORE they ship.
    val slots = df.sparkSession.sparkContext.defaultParallelism
    val pairs = (0 until tables)
      .map(t => lshCandidateIdPairs(df, idCol, vecCol, dim, nPlanes, t))
      .reduce(_ unionAll _)
      .coalesce(slots)
      .dropDuplicates("query_id", "neighbor_id")
    rankTopK(attachPairVectors(df, idCol, vecCol, pairs), k)
  }

  /** Hard-negative mining at corpus scale — the bucketed sibling
    * [[hardNegatives]]'s scaladoc promises: candidate generation goes
    * through the SAME multi-table sign-LSH bucket join as
    * [[lshTopKMultiTable]] (never all-pairs), with the different-label
    * filter applied to the candidate stream before ranking. Output
    * matches the exact form: (query_id, query_label, neighbor_id,
    * rank) — an approximate subset whose recall rises with `tables` /
    * falls with `nPlanes`, the standard LSH dial. At 10⁹ vectors this
    * replaces the cartesian product with `tables` bucket equi-joins.
    * `queryPred` restricts the QUERY side only (the candidate corpus
    * stays full) — mining negatives for a batch of anchors, or the
    * sampled-recall verification pattern. */
  def hardNegativesLsh(
      df: DataFrame, idCol: String, vecCol: String, labelCol: String,
      k: Int, dim: Int, nPlanes: Int = 6, tables: Int = 3,
      queryPred: Option[Column] = None): DataFrame = {
    require(tables >= 1)
    // Narrow id-pair candidates, label-filtered per table, deduped
    // BEFORE vectors attach (guide §8; see lshCandidateIdPairs) —
    // query_label is functionally dependent on query_id, so the pair
    // dedup keeps it consistent.
    val pairs = (0 until tables)
      .map(t => lshCandidateIdPairs(df, idCol, vecCol, dim, nPlanes, t,
        Some(labelCol), queryPred))
      .reduce(_ unionAll _)
      .filter(col("query_label") =!= col("__graft_nx"))
      // coalesce before the dedup exchange — the lshTopKMultiTable
      // argument: tables× fewer map tasks, tables× fewer shuffle
      // files, cross-table duplicates collapse map-side.
      .coalesce(df.sparkSession.sparkContext.defaultParallelism)
      .dropDuplicates("query_id", "neighbor_id")
    rankTopK(
      attachPairVectors(df, idCol, vecCol,
        pairs.select("query_id", "query_label", "neighbor_id")),
      k, carry = Seq("query_label")).drop("cos")
  }

  /** Hard-negative mining through the IVF centroid buckets — the
    * second scale sibling of [[hardNegatives]], for corpora whose
    * embedding space clusters (where k-means buckets concentrate true
    * neighbors better than data-oblivious hyperplanes): candidate
    * generation is [[ivfTopK]]'s probe-bucket equi-join with the
    * different-label filter applied to the candidate stream before
    * ranking. Recall dial: nProbe/nCentroids. Same output contract as
    * the exact form: (query_id, query_label, neighbor_id, rank);
    * `queryPred` restricts the query side only, like [[ivfpqTopK]]. */
  def hardNegativesIvf(
      df: DataFrame, idCol: String, vecCol: String, labelCol: String,
      k: Int, nCentroids: Int = 16, nProbe: Int = 4, iters: Int = 3,
      queryPred: Option[Column] = None): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCentroids)
    val base = OpsUtil.widen(df)
      .select(col(idCol).as("id"), col(labelCol).as("lbl"),
        asDouble(col(vecCol)).as("v"))
      .filter(col("v").isNotNull)
      .localCheckpoint(false)
    val cents = fitCentroids(
      fitSample(base, FitSampleFactor * nCentroids), nCentroids, iters)
    val kFit = cents.length
    val probeN = math.min(nProbe, kFit)
    val v = base
      .withColumn("n", norm(col("v")))
      .withColumn("scores", centroidScores(col("v"), cents))
    val index = v
      .withColumn("cid", argmaxIdx(col("scores")))
      .select(col("cid"), col("id").as("neighbor_id"),
        col("lbl").as("__graft_nx"), col("v").as("cv"), col("n").as("cn"))
    // queryPred is stated over the ORIGINAL frame's columns — applied
    // as a semi-join on the unique id (the ivfpqTopK pattern).
    val vq = queryPred.fold(v) { p =>
      v.join(OpsUtil.widen(df).filter(p).select(col(idCol).as("id")),
        Seq("id"), "left_semi")
    }
    val queries = vq
      .withColumn("cid", explode(topIdx(col("scores"), kFit, probeN)))
      .select(col("cid"), col("id").as("query_id"),
        col("lbl").as("query_label"), col("v").as("qv"), col("n").as("qn"))
    val cand = queries.join(index, Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .filter(col("query_label") =!= col("__graft_nx"))
      .select("query_id", "neighbor_id", "query_label", "qv", "qn", "cv", "cn")
    // No dedup: each neighbor is indexed under exactly ONE centroid
    // (argmax cid) while only queries explode to nProbe buckets, so
    // the cid equi-join emits every (query, neighbor) at most once —
    // a dropDuplicates here would shuffle the candidate set to prove
    // what the plan shape already guarantees.
    rankTopK(cand, k, carry = Seq("query_label")).drop("cos")
  }

  // ---- IVF (inverted-file) ANN: the centroid-bucketed scale path ----

  /** Deterministic IVF centroid fit: Lloyd iterations from hash-seeded
    * initial centers. All per-dimension sums go through DECIMAL so the
    * means are independent of partition/merge order — the fit is
    * bit-reproducible across runs and cluster layouts. The collected
    * result is index METADATA (nCentroids × dim doubles), not data;
    * assignment happens later as a pure column expression over the
    * embedded literals. */
  def ivfCentroids(
      df: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, iters: Int = 3): Array[Array[Double]] =
    fitCentroids(
      fitSample(
        df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
          .filter(col("v").isNotNull),
        FitSampleFactor * nCentroids),
      nCentroids, iters)

  /** Rows per requested centroid used to train a quantizer. Lloyd
    * iterations never need the full corpus — FAISS practice is a
    * bounded training sample per centroid — and at 100 TB iterating
    * the fit over every vector would be the dominant cost of the whole
    * index build. */
  private val FitSampleFactor = 200L

  /** Deterministic hash-sampled training set for quantizer fits: the
    * key hash keeps the sample reproducible across runs and
    * partitionings, and when the corpus is already at-or-under target
    * the frame passes through untouched (small-data fits stay
    * bit-identical to the unsampled ones). Hashes with xxhash64, NOT
    * the numeric portable hash — ids here can be any type (a string id
    * cast to long is NULL, which would silently empty the sample), and
    * the fit needs no cross-engine reproducibility, only within-Spark
    * determinism.
    *
    * NO full-corpus `count()`: at 100 TB a complete pre-count is the
    * dominant cost of the fit it exists to bound. Instead (a) a
    * LIMIT-bounded probe (stops at the first targetRows+1 rows) decides
    * small-corpus pass-through, then (b) ONE sampling scan materializes
    * a coarse 1% hash-sample — the floor the old count-based rate
    * bottomed out at, so the materialization is never WORSE than the
    * count()-era plan — whose count (over the checkpointed sample, not
    * the corpus) calibrates a consistent-subset threshold (smaller
    * threshold ⊂ larger, same hash), so trimming to target re-filters
    * the materialized sample without touching the corpus again. Only
    * the under-sampled case (corpus < 100× target) pays a second
    * corpus scan to widen — bounded, since that rescan checkpoints
    * ~target rows. */
  private[graft] def fitSample(base: DataFrame, targetRows: Long): DataFrame = {
    // Bounded probe: LocalLimit stops each task early; no full scan.
    val probe = base.limit(math.min(targetRows + 1, Int.MaxValue.toLong).toInt).count()
    if (probe <= targetRows) return base
    val M = 1000000L
    val h = pmod(xxhash64(col("id")), lit(M))
    val coarseThr = M / 100
    val coarse = base.filter(h < coarseThr).localCheckpoint(false)
    val s = math.max(coarse.count(), 1L)
    if (s <= targetRows) {
      // Corpus ≈ 100·s but target wants more: widen in one more scan.
      val thr = math.min(M, coarseThr * targetRows / s)
      if (thr >= M) base
      else base.filter(h < thr).localCheckpoint(false)
    } else {
      // Trim the MATERIALIZED sample — threshold subsets are consistent.
      coarse.filter(h < math.max(1L, coarseThr * targetRows / s))
    }
  }

  /** Map-task cap for the Lloyd fits' per-iteration stats shuffles.
    * The fit input is SAMPLE-BOUNDED by design ([[FitSampleFactor]] ×
    * k rows, ≤ tens of thousands), so its per-iteration explode +
    * groupBy shuffle is block-count-bound, not data-bound: M map tasks
    * × R reducers shuffle blocks (guide §2.2) at ~62 rows per block
    * cost the fit far more than the arithmetic (the per-query scaling
    * block shows 8 cores beating 32 on exactly these queries). Eight
    * tasks keep ≤ ~6.4k sample rows (~26M kernel flops) per task per
    * iteration and cut the per-iteration block count 4× at local[32]
    * — and a bounded sample means this is the right number at ANY
    * corpus scale, not a local tune. */
  private val FitStatsPartitions = 8

  /** Fit over a prepared (id, v) frame — callers materialize it once
    * (the fit re-reads it per Lloyd iteration). */
  private def fitCentroids(
      v0: DataFrame, nCentroids: Int, iters: Int): Array[Array[Double]] = {
    val v = v0.coalesce(FitStatsPartitions)
    // Fewer rows than requested centroids → fit what exists; callers
    // clamp nProbe to the fitted count.
    var cents: Array[Array[Double]] = v
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(nCentroids)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    var it = 0
    while (it < iters) {
      val assigned = v.withColumn("scores", centroidScores(col("v"), cents))
        .withColumn("cid", argmaxIdx(col("scores")))
      val stats = assigned
        .select(col("cid"), posexplode(col("v")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("col").cast("decimal(30,12)")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone())
      stats.groupBy(_.getInt(0)).foreach { case (cid, rows) =>
        rows.foreach { r =>
          val n = r.getLong(3)
          if (n > 0)
            next(cid)(r.getInt(1)) = (r.getDecimal(2).doubleValue() / n)
        }
      }
      cents = next
      it += 1
    }
    cents
  }

  /** One fit of a FUSED multi-fit: which contiguous slice of the
    * prepared `v` column it clusters (`None` = the full vector;
    * `Some((start1, len))` is 1-based like Spark's `slice`) and its
    * centroid count. */
  private final case class LloydSpec(part: Option[(Int, Int)], k: Int)

  /** ALL of an index's Lloyd fits driven together — the coarse
    * quantizer (full vector) and the m per-subspace codebooks share
    * ONE init collect and ONE assignment-stats job per iteration,
    * instead of 1+m independent fit loops each running its own
    * per-iteration job chain (measured at sf0.1: the 27-job fit wall
    * dominated every IVF-PQ query; the fix is guide §1.2 step 1 —
    * fewer jobs/passes — because the per-fit arithmetic was already
    * one codegen'd kernel).
    *
    * Bit-identical to the per-fit loops by construction:
    *   - init takes the SAME rows (one `orderBy(xxhash64(id), id)`
    *     collect; each fit keeps its first k rows, sliced locally —
    *     Scala's clamped `Array.slice` matches Spark's `slice`);
    *   - each iteration evaluates each fit's own assignment
    *     expression (same kernel, same centroids) and sums the same
    *     exact-DECIMAL (fit, cid, pos) groups — fusing only changes
    *     which JOB carries the groups, and decimal sums are
    *     order-free;
    *   - absent (fit, cid) groups keep the previous centroid, as
    *     before. */
  private def fitCentroidsFused(
      sample0: DataFrame, specs: Seq[LloydSpec],
      iters: Int): IndexedSeq[Array[Array[Double]]] = {
    // Sample-bounded input → bounded map-task count for the
    // per-iteration stats shuffles (see [[FitStatsPartitions]]).
    val sample = sample0.coalesce(FitStatsPartitions)
    val maxK = specs.map(_.k).max
    val initRows = sample
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(maxK)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    def sliced(v: Array[Double], part: Option[(Int, Int)]): Array[Double] =
      part match {
        case Some((s1, len)) => v.slice(s1 - 1, s1 - 1 + len)
        case None            => v.clone()
      }
    var cents: IndexedSeq[Array[Array[Double]]] =
      specs.toIndexedSeq.map(sp =>
        initRows.take(sp.k).map(sliced(_, sp.part)))
    def vcOf(part: Option[(Int, Int)]): Column = part match {
      case Some((s1, len)) => slice(col("v"), s1, len)
      case None            => col("v")
    }
    var it = 0
    while (it < iters) {
      val fitStructs = specs.zipWithIndex.map { case (sp, f) =>
        val vc = vcOf(sp.part)
        struct(
          argmaxIdx(centroidScores(vc, cents(f))).as("cid"),
          vc.as("sv"))
      }
      val stats = sample
        .select(posexplode(array(fitStructs: _*)).as(Seq("f", "x")))
        .select(col("f"), col("x.cid").as("cid"), posexplode(col("x.sv")))
        .groupBy(col("f"), col("cid"), col("pos"))
        .agg(sum(col("col").cast("decimal(30,12)")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.map(_.clone()))
      stats.foreach { r =>
        val n = r.getLong(4)
        if (n > 0)
          next(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
            r.getDecimal(3).doubleValue() / n
      }
      cents = next
      it += 1
    }
    cents
  }

  /** score_c = 2·dot(v,c) − ‖c‖² per centroid — argmax of this equals
    * argmin of Euclidean distance (‖v‖² is constant per row). One
    * codegen'd expression carrying the matrix as a reference object:
    * composing k literal-array dots put k×dim literal nodes in the
    * plan and codegen compile time dominated the IVF fit. */
  private def centroidScores(v: Column, cents: Array[Array[Double]]): Column =
    VectorFunctions.centroidScores(v, cents.toSeq.map(_.toSeq))

  /** 0-based index of the array's maximum (first occurrence). */
  private def argmaxIdx(scores: Column): Column =
    (array_position(scores, array_max(scores)) - 1).cast("int")

  /** 0-based indices of the `n` largest scores, best first. */
  private def topIdx(scores: Column, nCentroids: Int, n: Int): Column =
    slice(
      transform(
        array_sort(zip_with(
          scores,
          sequence(lit(0), lit(nCentroids - 1)).cast("array<double>"),
          (s, i) => struct((-s).as("negs"), i.as("i")))),
        x => x.getField("i").cast("int")),
      1, n)

  /** IVF-Flat approximate top-k: vectors are bucketed by nearest
    * centroid; each query probes its `nProbe` nearest centroids and
    * ranks exact cosine within the probed buckets. Recall/compute dial:
    * nProbe/nCentroids. Shuffle shape matches the LSH path — candidate
    * generation is a bucket equi-join, never all-pairs; the index side
    * is computed once per centroid set and shuffles only (cid, id,
    * vector). */
  def ivfTopK(
      df: DataFrame, idCol: String, vecCol: String, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4, iters: Int = 3): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCentroids)
    // Materialize the narrow (id, vector) base once: the fit reads it
    // per Lloyd iteration and the index/query branches both derive
    // from it (lazy checkpoint — no job until the fit's first action).
    // NULL vectors are unsearchable and would NPE the Lloyd fit's
    // driver-side collects — drop them from index and queries alike.
    val base = OpsUtil.widen(df)
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .filter(col("v").isNotNull)
      .localCheckpoint(false)
    val cents = fitCentroids(
      fitSample(base, FitSampleFactor * nCentroids), nCentroids, iters)
    // The fit caps centroids at the row count; probe within what exists.
    val kFit = cents.length
    val probeN = math.min(nProbe, kFit)
    val v = base
      .withColumn("n", norm(col("v")))
      .withColumn("scores", centroidScores(col("v"), cents))
    val index = v
      .withColumn("cid", argmaxIdx(col("scores")))
      .select(col("cid"), col("id").as("neighbor_id"),
        col("v").as("cv"), col("n").as("cn"))
    val queries = v
      .withColumn("cid", explode(topIdx(col("scores"), kFit, probeN)))
      .select(col("cid"), col("id").as("query_id"),
        col("v").as("qv"), col("n").as("qn"))
    val cand = queries.join(index, Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id", "qv", "qn", "cv", "cn")
    // No dedup: one index bucket per neighbor (argmax cid) → the cid
    // join emits each (query, neighbor) at most once (see
    // hardNegativesIvf).
    rankTopK(cand, k)
  }

  // ----- Product quantization (the FAISS IVFPQ shape) -----

  /** A fitted IVF-PQ index: coarse centroids + per-subspace codebooks.
    * Pure metadata (nCentroids·dim + m·kSub·dim/m doubles) — the
    * fit-once / serve-many unit. At 100 TB the index build and the
    * query workloads are separate jobs; persisting this decouples
    * them. */
  final case class AnnIndex(
      centroids: Array[Array[Double]], books: Seq[Seq[Seq[Double]]])

  /** Assign every vector its nearest coarse centroid from a prebuilt
    * [[AnnIndex]] — a STATELESS projection (centroids ride as plan
    * literals), so the same call runs on a batch frame or a streaming
    * one unchanged: the serving-side "route this embedding to its
    * shard/cluster" step of an IVF deployment. Adds
    * (centroid, centroid_score); NULL vectors pass through with NULL
    * assignment. */
  def assignCentroid(df: DataFrame, vecCol: String, index: AnnIndex): DataFrame =
    assignCentroid(df, vecCol, index.centroids)

  /** Same routing against a bare centroid matrix — the corpus-DOMAIN
    * face: fit [[ivfCentroids]] over the embedding column (bounded
    * sample, deterministic Lloyd), then label every document with its
    * nearest centroid as a topic/domain id. The (per-domain × source)
    * contingency that falls out of one groupBy downstream is the
    * coverage/diversity audit a mixture designer reads; the
    * assignment itself is the same stateless projection IVF serving
    * uses, so it costs one corpus pass at any scale. */
  def assignCentroid(
      df: DataFrame, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    val v = asDouble(col(vecCol))
    val scores = centroidScores(v, centroids)
    df.withColumn("centroid",
        when(v.isNotNull, argmaxIdx(scores)))
      .withColumn("centroid_score",
        when(v.isNotNull, array_max(scores)))
  }

  /** Fit an [[AnnIndex]]: one bounded training sample serves the
    * coarse quantizer and every PQ subspace; the coarse fit runs
    * concurrently with the m subspace fits (all independent Spark jobs
    * over the same sample). */
  def fitIndex(
      df: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, m: Int, kSub: Int, iters: Int = 3): AnnIndex =
    fitIndexPrepared(
      OpsUtil.widen(df)
        .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
        .filter(col("v").isNotNull)
        .localCheckpoint(false),
      nCentroids, m, kSub, iters)

  private def fitIndexPrepared(
      base: DataFrame, nCentroids: Int, m: Int, kSub: Int,
      iters: Int): AnnIndex = {
    require(m > 0 && kSub > 0)
    val sample = fitSample(base, FitSampleFactor * math.max(nCentroids, kSub))
    val dim = sample.select(size(col("v"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    // Coarse + m subspace fits FUSED into one job chain (one init
    // collect, one stats job per iteration) — same results as the
    // former 1+m concurrent fit loops, ~(1+m)× fewer jobs.
    val all = fitCentroidsFused(
      sample,
      LloydSpec(None, nCentroids) +:
        (0 until m).map(j => LloydSpec(Some((j * subDim + 1, subDim)), kSub)),
      iters)
    AnnIndex(all.head, all.tail.map(_.map(_.toSeq).toSeq))
  }

  /** Persist a fitted index as parquet (kind, i, j, vec) — readable by
    * any engine, diffable, and safe to version alongside the data it
    * indexes. */
  def saveIndex(index: AnnIndex, path: String,
      spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    val rows =
      index.centroids.zipWithIndex.toSeq.map { case (c, i) =>
        ("cent", i, 0, c.toSeq)
      } ++
        index.books.zipWithIndex.flatMap { case (b, j) =>
          b.zipWithIndex.map { case (cw, c) => ("book", j, c, cw) }
        }
    rows.toDF("kind", "i", "j", "vec")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Load a persisted index (inverse of [[saveIndex]]). */
  def loadIndex(path: String,
      spark: org.apache.spark.sql.SparkSession): AnnIndex = {
    val rows = spark.read.parquet(path)
      .select("kind", "i", "j", "vec").collect()
    val cents = rows.filter(_.getString(0) == "cent")
      .sortBy(_.getInt(1))
      .map(_.getSeq[Double](3).toArray)
    val books = rows.filter(_.getString(0) == "book")
      .groupBy(_.getInt(1)).toSeq.sortBy(_._1)
      .map { case (_, cws) =>
        cws.sortBy(_.getInt(2)).map(_.getSeq[Double](3).toSeq).toSeq
      }
    AnnIndex(cents, books)
  }

  /** Fit per-subspace PQ codebooks: the vector splits into `m`
    * contiguous subspaces and each runs the same deterministic Lloyd
    * fit as the IVF coarse quantizer (hash-seeded init, DECIMAL sums —
    * reproducible across runs/partitionings). Returns index METADATA
    * (m × kSub × dim/m doubles), not data. */
  def pqCodebooks(
      df: DataFrame, idCol: String, vecCol: String,
      m: Int, kSub: Int, iters: Int = 3): Seq[Seq[Seq[Double]]] =
    pqCodebooksPrepared(
      fitSample(
        OpsUtil.widen(df)
          .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
          .filter(col("v").isNotNull)
          .localCheckpoint(false),
        FitSampleFactor * kSub),
      m, kSub, iters)

  /** Fit over an already-prepared `(id, v)` frame — [[ivfpqTopK]]
    * passes its checkpointed base directly so the dominant data
    * structure is materialized once, not once per caller. */
  private def pqCodebooksPrepared(
      base: DataFrame, m: Int, kSub: Int, iters: Int): Seq[Seq[Seq[Double]]] = {
    require(m > 0 && kSub > 0)
    val dim = base.select(size(col("v"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    // The m subspace fits FUSED into one job chain (see
    // [[fitCentroidsFused]]) — formerly m concurrent per-fit loops,
    // whose m×iters jobs dominated the index build wall.
    fitCentroidsFused(
      base,
      (0 until m).map(j => LloydSpec(Some((j * subDim + 1, subDim)), kSub)),
      iters)
      .map(_.map(_.toSeq).toSeq)
  }

  /** Attach `pq_codes` (array<int>, one codeword index per subspace):
    * each subspace picks its Euclidean-nearest codeword via the same
    * codegen'd score kernel as IVF assignment. Pure projection — the
    * m·kSub·subDim codebook rides along as a reference object, so at
    * 100 TB encoding is an embarrassingly parallel scan that shrinks
    * each vector from 4·dim bytes to m codes before anything persists
    * or shuffles. */
  def pqEncode(
      df: DataFrame, vecCol: String,
      books: Seq[Seq[Seq[Double]]]): DataFrame = {
    val subDim = books.head.head.length
    val expectedDim = books.length * subDim
    val codes = books.indices.map { j =>
      argmaxIdx(centroidScores(
        slice(asDouble(col(vecCol)), j * subDim + 1, subDim),
        books(j).map(_.toArray).toArray))
    }
    // Fail fast on a dimension mismatch: slice() would silently hand
    // truncated subvectors to the kernel and emit wrong codes (AdcScore
    // validates its inputs; the encoder must too). NULL vectors stay
    // NULL — they are data absence, not corruption, and downstream
    // ranking already sinks null-coded rows via the zero-norm guard.
    df.withColumn("pq_codes",
      when(col(vecCol).isNull, lit(null).cast("array<int>"))
        .when(size(col(vecCol)) === expectedDim, array(codes: _*))
        .otherwise(raise_error(concat(
          lit(s"pqEncode: expected vector dim $expectedDim, got "),
          size(col(vecCol)).cast("string")))))
  }

  /** IVF-PQ approximate top-k with refinement (the FAISS IVFPQR
    * shape): the IVF coarse quantizer prunes candidates (probe
    * `nProbe` of `nCentroids` buckets); within the probed buckets the
    * database side is scored from its PQ codes via the codegen'd
    * asymmetric-distance kernel (query exact, index side reads m
    * codebook rows per pair instead of the full vector); the ADC
    * top-`refine` per query are then re-ranked by exact cosine after
    * joining their raw vectors back by id. PQ estimates rank coarsely
    * by construction (quantization error swamps within-cluster cosine
    * gaps), so the refine stage is what buys exact-grade top-k — at
    * `refine` rows per query, not per candidate.
    *
    * 100 TB shape: identical candidate shuffle structure to
    * [[ivfTopK]] (bucket equi-join, never all-pairs), but the
    * candidate join ships `(cid, id, m×int)` instead of
    * `(cid, id, dim×double)` — ~dim·8/m smaller per row, the
    * difference between an index that fits in executor memory and one
    * that spills. The refinement join touches only
    * `queries × refine` rows of the raw vector table, keyed by unique
    * id (skew-free). */
  def ivfpqTopK(
      df: DataFrame, idCol: String, vecCol: String, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4,
      m: Int = 8, kSub: Int = 16, iters: Int = 3,
      refine: Int = 0, queryPred: Option[Column] = None,
      prebuilt: Option[AnnIndex] = None): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCentroids)
    // NULL vectors: unsearchable, and the fit's driver-side collects
    // would NPE on them — excluded from index and queries alike.
    val base = OpsUtil.widen(df)
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .filter(col("v").isNotNull)
      .localCheckpoint(false)
    val index = prebuilt.getOrElse(
      fitIndexPrepared(base, nCentroids, m, kSub, iters))
    searchEncodedPrepared(base, encodeCorpusPrepared(base, index), df,
      idCol, index, k, nProbe, refine, queryPred)
  }

  /** Encode a corpus against a FIXED [[AnnIndex]] into the searchable
    * inverted-index table (cid, neighbor_id, pq_codes, est_n) — one
    * stateless codegen projection per row. Because the index is fixed,
    * encoding is APPEND-COMPOSABLE: encode(A) ∪ encode(B) equals
    * encode(A ∪ B) row-for-row (oracle sim_topk_pq_incremental), so
    * incremental index maintenance is a plain append of each new
    * batch's encoding — persist as parquet (partitioned by cid at
    * scale) and never re-touch the existing corpus. `est_n` is the
    * reconstructed-vector norm from codes alone (subspaces are
    * orthogonal coordinate blocks: ‖x̂‖² = Σ_j ‖codeword_j‖²) — a
    * lookup into m tiny literal arrays, no vector access at search
    * time. */
  def encodeCorpus(
      df: DataFrame, idCol: String, vecCol: String,
      index: AnnIndex, storeVectors: Boolean = false): DataFrame =
    encodeCorpusPrepared(
      OpsUtil.widen(df)
        .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
        .filter(col("v").isNotNull),
      index, storeVectors)

  private def encodeCorpusPrepared(
      base: DataFrame, index: AnnIndex,
      storeVectors: Boolean = false): DataFrame = {
    val AnnIndex(cents, books) = index
    val scored = base.withColumn("scores", centroidScores(col("v"), cents))
    val normSqArrs = books.map(b => array(b.map(cw =>
      lit(cw.map(x => x * x).sum)): _*))
    val estNorm = sqrt(books.indices.map { j =>
      element_at(normSqArrs(j), col("pq_codes")(j) + 1)
    }.reduce(_ + _))
    // `storeVectors` co-locates the RAW vector (+ its true norm) with
    // the codes — the self-contained serving layout: under
    // [[saveEncodedCorpus]]'s cid partitioning, [[nearDupAgainst]]'s
    // exact refinement then runs inside the probed partitions and the
    // separate history vector table is never read at serve time. The
    // price is vector-sized index rows (IVF-Flat storage alongside the
    // PQ codes); without it the index stays m bytes/row and the
    // refinement joins the history table by id.
    val extra =
      if (storeVectors) Seq(col("v").as("hv"), norm(col("v")).as("hn"))
      else Seq.empty
    pqEncode(scored, "v", books)
      .withColumn("cid", argmaxIdx(col("scores")))
      .select(Seq(col("cid"), col("id").as("neighbor_id"), col("pq_codes"),
        estNorm.as("est_n")) ++ extra: _*)
  }

  /** Persist an [[encodeCorpus]] table PARTITIONED BY its coarse
    * bucket (`cid`) — the at-scale IVF layout the encodeCorpus doc
    * promises ("partitioned by cid at scale"): one directory per
    * centroid, so [[nearDupAgainst]]'s static probed-cid pruning
    * reads ONLY the probed buckets' files. Sized serve-optimally —
    * centroid count ∝ corpus, constant per-bucket bytes (the bm25
    * partitioned-posting contract) — probed bytes ≈ |batch| × nProbe
    * × bucket size, FLAT as the corpus grows; a flat layout re-scans
    * everything per serve. (√corpus centroid sizing, the in-memory
    * ANN balance point, leaves per-bucket bytes growing as √history
    * — the trade for ∝-corpus sizing is centroid scoring linear in
    * bucket count, fine while the centroid matrix fits an executor.)
    * Repartitioned on cid first so each bucket is one file, not one
    * per task. Appends (the [[graft.streaming.StreamingOps
    * .pqIndexStream]] maintenance loop) go through
    * [[appendEncodedCorpus]]. */
  def saveEncodedCorpus(encoded: DataFrame, path: String): Unit =
    writeEncodedCorpus(encoded, path, "overwrite")

  /** Append a new batch's [[encodeCorpus]] output to an existing
    * [[saveEncodedCorpus]] layout — the incremental-maintenance write
    * (encoding is append-composable because the index is fixed; see
    * [[encodeCorpus]]). Each append adds at most one file per touched
    * cid directory, so a batch-cadence maintenance loop grows file
    * counts linearly in BATCHES, not rows — compact by re-running
    * [[saveEncodedCorpus]] over [[loadEncodedCorpus]] when listing
    * cost matters. */
  def appendEncodedCorpus(encoded: DataFrame, path: String): Unit =
    writeEncodedCorpus(encoded, path, "append")

  private def writeEncodedCorpus(
      encoded: DataFrame, path: String, mode: String): Unit =
    encoded.repartition(col("cid"))
      .write.mode(mode).partitionBy("cid").parquet(path)

  /** Compact an append-maintained [[saveEncodedCorpus]] layout back
    * to one file per cid directory (appends add ≤ 1 file per touched
    * cid per batch — file counts grow with BATCHES; this folds them
    * back). Rows untouched; see
    * [[graft.ops.OpsUtil.compactPartitionedDir]] for the swap
    * semantics and the don't-compact-under-a-live-serve caveat. */
  def compactEncodedCorpus(
      spark: org.apache.spark.sql.SparkSession, path: String): Unit =
    OpsUtil.compactPartitionedDir(spark, path, "cid")

  /** Load a persisted encoded corpus (inverse of
    * [[saveEncodedCorpus]]; also reads a flat [[encodeCorpus]]
    * parquet — the column set is identical either way). A
    * stored-vector layout (`encodeCorpus(storeVectors = true)`)
    * keeps its `hv`/`hn` columns. */
  def loadEncodedCorpus(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    val extra =
      if (df.columns.contains("hv")) Seq(col("hv"), col("hn")) else Seq.empty
    df.select(Seq(col("cid").cast("int").as("cid"),
      col("neighbor_id"), col("pq_codes"), col("est_n")) ++ extra: _*)
  }

  /** Embedding near-dup of an ARRIVAL batch against a persisted
    * encoded history — the embedding modality's fit-once/serve-many
    * face (the exact / SimHash / winnow *Against pattern applied to
    * [[encodeCorpus]]'s append-composable index): probe each arrival
    * vector's nProbe nearest centroids, ADC-score the probed buckets
    * from codes alone, shortlist at `threshold - adcMargin` (the PQ
    * estimate's slack — candidates the estimate puts clearly below
    * the threshold are never exact-scored), then EXACT-cosine refine
    * the shortlist against the historical vector table and keep
    * `cos >= threshold`. Output (new_id, base_id, cos): every emitted
    * pair is exactly scored; recall is bounded by the probes + margin
    * (the standard IVF-PQ dial — raise nProbe/adcMargin toward the
    * brute-force baseline). History is never re-encoded; shuffles
    * carry m-byte codes until the shortlist, raw vectors only for the
    * (tiny) refinement join.
    *
    * The probed bucket ids are collected to the driver (≤ |batch| ×
    * nProbe ints — the bounded-collect class) and applied as a STATIC
    * filter on the encoded table before the join: on a
    * [[saveEncodedCorpus]]-partitioned layout that is file-level
    * partition pruning (unprobed history is never read); on a flat
    * frame it is a semantically-free row filter (the cid equi-join
    * admits only probed buckets anyway).
    *
    * If `encoded` is a STORED-VECTOR layout (`encodeCorpus(
    * storeVectors = true)` — columns `hv`/`hn` present), the exact
    * refinement runs inline on the probed rows themselves and
    * `historyVecs` is NEVER READ (DataFrames are lazy; the argument
    * is untouched on that path) — the serve's only input is the
    * probed partitions, so its cost is flat in history size. Without
    * stored vectors the shortlist joins `historyVecs` by id — an
    * extra scan of the full vector table per serve.
    *
    * `serveStats`: pass an [[org.apache.spark.sql.Observation]] to
    * measure the adcMargin dial's cost on the serve's own action
    * (`adc_candidates` admitted to exact refinement, `probed_buckets`)
    * — margin tuning should be measured, not guessed. */
  def nearDupAgainst(
      newVecs: DataFrame, historyVecs: DataFrame, encoded: DataFrame,
      idCol: String, vecCol: String, index: AnnIndex,
      threshold: Double, nProbe: Int = 4,
      adcMargin: Double = 0.15,
      serveStats: Option[org.apache.spark.sql.Observation] = None)
      : DataFrame =
    nearDupAgainstStaged(
      stageNearDupArrivals(newVecs, idCol, vecCol)
        .localCheckpoint(false), // feeds the probe AND the refinement join
      historyVecs, encoded, idCol, vecCol, index, threshold, nProbe,
      adcMargin, serveStats)

  /** The arrival projection of the embedding near-dup serve — the
    * [[graft.ops.Dedup.stageExactArrivals]] split: a streaming caller
    * persists this, pairs it with [[nearDupAgainstStaged]], and
    * releases it after the sink, keeping block ownership exact. */
  private[graft] def stageNearDupArrivals(
      newVecs: DataFrame, idCol: String, vecCol: String): DataFrame =
    OpsUtil.widen(newVecs)
      .select(col(idCol).as("new_id"), asDouble(col(vecCol)).as("qv"))
      .filter(col("qv").isNotNull)
      .withColumn("qn", norm(col("qv")))

  /** [[nearDupAgainst]] over an already-STAGED arrival frame (caller
    * made it stable and owns its blocks; `idCol`/`vecCol` name the
    * HISTORY table's columns for the non-stored-vector refinement
    * join). */
  private[graft] def nearDupAgainstStaged(
      q: DataFrame, historyVecs: DataFrame, encoded: DataFrame,
      idCol: String, vecCol: String, index: AnnIndex,
      threshold: Double, nProbe: Int,
      adcMargin: Double,
      serveStats: Option[org.apache.spark.sql.Observation] = None)
      : DataFrame = {
    require(adcMargin >= 0.0, "nearDupAgainst: adcMargin must be >= 0")
    val AnnIndex(cents, books) = index
    val kFit = cents.length
    val probeN = math.min(nProbe, kFit)
    val probed = q
      .withColumn("scores", centroidScores(col("qv"), cents))
      .withColumn("cid", explode(topIdx(col("scores"), kFit, probeN)))
      .select(col("cid"), col("new_id"), col("qv"), col("qn"))
    val probedCids = probed.select("cid").distinct()
      .collect().map(_.getInt(0)).toSeq
    val estGate = {
      val estDot = graft.functions.VectorFunctions
        .adcScore(col("qv"), col("pq_codes"), books)
      when(col("qn") * col("est_n") > 0.0,
        estDot / (col("qn") * col("est_n")))
        .otherwise(lit(Double.MinValue)) >= threshold - adcMargin
    }
    val cand0 = probed
      .join(encoded.filter(col("cid").isin(probedCids: _*)), Seq("cid"))
      .filter(estGate)
    // The adcMargin recall/cost dial's COST, made observable (review
    // finding r14: the 0.46→0.82 recall fix widened the margin on a
    // guessed cost): `adc_candidates` = shortlist rows the margin
    // admits to the exact refinement; divide by |arrival| × nProbe
    // (the probe-row count the caller controls) for candidates-per-
    // probe. `probed_buckets` rides along (a plan constant;
    // coalesce'd so an EMPTY serve — zero admitted rows, where max
    // over no rows is null — still reports it instead of NPE-ing
    // consumers that read it as Int, ADVICE r15 #2). Observation
    // metrics ride the serve's own action — zero extra jobs; read
    // with `serveStats.get` after the sink runs.
    val cand = serveStats.fold(cand0)(o => cand0.observe(o,
      count(lit(1)).as("adc_candidates"),
      coalesce(max(lit(probedCids.size)), lit(probedCids.size))
        .as("probed_buckets")))
    // Pairs are unique by construction on every path below: each
    // neighbor lives in exactly ONE index bucket, so probing several
    // buckets per query cannot duplicate a pair (the searchEncoded
    // argument) — no dedup shuffle needed.
    if (encoded.columns.contains("hv")) {
      // Stored-vector layout: refine inline; one cid equi-join total.
      cand
        .withColumn("cos",
          when(col("qn") * col("hn") > 0.0,
            dot(col("qv"), col("hv")) / (col("qn") * col("hn")))
            .otherwise(lit(Double.MinValue)))
        .filter(col("cos") >= threshold)
        .select(col("new_id"), col("neighbor_id").as("base_id"), col("cos"))
    } else {
      val shortlist = cand
        .select(col("new_id"), col("neighbor_id").as("base_id"))
      val hist = OpsUtil.widen(historyVecs)
        .select(col(idCol).as("base_id"), asDouble(col(vecCol)).as("bv"))
        .filter(col("bv").isNotNull)
        .withColumn("bn", norm(col("bv")))
      shortlist
        .join(hist, Seq("base_id"))
        .join(q.select(col("new_id"), col("qv"), col("qn")), Seq("new_id"))
        .withColumn("cos",
          when(col("qn") * col("bn") > 0.0,
            dot(col("qv"), col("bv")) / (col("qn") * col("bn")))
            .otherwise(lit(Double.MinValue)))
        .filter(col("cos") >= threshold)
        .select("new_id", "base_id", "cos")
    }
  }

  /** Search a PRE-ENCODED corpus table ([[encodeCorpus]] rows — built
    * in one shot or incrementally appended) with [[ivfpqTopK]]'s exact
    * plan: probe → ADC-score from codes → shortlist → exact-cosine
    * refinement. `df` supplies the query vectors and the raw vectors
    * the refinement stage re-joins by id, so at scale it is the vector
    * table the corpus was encoded from (including appends). */
  def searchEncoded(
      df: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      index: AnnIndex, k: Int, nProbe: Int = 4, refine: Int = 0,
      queryPred: Option[Column] = None): DataFrame = {
    val base = OpsUtil.widen(df)
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .filter(col("v").isNotNull)
      .localCheckpoint(false)
    searchEncodedPrepared(base, corpus, df, idCol, index, k, nProbe,
      refine, queryPred)
  }

  private def searchEncodedPrepared(
      base: DataFrame, corpus: DataFrame, origDf: DataFrame, idCol: String,
      index: AnnIndex, k: Int, nProbe: Int, refine: Int,
      queryPred: Option[Column]): DataFrame = {
    val AnnIndex(cents, books) = index
    val refineN = if (refine > 0) refine else math.max(4 * k, 32)
    val kFit = cents.length
    val probeN = math.min(nProbe, kFit)
    val scored = base.withColumn("scores", centroidScores(col("v"), cents))
    // queryPred restricts the QUERY side only (candidate corpus stays
    // full) — evaluated on the original frame's columns, applied here
    // as a semi-join on the unique id.
    val scoredQ = queryPred.fold(scored) { p =>
      scored.join(
        OpsUtil.widen(origDf).filter(p).select(col(idCol).as("id")),
        Seq("id"), "left_semi")
    }
    val queries = scoredQ
      .withColumn("cid", explode(topIdx(col("scores"), kFit, probeN)))
      .select(col("cid"), col("id").as("query_id"), col("v").as("qv"),
        norm(col("v")).as("qn"))
    // ADC-score at the join output and immediately drop the raw query
    // vector: the dedup and ranking shuffles then carry 3 narrow
    // columns per candidate, not dim doubles — the PQ payload win
    // applies to every shuffle, not just the bucket join.
    val cand = queries.join(corpus, Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("est_dot",
        graft.functions.VectorFunctions.adcScore(col("qv"), col("pq_codes"), books))
      // Rank by the ADC cosine estimate (matches the exact rankers);
      // degenerate zero norms sink to the bottom instead of NaN-sorting.
      .withColumn("est_cos",
        when(col("qn") * col("est_n") > 0.0,
          col("est_dot") / (col("qn") * col("est_n")))
          .otherwise(lit(Double.MinValue)))
      .select("query_id", "neighbor_id", "est_cos")
      // unique by construction — one index bucket per neighbor (see
      // hardNegativesIvf); no dedup shuffle needed
    val wEst = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("est_cos").desc, col("neighbor_id"))
    val shortlist = cand
      .withColumn("est_rank", row_number().over(wEst))
      .filter(col("est_rank") <= refineN)
      .select("query_id", "neighbor_id", "est_cos")
    // Refinement: exact cosine over the shortlist only — raw vectors
    // re-join by unique id (refine rows per query, skew-free).
    val qTab = base.select(col("id").as("query_id"),
      col("v").as("qv"), norm(col("v")).as("qn"))
    val nbr = base.select(col("id").as("neighbor_id"),
      col("v").as("cv"), norm(col("v")).as("cn"))
    val wExact = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    shortlist.join(qTab, Seq("query_id")).join(nbr, Seq("neighbor_id"))
      // try_divide: zero-norm endpoints → NULL cos, ranked last, no abort
      .withColumn("cos", try_divide(dot(col("qv"), col("cv")), col("qn") * col("cn")))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "est_cos", "rank")
  }
}
