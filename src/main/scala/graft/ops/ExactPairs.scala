package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}

/** Blocked-GEMM kernels for the EXACT all-pairs cosine baselines.
  *
  * The reference-semantics implementations ([[Dedup.embeddingCosinePairsNlj]],
  * `Similarity.allPairsTopK`) express the n² pair stage as a nested-loop
  * join: every pair materializes an UnsafeRow carrying BOTH vectors
  * (~1 KiB at dim 64), and for top-k all n² rows shuffle into a window.
  * The arithmetic is cheap — the row traffic is the cost.
  *
  * This kernel is the classic distributed blocked matrix product
  * (the same shape as Spark MLlib's `columnSimilarities`): rows are
  * hash-grouped into B blocks of primitive arrays, block PAIRS are the
  * join (B(B+1)/2 or B_q×B_c tasks), and each task runs a tight JVM
  * loop over the primitive vectors. Pairs die inside the task: the
  * threshold filter (cosinePairs) or a per-query size-k heap (topK)
  * runs before anything is emitted, so the shuffle after the kernel
  * carries only results, never candidate pairs.
  *
  * Bit-identical to the reference paths by construction:
  *   - the dot product sums elements in ascending index order, exactly
  *     like [[graft.functions.VectorFunctions.dot]]'s codegen loop;
  *     norms are `sqrt(dot(v, v))` with the same loop;
  *   - NULL array elements are zero-filled, which is IEEE-identical to
  *     the non-strict dot's skip (s + ±0.0 == s for every reachable
  *     partial sum; squares are never -0.0) — the only divergence is a
  *     row mixing NULL elements with non-finite values (skip vs 0·Inf),
  *     which no finite-embedding corpus produces;
  *   - double comparisons use `java.lang.Double.compare`, the same
  *     total order (NaN greatest) Spark's ordering comparisons use;
  *   - NULL vectors and zero-norm endpoints yield NULL cosines (the
  *     reference plans divide with `try_divide`: NULL on a zero
  *     divisor) that fail threshold filters and rank below every
  *     numeric cosine (desc = NULLS LAST), as in the reference window.
  *
  * Fast-path eligibility is decided from the SCHEMA at plan build: ids
  * (and labels, when a label column participates) must be integral so
  * the typed kernel can carry them as Long and cast back losslessly.
  * Callers fall back to the reference nested-loop plan otherwise.
  *
  * Scale posture: these are the VERIFICATION baselines — O(n²·d) by
  * contract. Block count bounds task memory at n/B vectors per block
  * (collected per group); at corpus scale the scale paths are
  * [[Similarity.lshTopK]] / [[Similarity.ivfTopK]] and the banded
  * [[Dedup]] joins, with this kernel scoring only same-bucket pairs.
  */
private[graft] object ExactPairs {

  /** Row carried into the kernel: `lab` is 0 when unused, `v` is null
    * for a NULL input vector (NULL-cosine semantics preserved). */
  final case class VRow(id: Long, lab: Long, v: Array[Double])

  /** One block: parallel arrays over the block's rows. `norms(i)` is 0
    * when `vecs(i)` is null (never read on that path). */
  final case class VBlock(
      bid: Int,
      ids: Array[Long],
      labs: Array[Long],
      vecs: Array[Array[Double]],
      norms: Array[Double])

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Schema-level fast-path gate (ids, plus labels when present). */
  def eligible(df: DataFrame, idCol: String, labCol: Option[String]): Boolean =
    isIntegral(df.schema(idCol).dataType) &&
      labCol.forall(c => isIntegral(df.schema(c).dataType))

  /** The kernel's primitive-backed outputs are NOT NULL; the reference
    * join plans' are nullable — schema parity requires relaxing ours to
    * match. Spark 4.1 folds literal-condition conditionals at analysis
    * (so `when(lit(true), c)` keeps nullable=false) and `Dataset.to`
    * keeps the tighter nullability, so the one reliable relaxation is a
    * row round-trip with the target schema. Applied only to the final
    * result-sized frame (pairs over threshold / n·k top-k rows). */
  private def withNullability(df: DataFrame, nonNull: Set[String]): DataFrame = {
    val schema = StructType(df.schema.map(f => f.copy(nullable = !nonNull(f.name))))
    df.sparkSession.createDataFrame(df.rdd, schema)
  }

  /** Ascending-index dot product — the same loop as the codegen'd
    * [[graft.functions.DotProduct]], over min length like the
    * non-strict expression. */
  private def dotJ(x: Array[Double], y: Array[Double]): Double = {
    val n = math.min(x.length, y.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += x(i) * y(i); i += 1 }
    s
  }

  /** (id, lab, v) with ids/labs as Long, NULL elements zero-filled,
    * NULL-id (and NULL-label when required) rows dropped — exactly the
    * rows the reference join drops through three-valued comparisons. */
  private def prep(
      src: DataFrame, idCol: String, vecCol: String,
      labCol: Option[String]): Dataset[VRow] = {
    val spark = src.sparkSession
    import spark.implicits._
    val lab = labCol.map(c => col(c).cast("long")).getOrElse(lit(0L))
    var out = src.select(
      col(idCol).cast("long").as("id"),
      lab.as("lab"),
      when(col(vecCol).isNotNull,
        transform(col(vecCol).cast("array<double>"), e => coalesce(e, lit(0.0))))
        .as("v"))
      .filter(col("id").isNotNull)
    if (labCol.isDefined) out = out.filter(col("lab").isNotNull)
    out.as[VRow]
  }

  /** Hash-group rows into `nBlocks` blocks of primitive arrays. One
    * block = one `mapGroups` buffer, so nBlocks bounds per-task memory
    * at ~n/B vectors — size it so a block fits an executor core. */
  private def toBlocks(ds: Dataset[VRow], nBlocks: Int): Dataset[VBlock] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(r =>
        java.lang.Math.floorMod(scala.util.hashing.byteswap64(r.id), nBlocks.toLong).toInt)
      .mapGroups { (bid, it) =>
        val rows = it.toArray
        val n = rows.length
        val ids = new Array[Long](n)
        val labs = new Array[Long](n)
        val vecs = new Array[Array[Double]](n)
        val norms = new Array[Double](n)
        var i = 0
        while (i < n) {
          val r = rows(i)
          ids(i) = r.id; labs(i) = r.lab; vecs(i) = r.v
          norms(i) = if (r.v == null) 0.0 else math.sqrt(dotJ(r.v, r.v))
          i += 1
        }
        VBlock(bid, ids, labs, vecs, norms)
      }
  }

  /** Exact near-duplicate pairs, blocked: (id_a, id_b, cos), id_a <
    * id_b by ORIGINAL id order, cos >= threshold under Spark's double
    * ordering (NaN passes, NULL cosines drop — same as the reference
    * filter). Ids come back in the input id type. */
  def cosinePairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nBlocks: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val idType = df.schema(idCol).dataType
    val blocks = toBlocks(prep(OpsUtil.widen(df), idCol, vecCol, None), nBlocks)
      .localCheckpoint(false) // both sides of the block self-join read it
    val l = blocks.alias("l")
    val r = blocks.alias("r")
    val pairs = l.joinWith(r, col("l.bid") <= col("r.bid"))
      .flatMap { case (a, b) =>
        val same = a.bid == b.bid
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var i = 0
        while (i < a.ids.length) {
          val va = a.vecs(i)
          if (va != null) {
            var j = if (same) i + 1 else 0
            while (j < b.ids.length) {
              val vb = b.vecs(j)
              if (vb != null && a.ids(i) != b.ids(j)) {
                val np = a.norms(i) * b.norms(j)
                // np == 0 → NULL cos in the reference (try_divide),
                // dropped by its threshold filter — emit nothing
                if (np != 0.0) {
                  val cos = dotJ(va, vb) / np
                  // Spark GreaterThanOrEqual: NaN >= x is true (NaN greatest)
                  if (cos >= threshold || java.lang.Double.isNaN(cos)) {
                    if (a.ids(i) < b.ids(j)) out += ((a.ids(i), b.ids(j), cos))
                    else out += ((b.ids(j), a.ids(i), cos))
                  }
                }
              }
              j += 1
            }
          }
          i += 1
        }
        out
      }
    withNullability(
      pairs.toDF("id_a", "id_b", "cos")
        .select(col("id_a").cast(idType).as("id_a"),
          col("id_b").cast(idType).as("id_b"), col("cos")),
      nonNull = Set.empty)
  }

  /** Candidate comparator, matching the reference window's
    * `(desc(cos) NULLS LAST, neighbor_id asc)`: returns true when
    * (cosX, nidX) ranks strictly better than (cosY, nidY). Null cos is
    * encoded as `hasX=false`. */
  private def better(
      hasX: Boolean, cosX: Double, nidX: Long,
      hasY: Boolean, cosY: Double, nidY: Long): Boolean = {
    if (hasX != hasY) hasX // numeric beats NULL
    else if (hasX) {
      val c = java.lang.Double.compare(cosX, cosY) // NaN greatest, like Spark
      if (c != 0) c > 0 else nidX < nidY
    } else nidX < nidY
  }

  /** Exact top-k, blocked: per (query block × candidate block) task a
    * size-k heap absorbs the pair stage, so only n_q × B_c × k rows
    * reach the final per-query window. `excludeSameLabel=false` drops
    * self-pairs (bruteForceTopK); `true` drops same-label pairs
    * (hardNegatives). Output: query_id, [query_label,] neighbor_id,
    * rank — types restored to the input schema's. */
  def topK(
      df: DataFrame, idCol: String, vecCol: String, k: Int,
      labCol: Option[String], labOutName: String,
      excludeSameLabel: Boolean, queryPred: Option[Column],
      qBlocks: Int = 8, cBlocks: Int = 8): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val idType = df.schema(idCol).dataType
    val labType = labCol.map(c => df.schema(c).dataType)
    val src = OpsUtil.widen(df)
    val qSide = queryPred.fold(src)(src.filter)
    val qb = toBlocks(prep(qSide, idCol, vecCol, labCol), qBlocks)
    val cb = toBlocks(prep(src, idCol, vecCol, labCol), cBlocks)
    // (qid, qlab, nid, cos) — cos None for NULL-vector endpoints
    val local = qb.joinWith(cb, lit(true)).flatMap { case (q, c) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Option[Double])]
      var qi = 0
      while (qi < q.ids.length) {
        val qid = q.ids(qi); val qlab = q.labs(qi)
        val qv = q.vecs(qi); val qn = q.norms(qi)
        // worst-kept on top: ordering must say "head is the WORST"
        val heap = new scala.collection.mutable.PriorityQueue[(Boolean, Double, Long)]()(
          Ordering.fromLessThan { (x, y) =>
            better(x._1, x._2, x._3, y._1, y._2, y._3)
          })
        var ci = 0
        while (ci < c.ids.length) {
          val keep =
            if (excludeSameLabel) c.labs(ci) != qlab
            else c.ids(ci) != qid
          if (keep) {
            val cv = c.vecs(ci)
            val np = if (qv == null || cv == null) 0.0 else qn * c.norms(ci)
            // NULL vector or zero norm product → NULL cos in the
            // reference (try_divide) → ranks below every numeric cos
            val cand: (Boolean, Double, Long) =
              if (np == 0.0) (false, 0.0, c.ids(ci))
              else (true, dotJ(qv, cv) / np, c.ids(ci))
            if (heap.size < k) heap.enqueue(cand)
            else {
              val w = heap.head
              if (better(cand._1, cand._2, cand._3, w._1, w._2, w._3)) {
                heap.dequeue(); heap.enqueue(cand)
              }
            }
          }
          ci += 1
        }
        heap.foreach { case (has, cos, nid) =>
          out += ((qid, qlab, nid, if (has) Some(cos) else None))
        }
        qi += 1
      }
      out
    }.toDF("qid", "qlab", "nid", "cos")
    val w = Window.partitionBy(col("qid")).orderBy(desc("cos"), col("nid"))
    val ranked = local
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
    val cols =
      col("qid").cast(idType).as("query_id") +:
        labType.toSeq.map(t => col("qlab").cast(t).as(labOutName)) :+
        col("nid").cast(idType).as("neighbor_id") :+ col("rank")
    withNullability(ranked.select(cols: _*), nonNull = Set("rank"))
  }
}
