package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column operators: storage-shrinking transforms applied
  * ahead of ANN indexing / similarity search. Pure per-row column
  * expressions (codegen'd, zero shuffle) — at 100 TB quantization is
  * an embarrassingly parallel projection that cuts vector bytes 4×
  * before anything shuffles or persists.
  */
object Embeddings {

  /** Symmetric per-vector int8 scalar quantization: scale =
    * max|v|/127, q_i = floor(v_i/scale + 0.5) ∈ [-127, 127]. The
    * rounding is floor(x + 0.5) — not half-even `round` — because its
    * result is identical in every engine and the reconstruction error
    * bound |q_i·scale − v_i| ≤ scale/2 stays exact. Zero vectors get
    * scale 0 and all-zero codes.
    *
    * Output: the input row plus `q_scale` (double), `q_codes`
    * (array<int>), `q_max_err` (double, max reconstruction error),
    * `q_n_sat` (count of saturated ±127 codes — a clipping audit).
    */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame = {
    val vd = col("__graft_vd")
    val scale = col("q_scale")
    val codes = col("q_codes")
    df.withColumn("__graft_vd", transform(col(vecCol), x => x.cast("double")))
      .withColumn("q_scale",
        array_max(transform(vd, x => abs(x))) / lit(127.0))
      .withColumn("q_codes",
        when(scale > 0.0,
          transform(vd, x => floor(x / scale + 0.5).cast("int")))
          .otherwise(transform(vd, _ => lit(0))))
      .withColumn("q_max_err",
        when(scale > 0.0,
          array_max(zip_with(codes, vd,
            (q, x) => abs(q.cast("double") * scale - x))))
          .otherwise(lit(0.0)))
      .withColumn("q_n_sat",
        size(filter(codes, q => abs(q) === 127)).cast("long"))
      .drop("__graft_vd")
  }

  /** Johnson-Lindenstrauss random projection to `k` dimensions: each
    * output coordinate is the dot product with a deterministic
    * zero-mean hyperplane (the sign-LSH planes, reused un-signed),
    * scaled by 1/(10⁶·√k) so coordinates stay O(‖v‖). Pairwise
    * distances/cosines are preserved in expectation (JL lemma); the
    * planes are xxhash-derived integer literals, so the projection is
    * reproducible across runs, partitionings, and engines.
    *
    * Emits `k` scalar columns `p0..p{k-1}` (not an array — the moment
    * downstream systems want individual coordinates, e.g. for
    * column-pruned parquet scans of a few projected dims). Pure
    * codegen'd projection, zero shuffle; at 100 TB this cuts vector
    * bytes dim/k-fold before anything persists. */
  def randomProject(
      df: DataFrame, vecCol: String, dim: Int, k: Int): DataFrame = {
    require(k > 0 && dim > 0)
    val vd = col("__graft_vd")
    // Fail fast on a dimension mismatch (the dot kernel is lenient and
    // would silently project a truncated vector — same contract as
    // pqEncode); NULL vectors stay NULL coordinates.
    val guarded = when(col(vecCol).isNull, lit(null).cast("array<double>"))
      .when(size(col(vecCol)) === dim,
        transform(col(vecCol), x => x.cast("double")))
      .otherwise(raise_error(concat(
        lit(s"randomProject: expected vector dim $dim, got "),
        size(col(vecCol)).cast("string"))))
    val out = (0 until k).foldLeft(df.withColumn("__graft_vd", guarded)) {
      (d, j) =>
        val plane = array(Similarity.planeWeights(j, dim).map(lit): _*)
        d.withColumn(s"p$j",
          graft.functions.VectorFunctions.dot(vd, plane) /
            lit(1e6) / sqrt(lit(k.toDouble)))
    }
    out.drop("__graft_vd")
  }

  /** Fitted PCA basis: mean vector, top-k orthonormal components
    * (rows), and their eigenvalues (descending) — O(dim·k) driver
    * metadata (the classifier-weights pattern). Components are
    * sign-canonicalized (largest-|coordinate| positive) so the fit is
    * reproducible run to run. */
  final case class PcaModel(
      dim: Int, k: Int, mean: IndexedSeq[Double],
      components: IndexedSeq[IndexedSeq[Double]],
      eigenvalues: IndexedSeq[Double]) {
    require(components.length == k && eigenvalues.length == k)
    require(mean.length == dim && components.forall(_.length == dim))
  }

  /** Fit PCA with ONE pass over the data: each partition accumulates
    * (count, Σv, upper-triangular Σvvᵀ) in a dense local buffer —
    * genuine per-partition imperative hot-loop work, the documented
    * exception to expression-only style — and the ≤ #partitions
    * summary rows (dim + dim²/2 doubles each) reduce on the driver.
    * The d×d eigenproblem is driver math (cyclic Jacobi; d is an
    * embedding dimension, not data). Nothing shuffles; at 100 TB the
    * cost is exactly one scan with a dense per-core accumulator — the
    * JL projection's data-driven sibling ([[randomProject]] trades
    * optimality for zero fitting; this spends one pass to cut
    * dimensions along the data's actual variance). NULL,
    * wrong-dimension, and null-element vectors are skipped by the fit
    * (the serving contract rejects them loudly instead — see
    * [[pcaProject]]). */
  def pcaFit(df: DataFrame, vecCol: String, dim: Int, k: Int): PcaModel = {
    require(dim > 0 && k > 0 && k <= dim, s"pcaFit: need 0 < k <= dim, got k=$k dim=$dim")
    val tri = dim * (dim + 1) / 2
    val spark = df.sparkSession
    import spark.implicits._
    val parts = df
      .select(transform(col(vecCol), x => x.cast("double")).as("v"))
      // NULL ELEMENTS are a skip too: getSeq would unbox each null to
      // 0.0 and silently bias the mean/covariance.
      .filter(col("v").isNotNull && size(col("v")) === dim &&
        !exists(col("v"), _.isNull))
      .mapPartitions { it =>
        var n = 0L
        val s = new Array[Double](dim)
        val g = new Array[Double](tri)
        it.foreach { row =>
          val v = row.getSeq[Double](0)
          n += 1
          var i = 0
          var t = 0
          while (i < dim) {
            val vi = v(i)
            s(i) += vi
            var j = i
            while (j < dim) { g(t) += vi * v(j); t += 1; j += 1 }
            i += 1
          }
        }
        if (n == 0L) Iterator.empty else Iterator((n, s.toSeq, g.toSeq))
      }
      .collect() // ≤ #partitions summary rows — metadata, not data
    require(parts.nonEmpty, s"pcaFit: no valid $dim-dimensional vectors")
    val n = parts.map(_._1).sum
    val sum = new Array[Double](dim)
    val gram = new Array[Double](tri)
    parts.foreach { case (_, s, g) =>
      var i = 0
      while (i < dim) { sum(i) += s(i); i += 1 }
      var t = 0
      while (t < tri) { gram(t) += g(t); t += 1 }
    }
    val mean = sum.map(_ / n)
    // population covariance C = Gram/n − μμᵀ
    val c = Array.ofDim[Double](dim, dim)
    var t = 0
    for (i <- 0 until dim; j <- i until dim) {
      val v = gram(t) / n - mean(i) * mean(j)
      c(i)(j) = v; c(j)(i) = v; t += 1
    }
    val (evals, evecs) = jacobiEigen(c)
    val order = evals.indices.sortBy(i => -evals(i)).take(k)
    val comps = order.map { i =>
      val w = evecs.map(_(i))
      // sign canon: the largest-|coordinate| entry is positive
      val lead = w.indices.maxBy(j => (math.abs(w(j)), -j))
      (if (w(lead) < 0) w.map(-_) else w).toIndexedSeq
    }
    PcaModel(dim, k, mean.toIndexedSeq, comps.toIndexedSeq,
      order.map(i => math.max(evals(i), 0.0)).toIndexedSeq)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, column-eigenvector matrix). Driver-side d×d math. */
  private def jacobiEigen(c: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = c.length
    val a = c.map(_.clone)
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      for (i <- 0 until n; j <- i + 1 until n) s += a(i)(j) * a(i)(j)
      s
    }
    val scale = math.max(off(), 1e-300)
    var sweep = 0
    while (sweep < 100 && off() > 1e-24 * scale) {
      for (p <- 0 until n; q <- p + 1 until n if math.abs(a(p)(q)) > 0) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val tSign = if (theta >= 0) 1.0 else -1.0
        val tt = tSign / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val cc = 1.0 / math.sqrt(tt * tt + 1.0)
        val ss = tt * cc
        for (i <- 0 until n) {
          val (aip, aiq) = (a(i)(p), a(i)(q))
          a(i)(p) = cc * aip - ss * aiq
          a(i)(q) = ss * aip + cc * aiq
        }
        for (i <- 0 until n) {
          val (api, aqi) = (a(p)(i), a(q)(i))
          a(p)(i) = cc * api - ss * aqi
          a(q)(i) = ss * api + cc * aqi
        }
        for (i <- 0 until n) {
          val (vip, viq) = (v(i)(p), v(i)(q))
          v(i)(p) = cc * vip - ss * viq
          v(i)(q) = ss * vip + cc * viq
        }
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** Project onto a fitted [[PcaModel]]: emits `k` scalar columns
    * `{prefix}0..{prefix}{k-1}` = (v − μ)·Wⱼ, computed as
    * v·Wⱼ − μ·Wⱼ with the centering dot folded into a literal — pure
    * codegen ([[graft.functions.VectorFunctions.dot]] against
    * component literals), zero shuffle, the same serving shape as
    * [[randomProject]]. NULL vectors yield NULL coordinates;
    * wrong-dimension vectors fail loudly. */
  def pcaProject(
      df: DataFrame, vecCol: String, model: PcaModel,
      prefix: String = "pc"): DataFrame = {
    val vd = col("__graft_vd")
    val guarded = when(col(vecCol).isNull, lit(null).cast("array<double>"))
      .when(size(col(vecCol)) === model.dim,
        transform(col(vecCol), x => x.cast("double")))
      .otherwise(raise_error(concat(
        lit(s"pcaProject: expected vector dim ${model.dim}, got "),
        size(col(vecCol)).cast("string"))))
    val out = (0 until model.k).foldLeft(df.withColumn("__graft_vd", guarded)) {
      (d, j) =>
        val w = model.components(j)
        val offset = w.zip(model.mean).map { case (a, b) => a * b }.sum
        d.withColumn(s"$prefix$j",
          graft.functions.VectorFunctions.dot(vd, array(w.map(lit(_)): _*)) -
            lit(offset))
    }
    out.drop("__graft_vd")
  }

  /** PCA WHITENING: [[pcaProject]] with each coordinate scaled by
    * 1/√λⱼ, so output coordinates have unit variance (and are
    * decorrelated, as PCA coordinates already are) — the standard
    * preprocessing for downstream metric learning / k-means, where an
    * unwhitened dominant axis drowns the rest of the geometry. Same
    * serving shape: codegen dot products against folded literals
    * (wⱼ/√λⱼ rides the plan; zero extra work at serve time).
    * Degenerate axes (λⱼ ≤ `eps`, variance at numerical noise) pass
    * through UNSCALED rather than exploding by 1/√~0 — the axis
    * carries no signal to normalize. */
  def pcaWhiten(
      df: DataFrame, vecCol: String, model: PcaModel,
      prefix: String = "wpc", eps: Double = 1e-9): DataFrame = {
    val vd = col("__graft_vd")
    val guarded = when(col(vecCol).isNull, lit(null).cast("array<double>"))
      .when(size(col(vecCol)) === model.dim,
        transform(col(vecCol), x => x.cast("double")))
      .otherwise(raise_error(concat(
        lit(s"pcaWhiten: expected vector dim ${model.dim}, got "),
        size(col(vecCol)).cast("string"))))
    val out = (0 until model.k).foldLeft(df.withColumn("__graft_vd", guarded)) {
      (d, j) =>
        val scale =
          if (model.eigenvalues(j) > eps) 1.0 / math.sqrt(model.eigenvalues(j))
          else 1.0
        val w = model.components(j).map(_ * scale)
        val offset = w.zip(model.mean).map { case (a, b) => a * b }.sum
        d.withColumn(s"$prefix$j",
          graft.functions.VectorFunctions.dot(vd, array(w.map(lit(_)): _*)) -
            lit(offset))
    }
    out.drop("__graft_vd")
  }

  /** L2-normalize a vector column into `outCol` (unit-norm embeddings
    * make cosine a plain dot product downstream). Zero vectors pass
    * through as-is. DataFrame-shaped, not a bare Column: the norm must
    * be staged as a real projection column — inlined into the divide
    * lambda it would re-run the O(d) sum per element access (the HOF
    * re-evaluation pitfall), turning normalization O(d²). */
  def l2Normalize(df: DataFrame, vecCol: String, outCol: String): DataFrame = {
    val nrm = col("__graft_nrm")
    df.withColumn("__graft_nrm",
        sqrt(aggregate(col(vecCol),
          lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))))
      .withColumn(outCol,
        when(nrm > 0.0, transform(col(vecCol), x => x.cast("double") / nrm))
          .otherwise(transform(col(vecCol), x => x.cast("double"))))
      .drop("__graft_nrm")
  }
}
