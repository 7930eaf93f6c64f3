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
