package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers, mirroring what a 100 TB pipeline needs:
  *  - [[bruteForceTopK]]: exact cosine top-k via self-join — the
  *    correctness baseline. O(n²·d); fine for verification scale,
  *    broadcast-joined when one side is small.
  *  - [[lshTopK]]: random-hyperplane (sign-LSH) bucketing — only
  *    vectors sharing a bucket are compared, the scale path. Planes
  *    are derived deterministically from hash functions, so no fitted
  *    state and identical results across runs.
  *
  * Dot products use `zip_with` + `aggregate` over double-cast arrays —
  * sequential left-to-right IEEE adds, deterministic across engines.
  */
object Similarity {

  /** Sequential-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact top-k cosine neighbors for every vector (excluding itself).
    * Output: (query_id, neighbor_id, rank), rank 1..k by cosine desc,
    * ties broken by neighbor id. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = df.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"),
      norm(asDouble(col(vecCol))).as("qn"))
    val c = df.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"),
      norm(asDouble(col(vecCol))).as("cn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), col("neighbor_id"))
    q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Sign-LSH bucket id from `nPlanes` deterministic hyperplanes whose
    * components are zero-mean integers derived from xxhash64(plane, dim)
    * — reproducible across runs with no fitted state. */
  def lshBucket(vec: Column, dim: Int, nPlanes: Int): Column =
    aggregate(
      sequence(lit(0L), lit(nPlanes - 1L)),
      lit(0L),
      (acc, p) => {
        val proj = aggregate(
          zip_with(vec, sequence(lit(0), lit(dim - 1)),
            (v, i) => v * (pmod(xxhash64(p, i), lit(2000001L)) - lit(1000000L)).cast("double")),
          lit(0.0d), (a2, x) => a2 + x)
        acc.bitwiseOR(when(proj > 0, call_function("shiftleft", lit(1L), p.cast("int"))).otherwise(lit(0L)))
      })

  /** Approximate top-k: compare only vectors sharing an LSH bucket.
    * Returns (query_id, neighbor_id, rank) within-bucket; recall rises
    * with fewer planes (bigger buckets) or multiple tables. */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
      dim: Int, nPlanes: Int = 8): DataFrame = {
    val v = df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("bucket", lshBucket(col("v"), dim, nPlanes))
      .withColumn("n", norm(col("v")))
    val a = v.select(col("bucket"), col("id").as("query_id"), col("v").as("qv"), col("n").as("qn"))
    val b = v.select(col("bucket"), col("id").as("neighbor_id"), col("v").as("cv"), col("n").as("cn"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cos"), col("neighbor_id"))
    a.join(b, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }
}
