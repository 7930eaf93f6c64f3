package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row, types => T}
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Parity contract for the blocked-GEMM exact kernels: on every frame
  * the fast path accepts, [[ExactPairs]] must produce EXACTLY the rows
  * of the nested-loop reference plans (bit-for-bit doubles — both sum
  * in ascending index order), including the edge semantics the
  * reference gets from Catalyst: NULL ids/labels dropped by
  * three-valued comparisons, NULL vectors and zero-norm endpoints
  * yielding NULL cosines (try_divide) that fail thresholds and rank
  * below numeric, NaN cosines passing the threshold (NaN greatest). */
class ExactPairsSpec extends SparkSpec with Matchers {
  import scala.jdk.CollectionConverters._

  private def mkDf(rows: Seq[Row], idType: T.DataType = T.LongType): DataFrame =
    spark.createDataFrame(
      rows.asJava,
      T.StructType(Seq(
        T.StructField("vec_id", idType, nullable = true),
        T.StructField("label", T.IntegerType, nullable = true),
        T.StructField("embedding", T.ArrayType(T.DoubleType), nullable = true))))

  private def randomDf(n: Int, dim: Int, seed: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    mkDf((1 to n).map { i =>
      Row(i.toLong, rnd.nextInt(4), Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
    })
  }

  // NaN-safe row canonicalization (NaN != NaN under ==)
  private def canon(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case d: Double => java.lang.Double.doubleToLongBits(d)
      case x => x
    }.toList).toSet

  private def assertParity(fast: DataFrame, ref: DataFrame): Unit = {
    assert(fast.schema == ref.schema,
      s"schema drift: ${fast.schema.sql} vs ${ref.schema.sql}")
    val (f, r) = (canon(fast), canon(ref))
    assert(f == r, s"row drift: only-fast=${(f -- r).take(5)} only-ref=${(r -- f).take(5)}")
  }

  test("cosinePairs parity with the nested-loop plan on random data") {
    val df = randomDf(120, 32, seed = 7)
    assertParity(
      Dedup.embeddingCosinePairs(df, "vec_id", "embedding", threshold = 0.15),
      Dedup.embeddingCosinePairsNlj(df, "vec_id", "embedding", threshold = 0.15))
  }

  test("cosinePairs parity: duplicate ids, NULL ids, NULL vectors, NULL elements, zero vectors") {
    val rnd = new scala.util.Random(13)
    def v() = Seq.fill(8)(rnd.nextDouble() * 2 - 1)
    val rows = (1 to 40).map(i => Row(i.toLong, 0, v())) ++ Seq(
      Row(3L, 0, v()),                         // duplicate id, different vector
      Row(null, 0, v()),                       // NULL id: dropped by id_a < id_b
      Row(41L, 0, null),                       // NULL vector: NULL cos, dropped
      Row(42L, 0, Seq[Any](0.5, null, -0.25, null, 0.1, 0.0, 0.0, 0.0)), // NULL elements skip
      Row(43L, 0, Seq.fill(8)(0.0)),           // zero vector: NULL cos (try_divide), dropped
      Row(44L, 0, Seq.fill(8)(0.0)))
    val df = mkDf(rows)
    assertParity(
      Dedup.embeddingCosinePairs(df, "vec_id", "embedding", threshold = 0.2),
      Dedup.embeddingCosinePairsNlj(df, "vec_id", "embedding", threshold = 0.2))
  }

  test("bruteForceTopK parity on random data, with and without queryPred") {
    val df = randomDf(150, 24, seed = 21)
    assertParity(
      Similarity.bruteForceTopK(df, "vec_id", "embedding", k = 7),
      Similarity.bruteForceTopKNlj(df, "vec_id", "embedding", k = 7))
    val pred = Some(col("vec_id") % 3 === 0)
    assertParity(
      Similarity.bruteForceTopK(df, "vec_id", "embedding", k = 4, pred),
      Similarity.bruteForceTopKNlj(df, "vec_id", "embedding", k = 4, pred))
  }

  test("bruteForceTopK parity: NULL vectors and zero norms rank below numeric, k > corpus") {
    val rnd = new scala.util.Random(5)
    def v() = Seq.fill(8)(rnd.nextDouble() * 2 - 1)
    val rows = (1 to 6).map(i => Row(i.toLong, 0, v())) ++
      Seq(Row(7L, 0, null), Row(8L, 0, null),  // NULL-vector query AND candidate
        Row(9L, 0, Seq.fill(8)(0.0)))          // zero norm: NULL cos, ranks last
    val df = mkDf(rows)
    assertParity(
      Similarity.bruteForceTopK(df, "vec_id", "embedding", k = 10),
      Similarity.bruteForceTopKNlj(df, "vec_id", "embedding", k = 10))
  }

  test("hardNegatives parity incl. NULL labels (three-valued != drops them)") {
    val rnd = new scala.util.Random(31)
    def v() = Seq.fill(16)(rnd.nextDouble() * 2 - 1)
    val rows = (1 to 80).map(i => Row(i.toLong, i % 3, v())) ++
      Seq(Row(81L, null, v()), Row(82L, null, v()))
    val df = mkDf(rows)
    assertParity(
      Similarity.hardNegatives(df, "vec_id", "embedding", "label", k = 5),
      Similarity.hardNegativesNlj(df, "vec_id", "embedding", "label", k = 5))
  }

  test("parity on the sf0.001 embeddings table (all three kernels)") {
    val df = spark.read.parquet(s"${sf()}/embeddings.parquet")
    assertParity(
      Dedup.embeddingCosinePairs(df, "vec_id", "embedding", threshold = 0.42),
      Dedup.embeddingCosinePairsNlj(df, "vec_id", "embedding", threshold = 0.42))
    assertParity(
      Similarity.bruteForceTopK(df, "vec_id", "embedding", k = 10),
      Similarity.bruteForceTopKNlj(df, "vec_id", "embedding", k = 10))
    assertParity(
      Similarity.hardNegatives(df, "vec_id", "embedding", "label", k = 10),
      Similarity.hardNegativesNlj(df, "vec_id", "embedding", "label", k = 10))
  }

  test("non-integral id types keep working through the reference plan") {
    val rnd = new scala.util.Random(3)
    def v() = Seq.fill(8)(rnd.nextDouble() * 2 - 1)
    val df = mkDf((1 to 20).map(i => Row(s"d$i", 0, v())), idType = T.StringType)
    assert(!ExactPairs.eligible(df, "vec_id", None))
    val pairs = Dedup.embeddingCosinePairs(df, "vec_id", "embedding", 0.1)
    assert(pairs.schema("id_a").dataType == T.StringType)
    assert(pairs.count() > 0)
    val topk = Similarity.bruteForceTopK(df, "vec_id", "embedding", k = 3)
    assert(topk.schema("query_id").dataType == T.StringType)
    assert(topk.count() == 20 * 3)
  }

  test("blocked kernel output id/label types match the input schema") {
    val rnd = new scala.util.Random(9)
    def v() = Seq.fill(8)(rnd.nextDouble() * 2 - 1)
    val df = spark.createDataFrame(
      (1 to 15).map(i => Row(i, i % 2, v())).asJava,
      T.StructType(Seq(
        T.StructField("vec_id", T.IntegerType, nullable = true),
        T.StructField("label", T.IntegerType, nullable = true),
        T.StructField("embedding", T.ArrayType(T.DoubleType), nullable = true))))
    assert(ExactPairs.eligible(df, "vec_id", Some("label")))
    val pairs = Dedup.embeddingCosinePairs(df, "vec_id", "embedding", 0.0)
    assert(pairs.schema("id_a").dataType == T.IntegerType)
    val hn = Similarity.hardNegatives(df, "vec_id", "embedding", "label", k = 2)
    assert(hn.schema("query_id").dataType == T.IntegerType)
    assert(hn.schema("query_label").dataType == T.IntegerType)
    assert(hn.schema("rank").dataType == T.LongType)
  }
}
