package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class EmbeddingsSpec extends SparkSpec with Matchers {
  import scala.jdk.CollectionConverters._

  private def vecsDf(vecs: Seq[(Long, Seq[Float])]) = {
    import org.apache.spark.sql.{Row, types => T}
    spark.createDataFrame(
      vecs.map { case (i, v) => Row(i, v) }.asJava,
      T.StructType(Seq(
        T.StructField("vec_id", T.LongType, nullable = false),
        T.StructField("embedding", T.ArrayType(T.FloatType), nullable = true))))
  }

  test("quantizeInt8: codes in range, error bound holds, max component saturates") {
    val df = vecsDf(Seq(
      1L -> Seq(1.0f, -0.5f, 0.25f, 0.0f),
      2L -> Seq(-2.0f, 2.0f, 1.99f, -1.0f)))
    val rows = Embeddings.quantizeInt8(df, "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") -> r).toMap
    val r1 = rows(1L)
    val scale1 = r1.getAs[Double]("q_scale")
    scale1 shouldBe (1.0 / 127) +- 1e-15
    val codes1 = r1.getAs[scala.collection.Seq[Int]]("q_codes")
    codes1.toSeq shouldBe Seq(127, -63, 32, 0) // -0.5/scale = -63.5 -> floor(-63.0)= -63
    r1.getAs[Double]("q_max_err") should be <= scale1 / 2 + 1e-12
    r1.getAs[Long]("q_n_sat") shouldBe 1L
    val r2 = rows(2L)
    r2.getAs[scala.collection.Seq[Int]]("q_codes").foreach(c => math.abs(c) should be <= 127)
    r2.getAs[Long]("q_n_sat") shouldBe 2L // both ±2.0 components clip
    r2.getAs[Double]("q_max_err") should be <= r2.getAs[Double]("q_scale") / 2 + 1e-12
  }

  test("quantizeInt8: zero vector gets scale 0 and all-zero codes") {
    val r = Embeddings.quantizeInt8(
      vecsDf(Seq(1L -> Seq(0.0f, 0.0f, 0.0f))), "embedding").collect().head
    r.getAs[Double]("q_scale") shouldBe 0.0
    r.getAs[scala.collection.Seq[Int]]("q_codes").toSeq shouldBe Seq(0, 0, 0)
    r.getAs[Double]("q_max_err") shouldBe 0.0
    r.getAs[Long]("q_n_sat") shouldBe 0L
  }

  test("l2Normalize yields unit vectors; zero vector passes through") {
    val df = Embeddings.l2Normalize(
      vecsDf(Seq(1L -> Seq(3.0f, 4.0f), 2L -> Seq(0.0f, 0.0f))), "embedding", "nv")
      .select(col("vec_id"), col("nv"))
    val out = df.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    out(1L)(0) shouldBe 0.6 +- 1e-12
    out(1L)(1) shouldBe 0.8 +- 1e-12
    out(2L) shouldBe Seq(0.0, 0.0)
  }

  test("randomProject: linear, deterministic across partitionings, zero maps to zero") {
    val rnd = new scala.util.Random(83)
    val dim = 16; val k = 3
    val a = Seq.fill(dim)(rnd.nextGaussian().toFloat)
    val b = Seq.fill(dim)(rnd.nextGaussian().toFloat)
    val sum = a.zip(b).map { case (x, y) => x + y }
    val df = vecsDf(Seq(1L -> a, 2L -> b, 3L -> sum, 4L -> Seq.fill(dim)(0.0f)))
    def proj(d: org.apache.spark.sql.DataFrame) =
      Embeddings.randomProject(d, "embedding", dim, k)
        .select((col("vec_id") +: (0 until k).map(j => col(s"p$j"))): _*)
        .collect().map(r => r.getLong(0) -> (1 to k).map(r.getDouble)).toMap
    val p = proj(df)
    // linearity: P(a+b) = P(a) + P(b) — tolerance is set by the FLOAT
    // precision of the test's own a+b, not by the operator (which
    // projects in doubles)
    (0 until k).foreach { j =>
      p(3L)(j) shouldBe (p(1L)(j) + p(2L)(j)) +- 1e-5
    }
    p(4L).foreach(_ shouldBe 0.0)
    // repartitioning changes nothing (literal planes, per-row math)
    proj(df.repartition(5)) shouldBe p
    // JL sanity: projections of a 2-cluster corpus keep the clusters
    // separated in the projected space on average
    val c1 = Array.fill(dim)(5.0f); val c2 = Array.fill(dim)(-5.0f)
    val docs = (1L to 40L).map { i =>
      val c = if (i <= 20) c1 else c2
      i -> c.map(x => x + rnd.nextGaussian().toFloat * 0.3f).toSeq
    }
    val pc = proj(vecsDf(docs))
    def d2(x: Seq[Double], y: Seq[Double]) =
      x.zip(y).map { case (u, v) => (u - v) * (u - v) }.sum
    val within = (1L to 19L).map(i => d2(pc(i), pc(i + 1))).sum / 19
    val across = (1L to 19L).map(i => d2(pc(i), pc(i + 20))).sum / 19
    across should be > within * 10
  }

  test("randomProject: dim mismatch fails fast; NULL vector yields NULL coordinates") {
    import org.apache.spark.sql.{Row, types => T}
    import scala.jdk.CollectionConverters._
    def df(rows: Seq[Row]) = spark.createDataFrame(
      rows.asJava,
      T.StructType(Seq(
        T.StructField("vec_id", T.LongType, nullable = false),
        T.StructField("embedding", T.ArrayType(T.FloatType), nullable = true))))
    val short = df(Seq(Row(1L, Seq(1.0f, 2.0f))))
    val ex = intercept[Exception] {
      Embeddings.randomProject(short, "embedding", dim = 4, k = 2).collect()
    }
    (ex.getMessage + Option(ex.getCause).map(_.getMessage).mkString) should
      include("expected vector dim")
    val withNull = df(Seq(Row(1L, Seq(1.0f, 2.0f, 3.0f, 4.0f)), Row(2L, null)))
    val out = Embeddings.randomProject(withNull, "embedding", dim = 4, k = 2)
      .collect().map(r => r.getLong(0) -> r.isNullAt(2)).toMap
    out(1L) shouldBe false
    out(2L) shouldBe true
  }

  test("pcaFit recovers planted principal axes; projection variance equals eigenvalues") {
    // Points on a tilted plane in 4-d: x = a*(1,1,0,0)/sqrt2 * 10 +
    // b*(0,0,1,-1)/sqrt2 * 2 — two planted axes with variance ratio 25.
    val r2 = math.sqrt(2.0)
    val pts = (0 until 400).map { i =>
      val a = ((i * 37) % 41).toDouble - 20.0   // spread ~[-20,20]
      val b = ((i * 53) % 11).toDouble - 5.0    // spread ~[-5,5]
      (i.toLong, Seq(
        (a * 10 / r2 + b * 0).toFloat, (a * 10 / r2).toFloat,
        (b * 2 / r2).toFloat, (-b * 2 / r2).toFloat))
    }
    val df = vecsDf(pts)
    val m = Embeddings.pcaFit(df, "embedding", dim = 4, k = 2)
    // top component aligns with the high-variance planted axis
    val w0 = m.components(0)
    val planted0 = Seq(1 / r2, 1 / r2, 0.0, 0.0)
    math.abs(w0.zip(planted0).map { case (x, y) => x * y }.sum) shouldBe 1.0 +- 1e-6
    val w1 = m.components(1)
    val planted1 = Seq(0.0, 0.0, 1 / r2, -1 / r2)
    math.abs(w1.zip(planted1).map { case (x, y) => x * y }.sum) shouldBe 1.0 +- 1e-6
    // orthonormal basis
    w0.map(x => x * x).sum shouldBe 1.0 +- 1e-9
    w1.map(x => x * x).sum shouldBe 1.0 +- 1e-9
    w0.zip(w1).map { case (x, y) => x * y }.sum shouldBe 0.0 +- 1e-9
    m.eigenvalues(0) should be > m.eigenvalues(1)
    // population variance of each projected coordinate = its eigenvalue
    val proj = Embeddings.pcaProject(df, "embedding", m)
    val vars = proj.agg(
      org.apache.spark.sql.functions.var_pop(org.apache.spark.sql.functions.col("pc0")),
      org.apache.spark.sql.functions.var_pop(org.apache.spark.sql.functions.col("pc1"))).head()
    vars.getDouble(0) shouldBe m.eigenvalues(0) +- 1e-3 * m.eigenvalues(0)
    vars.getDouble(1) shouldBe m.eigenvalues(1) +- 1e-3 * math.max(m.eigenvalues(1), 1e-9)
    // fit is invariant to partitioning (within float slack)
    val m13 = Embeddings.pcaFit(df.repartition(13), "embedding", dim = 4, k = 2)
    m13.components(0).zip(w0).foreach { case (x, y) => x shouldBe y +- 1e-9 }
  }

  test("pcaWhiten: coordinates are pc_j/sqrt(eigenvalue_j); unit variance; degenerate axes pass unscaled") {
    val r2 = math.sqrt(2.0)
    val pts = (0 until 400).map { i =>
      val a = ((i * 37) % 41).toDouble - 20.0
      val b = ((i * 53) % 11).toDouble - 5.0
      (i.toLong, Seq(
        (a * 10 / r2).toFloat, (a * 10 / r2).toFloat,
        (b * 2 / r2).toFloat, (-b * 2 / r2).toFloat))
    }
    val df = vecsDf(pts)
    val m = Embeddings.pcaFit(df, "embedding", dim = 4, k = 3)
    val both = Embeddings.pcaWhiten(
      Embeddings.pcaProject(df, "embedding", m), "embedding", m)
    // row-for-row: wpc_j == pc_j / sqrt(lambda_j) for signal axes
    both.collect().foreach { r =>
      (0 until 2).foreach { j =>
        r.getAs[Double](s"wpc$j") shouldBe
          (r.getAs[Double](s"pc$j") / math.sqrt(m.eigenvalues(j))) +- 1e-9
      }
      // 3rd axis is degenerate (points live on a 2-d plane): lambda ~ 0
      // -> UNSCALED passthrough, no 1/sqrt(~0) explosion
      r.getAs[Double]("wpc2") shouldBe r.getAs[Double]("pc2") +- 1e-9
    }
    m.eigenvalues(2) should be < 1e-9
    // unit variance on the signal axes
    import org.apache.spark.sql.functions.{col, var_pop}
    val vars = both.agg(var_pop(col("wpc0")), var_pop(col("wpc1"))).head()
    vars.getDouble(0) shouldBe 1.0 +- 1e-6
    vars.getDouble(1) shouldBe 1.0 +- 1e-6
  }

  test("pcaProject: NULL vectors yield NULL coordinates; wrong dim fails loudly") {
    val df = vecsDf(Seq(1L -> Seq(1f, 2f, 3f, 4f))).union(
      vecsDf(Seq(2L -> Seq(1f, 2f, 3f, 4f))).withColumn("embedding",
        org.apache.spark.sql.functions.lit(null).cast("array<float>")))
    val m = Embeddings.pcaFit(df, "embedding", dim = 4, k = 1)
    val out = Embeddings.pcaProject(df, "embedding", m)
      .collect().map(r => r.getLong(0) -> r.isNullAt(r.fieldIndex("pc0"))).toMap
    out(1L) shouldBe false
    out(2L) shouldBe true
    val bad = vecsDf(Seq(3L -> Seq(1f, 2f)))
    val e = intercept[Exception](Embeddings.pcaProject(bad, "embedding", m).collect())
    e.getMessage should include ("expected vector dim 4")
  }
}
