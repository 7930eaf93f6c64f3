package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.VectorFunctions

/** Similarity-search coverage: the codegen'd DotProduct expression is
  * checked bit-for-bit against the interpreted built-in composition and
  * a Scala fold; top-k results against a naive in-memory oracle. */
class SimilaritySpec extends SparkSpec with Matchers {
  import scala.jdk.CollectionConverters._

  private def vecsDf(vecs: Seq[(Long, Seq[Double])]) = {
    import org.apache.spark.sql.{Row, types => T}
    spark.createDataFrame(
      vecs.map { case (i, v) => Row(i, v) }.asJava,
      T.StructType(Seq(
        T.StructField("vec_id", T.LongType, nullable = false),
        T.StructField("embedding", T.ArrayType(T.DoubleType), nullable = true))))
  }

  test("DotProduct matches interpreted zip_with/aggregate composition bit-for-bit") {
    val rnd = new scala.util.Random(11)
    val vecs = (1L to 50L).map(i => i -> Seq.fill(64)(rnd.nextDouble() * 2 - 1))
    val df = vecsDf(vecs)
    val both = df.select(
      VectorFunctions.dot(col("embedding"), col("embedding")).as("fast"),
      aggregate(zip_with(col("embedding"), col("embedding"), (x, y) => x * y),
        lit(0.0d), (acc, x) => acc + x).as("slow"))
      .collect()
    both.foreach { r =>
      // exact equality: both are sequential left-to-right IEEE adds
      assert(r.getDouble(0) == r.getDouble(1))
    }
  }

  test("DotProduct: interpreted eval path agrees with codegen path") {
    val vecs = Seq(1L -> Seq(1.0, 2.0, 3.0), 2L -> Seq(-0.5, 0.25, 4.0))
    val df = vecsDf(vecs)
    // force interpreted path by evaluating through a filter on the driver
    val fast = df.select(VectorFunctions.dot(col("embedding"), col("embedding")).as("d"))
      .collect().map(_.getDouble(0)).sorted
    val expected = vecs.map { case (_, v) => v.map(x => x * x).sum }.sorted
    fast.zip(expected).foreach { case (a, b) => a shouldBe b +- 1e-12 }
  }

  test("DotProduct null handling: null array yields null, null element skipped") {
    import org.apache.spark.sql.{Row, types => T}
    val df = spark.createDataFrame(
      Seq(Row(Seq(1.0, 2.0), Seq(3.0, 4.0)), Row(null, Seq(1.0)),
        Row(Seq(1.0, null, 2.0), Seq(2.0, 5.0, 10.0))).asJava,
      T.StructType(Seq(
        T.StructField("a", T.ArrayType(T.DoubleType), nullable = true),
        T.StructField("b", T.ArrayType(T.DoubleType), nullable = true))))
    val out = df.select(VectorFunctions.dot(col("a"), col("b"))).collect()
    out(0).getDouble(0) shouldBe 11.0
    out(1).isNullAt(0) shouldBe true
    out(2).getDouble(0) shouldBe 22.0 // null element contributes 0
  }

  test("hardNegatives: same-label vectors never appear; ranks follow cosine") {
    import org.apache.spark.sql.{Row, types => T}
    import scala.jdk.CollectionConverters._
    val rnd = new scala.util.Random(11)
    val vecs = (1L to 24L).map(i =>
      (i, Seq.fill(6)(rnd.nextDouble() * 2 - 1), (i % 3).toInt))
    val df = spark.createDataFrame(
      vecs.map { case (i, v, l) => Row(i, v, l) }.asJava,
      T.StructType(Seq(
        T.StructField("vec_id", T.LongType, nullable = false),
        T.StructField("embedding", T.ArrayType(T.DoubleType), nullable = true),
        T.StructField("label", T.IntegerType, nullable = false))))
    val k = 3
    val got = Similarity.hardNegatives(df, "vec_id", "embedding", "label", k)
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> (r.getInt(1), r.getLong(2)))
      .toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val byId = vecs.map(v => v._1 -> v).toMap
    for ((qi, qv, ql) <- vecs) {
      val expected = vecs.filter(_._3 != ql)
        .map { case (ci, cv, _) => (ci, cos(qv, cv)) }
        .sortBy { case (ci, c) => (-c, ci) }.take(k).map(_._1)
      expected.zipWithIndex.foreach { case (ci, rank) =>
        val (label, neighbor) = got((qi, rank + 1L))
        label shouldBe ql
        neighbor shouldBe ci
        byId(neighbor)._3 should not be ql
      }
    }
  }

  private def labeledClusteredDf(n: Int, dim: Int, seed: Int) = {
    import org.apache.spark.sql.{Row, types => T}
    val rnd = new scala.util.Random(seed)
    val centers = Seq.fill(4)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
    val vecs = (1L to n.toLong).map { i =>
      val c = centers((i % 4).toInt)
      (i, c.map(x => x + (rnd.nextDouble() - 0.5) * 0.2), (i % 3).toInt)
    }
    val df = spark.createDataFrame(
      vecs.map { case (i, v, l) => Row(i, v, l) }.asJava,
      T.StructType(Seq(
        T.StructField("vec_id", T.LongType, nullable = false),
        T.StructField("embedding", T.ArrayType(T.DoubleType), nullable = true),
        T.StructField("label", T.IntegerType, nullable = false))))
    (df, vecs)
  }

  test("hardNegativesLsh/Ivf: cross-label only, recall vs exact clears the dial") {
    val (df, vecs) = labeledClusteredDf(n = 60, dim = 16, seed = 41)
    val byId = vecs.map(v => v._1 -> v).toMap
    def pairSet(out: org.apache.spark.sql.DataFrame) =
      out.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = pairSet(
      Similarity.hardNegatives(df, "vec_id", "embedding", "label", 3))
    for (approx <- Seq(
        Similarity.hardNegativesLsh(df, "vec_id", "embedding", "label", 3,
          dim = 16, nPlanes = 3, tables = 6),
        Similarity.hardNegativesIvf(df, "vec_id", "embedding", "label", 3,
          nCentroids = 8, nProbe = 5))) {
      val pairs = pairSet(approx)
      // every emitted pair genuinely crosses labels
      pairs.foreach { case (q, nb) =>
        byId(q)._3 should not be byId(nb)._3
      }
      // output respects the top-k bound per query
      approx.collect().groupBy(_.getLong(0)).values
        .foreach(_.length should be <= 3)
      val recall = (pairs intersect exact).size.toDouble / exact.size
      recall should be > 0.7
    }
  }

  test("bruteForceTopK matches a naive cosine oracle") {
    val rnd = new scala.util.Random(3)
    val vecs = (1L to 20L).map(i => i -> Seq.fill(8)(rnd.nextDouble() * 2 - 1))
    val k = 4
    val got = Similarity.bruteForceTopK(vecsDf(vecs), "vec_id", "embedding", k)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap

    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    for ((qi, qv) <- vecs) {
      val expected = vecs.filter(_._1 != qi)
        .map { case (ci, cv) => (ci, cos(qv, cv)) }
        .sortBy { case (ci, c) => (-c, ci) }.take(k).map(_._1)
      expected.zipWithIndex.foreach { case (ci, rank) =>
        got((qi, rank + 1L)) shouldBe ci
      }
    }
  }

  test("multi-table LSH recall >= single-table recall against brute force") {
    val rnd = new scala.util.Random(29)
    // clustered vectors: the regime LSH is built for (uniform-random
    // vectors have near-zero pairwise cosine and defeat any LSH)
    val centers = Seq.fill(5)(Seq.fill(16)(rnd.nextDouble() * 2 - 1))
    val vecs = (1L to 60L).map { i =>
      val c = centers((i % 5).toInt)
      i -> c.map(x => x + (rnd.nextDouble() - 0.5) * 0.2)
    }
    val df = vecsDf(vecs)
    def pairSet(out: org.apache.spark.sql.DataFrame) =
      out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairSet(Similarity.bruteForceTopK(df, "vec_id", "embedding", 3))
    val single = pairSet(Similarity.lshTopK(df, "vec_id", "embedding", 3, 16, 6))
    val multi = pairSet(Similarity.lshTopKMultiTable(df, "vec_id", "embedding", 3, 16, 6, 4))
    val recallSingle = (single intersect truth).size.toDouble / truth.size
    val recallMulti = (multi intersect truth).size.toDouble / truth.size
    recallMulti should be >= recallSingle
    recallMulti should be > 0.8
  }

  test("IVF: deterministic fit, full assignment coverage, recall beats probe fraction") {
    val rnd = new scala.util.Random(23)
    // 8 well-separated cluster centers + noise → IVF's favorable shape
    val centers = Array.fill(8, 16)(rnd.nextGaussian() * 5)
    val vecs = (1L to 400L).map { i =>
      val c = centers(rnd.nextInt(8))
      i -> c.map(_ + rnd.nextGaussian() * 0.5).toSeq
    }
    val df = vecsDf(vecs)
    val c1 = Similarity.ivfCentroids(df, "vec_id", "embedding", nCentroids = 8, iters = 3)
    val c2 = Similarity.ivfCentroids(df, "vec_id", "embedding", nCentroids = 8, iters = 3)
    // decimal-sum means → bit-identical fit across runs
    c1.map(_.toSeq) shouldBe c2.map(_.toSeq)

    val ivf = Similarity.ivfTopK(df, "vec_id", "embedding", k = 3,
      nCentroids = 8, nProbe = 2, iters = 3)
    val bf = Similarity.bruteForceTopK(df, "vec_id", "embedding", k = 3)
    val hits = bf.join(ivf, Seq("query_id", "neighbor_id"), "left_semi").count()
    val recall = hits.toDouble / bf.count()
    // clustered data: probing 2/8 of the space must recover far more
    // than 2/8 of the true neighbors
    recall should be > 0.6
    // every query returns rows (no centroid bucket lost)
    ivf.select("query_id").distinct().count() shouldBe 400L
  }

  test("CentroidScores expression matches the literal-dot composition") {
    val rnd = new scala.util.Random(31)
    val cents = Seq.fill(5)(Seq.fill(8)(rnd.nextGaussian()))
    val vecs = (1L to 50L).map(i => i -> Seq.fill(8)(rnd.nextGaussian()))
    val df = vecsDf(vecs)
    val composed = array(cents.map { c =>
      VectorFunctions.dot(col("embedding"), array(c.map(lit): _*)) * 2 -
        lit(c.map(x => x * x).sum)
    }: _*)
    val rows = df.select(
      VectorFunctions.centroidScores(col("embedding"), cents).as("fused"),
      composed.as("interp")).collect()
    rows.foreach { r =>
      r.getSeq[Double](0).zip(r.getSeq[Double](1)).foreach { case (a, b) =>
        a shouldBe b +- 1e-12
      }
    }
  }

  test("lshTopK: bucketed neighbors are a subset of brute-force candidates with correct ranks") {
    val rnd = new scala.util.Random(5)
    // clustered vectors so buckets are meaningful
    val centers = Seq.fill(3)(Seq.fill(16)(rnd.nextDouble() * 2 - 1))
    val vecs = (1L to 30L).map { i =>
      val c = centers((i % 3).toInt)
      i -> c.map(x => x + rnd.nextDouble() * 0.05)
    }
    val out = Similarity.lshTopK(vecsDf(vecs), "vec_id", "embedding", k = 3,
      dim = 16, nPlanes = 2)
    val rows = out.collect()
    rows.length should be > 0
    // ranks are 1..k per query, no self-pairs
    rows.foreach { r =>
      r.getLong(0) should not be r.getLong(1)
      r.getLong(2) should (be >= 1L and be <= 3L)
    }
    // determinism: same plan evaluated twice gives identical rows
    val again = Similarity.lshTopK(vecsDf(vecs), "vec_id", "embedding", k = 3,
      dim = 16, nPlanes = 2).collect()
    rows.map(_.toString).sorted shouldBe again.map(_.toString).sorted
  }

  test("AdcScore matches per-subspace reconstruction dots; codes validated") {
    val rnd = new scala.util.Random(47)
    val m = 4; val subDim = 4; val kSub = 3
    val books = Seq.fill(m)(Seq.fill(kSub)(Seq.fill(subDim)(rnd.nextGaussian())))
    val q = Seq.fill(m * subDim)(rnd.nextGaussian())
    val codes = Seq(2, 0, 1, 2)
    val expected = (0 until m).map { j =>
      (0 until subDim).map(d => q(j * subDim + d) * books(j)(codes(j))(d)).sum
    }.sum
    import spark.implicits._
    val df = Seq((q, codes)).toDF("q", "codes")
    val got = df.select(
      VectorFunctions.adcScore(col("q"), col("codes"), books).as("s"))
      .head().getDouble(0)
    got shouldBe expected +- 1e-12
    // wrong code-array length fails fast, not a silent wrong rank
    val bad = Seq((q, Seq(1, 2))).toDF("q", "codes")
    val ex = intercept[Exception] {
      bad.select(VectorFunctions.adcScore(col("q"), col("codes"), books)).collect()
    }
    (ex.getMessage + Option(ex.getCause).map(_.getMessage).mkString) should
      include("subspaces")
  }

  test("PQ: deterministic codebooks, codes in range, IVF-PQ recall on clustered data") {
    val rnd = new scala.util.Random(59)
    val centers = Array.fill(8, 16)(rnd.nextGaussian() * 5)
    val vecs = (1L to 400L).map { i =>
      val c = centers(rnd.nextInt(8))
      i -> c.map(_ + rnd.nextGaussian() * 0.5).toSeq
    }
    val df = vecsDf(vecs)
    val b1 = Similarity.pqCodebooks(df, "vec_id", "embedding", m = 4, kSub = 8)
    val b2 = Similarity.pqCodebooks(df, "vec_id", "embedding", m = 4, kSub = 8)
    b1 shouldBe b2 // decimal-sum fit -> bit-identical codebooks
    val enc = Similarity.pqEncode(df, "embedding", b1)
      .select(col("vec_id"), col("pq_codes")).collect()
    enc.foreach { r =>
      val cs = r.getAs[scala.collection.Seq[Int]]("pq_codes")
      cs should have size 4
      cs.foreach { c => c should (be >= 0 and be < 8) }
    }
    // a vector whose dim != m*subDim fails fast instead of silently
    // encoding truncated subvectors
    val short = vecsDf(Seq(1L -> Seq.fill(8)(0.5)))
    val dimEx = intercept[Exception] {
      Similarity.pqEncode(short, "embedding", b1).collect()
    }
    (dimEx.getMessage + Option(dimEx.getCause).map(_.getMessage).mkString) should
      include("expected vector dim")
    val pq = Similarity.ivfpqTopK(df, "vec_id", "embedding", k = 3,
      nCentroids = 8, nProbe = 2, m = 4, kSub = 8)
    val bf = Similarity.bruteForceTopK(df, "vec_id", "embedding", k = 3)
    val hits = bf.join(pq, Seq("query_id", "neighbor_id"), "left_semi").count()
    val recall = hits.toDouble / bf.count()
    recall should be > 0.5 // coarse pruning + ADC quantization error
    pq.select("query_id").distinct().count() shouldBe 400L
  }

  test("fitSample: small corpus passes through untouched; large corpus bounded + deterministic, no full pre-count") {
    import spark.implicits._
    val small = (1L to 100L).map(i => (i, Seq(i.toDouble))).toDF("id", "v")
    // reference-identical return proves the small path never rewrites
    // the frame (and therefore never needed a corpus-wide count)
    assert(Similarity.fitSample(small, 200L) eq small)
    val big = (1L to 5000L).map(i => (i, Seq(i.toDouble))).toDF("id", "v")
    val s1 = Similarity.fitSample(big, 400L).select("id").collect().map(_.getLong(0)).toSet
    val s2 = Similarity.fitSample(big, 400L).select("id").collect().map(_.getLong(0)).toSet
    s1 shouldBe s2 // hash-threshold sampling is deterministic
    s1.size should be > 0
    s1.size should be < 5000 // genuinely sampled
    s1.subsetOf((1L to 5000L).toSet) shouldBe true
  }

  test("fit sampling survives non-numeric ids and NULL vectors pass pqEncode") {
    import org.apache.spark.sql.{Row, types => T}
    import scala.jdk.CollectionConverters._
    val rnd = new scala.util.Random(79)
    // 500 rows with STRING ids and nCentroids=2 → target 400 < 500, so
    // the sampling path engages; a long-cast hash would NULL every id
    // and train on an empty sample (empty result / head on empty).
    val rows = (1 to 500).map(i =>
      Row(s"doc-$i", Seq.fill(8)(rnd.nextGaussian())))
    val df = spark.createDataFrame(
      rows.asJava,
      T.StructType(Seq(
        T.StructField("vec_id", T.StringType, nullable = false),
        T.StructField("embedding", T.ArrayType(T.DoubleType), nullable = true))))
    val out = Similarity.ivfTopK(df, "vec_id", "embedding", k = 2,
      nCentroids = 2, nProbe = 1)
    out.count() should be > 0L
    out.select("query_id").distinct().count() shouldBe 500L
    // a NULL-vector row in the corpus neither crashes the fit's
    // driver-side collects nor appears as query or neighbor
    val withNullRow = spark.createDataFrame(
      (rows :+ Row("doc-null", null)).asJava,
      T.StructType(Seq(
        T.StructField("vec_id", T.StringType, nullable = false),
        T.StructField("embedding", T.ArrayType(T.DoubleType), nullable = true))))
    val outN = Similarity.ivfpqTopK(withNullRow, "vec_id", "embedding", k = 2,
      nCentroids = 2, nProbe = 1, m = 2, kSub = 2)
    outN.filter(col("query_id") === "doc-null" ||
      col("neighbor_id") === "doc-null").count() shouldBe 0L
    outN.count() should be > 0L
    // NULL embedding: pq_codes stays NULL instead of killing the job
    val withNull = spark.createDataFrame(
      (rows.take(4) :+ Row("doc-null", null)).asJava,
      T.StructType(Seq(
        T.StructField("vec_id", T.StringType, nullable = false),
        T.StructField("embedding", T.ArrayType(T.DoubleType), nullable = true))))
    val books = Seq.fill(2)(Seq.fill(2)(Seq.fill(4)(0.0)))
    val enc = Similarity.pqEncode(withNull, "embedding", books)
      .collect().map(r => r.getString(0) -> r.isNullAt(2)).toMap
    enc("doc-null") shouldBe true
    enc("doc-1") shouldBe false
  }

  test("fitIndex's fused multi-fit is bit-identical to the independent per-fit loops") {
    // fitIndex drives the coarse quantizer and every PQ subspace
    // codebook through ONE shared job chain (fitCentroidsFused); this
    // pins that fusion against the UN-fused reference still used by
    // ivfCentroids — the same Lloyd loop run independently per fit.
    // Exact equality (doubles bit-compare): same init rows, same
    // assignment kernel, same exact-DECIMAL stats groups.
    import org.apache.spark.sql.functions.{col, slice}
    val rnd = new scala.util.Random(41)
    val centers = Array.fill(5, 16)(rnd.nextGaussian() * 4)
    val df = vecsDf((1L to 120L).map { i =>
      i -> centers(rnd.nextInt(5)).map(_ + rnd.nextGaussian() * 0.6).toSeq
    })
    val m = 4
    val kSub = 4
    val idx = Similarity.fitIndex(df, "vec_id", "embedding",
      nCentroids = 5, m = m, kSub = kSub)
    // Coarse face: the per-fit reference over the full vector.
    val coarseRef = Similarity.ivfCentroids(df, "vec_id", "embedding",
      nCentroids = 5)
    idx.centroids.map(_.toSeq).toSeq shouldBe coarseRef.map(_.toSeq).toSeq
    // Every subspace codebook: the per-fit reference over the slice.
    val subDim = 16 / m
    (0 until m).foreach { j =>
      val sliced = df.select(col("vec_id"),
        slice(col("embedding"), j * subDim + 1, subDim).as("embedding"))
      val bookRef = Similarity.ivfCentroids(sliced, "vec_id", "embedding",
        nCentroids = kSub)
      idx.books(j) shouldBe bookRef.map(_.toSeq).toSeq
    }
    // Fit-what-exists survives the fusion: fewer rows than centroids.
    val tiny = vecsDf((1L to 3L).map(i => i -> Seq.fill(16)(i.toDouble)))
    Similarity.fitIndex(tiny, "vec_id", "embedding",
      nCentroids = 5, m = m, kSub = kSub).centroids.length shouldBe 3
  }

  test("AnnIndex: parquet save/load round-trips; prebuilt index reproduces results") {
    val rnd = new scala.util.Random(73)
    val centers = Array.fill(6, 16)(rnd.nextGaussian() * 5)
    val df = vecsDf((1L to 300L).map { i =>
      i -> centers(rnd.nextInt(6)).map(_ + rnd.nextGaussian() * 0.5).toSeq
    })
    val idx = Similarity.fitIndex(df, "vec_id", "embedding",
      nCentroids = 6, m = 4, kSub = 8)
    val path = java.nio.file.Files.createTempDirectory("graft-annidx").toString
    Similarity.saveIndex(idx, path, spark)
    val loaded = Similarity.loadIndex(path, spark)
    loaded.centroids.map(_.toSeq).toSeq shouldBe idx.centroids.map(_.toSeq).toSeq
    loaded.books shouldBe idx.books
    // queries served from the loaded index == queries with a fresh fit
    // (the fit is deterministic, so both paths coincide exactly)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fresh = rows(Similarity.ivfpqTopK(df, "vec_id", "embedding", k = 3,
      nCentroids = 6, nProbe = 2, m = 4, kSub = 8))
    val served = rows(Similarity.ivfpqTopK(df, "vec_id", "embedding", k = 3,
      nCentroids = 6, nProbe = 2, m = 4, kSub = 8, prebuilt = Some(loaded)))
    served shouldBe fresh
  }

  test("encodeCorpus/searchEncoded: append-composable corpus searches identically to one-shot + ivfpqTopK") {
    val rnd = new scala.util.Random(91)
    val centers = Array.fill(6, 16)(rnd.nextGaussian() * 5)
    val df = vecsDf((1L to 400L).map { i =>
      i -> centers(rnd.nextInt(6)).map(_ + rnd.nextGaussian() * 0.5).toSeq
    })
    val idx = Similarity.fitIndex(df, "vec_id", "embedding",
      nCentroids = 6, m = 4, kSub = 8)
    val full = Similarity.encodeCorpus(df, "vec_id", "embedding", idx)
    // append-composability under a fixed index: encode per half, union
    val merged = Similarity.encodeCorpus(
        df.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", idx)
      .unionAll(Similarity.encodeCorpus(
        df.filter(col("vec_id") % 2 =!= 0), "vec_id", "embedding", idx))
    def res(corpus: org.apache.spark.sql.DataFrame) =
      Similarity.searchEncoded(df, corpus, "vec_id", "embedding", idx,
        k = 3, nProbe = 2, refine = 32)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    val oneShot = res(full)
    res(merged) shouldBe oneShot
    // ...and the composed path equals the monolithic operator
    val mono = Similarity.ivfpqTopK(df, "vec_id", "embedding", k = 3,
      nCentroids = 6, nProbe = 2, m = 4, kSub = 8, refine = 32,
      prebuilt = Some(idx))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    mono shouldBe oneShot
  }

  test("nearDupAgainst: full recall on separable clusters, every pair exactly scored, novel arrivals pass") {
    val rnd = new scala.util.Random(53)
    // three tight, far-apart clusters: near-dup pairs exist only
    // within a cluster, so probe recall is structurally 1.0 and the
    // serve result must EQUAL the exact cross-pair set
    val centers = Array.fill(3, 16)(rnd.nextGaussian() * 20)
    val all = (1L to 120L).map { i =>
      i -> centers((i % 3).toInt).map(_ + rnd.nextGaussian() * 0.1).toSeq
    } :+ (999L -> Seq.fill(16)(rnd.nextGaussian() * 0.01)) // near-origin: novel
    val df = vecsDf(all)
    val hist = df.filter(col("vec_id") % 2 === 0)
    val arr = df.filter(col("vec_id") % 2 =!= 0)
    val idx = Similarity.fitIndex(hist, "vec_id", "embedding",
      nCentroids = 3, m = 4, kSub = 8)
    val served = Similarity.nearDupAgainst(
      arr, hist, Similarity.encodeCorpus(hist, "vec_id", "embedding", idx),
      "vec_id", "embedding", idx, threshold = 0.9, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.embeddingCosinePairs(df, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .collect {
        case (a, b) if a % 2 != 0 && b % 2 == 0 => (a, b)
        case (a, b) if a % 2 == 0 && b % 2 != 0 => (b, a)
      }.toSet
    served shouldBe exact
    served.map(_._1) should not contain 999L // the novel vector pairs with no one
    // exact-refined scores: every emitted cos matches the direct cosine
    val scored = Similarity.nearDupAgainst(
      arr, hist, Similarity.encodeCorpus(hist, "vec_id", "embedding", idx),
      "vec_id", "embedding", idx, threshold = 0.9, nProbe = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val vecs = all.toMap
    scored.foreach { case ((n, b), cos) =>
      val (qv, bv) = (vecs(n), vecs(b))
      val direct = qv.zip(bv).map(t => t._1 * t._2).sum /
        (math.sqrt(qv.map(x => x * x).sum) * math.sqrt(bv.map(x => x * x).sum))
      cos shouldBe direct +- 1e-9
    }
  }

  test("nearDupAgainst serveStats: the adcMargin's cost is observable on the serve's own action") {
    val rnd = new scala.util.Random(53)
    val centers = Array.fill(3, 16)(rnd.nextGaussian() * 20)
    val all = (1L to 120L).map { i =>
      i -> centers((i % 3).toInt).map(_ + rnd.nextGaussian() * 0.1).toSeq
    }
    val df = vecsDf(all)
    val hist = df.filter(col("vec_id") % 2 === 0)
    val arr = df.filter(col("vec_id") % 2 =!= 0)
    val idx = Similarity.fitIndex(hist, "vec_id", "embedding",
      nCentroids = 3, m = 4, kSub = 8)
    val encoded = Similarity.encodeCorpus(hist, "vec_id", "embedding", idx)
    def serveWith(margin: Double): (Long, Long, Long) = {
      val obs = new org.apache.spark.sql.Observation()
      val pairs = Similarity.nearDupAgainst(
        arr, hist, encoded, "vec_id", "embedding", idx,
        threshold = 0.9, nProbe = 2, adcMargin = margin,
        serveStats = Some(obs)).count()
      val m = obs.get
      (m("adc_candidates").asInstanceOf[Long],
        m("probed_buckets").asInstanceOf[Int].toLong, pairs)
    }
    val (candTight, bucketsTight, pairsTight) = serveWith(0.05)
    val (candWide, bucketsWide, pairsWide) = serveWith(2.0)
    // Rows the margin admits to exact refinement: at least every
    // emitted pair (refinement only filters), and monotone in the
    // margin — the widened dial's cost is now a measured number, not
    // a guess (r14 verdict #7).
    candTight should be >= pairsTight
    candWide should be >= candTight
    pairsWide should be >= pairsTight
    // margin=2.0 admits EVERY probed-bucket candidate: the observed
    // count equals the probe-join's row count, pinning what the
    // metric measures.
    bucketsWide shouldBe bucketsTight
    bucketsWide should be >= 1L
  }

  test("saveEncodedCorpus: cid-partitioned round trip serves identically; probed-cid pruning reads only probed buckets") {
    val rnd = new scala.util.Random(91)
    val centers = Array.fill(8, 16)(rnd.nextGaussian() * 20)
    val all = (1L to 160L).map { i =>
      // cluster by (i/2) % 8 so the even (history) and odd (arrival)
      // halves both populate every cluster
      i -> centers(((i / 2) % 8).toInt).map(_ + rnd.nextGaussian() * 0.1).toSeq
    }
    val df = vecsDf(all)
    val hist = df.filter(col("vec_id") % 2 === 0)
    val idx = Similarity.fitIndex(hist, "vec_id", "embedding",
      nCentroids = 8, m = 4, kSub = 8)
    val encoded = Similarity.encodeCorpus(hist, "vec_id", "embedding", idx)
    val scratch = java.nio.file.Files.createTempDirectory("graft-encp").toString
    Similarity.saveEncodedCorpus(encoded, s"$scratch/enc")
    val loaded = Similarity.loadEncodedCorpus(spark, s"$scratch/enc")
    loaded.count() shouldBe encoded.count()

    // one arrival from one cluster: probes 2 of 8 buckets
    val arr = df.filter(col("vec_id") === 17L)
    val servedP = Similarity.nearDupAgainst(
      arr, hist, loaded, "vec_id", "embedding", idx,
      threshold = 0.9, nProbe = 2, adcMargin = 2.0)
    val servedF = Similarity.nearDupAgainst(
      arr, hist, encoded, "vec_id", "embedding", idx,
      threshold = 0.9, nProbe = 2, adcMargin = 2.0)
    val pSet = servedP.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fSet = servedF.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    pSet should not be empty
    pSet shouldBe fSet

    // Pruning pin: the partitioned layout has ~8 bucket files; a
    // 2-probe single-arrival serve may read at most 2 of them.
    def filesRead(d: org.apache.spark.sql.DataFrame): Long =
      d.select(org.apache.spark.sql.functions.input_file_name())
        .distinct().count()
    val allFiles = filesRead(loaded)
    allFiles should be >= 6L
    // reconstruct the serve's probed-cid filter
    val probed = Similarity.assignCentroid(arr, "embedding", idx)
      .select("centroid").collect().map(_.getInt(0)).toSeq
    filesRead(loaded.filter(col("cid").isin(probed: _*))) should be <= 2L
  }

  test("nearDupAgainst stored-vector layout: identical pairs to the history-join path, history never read") {
    val rnd = new scala.util.Random(23)
    val centers = Array.fill(6, 16)(rnd.nextGaussian() * 20)
    val all = (1L to 180L).map { i =>
      i -> centers(((i / 2) % 6).toInt).map(_ + rnd.nextGaussian() * 0.1).toSeq
    }
    val df = vecsDf(all)
    val hist = df.filter(col("vec_id") % 2 === 0)
    val arr = df.filter(col("vec_id") % 2 =!= 0)
    val idx = Similarity.fitIndex(hist, "vec_id", "embedding",
      nCentroids = 6, m = 4, kSub = 8)
    val plain = Similarity.encodeCorpus(hist, "vec_id", "embedding", idx)
    val stored = Similarity.encodeCorpus(hist, "vec_id", "embedding", idx,
      storeVectors = true)
    stored.columns should contain allOf ("hv", "hn")
    val viaHist = Similarity.nearDupAgainst(
      arr, hist, plain, "vec_id", "embedding", idx,
      threshold = 0.9, nProbe = 3, adcMargin = 2.0)
    // hist.limit(0): if the stored-vector path read history, every
    // pair would vanish — completeness below proves it did not
    val viaStored = Similarity.nearDupAgainst(
      arr, hist.limit(0), stored, "vec_id", "embedding", idx,
      threshold = 0.9, nProbe = 3, adcMargin = 2.0)
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e9) / 1e9)).toSet
    val h = pairs(viaHist)
    h should not be empty
    pairs(viaStored) shouldBe h
    // round trips through the partitioned layout keep the columns
    val scratch = java.nio.file.Files.createTempDirectory("graft-encsv").toString
    Similarity.saveEncodedCorpus(stored, s"$scratch/enc")
    val loaded = Similarity.loadEncodedCorpus(spark, s"$scratch/enc")
    loaded.columns should contain allOf ("hv", "hn")
    pairs(Similarity.nearDupAgainst(
      arr, hist.limit(0), loaded, "vec_id", "embedding", idx,
      threshold = 0.9, nProbe = 3, adcMargin = 2.0)) shouldBe h
  }

  test("appendEncodedCorpus: batch-cadence appends land in the cid layout and serve like one save") {
    val rnd = new scala.util.Random(47)
    val centers = Array.fill(4, 12)(rnd.nextGaussian() * 20)
    val all = (1L to 120L).map { i =>
      i -> centers((i % 4).toInt).map(_ + rnd.nextGaussian() * 0.1).toSeq
    }
    val df = vecsDf(all)
    val idx = Similarity.fitIndex(df, "vec_id", "embedding",
      nCentroids = 4, m = 4, kSub = 8)
    val scratch = java.nio.file.Files.createTempDirectory("graft-encapp").toString
    // three maintenance-cadence appends vs one save of everything
    val parts = Seq(
      df.filter(col("vec_id") <= 40L),
      df.filter(col("vec_id") > 40L && col("vec_id") <= 80L),
      df.filter(col("vec_id") > 80L))
    Similarity.saveEncodedCorpus(
      Similarity.encodeCorpus(parts.head, "vec_id", "embedding", idx),
      s"$scratch/inc")
    parts.tail.foreach { p =>
      Similarity.appendEncodedCorpus(
        Similarity.encodeCorpus(p, "vec_id", "embedding", idx), s"$scratch/inc")
    }
    Similarity.saveEncodedCorpus(
      Similarity.encodeCorpus(df, "vec_id", "embedding", idx), s"$scratch/one")
    def rows(p: String): Seq[String] =
      Similarity.loadEncodedCorpus(spark, p).collect().map(_.toString).sorted.toSeq
    rows(s"$scratch/inc") shouldBe rows(s"$scratch/one")
    // still partition-pruned after appends: one cid directory holds
    // this cluster's rows, and filtering to it reads only its files
    val loaded = Similarity.loadEncodedCorpus(spark, s"$scratch/inc")
    val oneCid = loaded.select("cid").limit(1).collect().head.getInt(0)
    val filesAll = loaded.select(input_file_name()).distinct().count()
    val filesOne = loaded.filter(col("cid") === oneCid)
      .select(input_file_name()).distinct().count()
    filesOne should be < filesAll
    filesOne should be <= 3L // ≤ one file per append at this cid

    // compaction folds the per-batch files back to one per cid
    // directory, rows untouched
    Similarity.compactEncodedCorpus(spark, s"$scratch/inc")
    rows(s"$scratch/inc") shouldBe rows(s"$scratch/one")
    val compacted = Similarity.loadEncodedCorpus(spark, s"$scratch/inc")
    val nCids = compacted.select("cid").distinct().count()
    compacted.select(input_file_name()).distinct().count() shouldBe nCids
  }

  test("pqIndexStream: per-batch encodings append to exactly the batch-encoded corpus") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val vecs = (1L to 200L).map(i => i -> Seq.fill(16)(rnd.nextGaussian()))
    val df = vecsDf(vecs)
    val idx = Similarity.fitIndex(df, "vec_id", "embedding",
      nCentroids = 4, m = 4, kSub = 8)
    val appended = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val stream = MemoryStream[(Long, Seq[Double])]
    val q = graft.streaming.StreamingOps.pqIndexStream(
      stream.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding", idx) {
      (enc, _) => appended.synchronized { appended ++= enc.collect() }
    }.start()
    try {
      vecs.grouped(50).foreach { chunk =>
        stream.addData(chunk); q.processAllAvailable()
      }
      val batchTwin = Similarity.encodeCorpus(df, "vec_id", "embedding", idx)
        .collect().map(_.toString).sorted.toSeq
      appended.map(_.toString).sorted.toSeq shouldBe batchTwin
    } finally q.stop()
  }

  test("corpus domains: planted clusters recover, matrix overload == index overload") {
    import spark.implicits._
    // Two well-separated planted clusters in 8 dims.
    def near(center: Double, i: Int): Seq[Double] =
      (0 until 8).map(d => center + ((i * 31 + d * 17) % 7 - 3) * 0.01)
    val vecs = (1L to 30L).map(i => (i, near(if (i <= 15) 10.0 else -10.0, i.toInt)))
    val df = vecs.toDF("vec_id", "embedding")
    val cents = Similarity.ivfCentroids(df, "vec_id", "embedding",
      nCentroids = 2, iters = 4)
    val out = Similarity.assignCentroid(df, "embedding", cents)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    // one pure domain per planted cluster
    (1L to 15L).map(out).toSet should have size 1
    (16L to 30L).map(out).toSet should have size 1
    out(1L) should not be out(30L)
    // assignment is optimal against brute-force distances
    vecs.foreach { case (id, v) =>
      val d = cents.map(c => c.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum)
      d(out(id)) shouldBe d.min
    }
  }
}
