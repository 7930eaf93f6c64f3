package graft.functions

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** SQL-surface parity for the custom expressions: after registration,
  * `graft_dot` / `graft_simhash64` are callable from spark.sql with the
  * same results as the typed Column API. */
class GraftFunctionsSpec extends SparkSpec with Matchers {

  test("graft_dot and graft_simhash64 callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(2.0d, 0.5d, -1.0d)) AS d,
        |       graft_simhash64(array(xxhash64('a'), xxhash64('b'))) AS s
        |""".stripMargin).collect().head
    r.getDouble(0) shouldBe 0.0 +- 1e-12
    // deterministic: same value as the Column API path
    import org.apache.spark.sql.functions._
    val viaColumn = spark.range(1)
      .select(HashFunctions.simhash64(array(xxhash64(lit("a")), xxhash64(lit("b")))))
      .collect().head.getLong(0)
    r.getLong(1) shouldBe viaColumn
  }

  test("registration is idempotent and builder validates arity") {
    GraftFunctions.register(spark)
    GraftFunctions.register(spark)
    val ex = intercept[Exception](spark.sql("SELECT graft_dot(array(1.0d))").collect())
    ex.getMessage should include("graft_dot")
  }

  test("round-2 kernels callable from SQL after registration") {
    GraftFunctions.register(spark)
    val sig = spark.sql(
      "SELECT graft_minhash_sig(array('a b c', 'b c d'), 4) AS s").head().getSeq[Long](0)
    sig.length shouldBe 4
    sig.foreach(v => v should (be >= 0L and be < graft.ops.Dedup.PortableMinhashMod))
    val hs = spark.sql(
      "SELECT graft_md5_prefix60(array('x', 'y')) AS h").head().getSeq[Long](0)
    hs.length shouldBe 2
    hs.distinct.length shouldBe 2
    val rfp = spark.sql(
      "SELECT graft_rolling_minhash('abcdefghijklmnop', 4) AS r").head().getLong(0)
    val viaCol = spark.range(1).select(
      RollingHashFunctions.rollingMinHash(
        org.apache.spark.sql.functions.lit("abcdefghijklmnop"), 4)).head().getLong(0)
    rfp shouldBe viaCol
  }

  test("fused portable hashes match the interpreted SQL composition") {
    // The DuckDB oracle computes the portable family from md5 hex
    // strings; the fused codegen kernels must agree bit-for-bit.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (1 to 200).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(30))(s"w${rnd.nextInt(50)} x$i").toArray)
    }.toDF("id", "arr")
    val p = graft.ops.Dedup.PortableMinhashMod
    val k = 16
    val interpSig = array((0 until k).map { i =>
      array_min(transform(col("arr"), s =>
        (conv(substring(md5(s), 1, 15), 16, 10).cast("long") % p +
          lit(i.toLong) * (conv(substring(md5(s), 16, 15), 16, 10).cast("long") % p)) % p))
    }: _*)
    val sigRows = docs.select(
      HashFunctions.portableMinhashSignature(col("arr"), k, p).as("fused"),
      interpSig.as("interp")).collect()
    sigRows.foreach { r =>
      r.getSeq[Long](0) shouldBe r.getSeq[Long](1)
    }
    val hashRows = docs.select(
      HashFunctions.md5Prefix60Array(col("arr")).as("fused"),
      transform(col("arr"), s =>
        conv(substring(md5(s), 1, 15), 16, 10).cast("long")).as("interp")).collect()
    hashRows.foreach { r =>
      r.getSeq[Long](0) shouldBe r.getSeq[Long](1)
    }
  }

  test("extension class injects functions at session build time") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
      .newSession()
    // note: getOrCreate may return the shared session; newSession keeps
    // isolated state but shares extensions — either way the function
    // must resolve.
    GraftFunctions.register(s2) // belt and braces for the shared-session case
    val d = s2.sql("SELECT graft_dot(array(2.0d), array(3.0d)) AS d").collect().head.getDouble(0)
    d shouldBe 6.0 +- 1e-12
  }

  test("BloomMightContain: correct probes, and value-equal plans canonicalize equal") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.graft.Bridge
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    Seq("alpha", "beta", "gamma").foreach(bf.putString)
    import spark.implicits._
    val out = Seq("alpha", "delta", "gamma").toDF("s")
      .filter(HashFunctions.bloomMightContain(col("s"), bf))
      .collect().map(_.getString(0)).toSet
    out should contain allOf ("alpha", "gamma") // no false negatives, ever
    // the sketch rides as a BINARY Literal child, so two probes built
    // from bit-identical sketches are semantically equal — plan
    // canonicalization / cache reuse would break on an Array[Byte]
    // case-class field (reference equality). The value child is held
    // FIXED here: pre-analysis col("s") conversions carry Origins
    // that never compare equal; after analysis they resolve by exprId.
    val v = Bridge.expression(col("s"))
    def mk() = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      BloomMightContain(v, org.apache.spark.sql.catalyst.expressions
        .Literal(bos.toByteArray, org.apache.spark.sql.types.BinaryType))
    }
    mk().semanticEquals(mk()) shouldBe true // distinct byte arrays, equal plans
  }

  test("graft_dot compiles under codegen for NON-nullable array inputs") {
    // Regression: lenient DotProduct's loop guard referenced ev.isNull,
    // which nullSafeCodeGen never DECLARES when the expression is
    // non-nullable (strict = false + non-nullable children) — Janino
    // rejected the projection ("isNull_N is not an rvalue") and every
    // plan over Dataset/MemoryStream arrays silently ran interpreted.
    // CODEGEN_ONLY turns that silent fallback into a hard failure.
    import org.apache.spark.sql.{Row, types => T}
    import org.apache.spark.sql.functions.col
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      Seq(Row(Seq(1.0, 2.0, 3.0)), Row(Seq(0.5, -1.0, 2.0))).asJava,
      T.StructType(Seq(T.StructField("v",
        T.ArrayType(T.DoubleType, containsNull = false), nullable = false))))
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val out = df.select(
        graft.functions.VectorFunctions.dot(col("v"), col("v")).as("d"))
        .collect().map(_.getDouble(0)).sorted
      out(1) shouldBe 14.0 +- 1e-12
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.codegen.factoryMode", p)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }
}
