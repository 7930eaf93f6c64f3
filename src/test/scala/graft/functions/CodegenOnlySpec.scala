package graft.functions

import org.apache.spark.sql.{DataFrame, Row, types => T}
import org.apache.spark.sql.functions.col
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Every custom expression must COMPILE under codegen for both
  * nullable and NON-nullable inputs — the graft_dot regression class:
  * `nullSafeCodeGen` declares the isNull variable only for nullable
  * expressions, so generated code that references it (or any other
  * nullability-dependent scaffolding) compiles fine against parquet
  * scans (nullable arrays) yet silently de-codegens every
  * Dataset-of-case-class / MemoryStream plan, visible only as a WARN
  * in full logs. `CODEGEN_ONLY` factory mode turns that silent
  * interpreter fallback into a hard failure, and this sweep runs each
  * public Column entry point over BOTH nullability shapes.
  *
  * (Whole-stage codegen has its own fallback path that this mode does
  * not gate, but the expression-level scaffolding it compiles is the
  * same — a Janino rejection here means a rejection there.)
  */
class CodegenOnlySpec extends SparkSpec with Matchers {
  import scala.jdk.CollectionConverters._

  private def frame(nullableShapes: Boolean): DataFrame = {
    val rows = Seq(
      Row("the cat sat on the mat", Seq(1.0, 2.0, 3.0, 4.0),
        Seq(7L, 9L, 13L), Seq("ab", "bc", "cd"), Seq(0, 1), 42L),
      Row("er on as th er", Seq(0.5, -1.0, 2.0, 0.0),
        Seq(1L, 2L, 3L), Seq("xy", "yz"), Seq(1, 0), 7L))
    spark.createDataFrame(
      rows.asJava,
      T.StructType(Seq(
        T.StructField("s", T.StringType, nullable = nullableShapes),
        T.StructField("vd",
          T.ArrayType(T.DoubleType, containsNull = nullableShapes),
          nullable = nullableShapes),
        T.StructField("vl",
          T.ArrayType(T.LongType, containsNull = nullableShapes),
          nullable = nullableShapes),
        T.StructField("vs",
          T.ArrayType(T.StringType, containsNull = nullableShapes),
          nullable = nullableShapes),
        T.StructField("vc",
          T.ArrayType(T.IntegerType, containsNull = nullableShapes),
          nullable = nullableShapes),
        T.StructField("salt", T.LongType, nullable = nullableShapes))))
  }

  private def sweep(df: DataFrame): Unit = {
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(100, 0.03)
    bloom.putString("the")
    val books = Seq(
      Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)),
      Seq(Seq(0.5, 0.5), Seq(-0.5, 0.5)))
    val cents = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0))
    val cols = Seq(
      VectorFunctions.dot(col("vd"), col("vd")).as("c1"),
      org.apache.spark.sql.graft.Bridge.column(DotProduct(
        org.apache.spark.sql.graft.Bridge.expression(col("vd")),
        org.apache.spark.sql.graft.Bridge.expression(col("vd")),
        strict = true)).as("c2"),
      VectorFunctions.norm(col("vd")).as("c3"),
      VectorFunctions.centroidScores(col("vd"), cents).as("c4"),
      VectorFunctions.adcScore(col("vd"), col("vc"), books).as("c5"),
      HashFunctions.simhash64(col("vl")).as("c6"),
      HashFunctions.portableMinhashSignature(col("vs"), 4, 2147483647L).as("c7"),
      HashFunctions.md5Prefix60Array(col("vs")).as("c8"),
      HashFunctions.bloomMightContain(col("s"), bloom).as("c9"),
      RollingHashFunctions.rollingMinHash(col("s"), 3).as("c10"),
      RollingHashFunctions.rollingMinHashPortable(col("s"), 3).as("c11"),
      RollingHashFunctions.winnowedFingerprints(col("s"), 3, 2).as("c12"),
      RollingHashFunctions.winnowedFingerprintsPortable(col("s"), 3, 2).as("c13"),
      BpeFunctions.bpeTokens(col("s"), Seq("t" -> "h")).as("c14"),
      BpeFunctions.bpePairs(col("s"), Seq("t" -> "h")).as("c15"),
      UnigramFunctions.unigramTokens(
        col("s"), Seq("th" -> -2.0), -9.0, 2).as("c16"),
      UnigramFunctions.unigramTokensSampled(
        col("s"), col("salt"), Seq("th" -> -2.0), -9.0, 2, 0.5, 11L).as("c17"),
      WordPieceFunctions.wordPieceTokens(
        col("s"), Seq("th", "##th") ++ ('a' to 'z').map(_.toString)
          ++ ('a' to 'z').map("##" + _), "[UNK]", 100).as("c18"),
      EntropyFunctions.charEntropy(col("s")).as("c19"),
      EntropyFunctions.tokenEntropy(col("s")).as("c20"))
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try df.select(cols: _*).collect().length shouldBe 2
    finally prev match {
      case Some(p) => spark.conf.set("spark.sql.codegen.factoryMode", p)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("all custom expressions compile under CODEGEN_ONLY with NON-nullable inputs") {
    sweep(frame(nullableShapes = false))
  }

  test("all custom expressions compile under CODEGEN_ONLY with nullable inputs") {
    sweep(frame(nullableShapes = true))
  }
}
