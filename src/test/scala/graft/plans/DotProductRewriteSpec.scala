package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.{DotProduct, GraftFunctions}

/** The optimizer rewrite must (a) fire on the exact composition,
  * (b) keep results bit-for-bit identical including null semantics,
  * (c) leave non-matching expressions alone. */
class DotProductRewriteSpec extends SparkSpec with Matchers {
  import scala.jdk.CollectionConverters._

  private def composition(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  // A parquet-backed frame: LocalRelation test data would be constant-
  // folded by ConvertToLocalRelation before the rewrite could fire.
  private lazy val vecsDf = {
    import org.apache.spark.sql.{Row, types => T}
    val local = spark.createDataFrame(
      Seq(
        Row(Seq(1.0, 2.0, 3.0), Seq(2.0, 0.5, -1.0)), // plain: 2+1-3 = 0
        Row(Seq(1.0, null, 3.0), Seq(1.0, 1.0, 1.0)), // null element -> NULL
        Row(Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)), // length mismatch -> NULL
        Row(null, Seq(1.0))).asJava, // null array -> NULL
      T.StructType(Seq(
        T.StructField("a", T.ArrayType(T.DoubleType), nullable = true),
        T.StructField("b", T.ArrayType(T.DoubleType), nullable = true))))
    val dir = java.nio.file.Files.createTempDirectory("graft-rewrite").toString
    local.coalesce(1).write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("rewrite fires and results match the unoptimized composition exactly") {
    GraftFunctions.register(spark)
    val df = vecsDf.select(composition(col("a"), col("b")).as("d"))
    val optimized = df.queryExecution.optimizedPlan
    optimized.expressions.flatMap(_.collect { case d: DotProduct => d }) should not be empty

    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    got shouldBe Array(Some(0.0), None, None, None)
  }

  test("rewrite does not fire on non-matching shapes") {
    GraftFunctions.register(spark)
    // sum of squares of a single array (aggregate without zip_with multiply)
    val df = vecsDf.select(
      aggregate(col("a"), lit(0.0d), (acc, x) => acc + x * x).as("s"),
      // zip_with with addition, not multiplication
      aggregate(zip_with(col("a"), col("b"), (x, y) => x + y), lit(0.0d), (acc, x) => acc + x).as("t"))
    val dots = df.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case d: DotProduct => d })
    dots shouldBe empty
    val head = df.collect().head
    head.getDouble(0) shouldBe 14.0 +- 1e-12 // 1 + 4 + 9
  }

  test("streams through SQL too: registered session rewrites spark.sql plans") {
    GraftFunctions.register(spark)
    vecsDf.createOrReplaceTempView("__vecs")
    val df = spark.sql(
      """SELECT aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, x) -> acc + x) AS d
        |FROM __vecs""".stripMargin)
    val dots = df.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case d: DotProduct => d })
    dots should not be empty
    df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))) shouldBe
      Array(Some(0.0), None, None, None)
  }
}
