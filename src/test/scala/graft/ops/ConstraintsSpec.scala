package graft.ops

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class ConstraintsSpec extends SparkSpec with Matchers {
  import org.apache.spark.sql.{Row, types => T}
  import scala.jdk.CollectionConverters._

  private def df(rows: Seq[Row], fields: (String, T.DataType)*) =
    spark.createDataFrame(rows.asJava, T.StructType(
      fields.map { case (n, t) => T.StructField(n, t, nullable = true) }))

  test("uniqueness: dup counting, NULL keys opt out, deterministic example") {
    val d = df(Seq(
      Row(1L, "a"), Row(1L, "a"), Row(1L, "a"),  // key (1,a) x3 -> 2 dup rows
      Row(2L, "b"), Row(10L, "b"), Row(10L, "b"), // (10,b) x2 -> 1 dup row
      Row(null, "c"), Row(3L, null)),             // NULL parts -> opted out
      "k1" -> T.LongType, "k2" -> T.StringType)
    val r = Constraints.uniqueness(d, Seq("k1", "k2")).head()
    r.getAs[String]("key_cols") shouldBe "k1|k2"
    r.getAs[Long]("n_rows") shouldBe 6L
    r.getAs[Long]("n_null_rows") shouldBe 2L
    r.getAs[Long]("n_keys") shouldBe 3L
    r.getAs[Long]("n_dup_keys") shouldBe 2L
    r.getAs[Long]("n_dup_rows") shouldBe 3L
    r.getAs[Boolean]("is_unique") shouldBe false
    // lexicographic min of "1|a" and "10|b" is "10|b"? No: '1'='1',
    // then '|' (0x7c) vs '0' (0x30) -> "10|b" < "1|a".
    r.getAs[String]("example_dup_key") shouldBe "10|b"
  }

  test("uniqueness: a clean key reports is_unique with NULL example") {
    val d = df(Seq(Row(1L), Row(2L), Row(3L)), "k" -> T.LongType)
    val r = Constraints.uniqueness(d, Seq("k")).head()
    r.getAs[Boolean]("is_unique") shouldBe true
    r.getAs[Long]("n_dup_rows") shouldBe 0L
    r.isNullAt(r.fieldIndex("example_dup_key")) shouldBe true
  }

  test("referentialIntegrity: orphans counted by row and key, NULLs opt out, clean FK valid") {
    val child = df(Seq(
      Row(1L), Row(1L), Row(2L), Row(9L), Row(9L), Row(9L), Row(null)),
      "fk" -> T.LongType)
    val parent = df(Seq(Row(1L), Row(2L), Row(3L)), "pk" -> T.LongType)
    val r = Constraints.referentialIntegrity(
      child, Seq("fk"), parent, Seq("pk")).head()
    r.getAs[Long]("n_child_rows") shouldBe 6L
    r.getAs[Long]("n_null_rows") shouldBe 1L
    r.getAs[Long]("n_orphan_rows") shouldBe 3L
    r.getAs[Long]("n_orphan_keys") shouldBe 1L
    r.getAs[Boolean]("is_valid") shouldBe false
    r.getAs[String]("example_orphan_key") shouldBe "9"

    val clean = Constraints.referentialIntegrity(
      child.filter("fk IS NOT NULL AND fk < 3"), Seq("fk"),
      parent, Seq("pk")).head()
    clean.getAs[Boolean]("is_valid") shouldBe true
    clean.getAs[Long]("n_orphan_rows") shouldBe 0L
    clean.isNullAt(clean.fieldIndex("example_orphan_key")) shouldBe true
  }

  test("functionalDependency: violations by lhs and row; NULL lhs excluded; NULL rhs is a value") {
    val d = df(Seq(
      Row(1L, "x"), Row(1L, "x"),          // 1 -> {x} fine
      Row(2L, "x"), Row(2L, "y"), Row(2L, "y"), // 2 -> {x,y} violated, 3 rows
      Row(3L, "z"), Row(3L, null),         // 3 -> {z, NULL} violated (NULL is a value)
      Row(null, "q")),                     // NULL lhs excluded
      "a" -> T.LongType, "b" -> T.StringType)
    val r = Constraints.functionalDependency(d, Seq("a"), Seq("b")).head()
    r.getAs[String]("dependency") shouldBe "a->b"
    r.getAs[Long]("n_lhs") shouldBe 3L
    r.getAs[Long]("n_violating_lhs") shouldBe 2L
    r.getAs[Long]("n_violating_rows") shouldBe 5L
    r.getAs[Boolean]("holds") shouldBe false
    r.getAs[String]("example_violating_key") shouldBe "2"

    val holds = Constraints.functionalDependency(
      d.filter("a = 1"), Seq("a"), Seq("b")).head()
    holds.getAs[Boolean]("holds") shouldBe true
    holds.isNullAt(holds.fieldIndex("example_violating_key")) shouldBe true
  }
}
