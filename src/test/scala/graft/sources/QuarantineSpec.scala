package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Quarantine semantics: every input row out exactly once; corrupt
  * rows labeled with their raw payload and NO salvaged field values;
  * missing fields are NULL-not-quarantined (schema-on-read absence,
  * not corruption). */
class QuarantineSpec extends SparkSpec with Matchers {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("a", LongType), StructField("b", StringType)))

  private def df(rows: Seq[(Long, String)]) = {
    import org.apache.spark.sql.{Row, types => T}
    spark.createDataFrame(
      rows.map { case (i, j) => Row(i, j) }.asJava,
      T.StructType(Seq(
        T.StructField("k", T.LongType, nullable = false),
        T.StructField("js", T.StringType, nullable = true))))
  }

  test("clean, partial, corrupt, scalar, and NULL payloads each route correctly") {
    val rows = Seq(
      1L -> """{"a":7,"b":"x"}""",     // clean
      2L -> """{"a":8}""",             // valid, field b absent
      3L -> """{"a":9,"b":"y""",       // truncated mid-object
      4L -> "5",                       // valid JSON, not an object
      5L -> null)                      // no payload at all
    val out = JsonQuarantine.parse(df(rows), "js", schema)
      .collect().map(r => r.getLong(0) -> r).toMap
    out should have size 5             // every row exactly once

    out(1L).getLong(1) shouldBe 7L
    out(1L).getString(2) shouldBe "x"
    out(1L).getBoolean(3) shouldBe false
    out(1L).isNullAt(4) shouldBe true  // clean rows carry no raw copy

    out(2L).getLong(1) shouldBe 8L
    out(2L).isNullAt(2) shouldBe true  // absence, not corruption
    out(2L).getBoolean(3) shouldBe false

    for (k <- Seq(3L, 4L)) {
      out(k).isNullAt(1) shouldBe true // no salvaged prefix values
      out(k).isNullAt(2) shouldBe true
      out(k).getBoolean(3) shouldBe true
      out(k).getString(4) shouldBe rows.toMap.apply(k) // raw preserved
    }
    out(5L).getBoolean(3) shouldBe true
    out(5L).isNullAt(4) shouldBe true  // nothing to preserve
  }

  test("rejects inputs that already carry the output column names") {
    val bad = df(Seq(1L -> "{}")).withColumn("quarantined", lit(true))
    intercept[IllegalArgumentException] {
      JsonQuarantine.parse(bad, "js", schema)
    }
  }

  test("rejects schema fields that collide with the operator's own output names") {
    for (bad <- Seq("quarantined", "raw", "_corrupt")) {
      val s = StructType(Seq(StructField(bad, StringType)))
      intercept[IllegalArgumentException] {
        JsonQuarantine.parse(df(Seq(1L -> "{}")), "js", s)
      }
    }
  }

  test("rejects kept input columns that collide with schema fields") {
    // an input column named like a parsed field would emit TWO columns
    // named "a" — ambiguous downstream, or doubly persisted
    val bad = df(Seq(1L -> """{"a":1}""")).withColumn("a", lit(99L))
    intercept[IllegalArgumentException] {
      JsonQuarantine.parse(bad, "js", schema)
    }
  }

  private val csvSchema = StructType(Seq(
    StructField("a", LongType), StructField("b", StringType),
    StructField("n", LongType)))

  test("csv: clean, under-arity, type-error, over-arity, empty-line, empty-field routing") {
    val rows = Seq(
      1L -> "7,en,123",      // clean
      2L -> "8,fr",          // UNDER-arity: torn record → quarantined
      3L -> "9,de,xx",       // type error; salvaged prefix must NOT leak
      4L -> "10,it,5,EXTRA", // over-arity → quarantined
      5L -> "",              // empty line → quarantined (no silent all-NULL row)
      6L -> "11,,9")         // empty FIELD: absence, good path
    val out = CsvQuarantine.parse(df(rows), "js", csvSchema)
      .collect().map(r => r.getLong(0) -> r).toMap
    out should have size 6

    out(1L).getLong(1) shouldBe 7L
    out(1L).getString(2) shouldBe "en"
    out(1L).getLong(3) shouldBe 123L
    out(1L).getBoolean(4) shouldBe false

    for (k <- Seq(2L, 3L, 4L, 5L)) {
      (1 to 3).foreach(i => out(k).isNullAt(i) shouldBe true)
      out(k).getBoolean(4) shouldBe true
      if (k != 5L) out(k).getString(5) shouldBe rows.toMap.apply(k)
    }
    out(6L).getLong(1) shouldBe 11L
    out(6L).isNullAt(2) shouldBe true // empty field is NULL, not corruption
    out(6L).getLong(3) shouldBe 9L
    out(6L).getBoolean(4) shouldBe false
  }

  test("csv: custom separator") {
    val out = CsvQuarantine.parse(
      df(Seq(1L -> "7|en|123")), "js", csvSchema, sep = "|").head()
    out.getLong(1) shouldBe 7L
    out.getString(2) shouldBe "en"
    out.getBoolean(4) shouldBe false
  }
}
