package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Quarantine semantics: every input row out exactly once; corrupt
  * rows labeled with their raw payload and NO salvaged field values;
  * missing fields are NULL-not-quarantined (schema-on-read absence,
  * not corruption). */
class JsonQuarantineSpec extends SparkSpec with Matchers {
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
}
