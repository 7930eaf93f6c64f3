package graft.encode

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** tf.Example wire-format round-trips (encoder + decoder are both ours;
  * SURVEY.md §7.5 item 2) plus the §1.2 type-mapping table. */
class TfExampleCodecSpec extends AnyFunSuite {
  import TfExample._

  test("round-trip all feature kinds") {
    val features = Map[String, FeatureValue](
      "ints" -> Int64s(Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue)),
      "floats" -> Floats(Seq(0f, 1.5f, -3.25f, Float.MaxValue)),
      "bytes" -> Bytes(Seq("hello".getBytes, Array[Byte](), Array[Byte](0, -1, 127))),
      "empty" -> Empty)
    val decoded = decode(encode(features))
    assert(decoded("ints") == features("ints"))
    assert(decoded("floats") == features("floats"))
    assert(decoded("empty") == Empty)
    val Bytes(bs) = decoded("bytes")
    assert(bs.map(_.toSeq) == Seq("hello".getBytes.toSeq, Seq(), Seq[Byte](0, -1, 127)))
  }

  test("deterministic encoding: key order independent") {
    val a = encode(Map("a" -> Int64s(Seq(1)), "b" -> Floats(Seq(2f))))
    val b = encode(scala.collection.immutable.ListMap(
      "b" -> Floats(Seq(2f)), "a" -> Int64s(Seq(1))))
    assert(a.toSeq == b.toSeq)
  }

  test("property: arbitrary feature maps round-trip") {
    val genValue: Gen[FeatureValue] = Gen.oneOf(
      Gen.listOf(Gen.long).map(Int64s(_)),
      Gen.listOf(Gen.choose(-1e30f, 1e30f)).map(Floats(_)),
      Gen.listOf(Gen.alphaNumStr.map(_.getBytes)).map(Bytes(_)),
      Gen.const(Empty))
    val genMap = Gen.mapOf(Gen.zip(Gen.alphaNumStr.suchThat(_.nonEmpty), genValue))
    (0 until 100).foreach { i =>
      val m = genMap.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val decoded = decode(encode(m))
      assert(decoded.keySet == m.keySet)
      m.foreach {
        case (k, Bytes(vs)) =>
          val Bytes(got) = decoded(k)
          assert(got.map(_.toSeq) == vs.map(_.toSeq))
        case (k, v) => assert(decoded(k) == v)
      }
    }
  }
}

/** Row → tf.Example mapping per SURVEY.md §1.2. */
class TfExampleEncoderSpec extends SparkSpec {
  import TfExample._

  private val schema = StructType(Seq(
    StructField("l", LongType), StructField("i", IntegerType),
    StructField("b", BooleanType), StructField("d", DoubleType),
    StructField("f", FloatType), StructField("s", StringType),
    StructField("bin", BinaryType), StructField("t", TimestampType),
    StructField("al", ArrayType(LongType)), StructField("as", ArrayType(StringType))))

  test("full type coverage row") {
    val row = Row(7L, 3, true, 1.5, 2.5f, "hi", Array[Byte](1, 2),
      Timestamp.valueOf("2024-01-02 03:04:05.123456"),
      Seq(1L, 2L, 3L), Seq("x", "y"))
    val m = decode(TfExampleEncoder.encode(schema, row))
    assert(m("l") == Int64s(Seq(7L)))
    assert(m("i") == Int64s(Seq(3L)))
    assert(m("b") == Int64s(Seq(1L)))
    assert(m("d") == Floats(Seq(1.5f)))
    assert(m("f") == Floats(Seq(2.5f)))
    val Bytes(s) = m("s"); assert(new String(s.head) == "hi")
    val Bytes(t) = m("t"); assert(new String(t.head) == "2024-01-02T03:04:05.123456Z")
    assert(m("al") == Int64s(Seq(1L, 2L, 3L)))
    val Bytes(as) = m("as"); assert(as.map(new String(_)) == Seq("x", "y"))
  }

  test("nulls become empty features with key kept") {
    val row = Row(null, null, null, null, null, null, null, null, null, null)
    val m = decode(TfExampleEncoder.encode(schema, row))
    assert(m.size == schema.size)
    assert(m.values.forall(_ == Empty))
  }

  test("unsupported types rejected with clear error") {
    val bad = StructType(Seq(StructField("m", MapType(StringType, LongType))))
    val e = intercept[IllegalArgumentException] {
      TfExampleEncoder.encode(bad, Row(Map("a" -> 1L)))
    }
    assert(e.getMessage.contains("not representable"))
  }
}

/** Struct and map flattening at the encode boundary
  * (Runner.flattenStructs + Runner.flattenMaps + Runner.encode):
  * depth ≥ 2, NULL inner structs, array<struct> parallel lists,
  * data-driven map-key discovery (NULL maps, partial keys, the
  * maxKeys cap), collision detection, and the preserved clear-error
  * paths (non-string keys, nested map values, decimal values). */
class FlattenStructsSpec extends SparkSpec
    with org.scalatest.matchers.should.Matchers {
  import org.apache.spark.sql.functions._
  import graft.run.Runner
  import TfExample._

  private def firstExample(df: org.apache.spark.sql.DataFrame) =
    TfExample.decode(Runner.encode(df).head())

  test("depth-2 struct flattens to dotted leaves; values survive the wire") {
    import spark.implicits._
    val df = Seq((1L, 2.5, "ok", 9L)).toDF("id", "p", "st", "c")
      .select(col("id"),
        struct(col("p").as("price"),
          struct(col("st").as("status"), col("c").as("cust")).as("meta"))
          .as("ord"))
    val flat = Runner.flattenStructs(df)
    flat.columns.toSeq shouldBe Seq("id", "ord.price", "ord.meta.status", "ord.meta.cust")
    val m = firstExample(df)
    m("id") shouldBe Int64s(Seq(1L))
    m("ord.price") shouldBe Floats(Seq(2.5f))
    val Bytes(s) = m("ord.meta.status"); new String(s.head) shouldBe "ok"
    m("ord.meta.cust") shouldBe Int64s(Seq(9L))
  }

  test("NULL inner struct yields present-but-empty leaf features") {
    import spark.implicits._
    val df = Seq((1L, false), (2L, true)).toDF("id", "isNull")
      .select(col("id"),
        when(col("isNull"), lit(null).cast("struct<a:bigint,b:string>"))
          .otherwise(struct(col("id").as("a"), lit("x").as("b"))).as("opt"))
    val rows = Runner.encode(df).collect().map(TfExample.decode)
      .map(m => (m("id"), m)).sortBy(_._1.toString)
    val withVal = rows.find(_._1 == Int64s(Seq(1L))).get._2
    withVal("opt.a") shouldBe Int64s(Seq(1L))
    val nulled = rows.find(_._1 == Int64s(Seq(2L))).get._2
    nulled.keySet should contain allOf ("opt.a", "opt.b")
    nulled("opt.a") shouldBe Empty
    nulled("opt.b") shouldBe Empty
  }

  test("array<struct> flattens to parallel lists in element order") {
    import spark.implicits._
    val df = Seq(1L).toDF("id")
      .select(col("id"), array(
        struct(lit(10L).as("q"), lit("a").as("t")),
        struct(lit(20L).as("q"), lit("b").as("t"))).as("items"))
    Runner.flattenStructs(df).columns.toSeq shouldBe Seq("id", "items.q", "items.t")
    val m = firstExample(df)
    m("items.q") shouldBe Int64s(Seq(10L, 20L))
    val Bytes(ts) = m("items.t"); ts.map(new String(_)).toSeq shouldBe Seq("a", "b")
  }

  test("dotted-name collision fails fast") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("x", "y")
      .select(col("x").as("a.b"), struct(col("y").as("b")).as("a"))
    val e = intercept[IllegalArgumentException](Runner.flattenStructs(df))
    e.getMessage should include ("a.b")
  }

  test("map inside a struct flattens through both passes to dotted leaves") {
    import spark.implicits._
    val df = Seq((1L, Map("k" -> 2L))).toDF("id", "m")
      .select(col("id"), struct(col("m").as("inner")).as("st"))
    val m = firstExample(df)
    m("st.inner.k") shouldBe Int64s(Seq(2L))
  }

  test("struct-free frames pass through flattenStructs unchanged") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "s")
    Runner.flattenStructs(df) should be theSameInstanceAs df
  }

  test("map<string,primitive> flattens to discovered dotted keys; NULL maps and absent keys go Empty") {
    import spark.implicits._
    val df = Seq(
      (1L, Map("a" -> 10L, "b" -> 20L)),
      (2L, Map("b" -> 30L)),           // 'a' absent for this row
      (3L, null.asInstanceOf[Map[String, Long]])) // NULL map
      .toDF("id", "m")
    val flat = Runner.flattenMaps(df)
    flat.columns.toSeq shouldBe Seq("id", "m.a", "m.b") // keys sorted
    val rows = Runner.encode(df).collect().map(TfExample.decode)
      .map(m => m("id") -> m).toMap
    rows(Int64s(Seq(1L)))("m.a") shouldBe Int64s(Seq(10L))
    rows(Int64s(Seq(1L)))("m.b") shouldBe Int64s(Seq(20L))
    rows(Int64s(Seq(2L)))("m.a") shouldBe Empty
    rows(Int64s(Seq(2L)))("m.b") shouldBe Int64s(Seq(30L))
    rows(Int64s(Seq(3L))).keySet should contain allOf ("m.a", "m.b")
    rows(Int64s(Seq(3L)))("m.a") shouldBe Empty
    rows(Int64s(Seq(3L)))("m.b") shouldBe Empty
  }

  test("flattenMaps: a key colliding with an existing column fails fast") {
    import spark.implicits._
    val df = Seq((1L, Map("b" -> 2L))).toDF("a.b", "a")
    val e = intercept[IllegalArgumentException](Runner.flattenMaps(df))
    e.getMessage should include ("a.b")
  }

  test("flattenMaps: non-string keys and nested map values keep clear errors") {
    import spark.implicits._
    val intKeys = Seq((1L, Map(1 -> 2L))).toDF("id", "m")
    intercept[IllegalArgumentException](Runner.flattenMaps(intKeys))
      .getMessage should include ("must be STRING")
    val nested = Seq((1L, Map("k" -> Map("x" -> 1L)))).toDF("id", "m")
    intercept[IllegalArgumentException](Runner.flattenMaps(nested))
      .getMessage should include ("not representable")
  }

  test("flattenMaps: an unbounded (ID-like) key space fails fast at the cap") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toLong, Map(s"k$i" -> i.toLong))).toDF("id", "m")
    val e = intercept[IllegalArgumentException](Runner.flattenMaps(df, maxKeys = 10))
    e.getMessage should include ("bounded")
  }

  test("flattenMaps: decimal map values keep the encoder's clear error") {
    import spark.implicits._
    val df = Seq(1L).toDF("id")
      .select(col("id"),
        map(lit("d"), col("id").cast("decimal(10,2)")).as("m"))
    val e = intercept[Exception](Runner.encode(df).collect())
    e.getMessage should include ("not representable")
  }

  test("map-free frames pass through flattenMaps unchanged") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "s")
    Runner.flattenMaps(df) should be theSameInstanceAs df
  }

  test("property: random map<string,long> frames survive flattenMaps + the wire") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val keys = Vector("k1", "k2", "k3", "k4", "k5")
    val rows = (1 to 300).map { i =>
      val m =
        if (rng.nextInt(10) == 0) null
        else keys.filter(_ => rng.nextBoolean()).map(k => k -> rng.nextLong()).toMap
      (i.toLong, m)
    }
    val df = rows.toDF("id", "m")
    // every key was seen somewhere, so the discovered schema is total
    Runner.flattenMaps(df).columns.toSeq shouldBe "id" +: keys.map(k => s"m.$k")
    val decoded = Runner.encode(df).collect().map(TfExample.decode)
    // one fixed feature-key set across ALL rows (schema, not per-row)
    decoded.map(_.keySet).distinct.length shouldBe 1
    val got = decoded.map { ex =>
      val Int64s(Seq(id)) = ex("id")
      id -> keys.flatMap(k => ex(s"m.$k") match {
        case Int64s(Seq(v)) => Some(k -> v)
        case _ => None // absent key / NULL map -> Empty
      }).toMap
    }.toMap
    rows.foreach { case (id, m) =>
      got(id) shouldBe (if (m == null) Map.empty[String, Long] else m)
    }
  }

  test("pinned map keys: identical feature set across batches that carry different keys") {
    import spark.implicits._
    // train batch sees {a, b}; serve batch sees only {b, c}: with
    // discovery the two encodes disagree on the feature set (the
    // train/serve mismatch ADVICE r9 flagged); with pinned keys both
    // emit exactly the training schema.
    val train = Seq((1L, Map("a" -> 1L, "b" -> 2L))).toDF("id", "m")
    val serve = Seq((2L, Map("b" -> 3L, "c" -> 9L))).toDF("id", "m")
    val pinned = Runner.discoverMapKeys(train)
    pinned shouldBe Map("m" -> Seq("a", "b"))
    Runner.flattenMaps(serve, pinned).columns.toSeq shouldBe Seq("id", "m.a", "m.b")
    val ex = Runner.encode(serve, mapKeys = Some(pinned))
      .collect().map(TfExample.decode).head
    ex.keySet shouldBe Set("id", "m.a", "m.b") // 'c' dropped, 'a' present-but-empty
    ex("m.a") shouldBe Empty
    ex("m.b") shouldBe Int64s(Seq(3L))
    // the discovering encode of the same serve batch emits a DIFFERENT
    // set — the caveat the pinned path exists to remove
    Runner.encode(serve).collect().map(TfExample.decode)
      .head.keySet shouldBe Set("id", "m.b", "m.c")
  }

  test("pinned map keys: uncovered map column, unknown column, and duplicate keys fail fast") {
    import spark.implicits._
    val df = Seq((1L, Map("a" -> 1L))).toDF("id", "m")
    intercept[IllegalArgumentException](
      Runner.flattenMaps(df, Map.empty[String, Seq[String]]))
      .getMessage should include ("no entry for map column")
    intercept[IllegalArgumentException](
      Runner.flattenMaps(df, Map("m" -> Seq("a"), "ghost" -> Seq("x"))))
      .getMessage should include ("non-map/absent")
    intercept[IllegalArgumentException](
      Runner.flattenMaps(df, Map("m" -> Seq("a", "a"))))
      .getMessage should include ("duplicates")
    // Seq.empty drops a column deliberately
    Runner.flattenMaps(df, Map("m" -> Seq.empty)).columns.toSeq shouldBe Seq("id")
  }

  test("all-empty map column contributes no leaves under discovery") {
    import spark.implicits._
    val df = Seq((1L, Map.empty[String, Long]), (2L, Map.empty[String, Long]))
      .toDF("id", "m")
    Runner.flattenMaps(df).columns.toSeq shouldBe Seq("id")
  }
}
