package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Changelog-merge semantics: latest-sequence-wins, tombstones,
  * insert-via-upsert, and base pass-through. */
class CdcSpec extends SparkSpec with Matchers {

  private def frames = {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val changes = Seq(
      (2L, "b2", 21.0, 1L, "U"),  // update key 2
      (2L, "b3", 22.0, 2L, "U"),  // later update wins
      (3L, "c", 30.0, 1L, "D"),   // delete key 3
      (4L, "d", 40.0, 1L, "U"),   // insert new key 4
      (5L, "e", 50.0, 1L, "U"),   // insert then delete → absent
      (5L, "e", 50.0, 2L, "D")
    ).toDF("k", "s", "v", "seq", "op")
    (base, changes)
  }

  test("latest sequence wins; deletes tombstone; upsert inserts") {
    val (base, changes) = frames
    val out = Cdc.applyChangelog(base, changes, Seq("k"), "seq", "op")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    out.keySet shouldBe Set(1L, 2L, 4L)
    out(1L) shouldBe ("a", 10.0)    // untouched base row
    out(2L) shouldBe ("b3", 22.0)   // seq 2 beat seq 1
    out(4L) shouldBe ("d", 40.0)    // insert
  }

  test("scd2History: versions chain, deletes close without emitting, re-insert reopens") {
    import spark.implicits._
    val changes = Seq(
      (2L, "b1", 21.0, 1L, "U"),  // v1, closed by seq 2
      (2L, "b2", 22.0, 2L, "U"),  // v2, open → current
      (5L, "e1", 50.0, 1L, "U"),  // closed by the delete, NOT current
      (5L, "e1", 50.0, 2L, "D"),  // closes; emits nothing
      (5L, "e2", 51.0, 3L, "U"),  // re-insert → open again
      (7L, "g", 70.0, 1L, "D")    // delete-only key → no rows at all
    ).toDF("k", "s", "v", "seq", "op")
    val out = Cdc.scd2History(changes, Seq("k"), "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getDouble(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getBoolean(5)))
      .toMap
    out.keySet shouldBe Set(2L -> "b1", 2L -> "b2", 5L -> "e1", 5L -> "e2")
    out(2L -> "b1") shouldBe ((21.0, 1L, Some(2L), false))
    out(2L -> "b2") shouldBe ((22.0, 2L, None, true))
    out(5L -> "e1") shouldBe ((50.0, 1L, Some(2L), false)) // closed by the delete
    out(5L -> "e2") shouldBe ((51.0, 3L, None, true))
    // point-in-time reconstruction: snapshot "as of seq 1" = versions
    // with valid_from <= 1 < valid_to — must equal {b1, e1}
    val asOf1 = out.collect {
      case ((k, s), (_, from, to, _)) if from <= 1L && to.forall(_ > 1L) => (k, s)
    }.toSet
    asOf1 shouldBe Set(2L -> "b1", 5L -> "e1")
  }

  test("empty changelog is the identity") {
    val (base, changes) = frames
    val out = Cdc.applyChangelog(base, changes.limit(0), Seq("k"), "seq", "op")
    out.collect().map(_.getLong(0)).sorted shouldBe Array(1L, 2L, 3L)
  }

  test("result is partitioning-invariant (one hash-agg, no window)") {
    val (base, changes) = frames
    val a = Cdc.applyChangelog(base, changes, Seq("k"), "seq", "op")
    val b = Cdc.applyChangelog(
      base.repartition(7), changes.repartition(3), Seq("k"), "seq", "op")
    a.collect().sortBy(_.getLong(0)).toSeq shouldBe
      b.collect().sortBy(_.getLong(0)).toSeq
  }

  test("merge is one shuffle with map-side partial aggregation, no window") {
    val (base, changes) = frames
    val df = Cdc.applyChangelog(base, changes, Seq("k"), "seq", "op")
    df.collect()
    // AQE hides exchanges from collect() on the root node — assert on
    // the final-plan text instead.
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    finalPlan should include("partial_max_by") // history collapses map-side
    finalPlan should not include "Window"
    finalPlan.sliding("ShuffleQueryStage".length).count(_ == "ShuffleQueryStage") shouldBe 1
  }

  test("composite keys merge per full key") {
    import spark.implicits._
    val base = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("k1", "k2", "v")
    val changes = Seq((1L, "x", 9.0, 1L, "U")).toDF("k1", "k2", "v", "seq", "op")
    val out = Cdc.applyChangelog(base, changes, Seq("k1", "k2"), "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    out((1L, "x")) shouldBe 9.0
    out((1L, "y")) shouldBe 2.0
  }
}
