package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Sequence-packing invariants: conservation, budget, determinism,
  * bucket-local packing. */
class PackingSpec extends SparkSpec with Matchers {

  private def docsDf(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, 50L + (i * 37) % 400)).toDF("doc_id", "n_tokens")
  }

  test("packing conserves docs and tokens; fill ratios are capped") {
    val docs = docsDf(500)
    val stats = Packing.sequenceStats(docs, "doc_id", "n_tokens",
      seqLen = 1024, buckets = 4).collect()
    stats.map(_.getLong(2)).sum shouldBe 500L // every doc packed once
    stats.map(_.getLong(3)).sum shouldBe
      docs.agg(sum("n_tokens")).head().getLong(0)
    stats.foreach { r => r.getDouble(4) should (be > 0.0 and be <= 1.0) }
    stats.map(_.getLong(0)).distinct.sorted shouldBe Seq(0L, 1L, 2L, 3L)
  }

  test("assignment is deterministic and bucket-local") {
    val docs = docsDf(300)
    val a = Packing.assignSequences(docs, "doc_id", "n_tokens", 512, 4)
      .select("doc_id", "pack_bucket", "seq_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Packing.assignSequences(docs.repartition(7), "doc_id", "n_tokens", 512, 4)
      .select("doc_id", "pack_bucket", "seq_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    a shouldBe b // independent of input partitioning
    // sequences are contiguous per bucket: indices 0..max with no gaps
    a.groupBy(_._2).foreach { case (_, rows) =>
      val idxs = rows.map(_._3)
      idxs.min shouldBe 0L
      (idxs.max - idxs.min + 1) should be <= rows.size.toLong
    }
  }

  test("a doc never exceeds its sequence budget start") {
    val assigned = Packing.assignSequences(docsDf(200), "doc_id", "n_tokens", 256, 2)
      .collect()
    assigned.foreach { r =>
      val before = r.getAs[Long]("tokens_before")
      val seq = r.getAs[Long]("seq_idx")
      seq shouldBe before / 256
    }
  }
}
