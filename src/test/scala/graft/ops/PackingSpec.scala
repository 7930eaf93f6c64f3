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

  test("splitSegments: spans conserve tokens and tile every sequence exactly") {
    val docs = docsDf(400)
    val segs = Packing.splitSegments(docs, "doc_id", "n_tokens",
      seqLen = 512, buckets = 4).collect()
    // Conservation: per-doc span lengths sum to the doc's token count.
    val perDoc = segs.groupBy(_.getAs[Long]("doc_id")).view.mapValues(
      _.map(r => r.getAs[Long]("doc_token_end") - r.getAs[Long]("doc_token_start")).sum)
    val expected = docs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    perDoc.toMap shouldBe expected
    // Tiling: within each (bucket, seq), spans are contiguous from
    // offset 0 and fill exactly seqLen except each bucket's last seq.
    val byBucket = segs.groupBy(_.getAs[Long]("pack_bucket"))
    byBucket.foreach { case (_, rows) =>
      val lastSeq = rows.map(_.getAs[Long]("seq_idx")).max
      rows.groupBy(_.getAs[Long]("seq_idx")).foreach { case (seq, srows) =>
        val sorted = srows.sortBy(_.getAs[Long]("seq_offset"))
        sorted.head.getAs[Long]("seq_offset") shouldBe 0L
        sorted.toSeq.sliding(2).foreach {
          case Seq(a, b) =>
            b.getAs[Long]("seq_offset") shouldBe
              a.getAs[Long]("seq_offset") +
                (a.getAs[Long]("doc_token_end") - a.getAs[Long]("doc_token_start"))
          case _ => ()
        }
        val filled = sorted.map(r =>
          r.getAs[Long]("doc_token_end") - r.getAs[Long]("doc_token_start")).sum
        if (seq < lastSeq) filled shouldBe 512L else filled should be <= 512L
      }
    }
    // Parity with sequenceStats: docs STARTING in a sequence match n_docs.
    val starts = segs.filter(_.getAs[Long]("doc_token_start") == 0L)
      .groupBy(r => (r.getAs[Long]("pack_bucket"), r.getAs[Long]("seq_idx")))
      .view.mapValues(_.size.toLong).toMap
    val stats = Packing.sequenceStats(docs, "doc_id", "n_tokens", 512, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    starts shouldBe stats
  }

  private def tokenDocsDf(n: Int) = {
    import spark.implicits._
    (1 to n).map { i =>
      val len = 3 + (i * 7) % 40
      (i.toLong, (0 until len).map(j => s"t${i}_$j"))
    }.toDF("doc_id", "toks")
  }

  test("packTokens: slices agree with splitSegments spans and reconstruct docs") {
    val docs = tokenDocsDf(120)
    val segs = Packing.packTokens(docs, "doc_id", "toks",
      seqLen = 32, buckets = 4).collect()
    // Every segment's slice length equals its span arithmetic.
    segs.foreach { r =>
      r.getSeq[String](r.fieldIndex("seq_tokens")).size.toLong shouldBe
        r.getAs[Long]("doc_token_end") - r.getAs[Long]("doc_token_start")
    }
    // Concatenating one doc's slices in seq order reconstructs the doc.
    val expected = docs.collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    segs.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rows) =>
      rows.sortBy(_.getAs[Long]("doc_token_start"))
        .flatMap(_.getSeq[String](rows.head.fieldIndex("seq_tokens")))
        .toSeq shouldBe expected(id)
    }
    // Span columns match splitSegments fed the SAME counts (shared path).
    val viaCounts = Packing.splitSegments(
        docs.withColumn("n_tokens",
          org.apache.spark.sql.functions.size(col("toks")).cast("long")),
        "doc_id", "n_tokens", 32, 4)
      .collect().map(r => (r.getAs[Long]("pack_bucket"), r.getAs[Long]("seq_idx"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("doc_token_start"),
        r.getAs[Long]("doc_token_end"), r.getAs[Long]("seq_offset"))).toSet
    segs.map(r => (r.getAs[Long]("pack_bucket"), r.getAs[Long]("seq_idx"),
      r.getAs[Long]("doc_id"), r.getAs[Long]("doc_token_start"),
      r.getAs[Long]("doc_token_end"), r.getAs[Long]("seq_offset")))
      .toSet shouldBe viaCounts
  }

  test("packTokens: NULL and empty token arrays pack nothing") {
    import spark.implicits._
    val docs = Seq(
      (1L, Option(Seq("a", "b", "c"))),
      (2L, Option(Seq.empty[String])),
      (3L, None: Option[Seq[String]])).toDF("doc_id", "toks")
    val segs = Packing.packTokens(docs, "doc_id", "toks", 8, 1).collect()
    segs.map(_.getAs[Long]("doc_id")).toSet shouldBe Set(1L)
    segs.flatMap(_.getSeq[String](segs.head.fieldIndex("seq_tokens")))
      .toSeq shouldBe Seq("a", "b", "c")
  }

  test("packedSequences: every non-tail sequence holds exactly seqLen tokens") {
    val docs = tokenDocsDf(150)
    val seqs = Packing.packedSequences(docs, "doc_id", "toks",
      seqLen = 32, buckets = 3).collect()
    // Conservation across the whole corpus.
    seqs.map(_.getAs[Long]("n_tokens")).sum shouldBe
      docs.agg(sum(org.apache.spark.sql.functions.size(col("toks")))).head().getLong(0)
    // n_tokens mirrors the assembled array.
    seqs.foreach { r =>
      r.getSeq[String](r.fieldIndex("tokens")).size.toLong shouldBe
        r.getAs[Long]("n_tokens")
    }
    // Fixed budget everywhere except each bucket's final sequence.
    seqs.groupBy(_.getAs[Long]("pack_bucket")).foreach { case (_, rows) =>
      val lastSeq = rows.map(_.getAs[Long]("seq_idx")).max
      rows.foreach { r =>
        if (r.getAs[Long]("seq_idx") < lastSeq)
          r.getAs[Long]("n_tokens") shouldBe 32L
        else r.getAs[Long]("n_tokens") should be <= 32L
      }
    }
    // Sequences tile each bucket contiguously from 0.
    seqs.groupBy(_.getAs[Long]("pack_bucket")).foreach { case (_, rows) =>
      rows.map(_.getAs[Long]("seq_idx")).sorted.toSeq shouldBe
        (0L until rows.size.toLong)
    }
    // Deterministic under repartitioning (hash order, not arrival).
    val again = Packing.packedSequences(docs.repartition(7), "doc_id", "toks",
      32, 3).collect()
      .map(r => (r.getAs[Long]("pack_bucket"), r.getAs[Long]("seq_idx"),
        r.getSeq[String](r.fieldIndex("tokens")))).toSet
    seqs.map(r => (r.getAs[Long]("pack_bucket"), r.getAs[Long]("seq_idx"),
      r.getSeq[String](r.fieldIndex("tokens")))).toSet shouldBe again
  }

  test("splitSegments: a straddling doc splits at exact sequence boundaries") {
    import spark.implicits._
    // One bucket: docs of 300 + 300 tokens, seqLen 512 -> second doc
    // splits 212 / 88.
    val docs = Seq((1L, 300L), (2L, 300L)).toDF("doc_id", "n_tokens")
    val segs = Packing.splitSegments(docs, "doc_id", "n_tokens",
        seqLen = 512, buckets = 1)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("seq_idx"),
        r.getAs[Long]("doc_token_start"), r.getAs[Long]("doc_token_end"),
        r.getAs[Long]("seq_offset"))).sortBy(x => (x._2, x._5))
    // Hash order decides which doc is first; derive it from the output.
    val firstDoc = segs.head._1
    val secondDoc = if (firstDoc == 1L) 2L else 1L
    segs shouldBe Array(
      (firstDoc, 0L, 0L, 300L, 0L),
      (secondDoc, 0L, 0L, 212L, 300L),
      (secondDoc, 1L, 212L, 300L, 0L))
  }
}
