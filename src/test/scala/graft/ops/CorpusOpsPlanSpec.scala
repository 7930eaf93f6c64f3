package graft.ops

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Physical-plan assertions for the corpus-level operators: the scale
  * claims in SCALE.md (hot sets broadcast, bounded shuffle counts, no
  * global sort for top-k) hold in the executed plan, not just prose.
  */
class CorpusOpsPlanSpec extends SparkSpec with Matchers
    with AdaptiveSparkPlanHelper {
  import scala.jdk.CollectionConverters._

  private def docsDf(docs: Seq[(Long, String)]) = {
    import org.apache.spark.sql.{Row, types => T}
    spark.createDataFrame(
      docs.map { case (i, t) => Row(i, t) }.asJava,
      T.StructType(Seq(
        T.StructField("doc_id", T.LongType, nullable = false),
        T.StructField("text", T.StringType, nullable = true))))
  }

  private val corpus = (1L to 200L).map(i =>
    i -> s"unique $i line\ncommon shared boilerplate\nline tail $i")

  test("stripBoilerplate: hot set broadcasts; line table shuffles once") {
    val out = CorpusOps.stripBoilerplate(docsDf(corpus), "doc_id", "text", maxDf = 3)
    out.collect() // execute so AQE finalizes the plan
    val plan = out.queryExecution.executedPlan
    // The boilerplate set reaches the anti-join via broadcast, never a
    // shuffled join of the full line table against itself.
    collect(plan) { case j: BroadcastHashJoinExec => j } should not be empty
    collect(plan) { case b: BroadcastExchangeExec => b } should have size 1
    // Shuffles: df-count aggregate + doc reassembly (+ the widen
    // round-robin for the tiny local input) — and nothing else.
    collect(plan) { case e: ShuffleExchangeExec => e }.size should be <= 3
  }

  test("tokenizer serving is a shuffle-free projection (BPE and unigram)") {
    // Both segmenters claim "embarrassingly parallel, zero shuffle at
    // any scale" — pin it in the executed plan. (widen's round-robin
    // of the tiny LOCAL input is the one allowed exchange; a parquet
    // scan has none.)
    val bpe = Bpe.tokenize(docsDf(corpus), "doc_id", "text",
      rules = Seq("a" -> "b"))
    bpe.collect()
    collect(bpe.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec => e
    }.size should be <= 1
    val uni = Unigram.tokenize(docsDf(corpus), "doc_id", "text",
      pieces = Seq("li" -> -2.0), unkLogp = -9.0, maxPieceLen = 2)
    uni.collect()
    collect(uni.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec => e
    }.size should be <= 1
  }

  test("WordPiece serving and Shannon entropy are shuffle-free projections") {
    // Same contract as the BPE/unigram segmenters: the greedy matcher
    // and the entropy expression are per-row codegen — the only
    // allowed exchange is widen's round-robin of the tiny LOCAL input.
    val m = WordPiece.Model(
      Seq("un", "##iq", "##ue", "li", "##ne") ++
        ('a' to 'z').map(_.toString) ++ ('a' to 'z').map("##" + _) ++
        ('0' to '9').map(_.toString) ++ ('0' to '9').map("##" + _),
      "[UNK]", 100)
    val wp = WordPiece.tokenize(docsDf(corpus), "doc_id", "text", m)
    wp.collect()
    collect(wp.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec => e
    }.size should be <= 1
    val ent = docsDf(corpus).select(col("doc_id"),
      graft.functions.EntropyFunctions.charEntropy(col("text")).as("h"),
      graft.functions.EntropyFunctions.tokenEntropy(col("text")).as("ht"))
    ent.collect()
    collect(ent.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec => e
    } shouldBe empty // plain select: not even the widen round-robin
  }

  test("KN serving from a loaded model never re-aggregates the model tables") {
    // The persisted count tables ARE the aggregates; a serve must be
    // joins + ONE per-doc aggregate (partial + final pair), with the
    // 1-row stats arriving by broadcast. A plan that re-aggregates a
    // billions-row c12 per serve would be the defect class this pins.
    val docs = docsDf(corpus)
    val dir = java.nio.file.Files.createTempDirectory("kn-plan").toString
    LanguageModel.saveKnModel(LanguageModel.fitKn(docs, "text"), dir)
    val out = LanguageModel.kneserNeyAgainst(
      docs, "doc_id", "text", LanguageModel.loadKnModel(spark, dir))
    out.collect()
    val plan = out.queryExecution.executedPlan
    collect(plan) {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
    }.size should be <= 2 // the per-doc CE pair — nothing else aggregates
    collect(plan) { case b: BroadcastExchangeExec => b } should not be empty
  }

  test("vocabTopK: TakeOrderedAndProject, no global Sort") {
    val out = CorpusOps.vocabTopK(docsDf(corpus), "text", n = 2, k = 10)
    out.collect()
    val plan = out.queryExecution.executedPlan
    collect(plan) { case t: TakeOrderedAndProjectExec => t } should not be empty
    collect(plan) { case s: org.apache.spark.sql.execution.SortExec => s } shouldBe empty
  }

  test("contaminationBloom: the sketch probe is map-side — below every key shuffle") {
    // Corpus docs genuinely share trigrams with eval: an empty result
    // would let AQE collapse the final plan to EmptyRelation and erase
    // every node this test asserts on.
    val contaminated = (1L to 200L).map(i =>
      i -> s"doc $i the quick brown fox jumps over doc $i")
    val evalSet = docsDf(Seq(
      1000L -> "the quick brown fox jumps over the lazy dog"))
    val out = Dedup.contaminationBloom(
      docsDf(contaminated), evalSet, "doc_id", "text", shingleN = 3, minShared = 1)
    out.collect() should not be empty // also finalizes the AQE plan
    val plan = out.queryExecution.executedPlan
    // The exact re-check semi-join builds on the small eval side.
    collect(plan) { case j: BroadcastHashJoinExec => j } should not be empty
    // The Bloom probe is the codegen'd BloomMightContain filter; the
    // scale claim is POSITION: it runs on the exploded corpus BEFORE
    // any key-partitioned exchange, so only ~fpp survivors ever
    // shuffle into the exact re-check. (The widen round-robin of the
    // tiny test input is not a key shuffle and legitimately sits
    // below it.)
    val probes = collect(plan) {
      case f: org.apache.spark.sql.execution.FilterExec
        if f.condition.exists(
          _.isInstanceOf[graft.functions.BloomMightContain]) => f
    }
    probes should not be empty
    probes.foreach { probe =>
      val keyShufflesBelow = collect(probe) {
        case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
      }
      keyShufflesBelow shouldBe empty
    }
    // And the corpus side is never sort-merge-joined against eval.
    collect(plan) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    } shouldBe empty
  }

  test("duplicateSpans: frequency count and join-back key on the window hash") {
    val out = CorpusOps.duplicateSpans(docsDf(corpus), "doc_id", "text",
      windowChars = 20, stride = 10)
    out.collect()
    val plan = out.queryExecution.executedPlan
    // All shuffles are on fixed-width keys (win_hash / doc id) — the
    // raw text column appears in no exchange's output.
    val shuffles = collect(plan) { case e: ShuffleExchangeExec => e }
    shuffles.foreach { e =>
      e.output.map(_.name) should not contain "win"
      e.output.map(_.name) should not contain "text"
    }
  }
}
