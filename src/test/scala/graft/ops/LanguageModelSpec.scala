package graft.ops

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Bigram-LM cross-entropy against hand-computed add-1 probabilities. */
class LanguageModelSpec extends SparkSpec with Matchers {

  test("bigramCrossEntropy matches hand-computed smoothed log-losses") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b"),
      (2L, "a b c"),
      (3L, "x") // single token: no bigrams, absent from output
    ).toDF("doc_id", "text")
    val out = LanguageModel.bigramCrossEntropy(docs, docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // counts: c("a b")=3, c("b a")=1, c("b c")=1; prefixes a->3, b->2; V=4
    val pAB = (3.0 + 1) / (3 + 4) // P(b|a)
    val pBA = (1.0 + 1) / (2 + 4)
    val pBC = (1.0 + 1) / (2 + 4)
    val ce1 = -(math.log(pAB) + math.log(pBA) + math.log(pAB)) / 3
    val ce2 = -(math.log(pAB) + math.log(pBC)) / 2
    out.keySet shouldBe Set(1L, 2L)
    out(1L)._1 shouldBe 3L
    out(2L)._1 shouldBe 2L
    out(1L)._2 shouldBe ce1 +- 1e-9
    out(2L)._2 shouldBe ce2 +- 1e-9
  }

  test("cross-scoring: unseen bigrams score via smoothing at the high-loss tail") {
    import spark.implicits._
    // train "a b a b c d": c("a b")=2, c("b a")=1, c("b c")=1, c("c d")=1;
    // prefixes a->2, b->2, c->1; V={a,b,c,d}=4
    val train = Seq((1L, "a b a b c d")).toDF("doc_id", "text")
    val out = LanguageModel.bigramCrossEntropy(
      Seq((8L, "a b z"), (9L, "q r")).toDF("doc_id", "text"),
      train, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // doc 8: "a b" seen (2+1)/(2+4); "b z" unseen continuation (0+1)/(2+4)
    val ce8 = -(math.log(3.0 / 6) + math.log(1.0 / 6)) / 2
    // doc 9: "q r" fully unseen prefix: (0+1)/(0+4)
    val ce9 = -math.log(1.0 / 4)
    out(8L)._1 shouldBe 2L
    out(8L)._2 shouldBe ce8 +- 1e-9
    out(9L)._1 shouldBe 1L
    out(9L)._2 shouldBe ce9 +- 1e-9
    // the out-of-domain doc is the worse-scoring one
    out(9L)._2 should be > out(8L)._2
  }
}
