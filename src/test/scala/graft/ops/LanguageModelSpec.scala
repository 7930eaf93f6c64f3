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

  test("charNgramLangId matches a hand-computed NB argmax; short docs predict NULL") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Two "languages" with disjoint unigram alphabets, n=1 so the
    // smoothed NB scores are hand-checkable: P(g|L) = (c+1)/(N_L+V).
    val train = Seq(
      (1L, "aab", "A"), (2L, "aba", "A"),   // A: a×4, b×2 → N_A=6
      (3L, "xxy", "B")                       // B: x×2, y×1 → N_B=3
    ).toDF("doc_id", "text", "lang")
    val score = Seq(
      (10L, "aa"),   // A: 2·ln(5/10)+lnP(A)  B: 2·ln(1/7)+lnP(B) → A
      (11L, "xy"),   // B wins on both grams
      (12L, "")      // shorter than n → NULL
    ).toDF("doc_id", "text")
    val out = LanguageModel
      .charNgramLangId(score, train, "doc_id", "text", "lang", n = 1)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    out shouldBe Map(10L -> Some("A"), 11L -> Some("B"), 12L -> None)
  }

  test("char-trigram NB beats marker-word langId on held-out docs that avoid the markers") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val markers = Seq(
      "en" -> Seq("the", "a", "and", "of"),
      "de" -> Seq("der", "die", "das", "und"),
      "fr" -> Seq("le", "la", "et", "de"),
      "es" -> Seq("el", "la", "y", "de"))
    // Training corpus: ordinary sentences per language (markers present
    // or not — the model sees orthography, not a curated word list).
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank", "en"),
      (2L, "she walked through the garden and watched the evening light fade slowly", "en"),
      (3L, "der schnelle braune fuchs springt ueber den faulen hund am flussufer", "de"),
      (4L, "sie ging durch den garten und beobachtete das schwindende abendlicht", "de"),
      (5L, "le renard brun rapide saute par dessus le chien paresseux pres de la riviere", "fr"),
      (6L, "elle marchait dans le jardin et regardait la lumiere du soir disparaitre", "fr"),
      (7L, "el rapido zorro marron salta sobre el perro perezoso cerca del rio", "es"),
      (8L, "ella caminaba por el jardin y miraba desvanecerse la luz de la tarde", "es")
    ).toDF("doc_id", "text", "lang")
    // Held-out docs deliberately avoid every marker word — the marker
    // heuristic returns 'und' (or a cross-language false hit: "de" is
    // an fr/es marker), while trigrams still carry the orthography.
    val heldOut = Seq(
      (101L, "quick foxes jump happily across green meadows every bright morning", "en"),
      (102L, "schnelle fuechse springen froehlich ueber gruene wiesen jeden hellen morgen", "de"),
      (103L, "renards rapides sautent joyeusement sur les prairies vertes chaque matin clair", "fr"),
      (104L, "zorros rapidos saltan alegremente sobre praderas verdes cada manana clara", "es")
    ).toDF("doc_id", "text", "lang")
    val nb = LanguageModel
      .charNgramLangId(heldOut, train, "doc_id", "text", "lang")
      .withColumnRenamed("doc_id", "id")
    val nbAcc = heldOut.join(nb, col("doc_id") === col("id"))
      .filter(col("lang_pred") === col("lang")).count()
    val mkAcc = heldOut
      .withColumn("pred", TextOps.langId(col("text"), markers))
      .filter(col("pred") === col("lang")).count()
    nbAcc shouldBe 4L
    mkAcc should be < nbAcc
  }
}
