package graft

/** Shared test corpus for order-5 modified KN: the lm_score_kn5
  * oracle's (level, count-class) synthesis gadgets as plain strings —
  * a gadget for (L, j) carries 5−L id-keyed words then
  * floor(id/j)-keyed words, planting n-gram types of count exactly j
  * at level L; per-class copy multiplicities (1,3,2,1) steepen the
  * count-of-counts decay so the Chen-Goodman closed form stays in
  * bounds at any doc count. One definition, three consumers
  * (LanguageModelSpec's naive-reference parity, RunnerSpec's gate
  * sniff, StreamingSpec's serve twin). */
object Kn5TestCorpus {

  def gadgetText(id: Long): String =
    (for {
      lvl <- 5 to 2 by -1
      j <- 1 to 4
      c <- 1 to Seq(1, 3, 2, 1)(j - 1)
      (p, idx) <- Seq("a", "b", "c", "d", "e").zipWithIndex
    } yield {
      // floorDiv, not `/`: the production gadget (Kn5Gadgets) and the
      // DuckDB oracle both FLOOR, and Scala `/` truncates toward zero
      // — they disagree on negative ids, so a future negative-id test
      // through this fixture would plant different count classes than
      // the engines under test and chase a phantom mismatch.
      val key = if (idx < 5 - lvl) id else Math.floorDiv(id, j.toLong)
      s"g$lvl$j$c$p$key"
    }).mkString(" ")

  /** n docs of a fluent 6-token sentence plus the gadget tail. */
  def corpus(n: Int): Seq[(Long, String)] =
    (0L until n.toLong).map(i =>
      (i, s"the cat sat on the mat ${gadgetText(i)}"))
}
