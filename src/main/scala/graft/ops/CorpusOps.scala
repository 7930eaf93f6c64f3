package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level text operators — the cleaning stages that need to see
  * the whole corpus, not one document at a time (cross-document line
  * frequency, global n-gram statistics). Unlike [[TextOps]] these
  * shuffle by necessity; the design keeps every shuffle on small
  * fixed-width keys (16-byte md5 line hashes, n-gram strings) with
  * map-side partial aggregation, and the "hot" sets that drive
  * filtering are broadcast, never joined shuffle-to-shuffle.
  */
object CorpusOps {

  /** C4-style boilerplate removal: drop every line that occurs in more
    * than `maxDf` distinct documents (nav bars, cookie banners, license
    * headers), then reassemble the surviving lines in document order.
    * Documents whose lines are all boilerplate are dropped (C4 drops
    * empty documents too).
    *
    * Scale shape: (1) explode to lines — map-side, no shuffle; (2) one
    * hash-agg shuffle on the 16-byte line hash for document frequency
    * (partial aggregation collapses repeats before the wire); (3) the
    * boilerplate set — by construction ≤ corpus_lines / maxDf entries,
    * tiny in practice — broadcasts into a left-anti join, so the line
    * table itself never re-shuffles for the filter; (4) one shuffle on
    * doc id to reassemble. Nothing is ever keyed on raw line text.
    */
  def stripBoilerplate(
      df: DataFrame, idCol: String, textCol: String, maxDf: Int): DataFrame = {
    require(maxDf > 0)
    val lines = OpsUtil.widen(df)
      .select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("line_pos", "line")))
      .withColumn("line_key", md5(col("line")))
    val boilerplate = lines
      .groupBy(col("line_key"))
      .agg(countDistinct(col(idCol)).as("line_df"))
      .filter(col("line_df") > maxDf)
      .select("line_key")
    lines
      .join(broadcast(boilerplate), Seq("line_key"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lines_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("line_pos"), col("line")))),
            s => s.getField("line")),
          "\n").as("clean_text"))
  }

  /** Top-k most frequent word n-grams across the corpus — the vocab /
    * merge-table prep statistic. One map-side-combined hash-agg shuffle
    * on the n-gram string, then a TakeOrderedAndProject (no global
    * sort materializes). Ties break lexicographically so the result is
    * total-ordered and engine-reproducible. */
  def vocabTopK(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame = {
    val ws = col("__graft_ws")
    OpsUtil.widen(df)
      .withColumn("__graft_ws", TextOps.tokens(TextOps.normalized(col(textCol))))
      .select(explode(TextOps.shingles(ws, n)).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("ngram"))
      .limit(k)
  }
}
