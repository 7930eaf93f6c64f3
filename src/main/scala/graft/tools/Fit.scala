package graft.tools

import org.apache.spark.sql.SparkSession

/** Artifact trainer CLI — the missing front door of the
  * fit-once/serve-many family: every transform-DSL gate
  * (`lm_filter_against`, `dedup_against`, `tokenize_against`, …)
  * serves a PERSISTED artifact, and until now those artifacts could
  * only be built from the Scala API. One invocation fits one artifact
  * from a parquet corpus and persists it where the gates (and
  * [[graft.run.Main]]'s `GRAFT_TRANSFORMS`) can serve it:
  *
  * {{{
  * runMain graft.tools.Fit <what> <inputParquet> <idCol> <textCol> <outDir> [size]
  * }}}
  *
  * `what`:
  *   - `bpe`        — merge rules (size = nMerges, default 256)
  *   - `unigram`    — unigram-LM pieces (size = vocabSize, default 500)
  *   - `wordpiece`  — WordPiece vocab (size = nMerges, default 256)
  *   - `kn`         — bigram Kneser-Ney count tables
  *   - `kn3`        — order-3 KN count tables
  *   - `kn5`        — order-5 modified-KN count tables (the corpus
  *                    must carry count-class decay at four orders or
  *                    serving fails fast — see LanguageModel scaladoc)
  *   - `exact_index` — content-hash dedup index (size = hash-bucket
  *                    count for the partitioned layout; omit for flat)
  *
  * Prints one JSON line: what, rows read, output path.
  */
object Fit {
  def main(args: Array[String]): Unit = {
    if (args.length < 5) {
      System.err.println(
        "usage: Fit <bpe|unigram|wordpiece|kn|kn3|kn5|exact_index> " +
          "<inputParquet> <idCol> <textCol> <outDir> [size]")
      sys.exit(2)
    }
    val Array(what, input, idCol, textCol, outDir) = args.take(5)
    val size = args.lift(5).map(_.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.sources.ParquetTables.load(spark, input)
    val n = df.count()
    what match {
      case "bpe" => graft.ops.Bpe.saveRules(
        graft.ops.Bpe.train(df, textCol, nMerges = size.getOrElse(256)),
        outDir, spark)
      case "unigram" => graft.ops.Unigram.saveModel(
        graft.ops.Unigram.train(df, textCol, vocabSize = size.getOrElse(500)),
        outDir, spark)
      case "wordpiece" => graft.ops.WordPiece.saveModel(
        graft.ops.WordPiece.train(df, textCol, nMerges = size.getOrElse(256)),
        outDir, spark)
      case "kn" => graft.ops.LanguageModel.saveKnModel(
        graft.ops.LanguageModel.fitKn(df, textCol), outDir)
      case "kn3" => graft.ops.LanguageModel.saveKn3Model(
        graft.ops.LanguageModel.fitKn3(df, textCol), outDir)
      case "kn5" => graft.ops.LanguageModel.saveKn5Model(
        graft.ops.LanguageModel.fitKn5(df, textCol), outDir)
      case "exact_index" =>
        val idx = graft.ops.Dedup.exact(df, idCol, textCol)
        size match {
          case Some(b) =>
            graft.ops.Dedup.saveExactIndexPartitioned(idx, outDir, b)
          case None => graft.ops.Dedup.saveExactIndex(idx, outDir)
        }
      case other =>
        System.err.println(s"Fit: unknown artifact '$other'")
        sys.exit(2)
    }
    println(s"""{"fit":"$what","rows":$n,"out":"$outDir"}""")
    spark.stop()
  }
}
