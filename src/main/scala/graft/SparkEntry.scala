package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each entry pairs a Spark DataFrame program with a DuckDB oracle over
  * the same parquet tables (oracle omitted only for operators whose
  * semantics are not SQL-expressible, e.g. MinHash-LSH).
  */
object SparkEntry {

  /** Every verifiable operator (SURVEY.md §2 inventory + north-star ops). */
  val defs: Seq[QueryDef] =
    CoreQueries.all ++ ExtendedQueries.all ++ FeatureStoreQueries.all ++
      PipelineQueries.all ++ TemporalQueries.all ++ QualityQueries.all ++
      ShapingQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the engine's core — multi-view point-in-time join. */
  def entry(spark: SparkSession): DataFrame =
    queries("pit_multiview")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.collect { case QueryDef(n, _, Some(sql)) => n -> sql.trim }.toMap
}
