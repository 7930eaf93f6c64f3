package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.ParquetTables

/** One verifiable operator: a Spark DataFrame program plus (when the
  * semantics are SQL-expressible) an equivalent ANSI/DuckDB SQL oracle
  * over the same parquet tables. Column names/aliases MUST match the
  * oracle exactly (the driver's compare sorts columns by name).
  *
  * Determinism rules for oracle-checked queries:
  *   - numeric aggregates go through DECIMAL casts (exact, order-free),
  *     then CAST AS DOUBLE — never sum raw doubles across partitions;
  *   - every ORDER BY/LIMIT carries a unique tie-break column;
  *   - timestamps compare at microsecond precision on both engines.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Load `<dir>/<name>.parquet` with schema normalization. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    ParquetTables.load(spark, s"$dir/$name.parquet")
}
