package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table source/sink: pre-shuffle tables once at write time so
  * every later equi-join/aggregation on the bucket keys runs
  * shuffle-free (both sides' bucket i hold the same key range — the
  * join is a per-bucket merge with no Exchange in the plan).
  *
  * This is the 100 TB answer to repeated joins on the same keys
  * (feature tables joined by entity key every training run): pay one
  * shuffle at ingest, never again. Bucket count is fixed at write time
  * — size it so one bucket of the biggest table fits an executor
  * (e.g. 100 TB / 4096 buckets ≈ 25 GB/bucket).
  */
object BucketedTables {

  /** Write `df` as a bucketed (+ sorted, for merge-join readiness)
    * external table at `path`, registered as `tableName`. */
  def writeBucketed(
      df: DataFrame, tableName: String, path: String,
      bucketCols: Seq[String], buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(tableName)

  def table(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)
}
