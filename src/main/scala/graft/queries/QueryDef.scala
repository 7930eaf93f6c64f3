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

  private val exitDeletes =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  // ONE shutdown hook iterating the set — a hook thread per registered
  // path would grow the JVM's hook table linearly with scratch dirs
  // and run them all concurrently at exit.
  private lazy val exitHook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      exitDeletes.forEach(p => rm(new java.io.File(p)))
    }))
  }

  /** Register `path` for recursive deletion at JVM exit and return it.
    * ApplicationId-suffixed scratch dirs de-race concurrent harness
    * runs but by the same token can never be reused/overwritten by a
    * later run — without this hook every run leaks its suffix-unique
    * directory into java.io.tmpdir forever. Idempotent per path. */
  def deleteOnExit(path: String): String = {
    exitHook
    exitDeletes.add(path)
    path
  }
}
