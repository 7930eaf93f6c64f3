package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Semi-structured ingestion with corrupt-record QUARANTINE — the
  * ingestion-reliability counterpart of the engine's fail-fast rule:
  * at corpus scale a malformed record is data, not an error, but it
  * must never be silently dropped (Spark's default `DROPMALFORMED`
  * behavior) or silently nulled into the good rows. Every input row
  * comes out exactly once, labeled.
  *
  * Output = input columns (minus the raw JSON) + the parsed fields +
  *   `quarantined` (boolean) + `raw` (the original payload, NULL for
  *   clean rows so the good path carries no payload weight).
  *
  * Parsing uses `from_json` in PERMISSIVE mode with a corrupt-record
  * side channel; a row is quarantined when the payload is NULL, not
  * an object, or fails to parse. Fields missing from a VALID object
  * parse to NULL (schema-on-read semantics) — that is absence, not
  * corruption, and stays on the good path.
  *
  * Scale shape: one scan + per-row projection, zero shuffle — the
  * quarantine split is a column, not a partition, so downstream
  * writers can route `quarantined` rows to a dead-letter sink with a
  * partitioned write instead of a second pass. */
object JsonQuarantine {

  /** Parse `jsonCol` against `schema`; see object doc for semantics.
    * `_corrupt` is Spark's PERMISSIVE side channel: non-NULL exactly
    * when the payload failed to parse as an object. */
  def parse(df: DataFrame, jsonCol: String, schema: StructType): DataFrame = {
    require(!df.columns.contains("quarantined") && !df.columns.contains("raw"),
      "JsonQuarantine.parse: input already has quarantined/raw columns")
    val withCorrupt = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField(
        "_corrupt", org.apache.spark.sql.types.StringType))
    val parsed = from_json(col(jsonCol), withCorrupt,
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt"))
    val bad: Column = col(jsonCol).isNull || col("__graft_p").isNull ||
      col("__graft_p").getField("_corrupt").isNotNull
    val keep = df.columns.filter(_ != jsonCol).map(col).toSeq
    val fields = schema.fields.map { f =>
      // Quarantined rows contribute NO field values: PERMISSIVE may
      // salvage a prefix of a corrupt record, and half-parsed values
      // leaking into the good columns is exactly the silent corruption
      // this operator exists to prevent.
      when(!bad, col("__graft_p").getField(f.name)).as(f.name)
    }.toSeq
    df.withColumn("__graft_p", parsed)
      .select(keep ++ fields ++ Seq(
        bad.as("quarantined"),
        when(bad, col(jsonCol)).as("raw")): _*)
  }
}
