package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Semi-structured ingestion with corrupt-record QUARANTINE — the
  * ingestion-reliability counterpart of the engine's fail-fast rule:
  * at corpus scale a malformed record is data, not an error, but it
  * must never be silently dropped (Spark's default `DROPMALFORMED`
  * behavior) or silently nulled into the good rows. Every input row
  * comes out exactly once, labeled.
  *
  * Output = input columns (minus the raw payload) + the parsed fields
  *   + `quarantined` (boolean) + `raw` (the original payload, NULL for
  *   clean rows so the good path carries no payload weight).
  *
  * Scale shape: one scan + per-row projection, zero shuffle — the
  * quarantine split is a column, not a partition, so downstream
  * writers can route `quarantined` rows to a dead-letter sink with a
  * partitioned write instead of a second pass. Stateless, so it runs
  * unchanged on streams (StreamingSpec twin). */
private[sources] object QuarantineParse {

  /** Shared routing core: `mkParsed` builds the PERMISSIVE parse
    * column against `schema` + the `_corrupt` side channel; `alsoBad`
    * adds format-specific corruption (e.g. CSV empty lines). A row is
    * quarantined when the payload is NULL, the parse result is NULL,
    * the side channel fired, or `alsoBad` holds. Quarantined rows
    * contribute NO field values: PERMISSIVE may salvage a prefix of a
    * corrupt record, and half-parsed values leaking into the good
    * columns is exactly the silent corruption this operator exists to
    * prevent. */
  def apply(
      df: DataFrame, payloadCol: String, schema: StructType,
      mkParsed: StructType => Column, alsoBad: Column): DataFrame = {
    // Collisions produce silently duplicated output columns (any
    // downstream col() then throws AMBIGUOUS_REFERENCE — or a
    // positional writer persists both); reject them all up front, on
    // BOTH sides: kept input columns vs the output surface, and
    // schema fields vs the operator's own output/internal names.
    val ownNames = Set("quarantined", "raw", "_corrupt", "__graft_p")
    val schemaClash = schema.fieldNames.filter(ownNames.contains)
    require(schemaClash.isEmpty,
      s"quarantine parse: schema fields ${schemaClash.mkString(", ")} " +
        "collide with the operator's output/internal column names")
    val reserved = ownNames ++ schema.fieldNames.toSet
    val kept = df.columns.filter(_ != payloadCol)
    val clash = kept.filter(reserved.contains)
    require(clash.isEmpty,
      s"quarantine parse: input columns ${clash.mkString(", ")} collide " +
        "with output/schema/internal column names")
    val withCorrupt = StructType(schema.fields :+
      StructField("_corrupt", StringType))
    val bad: Column = col(payloadCol).isNull || col("__graft_p").isNull ||
      col("__graft_p").getField("_corrupt").isNotNull || alsoBad
    val keep = kept.map(col).toSeq
    val fields = schema.fields.map { f =>
      when(!bad, col("__graft_p").getField(f.name)).as(f.name)
    }.toSeq
    df.withColumn("__graft_p", mkParsed(withCorrupt))
      .select(keep ++ fields ++ Seq(
        bad.as("quarantined"),
        when(bad, col(payloadCol)).as("raw")): _*)
  }
}

/** JSON flavor: a row quarantines when the payload is NULL, not a
  * JSON object, or fails to parse. Fields missing from a VALID object
  * parse to NULL (schema-on-read semantics) — absence, not
  * corruption, and stays on the good path. */
object JsonQuarantine {
  def parse(df: DataFrame, jsonCol: String, schema: StructType): DataFrame =
    QuarantineParse(df, jsonCol, schema,
      s => from_json(col(jsonCol), s,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt")),
      alsoBad = lit(false))
}

/** CSV flavor. CSV semantics differ from JSON's (probed, spec-pinned):
  * UNDER-arity is corruption, not absence — a positional format with
  * missing trailing fields is a torn record, unlike a JSON object
  * that simply omits a key — as are over-arity and unparseable typed
  * fields (whose salvaged prefix the core nulls out). Empty /
  * whitespace-only lines parse to an all-NULL record with NO corrupt
  * flag in Spark; this operator quarantines them explicitly for
  * consistency with under-arity (an empty line is the extreme torn
  * record, and silently emitting an all-NULL "good" row is the exact
  * failure mode quarantine exists to stop). An empty FIELD between
  * separators is still just NULL — absence on the good path. */
object CsvQuarantine {
  def parse(
      df: DataFrame, csvCol: String, schema: StructType,
      sep: String = ","): DataFrame =
    QuarantineParse(df, csvCol, schema,
      s => from_csv(col(csvCol), s,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt",
          "sep" -> sep)),
      alsoBad = trim(col(csvCol)) === "")
}
