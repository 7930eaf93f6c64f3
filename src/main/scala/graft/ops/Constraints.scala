package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deequ-style data-quality constraint checks — the pre-training gates
  * that run BEFORE a corpus or feature table is trusted: key
  * uniqueness, referential integrity between tables, and functional
  * dependencies within one. These complement the TFDV family
  * ([[FeatureStats.inferSchema]]/`validateSchema` check values;
  * these check RELATIONSHIPS). Each check returns one row of exact
  * counts plus a deterministic example violator (the lexicographic
  * minimum, never "first seen"), so a pipeline can gate on
  * `n_violations == 0` and log the example when it isn't.
  *
  * Scale shapes: every check is hash-aggregation on the key columns
  * with map-side partial aggregation — no joins except referential
  * integrity's left-anti (whose distinct build side AQE broadcasts
  * while it fits, the decontamination pattern), no windows, no
  * collects. A constant or heavily-skewed key is exactly what partial
  * aggregation collapses before the wire.
  */
object Constraints {

  /** Key-uniqueness audit: is `cols` a primary key? One row:
    * `n_rows` (rows with a fully non-NULL key), `n_null_rows` (rows
    * with any NULL key part — NULL never identifies), `n_keys`
    * (distinct keys), `n_dup_keys` (keys with >1 row), `n_dup_rows`
    * (rows beyond the first per key), `is_unique`, and the smallest
    * duplicated key rendered as a `|`-joined string. */
  def uniqueness(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val keyNull = cols.map(col(_).isNull).reduce(_ || _)
    val keyStr = concat_ws("|", cols.map(col(_).cast("string")): _*)
    val perKey = df.filter(!keyNull)
      .groupBy(cols.map(col): _*).agg(count(lit(1)).as("n"))
      .select(keyStr.as("k"), col("n"))
    val nullRows = df.select(
      sum(when(keyNull, 1L).otherwise(0L)).as("n_null_rows"))
    perKey.agg(
        coalesce(sum(col("n")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_keys"),
        sum(when(col("n") > 1, 1L).otherwise(0L)).as("n_dup_keys"),
        sum(col("n") - 1).as("n_dup_rows"),
        min(when(col("n") > 1, col("k"))).as("example_dup_key"))
      .crossJoin(broadcast(nullRows))
      .select(lit(cols.mkString("|")).as("key_cols"),
        col("n_rows"), col("n_null_rows"), col("n_keys"),
        col("n_dup_keys"), coalesce(col("n_dup_rows"), lit(0L)).as("n_dup_rows"),
        (coalesce(col("n_dup_keys"), lit(0L)) === 0).as("is_unique"),
        col("example_dup_key"))
  }

  /** Referential-integrity audit: does every `childKeys` combination
    * in `child` exist as `parentKeys` in `parent`? Rows with any NULL
    * key part are counted separately (SQL FK semantics: NULL opts
    * out). One row: child row count, NULL-key rows, orphan rows,
    * distinct orphan keys, `is_valid`, smallest orphan key.
    *
    * The child aggregates to DISTINCT keys FIRST, so the anti-join
    * probes one row per key (not per row) against the parent's
    * distinct key build side — both sides shrink to key cardinality
    * before any join, and AQE broadcasts the parent side while it
    * fits (dimension tables at 100 TB are exactly this shape). */
  def referentialIntegrity(
      child: DataFrame, childKeys: Seq[String],
      parent: DataFrame, parentKeys: Seq[String]): DataFrame = {
    require(childKeys.nonEmpty && childKeys.length == parentKeys.length)
    val keyNull = childKeys.map(col(_).isNull).reduce(_ || _)
    val childAgg = child.filter(!keyNull)
      .groupBy(childKeys.map(col): _*).agg(count(lit(1)).as("n"))
      .select(childKeys.map(col) :+ col("n"): _*)
    val parentKeysDf = parent
      .select(parentKeys.zip(childKeys).map { case (p, c) => col(p).as(c) }: _*)
      .na.drop().distinct()
    val nullRows = child.select(
      sum(when(keyNull, 1L).otherwise(0L)).as("n_null_rows"))
    val keyStr = concat_ws("|", childKeys.map(col(_).cast("string")): _*)
    childAgg.join(parentKeysDf, childKeys, "left_anti")
      .select(keyStr.as("k"), col("n"))
      .agg(
        coalesce(sum(col("n")), lit(0L)).as("n_orphan_rows"),
        count(lit(1)).as("n_orphan_keys"),
        min(col("k")).as("example_orphan_key"))
      .crossJoin(broadcast(
        child.select(sum(when(!keyNull, 1L).otherwise(0L)).as("n_child_rows"))))
      .crossJoin(broadcast(nullRows))
      .select(lit(childKeys.mkString("|")).as("key_cols"),
        col("n_child_rows"), col("n_null_rows"),
        col("n_orphan_rows"), col("n_orphan_keys"),
        (col("n_orphan_rows") === 0).as("is_valid"),
        col("example_orphan_key"))
  }

  /** Functional-dependency audit: does `lhs → rhs` hold (every lhs
    * combination maps to exactly one rhs combination)? NULL-bearing
    * lhs rows are excluded (NULL determines nothing); rhs NULLs count
    * as a value. One row: distinct lhs count, violating lhs count
    * (mapping to ≥2 rhs), rows under violating lhs, `holds`, smallest
    * violating lhs key. Two stacked hash-aggs on (lhs, rhs) then lhs
    * — both map-side combined; no join at all. */
  def functionalDependency(
      df: DataFrame, lhs: Seq[String], rhs: Seq[String]): DataFrame = {
    require(lhs.nonEmpty && rhs.nonEmpty)
    val lhsNull = lhs.map(col(_).isNull).reduce(_ || _)
    val keyStr = concat_ws("|", lhs.map(col(_).cast("string")): _*)
    val pairs = df.filter(!lhsNull)
      .groupBy((lhs ++ rhs).map(col): _*).agg(count(lit(1)).as("n"))
    pairs
      .groupBy(lhs.map(col): _*)
      .agg(count(lit(1)).as("n_rhs"), sum(col("n")).as("n_rows"))
      .select(keyStr.as("k"), col("n_rhs"), col("n_rows"))
      .agg(
        count(lit(1)).as("n_lhs"),
        sum(when(col("n_rhs") > 1, 1L).otherwise(0L)).as("n_violating_lhs"),
        coalesce(sum(when(col("n_rhs") > 1, col("n_rows")).otherwise(0L)), lit(0L))
          .as("n_violating_rows"),
        min(when(col("n_rhs") > 1, col("k"))).as("example_violating_key"))
      .select(
        lit(lhs.mkString("|") + "->" + rhs.mkString("|")).as("dependency"),
        col("n_lhs"), col("n_violating_lhs"), col("n_violating_rows"),
        (coalesce(col("n_violating_lhs"), lit(0L)) === 0).as("holds"),
        col("example_violating_key"))
  }
}
