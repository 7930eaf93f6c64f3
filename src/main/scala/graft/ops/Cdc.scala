package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture merge: apply an upsert/delete changelog to a
  * base snapshot — the incremental-materialization step a feature
  * store runs between full rebuilds (the reference's Feast tables are
  * exactly such latest-value materializations; cf.
  * /root/reference/feast_component/executor.py:163-164 which always
  * re-reads the full table).
  *
  * Scale shape: one union (no shuffle) and ONE shuffle on the key via
  * `max_by(struct(..), seq)` — the partial aggregate collapses each
  * key's history map-side, so the wire carries ~one row per key per
  * map task, not the full changelog. (Struct payloads aren't
  * hash-aggregable, so Spark plans a SortAggregate: the map-side sort
  * is per-partition CPU, cheaper at scale than the extra shuffle a
  * max-seq + join-back formulation would pay.) No window over the
  * data, no join. Deletes ride through the reduction as tombstone rows
  * and drop in a final filter.
  */
object Cdc {

  /** Merge `changes` (with `seqCol` ordering and `opCol` ∈ {'U','D'})
    * into `base`. Base rows participate with sequence `baseSeq` (must
    * order below every change touching the same key). For each key the
    * highest-sequence row wins; if it is a delete the key disappears.
    * Output schema = the data columns (base schema), no op/seq.
    *
    * `seqCol` must be unique per key across base+changes — the merge
    * is an argmax and a tie would be nondeterministic (same contract
    * as the PIT join's dedup).
    */
  def applyChangelog(
      base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      seqCol: String, opCol: String, baseSeq: Long = Long.MinValue): DataFrame = {
    require(keyCols.nonEmpty)
    val dataCols = base.columns.filterNot(c => c == seqCol || c == opCol)
    val tagged = base.select(
      dataCols.map(col) :+ lit(baseSeq).as(seqCol) :+ lit("U").as(opCol): _*)
    val all = tagged.unionByName(
      changes.select(dataCols.map(col) :+ col(seqCol) :+ col(opCol): _*))
    val payload = struct((dataCols.map(col) :+ col(opCol)): _*)
    val merged = all
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(payload, col(seqCol)).as("__graft_latest"))
    val nonKey = dataCols.filterNot(keyCols.contains)
    merged
      .filter(col("__graft_latest").getField(opCol) =!= "D")
      .select(keyCols.map(col) ++
        nonKey.map(c => col("__graft_latest").getField(c).as(c)): _*)
  }

  /** Slowly-changing-dimension TYPE 2 history from the same changelog
    * contract as [[applyChangelog]]: every upsert opens a version row
    * valid over `[seq, next change's seq)`; the key's following change
    * (upsert OR delete) closes it. Output = the change's data columns
    * plus `valid_from_seq`, `valid_to_seq` (NULL = still open) and
    * `is_current` (open AND not closed by a delete). A training
    * pipeline joins facts against this on
    * `valid_from_seq <= fact_seq < valid_to_seq` to reconstruct any
    * point-in-time snapshot — the audit-table complement of the PIT
    * join's latest-value semantics.
    *
    * Scale shape: ONE shuffle (the per-key window for `lead(seq)`);
    * key cardinality bounds nothing — each key's history sorts
    * independently inside its partition. `seqCol` unique per key, as
    * in [[applyChangelog]]. */
  def scd2History(
      changes: DataFrame, keyCols: Seq[String],
      seqCol: String, opCol: String): DataFrame = {
    require(keyCols.nonEmpty)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(seqCol))
    changes
      .withColumn("__graft_to", lead(col(seqCol), 1).over(w))
      .filter(col(opCol) =!= "D")
      .withColumn("valid_from_seq", col(seqCol))
      .withColumn("valid_to_seq", col("__graft_to"))
      .withColumn("is_current", col("__graft_to").isNull)
      .drop("__graft_to", seqCol, opCol)
  }
}
