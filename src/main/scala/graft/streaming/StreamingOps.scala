package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupStateTimeout}

import graft.join.{PointInTimeJoin, ResolvedView}

/** Structured-Streaming operators mirroring the batch engine's
  * semantics on unbounded inputs. The reference pipeline is batch-only
  * (SURVEY.md §2.10 — its Beam pipeline is bounded, executor.py:103-160),
  * so these are north-star extensions: the same logical operations a
  * feature platform needs when events arrive continuously.
  *
  * All operators are driver-agnostic DataFrame→DataFrame transforms:
  * they run identically under `readStream` (incremental, stateful) and
  * `read` (batch) because they only use event-time columns — no
  * processing-time dependence, so results are reproducible.
  */
object StreamingOps {

  /** Event-time tumbling-window aggregation with a watermark: the
    * streaming form of the `events_windowed` batch query. On a stream,
    * state for a window is dropped once the watermark passes its end —
    * bounded memory no matter how long the stream runs. */
  def windowedAgg(
      events: DataFrame, tsCol: String, valueCol: String, typeCol: String,
      windowDuration: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(
        window(col(tsCol), windowDuration).getField("start").as("window_start"),
        col(typeCol))
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,6)")).cast("double").as("sum_value"))

  /** Event-time gap-session aggregation via Spark's native merging
    * `session_window` state: one session row per (key, burst of events
    * closer than `gap`), `session_end` = last event + gap. The same
    * transform runs batch (watermark is a no-op) and streaming (append
    * mode; a session finalizes and its state drops once the watermark
    * passes its end — bounded memory on unbounded streams). The
    * streaming analogue of [[graft.ops.Sessionize.sessionStats]], and
    * the batch `events_session_window` query's implementation. */
  def sessionWindowAgg(
      events: DataFrame, tsCol: String, keyCol: String,
      gap: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Streaming exact dedup: drops rows whose `idCols` were already seen
    * within the watermark horizon. State is evicted as event time
    * advances, so memory stays proportional to the horizon, not the
    * stream length. */
  def dedupWithinWatermark(
      df: DataFrame, idCols: Seq[String], tsCol: String, watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /** Streaming training-data generation: point-in-time enrich each
    * micro-batch of entity events against (static) feature views using
    * the batch engine's as-of join — identical semantics per batch,
    * including TTL pruning and created-timestamp tie-breaks. The
    * returned writer still needs `.start()`, so callers can set
    * trigger/checkpoint options first.
    *
    * Correctness note: this is per-batch point-in-time against the
    * feature views AS OF when the batch runs — exactly the online
    * analogue of the reference's retrieval. Late-arriving FEATURE rows
    * would require buffering both streams on event time
    * (a stream-stream as-of join); feature views here are batch tables,
    * matching the reference's offline-store model. */
  def pitEnrichStream(
      entities: DataFrame, entityTs: String, views: Seq[ResolvedView])(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    entities.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      sink(PointInTimeJoin.join(batch, entityTs, views), batchId)
    }

  /** Online-store materialization: maintain the latest row per entity
    * key by event time (created-timestamp tie-break order = arrival
    * order within equal timestamps). This is the streaming half of the
    * feature-store model: the batch engine's point-in-time join answers
    * "value as of t" over history; this operator answers "value as of
    * now" continuously, with `mapGroupsWithState` keeping exactly one
    * row of state per key.
    *
    * Output (Update mode): one row per updated key per trigger. */
  def latestPerKey(df: DataFrame, keyCols: Seq[String], tsCol: String): Dataset[Row] = {
    val schema = df.schema
    val tsIdx = schema.fieldIndex(tsCol)
    implicit val rowEnc: Encoder[Row] = Encoders.row(schema)

    def tsOf(r: Row): java.time.Instant = r.get(tsIdx) match {
      case t: java.sql.Timestamp => t.toInstant
      case i: java.time.Instant => i
      case null => java.time.Instant.MIN
    }

    df.groupByKey { r =>
        keyCols.map(c => String.valueOf(r.getAs[Any](c))).mkString("")
      }(Encoders.STRING)
      .mapGroupsWithState[Row, Row](GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Row], state) =>
          var best = if (state.exists) state.get else null
          rows.foreach { r =>
            if (best == null || !tsOf(r).isBefore(tsOf(best))) best = r
          }
          state.update(best)
          best
      }
  }
}
