package graft.queries

import org.apache.spark.sql.functions._

import graft.join.IntervalJoin
import graft.ops.{Sampling, Sessionize}

/** Temporal-correlation and dataset-shaping operators over the events
  * stream table: deterministic sampling (whole + stratified), keyed
  * interval join, gap sessionization, pivot. All exact-oracle-checked.
  */
object TemporalQueries {
  import QueryDef.table

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "sample_hash",
      (s, dir) => Sampling.deterministicSample(
        table(s, dir, "events"), "event_id", pct = 10)
        .select("event_id", "user_id", "event_type"),
      Some("""
        SELECT event_id, user_id, event_type FROM events
        WHERE ((((event_id % 1000003) + 1000003) % 1000003) * 2654435761 % 1000003) % 100 < 10""")),

    QueryDef(
      "sample_stratified",
      (s, dir) => Sampling.stratifiedTopN(
        table(s, dir, "events").select("event_id", "event_type"),
        Seq("event_type"), "event_id", n = 3),
      Some("""
        SELECT event_id, event_type FROM (
          SELECT event_id, event_type,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                   ORDER BY ((((event_id % 1000003) + 1000003) % 1000003) * 2654435761 % 1000003) % 1000003, event_id) AS rk
          FROM events) WHERE rk <= 3""")),

    QueryDef(
      "interval_join_pairs",
      (s, dir) => {
        val e = table(s, dir, "events")
        val a = e.select(col("event_id").as("a_id"), col("ts").as("a_ts"),
          col("user_id").as("a_user"))
        val b = e.select(col("event_id").as("b_id"), col("ts").as("b_ts"),
          col("user_id").as("b_user"))
        IntervalJoin.join(a, "a_ts", b, "b_ts",
            Seq("a_user" -> "b_user"), lowerSec = 0L, upperSec = 1800L)
          .filter(col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"),
            (unix_micros(col("b_ts")) - unix_micros(col("a_ts"))).as("gap_us"))
      },
      Some("""
        SELECT a.event_id AS a_id, b.event_id AS b_id,
               epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
         AND a.event_id < b.event_id""")),

    QueryDef(
      "events_sessionize",
      (s, dir) => Sessionize.sessionStats(
        table(s, dir, "events"), "user_id", "ts", "event_id", gapSec = 1800L),
      Some("""
        WITH flagged AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        numbered AS (
          SELECT user_id, ts,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
          FROM flagged)
        SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
               COUNT(*) AS n_events,
               MIN(ts) AS session_start, MAX(ts) AS session_end
        FROM numbered GROUP BY 1, 2""")),

    // Ordered conversion funnel: earliest view → first click strictly
    // after it → first purchase strictly after that, per user.
    QueryDef(
      "events_funnel",
      (s, dir) => Sessionize.funnel(
        table(s, dir, "events"), "user_id", "event_type", "ts",
        Seq("view", "click", "purchase")),
      Some("""
        WITH s1 AS (
          SELECT user_id, MIN(ts) AS t1 FROM events
          WHERE event_type = 'view' GROUP BY 1),
        s2 AS (
          SELECT s1.user_id, s1.t1, MIN(e.ts) AS t2
          FROM s1 LEFT JOIN events e
            ON e.user_id = s1.user_id AND e.event_type = 'click' AND e.ts > s1.t1
          GROUP BY 1, 2),
        s3 AS (
          SELECT s2.user_id, s2.t1, s2.t2, MIN(e.ts) AS t3
          FROM s2 LEFT JOIN events e
            ON e.user_id = s2.user_id AND e.event_type = 'purchase' AND e.ts > s2.t2
          GROUP BY 1, 2, 3)
        SELECT user_id, t1, t2, t3 FROM s3""")),

    // Weekly retention triangle: cohort = ISO week of first activity,
    // cells count distinct active users per (cohort, week offset).
    QueryDef(
      "events_retention",
      (s, dir) => Sessionize.retentionCohorts(
        table(s, dir, "events"), "user_id", "ts"),
      Some("""
        WITH weeks AS (
          SELECT user_id AS u,
                 CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS w
          FROM events),
        cohorts AS (SELECT u, MIN(w) AS cohort_week FROM weeks GROUP BY 1)
        SELECT c.cohort_week,
               CAST(date_diff('day', CAST(c.cohort_week AS DATE), CAST(weeks.w AS DATE)) // 7 AS BIGINT) AS week_offset,
               CAST(COUNT(DISTINCT weeks.u) AS BIGINT) AS n_users
        FROM weeks JOIN cohorts c ON weeks.u = c.u
        GROUP BY 1, 2""")),

    // Leakage-free per-key lag/rolling feature block: every feature
    // uses strictly PAST rows of its key (ROWS frames ending at -1);
    // rolling sums pinned to DECIMAL so the frame sum is order-free
    // and engine-identical.
    QueryDef(
      "events_ts_features",
      (s, dir) => graft.ops.FeatureStats.timeSeriesFeatures(
        table(s, dir, "events"), "user_id", "ts", "event_id", "value",
        lags = Seq(1, 2), rollRows = 3)
        .select(col("event_id"), col("user_id"),
          col("value_lag_1"), col("value_lag_2"),
          col("value_roll_sum"), col("value_roll_cnt")),
      Some("""
        SELECT event_id, user_id,
               LAG(value, 1) OVER w AS value_lag_1,
               LAG(value, 2) OVER w AS value_lag_2,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER
                 (w ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS DOUBLE) AS value_roll_sum,
               CAST(COUNT(CAST(value AS DECIMAL(18,6))) OVER
                 (w ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS BIGINT) AS value_roll_cnt
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""")),

    // Deterministic negative sampling over (user, item=event_type-id)
    // interactions: portable-hash draws, positives dropped by anti-join.
    // Leakage-safe temporal split: 7-day train, 2-day embargo, the
    // rest eval; entity = (user, event_type) so genuinely cold
    // entities exist at sf0.01 (~320 eval vs ~6.7k purged rows) and
    // every label materializes. All four labels are value-checked.
    QueryDef(
      "events_temporal_split",
      (s, dir) => Sampling.temporalSplit(
        table(s, dir, "events")
          .select(col("event_id"),
            concat(col("user_id"), lit(":"), col("event_type")).as("entity"),
            col("ts")),
        "entity", "ts",
        trainEnd = to_timestamp(lit("2024-01-08 00:00:00")),
        evalStart = to_timestamp(lit("2024-01-10 00:00:00")),
        coldStartEval = true)
        .select(col("event_id"), col("entity"), col("split")),
      Some("""
        WITH e AS (
          SELECT event_id, user_id || ':' || event_type AS entity, ts FROM events),
        s AS (
          SELECT event_id, entity,
                 CASE WHEN ts < TIMESTAMP '2024-01-08 00:00:00' THEN 'train'
                      WHEN ts >= TIMESTAMP '2024-01-10 00:00:00' THEN 'eval'
                      ELSE 'embargo' END AS split
          FROM e)
        SELECT event_id, entity,
               CASE WHEN split = 'eval' AND EXISTS (
                      SELECT 1 FROM s t
                      WHERE t.split = 'train' AND t.entity = s.entity)
                    THEN 'purged' ELSE split END AS split
        FROM s""")),

    // nItems = 1M exercises the 64-bit two-prime cube draw (catalog cap
    // ≈ 2^52); the oracle replays the exact CRT-combine arithmetic.
    QueryDef(
      "events_negative_sample",
      (s, dir) => Sampling.negativeSample(
        table(s, dir, "events")
          .select(col("user_id"), pmod(col("event_id"), lit(50L)).as("item_id"))
          .distinct(),
        "user_id", "item_id", nItems = 1000000L, k = 3)
        .select(col("user_id"), col("item_id"),
          col("neg_idx").cast("long").as("neg_idx"), col("neg_item")),
      Some("""
        WITH inter AS (
          SELECT DISTINCT user_id, ((event_id % 50) + 50) % 50 AS item_id FROM events),
        drawn AS (
          -- mirrors the operator's NULL-key row exclusion (rows with a
          -- NULL user/item have no defined draw); the NOT EXISTS below
          -- may keep the full positives set — NULL rows never match
          SELECT user_id, item_id, j.j AS neg_idx,
                 (c1.s * 2147483549 + c2.s) % 1000000 AS neg_item
          FROM (SELECT * FROM inter
                WHERE user_id IS NOT NULL AND item_id IS NOT NULL) inter,
               generate_series(0, 2) AS j(j),
               LATERAL (SELECT (((((user_id % 2147483579) + 2147483579) % 2147483579) * 2654435761
                                + ((((item_id % 2147483579) + 2147483579) % 2147483579) * 40503)
                                + j.j * 69061) % 2147483579) AS v) AS h1,
               LATERAL (SELECT (h1.v * h1.v % 2147483579) * h1.v % 2147483579 AS s) AS c1,
               LATERAL (SELECT (((((user_id % 2147483549) + 2147483549) % 2147483549) * 2246822519
                                + ((((item_id % 2147483549) + 2147483549) % 2147483549) * 52361)
                                + j.j * 86969) % 2147483549) AS v) AS h2,
               LATERAL (SELECT (h2.v * h2.v % 2147483549) * h2.v % 2147483549 AS s) AS c2)
        SELECT d.user_id, d.item_id, d.neg_idx, d.neg_item
        FROM drawn d
        WHERE NOT EXISTS (SELECT 1 FROM inter i
                          WHERE i.user_id = d.user_id AND i.item_id = d.neg_item)""")),

    // Batch-parity twin of StreamingOps.hotKeysStream — the SAME
    // operator invocation runs here on the batch frame (the watermark
    // is a no-op outside streaming), so the driver's value oracle
    // covers the streaming monitor's aggregation semantics end-to-end,
    // not just its spec harness.
    QueryDef(
      "events_hot_keys",
      (s, dir) => graft.streaming.StreamingOps.hotKeysStream(
        table(s, dir, "events"), "user_id", "ts",
        windowDuration = "1 day", watermark = "0 seconds", minCount = 3L),
      Some("""
        SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS window_start,
               user_id, COUNT(*) AS n
        FROM events GROUP BY 1, 2 HAVING COUNT(*) >= 3""")),

    // Batch-parity twin of StreamingOps.packStream: in batch execution
    // the whole corpus is one "micro-batch" (state starts empty), so
    // the incremental packing must equal Packing.assignSequences'
    // hash-ordered prefix sums — stated here as the exact value oracle.
    QueryDef(
      "pack_stream_batch",
      (s, dir) => graft.streaming.StreamingOps.packStream(
        table(s, dir, "documents")
          .select(col("doc_id"),
            size(graft.ops.TextOps.tokens(
              graft.ops.TextOps.normalized(col("text")))).cast("long").as("n_tokens")),
        "doc_id", "n_tokens", seqLen = 2048, buckets = 8).toDF(),
      Some("""
        WITH d AS (
          SELECT doc_id,
                 CAST(len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_tokens,
                 ((((doc_id % 1000003) + 1000003) % 1000003) * 2654435761 % 1000003) % 8 AS pack_bucket,
                 ((((doc_id % 1000003) + 1000003) % 1000003) * 2654435761 % 1000003) AS ord
          FROM documents)
        SELECT pack_bucket, doc_id, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY pack_bucket
                 ORDER BY ord, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before,
               CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY pack_bucket
                 ORDER BY ord, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2048 AS BIGINT) AS seq_idx
        FROM d""")),

    // Native merging session_window (vs the lag/cumsum formulation
    // above): an event exactly `gap` after its predecessor still MERGES
    // into the session (verified against Spark's merge rule), so the
    // oracle breaks sessions strictly with >. session_end = last
    // event + gap.
    QueryDef(
      "events_session_window",
      (s, dir) => graft.streaming.StreamingOps.sessionWindowAgg(
        table(s, dir, "events"), "ts", "user_id", "30 minutes", "0 seconds"),
      Some("""
        WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS tsm FROM events),
        flagged AS (
          SELECT user_id, tsm,
                 CASE WHEN lag(tsm) OVER w IS NULL
                        OR tsm - lag(tsm) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY tsm)),
        numbered AS (
          SELECT user_id, tsm,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY tsm
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sidx
          FROM flagged)
        SELECT user_id,
               MIN(tsm) AS session_start,
               MAX(tsm) + INTERVAL 30 MINUTE AS session_end,
               COUNT(*) AS n_events
        FROM numbered GROUP BY user_id, sidx""")),

    QueryDef(
      "events_pivot",
      (s, dir) => table(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", EventTypes)
        .agg(count(lit(1)))
        .na.fill(0L, EventTypes),
      Some("""
        SELECT user_id,
               COUNT(*) FILTER (WHERE event_type = 'click') AS click,
               COUNT(*) FILTER (WHERE event_type = 'error') AS error,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
               COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
               COUNT(*) FILTER (WHERE event_type = 'view') AS view
        FROM events GROUP BY user_id""")),

    QueryDef(
      "events_json_props",
      (s, dir) => table(s, dir, "events")
        .filter(col("event_id") <= 5000)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k")),
      Some("""
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events WHERE event_id <= 5000"""))
  )
}
