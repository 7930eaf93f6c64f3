package graft.join

import java.sql.Timestamp

import org.apache.spark.sql.Row
import graft.SparkSpec

/** PIT-join edge semantics (SURVEY.md §7.5 item 1): inclusive bounds,
  * TTL expiry, created_ts tie-break, left-join NULLs, duplicate entity
  * rows, multiple views — each checked against hand-computed expectations,
  * under both dedup strategies.
  */
class PointInTimeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // entity spine: (id, key, ts)
  private lazy val entity = Seq(
    (1L, 10L, ts("2024-01-10 00:00:00")),
    (2L, 10L, ts("2024-01-01 00:00:00")), // exact-match boundary
    (3L, 20L, ts("2024-01-10 00:00:00")), // no features for key 20 in window
    (4L, 30L, ts("2024-01-10 00:00:00")), // key absent entirely
    (5L, 10L, ts("2024-01-10 00:00:00"))  // duplicate of row 1's (key, ts)
  ).toDF("eid", "key", "event_ts")

  // features: (key, fts, created, val)
  private lazy val feats = Seq(
    (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00"), "a"),
    (10L, ts("2024-01-05 00:00:00"), ts("2024-01-05 01:00:00"), "b"),
    (10L, ts("2024-01-05 00:00:00"), ts("2024-01-05 02:00:00"), "b2"), // created tie-break
    (10L, ts("2024-01-11 00:00:00"), ts("2024-01-11 01:00:00"), "future"), // > entity ts
    (20L, ts("2023-10-01 00:00:00"), ts("2023-10-01 01:00:00"), "stale")   // outside 30d ttl
  ).toDF("key", "fts", "created", "val")

  private def view(ttl: Option[Long]) = ResolvedView(
    name = "v", source = feats, joinKeys = Seq("key" -> "key"),
    tsCol = "fts", createdTs = Some("created"), features = Seq("val"),
    ttlSeconds = ttl)

  for (strategy <- Seq(PointInTimeJoin.MaxByAgg, PointInTimeJoin.WindowRowNumber)) {
    test(s"asof semantics with ttl, $strategy") {
      val out = PointInTimeJoin.join(
        entity, "event_ts", Seq(view(Some(30L * 86400))), strategy, rowIdCol = Some("eid"))
      val got = out.select("eid", "val").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got(1L) == "b2")   // latest <= ts, created tie-break picks b2
      assert(got(2L) == "a")    // boundary: fts == entity ts is admitted
      assert(got(3L) == null)   // stale feature outside ttl → NULL
      assert(got(4L) == null)   // key never present → NULL
      assert(got(5L) == "b2")   // duplicate entity row gets its own answer
      assert(out.count() == 5)  // left join keeps every spine row exactly once
    }

    test(s"unbounded ttl admits old rows, $strategy") {
      val out = PointInTimeJoin.join(
        entity, "event_ts", Seq(view(None)), strategy, rowIdCol = Some("eid"))
      val got = out.select("eid", "val").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got(3L) == "stale") // no ttl → the old row matches
    }
  }

  test("ttl boundary is inclusive at ts - ttl") {
    val e = Seq((1L, 10L, ts("2024-01-31 00:00:00"))).toDF("eid", "key", "event_ts")
    val f = Seq(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00"), "edge"),       // exactly ts - 30d
      (10L, ts("2023-12-31 23:59:59"), ts("2023-12-31 23:59:59"), "tooOld"))
      .toDF("key", "fts", "created", "val")
    val v = ResolvedView("v", f, Seq("key" -> "key"), "fts", Some("created"),
      Seq("val"), Some(30L * 86400))
    val got = PointInTimeJoin.join(e, "event_ts", Seq(v), rowIdCol = Some("eid"))
      .select("val").head().getString(0)
    assert(got == "edge")
  }

  test("multiple views stitch independently without fan-out") {
    val v1 = view(Some(30L * 86400))
    val extra = Seq(
      (10L, ts("2024-01-02 00:00:00"), 1.5),
      (10L, ts("2024-01-09 00:00:00"), 2.5),
      (20L, ts("2024-01-09 00:00:00"), 9.9)
    ).toDF("key", "fts2", "score")
    val v2 = ResolvedView("v2", extra, Seq("key" -> "key"), "fts2",
      None, Seq("score"), None, outputPrefix = Some("v2"))
    val out = PointInTimeJoin.join(entity, "event_ts", Seq(v1, v2), rowIdCol = Some("eid"))
    assert(out.count() == 5)
    val r1 = out.filter($"eid" === 1L).head()
    assert(r1.getAs[String]("val") == "b2")
    assert(r1.getAs[Double]("v2__score") == 2.5)
    val r3 = out.filter($"eid" === 3L).head()
    assert(r3.getAs[String]("val") == null)    // v1 stale for key 20
    assert(r3.getAs[Double]("v2__score") == 9.9) // but v2 matches
  }

  test("lineitem multiview plan: views broadcast, TTL pushed to scan, spine scanned once") {
    val df = graft.SparkEntry.queries("pit_lineitem_multiview_ttl")(spark, sf())
    val plan = df.queryExecution.executedPlan.toString
    withClue(plan.take(4000)) {
      // both pruned views join by broadcast — no shuffle of the spine
      // per view beyond the row-id agg
      assert("BroadcastHashJoin".r.findAllMatchIn(plan).size >= 2)
      // TTL + as-of bounds reach the orders parquet scan as row-group filters
      assert(plan.contains("PushedFilters: [IsNotNull(o_orderdate), LessThanOrEqual(o_orderdate"))
      // the synthetic-id spine is materialized once: consumers read the
      // checkpointed RDD instead of re-running scan+distinct per view
      assert(!plan.contains("lineitem.parquet"))
      assert(plan.contains("ExistingRDD"))
      // row-id exchanges only: stitch base + one per view
      assert("Exchange hashpartitioning".r.findAllMatchIn(plan).size <= 3)
    }
    assert(df.count() > 0)
  }

  test("many-view stitch stays linear: no cross-view fan-out, bounded exchanges") {
    // The 8-view canary (6 time-varying + 2 static): the stitch is a
    // foldLeft of row-id left joins, so exchanges must grow linearly
    // in view count — per time-varying view at most 2 hash exchanges
    // (the view-side shuffle for the dedup window + the stitch join),
    // and zero nested-loop/cartesian joins anywhere.
    val df = graft.SparkEntry.queries("pit_manyviews")(spark, sf())
    val plan = df.queryExecution.executedPlan.toString
    val hashEx = "Exchange hashpartitioning".r.findAllMatchIn(plan).size
    val timeVarying = 6
    val stitchJoins =
      "SortMergeJoin \\[__graft_row_id".r.findAllMatchIn(plan).size +
        "BroadcastHashJoin \\[__graft_row_id".r.findAllMatchIn(plan).size
    withClue(s"hashExchanges=$hashEx stitchJoins=$stitchJoins\n" + plan.take(4000)) {
      // measured: 9 = 1 spine shuffle + 1 final-agg shuffle per
      // time-varying view + 2 static-view stitches; the bound leaves
      // room for AQE variance but forbids quadratic blowup
      assert(hashEx <= 2 * timeVarying + 3)
      assert(!plan.contains("CartesianProduct"))
      assert(!plan.contains("BroadcastNestedLoopJoin"))
      // exactly one stitch join per view — linear in view count
      assert(stitchJoins == 8)
      // per-view candidate generation broadcasts the pruned side
      assert("BroadcastHashJoin".r.findAllMatchIn(plan).size >= 2)
    }
    val n = df.count()
    assert(n > 0)
    // left-join semantics: spine cardinality preserved exactly
    assert(n ==
      graft.sources.ParquetTables.load(spark, sf() + "/events.parquet").count())
  }

  test("natural-key spine skips the materialization the synthetic-id path needs") {
    // With rowIdCol the spine feeds every consumer as a plain scan; the
    // synthetic-id path must localCheckpoint (ExistingRDD in the plan)
    // so monotonically_increasing_id comes out identical in all
    // consumers. Same output either way — the delta is one spine
    // materialization write + read per job, which at 100 TB is the
    // argument for having a natural unique key (SCALE.md).
    val natural = graft.SparkEntry.queries("pit_manyviews")(spark, sf())
    val synth = graft.SparkEntry.queries("pit_manyviews_synth")(spark, sf())
    val pNat = natural.queryExecution.executedPlan.toString
    val pSyn = synth.queryExecution.executedPlan.toString
    withClue(pNat.take(2000)) {
      // natural path: no checkpointed-RDD scan, events parquet read directly
      assert(!pNat.contains("ExistingRDD"))
      assert(pNat.contains("events.parquet"))
    }
    withClue(pSyn.take(2000)) {
      // synthetic path: every spine consumer reads the checkpointed RDD
      assert(pSyn.contains("ExistingRDD"))
      assert(!pSyn.contains("events.parquet"))
    }
    // both stay linear: one stitch join per view, no fan-out
    Seq(pNat, pSyn).foreach { p =>
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    }
    // identical results row-for-row (the twin shares the oracle too)
    assert(natural.exceptAll(synth).isEmpty && synth.exceptAll(natural).isEmpty)
  }

  test("scratch-parquet spine: identical results, spine read from scratch, one write-out") {
    val dir = java.nio.file.Files.createTempDirectory("graft-spine-spec").toString
    val viaCheckpoint = PointInTimeJoin.join(
      entity, "event_ts", Seq(view(Some(30L * 86400))))
    val viaScratch = PointInTimeJoin.join(
      entity, "event_ts", Seq(view(Some(30L * 86400))),
      spineScratchDir = Some(dir))
    // identical rows (synthetic ids are internal either way)
    assert(viaScratch.exceptAll(viaCheckpoint).isEmpty &&
      viaCheckpoint.exceptAll(viaScratch).isEmpty)
    // the spine was written once under the scratch dir and every
    // consumer scans it back as parquet (no checkpointed-RDD scan).
    // It must SURVIVE for the JVM's lifetime (consumers are lazy
    // scans) — cleanup is registered for JVM exit via Hadoop
    // FileSystem.deleteOnExit, which a running spec cannot observe.
    val spines = new java.io.File(dir).listFiles()
    assert(spines != null && spines.count(_.getName.startsWith("graft-spine-")) == 1)
    val p = viaScratch.queryExecution.executedPlan.toString
    withClue(p.take(2000)) {
      assert(p.contains("graft-spine-"))
      assert(!p.contains("ExistingRDD"))
    }
    // ignored when a natural key is present: nothing new written
    PointInTimeJoin.join(entity, "event_ts", Seq(view(None)),
      rowIdCol = Some("eid"), spineScratchDir = Some(dir)).count()
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("graft-spine-")) == 1)
  }

  test("empty entity spine yields empty result with full schema") {
    val out = PointInTimeJoin.join(
      entity.filter($"eid" < 0), "event_ts", Seq(view(None)), rowIdCol = Some("eid"))
    assert(out.columns.contains("val"))
    assert(out.count() == 0)
  }

  test("property: both strategies agree with a naive oracle on random data") {
    val rng = new scala.util.Random(42)
    val e = (1 to 200).map { i =>
      (i.toLong, rng.nextInt(8).toLong,
        ts(f"2024-01-${1 + rng.nextInt(28)}%02d ${rng.nextInt(24)}%02d:00:00"))
    }
    val f = (1 to 300).map { i =>
      (rng.nextInt(8).toLong,
        ts(f"2024-01-${1 + rng.nextInt(28)}%02d ${rng.nextInt(24)}%02d:00:00"),
        ts(f"2024-01-01 00:${i % 60}%02d:00"), i.toLong)
    }
    val ttl = 7L * 86400
    // naive in-memory oracle
    val expected = e.map { case (eid, k, ets) =>
      val cands = f.filter { case (fk, fts, _, _) =>
        fk == k && !fts.after(ets) &&
          fts.getTime >= ets.getTime - ttl * 1000
      }
      val best = if (cands.isEmpty) null
      else cands.maxBy { case (_, fts, cts, v) => (fts.getTime, cts.getTime, v) }._4
      eid -> best
    }.toMap

    val eDf = e.toDF("eid", "key", "event_ts")
    val fDf = f.toDF("key", "fts", "created", "val")
    val v = ResolvedView("v", fDf, Seq("key" -> "key"), "fts", Some("created"),
      Seq("val"), Some(ttl))
    for (strategy <- Seq(PointInTimeJoin.MaxByAgg, PointInTimeJoin.WindowRowNumber)) {
      val got = PointInTimeJoin.join(eDf, "event_ts", Seq(v), strategy, rowIdCol = Some("eid"))
        .select("eid", "val").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
      // (ts, created) pairs may collide for the same key: the naive oracle
      // breaks that tie on max(val), which is exactly MaxByAgg's order; the
      // window strategy ties only differ when (fts, cts) collide, so compare
      // those rows loosely.
      val strict = strategy == PointInTimeJoin.MaxByAgg
      expected.foreach { case (eid, exp) =>
        if (strict) assert(got(eid) == exp, s"eid=$eid")
        else assert((got(eid) == null) == (exp == null), s"eid=$eid nullness")
      }
    }
  }

  test("joinFused: handcrafted semantics identical to the unfused reference") {
    val v1 = view(Some(30L * 86400))
    val extra = Seq(
      (10L, ts("2024-01-02 00:00:00"), 1.5),
      (10L, ts("2024-01-09 00:00:00"), 2.5),
      (20L, ts("2024-01-09 00:00:00"), 9.9)
    ).toDF("key", "fts2", "score")
    val v2 = ResolvedView("v2", extra, Seq("key" -> "key"), "fts2",
      None, Seq("score"), None, outputPrefix = Some("v2"))
    val fused = PointInTimeJoin.joinFused(
      entity, "event_ts", Seq(v1, v2), rowIdCol = Some("eid"))
    val ref = PointInTimeJoin.join(
      entity, "event_ts", Seq(v1, v2), rowIdCol = Some("eid"))
    assert(fused.columns.toSeq == ref.columns.toSeq) // schema parity incl. order
    assert(fused.exceptAll(ref).isEmpty && ref.exceptAll(fused).isEmpty)
    // spot semantics (ttl NULL, tie-break, per-view independence)
    val r = fused.collect().map(x => x.getAs[Long]("eid") -> x).toMap
    assert(r(1L).getAs[String]("val") == "b2")
    assert(r(3L).getAs[String]("val") == null)
    assert(r(3L).getAs[Double]("v2__score") == 9.9)
    assert(fused.count() == 5)
  }

  test("joinFused: empty spine yields empty result with the full fused schema") {
    val out = PointInTimeJoin.joinFused(
      entity.filter($"eid" < 0), "event_ts", Seq(view(None)), rowIdCol = Some("eid"))
    assert(out.columns.contains("val"))
    assert(out.count() == 0)
  }

  test("joinFused: random-data parity with the unfused reference across mixed views") {
    val rng = new scala.util.Random(7)
    val e = (1 to 300).map { i =>
      (i.toLong, rng.nextInt(8).toLong,
        ts(f"2024-01-${1 + rng.nextInt(28)}%02d ${rng.nextInt(24)}%02d:00:00"))
    }
    val f = (1 to 400).map { i =>
      (rng.nextInt(8).toLong,
        ts(f"2024-01-${1 + rng.nextInt(28)}%02d ${rng.nextInt(24)}%02d:00:00"),
        ts(f"2024-01-01 00:${i % 60}%02d:00"), i.toLong)
    }
    val eDf = e.toDF("eid", "key", "event_ts")
    val fDf = f.toDF("key", "fts", "created", "val")
    // mixed shapes: ttl'd + unbounded + no created-ts + prefixed
    val views = Seq(
      ResolvedView("a", fDf, Seq("key" -> "key"), "fts", Some("created"),
        Seq("val"), Some(7L * 86400), outputPrefix = Some("a")),
      ResolvedView("b", fDf, Seq("key" -> "key"), "fts", None,
        Seq("val"), None, outputPrefix = Some("b")),
      ResolvedView("c", fDf.filter($"val" % 2 === 0), Seq("key" -> "key"),
        "fts", Some("created"), Seq("val"), Some(86400L),
        outputPrefix = Some("c")))
    val fused = PointInTimeJoin.joinFused(eDf, "event_ts", views, rowIdCol = Some("eid"))
    val ref = PointInTimeJoin.join(eDf, "event_ts", views, rowIdCol = Some("eid"))
    assert(fused.columns.toSeq == ref.columns.toSeq)
    assert(fused.exceptAll(ref).isEmpty && ref.exceptAll(fused).isEmpty)
    assert(fused.count() == 300)
  }

  test("joinFused groups on the CANONICAL source plan: re-loads of one table fuse, different join keys do not") {
    val dir = sf()
    val entity = graft.sources.ParquetTables.load(spark, dir + "/events.parquet")
      .select($"event_id", $"user_id", $"ts")
    def ordersLoad() = graft.sources.ParquetTables.load(spark, dir + "/orders.parquet")
    // v1 and v2: SEPARATE load() calls of the same path, same keys/ts
    // — must fuse (reference equality would miss this); v3: same
    // table but joined on a different entity column — must NOT fuse.
    val v1 = ResolvedView("a", ordersLoad(), Seq("user_id" -> "o_custkey"),
      "o_orderdate", features = Seq("o_totalprice"), outputPrefix = Some("a"))
    val v2 = ResolvedView("b", ordersLoad(), Seq("user_id" -> "o_custkey"),
      "o_orderdate", features = Seq("o_orderstatus"), outputPrefix = Some("b"),
      predicate = Some($"o_orderstatus" =!= "X"))
    val v3 = ResolvedView("c", ordersLoad(), Seq("event_id" -> "o_orderkey"),
      "o_orderdate", features = Seq("o_totalprice"), outputPrefix = Some("c"))
    val df = PointInTimeJoin.joinFused(
      entity, "ts", Seq(v1, v2, v3), rowIdCol = Some("event_id"))
    val plan = df.queryExecution.executedPlan.toString
    val ordersScans = plan.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("orders.parquet"))
    withClue(plan.take(3000)) {
      assert(ordersScans == 2) // {v1,v2} fused into one scan; v3 separate
    }
    // and the fused result still matches the foldLeft reference
    val ref = PointInTimeJoin.join(
      entity, "ts", Seq(v1, v2, v3), rowIdCol = Some("event_id"))
    assert(df.columns.toSeq == ref.columns.toSeq)
    assert(df.exceptAll(ref).isEmpty && ref.exceptAll(df).isEmpty)
  }

  test("shouldFuse: true only when a source is shared AND all features are MaxByAgg-orderable") {
    val f = Seq((1L, ts("2024-01-01 00:00:00"), 1.0)).toDF("key", "fts", "x")
    def v(name: String, src: org.apache.spark.sql.DataFrame, feat: String) =
      ResolvedView(name, src, Seq("key" -> "key"), "fts", features = Seq(feat))
    // two views over the SAME frame share a canonical source → fuse
    assert(PointInTimeJoin.shouldFuse(Seq(v("a", f, "x"), v("b", f, "x"))))
    // disjoint sources: fusing buys nothing → foldLeft path
    val g = Seq((1L, ts("2024-01-01 00:00:00"), 2.0)).toDF("key", "fts", "x")
      .filter($"x" > 0)
    assert(!PointInTimeJoin.shouldFuse(Seq(v("a", f, "x"), v("b", g, "x"))))
    // a single view never fuses
    assert(!PointInTimeJoin.shouldFuse(Seq(v("a", f, "x"))))
    // an unorderable (map-typed) feature disqualifies the whole set —
    // max(struct(..., map)) cannot run; joinFused also fails fast on it
    val m = f.withColumn("mv",
      org.apache.spark.sql.functions.map(
        org.apache.spark.sql.functions.lit("k"), $"x"))
    val withMap = Seq(v("a", m, "x"), v("b", m, "mv"))
    assert(!PointInTimeJoin.shouldFuse(withMap))
    val err = intercept[IllegalArgumentException] {
      PointInTimeJoin.joinFused(entity, "event_ts", withMap, rowIdCol = Some("eid"))
    }
    assert(err.getMessage.contains("unorderable"))
  }

  test("joinFused 8-view plan: per-SOURCE candidate joins, aggs, and stitches (2 groups, not 8 views)") {
    val fused = graft.SparkEntry.queries("pit_manyviews_fused")(spark, sf())
    val ref = graft.SparkEntry.queries("pit_manyviews")(spark, sf())
    // row-for-row identical to the foldLeft reference (which the
    // DuckDB oracle checks independently)
    assert(fused.columns.toSeq == ref.columns.toSeq)
    assert(fused.exceptAll(ref).isEmpty && ref.exceptAll(fused).isEmpty)
    val plan = fused.queryExecution.executedPlan.toString
    val hashEx = "Exchange hashpartitioning".r.findAllMatchIn(plan).size
    val stitchJoins =
      "SortMergeJoin \\[__graft_row_id".r.findAllMatchIn(plan).size +
        "BroadcastHashJoin \\[__graft_row_id".r.findAllMatchIn(plan).size
    // the 8 views span exactly TWO sources (orders, customer): the
    // fused shape is per-source, independent of view count
    withClue(s"hashExchanges=$hashEx stitchJoins=$stitchJoins\n" + plan.take(4000)) {
      // one candidate join + one agg + one stitch per GROUP: the
      // unfused plan has 8 stitch joins and ~9 hash exchanges (see the
      // many-view test above); fused is 2 of each, at ANY view count
      assert(stitchJoins == 2)
      assert(hashEx <= 5)
      assert(!plan.contains("CartesianProduct"))
      assert(!plan.contains("BroadcastNestedLoopJoin"))
      // per-group candidate joins still broadcast the pruned side
      assert("BroadcastHashJoin".r.findAllMatchIn(plan).size >= 2)
      // candidate fusion: the orders table is scanned ONCE for all six
      // order views (the foldLeft plan scans it six times)
      assert(plan.linesIterator.count(l =>
        l.contains("FileScan parquet") && l.contains("orders.parquet")) == 1)
    }
  }
}
