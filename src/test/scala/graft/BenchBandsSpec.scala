package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The sweep's self-adjudication: per-query [p10, p90] bands from the
  * committed per-round bench lines, so a host-load spike that past
  * rounds already measured stops consuming a manual adjudication
  * cycle (the bm25_batch recurrence, r12–r13). Round 16 added the
  * staleness gate (bands whose newest sample is older than
  * [[Bench.BandFreshRounds]] rounds never flag — the latest_dedup
  * phantom class, r15 twice) and calibration normalization (a loaded
  * host's uniform inflation is divided out before the band compare).
  */
class BenchBandsSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("calibJob survives ANSI mode at the sweep's full row count") {
    // The unmasked sum(xxhash64) overflowed Long at 256M rows under
    // Spark 4 default ANSI and ABORTED the whole sweep (r16 opening
    // run — the JSON line never printed, driver would record rc=1).
    // Run the real canary body at the real row count: it must return,
    // not throw.
    noException should be thrownBy Bench.calibJob(spark, 4)
  }

  private def writeRounds(lines: Seq[String]): java.io.File = {
    val dir = java.nio.file.Files.createTempDirectory("graft-bands").toFile
    lines.zipWithIndex.foreach { case (l, i) =>
      java.nio.file.Files.writeString(
        new java.io.File(dir, f"BENCH_r${i + 1}%02d.json").toPath, l)
    }
    dir
  }

  test("bands are p10-p90 over rounds; <3 samples and junk files are skipped") {
    // The REAL bm25_batch history shape (r4-r13): ~1.5-1.8 with the
    // two adjudicated sweep-context spikes. The band must make a
    // repeat of the spike class in-band (p90 lands on the first
    // spike; the ±25% tolerance covers the second) while a genuine
    // regression flags. Half the files use the driver's wrapped form
    // ({"parsed": {...}}), half the raw line — both must parse.
    val vals = Seq(1.555, 1.65, 1.784, 1.678, 1.845, 1.494, 1.733,
      1.604, 3.354, 4.022)
    val rounds = vals.zipWithIndex.map { case (v, i) =>
      val inner = s"""{"metric":"total","value":9.9,"queries":{"bm25_batch":$v,"rare_q":1.0}}"""
      if (i % 2 == 0) s"""{"n":14,"rc":0,"parsed":$inner}""" else inner
    }
    val dir = writeRounds(rounds :+ "{not json")
    val hist = Bench.benchHistory(dir)
    hist.bands.keySet shouldBe Set("bm25_batch", "rare_q")
    hist.latestRound shouldBe 10
    val b = hist.bands("bm25_batch")
    b.lo should be >= 1.4
    b.lo should be <= 1.7
    b.hi should be >= 3.35 // p90 reaches the committed spike region
    b.latestRound shouldBe 10 // sampled in every round — fresh
    // a repeat of the adjudicated 4.0s spike is IN band — the
    // adjudication the verdict asked to stop repeating...
    (4.022 <= b.hi * 1.25) shouldBe true
    // ...but a genuine regression (8s, beyond anything committed) is out.
    (8.0 > b.hi * 1.25) shouldBe true
  }

  test("out_of_band flags the HIGH side only — improvements never flag") {
    // r14 verdict #5: the driver's latest_dedup 0.833s entry was a
    // LOW-side (faster-than-history) flag that cost an adjudication
    // cycle. The contract now: below-p10 values are improvements, not
    // out_of_band entries; only beyond-p90+25% regressions flag,
    // slowest first.
    val hist = Bench.BenchHistory(Map(
      "latest_dedup" -> Bench.Band(1.0, 2.0, 15), // fresh bands
      "big_q" -> Bench.Band(4.0, 6.0, 15),
      "steady_q" -> Bench.Band(1.0, 1.5, 15)), None, 15)
    val results = Map(
      "latest_dedup" -> 0.833, // far below p10 — an improvement
      "big_q" -> 9.0,          // beyond 6.0 * 1.25 — genuine regression
      "steady_q" -> 1.6,       // above p90 but inside the 25% tolerance
      "no_history_q" -> 99.0)  // no band — never flags
    Bench.outOfBandHigh(results, hist) shouldBe Seq("big_q" -> 9.0)
  }

  test("stale bands never flag; fresh sub-second bands CAN flag") {
    // The r15 phantom class: latest_dedup 1.044 s and
    // stats_profile_quantiles 1.025 s flagged against rounds-2–5
    // bands that newer sweeps elide (line budget) — just ABOVE the
    // r15 sub-second floor. The staleness gate kills the whole class:
    // a band whose newest sample is more than BandFreshRounds behind
    // the newest committed round is judged stale regardless of the
    // current value.
    val stale = Bench.BenchHistory(
      Map("latest_dedup" -> Bench.Band(0.46, 0.55, 5)), None, 15)
    Bench.outOfBandHigh(Map("latest_dedup" -> 1.044), stale) shouldBe
      Seq.empty
    // ...while the r15 floor's OWN gap (ADVICE r15 #1) is closed: a
    // sub-second query that DID land in a recent committed round has
    // a fresh band, and a genuine ~3x regression of it flags again.
    val fresh = Bench.BenchHistory(
      Map("cheap_q" -> Bench.Band(0.28, 0.33, 14)), None, 15)
    Bench.outOfBandHigh(Map("cheap_q" -> 0.95), fresh) shouldBe
      Seq("cheap_q" -> 0.95)
    // Boundary: exactly BandFreshRounds behind still counts as fresh.
    val edge = Bench.BenchHistory(
      Map("q" -> Bench.Band(1.0, 2.0, 10)), None, 15)
    Bench.outOfBandHigh(Map("q" -> 9.0), edge) shouldBe Seq("q" -> 9.0)
  }

  test("calibration ratio forgives loaded-host inflation, never inflates") {
    val hist = Bench.BenchHistory(
      Map("q" -> Bench.Band(4.0, 6.0, 15)), None, 15)
    // 8.2 s raw is out of band (6.0 * 1.25 = 7.5)...
    Bench.outOfBandHigh(Map("q" -> 8.2), hist) shouldBe Seq("q" -> 8.2)
    // ...but with the calibration canary showing the host 1.2x slower
    // than committed history, the normalized 6.83 s is in band — the
    // uniform-drift adjudication rounds 14-15 did by hand.
    Bench.outOfBandHigh(Map("q" -> 8.2), hist, calibRatio = 1.2) shouldBe
      Seq.empty
    // A FASTER-than-history host (ratio < 1) must not inflate walls
    // into phantom flags: 7.0 s stays in band at ratio 0.8.
    Bench.outOfBandHigh(Map("q" -> 7.0), hist, calibRatio = 0.8) shouldBe
      Seq.empty
  }

  test("calib history: median over committed rounds, absent when unrecorded") {
    val dir = writeRounds(Seq(
      """{"queries":{"q":1.0},"calib":0.50}""",
      """{"parsed":{"queries":{"q":1.1},"calib":0.54}}""",
      """{"queries":{"q":1.2},"calib":0.52}""",
      """{"queries":{"q":1.3}}""")) // pre-calib round contributes none
    val hist = Bench.benchHistory(dir)
    hist.calibMedian shouldBe Some(0.52)
    hist.latestRound shouldBe 4
    // No committed calib at all -> None (first calibrated round
    // reports no ratio and normalizes by 1.0).
    Bench.benchHistory(writeRounds(Seq("""{"queries":{"q":1.0}}""")))
      .calibMedian shouldBe None
  }

  test("fewer than 3 samples -> no band; empty dir -> empty history") {
    val dir = writeRounds(Seq(
      """{"queries":{"q_once":1.0}}""",
      """{"queries":{"q_once":1.1}}"""))
    Bench.benchHistory(dir).bands shouldBe Map.empty
    val empty = Bench.benchHistory(
      java.nio.file.Files.createTempDirectory("graft-empty").toFile)
    empty.bands shouldBe Map.empty
    empty.latestRound shouldBe 0
  }
}
