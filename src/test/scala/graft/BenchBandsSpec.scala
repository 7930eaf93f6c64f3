package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The sweep's self-adjudication: per-query [p10, p90] bands from the
  * committed per-round bench lines, so a host-load spike that past
  * rounds already measured stops consuming a manual adjudication
  * cycle (the bm25_batch recurrence, r12–r13). */
class BenchBandsSpec extends AnyFunSuite with Matchers {

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
    val bands = Bench.benchHistoryBands(dir)
    bands.keySet shouldBe Set("bm25_batch", "rare_q")
    val (lo, hi) = bands("bm25_batch")
    lo should be >= 1.4
    lo should be <= 1.7
    hi should be >= 3.35 // p90 reaches the committed spike region
    // a repeat of the adjudicated 4.0s spike is IN band — the
    // adjudication the verdict asked to stop repeating...
    (4.022 <= hi * 1.25) shouldBe true
    // ...but a genuine regression (8s, beyond anything committed) is out.
    (8.0 > hi * 1.25) shouldBe true
  }

  test("out_of_band flags the HIGH side only — improvements never flag") {
    // r14 verdict #5: the driver's latest_dedup 0.833s entry was a
    // LOW-side (faster-than-history) flag that cost an adjudication
    // cycle. The contract now: below-p10 values are improvements, not
    // out_of_band entries; only beyond-p90+25% regressions flag,
    // slowest first.
    val bands = Map(
      "latest_dedup" -> (1.0, 2.0), // history [p10, p90]
      "big_q" -> (4.0, 6.0),
      "steady_q" -> (1.0, 1.5))
    val results = Map(
      "latest_dedup" -> 0.833, // far below p10 — an improvement
      "big_q" -> 9.0,          // beyond 6.0 * 1.25 — genuine regression
      "steady_q" -> 1.6,       // above p90 but inside the 25% tolerance
      "no_history_q" -> 99.0)  // no band — never flags
    Bench.outOfBandHigh(results, bands) shouldBe Seq("big_q" -> 9.0)
    // Sub-second values never flag even above their band: the
    // committed maps elide cheap queries, so a sub-second query's
    // band is stale by construction (the r15 latest_dedup case —
    // 0.857 s against three rounds-2–5 samples) and the delta is
    // sweep noise, not a regression.
    Bench.outOfBandHigh(
      Map("latest_dedup" -> 0.857), Map("latest_dedup" -> (0.46, 0.55))
    ) shouldBe Seq.empty
  }

  test("fewer than 3 samples -> no band; empty dir -> empty map") {
    val dir = writeRounds(Seq(
      """{"queries":{"q_once":1.0}}""",
      """{"queries":{"q_once":1.1}}"""))
    Bench.benchHistoryBands(dir) shouldBe Map.empty
    Bench.benchHistoryBands(
      java.nio.file.Files.createTempDirectory("graft-empty").toFile) shouldBe
      Map.empty
  }
}
