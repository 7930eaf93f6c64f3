package graft.queries

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Sanity for queries whose values can't be oracle-checked exactly. */
class ExtendedQueriesSpec extends SparkSpec with Matchers {

  test("approx sketches land within the error bounds the query asserts") {
    // The query itself computes sketch-vs-exact error-bound booleans
    // (so the DuckDB oracle can state them as literals); here: every
    // group must report both sketches within bounds on sf0.001.
    val rows = graft.SparkEntry.queries("q16_approx_sketches")(spark, sf()).collect()
    rows.length should be > 0
    rows.foreach { r =>
      withClue(s"${r.getString(0)}: ") {
        r.getBoolean(1) shouldBe true // hll_within_5pct
        r.getBoolean(2) shouldBe true // p50_within_5pct
        r.getLong(3) should be > 0L   // exact_custs
        r.getLong(4) should be > 0L   // n
      }
    }
  }
}
