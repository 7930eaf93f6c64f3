package graft.ops

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class GraphSpec extends SparkSpec with Matchers {

  private def ranks(edges: Seq[(String, String, Long)], iters: Int): Map[String, Double] = {
    import spark.implicits._
    Graph.pageRank(edges.toDF("src", "dst", "w"), "src", "dst", "w", iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  /** Naive reference: same formula, same fixed iterations. */
  private def naive(edges: Seq[(String, String, Long)], iters: Int): Map[String, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toDouble
    val outw = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum.toDouble).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _, w) => r(s) * w.toDouble / outw(s) }.sum).toMap
      r = nodes.map(v => v -> ((1.0 - 0.85) / n + 0.85 * in.getOrElse(v, 0.0))).toMap
    }
    r
  }

  test("pageRank survives a zero-out-weight src (dangling semantics, no ANSI abort)") {
    // 'z' has one out-edge with weight 0: its summed out-weight is 0,
    // so its contribution is undefined. The run must not abort
    // (DIVIDE_BY_ZERO under ANSI); 'z' behaves like a dangling node —
    // ranks of everything else match the same graph with z's edge
    // dropped entirely.
    val edges = Seq(
      ("a", "b", 2L), ("b", "a", 1L), ("z", "a", 0L))
    val got = ranks(edges, 3)
    // Reference over the same 3-node set with z contributing nothing.
    val n = 3.0
    var r = Map("a" -> 1.0 / n, "b" -> 1.0 / n, "z" -> 1.0 / n)
    for (_ <- 1 to 3) {
      r = Map(
        "a" -> ((1.0 - 0.85) / n + 0.85 * r("b")),
        "b" -> ((1.0 - 0.85) / n + 0.85 * r("a")),
        "z" -> ((1.0 - 0.85) / n))
    }
    got.keySet shouldBe Set("a", "b", "z")
    for ((k, v) <- r) got(k) shouldBe v +- 1e-9
  }

  test("pageRank matches a naive in-memory reference on a small weighted graph") {
    val edges = Seq(
      ("a", "b", 2L), ("a", "c", 1L), ("b", "c", 1L),
      ("c", "a", 1L), ("d", "c", 3L)) // d is a source-only node; a<-c cycle
    for (iters <- Seq(1, 3)) {
      val got = ranks(edges, iters)
      val want = naive(edges, iters)
      got.keySet shouldBe want.keySet
      for ((k, v) <- want) got(k) shouldBe v +- 1e-9
    }
  }

  test("pageRank durable scratch mode: bit-identical ranks at any checkpointEvery; run dir registered for exit cleanup") {
    import spark.implicits._
    val edges = Seq(
      ("a", "b", 2L), ("a", "c", 1L), ("b", "c", 1L),
      ("c", "a", 1L), ("d", "c", 3L)).toDF("src", "dst", "w")
    val scratch = java.nio.file.Files.createTempDirectory("graft-pr-scratch").toString
    val baseline = Graph.pageRank(edges, "src", "dst", "w", 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for (k <- Seq(1, 2, 7)) { // k > iterations: only the final truncation
      val durable = Graph.pageRank(edges, "src", "dst", "w", 5,
        scratchDir = Some(scratch), checkpointEvery = k)
      val got = durable.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      got shouldBe baseline // bit-identical, not approximate
      // the returned frame reads durable parquet, not block-manager rows
      durable.inputFiles.exists(_.contains("rank-5")) shouldBe true
    }
    // the k=2 run truncated mid-loop at rank-2/rank-4 and at the end
    val runDirs = new java.io.File(scratch).listFiles().map(_.getName)
    runDirs.foreach(_ should startWith ("graft-pagerank-"))
    val k2 = runDirs.flatMap(d =>
      new java.io.File(s"$scratch/$d").listFiles().map(_.getName))
    k2 should contain allOf ("nodes", "outw", "rank-0", "rank-5")
    intercept[IllegalArgumentException] {
      Graph.pageRank(edges, "src", "dst", "w", 5, checkpointEvery = 0)
    }.getMessage should include ("checkpointEvery")
  }

  test("pageRank: sink nodes keep teleport mass; ranks order by link weight") {
    // everyone points at 'hub'; hub points nowhere (dangling)
    val edges = Seq(("a", "hub", 1L), ("b", "hub", 1L), ("c", "hub", 1L))
    val got = ranks(edges, 2)
    got("hub") should be > got("a")
    got("a") shouldBe got("b")
    // teleport floor: every node's rank >= (1-d)/n
    got.values.min should be >= (0.15 / 4) - 1e-12
  }
}
