package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge DataFrames. Connected
  * components (min-label propagation) live in [[Dedup.clusters]]; this
  * hosts the rank-propagation family.
  */
object Graph {

  /** Weighted PageRank with a FIXED iteration count — the importance
    * score over an entity graph (domain authority for corpus weighting,
    * influence over an interaction graph).
    *
    * Semantics (deterministic, engine-portable):
    *   - `rank_0 = 1/n` for every node (n = |src ∪ dst|);
    *   - `rank_{k+1}(v) = (1-d)/n + d · Σ_{(u,v,w)} rank_k(u) · w / outw(u)`
    *     where `outw(u)` is u's total out-weight;
    *   - dangling mass is NOT redistributed (ranks need not sum to 1) —
    *     the usual simplification when ranks are used ordinally.
    *
    * Scale shape: each iteration is one shuffle — edges join the
    * 2-column rank table on `src` (broadcast when small, hash join
    * otherwise) and hash-aggregate on `dst` with map-side partial sums.
    * No driver-side collect; the per-iteration `localCheckpoint`
    * truncates lineage exactly like the connected-components loop
    * (iteration count is fixed and small, so there is no convergence
    * `count()` either). Contributions accumulate through
    * DECIMAL(38,18) — order-free sums, bit-identical ranks under any
    * partitioning.
    */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String, weightCol: String,
      iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "pageRank needs at least one iteration")
    // Weights and out-weight totals stay in exact DECIMAL (a double
    // sum would be partition-order-dependent); the per-edge ratio is
    // the single double op, identical on every engine.
    val e = edges.select(
      col(srcCol).as("src"), col(dstCol).as("dst"),
      col(weightCol).cast("decimal(28,6)").as("w"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true) // consumed per iteration + the n aggregate
    val nRow = broadcast(nodes.agg(count(lit(1)).cast("double").as("__n")))
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("ow"))
      .localCheckpoint(true)
    val teleport = 1.0 - damping

    var rank = nodes.crossJoin(nRow)
      .select(col("node"), (lit(1.0) / col("__n")).as("rank"))
      .localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(rank.withColumnRenamed("node", "src"), Seq("src"))
        .join(outw, Seq("src"))
        .select(col("dst"),
          ((col("rank") * col("w").cast("double")) / col("ow").cast("double"))
            .cast("decimal(38,18)").as("c"))
      val summed = contrib.groupBy(col("dst")).agg(sum(col("c")).as("cs"))
      rank = nodes.crossJoin(nRow)
        .join(summed.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) / col("__n") + lit(damping) *
            coalesce(col("cs"), lit(0).cast("decimal(38,18)")).cast("double"))
            .as("rank"))
        .localCheckpoint(true)
    }
    rank
  }
}
