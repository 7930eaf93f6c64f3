package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Hash-based, not
  * `rand()`: the sample is a pure function of the key, so it is
  * reproducible across runs/engines, stable under retries and
  * re-partitioning, and consistent between correlated tables sampled on
  * the same key (sample `users` at 10% and every other table filtered
  * by the same key predicate stays referentially intact). All plain
  * column expressions — pushdown-friendly, zero shuffle for the
  * unstratified form.
  */
object Sampling {

  /** Multiplicative-hash position of a key in [0, buckets) — kept
    * SQL-portable (same arithmetic runs in any engine) rather than
    * xxhash64 so oracles and downstream systems can reproduce it.
    * The key reduces mod p BEFORE the multiply: the product then fits
    * a long for any key (a raw key*2654435761 overflows above ~3.5e9 —
    * an ArithmeticException under ANSI mode, or a sign-flipped hash
    * that defeats every rate filter), and pmod keeps negative keys in
    * range. Identical values for keys in [0, p). */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    (pmod(key.cast("long"), lit(1000003L)) * lit(2654435761L) % lit(1000003L)) % buckets

  /** Keep ~pct% of rows, deterministically by key. */
  def deterministicSample(df: DataFrame, keyCol: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(keyCol)) < pct)

  /** Weighted mixture sampling: per-stratum keep percentages (the
    * data-mixture knob of a pre-training corpus — e.g. upsample rare
    * languages, downsample boilerplate-heavy sources). Same portable
    * hash as [[deterministicSample]], so the mixture is reproducible
    * and referentially consistent across tables keyed the same way;
    * strata not named in `rates` keep `defaultPct`. */
  def mixtureSample(
      df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Int], defaultPct: Int = 0): DataFrame = {
    val pct = rates.foldLeft(lit(defaultPct)) { case (acc, (s, p)) =>
      when(col(strataCol) === s, lit(p)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol)) < pct)
  }

  /** Deterministic corpus shuffle: assign every row a (shard, pos)
    * address in a pseudo-random but reproducible global order — the
    * "shuffle the corpus before training" step, without `rand()` and
    * without a global sort. Rows hash to `shards` shards; within a
    * shard they rank by a second hash (key tie-break makes the order
    * total). One shuffle on the shard id; each shard sorts
    * independently, so at 100 TB the sort is corpus/shards per task —
    * size `shards` to the cluster, and no single-partition global
    * window ever exists. Readers stream shards in (shard, pos) order
    * and see a stable, engine-reproducible permutation. */
  def shuffleAssign(df: DataFrame, keyCol: String, shards: Int): DataFrame = {
    require(shards > 0)
    val ord = hashBucket(col(keyCol), 1000003)
    val w = Window.partitionBy(col("shard")).orderBy(ord, col(keyCol))
    df.withColumn("shard", hashBucket(col(keyCol), shards))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Exactly-N-per-stratum sample (class balancing): rank rows within
    * each stratum by hash of the key (then key, for total order) and
    * keep the first n. One shuffle on the strata columns. */
  def stratifiedTopN(
      df: DataFrame, strataCols: Seq[String], keyCol: String, n: Int): DataFrame = {
    val order = hashBucket(col(keyCol), 1000003)
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(order, col(keyCol))
    df.withColumn("__graft_rk", row_number().over(w))
      .filter(col("__graft_rk") <= n)
      .drop("__graft_rk")
  }
}
