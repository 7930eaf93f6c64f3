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

  /** Key cast shared by every sampling hash. Under non-ANSI mode a
    * non-numeric key (UUID string, struct …) casts to NULL, every
    * downstream comparison goes NULL, and the sample SILENTLY empties
    * (or, in [[negativeSample]], emits NULL negatives) — fail fast
    * instead: a NULL long from a non-NULL key is a type error, not
    * data. NULL keys stay NULL (absence, handled by each caller). */
  private def longKey(key: Column, op: String): Column = {
    val k = key.cast("long")
    when(key.isNotNull && k.isNull,
      raise_error(concat(
        lit(s"$op: key is not castable to long (got value '"),
        key.cast("string"), lit("') — sample keys must be numeric"))))
      .otherwise(k)
  }

  /** Multiplicative-hash position of a key in [0, buckets) — kept
    * SQL-portable (same arithmetic runs in any engine) rather than
    * xxhash64 so oracles and downstream systems can reproduce it.
    * The key reduces mod p BEFORE the multiply: the product then fits
    * a long for any key (a raw key*2654435761 overflows above ~3.5e9 —
    * an ArithmeticException under ANSI mode, or a sign-flipped hash
    * that defeats every rate filter), and pmod keeps negative keys in
    * range. Identical values for keys in [0, p). Non-castable keys
    * fail fast via [[longKey]]; NULL keys hash to NULL. */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    (pmod(longKey(key, "hashBucket"), lit(1000003L)) * lit(2654435761L) % lit(1000003L)) % buckets

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

  /** Temperature-based domain rebalancing (the multilingual /
    * multi-source mixture rule p_d ∝ n_d^alpha): compute per-stratum
    * keep rates that reshape the corpus toward the alpha-tempered
    * distribution at ~`targetRows` total, then keep rows
    * deterministically by key hash. alpha=1 preserves proportions,
    * alpha→0 flattens toward uniform (upsampling-by-rate is capped at
    * keep-all). Rates are a pure function of the stratum counts, so the
    * sample is reproducible and referentially consistent.
    *
    * Scale shape: one map-side-combined count per stratum (a
    * strata-sized frame), rate arithmetic on that tiny frame, and a
    * broadcast join back — the corpus itself is touched by exactly one
    * scan + filter. The tempered weights go through 6-dp DECIMAL so
    * the normalizing sum is order-independent (bit-identical across
    * engines/partitionings); the final rate comparison is double.
    */
  def temperatureSample(
      df: DataFrame, keyCol: String, strataCol: String,
      alpha: Double, targetRows: Long): DataFrame = {
    require(alpha >= 0.0 && targetRows > 0)
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n_d"))
      .withColumn("w_d",
        round(pow(col("n_d").cast("double"), lit(alpha)), 6)
          .cast("decimal(38,6)"))
    val wTot = counts.agg(sum(col("w_d")).as("w_tot"))
    // Both operands leave DECIMAL before the divide: decimal/decimal
    // rounding rules differ across engines, IEEE double division does
    // not (and the decimal→double casts see identical exact values).
    val rates = counts.crossJoin(broadcast(wTot))
      .withColumn("keep_rate",
        least(lit(1.0),
          col("w_d").cast("double") / col("w_tot").cast("double")
            * targetRows / col("n_d")))
      .select(col(strataCol).as("__graft_stratum"), col("keep_rate"))
    // Null-safe stratum match: groupBy counted NULL as a stratum, so
    // the rate join must honor it too (a plain equi-join would silently
    // drop every NULL-stratum row). Output schema == input schema.
    df.join(broadcast(rates),
        col(strataCol) <=> col("__graft_stratum"))
      .filter(hashBucket(col(keyCol), 1000003).cast("double")
        < col("keep_rate") * 1000003.0)
      .select(df.columns.map(col): _*)
  }

  /** Greedy budget selection: order rows by `scoreCol` descending (key
    * tie-break) and keep the maximal prefix whose running `costCol` sum
    * stays within `budget` — "fill the token budget with the
    * best-scoring documents". Emits the kept rows with their running
    * total `cum_cost`.
    *
    * Scale shape: a naive `SUM(cost) OVER (ORDER BY score)` compiles
    * to a SinglePartition exchange — the whole corpus through one
    * task. Instead this runs the classic two-phase distributed prefix
    * sum: (1) coarse-bucket rows by score VALUE range (bounds from one
    * 2-value driver aggregate — no sampling, so bucketing is
    * deterministic); (2) aggregate per-bucket cost totals (a
    * `buckets`-sized frame) and window THOSE into bucket offsets;
    * (3) per-bucket running sums — each bucket sorts independently —
    * plus the broadcast offset. The only single-partition window runs
    * over `buckets` rows, never over data.
    */
  def budgetSelect(
      df: DataFrame, keyCol: String, scoreCol: String, costCol: String,
      budget: Long, buckets: Int = 256): DataFrame = {
    require(budget > 0 && buckets > 0)
    // NULL scores carry no priority and are excluded UP FRONT: left
    // in, least()'s null-skip would collapse them into the LAST value
    // bucket (floor of a NULL division is NULL, least(lit, NULL) =
    // lit), where they'd sort after real scores (desc = NULLS LAST)
    // yet still count toward that bucket's total and be selectable
    // under a large budget — arbitrary-cost rows admitted with no
    // defined priority.
    val scored = df.filter(col(scoreCol).isNotNull)
    // Ascending on the NEGATED score: bucket 0 holds the highest
    // scores, so bucket order == selection order.
    OpsUtil.rangeBucketOffsets(
      scored, -col(scoreCol).cast("double"), col(costCol), buckets) match {
      case None => df.withColumn("cum_cost", lit(0L)).limit(0)
      case Some((rows, offsets)) =>
        // Explicit ROWS frame: the default RANGE frame would pool
        // duplicate (score, key) rows into one running-total step.
        val w = Window.partitionBy(col("__graft_rb"))
          .orderBy(col(scoreCol).desc, col(keyCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        rows.join(broadcast(offsets), Seq("__graft_rb"))
          .withColumn("cum_cost", col("rb_off") + sum(col(costCol)).over(w))
          .filter(col("cum_cost") <= budget)
          .drop("__graft_rb", "rb_off")
    }
  }

  /** Weighted sample WITHOUT replacement, size n, deterministic
    * (Efraimidis–Spirakis A-ES, exponential-keys form): each row draws
    * a pseudo-uniform u ∈ (0, 1) from the portable key hash and ranks
    * by ln(u)/w descending (order-equivalent to u^(1/w) descending) —
    * inclusion probability proportional to the weight column, no
    * replacement, reproducible across runs and engines.
    *
    * Exactness: ln(u) is rounded to 12 dp — a grid ~100× coarser than
    * libm's cross-implementation last-ulp wobble on [-14, 0), so every
    * engine pins the same value — and then divided by the RAW weight
    * (IEEE division of identical operands is bit-identical
    * everywhere). Dividing after rounding preserves relative spread at
    * any weight magnitude; rounding the powered priority instead would
    * collapse u^(1/w) (which lives within 13.8/w of 1.0) into a
    * handful of ties for large weights and silently bias the draw
    * toward low keys. Key tie-break for the residual exact ties.
    *
    * Scale shape: one per-row projection + TakeOrderedAndProject —
    * per-partition top-n heaps, no global sort, no shuffle of the
    * corpus. Rows with NULL or non-positive weight are excluded (they
    * have no defined inclusion probability). */
  def weightedSample(
      df: DataFrame, keyCol: String, weightCol: String, n: Int): DataFrame = {
    require(n > 0)
    val u = (hashBucket(col(keyCol), 1000003).cast("double") + 1.0) / 1000004.0
    val priority = round(log(u), 12) / col(weightCol).cast("double")
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__graft_pri", priority)
      .orderBy(desc("__graft_pri"), col(keyCol))
      .limit(n)
      .drop("__graft_pri")
  }

  /** Exactly-N global sample, deterministic by key: rank every row by
    * the portable hash (key tie-break) and keep the first n — the
    * fixed-size eval-set / human-review draw. Compiles to
    * TakeOrderedAndProject (per-partition top-n + merge of n-row
    * heaps), never a global sort. */
  def exactNSample(df: DataFrame, keyCol: String, n: Int): DataFrame = {
    require(n > 0)
    df.orderBy(hashBucket(col(keyCol), 1000003), col(keyCol)).limit(n)
  }

  /** Leakage-safe train/eval split: every member of a near-duplicate
    * cluster lands in the SAME split (otherwise eval examples have
    * near-copies in train and metrics lie). `clusters` is
    * [[graft.ops.Dedup.clusters]] output — (id, cluster-representative)
    * for documents that have at least one near-dup; singletons fall
    * back to their own id as group key. The split decision hashes the
    * GROUP key, so it is deterministic, engine-reproducible, and
    * cluster-atomic by construction.
    *
    * Scale shape: one equi-join on the unique id (the clusters side
    * holds only duplicate members — a small fraction of the corpus, so
    * AQE broadcasts it in practice) and a per-row hash projection. */
  def leakageSafeSplit(
      df: DataFrame, idCol: String, clusters: DataFrame,
      trainPct: Int): DataFrame = {
    require(trainPct >= 0 && trainPct <= 100)
    val c = clusters.select(col("id").as(idCol), col("cluster"))
    df.join(c, Seq(idCol), "left")
      .withColumn("group_key", coalesce(col("cluster"), col(idCol)))
      .withColumn("split",
        when(hashBucket(col("group_key")) < trainPct, lit("train"))
          .otherwise(lit("eval")))
      .drop("cluster")
  }

  /** Leakage-safe TEMPORAL train/eval split with an embargo gap and
    * optional cold-start purging — the time-series counterpart of
    * [[leakageSafeSplit]] (which guards against near-duplicate leakage;
    * this guards against future-information and entity-memorization
    * leakage). Every row is labeled, never silently dropped:
    *
    *   - `train`: ts < `trainEnd`
    *   - `eval`:  ts ≥ `evalStart`
    *   - `embargo`: the gap between the two (and NULL timestamps —
    *     a row with no event time belongs to neither side), excluded
    *     from both sides so labels/features whose windows straddle the
    *     boundary cannot leak (the purged-split idea from financial
    *     ML; pass `evalStart = trainEnd` for no gap)
    *   - `purged` (only when `coldStartEval`): eval rows of entities
    *     that also appear in train — keeping them would score the
    *     model on entities it memorized, so cold-start evaluation
    *     labels them out; callers filter on `split`.
    *
    * Callers must pass `evalStart` ≥ `trainEnd`. Bounds are columns,
    * so the check cannot run at build time; instead the split
    * expression leads with a `raise_error` branch that fails the job
    * on an inverted pair — for the common literal bounds Catalyst
    * constant-folds the guard away, and for column bounds a silently
    * mislabeled leakage-sensitive split would be worse than a failed
    * one (the repo-wide fail-fast rule: sigLengthGuard, longKey).
    *
    * Scale shape: the labeling is one scan + projection (no shuffle).
    * `coldStartEval` adds one DISTINCT over train entities (map-side
    * combined, bounded by entity cardinality) and one null-safe
    * equi-join back on the entity key — AQE broadcasts the entity set
    * while it is small; there is no window and no global sort. */
  def temporalSplit(
      df: DataFrame, entityCol: String, tsCol: String,
      trainEnd: Column, evalStart: Column,
      coldStartEval: Boolean = false): DataFrame = {
    val base = df.withColumn("split",
      when(evalStart < trainEnd, raise_error(concat(
          lit("temporalSplit: evalStart < trainEnd ("),
          evalStart.cast("string"), lit(" < "),
          trainEnd.cast("string"), lit(")"))).cast("string"))
        .when(col(tsCol) < trainEnd, lit("train"))
        .when(col(tsCol) >= evalStart, lit("eval"))
        .otherwise(lit("embargo")))
    if (!coldStartEval) base
    else {
      val trainEntities = base.filter(col("split") === "train")
        .select(col(entityCol).as("__graft_te")).distinct()
      base.join(trainEntities, base(entityCol) <=> col("__graft_te"), "left")
        .withColumn("split",
          when(col("split") === "eval" && col("__graft_te").isNotNull,
            lit("purged")).otherwise(col("split")))
        .drop("__graft_te")
    }
  }

  /** Deterministic negative sampling for recommendation / contrastive
    * training: every (user, positive item) interaction emits up to `k`
    * pseudo-random negative item ids from `[0, nItems)`, derived by
    * the engine-portable hash of (user, item, draw index) — so the
    * negatives are reproducible across runs/engines and stable under
    * retries, unlike `rand()`. Draws that collide with ANY positive of
    * the same user are dropped (left-anti join), not resampled:
    * deterministic output beats an exact-k guarantee for training, and
    * the drop rate is positives/nItems per draw. Output: the
    * interaction row + (neg_idx, neg_item).
    *
    * Scale shape: the explode multiplies rows by k BEFORE any shuffle;
    * the anti-join shuffles on (user, item-candidate) — both narrow
    * longs — against the deduplicated positives. No window, no
    * all-pairs. */
  // Distinct primes just under 2^31 with p ≡ 2 (mod 3): gcd(3, p-1)=1,
  // so x → x³ mod p is a BIJECTION on [0, p) — unlike squaring (which
  // reaches only the (p+1)/2 quadratic residues and capped the old
  // draw at 10k items), cubing loses no coverage at all.
  private val NegP1 = 2147483579L
  private val NegP2 = 2147483549L

  /** Max [[negativeSample]] catalog: draws reduce H mod nItems with H
    * near-uniform on [0, NegP1·NegP2 ≈ 2^62); keeping the draw space
    * at least 1024× the catalog bounds the modulo bias below 0.1%.
    * ≈ 4.5e15 ≈ 2^52 — far beyond any real item catalog. */
  val MaxNegCatalog: Long = NegP1 * NegP2 / 1024L

  def negativeSample(
      df: DataFrame, userCol: String, itemCol: String,
      nItems: Long, k: Int): DataFrame = {
    require(nItems > 0 && nItems <= MaxNegCatalog && k >= 1,
      s"negativeSample: nItems must be in [1, $MaxNegCatalog] (got $nItems) — " +
        "the portable-hash draw space caps the catalog size")
    val draw = explode(sequence(lit(0), lit(k - 1))).as("neg_idx")
    val u = longKey(col(userCol), "negativeSample")
    val i = longKey(col(itemCol), "negativeSample")
    // One independent draw component per prime. The draw index MUST be
    // mixed NONLINEARLY: any linear map mod one prime sends the
    // progression (H + idx·c) mod p to another progression, so a fixed
    // interaction's k draws stay evenly spaced — correlated
    // "negatives". The cube supplies the nonlinearity without the
    // quadratic-residue coverage loss of squaring. Overflow audit
    // (DuckDB errors on int64 overflow; Spark non-ANSI would wrap):
    // (p-1)·2654435761 ≈ 5.70e18 and the mix sum stays < 2^63 for any
    // idx ≤ 5e13; h < p ≈ 2^31 so h² < 2^62 and (h² mod p)·h < 2^62.
    def component(p: Long, cu: Long, ci: Long, cj: Long): Column = {
      val h = pmod(
        pmod(u, lit(p)) * lit(cu) + pmod(i, lit(p)) * lit(ci) +
          col("neg_idx") * lit(cj), lit(p))
      pmod(h * h % lit(p) * h, lit(p))
    }
    val s1 = component(NegP1, 2654435761L, 40503L, 69061L)
    val s2 = component(NegP2, 2246822519L, 52361L, 86969L)
    // CRT-style combine: (s1, s2) → s1·P2 + s2 ∈ [0, P1·P2 ≈ 2^62) —
    // s1·P2 < 2^62 fits a long. Measured over 10k interactions at
    // (nItems=1e6, k=3): decile frequencies uniform to ~4% (Poisson
    // noise at 3k/bucket) and ZERO constant-gap triples.
    val negItem = pmod(s1 * lit(NegP2) + s2, lit(nItems))
    // Rows with NULL user/item have no defined draw — excluded up
    // front (consistent with weightedSample's NULL-weight exclusion);
    // left in, the NULL neg_item would survive the anti-join as a
    // silent NULL "negative".
    val withNeg = df.filter(u.isNotNull && i.isNotNull)
      .select(col("*"), draw)
      .withColumn("neg_item", negItem)
    val positives = df.select(col(userCol).as("__graft_u"),
      col(itemCol).cast("long").as("__graft_i")).distinct()
    withNeg.join(positives,
      withNeg(userCol) === col("__graft_u") &&
        withNeg("neg_item") === col("__graft_i"),
      "left_anti")
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
