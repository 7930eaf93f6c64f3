package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed
  * for the 100 TB shape of the problem:
  *
  *  - exact: one hash-aggregate shuffle on a 128-bit content hash —
  *    never on the text itself (shuffle keys stay 16 bytes/row).
  *  - MinHash-LSH: signature computation is a per-row projection
  *    (no shuffle); candidate generation shuffles only
  *    (band-hash, doc_id) pairs; verification joins only within
  *    buckets. Cross-join never materializes.
  *  - SimHash: 64-bit fingerprint per row; near-dup candidates via
  *    banded bit-chunks, Hamming-verified.
  *  - n-gram Jaccard: exact pairwise similarity, blocked on shared
  *    shingles so only co-occurring pairs are scored.
  *
  * All pure column expressions / relational ops — no UDFs, no driver
  * loops; every stage is AQE- and codegen-friendly.
  */
object Dedup {

  /** Exact duplicates on whitespace/case-normalized text: one row per
    * distinct content hash with the survivor (min id) and count.
    *
    * The result doubles as the persistable EXACT-dedup index of the
    * fit-once/serve-many ingest path — the content-hash twin of the
    * minhash signature table ([[minhashSignatures]]): persist it with
    * [[saveExactIndex]], check each ingest batch against it with
    * [[exactAgainst]] (or the streaming
    * [[graft.streaming.StreamingOps.exactDedupStream]]), and fold the
    * batch back in with [[mergeExactIndexes]]. At 100 TB the index —
    * one (hash, id, count) row per DISTINCT document — is the only
    * artifact the historical side ever re-reads; the corpus text is
    * never re-hashed. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), md5(TextOps.normalized(col(textCol))).as("text_hash"))
      .groupBy("text_hash")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Persist an [[exact]] index as parquet (the [[saveSignatures]]
    * pattern: engine-agnostic, versionable beside the corpus). */
  def saveExactIndex(index: DataFrame, path: String): Unit =
    index.select(col("text_hash"), col("keep_id"), col("dup_count"))
      .write.mode("overwrite").parquet(path)

  /** Load a persisted exact index (inverse of [[saveExactIndex]]). */
  def loadExactIndex(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .select(col("text_hash"), col("keep_id"), col("dup_count"))

  /** Persist an [[exact]] index as a BUCKETED catalog table — the
    * at-scale layout for the serve side. At 100 TB the index is one
    * row per DISTINCT document (billions); a plain parquet index
    * makes every daily [[exactAgainst]] shuffle those billions on
    * `text_hash` before the join, every day. Bucketing the table by
    * `text_hash` at write time pre-partitions it ONCE: the join then
    * reads index buckets in place and only the arrival batch — the
    * small side — shuffles (spec-asserted: the bucketed plan carries
    * strictly fewer exchanges, identical rows). Pick `nBuckets` so a
    * bucket is a few hundred MB at full index size; the sort within
    * buckets makes the join's index side sort-free too. */
  def saveExactIndexBucketed(
      index: DataFrame, tableName: String, nBuckets: Int): Unit =
    index.select(col("text_hash"), col("keep_id"), col("dup_count"))
      .write.mode("overwrite")
      .bucketBy(nBuckets, "text_hash").sortBy("text_hash")
      .format("parquet").saveAsTable(tableName)

  /** Load a bucketed exact index (inverse of
    * [[saveExactIndexBucketed]]; bucket metadata rides the catalog
    * entry, so the exchange-free join shape survives the round trip). */
  def loadExactIndexBucketed(
      spark: org.apache.spark.sql.SparkSession, tableName: String): DataFrame =
    spark.table(tableName)
      .select(col("text_hash"), col("keep_id"), col("dup_count"))

  /** Classify an ingest batch against a persisted [[exact]] index:
    * one row per arrival, `dup_of` = the id it duplicates, NULL for
    * survivors (genuinely new content). Semantics are FIRST-SEEN-WINS
    * — the real ingest contract, because history is immutable:
    *   - content already in the index → `dup_of` = the index's
    *     `keep_id`, even if the arrival's id is smaller (the
    *     historical survivor cannot be retroactively deleted);
    *   - content new to the index but repeated WITHIN the batch →
    *     min-id arrival survives, its batch twins point at it;
    *   - content seen nowhere → `dup_of` NULL;
    *   - NULL text (no content to hash) → the row passes through as a
    *     survivor with a NULL `text_hash` — content-free rows are not
    *     this operator's to drop, and every arrival gets exactly one
    *     output row (an equi-join would silently eat NULL hashes).
    * Scale shape: one hash projection over the batch, one hash-agg on
    * the batch's hashes, one equi-join against the index on the
    * 32-hex-char hash (broadcast when the batch or index is small;
    * shuffle hash join otherwise — either way no text ever moves, only
    * hashes). Survivors' `(text_hash, id)` rows are exactly what
    * [[mergeExactIndexes]] folds back into the index.
    *
    * PRECONDITION: `index` must hold ONE row per `text_hash` — which
    * every index this engine produces does by construction ([[exact]]
    * is a group-by on the hash; [[mergeExactIndexes]] re-groups). The
    * one way to violate it is unioning per-batch indexes WITHOUT
    * [[mergeExactIndexes]]; a duplicate hash would then emit one
    * classification row per copy, breaking the one-output-row-per-
    * arrival contract downstream. Deduplicating defensively here would
    * re-aggregate the (billions-row) index on every daily serve to
    * guard against a malformed input this engine cannot produce — so
    * the contract is documented, not re-checked. */
  def exactAgainst(
      newDocs: DataFrame, index: DataFrame,
      idCol: String, textCol: String): DataFrame =
    exactClassify(
      newDocs.select(col(idCol).as("id"),
        md5(TextOps.normalized(col(textCol))).as("text_hash")),
      index)

  /** The [[exactAgainst]] classification over an already-hashed batch
    * — shared by the flat and partition-pruned serve paths so the
    * first-seen-wins / NULL-pass-through contract lives in exactly
    * one place. */
  private def exactClassify(hashed: DataFrame, index: DataFrame): DataFrame = {
    val withHash = hashed.filter(col("text_hash").isNotNull)
    val batchKeep = withHash.groupBy("text_hash")
      .agg(min(col("id")).as("__graft_batch_keep"))
    val classified = withHash
      .join(index.select(col("text_hash"), col("keep_id")),
        Seq("text_hash"), "left")
      .join(batchKeep, Seq("text_hash"))
      .select(col("id"), col("text_hash"),
        when(col("keep_id").isNotNull, col("keep_id"))
          .when(col("__graft_batch_keep") =!= col("id"),
            col("__graft_batch_keep"))
          .as("dup_of"))
    classified.unionByName(hashed.filter(col("text_hash").isNull)
      .select(col("id"), col("text_hash"),
        lit(null).cast(classified.schema("dup_of").dataType).as("dup_of")))
  }

  /** A persisted, hash-partitioned EXACT index — the partition-pruned
    * serve layout of the content-hash table (the [[WinnowFpIndex]]
    * argument applied to the exact face): (text_hash, keep_id,
    * dup_count) rows land in hash partition directories, so a serve
    * reads only the partitions the ARRIVAL batch's content hashes
    * fall into — ≤ |batch| directories out of a bucket count sized to
    * the corpus. The bucketed CATALOG layout
    * ([[saveExactIndexBucketed]]) removes the index-side JOIN
    * shuffle but still scans every bucket per serve; this one removes
    * the scan itself. Same one-row-per-hash precondition as
    * [[exactAgainst]]. Maintenance: [[mergeExactIndexes]] + re-save
    * (dup_count of repeated hashes must update, so the exact index is
    * rebuild-maintained, not append-maintained — the merge is one
    * hash-agg over index ∪ batch-index, never the corpus). */
  /** `root` (set ONLY by [[loadExactIndexPartitioned]] — it is a
    * `private[graft]` val, so external code cannot READ it; note the
    * Scala 2 case-class wart that the generated `apply`/`copy` can
    * still SET the parameter — doing so with a root you did not get
    * from `loadExactIndexPartitioned`, or carrying one across a
    * `copy(rows = …)`, violates the invariant below) enables the
    * DIRECT-PATH serve: the probed bucket directories are
    * read by explicit path, so per-serve driver work is O(|batch|)
    * existence probes and the scan's file listing never touches the
    * other bucket directories — the cost that made a ∝-corpus bucket
    * count (flat read bytes) pay an O(#partitions) planning pass per
    * serve (r12's one canary outlier; a √-sizing attempt just moved
    * the cost into √-growing read bytes). Without `root` the serve
    * falls back to an `isin` partition filter over the loaded frame.
    * INVARIANT (r13 ADVICE): `root` BINDS the serve to the persisted
    * layout — the direct-path probe reads the on-disk buckets and
    * ignores `rows` for the probed set, so a value whose `rows` was
    * replaced in memory (e.g. via `copy()` after a merge) while `root`
    * survived would silently classify against stale on-disk hashes.
    * Never carry `root` past a `rows` replacement; a refreshed index
    * is re-loaded from its re-saved layout, never patched in place. */
  final case class ExactHashIndex(rows: DataFrame, hashBuckets: Int,
      private[graft] val root: Option[String] = None)

  /** Build + persist an [[ExactHashIndex]] from an [[exact]] /
    * [[loadExactIndex]] table. Size `nHashBuckets` ∝ corpus (constant
    * per-bucket bytes): the loaded index serves by DIRECT PATH to the
    * probed bucket directories, so a large directory count costs
    * nothing per serve — per-serve driver work is O(|batch|)
    * regardless of layout size. (r12 measured the alternatives: an
    * isin filter over the full listing pays an O(#partitions)
    * planning pass per serve — 2.08× at 6,400 dirs against a ~0.2 s
    * base — and √-sizing just moves the cost into √-growing read
    * bytes, 2.48× measured.) */
  def saveExactIndexPartitioned(
      index: DataFrame, path: String, nHashBuckets: Int = 64): Unit = {
    require(nHashBuckets > 0,
      "saveExactIndexPartitioned: nHashBuckets must be > 0")
    index.select(col("text_hash"), col("keep_id"), col("dup_count"))
      .withColumn(BandBucket, fpBucket(col("text_hash"), nHashBuckets))
      .repartition(nHashBuckets, col(BandBucket))
      .write.mode("overwrite").partitionBy(BandBucket)
      .parquet(s"$path/hashes")
    val spark = index.sparkSession
    import spark.implicits._
    Seq(Tuple1(nHashBuckets)).toDF("hash_buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Load a persisted [[ExactHashIndex]] (inverse of
    * [[saveExactIndexPartitioned]]). */
  def loadExactIndexPartitioned(
      spark: org.apache.spark.sql.SparkSession, path: String): ExactHashIndex = {
    val st = spark.read.parquet(s"$path/stats").head()
    ExactHashIndex(spark.read.parquet(s"$path/hashes"), st.getInt(0),
      Some(path))
  }

  /** [[exactAgainst]] against a persisted [[ExactHashIndex]] —
    * IDENTICAL output (one first-seen-wins classification row per
    * arrival, NULL-text pass-through) to serving the flat index
    * (oracle-pinned: dedup_exact_serve shares
    * dedup_exact_incremental's SQL verbatim), different physics: the
    * arrival batch's hash bucket set collects to the driver
    * (≤ |batch| ints) and prunes index partitions STATICALLY — only
    * matching-bucket index rows are read, and the LEFT join still
    * classifies unmatched arrivals as survivors (pruning drops only
    * index partitions no arrival hash can reach, never an arrival
    * row). */
  def exactAgainst(
      newDocs: DataFrame, index: ExactHashIndex,
      idCol: String, textCol: String): DataFrame =
    exactAgainstStaged(
      stageExactArrivals(newDocs, idCol, textCol)
        .localCheckpoint(false), // feeds the bucket collect AND the join
      index)

  /** The arrival projection of the partitioned exact serve — exposed
    * so a caller that OWNS the staging (the streaming face, which
    * persists it and releases it after the sink) can pair it with
    * [[exactAgainstStaged]]. */
  private[graft] def stageExactArrivals(
      newDocs: DataFrame, idCol: String, textCol: String): DataFrame =
    newDocs.select(col(idCol).as("id"),
      md5(TextOps.normalized(col(textCol))).as("text_hash"))

  /** [[exactAgainst]] over an already-STAGED arrival frame (a
    * [[stageExactArrivals]] output the caller has made stable —
    * localCheckpoint or persist; it is consumed by both the bucket
    * collect and the join). No materialization happens here, so
    * block ownership stays entirely with the caller — the streaming
    * faces' leak-free release needs exactly this split. */
  private[graft] def exactAgainstStaged(
      hashed: DataFrame, index: ExactHashIndex): DataFrame = {
    val buckets = hashed.filter(col("text_hash").isNotNull)
      .select(fpBucket(col("text_hash"), index.hashBuckets).as("bb"))
      .distinct().collect().map(_.getInt(0)).toSeq
    // Direct-path probe when the index knows its root: list and read
    // ONLY the probed bucket directories. Per-serve driver cost is
    // |batch| existence probes + a |probed|-directory file listing —
    // independent of the layout's total bucket count, so the bucket
    // count can grow ∝ corpus (constant per-bucket bytes, flat serve
    // reads) without the per-serve partition-planning pass over every
    // directory that an `isin` filter over the full listing pays. An
    // empty bucket never wrote a directory (repartition emits no task
    // output), hence the existence filter; probing zero directories
    // means no arrival hash can match — LIMIT-0 index side keeps the
    // LEFT-join survivor semantics.
    val pruned = index.root match {
      case Some(r) =>
        val spark = hashed.sparkSession
        val base = new org.apache.hadoop.fs.Path(s"$r/hashes")
        val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // ONE listStatus intersected with the probed set — not one
        // fs.exists per bucket: |batch| serial existence RPCs against
        // an object store would put minutes of driver wall in front
        // of every serve/micro-batch (review finding r13). An empty
        // bucket never wrote a directory (repartition emits no task
        // output), hence the intersection.
        val existing = fs.listStatus(base).iterator
          .map(_.getPath.getName).filter(_.startsWith(s"$BandBucket="))
          .toSet
        val dirs = buckets.map(b => s"$BandBucket=$b").filter(existing)
          .map(n => new org.apache.hadoop.fs.Path(base, n).toString)
        if (dirs.isEmpty) index.rows.limit(0)
        else spark.read
          .option("basePath", base.toString)
          .schema(index.rows.schema) // no schema-inference listing
          .parquet(dirs: _*)
      case None =>
        index.rows.filter(col(BandBucket).isin(buckets: _*))
    }
    exactClassify(hashed, pruned)
  }

  /** Merge [[exact]] indexes — the append-composability law of the
    * incremental path: `mergeExactIndexes(Seq(exact(a), exact(b)))`
    * is ROW-IDENTICAL to `exact(a ∪ b)` (min of survivor mins = the
    * union's survivor; counts sum), so daily index maintenance is one
    * hash-agg over (yesterday's index ∪ today's batch index) — the
    * corpus itself is never touched. Oracle-pinned by
    * `dedup_exact_merged`, which shares dedup_exact's SQL verbatim. */
  def mergeExactIndexes(indexes: Seq[DataFrame]): DataFrame = {
    require(indexes.nonEmpty, "mergeExactIndexes needs at least one index")
    indexes.reduce(_ unionByName _)
      .groupBy("text_hash")
      .agg(min(col("keep_id")).as("keep_id"),
        sum(col("dup_count")).as("dup_count"))
  }

  /** Deterministic MinHash signature family: sig_i = min over shingles
    * of xxhash64(shingle, i) — one independent seeded hash per
    * component, reproducible across runs (no fitted model state, no
    * overflow under ANSI arithmetic).
    *
    * For an engine-portable family (used by the oracle-checked query)
    * see [[graft.functions.PortableMinHashSignature]]. */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(shingleCol, s => xxhash64(s, lit(i))))
    }: _*)

  /** Mersenne prime modulus of the portable minhash family (fits well
    * inside a long so `h1 + 15*h2` can never overflow). The family:
    * ONE md5 per shingle supplies two 60-bit seeds h1, h2 (hex chars
    * 1-15 and 16-30), and component i is `min over shingles of
    * (h1 + i*h2) mod p` — the classic two-hash universal trick,
    * bit-reproducible in any engine with md5 (the DuckDB oracle
    * recomputes it exactly). Computed by the fused codegen kernel
    * [[graft.functions.PortableMinHashSignature]]. */
  val PortableMinhashMod = 2147483647L

  /** The persistable MinHash "index": DISTINCT-shingle signatures
    * (id, sig: array<k longs>) — THE single copy of the
    * shingle→signature pipeline, shared by the one-shot [[minhashLsh]]
    * and the fit-once/serve-many incremental path
    * ([[saveSignatures]]/[[loadSignatures]]/[[minhashLshAgainst]]:
    * dedup a daily ingest batch against yesterday's corpus WITHOUT
    * re-shingling the historical text — at 100 TB the signature table
    * is the only artifact the historical side ever re-reads). */
  def minhashSignatures(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 16, portable: Boolean = false): DataFrame = {
    // Stage token/shingle arrays as real columns: lambda element access
    // then touches a materialized array instead of re-running the whole
    // normalize→split chain per element (CollapseProject keeps these
    // projections separate because the aliases are non-cheap and
    // multiply-referenced). 100× on long documents.
    // Docs too short to shingle are dropped BEFORE the projections: a
    // filter on the staged `sh` column would be pushed below the
    // projection by Catalyst, collapsing the staging and re-running
    // the tokenize chain per lambda element access (the HOF
    // re-evaluation trap — measured 10× on this exact pipeline).
    val shingled = OpsUtil.widen(df)
      .filter(size(TextOps.tokens(TextOps.normalized(col(textCol)))) >= shingleN)
      .select(col(idCol).as("id"),
        TextOps.tokens(TextOps.normalized(col(textCol))).as("ws"))
      .select(col("id"), TextOps.shingles(col("ws"), shingleN).as("sh"))
    // Build parameters ride the sig column as metadata (the
    // withSimhash pattern; k is already guarded structurally by
    // sigLengthGuard) so the serve path can validate hash-family and
    // shingle-width agreement.
    val md = new org.apache.spark.sql.types.MetadataBuilder()
      .putBoolean("graft.minhash.portable", portable)
      .putLong("graft.minhash.shingle_n", shingleN.toLong).build()
    if (portable)
      shingled.select(col("id"),
        graft.functions.HashFunctions
          .portableMinhashSignature(col("sh"), k, PortableMinhashMod).as("sig", md))
    else
      shingled.select(col("id"), minhashSignature(col("sh"), k).as("sig", md))
  }

  /** Persist a signature table as parquet — engine-agnostic,
    * versionable beside the corpus it indexes (the
    * [[graft.ops.Classifier.saveWeights]] pattern). */
  def saveSignatures(sigs: DataFrame, path: String): Unit =
    sigs.select(col("id"), col("sig")).write.mode("overwrite").parquet(path)

  /** Load a persisted signature table (inverse of [[saveSignatures]]). */
  def loadSignatures(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select(col("id"), col("sig"))

  /** LSH band rows (id, sig, band, band_hash) for a signature table,
    * with hot buckets wider than `maxBucket` dropped — shared between
    * the self-join and two-sided candidate generation. */
  private def bandRows(
      sigs: DataFrame, k: Int, bands: Int, portable: Boolean,
      maxBucket: Int): DataFrame = {
    val r = k / bands
    def bandHash(b: Column): Column = {
      val key = concat_ws(",", slice(col("sig"), b * r + 1, lit(r)), b.cast("string"))
      if (portable) md5(key) else xxhash64(key)
    }
    val bandedRaw = sigs.select(
      col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), bandHash(_))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    if (maxBucket == Int.MaxValue) bandedRaw
    else {
      val hot = bandedRaw.groupBy("band", "band_hash")
        .agg(count(lit(1)).as("m")).filter(col("m") > maxBucket)
        .select("band", "band_hash")
      bandedRaw.join(broadcast(hot), Seq("band", "band_hash"), "left_anti")
    }
  }

  /** MinHash + LSH banding near-duplicate candidates.
    *
    * @param bands number of LSH bands; each band hashes `k/bands`
    *              signature components; pairs colliding in >=1 band are
    *              candidates (P ~ 1-(1-j^r)^bands)
    * @return (id_a, id_b, est_jaccard) with id_a < id_b, est_jaccard =
    *         fraction of matching signature components, filtered to
    *         `threshold`
    *
    * `maxBucket` caps LSH bucket width: (band, band_hash) buckets
    * holding more than `maxBucket` documents are dropped before the
    * candidate join — a bucket that wide is template/boilerplate
    * collapse and would contribute width² candidate pairs on one
    * shuffle key. Mass-identical documents belong to [[exact]] dedup,
    * which catches them in one agg; run it first. */
  def minhashLsh(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 16, bands: Int = 8,
      threshold: Double = 0.5, portable: Boolean = false,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    // The signature table is the LSH index: tiny relative to the corpus
    // (id + k longs per doc) but consumed by BOTH candidate-join sides
    // (and the bucket-width aggregate when capped) — materialize once
    // instead of re-tokenizing/re-hashing the corpus per consumer.
    // Lazy checkpoint: lineage truncates and blocks cache on the first
    // action, so plan CONSTRUCTION stays side-effect free; signature
    // values are pure functions of the input, so a concurrent first
    // compute by two stages is harmless.
    val sigsOnce = minhashSignatures(df, idCol, textCol, shingleN, k, portable)
      .localCheckpoint(false)
    val banded = bandRows(sigsOnce, k, bands, portable, maxBucket)

    // Candidate join carries ids only — signatures re-attach from the
    // checkpointed table after pair dedup, so the bucket-join shuffle
    // moves 16-byte pairs instead of both k-component arrays (the
    // candidate set is sparse by LSH construction; the sig re-join is
    // small and AQE-broadcastable).
    val a = banded.select(col("band"), col("band_hash"), col("id").as("id_a"))
    val b = banded.select(col("band"), col("band_hash"), col("id").as("id_b"))
    val cand = a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")

    cand
      .join(sigsOnce.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigsOnce.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), m => m))
          .cast("double") / lit(k.toDouble))
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** INCREMENTAL MinHash-LSH: near-duplicate pairs between a NEW batch
    * and an already-indexed BASE corpus — the serve-many half of the
    * signature index ([[minhashSignatures]] → [[saveSignatures]] once;
    * each ingest then computes signatures for its batch only and joins
    * against the loaded base table). The historical corpus text is
    * never re-shingled: at 100 TB the base side ships k longs + id per
    * document, and both band streams shuffle on the same (band,
    * band_hash) key. `maxBucket` caps bucket width PER SIDE (bounding
    * candidates per bucket at maxBucket², the same template-collapse
    * guard as [[minhashLsh]]). Output: (new_id, base_id, est_jaccard ≥
    * threshold). Sides are expected disjoint (an id present in both
    * pairs with itself at jaccard 1.0 — harmless but redundant). */
  def minhashLshAgainst(
      newSigs: DataFrame, baseSigs: DataFrame,
      k: Int = 16, bands: Int = 8, threshold: Double = 0.5,
      portable: Boolean = false, maxBucket: Int = Int.MaxValue): DataFrame =
    minhashLshAgainstPrepared(
      newSigs.localCheckpoint(false), baseSigs.localCheckpoint(false),
      k, bands, threshold, portable, maxBucket)

  /** A loaded index can carry a DIFFERENT k than the serve call: band
    * slices would then hash the wrong components and est_jaccard would
    * divide a foreign match count by this k — confidently wrong pairs
    * with no error. Fail fast per row instead (fail-fast over silent
    * truncation, the house rule). NULL signatures are index corruption
    * too (every writer in this engine produces non-NULL arrays) and
    * fail with their own message — without the explicit branch the
    * diagnostic itself would NULL-propagate into raise_error(NULL)
    * exactly when it is needed. */
  private def sigLengthGuard(df: DataFrame, k: Int, side: String): DataFrame =
    df.withColumn("sig",
      when(col("sig").isNull, raise_error(lit(
        s"minhashLshAgainst: $side signature is NULL — corrupt index row")))
        .when(size(col("sig")) === k, col("sig"))
        .otherwise(raise_error(concat(
          lit(s"minhashLshAgainst: $side signature has "),
          size(col("sig")).cast("string"),
          lit(s" components, expected k=$k — the index was built with a different k")))))

  /** [[minhashLshAgainst]] over ALREADY-materialized signature frames —
    * the streaming serve path calls this so the base index checkpoints
    * ONCE for the query's lifetime instead of once per micro-batch. */
  private[graft] def minhashLshAgainstPrepared(
      newOnce: DataFrame, baseOnce0: DataFrame,
      k: Int, bands: Int, threshold: Double,
      portable: Boolean, maxBucket: Int): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    // Hash-family tag check (the winnowAgainst contract): band hashes
    // from different families never collide meaningfully, and unlike
    // a k mismatch (caught per-row by sigLengthGuard) a family or
    // shingle-width mismatch is structurally invisible.
    checkBuildParams(baseOnce0, "sig", "minhashLshAgainst",
      Seq("graft.minhash.portable" -> portable))
    checkBuildParams(newOnce, "sig", "minhashLshAgainst",
      Seq("graft.minhash.portable" -> portable))
    val (nm, bm) = (newOnce.schema("sig").metadata, baseOnce0.schema("sig").metadata)
    if (nm.contains("graft.minhash.shingle_n") && bm.contains("graft.minhash.shingle_n"))
      require(nm.getLong("graft.minhash.shingle_n") == bm.getLong("graft.minhash.shingle_n"),
        "minhashLshAgainst: the two signature tables were built with " +
          s"different shingle widths (new=${nm.getLong("graft.minhash.shingle_n")}, " +
          s"base=${bm.getLong("graft.minhash.shingle_n")}) — their signatures " +
          "never match meaningfully")
    val baseOnce = sigLengthGuard(baseOnce0, k, "base")
    val a = bandRows(sigLengthGuard(newOnce, k, "new"), k, bands, portable, maxBucket)
      .select(col("band"), col("band_hash"), col("id").as("new_id"))
    val b = bandRows(baseOnce, k, bands, portable, maxBucket)
      .select(col("band"), col("band_hash"), col("id").as("base_id"))
    val cand = a.join(b, Seq("band", "band_hash"))
      .select("new_id", "base_id")
      .dropDuplicates("new_id", "base_id")
    cand
      .join(newOnce.select(col("id").as("new_id"), col("sig").as("sig_a")), Seq("new_id"))
      .join(baseOnce.select(col("id").as("base_id"), col("sig").as("sig_b")), Seq("base_id"))
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), m => m))
          .cast("double") / lit(k.toDouble))
      .filter(col("est_jaccard") >= threshold)
      .select("new_id", "base_id", "est_jaccard")
  }

  /** A persisted, term-partitioned LSH BAND index — the serve-optimal
    * layout of the minhash signature table (the
    * [[graft.ops.Retrieval.saveBm25IndexPartitioned]] argument applied
    * to near-dup serving): band rows are precomputed ONCE at build
    * (the per-serve band explode of the whole history was the one
    * serve cost growing linearly with the index — measured 7× at 100×
    * index growth, SCALE.md round 12) and land in band-hash-bucket
    * partition directories, so a serve reads only the partitions the
    * ARRIVAL batch's band hashes fall into. Signatures ride inside
    * the band rows (bands× storage, k longs each — the classic
    * space/time trade) so candidate verification never joins back to
    * a full signature table. Build parameters live in the stats
    * sidecar and are re-validated at serve. */
  final case class LshBandIndex(
      rows: DataFrame, k: Int, bands: Int, portable: Boolean,
      hashBuckets: Int, shingleN: Option[Int] = None,
      maxBucket: Option[Int] = None)

  /** Partition column of the band-bucketed LSH layout. */
  private[graft] val BandBucket = "__graft_bb"

  /** band_hash → partition bucket (the shared [[OpsUtil.hashBucket]];
    * band_hash is long or md5 string per family). */
  private def bandBucket(bandHash: Column, n: Int): Column =
    OpsUtil.hashBucket(n, bandHash)

  /** Build + persist an [[LshBandIndex]] from a signature table
    * ([[minhashSignatures]] output). `maxBucket` (the template-
    * collapse cap) applies at BUILD — it depends only on the index,
    * so pre-capping keeps serves cadence-independent, the
    * [[capBaseFps]] argument. Size `nHashBuckets` to the corpus
    * (constant per-bucket bytes): serve scan ≈ |arrival band hashes|
    * × bucket size, flat as history grows. */
  def saveLshBandIndex(
      sigs: DataFrame, path: String,
      k: Int = 16, bands: Int = 8, portable: Boolean = false,
      maxBucket: Int = Int.MaxValue, nHashBuckets: Int = 64): Unit = {
    require(k % bands == 0, "k must divide into bands")
    require(nHashBuckets > 0, "saveLshBandIndex: nHashBuckets must be > 0")
    // The signature frame's own family tag must match the `portable`
    // the band rows are built with — otherwise the sidecar records a
    // family the index was never hashed with and every serve that
    // derives the arrival family from the index silently returns
    // nothing.
    checkBuildParams(sigs, "sig", "saveLshBandIndex",
      Seq("graft.minhash.portable" -> portable))
    // shingle_n rides the sidecar when the frame carries its tag (every
    // minhashSignatures output does): band hashes strip the signature
    // metadata, so without the sidecar a serve could sign arrivals at a
    // different shingle width and silently find nothing.
    val sigMd = sigs.schema("sig").metadata
    val shingleN: java.lang.Integer =
      if (sigMd.contains("graft.minhash.shingle_n"))
        Int.box(sigMd.getLong("graft.minhash.shingle_n").toInt)
      else null
    bandRows(sigLengthGuard(sigs, k, "base"), k, bands, portable, maxBucket)
      .withColumn(BandBucket, bandBucket(col("band_hash"), nHashBuckets))
      .repartition(nHashBuckets, col(BandBucket))
      .write.mode("overwrite").partitionBy(BandBucket)
      .parquet(s"$path/bands")
    val spark = sigs.sparkSession
    import spark.implicits._
    // max_bucket rides the sidecar because it decides the MAINTENANCE
    // contract: an uncapped build's band rows are append-composable
    // (appendLshBandIndex checks this column); a capped build's bucket
    // membership is a global aggregate over the whole index — the
    // winnow stored-df argument — so it is rebuild-only.
    Seq((k, bands, portable, nHashBuckets, Option(shingleN).map(_.toInt),
        maxBucket))
      .toDF("k", "bands", "portable", "hash_buckets", "shingle_n",
        "max_bucket")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Append a new batch's signatures to an existing
    * [[saveLshBandIndex]] layout — the incremental-maintenance write
    * (the [[appendSimhashBandIndex]] contract at the MinHash face).
    * ONLY legal for an UNCAPPED build (`maxBucket = Int.MaxValue` at
    * [[saveLshBandIndex]]): band rows under a fixed (k, bands, family,
    * shingle width) are append-composable — append ∪ rebuild are
    * row-identical, spec-pinned — but a build-time `maxBucket` cap is
    * a global aggregate over the whole index (which rows survive a hot
    * bucket's cap depends on every batch ever written), so a capped
    * layout is REBUILD-maintained and this fails fast. A pre-sidecar
    * layout (no `max_bucket` column) also fails fast — its build cap
    * is unknowable; rebuild once to record it. The batch frame's
    * family/shingle tags must match the index's (fail-fast); k/bands/
    * bucket count come from the sidecar. Each append adds ≤ one file
    * per touched bucket; compact with [[compactLshBandIndex]] (or
    * `graft.tools.Maintain`) when listing cost matters. */
  def appendLshBandIndex(sigs: DataFrame, path: String): Unit = {
    val spark = sigs.sparkSession
    // Sidecar ONLY — loadLshBandIndex would eagerly list every file
    // under bands/ to build the rows frame this method never touches,
    // putting an O(#files) driver pass in front of each append on
    // exactly the append-maintained layouts whose file counts grow
    // per batch (review finding r14; the appendSimhashBandIndex
    // pattern).
    val idx = loadLshBandStats(spark, path)
    require(idx.maxBucket.contains(Int.MaxValue),
      idx.maxBucket match {
        case Some(cap) =>
          s"appendLshBandIndex: the index at $path was built with " +
            s"maxBucket=$cap — a capped LSH band index is " +
            "rebuild-maintained (bucket membership under the cap is a " +
            "global aggregate over the whole index); rebuild with " +
            "saveLshBandIndex over the merged signature table, or " +
            "build uncapped to append"
        case None =>
          s"appendLshBandIndex: the index at $path predates the " +
            "max_bucket sidecar column, so its build cap is unknowable " +
            "— rebuild once with saveLshBandIndex to record it"
      })
    // Appends are STRICT on tag presence (review finding r15): an
    // append writes permanent rows, so a hand-built frame without the
    // family tag must be refused here even though the lenient serve
    // paths (checkBuildParams skips absent keys, for indexes that
    // predate the tags) would let it through — signatures hashed with
    // the wrong family would land as never-matching garbage band rows.
    require(sigs.schema("sig").metadata.contains("graft.minhash.portable"),
      "appendLshBandIndex: the batch signature frame carries no " +
        "graft.minhash.portable metadata — build it with " +
        "minhashSignatures so the hash family is provably consistent " +
        "with the index")
    checkBuildParams(sigs, "sig", "appendLshBandIndex",
      Seq("graft.minhash.portable" -> idx.portable))
    val nm = sigs.schema("sig").metadata
    idx.shingleN.foreach { want =>
      // Two-sided (review finding r14): a batch frame WITHOUT the tag
      // (hand-built, not minhashSignatures output) must be refused,
      // not silently trusted — the checkBuildParams portable-tag
      // strictness applied to the shingle width.
      require(nm.contains("graft.minhash.shingle_n"),
        "appendLshBandIndex: the index records shingle_n=" + want +
          " but the batch signature frame carries no " +
          "graft.minhash.shingle_n metadata — build the batch with " +
          "minhashSignatures (same shingleN) so the widths are provably " +
          "consistent")
      require(nm.getLong("graft.minhash.shingle_n").toInt == want,
        "appendLshBandIndex: the index was built from signatures with " +
          s"shingle_n=$want but the batch carries shingle_n=" +
          s"${nm.getLong("graft.minhash.shingle_n")}")
    }
    bandRows(sigLengthGuard(sigs, idx.k, "batch"), idx.k, idx.bands,
        idx.portable, Int.MaxValue)
      .withColumn(BandBucket, bandBucket(col("band_hash"), idx.hashBuckets))
      .repartition(idx.hashBuckets, col(BandBucket))
      .write.mode("append").partitionBy(BandBucket)
      .parquet(s"$path/bands")
  }

  /** Compact an append-maintained [[saveLshBandIndex]] layout back to
    * one file per bucket directory. Rows untouched; see
    * [[OpsUtil.compactPartitionedDir]] for the swap semantics. */
  def compactLshBandIndex(
      spark: org.apache.spark.sql.SparkSession, path: String): Unit =
    OpsUtil.compactPartitionedDir(spark, s"$path/bands", BandBucket)

  /** Load a persisted [[LshBandIndex]] (inverse of
    * [[saveLshBandIndex]]). */
  def loadLshBandIndex(
      spark: org.apache.spark.sql.SparkSession, path: String): LshBandIndex = {
    val st = loadLshBandStats(spark, path)
    LshBandIndex(spark.read.parquet(s"$path/bands"),
      st.k, st.bands, st.portable, st.hashBuckets, st.shingleN,
      st.maxBucket)
  }

  /** The build parameters of a [[saveLshBandIndex]] layout WITHOUT its
    * band frame — one 1-row sidecar read, no bands/ file listing. The
    * append path needs only these. */
  private final case class LshBandStats(
      k: Int, bands: Int, portable: Boolean, hashBuckets: Int,
      shingleN: Option[Int], maxBucket: Option[Int])

  private def loadLshBandStats(
      spark: org.apache.spark.sql.SparkSession, path: String): LshBandStats = {
    val st = spark.read.parquet(s"$path/stats").head()
    def optInt(name: String): Option[Int] =
      if (st.schema.fieldNames.contains(name) &&
          !st.isNullAt(st.fieldIndex(name)))
        Some(st.getInt(st.fieldIndex(name)))
      else None
    LshBandStats(st.getAs[Int]("k"), st.getAs[Int]("bands"),
      st.getAs[Boolean]("portable"), st.getAs[Int]("hash_buckets"),
      optInt("shingle_n"), optInt("max_bucket"))
  }

  /** [[minhashLshAgainst]] against a persisted [[LshBandIndex]] —
    * IDENTICAL output (new_id, base_id, est_jaccard ≥ threshold) to
    * serving the raw signature table with the index's build
    * parameters (oracle-pinned: dedup_minhash_serve shares
    * dedup_incremental's SQL verbatim), different physics: the
    * arrival batch's band rows are computed (tiny), their bucket set
    * collects to the driver (≤ |batch| × bands values — the
    * bm25ServeBatch pattern) and prunes index partitions STATICALLY;
    * only matching-bucket band rows are ever read, the band-hash
    * equi-join re-checks exact hashes, and signatures come off the
    * index rows themselves — the historical signature table is never
    * scanned, never re-exploded. `maxBucket` here caps the ARRIVAL
    * side only (the base side was capped at build). */
  def minhashLshAgainst(
      newSigs: DataFrame, index: LshBandIndex, threshold: Double,
      maxBucket: Int): DataFrame = {
    checkBuildParams(newSigs, "sig", "minhashLshAgainst",
      Seq("graft.minhash.portable" -> index.portable))
    // The raw-path shingle-width guard, against the index's sidecar:
    // signatures from different shingle widths never match
    // meaningfully, and the band rows carry no metadata to catch it.
    val nm = newSigs.schema("sig").metadata
    index.shingleN.foreach { want =>
      if (nm.contains("graft.minhash.shingle_n"))
        require(nm.getLong("graft.minhash.shingle_n").toInt == want,
          "minhashLshAgainst: the index was built from signatures with " +
            s"shingle_n=$want but the arrival signatures carry shingle_n=" +
            s"${nm.getLong("graft.minhash.shingle_n")} — matching shingle " +
            "widths are required (signatures from different widths never " +
            "match meaningfully)")
    }
    minhashLshAgainstStaged(
      stageLshArrivalBands(newSigs, index, maxBucket)
        .localCheckpoint(false), // feeds the bucket collect AND the join
      index, threshold)
  }

  /** The arrival band rows of the partitioned minhash serve — the
    * [[stageExactArrivals]] split for caller-owned staging.
    * `maxBucket` caps the ARRIVAL side only (base capped at build). */
  private[graft] def stageLshArrivalBands(
      newSigs: DataFrame, index: LshBandIndex, maxBucket: Int): DataFrame =
    bandRows(sigLengthGuard(newSigs, index.k, "new"),
      index.k, index.bands, index.portable, maxBucket)
      .select(col("band"), col("band_hash"),
        col("id").as("new_id"), col("sig").as("sig_a"))

  /** [[minhashLshAgainst]] over already-STAGED arrival band rows (the
    * [[exactAgainstStaged]] contract; callers must run the
    * build-parameter checks of the public entry first — the streaming
    * face signs arrivals with the index's own parameters, making a
    * mismatch unrepresentable). */
  private[graft] def minhashLshAgainstStaged(
      a: DataFrame, index: LshBandIndex, threshold: Double): DataFrame = {
    val buckets = a
      .select(bandBucket(col("band_hash"), index.hashBuckets).as("bb"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val pruned = index.rows
      .filter(col(BandBucket).isin(buckets: _*))
      .select(col("band"), col("band_hash"),
        col("id").as("base_id"), col("sig").as("sig_b"))
    a.join(pruned, Seq("band", "band_hash"))
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), m => m))
          .cast("double") / lit(index.k.toDouble))
      .filter(col("est_jaccard") >= threshold)
      .select("new_id", "base_id", "est_jaccard")
      .distinct() // a pair colliding in several bands emits once
  }

  /** Near-duplicate pairs by SimHash banding + Hamming distance. */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 8, portable: Boolean = false): DataFrame = {
    // 16 bytes per doc, consumed by both candidate-join sides —
    // materialized once (lazily) instead of re-hashing the corpus twice.
    val withSim = withSimhash(df, idCol, textCol, portable).localCheckpoint(false)
    // 4 bands of 16 bits: pairs within Hamming<=maxHamming must share
    // >=1 exact band when maxHamming < 4 per the pigeonhole at 16-bit
    // chunks; used as a candidate filter, then verified exactly.
    val banded = simhashBands(withSim)
    val a = banded.select(col("band"), col("chunk"), col("id").as("id_a"), col("simhash").as("sim_a"))
    val b = banded.select(col("band"), col("chunk"), col("id").as("id_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** SimHash near-dups of an arrival batch against a PERSISTED
    * fingerprint table — the third fit-once/serve-many dedup index
    * beside the minhash signatures and the exact content-hash index,
    * and by far the cheapest: 8 BYTES per historical document (the
    * `(id, simhash)` table from [[withSimhash]], persisted via
    * [[saveSimhashes]]). Output (new_id, base_id, hamming), one row
    * per cross pair within the Hamming budget. Same candidate shape as
    * [[simhashPairs]]: 4 bands of 16 bits equi-joined (complete recall
    * for maxHamming < 4 by pigeonhole, heuristic beyond), then exact
    * Hamming verification — arrivals are hashed once, history is
    * never re-read. Index freshness = append the accepted batch's
    * fingerprints (the [[graft.ops.Similarity.encodeCorpus]] pattern:
    * fingerprints under a fixed hash family are append-composable). */
  def simhashAgainst(
      newDocs: DataFrame, baseSim: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 8, portable: Boolean = false): DataFrame = {
    // The arrival side MUST hash with the family the index was built
    // with; the index's own metadata tag (stamped by withSimhash,
    // preserved through saveSimhashes/loadSimhashes) is checked here —
    // a mismatch would otherwise silently yield empty/garbage pairs.
    checkBuildParams(baseSim, "simhash", "simhashAgainst",
      Seq("graft.simhash.portable" -> portable))
    val a = simhashBands(withSimhash(newDocs, idCol, textCol, portable))
      .select(col("band"), col("chunk"),
        col("id").as("new_id"), col("simhash").as("__graft_sim_n"))
    val b = simhashBands(baseSim.select(col("id"), col("simhash")))
      .select(col("band"), col("chunk"),
        col("id").as("base_id"), col("simhash").as("__graft_sim_b"))
    a.join(b, Seq("band", "chunk"))
      .dropDuplicates("new_id", "base_id")
      .withColumn("hamming",
        bit_count(col("__graft_sim_n").bitwiseXOR(col("__graft_sim_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("new_id", "base_id", "hamming")
  }

  /** Persist a [[withSimhash]] fingerprint table (8 bytes + id per doc). */
  def saveSimhashes(sim: DataFrame, path: String): Unit =
    sim.select(col("id"), col("simhash")).write.mode("overwrite").parquet(path)

  /** Load a persisted fingerprint table (inverse of [[saveSimhashes]]). */
  def loadSimhashes(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select(col("id"), col("simhash"))

  /** A persisted, band-bucketed SIMHASH index — the serve-optimal
    * layout of the fingerprint table (the [[LshBandIndex]] argument
    * applied to the SimHash face): the 4×16-bit band rows are
    * precomputed ONCE at build (the per-serve band explode of the
    * whole history was the SimHash face's only index-proportional
    * serve cost) and land in (band, chunk)-hash partition
    * directories, so a serve reads only the partitions the ARRIVAL
    * batch's band chunks fall into. The fingerprint rides inside the
    * band rows (4× storage at 8 bytes each — still 32 bytes + ids per
    * historical doc), so Hamming verification never joins back to the
    * flat fingerprint table. The hash family is captured at build
    * from the frame's own `graft.simhash.portable` tag and arrivals
    * are hashed WITH IT at serve — a build/serve family mismatch is
    * structurally impossible, not merely validated. */
  final case class SimhashBandIndex(
      rows: DataFrame, portable: Boolean, hashBuckets: Int)

  /** (band, chunk) → partition bucket of the band-bucketed SimHash
    * layout (the shared [[OpsUtil.hashBucket]]). */
  private def simChunkBucket(band: Column, chunk: Column, n: Int): Column =
    OpsUtil.hashBucket(n, band, chunk)

  /** Build + persist a [[SimhashBandIndex]] from a [[withSimhash]] /
    * [[loadSimhashes]] fingerprint table. Size `nHashBuckets` to the
    * corpus (constant per-bucket bytes, the
    * [[graft.ops.Retrieval.saveBm25IndexPartitioned]] contract):
    * serve scan ≈ |arrival band chunks| × bucket size, flat as
    * history grows. Requires the frame's `graft.simhash.portable`
    * tag (present on every [[withSimhash]] output and preserved
    * through parquet) — the index must know its own hash family to
    * hash arrivals at serve time. */
  def saveSimhashBandIndex(
      sim: DataFrame, path: String, nHashBuckets: Int = 64): Unit = {
    require(nHashBuckets > 0, "saveSimhashBandIndex: nHashBuckets must be > 0")
    val md = sim.schema("simhash").metadata
    require(md.contains("graft.simhash.portable"),
      "saveSimhashBandIndex: the fingerprint frame carries no " +
        "graft.simhash.portable tag — build the index from withSimhash/" +
        "loadSimhashes output so the serve can hash arrivals with the " +
        "index's own family")
    val portable = md.getBoolean("graft.simhash.portable")
    simhashBands(sim.select(col("id"), col("simhash")))
      .withColumn(BandBucket,
        simChunkBucket(col("band"), col("chunk"), nHashBuckets))
      .repartition(nHashBuckets, col(BandBucket))
      .write.mode("overwrite").partitionBy(BandBucket)
      .parquet(s"$path/bands")
    val spark = sim.sparkSession
    import spark.implicits._
    Seq((portable, nHashBuckets)).toDF("portable", "hash_buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Append a new batch's fingerprints to an existing
    * [[saveSimhashBandIndex]] layout — the incremental-maintenance
    * write (band rows under a fixed hash family are append-composable
    * and the SimHash face has no build-time cap, so append ∪ rebuild
    * are row-identical — spec-pinned). The batch frame's family tag
    * must match the index's (fail-fast); bucket count comes from the
    * index's own sidecar. Each append adds ≤ one file per touched
    * bucket (the [[graft.ops.Similarity.appendEncodedCorpus]]
    * contract); compact by re-running [[saveSimhashBandIndex]] over
    * the flat fingerprint table when listing cost matters. */
  def appendSimhashBandIndex(sim: DataFrame, path: String): Unit = {
    val spark = sim.sparkSession
    val st = spark.read.parquet(s"$path/stats").head()
    val (portable, n) = (st.getBoolean(0), st.getInt(1))
    // Strict on tag presence, like appendLshBandIndex: appends write
    // permanent rows, and the build (saveSimhashBandIndex) already
    // requires the tag — an untagged batch frame here is hand-built.
    require(sim.schema("simhash").metadata.contains("graft.simhash.portable"),
      "appendSimhashBandIndex: the batch frame carries no " +
        "graft.simhash.portable metadata — build it with withSimhash " +
        "so the hash family is provably consistent with the index")
    checkBuildParams(sim, "simhash", "appendSimhashBandIndex",
      Seq("graft.simhash.portable" -> portable))
    simhashBands(sim.select(col("id"), col("simhash")))
      .withColumn(BandBucket, simChunkBucket(col("band"), col("chunk"), n))
      .repartition(n, col(BandBucket))
      .write.mode("append").partitionBy(BandBucket)
      .parquet(s"$path/bands")
  }

  /** Compact an append-maintained [[saveSimhashBandIndex]] layout
    * back to one file per bucket directory (appends add ≤ 1 file per
    * touched bucket per batch). Rows untouched; see
    * [[OpsUtil.compactPartitionedDir]] for the swap semantics and the
    * don't-compact-under-a-live-serve caveat. */
  def compactSimhashBandIndex(
      spark: org.apache.spark.sql.SparkSession, path: String): Unit =
    OpsUtil.compactPartitionedDir(spark, s"$path/bands", BandBucket)

  /** Load a persisted [[SimhashBandIndex]] (inverse of
    * [[saveSimhashBandIndex]]). */
  def loadSimhashBandIndex(
      spark: org.apache.spark.sql.SparkSession, path: String): SimhashBandIndex = {
    val st = spark.read.parquet(s"$path/stats").head()
    SimhashBandIndex(spark.read.parquet(s"$path/bands"),
      st.getBoolean(0), st.getInt(1))
  }

  /** [[simhashAgainst]] against a persisted [[SimhashBandIndex]] —
    * IDENTICAL output (new_id, base_id, hamming ≤ maxHamming) to
    * serving the flat fingerprint table (oracle-pinned:
    * dedup_simhash_serve shares dedup_simhash_incremental's SQL
    * verbatim), different physics: arrivals are hashed with the
    * index's own family, their (band, chunk) bucket set collects to
    * the driver (≤ |batch| × 4 values — the [[minhashLshAgainst]]
    * band-index pattern) and prunes index partitions STATICALLY; only
    * matching-bucket band rows are read, the (band, chunk) equi-join
    * re-checks exact chunks, and Hamming verifies off the index rows
    * themselves — the flat fingerprint table is never scanned, never
    * re-exploded. */
  def simhashAgainst(
      newDocs: DataFrame, index: SimhashBandIndex, idCol: String,
      textCol: String, maxHamming: Int): DataFrame =
    simhashAgainstStaged(
      stageSimhashArrivals(newDocs, idCol, textCol, index)
        .localCheckpoint(false), // feeds the bucket collect AND the join
      index, maxHamming)

  /** The arrival band rows of the partitioned SimHash serve (hashed
    * with the INDEX's family) — the [[stageExactArrivals]] split for
    * caller-owned staging. */
  private[graft] def stageSimhashArrivals(
      newDocs: DataFrame, idCol: String, textCol: String,
      index: SimhashBandIndex): DataFrame =
    simhashBands(withSimhash(newDocs, idCol, textCol, index.portable))
      .select(col("band"), col("chunk"),
        col("id").as("new_id"), col("simhash").as("__graft_sim_n"))

  /** [[simhashAgainst]] over already-STAGED arrival band rows (the
    * [[exactAgainstStaged]] contract: caller made them stable and
    * owns their blocks). */
  private[graft] def simhashAgainstStaged(
      a: DataFrame, index: SimhashBandIndex, maxHamming: Int): DataFrame = {
    val buckets = a
      .select(simChunkBucket(col("band"), col("chunk"), index.hashBuckets).as("bb"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val pruned = index.rows
      .filter(col(BandBucket).isin(buckets: _*))
      .select(col("band"), col("chunk"),
        col("id").as("base_id"), col("simhash").as("__graft_sim_b"))
    a.join(pruned, Seq("band", "chunk"))
      .dropDuplicates("new_id", "base_id")
      .withColumn("hamming",
        bit_count(col("__graft_sim_n").bitwiseXOR(col("__graft_sim_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("new_id", "base_id", "hamming")
  }

  /** 16-bit band rows (id, simhash, band, chunk) — shared by the
    * self-join ([[simhashPairs]]) and two-sided ([[simhashAgainst]])
    * candidate generation. */
  private def simhashBands(sim: DataFrame): DataFrame =
    sim.select(
      col("id"), col("simhash"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => call_function("shiftrightunsigned", col("simhash"), b * 16)
          .bitwiseAND(lit(0xFFFFL)))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")

  /** (id, simhash) — 64-bit fingerprint per document: xxhash64 per
    * token (one pass), then the codegen'd 64-bit majority-vote fold
    * ([[graft.functions.SimHash64]]).
    *
    * `portable = true` derives each token hash from md5 instead (first
    * 15 hex chars → a 60-bit long, via the codegen'd
    * [[graft.functions.Md5Prefix60Array]]) so the driver's DuckDB
    * oracle can recompute identical fingerprints; the fold is unchanged
    * and the 4 permanently-clear top bits don't affect banding or
    * Hamming. */
  def withSimhash(df: DataFrame, idCol: String, textCol: String,
      portable: Boolean = false): DataFrame = {
    def tokenHashes(ws: Column): Column =
      if (portable) graft.functions.HashFunctions.md5Prefix60Array(ws)
      else transform(ws, w => xxhash64(w))
    // The hash-family flag rides the column as METADATA (it survives
    // select/persist/parquet round trips), so simhashAgainst can
    // VALIDATE that an index was built with the family it is being
    // served with — fingerprints from different families never match
    // meaningfully, and without the tag a mismatch silently yields
    // empty/garbage near-dup results.
    val md = new org.apache.spark.sql.types.MetadataBuilder()
      .putBoolean("graft.simhash.portable", portable).build()
    OpsUtil.widen(df)
      .select(col(idCol).as("id"),
        TextOps.tokens(TextOps.normalized(col(textCol))).as("ws"))
      .select(col("id"), tokenHashes(col("ws")).as("hs"))
      .select(col("id"),
        graft.functions.HashFunctions.simhash64(col("hs")).as("simhash", md))
  }

  /** Fail fast when `df`'s fingerprint column carries build-parameter
    * metadata that contradicts the serve call's parameters. A frame
    * WITHOUT the tags (e.g. an index persisted by an engine that
    * strips Spark field metadata, or hand-built rows) passes
    * unvalidated — for those the must-match contract is documentation
    * only, so prefer frames produced by this engine's builders. */
  private def checkBuildParams(
      df: DataFrame, fpCol: String, op: String,
      expected: Seq[(String, Any)]): Unit = {
    val md = df.schema(fpCol).metadata
    expected.foreach { case (key, want) =>
      if (md.contains(key)) {
        val got: Any = want match {
          case _: Boolean => md.getBoolean(key)
          case _: Long    => md.getLong(key)
          case other      => sys.error(s"unsupported param type: $other")
        }
        require(got == want,
          s"$op: the index was built with $key=$got but is being served " +
            s"with $key=$want — matching build/serve parameters are " +
            "required (fingerprints from different parameters never " +
            "match meaningfully)")
      }
    }
  }

  /** Embedding-cosine near-duplicate pairs: (id_a, id_b, cos) with
    * id_a < id_b and cosine >= threshold. Exact O(n²) — the
    * verification baseline; at 100 TB the same verify step runs after
    * [[graft.ops.Similarity.lshBucket]] blocking so only same-bucket
    * pairs are scored. Integral-id frames (every graft caller) run the
    * blocked-GEMM kernel ([[ExactPairs.cosinePairs]]): identical
    * results, but the n² pair stage never materializes join rows —
    * pairs are scored and threshold-filtered inside B(B+1)/2 primitive-
    * loop tasks. Other id types keep the nested-loop reference plan. */
  def embeddingCosinePairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame =
    if (ExactPairs.eligible(df, idCol, None))
      ExactPairs.cosinePairs(df, idCol, vecCol, threshold)
    else embeddingCosinePairsNlj(df, idCol, vecCol, threshold)

  /** Reference nested-loop plan for [[embeddingCosinePairs]] — the
    * semantics contract the blocked kernel is parity-tested against,
    * and the fallback for non-integral id types. */
  private[graft] def embeddingCosinePairsNlj(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    import graft.ops.Similarity
    val v = OpsUtil.widen(df)
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("n", Similarity.norm(col("v")))
    val a = v.select(col("id").as("id_a"), col("v").as("va"), col("n").as("na"))
    val b = v.select(col("id").as("id_b"), col("v").as("vb"), col("n").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      // try_divide: zero-norm rows yield NULL cos (dropped by the
      // threshold filter) instead of an ANSI DIVIDE_BY_ZERO job abort
      .withColumn("cos",
        try_divide(Similarity.dot(col("va"), col("vb")), col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** SemDeDup-style semantic near-duplicate pairs: k-means-cluster the
    * embeddings (quantizer fit on a bounded hash sample, like the IVF
    * index build), then score pairwise cosine ONLY within each cluster.
    * Output matches [[embeddingCosinePairs]]: (id_a, id_b, cos),
    * id_a < id_b, cos >= threshold — minus the pairs whose endpoints
    * land in different clusters (the approximation's recall loss; a
    * cos-θ near-dup pair almost always shares its nearest centroid).
    *
    * Scale shape: clustering turns the O(n²) all-pairs scoring into n/k
    * independent cluster-local joins on a `cid` equi-key — the shuffle
    * key is the cluster id, per-cluster fan-in is bounded by the
    * cluster size, and no global pairwise stage exists at all. The
    * assignment itself is one codegen'd projection per row. */
  def semanticPairs(
      df: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, threshold: Double, probes: Int = 2): DataFrame = {
    import graft.functions.VectorFunctions
    import graft.ops.Similarity
    require(probes >= 1 && probes <= nCentroids)
    val cents = Similarity.ivfCentroids(df, idCol, vecCol, nCentroids)
    // Multi-probe assignment: each vector lands in its top-`probes`
    // centroid buckets, so a true cluster that the quantizer split
    // across two centroids still co-buckets its members (the k-means
    // local-optimum failure mode). probes² × the join fan-in, bought
    // back in recall — same dial as the multi-table LSH join.
    val topCids = {
      val scores = VectorFunctions.centroidScores(col("v"), cents.toSeq.map(_.toSeq))
      val idxed = zip_with(scores, sequence(lit(0), lit(cents.length - 1)),
        (s, i) => struct(s.as("s"), i.as("i")))
      slice(reverse(array_sort(idxed)), 1, probes)("i")
    }
    val v = OpsUtil.widen(df)
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull)
      .select(col("id"), explode(topCids).as("cid"),
        col("v"), Similarity.norm(col("v")).as("nrm"))
      .localCheckpoint(false) // both self-join sides read the assignment
    val a = v.select(col("cid"), col("id").as("id_a"), col("v").as("va"),
      col("nrm").as("na"))
    val b = v.select(col("cid"), col("id").as("id_b"), col("v").as("vb"),
      col("nrm").as("nb"))
    a.join(b, Seq("cid"))
      .filter(col("id_a") < col("id_b"))
      // try_divide: zero-norm rows → NULL cos, dropped by the filter
      .withColumn("cos",
        try_divide(Similarity.dot(col("va"), col("vb")), col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
      .distinct() // a pair co-bucketed under several probes emits once
  }

  /** Connected components over near-duplicate pairs — the step that
    * turns pairwise matches into "keep one document per cluster".
    * Iterative min-label propagation: every node repeatedly adopts the
    * smallest label among itself and its neighbors until fixpoint.
    * Output: (id, cluster) where cluster = min id reachable (only for
    * ids that appear in at least one pair).
    *
    * Scale: converges in O(component diameter) rounds and near-dup
    * clusters are shallow (pairs come from blocking, so components are
    * small cliques); each round is one join + one aggregate, with
    * per-round lineage truncation (plus a pointer-jump step, so long
    * chains close in O(log diameter) rounds — the same effect the
    * alternating large-star/small-star formulation buys).
    *
    * Durability dial (`scratchDir`) — identical to
    * [[graft.ops.Graph.pageRank]]'s: the default per-round
    * `localCheckpoint(true)` blocks are non-replicated, so on a real
    * cluster any executor loss mid-run kills the iteration chain.
    * With `scratchDir` set, edges and every round's label table are
    * written as scratch parquet under a UUID run dir (deleted at JVM
    * exit via Hadoop `FileSystem.deleteOnExit`) and read back —
    * label tables are 2 columns × |nodes|, tiny next to the pair
    * generation that feeds this, so the write amplification is noise.
    * Identical clusters in both modes.
    */
  def clusters(
      pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
      maxIter: Int = 25, scratchDir: Option[String] = None): DataFrame = {
    val persist = OpsUtil.scratchPersist(pairs, scratchDir, "graft-clusters")
    val edges = persist(
      pairs.select(col(idA).as("a"), col(idB).as("b"))
        .union(pairs.select(col(idB).as("a"), col(idA).as("b")))
        .distinct(), "edges")
    var labels = persist(edges.select(col("a").as("id")).distinct()
      .withColumn("cluster", col("id")), "labels-0")
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      // one hop: adopt the smallest label among self + neighbors
      val viaNeighbor = edges.join(labels, edges("b") === labels("id"))
        .groupBy(edges("a").as("nid")).agg(min(col("cluster")).as("ncluster"))
      val stepped = labels.join(viaNeighbor, labels("id") === viaNeighbor("nid"), "left")
        .select(labels("id"),
          least(labels("cluster"), coalesce(col("ncluster"), labels("cluster"))).as("cluster"),
          labels("cluster").as("__graft_old"))
      // pointer jump: adopt the label's label — halves the remaining
      // distance to the component min each round (O(log diameter) total,
      // which matters for chain-shaped components)
      val parents = stepped.select(col("id").as("pid"), col("cluster").as("pcluster"))
      val jumped = persist(
        stepped.join(parents, stepped("cluster") === parents("pid"), "left")
          .select(stepped("id"),
            least(stepped("cluster"), coalesce(col("pcluster"), stepped("cluster"))).as("cluster"),
            col("__graft_old")),
        s"labels-${it + 1}")
      changed = jumped.filter(col("cluster") =!= col("__graft_old")).count()
      labels = jumped.select("id", "cluster")
      it += 1
    }
    labels
  }

  /** Benchmark decontamination: training documents sharing at least
    * `minShared` distinct shingles with ANY document of the evaluation
    * set. The eval shingle set is distinct'd first (typically small —
    * benchmarks are thousands of docs, not billions) so the semi-join
    * broadcasts under AQE; the training corpus streams through it
    * map-side, one aggregate on doc id after. The standard pipeline
    * removes (or flags) the returned ids before training. */
  def contamination(
      train: DataFrame, eval: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, minShared: Int = 3): DataFrame = {
    val evalShingles = contaminationShingles(eval, idCol, textCol, shingleN)
      .select("sh").distinct()
    contaminationShingles(train, idCol, textCol, shingleN)
      .join(evalShingles, Seq("sh"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .withColumnRenamed("id", "doc_id")
  }

  /** The (id, distinct shingle) explode shared by [[contamination]]
    * and [[contaminationBloom]] — ONE copy of the normalize → tokenize
    * → shingle pipeline so the two variants cannot drift. */
  private def contaminationShingles(
      d: DataFrame, idCol: String, textCol: String, shingleN: Int): DataFrame =
    OpsUtil.widen(d)
      .select(col(idCol).as("id"),
        TextOps.tokens(TextOps.normalized(col(textCol))).as("ws"))
      .select(col("id"),
        explode(array_distinct(TextOps.shingles(col("ws"), shingleN))).as("sh"))

  /** [[contamination]] behind a broadcast Bloom prefilter — the 100 TB
    * scale path. The plain form broadcast-semi-joins the distinct eval
    * shingle STRINGS; once a benchmark suite accumulates tens of
    * millions of distinct shingles that hash relation outgrows the
    * broadcast threshold and the semi-join degrades to a full shuffle
    * of the exploded training corpus — the thing that must never
    * happen at scale. Here the eval shingles reduce to a Bloom sketch
    * (~1.2 bytes/item at 1% fpp vs tens of bytes per broadcast-hash
    * entry), the corpus streams through the sketch MAP-SIDE, and only
    * the survivors — true matches plus the fpp tail — reach the exact
    * semi-join: it broadcasts while the eval table fits, and past
    * that threshold it shuffles ~1/fpp less volume than the plain
    * form's full-corpus shuffle. Bloom filters have
    * no false negatives and every candidate is re-checked exactly, so
    * the output is bit-identical to [[contamination]] and shares its
    * exact SQL oracle; `fpp` only moves prefilter cost. The probe is
    * the codegen'd [[graft.functions.BloomMightContain]] expression
    * (the sketch rides in the plan, Spark's own runtime-filter
    * mechanism) and sits OUTSIDE the value path — everything it
    * passes is re-verified relationally. */
  def contaminationBloom(
      train: DataFrame, eval: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, minShared: Int = 3, fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"contaminationBloom: fpp not in (0,1): $fpp")
    // Materialized once, reused thrice (sizing count, sketch build,
    // exact re-check) — all on the already-distinct SMALL side; the
    // corpus is never counted.
    val evalShingles = contaminationShingles(eval, idCol, textCol, shingleN)
      .select("sh").distinct().localCheckpoint(false)
    val nEval = math.max(1L, evalShingles.count())
    val bloom = evalShingles.stat.bloomFilter("sh", nEval, fpp)
    contaminationShingles(train, idCol, textCol, shingleN)
      .filter(graft.functions.HashFunctions // map-side, zero shuffle, codegen'd
        .bloomMightContain(col("sh"), bloom))
      .join(evalShingles, Seq("sh"), "left_semi") // exact re-check of survivors
      .groupBy("id").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .withColumnRenamed("id", "doc_id")
  }

  /** Exact n-gram Jaccard similarity for co-shingled pairs:
    * J(A,B) = |A∩B| / (|A|+|B|-|A∩B|), computed by exploding distinct
    * shingles and counting shared ones per pair (only pairs that share
    * at least one shingle are ever materialized).
    *
    * `maxDf` is the stop-shingle cap: shingles appearing in more than
    * `maxDf` documents are dropped before the self-join (from both the
    * intersection AND the per-doc sizes, so Jaccard stays consistent
    * over the capped shingle space). Without it, one corpus-common
    * boilerplate shingle shared by m documents puts m² candidate pairs
    * on a single shuffle key — the quadratic hot-key trap at web-corpus
    * scale. The hot set is tiny by construction (only shingles with
    * df > cap), so it broadcasts: one extra agg, no extra shuffle of
    * the exploded shingles. */
  /** Winnow-overlap candidate pairs (the MOSS report): documents
    * sharing at least `minShared` winnowed k-gram fingerprints. The
    * winnowing guarantee makes this a RECALL-complete blocking stage
    * for substring plagiarism: any shared run of ≥ w+k−1 chars
    * contributes a shared fingerprint, while only ~2/(w+1) of windows
    * are ever keyed. Same scale shape as [[ngramJaccard]] — per-row
    * codegen'd fingerprint projection, self-join blocked on the 8-byte
    * fingerprint (never text), `maxDf` drops corpus-ubiquitous
    * fingerprints (boilerplate) before the join so no key goes
    * quadratic; the hot set is tiny by construction and the planner
    * broadcasts the anti-join when it fits. `portable = true` uses the
    * mod-p arithmetic whose SQL mirror the oracle runs verbatim.
    *
    * The default `minShared = 1` preserves that guarantee; raising it
    * trades the recall away for precision (a minimal w+k−1 shared run
    * may contribute exactly one fingerprint). */
  def winnowOverlap(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 16, minShared: Int = 1,
      maxDf: Int = Int.MaxValue, portable: Boolean = false): DataFrame = {
    // Consumed by the df-cap aggregate and both self-join sides —
    // materialize the exploded fingerprints once.
    val fps = capHotFps(
      winnowFingerprints(df, idCol, textCol, k, w, portable)
        .localCheckpoint(false),
      maxDf)
    fps.as("x").join(fps.as("y"), Seq("fp"))
      .filter(col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** The persistable WINNOW fingerprint index: exploded (id, fp) rows
    * of a corpus — the substring-level member of the
    * fit-once/serve-many dedup family (minhash = document-level
    * near-dup, exact = whole-document, SimHash = cheap token-level;
    * this one carries the MOSS substring guarantee: any shared run of
    * ≥ w+k−1 chars contributes a shared fingerprint). Persist with
    * [[saveWinnowFingerprints]]; check arrivals with
    * [[winnowAgainst]]. ~2/(w+1) of windows are keyed, so the index
    * is a small fraction of corpus length × 8 bytes. */
  def winnowFingerprints(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 16, portable: Boolean = false): DataFrame = {
    import graft.functions.RollingHashFunctions
    val fpCol =
      if (portable) RollingHashFunctions.winnowedFingerprintsPortable(col(textCol), k, w)
      else RollingHashFunctions.winnowedFingerprints(col(textCol), k, w)
    // Build parameters ride the fp column as metadata (the withSimhash
    // pattern) so winnowAgainst can validate that serve-side (k, w,
    // portable) match what the index was built with.
    val md = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.winnow.k", k.toLong)
      .putLong("graft.winnow.w", w.toLong)
      .putBoolean("graft.winnow.portable", portable).build()
    // metadata goes on a SECOND projection: an alias directly on the
    // generator resolves through MultiAlias, which drops it
    OpsUtil.widen(df).select(col(idCol).as("id"), explode(fpCol).as("fp"))
      .select(col("id"), col("fp").as("fp", md))
  }

  /** Persist a winnow fingerprint index as parquet. */
  def saveWinnowFingerprints(fps: DataFrame, path: String): Unit =
    fps.select(col("id"), col("fp")).write.mode("overwrite").parquet(path)

  /** Load a persisted winnow fingerprint index. */
  def loadWinnowFingerprints(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select(col("id"), col("fp"))

  /** A persisted, fp-bucketed WINNOW index — the serve-optimal layout
    * of the substring fingerprint table (the [[SimhashBandIndex]]
    * argument applied to the winnow face): (id, fp) rows land in
    * fp-hash partition directories so a serve reads only the
    * partitions the ARRIVAL batch's fingerprints fall into, and each
    * row carries its fingerprint's document frequency `df`, computed
    * ONCE at build — the serve-time hot-fingerprint cap
    * ([[capBaseFps]]'s per-serve aggregate over the whole index, the
    * face's other index-proportional cost) becomes a stored-column
    * filter, with `maxDf` still a serve-time knob (the
    * [[graft.ops.Retrieval.Bm25Index]] k1/b argument). Build
    * parameters (k, w, family) are captured from the frame's own
    * `graft.winnow.*` tags and arrivals are fingerprinted WITH THEM
    * at serve — a build/serve mismatch is structurally impossible.
    * Maintenance: REBUILD, not append — the stored `df` is a global
    * aggregate (an appended batch's copies of an existing fingerprint
    * would leave history rows under-counted), and the rebuild's input
    * is the flat fingerprint table ∪ the batch's, never the corpus. */
  final case class WinnowFpIndex(
      rows: DataFrame, k: Int, w: Int, portable: Boolean, hashBuckets: Int)

  /** fp → partition bucket of the fp-bucketed winnow layout (also the
    * exact layout's content-hash bucket; the shared
    * [[OpsUtil.hashBucket]]). */
  private def fpBucket(fp: Column, n: Int): Column =
    OpsUtil.hashBucket(n, fp)

  /** Build + persist a [[WinnowFpIndex]] from a
    * [[winnowFingerprints]] / [[loadWinnowFingerprints]] table. Size
    * `nHashBuckets` to the corpus (constant per-bucket bytes): serve
    * scan ≈ |arrival fingerprints| × bucket size, flat as history
    * grows. Requires the frame's `graft.winnow.*` build tags (present
    * on every [[winnowFingerprints]] output and preserved through
    * parquet). */
  def saveWinnowFpIndex(
      fps: DataFrame, path: String, nHashBuckets: Int = 64): Unit = {
    require(nHashBuckets > 0, "saveWinnowFpIndex: nHashBuckets must be > 0")
    val md = fps.schema("fp").metadata
    require(md.contains("graft.winnow.k") && md.contains("graft.winnow.w") &&
        md.contains("graft.winnow.portable"),
      "saveWinnowFpIndex: the fingerprint frame carries no graft.winnow.* " +
        "build tags — build the index from winnowFingerprints/" +
        "loadWinnowFingerprints output so the serve can fingerprint " +
        "arrivals with the index's own (k, w, family)")
    val rows = fps.select(col("id"), col("fp"))
    val dfs = rows.groupBy("fp").agg(count(lit(1)).as("df"))
    rows.join(dfs, Seq("fp"))
      .withColumn(BandBucket, fpBucket(col("fp"), nHashBuckets))
      .repartition(nHashBuckets, col(BandBucket))
      .write.mode("overwrite").partitionBy(BandBucket)
      .parquet(s"$path/fps")
    val spark = fps.sparkSession
    import spark.implicits._
    Seq((md.getLong("graft.winnow.k").toInt, md.getLong("graft.winnow.w").toInt,
        md.getBoolean("graft.winnow.portable"), nHashBuckets))
      .toDF("k", "w", "portable", "hash_buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Load a persisted [[WinnowFpIndex]] (inverse of
    * [[saveWinnowFpIndex]]). */
  def loadWinnowFpIndex(
      spark: org.apache.spark.sql.SparkSession, path: String): WinnowFpIndex = {
    val st = spark.read.parquet(s"$path/stats").head()
    WinnowFpIndex(spark.read.parquet(s"$path/fps"),
      st.getInt(0), st.getInt(1), st.getBoolean(2), st.getInt(3))
  }

  /** [[winnowAgainst]] against a persisted [[WinnowFpIndex]] —
    * IDENTICAL output (new_id, base_id, n_shared ≥ minShared) to
    * serving the flat fingerprint table with the same `maxDf`
    * (oracle-pinned: dedup_winnow_serve shares
    * dedup_winnow_incremental's SQL verbatim), different physics:
    * arrivals are fingerprinted with the index's own (k, w, family),
    * their fp bucket set collects to the driver (≤ `hashBuckets`
    * distinct ints) and prunes index partitions STATICALLY, and the
    * df-cap filters the STORED per-fingerprint document frequency —
    * no per-serve aggregate over the index, no full-index scan. */
  def winnowAgainst(
      newDocs: DataFrame, index: WinnowFpIndex, idCol: String,
      textCol: String, minShared: Int, maxDf: Int): DataFrame =
    winnowAgainstStaged(
      winnowFingerprints(newDocs, idCol, textCol, index.k, index.w,
        index.portable)
        .localCheckpoint(false), // feeds the bucket collect AND the join
      index, minShared, maxDf)

  /** [[winnowAgainst]] over already-STAGED arrival fingerprints (a
    * [[winnowFingerprints]] output built with the index's (k, w,
    * family), made stable by the caller — the [[exactAgainstStaged]]
    * contract). */
  private[graft] def winnowAgainstStaged(
      a: DataFrame, index: WinnowFpIndex,
      minShared: Int, maxDf: Int): DataFrame = {
    val buckets = a.select(fpBucket(col("fp"), index.hashBuckets).as("bb"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val pruned = index.rows.filter(col(BandBucket).isin(buckets: _*))
    val capped =
      if (maxDf == Int.MaxValue) pruned else pruned.filter(col("df") <= maxDf)
    a.as("x").join(capped.as("y"), Seq("fp"))
      .groupBy(col("x.id").as("new_id"), col("y.id").as("base_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** [[capHotFps]] over a loaded index's (id, fp) projection — the
    * base-side pre-cap [[winnowAgainst]] applies and
    * [[graft.streaming.StreamingOps.winnowStream]] hoists out of the
    * micro-batch loop (it depends only on the index). */
  private[graft] def capBaseFps(baseFps: DataFrame, maxDf: Int): DataFrame =
    capHotFps(baseFps.select(col("id"), col("fp")), maxDf)

  /** Drop fingerprints appearing in more than `maxDf` rows of `fps`
    * (corpus-ubiquitous boilerplate — m occurrences → m² pairs on one
    * shuffle key). Shared by the self-join and two-sided paths. */
  private def capHotFps(fps: DataFrame, maxDf: Int): DataFrame =
    if (maxDf == Int.MaxValue) fps
    else {
      val hot = fps.groupBy("fp").agg(count(lit(1)).as("df"))
        .filter(col("df") > maxDf).select("fp")
      fps.join(hot, Seq("fp"), "left_anti")
    }

  /** Substring-overlap report of an arrival batch against a PERSISTED
    * winnow index — "which arrivals copy runs from the reference
    * corpus, and how much": (new_id, base_id, n_shared) per cross
    * pair with at least `minShared` shared fingerprints. The
    * recall guarantee is [[winnowOverlap]]'s (any shared run of
    * ≥ w+k−1 chars shows up), and `k`/`w` MUST match the values the
    * index was built with (fingerprints from different (k, w) never
    * collide meaningfully). The df-cap applies to the BASE side only
    * — it is cadence-independent there (the
    * [[minhashLshAgainst]] base-cap argument); arrival batches are
    * small by definition. History is never re-fingerprinted. */
  def winnowAgainst(
      newDocs: DataFrame, baseFps: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 16, minShared: Int = 1,
      maxDf: Int = Int.MaxValue, portable: Boolean = false): DataFrame = {
    // Validated against the index's own metadata tags (stamped by
    // winnowFingerprints, preserved through save/load) — a (k, w,
    // portable) mismatch never collides meaningfully and would
    // otherwise silently report zero overlap.
    checkBuildParams(baseFps, "fp", "winnowAgainst", Seq(
      "graft.winnow.k" -> k.toLong,
      "graft.winnow.w" -> w.toLong,
      "graft.winnow.portable" -> portable))
    val base = capBaseFps(baseFps, maxDf)
    winnowFingerprints(newDocs, idCol, textCol, k, w, portable).as("x")
      .join(base.as("y"), Seq("fp"))
      .groupBy(col("x.id").as("new_id"), col("y.id").as("base_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Fuzzy near-dup pairs by bounded edit distance under prefix
    * blocking — the cheap "typo-level duplicate" detector that catches
    * what exact hashing misses without shingling at all.
    *
    * Scale shape: candidate generation is an equi-join on the
    * normalized `blockChars`-prefix (never all-pairs); per-pair cost is
    * bounded by comparing only `compareChars`-prefixes with Spark's
    * thresholded `levenshtein(l, r, maxDist)` — the banded O(maxDist ·
    * len) variant that bails out early instead of filling the full
    * O(len²) matrix. Blocks hotter than `maxBlock` members (boilerplate
    * openings: m members → m² pairs on one shuffle key) are dropped
    * up front, the same df-cap guard as the shingle joins.
    */
  def fuzzyLevenshtein(
      df: DataFrame, idCol: String, textCol: String,
      blockChars: Int = 16, compareChars: Int = 80, maxDist: Int = 20,
      maxBlock: Int = Int.MaxValue): DataFrame = {
    require(blockChars > 0 && compareChars >= blockChars && maxDist >= 0)
    val norm = TextOps.normalized(col(textCol))
    val baseRaw = OpsUtil.widen(df)
      .select(col(idCol).as("id"),
        substring(norm, 1, blockChars).as("blk"),
        substring(norm, 1, compareChars).as("pfx"))
      .localCheckpoint(false) // consumed by both self-join sides (+ cap agg)
    val base =
      if (maxBlock == Int.MaxValue) baseRaw
      else {
        val hot = baseRaw.groupBy("blk").agg(count(lit(1)).as("m"))
          .filter(col("m") > maxBlock).select("blk")
        baseRaw.join(broadcast(hot), Seq("blk"), "left_anti")
      }
    base.as("x").join(base.as("y"), Seq("blk"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        levenshtein(col("x.pfx"), col("y.pfx"), maxDist).as("dist"))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
  }

  /** Shared exact pair core for [[ngramJaccard]] and
    * [[ngramContainment]]: (id_a < id_b, n_inter, n_a, n_b) for every
    * co-shingled pair over the df-capped shingle space — ONE copy of
    * the tokenize/shingle/cap/self-join machinery so the two scores
    * cannot drift.
    *
    * The exploded shingle table is consumed by the two self-join
    * sides, the per-doc sizes, and (when capped) the df aggregate —
    * materialize it once rather than re-tokenizing the corpus per
    * consumer. (Exact pairwise scoring is the verification-scale
    * operator; minhashLsh is the 100 TB path, whose materialized
    * intermediate is the far smaller signature table.)
    * Shingle TEXT never leaves the scan stage: every downstream key
    * (df-cap aggregate, both self-join sides) is the 8-byte xxhash64
    * of the shingle — distinct-per-doc first, so a hash collision
    * could only merge two different shingles corpus-wide (~n²/2⁶⁴,
    * negligible even at 100 TB), and the shuffle carries fixed-width
    * keys at a third of the raw-string wire size. */
  private def ngramPairCounts(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, maxDf: Int): DataFrame = {
    val shRaw = OpsUtil.widen(df)
      .select(col(idCol).as("id"),
        TextOps.tokens(TextOps.normalized(col(textCol))).as("ws"))
      .select(col("id"),
        explode(array_distinct(TextOps.shingles(col("ws"), shingleN))).as("sh_txt"))
      .select(col("id"), xxhash64(col("sh_txt")).as("sh"))
      .localCheckpoint(false)
    val sh =
      if (maxDf == Int.MaxValue) shRaw
      else {
        val hot = shRaw.groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDf).select("sh")
        shRaw.join(broadcast(hot), Seq("sh"), "left_anti")
      }
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    sh.as("x").join(sh.as("y"), Seq("sh"))
      .filter(col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
  }

  def ngramJaccard(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, threshold: Double = 0.5,
      maxDf: Int = Int.MaxValue): DataFrame =
    ngramPairCounts(df, idCol, textCol, shingleN, maxDf)
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")

  /** Max-containment near-dup pairs (Broder's containment, taken in
    * the subsumption direction): |A∩B| / min(|A|, |B|) over distinct
    * n-gram shingles — 1.0 exactly when the smaller document's
    * shingles are a subset of the larger's. This is the score that
    * catches QUOTED and SUBSUMED documents (a 50-shingle doc embedded
    * verbatim in a 5000-shingle doc has Jaccard ≈ 0.01 — invisible at
    * any sane Jaccard threshold — but containment 1.0). Same shingle
    * space, df-cap, and hash-blocked self-join as [[ngramJaccard]]
    * (one shared core); same scale posture. */
  def ngramContainment(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, threshold: Double = 0.8,
      maxDf: Int = Int.MaxValue): DataFrame =
    ngramPairCounts(df, idCol, textCol, shingleN, maxDf)
      .withColumn("containment",
        col("n_inter").cast("double") /
          least(col("n_a"), col("n_b")).cast("double"))
      .filter(col("containment") >= threshold)
      .select("id_a", "id_b", "containment")
}
