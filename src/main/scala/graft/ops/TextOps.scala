package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, shingling, quality scoring, language ID, document
  * fingerprinting. All pure `org.apache.spark.sql.functions` column
  * expressions (whole-stage-codegen friendly, no UDFs) — at 100 TB these
  * run as embarrassingly-parallel per-row projections with zero shuffle.
  */
object TextOps {

  /** Whitespace-normalized lowercase form used by exact dedup. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Whitespace word tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Word-frequency dictionary of the corpus — the reduce both
    * tokenizer trainers ([[Bpe.train]], [[Unigram.train]]) run on:
    * word-bounded statistics reduce the corpus EXACTLY to (distinct
    * word, count). `maxVocab` caps driver memory by FAILING FAST
    * before any driver bytes move (r10 advisory): the narrow dict
    * frame is staged once so one tokenization pass feeds both the
    * exact distributed count guard and — only when it passes — the
    * collect. */
  private[ops] def wordDict(
      df: DataFrame, textCol: String, maxVocab: Int,
      caller: String): Array[(String, Long)] = {
    val words = OpsUtil.widen(df)
      .select(explode(tokens(normalized(col(textCol)))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .localCheckpoint(false) // feeds the exact guard AND the collect
    val n = words.count()
    require(n <= maxVocab,
      s"$caller: corpus has $n distinct words (cap $maxVocab) — " +
        "train on a deterministic sample (Sampling.deterministicSample) " +
        "or raise maxVocab; silent truncation would change the result")
    words.collect().map(r => (r.getString(0), r.getLong(1)))
  }

  /** Corpus cleaning — the standard first stage of a pre-training
    * quality pipeline, as one codegen'd projection: strip URLs, strip
    * control characters, collapse runs of whitespace, trim. Regexes
    * are deliberately engine-portable (RE2-safe, no lookarounds) so
    * the oracle runs them verbatim. */
  def cleaned(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(text, "https?://[^\\s]+", " "),
        "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""),
      "\\s+", " "))

  /** Word n-gram shingles: `["a b c", "b c d", ...]` (1-based element_at). */
  def shingles(ws: Column, n: Int): Column = {
    val sh = transform(
      sequence(lit(1), size(ws) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + k)): _*))
    when(size(ws) >= n, sh).otherwise(array().cast("array<string>"))
  }

  /** Per-document statistics (token counts, type-token ratio, stopword
    * ratio, mean token length) — the quality-scoring building blocks.
    * The token array is staged as a real column first so the derived
    * stats read a materialized array instead of re-splitting the text
    * per stat (subexpression elimination is not guaranteed across
    * withColumn chains — the HOF re-evaluation pitfall). */
  def textStats(df: DataFrame, textCol: String, stopwords: Seq[String]): DataFrame = {
    val ws = col("__graft_ws")
    val stopArr = array(stopwords.map(lit): _*)
    df.withColumn("__graft_ws", tokens(col(textCol)))
      .withColumn("n_chars_txt", length(col(textCol)).cast("long"))
      .withColumn("n_tokens", size(ws).cast("long"))
      .withColumn("n_types", size(array_distinct(ws)).cast("long"))
      .withColumn("n_stopwords",
        size(filter(ws, w => array_contains(stopArr, w))).cast("long"))
      .withColumn("type_token_ratio",
        col("n_types").cast("double") / col("n_tokens").cast("double"))
      .withColumn("stopword_ratio",
        col("n_stopwords").cast("double") / col("n_tokens").cast("double"))
      .withColumn("mean_token_len",
        (col("n_chars_txt") - (col("n_tokens") - 1)).cast("double") /
          col("n_tokens").cast("double"))
      .drop("__graft_ws")
  }

  /** Marker-word language ID: score = number of tokens in each
    * language's marker list; argmax with deterministic tie order
    * (list order), 'und' when all scores are zero. A real system uses
    * char-n-gram models; the mechanism (pure column expressions,
    * no shuffle) is the point here. */
  def langId(text: Column, markers: Seq[(String, Seq[String])]): Column = {
    val ws = tokens(text)
    val scored = markers.map { case (lang, words) =>
      val arr = array(words.map(lit): _*)
      lang -> size(filter(ws, w => array_contains(arr, w)))
    }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und"): Column) { case ((lang, score), acc) =>
      when(score === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Regex token count — the BPE-ish pre-tokenizer shape (letter runs,
    * digit runs, single punctuation marks), the standard cheap proxy
    * for LLM token budgeting when the real tokenizer isn't on the
    * classpath. Pure codegen'd expression, no UDF. */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def tokenCountRegex(text: Column, pattern: String = BpeishPattern): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** PII redaction patterns — deliberately engine-portable (RE2-safe,
    * no lookarounds) so oracles run them verbatim. Order matters:
    * emails first (they contain dots and digits), then IPs (dotted
    * digits would otherwise half-match the phone pattern), then
    * phones. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern  = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhonePattern = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"

  /** Redact emails / IPv4s / phone numbers to sentinel tokens — the
    * standard pre-training scrub stage. One chained codegen'd
    * projection, zero shuffle, linear in text length. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** Count of matches for a PII pattern (audit / filtering signal:
    * docs over a PII budget get dropped rather than scrubbed). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Repetition-based quality signals (the Gopher/C4 family): fraction
    * of the document covered by its single most frequent token / bigram,
    * and the duplicate-trigram fraction. Per-row column expressions
    * only — the most-frequent-token count runs as an O(n log n) sort +
    * one linear fold over the token array (longest equal run), NOT an
    * O(n²) count-per-distinct-token scan, so a pathological 1M-token
    * document costs a sort, not a quadratic blowup. Zero shuffle. */
  def repetitionStats(df: DataFrame, textCol: String): DataFrame = {
    // Longest equal run in the sorted array = max multiplicity.
    def maxRun(arr: Column): Column =
      aggregate(
        array_sort(arr),
        struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
        (a, x) => {
          val run = when(x === a.getField("prev"), a.getField("run") + 1L)
            .otherwise(lit(1L))
          struct(x.as("prev"), run.as("run"),
            greatest(a.getField("best"), run).as("best"))
        },
        a => a.getField("best"))
    val ws = col("__graft_ws")
    val bg = col("__graft_bg")
    val tg = col("__graft_tg")
    OpsUtil.widen(df).withColumn("__graft_ws", tokens(col(textCol)))
      .withColumn("__graft_bg", shingles(col("__graft_ws"), 2))
      .withColumn("__graft_tg", shingles(col("__graft_ws"), 3))
      .withColumn("n_tokens", size(ws).cast("long"))
      .withColumn("top_token_frac",
        maxRun(ws).cast("double") / greatest(size(ws), lit(1)).cast("double"))
      .withColumn("top_bigram_frac",
        when(size(bg) > 0,
          maxRun(bg).cast("double") / size(bg).cast("double")).otherwise(0.0))
      .withColumn("dup_trigram_frac",
        when(size(tg) > 0,
          (size(tg) - size(array_distinct(tg))).cast("double") /
            size(tg).cast("double")).otherwise(0.0))
      .drop("__graft_ws", "__graft_bg", "__graft_tg")
  }

  /** Split documents into fixed-token-budget chunks with a stride
    * (stride < chunkTokens ⇒ overlapping windows — the RAG/context-
    * window prep shape). Emits one row per chunk with its index and
    * token count. Pure per-row explode: no shuffle, and the chunk
    * count per doc is ceil(n/stride) so output size is predictable
    * from the token histogram. */
  def chunk(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens)
    val ws = col("__graft_ws")
    val starts = sequence(lit(0), floor((size(ws) - 1) / stride).cast("int"))
    OpsUtil.widen(df).withColumn("__graft_ws", tokens(col(textCol)))
      .select(col(idCol), ws,
        posexplode(transform(starts, st => st * stride)).as(Seq("chunk_idx", "__graft_st")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        concat_ws(" ", slice(ws, col("__graft_st") + 1, lit(chunkTokens))).as("chunk_text"),
        least(lit(chunkTokens), size(ws) - col("__graft_st")).cast("long").as("n_chunk_tokens"))
  }

  /** Document fingerprint: lexicographic min of md5 over word n-gram
    * shingles — a 1-permutation MinHash usable as a near-dup blocking
    * key and content fingerprint. `ws` must be a materialized token
    * array column (see [[tokens]]); passing the raw tokenize expression
    * here would re-run it per element access. */
  def fingerprint(ws: Column, n: Int): Column =
    array_min(transform(shingles(ws, n), s => md5(s)))
}
