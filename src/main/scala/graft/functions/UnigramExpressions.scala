package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) Viterbi segmentation with a FIXED,
  * already-trained piece table (the inference half of a unigram
  * tokenizer; training lives in [[graft.ops.Unigram]] and is a
  * dictionary-reduce plus a driver-side EM loop, not an expression).
  *
  * Input is whitespace-normalized text; each word is segmented
  * independently (pieces never cross word boundaries) into the
  * sequence of vocabulary pieces maximizing the sum of piece
  * log-probabilities. Any single codepoint absent from the table
  * scores `unkLogp`, so coverage is total and segmentation never
  * fails. Ties prefer the LONGER suffix piece at each DP cell (fewer
  * tokens), which makes the output a pure function of (text, table).
  *
  * The piece table rides along as a reference object (the BpeSegment /
  * ANN-codebook pattern): at 100 TB segmentation is an embarrassingly
  * parallel projection, zero shuffle, no driver-side tokenizer
  * service.
  */
case class UnigramSegment(
    child: Expression,
    pieces: Seq[(String, Double)],
    unkLogp: Double,
    maxPieceLen: Int)
    extends UnaryExpression {

  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1 (got $maxPieceLen)")
  require(java.lang.Double.isFinite(unkLogp),
    s"unkLogp must be finite (got $unkLogp) — it is the total-coverage guarantee")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_unigram_segment"

  // Executor-local lookup; rebuilt after deserialization.
  @transient private lazy val table: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
    pieces.foreach { case (p, lp) => m.put(p, lp) }
    m
  }

  private def segmentWord(w: String): Array[String] = {
    // Codepoint symbols, not UTF-16 code units (the BpeSegment rule):
    // a char-wise DP would shear supplementary-plane characters into
    // lone surrogates that mangle on UTF-8 re-encode.
    val syms: Array[String] = w.codePoints().toArray
      .map(cp => new String(Character.toChars(cp)))
    val n = syms.length
    if (n == 0) return Array.empty
    // Prefix strings so piece candidates are O(1) substring builds.
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1) // length of the winning suffix piece
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var len = 1
      val sb = new java.lang.StringBuilder
      // Build candidate suffixes incrementally from the SHORTEST so a
      // longer piece replaces an equal-scoring shorter one (>=).
      while (len <= maxPieceLen && len <= i) {
        sb.setLength(0)
        var j = i - len
        while (j < i) { sb.append(syms(j)); j += 1 }
        val piece = sb.toString
        val lp = table.get(piece)
        // A -Infinity table entry (an EM-underflowed piece the trainer
        // may legitimately export for a dominated single codepoint) is
        // treated as ABSENT: a 1-codepoint cell then takes the unk
        // fallback instead of poisoning the DP — otherwise a position
        // coverable only by that codepoint leaves best(n) = -Inf and
        // back(n) = 0, and backtracking would loop forever.
        val score =
          if (lp != null && !lp.doubleValue().isNegInfinity) lp.doubleValue()
          else if (len == 1) unkLogp
          else Double.NegativeInfinity
        if (score != Double.NegativeInfinity &&
            best(i - len) != Double.NegativeInfinity) {
          val cand = best(i - len) + score
          if (cand >= best(i)) { best(i) = cand; back(i) = len }
        }
        len += 1
      }
      i += 1
    }
    // Coverage is total (len-1 unk fallback) so best(n) is finite.
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = n
    while (pos > 0) {
      val len = back(pos)
      if (len <= 0) // unreachable by construction; never loop silently
        throw new IllegalStateException(
          s"graft_unigram_segment: no path to position $pos of '$w'")
      out += syms.slice(pos - len, pos).mkString
      pos -= len
    }
    out.reverseIterator.toArray
  }

  /** Shared by interpreted eval and codegen. */
  def segment(str: UTF8String): GenericArrayData = {
    val words = str.toString.split(' ').filter(_.nonEmpty)
    val out = Array.newBuilder[UTF8String]
    words.foreach { w =>
      segmentWord(w).foreach(s => out += UTF8String.fromString(s))
    }
    new GenericArrayData(out.result())
  }

  override def nullSafeEval(input: Any): Any =
    segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self =
      ctx.addReferenceObj("unigramSegment", this, classOf[UnigramSegment].getName)
    nullSafeCodeGen(ctx, ev, str => s"${ev.value} = $self.segment($str);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
}

/** Subword-regularization SAMPLING segmentation (Kudo 2018 §3, the
  * actual motivation for the unigram LM): instead of the single
  * Viterbi segmentation, draw one segmentation per word from the
  * posterior `P(seg)^alpha` by forward-filtering backward-sampling —
  * the training-data augmentation that makes subword models robust to
  * segmentation ambiguity.
  *
  * DETERMINISTIC sampling: the "randomness" is a splitmix64 hash of
  * (seed, word, position, step), so the output is a pure function of
  * (text, table, alpha, seed) — reproducible across runs, partitions,
  * and engines, like every other sampler in this repo. `alpha`
  * sharpens (>1) or flattens (<1) the posterior; alpha → ∞ recovers
  * Viterbi, alpha = 0 samples segmentations uniformly by path weight.
  * Coverage contract and -Infinity handling are [[UnigramSegment]]'s.
  */
case class UnigramSegmentSampled(
    left: Expression,
    right: Expression, // per-row LongType salt (e.g. a hashed doc id)
    pieces: Seq[(String, Double)],
    unkLogp: Double,
    maxPieceLen: Int,
    alpha: Double,
    seed: Long)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1 (got $maxPieceLen)")
  require(java.lang.Double.isFinite(unkLogp),
    s"unkLogp must be finite (got $unkLogp) — it is the total-coverage guarantee")
  require(alpha >= 0 && java.lang.Double.isFinite(alpha),
    s"alpha must be finite and >= 0 (got $alpha)")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, org.apache.spark.sql.types.LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, bigint) inputs, got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_unigram_segment_sampled"

  @transient private lazy val table: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
    pieces.foreach { case (p, lp) => m.put(p, lp) }
    m
  }

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Uniform in [0, 1) from the deterministic stream: one fresh draw
    * per (row salt, word index within the row, boundary position). */
  private def unit(salt: Long, wordIdx: Int, pos: Int): Double = {
    val h = splitmix64(splitmix64(seed ^ salt)
      ^ (wordIdx.toLong << 32) ^ pos.toLong)
    (h >>> 11).toDouble / (1L << 53).toDouble
  }

  private def scoreOf(piece: String, len: Int): Double = {
    val lp = table.get(piece)
    if (lp != null && !lp.doubleValue().isNegInfinity) lp.doubleValue()
    else if (len == 1) unkLogp
    else Double.NegativeInfinity
  }

  private def segmentWord(w: String, salt: Long, wordIdx: Int): Array[String] = {
    val syms: Array[String] = w.codePoints().toArray
      .map(cp => new String(Character.toChars(cp)))
    val n = syms.length
    if (n == 0) return Array.empty
    // Forward: A(i) = logsumexp over len of A(i-len) + alpha * score.
    val A = new Array[Double](n + 1)
    java.util.Arrays.fill(A, Double.NegativeInfinity)
    A(0) = 0.0
    def lse(a: Double, b: Double): Double =
      if (a == Double.NegativeInfinity) b
      else if (b == Double.NegativeInfinity) a
      else { val m = math.max(a, b); m + math.log1p(math.exp(-math.abs(a - b))) }
    val cellScore = new Array[Double](n * maxPieceLen) // alpha-scaled
    var i = 1
    while (i <= n) {
      val sb = new java.lang.StringBuilder
      var len = 1
      while (len <= maxPieceLen && len <= i) {
        sb.insert(0, syms(i - len))
        val s = scoreOf(sb.toString, len)
        val as = if (s == Double.NegativeInfinity) s else alpha * s
        cellScore((i - 1) * maxPieceLen + (len - 1)) = as
        if (as != Double.NegativeInfinity &&
            A(i - len) != Double.NegativeInfinity)
          A(i) = lse(A(i), A(i - len) + as)
        len += 1
      }
      i += 1
    }
    // Backward sampling: at pos, pick len with prob
    // exp(A(pos-len) + alpha*s - A(pos)).
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = n
    while (pos > 0) {
      val u = unit(salt, wordIdx, pos)
      var acc = 0.0
      var chosen = -1
      var len = 1
      while (chosen < 0 && len <= maxPieceLen && len <= pos) {
        val as = cellScore((pos - 1) * maxPieceLen + (len - 1))
        if (as != Double.NegativeInfinity &&
            A(pos - len) != Double.NegativeInfinity) {
          acc += math.exp(A(pos - len) + as - A(pos))
          if (u < acc) chosen = len
        }
        len += 1
      }
      // float round-off can leave acc slightly below 1: fall back to
      // the LAST admissible length (never fails — coverage is total)
      if (chosen < 0) {
        var l = math.min(maxPieceLen, pos)
        while (chosen < 0 && l >= 1) {
          val as = cellScore((pos - 1) * maxPieceLen + (l - 1))
          if (as != Double.NegativeInfinity &&
              A(pos - l) != Double.NegativeInfinity) chosen = l
          l -= 1
        }
      }
      out += syms.slice(pos - chosen, pos).mkString
      pos -= chosen
    }
    out.reverseIterator.toArray
  }

  /** Shared by interpreted eval and codegen. */
  def segment(str: UTF8String, salt: Long): GenericArrayData = {
    val words = str.toString.split(' ').filter(_.nonEmpty)
    val out = Array.newBuilder[UTF8String]
    var wi = 0
    while (wi < words.length) {
      segmentWord(words(wi), salt, wi)
        .foreach(s => out += UTF8String.fromString(s))
      wi += 1
    }
    new GenericArrayData(out.result())
  }

  override def nullSafeEval(text: Any, salt: Any): Any =
    segment(text.asInstanceOf[UTF8String], salt.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj(
      "unigramSegmentSampled", this, classOf[UnigramSegmentSampled].getName)
    nullSafeCodeGen(ctx, ev,
      (str, salt) => s"${ev.value} = $self.segment($str, $salt);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UnigramSegmentSampled =
    copy(left = newLeft, right = newRight)
}

object UnigramFunctions {
  /** Viterbi tokens of normalized `text` under a trained piece table.
    * `pieces` maps piece → log-probability; single codepoints absent
    * from the table score `unkLogp`. */
  def unigramTokens(
      text: Column, pieces: Seq[(String, Double)],
      unkLogp: Double, maxPieceLen: Int): Column =
    Bridge.column(
      UnigramSegment(Bridge.expression(text), pieces, unkLogp, maxPieceLen))

  /** One posterior-sampled segmentation per word (subword
    * regularization), deterministic in (text, salt, table, alpha,
    * seed). `salt` is a per-row bigint (hash the row id) so identical
    * texts in different rows draw independent segmentations. */
  def unigramTokensSampled(
      text: Column, salt: Column, pieces: Seq[(String, Double)],
      unkLogp: Double, maxPieceLen: Int,
      alpha: Double, seed: Long): Column =
    Bridge.column(UnigramSegmentSampled(
      Bridge.expression(text), Bridge.expression(salt),
      pieces, unkLogp, maxPieceLen, alpha, seed))
}
