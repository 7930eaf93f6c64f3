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

object UnigramFunctions {
  /** Viterbi tokens of normalized `text` under a trained piece table.
    * `pieces` maps piece → log-probability; single codepoints absent
    * from the table score `unkLogp`. */
  def unigramTokens(
      text: Column, pieces: Seq[(String, Double)],
      unkLogp: Double, maxPieceLen: Int): Column =
    Bridge.column(
      UnigramSegment(Bridge.expression(text), pieces, unkLogp, maxPieceLen))
}
