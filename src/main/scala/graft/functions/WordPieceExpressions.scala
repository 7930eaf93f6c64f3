package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece greedy longest-match-first segmentation with a FIXED,
  * already-trained vocabulary (the inference half of a WordPiece
  * tokenizer; training lives in [[graft.ops.WordPiece]] and is a Spark
  * aggregation + driver merge loop, not an expression). Input is
  * whitespace-normalized text; per word, the scanner repeatedly takes
  * the LONGEST vocabulary piece matching at the cursor — word-initial
  * pieces match bare, word-internal pieces match under the standard
  * `##` continuation prefix — the BERT "maximal munch" convention. If
  * no piece matches at some cursor (or the word exceeds `maxWordCp`
  * codepoints), the WHOLE word degrades to the single `unk` token and
  * any partial pieces are discarded, exactly the reference WordPiece
  * contract (partial emission would silently corrupt token statistics
  * downstream).
  *
  * The vocabulary rides along as a reference object (the BpeSegment /
  * ANN-codebook pattern): at 100 TB segmentation is an embarrassingly
  * parallel projection, zero shuffle, no driver-side tokenizer
  * service. Lookup is one hash-set probe per (cursor, candidate
  * length), lengths capped by the longest piece actually in the
  * vocabulary, so cost is O(word_cp × max_piece_cp) with zero
  * allocation beyond the emitted tokens.
  */
case class WordPieceSegment(
    child: Expression, vocab: Seq[String], unk: String, maxWordCp: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_wordpiece_segment"

  // Built once per executor when the expression deserializes; shared
  // by every row the task evaluates.
  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }

  /** Longest piece length in CODEPOINTS (continuation `##` prefix
    * excluded — it never consumes input), bounding the inner scan. */
  @transient private lazy val maxPieceCp: Int = {
    var m = 1
    vocab.foreach { p =>
      val body = if (p.startsWith("##")) p.substring(2) else p
      val cp = body.codePointCount(0, body.length)
      if (cp > m) m = cp
    }
    m
  }

  /** Greedy longest-match segmentation of one word. Returns null when
    * the word degrades to `unk` (caller emits the unk token). Index
    * arithmetic is in UTF-16 code units but every candidate boundary
    * comes from offsetByCodePoints, so supplementary-plane characters
    * never shear (the BpeSegment codepoint contract). */
  private def segmentWord(w: String): Array[String] = {
    val nCp = w.codePointCount(0, w.length)
    if (nCp > maxWordCp) return null
    val out = Array.newBuilder[String]
    var start = 0 // code-unit index
    while (start < w.length) {
      // Longest-first: walk candidate END boundaries from the widest
      // in-range codepoint span down to one codepoint.
      val remainCp = w.codePointCount(start, w.length)
      var lenCp = math.min(maxPieceCp, remainCp)
      var matched: String = null
      var matchedEnd = -1
      while (matched == null && lenCp >= 1) {
        val end = w.offsetByCodePoints(start, lenCp)
        val body = w.substring(start, end)
        val cand = if (start == 0) body else "##" + body
        if (vocabSet.contains(cand)) { matched = cand; matchedEnd = end }
        lenCp -= 1
      }
      if (matched == null) return null // whole word → unk
      out += matched
      start = matchedEnd
    }
    out.result()
  }

  /** Shared by interpreted eval and codegen. */
  def segment(str: UTF8String): GenericArrayData = {
    val words = str.toString.split(' ').filter(_.nonEmpty)
    val out = Array.newBuilder[UTF8String]
    words.foreach { w =>
      val syms = segmentWord(w)
      if (syms == null) out += UTF8String.fromString(unk)
      else syms.foreach(s => out += UTF8String.fromString(s))
    }
    new GenericArrayData(out.result())
  }

  override def nullSafeEval(input: Any): Any =
    segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self =
      ctx.addReferenceObj("wpSegment", this, classOf[WordPieceSegment].getName)
    nullSafeCodeGen(ctx, ev, str => s"${ev.value} = $self.segment($str);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordPieceSegment = copy(child = newChild)
}

object WordPieceFunctions {
  /** WordPiece tokens of normalized `text` under a frozen vocabulary. */
  def wordPieceTokens(
      text: Column, vocab: Seq[String], unk: String,
      maxWordCp: Int): Column =
    Bridge.column(WordPieceSegment(Bridge.expression(text), vocab, unk, maxWordCp))
}
