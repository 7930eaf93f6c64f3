package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding segmentation with a FIXED, already-trained merge
  * rule list (the inference half of a BPE tokenizer; training lives in
  * [[graft.ops.Bpe]] and is a Spark aggregation loop, not an
  * expression). Input is whitespace-normalized text; each word starts
  * as its character symbols and the rules apply IN RANK ORDER, each
  * merging all its adjacent occurrences left-to-right in one pass —
  * the standard BPE convention. Merges never cross word boundaries.
  *
  * `emitPairs = false` → the word's final tokens, flattened across
  * words. `emitPairs = true` → every adjacent symbol pair as
  * "a b" strings (the statistic the next training round counts) —
  * both from the same single segmentation pass.
  *
  * The rule list rides along as a reference object (like the ANN
  * codebooks): at 100 TB segmentation is an embarrassingly parallel
  * projection, zero shuffle, no driver-side tokenizer service.
  */
case class BpeSegment(
    child: Expression, rules: Seq[(String, String)], emitPairs: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_bpe_segment"

  private def segmentWord(w: String): Array[String] = {
    // Split by Unicode CODE POINTS, not UTF-16 code units: a char-wise
    // split would shear supplementary-plane characters (emoji etc.)
    // into lone surrogates that mangle on UTF-8 re-encode — and
    // diverge from the oracle's codepoint-based substr.
    var syms: Array[String] = w.codePoints().toArray
      .map(cp => new String(Character.toChars(cp)))
    rules.foreach { case (a, b) =>
      if (syms.length >= 2) {
        val out = Array.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
    }
    syms
  }

  /** Shared by interpreted eval and codegen. */
  def segment(str: UTF8String): GenericArrayData = {
    val words = str.toString.split(' ').filter(_.nonEmpty)
    val out = Array.newBuilder[UTF8String]
    words.foreach { w =>
      val syms = segmentWord(w)
      if (emitPairs) {
        var i = 0
        while (i + 1 < syms.length) {
          out += UTF8String.fromString(syms(i) + " " + syms(i + 1)); i += 1
        }
      } else syms.foreach(s => out += UTF8String.fromString(s))
    }
    new GenericArrayData(out.result())
  }

  override def nullSafeEval(input: Any): Any =
    segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeSegment", this, classOf[BpeSegment].getName)
    nullSafeCodeGen(ctx, ev, str => s"${ev.value} = $self.segment($str);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSegment =
    copy(child = newChild)
}

object BpeFunctions {
  /** Final BPE tokens of normalized `text` under `rules` (rank order). */
  def bpeTokens(text: Column, rules: Seq[(String, String)]): Column =
    Bridge.column(BpeSegment(Bridge.expression(text), rules, emitPairs = false))

  /** Adjacent symbol pairs ("a b") after segmenting under `rules` —
    * the count statistic of the NEXT training round. */
  def bpePairs(text: Column, rules: Seq[(String, String)]): Column =
    Bridge.column(BpeSegment(Bridge.expression(text), rules, emitPairs = true))
}
