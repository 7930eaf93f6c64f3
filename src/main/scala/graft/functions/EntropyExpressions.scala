package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row Shannon entropy of a string's symbol distribution — the
  * compression-style quality signal (near-zero entropy = degenerate
  * repetition, near-log|alphabet| = random noise; natural text sits in
  * a narrow band between, so both tails are filterable). Computed in
  * ONE pass over the row with zero shuffle and zero explode: the
  * relational formulation (explode symbols → two-level aggregate)
  * would materialize a row PER CHARACTER — at 100 TB that's the
  * corpus re-keyed by its characters, paying a shuffle for what is a
  * per-row scalar.
  *
  * `overTokens = false` → symbols are Unicode CODEPOINTS;
  * `overTokens = true` → symbols are space-separated tokens (feed
  * normalized text).
  *
  * Engine-portable exactness (the repo-wide recipe): each class term
  * −p·ln p rounds to 9 dp and the terms sum EXACTLY (BigDecimal), so
  * the result is independent of symbol enumeration order and matches
  * a DuckDB DECIMAL-summed group-by verbatim. Empty input → 0.0
  * (a zero-symbol string carries zero information).
  */
case class ShannonEntropy(child: Expression, overTokens: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.sql}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_shannon_entropy"

  /** Shared by interpreted eval and codegen. */
  def entropy(str: UTF8String): Double = {
    val s = str.toString
    val counts = new java.util.HashMap[AnyRef, Long]()
    var n = 0L
    if (overTokens) {
      s.split(' ').foreach { t =>
        if (t.nonEmpty) { counts.merge(t, 1L, (a, b) => a + b); n += 1 }
      }
    } else {
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        counts.merge(Integer.valueOf(cp), 1L, (a, b) => a + b)
        n += 1
        i += Character.charCount(cp)
      }
    }
    if (n == 0L) return 0.0
    var sum = java.math.BigDecimal.ZERO
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      // EXACT arithmetic mirror of the oracle: p = c/n in double,
      // term = -(p * ln p) rounded HALF_UP to 9 dp, exact sum.
      val p = c.toDouble / n.toDouble
      val term = -(p * math.log(p))
      sum = sum.add(java.math.BigDecimal.valueOf(term)
        .setScale(9, java.math.RoundingMode.HALF_UP))
    }
    sum.doubleValue()
  }

  override def nullSafeEval(input: Any): Any =
    entropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self =
      ctx.addReferenceObj("shannon", this, classOf[ShannonEntropy].getName)
    nullSafeCodeGen(ctx, ev, str => s"${ev.value} = $self.entropy($str);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): ShannonEntropy = copy(child = newChild)
}

object EntropyFunctions {
  /** Codepoint-distribution Shannon entropy of `text` (nats). */
  def charEntropy(text: Column): Column =
    Bridge.column(ShannonEntropy(Bridge.expression(text), overTokens = false))

  /** Token-distribution Shannon entropy of space-separated `text`. */
  def tokenEntropy(text: Column): Column =
    Bridge.column(ShannonEntropy(Bridge.expression(text), overTokens = true))
}
