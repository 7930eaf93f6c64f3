package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 64-bit SimHash from an array of 64-bit token hashes: bit b of the
  * result is set iff more token hashes have bit b set than clear
  * (ties → clear). Null elements are skipped; an empty array gives 0.
  *
  * Replaces the interpreted 64-lane `aggregate(zip_with(...))` fold
  * (64 lambda dispatches per token) with one codegen'd primitive loop —
  * the hot inner loop of SimHash near-dup detection over billions of
  * documents.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 64) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var r = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) r |= (1L << b); b += 1 }
    r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val n = ctx.freshName("n")
      val r = ctx.freshName("r")
      s"""
         |int[] $votes = new int[64];
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    long $h = $arr.getLong($i);
         |    for (int $b = 0; $b < 64; $b++) {
         |      $votes[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |long $r = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $r |= (1L << $b);
         |}
         |${ev.value} = $r;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** All `k` portable-minhash components in ONE pass over the staged
  * seed arrays: component i = min over elements j of
  * `(h1(j) + i*h2(j)) mod p`, with h1, h2 already reduced mod p.
  * Replaces k interpreted `zip_with` passes (k×n lambda dispatches per
  * row — the dominant cost of the portable signature at scale) with a
  * single codegen'd primitive loop using incremental modular addition.
  * Callers guard non-empty input (empty arrays yield Long.MaxValue
  * components); null elements are skipped. */
case class PortableMinHash(left: Expression, right: Expression, k: Int, mod: Long)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs, got ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_portable_minhash"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    val n = math.min(x.numElements(), y.numElements())
    var j = 0
    while (j < n) {
      if (!x.isNullAt(j) && !y.isNullAt(j)) {
        val h2 = y.getLong(j)
        var v = x.getLong(j)
        var i = 0
        while (i < k) {
          if (v < mins(i)) mins(i) = v
          v += h2
          if (v >= mod) v -= mod
          i += 1
        }
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xa, ya) => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val h2 = ctx.freshName("h2")
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = Math.min($xa.numElements(), $ya.numElements());
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$xa.isNullAt($j) && !$ya.isNullAt($j)) {
         |    long $h2 = $ya.getLong($j);
         |    long $v = $xa.getLong($j);
         |    for (int $i = 0; $i < $k; $i++) {
         |      if ($v < $mins[$i]) $mins[$i] = $v;
         |      $v += $h2;
         |      if ($v >= ${mod}L) $v -= ${mod}L;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PortableMinHash =
    copy(left = newLeft, right = newRight)
}

object HashFunctions {
  /** Codegen'd SimHash over an `array<bigint>` of token hashes. */
  def simhash64(tokenHashes: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokenHashes)))

  /** Codegen'd k-component portable minhash over staged seed arrays. */
  def portableMinhash(h1: Column, h2: Column, k: Int, mod: Long): Column =
    Bridge.column(PortableMinHash(Bridge.expression(h1), Bridge.expression(h2), k, mod))
}
