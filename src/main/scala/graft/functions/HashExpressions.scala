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

/** Shared md5-seed math for the portable hash family: the first 30 hex
  * chars of md5 (nibbles 0-14 and 15-29) read as two 60-bit longs —
  * exactly `conv(substring(md5(s), 1|16, 15), 16, 10)`, computed from
  * the digest bytes without materializing the hex string. */
object Md5Seeds {
  def h1(d: Array[Byte]): Long = nibbles(d, 0)
  def h2(d: Array[Byte]): Long = nibbles(d, 15)
  private def nibbles(d: Array[Byte], from: Int): Long = {
    var v = 0L
    var i = from
    while (i < from + 15) {
      val nib = if ((i & 1) == 0) (d(i >> 1) >> 4) & 0xF else d(i >> 1) & 0xF
      v = (v << 4) | nib
      i += 1
    }
    v
  }
}

/** Fused portable-minhash signature straight from the shingle strings:
  * one md5 per shingle feeds the (h1 + i*h2) mod p family and all k
  * minima in a single pass — replacing three interpreted HOF passes
  * (md5 transform + two conv transforms) whose per-element lambda
  * dispatch dominated the signature stage. Bit-identical to the
  * staged-column composition (the DuckDB oracle's formulation).
  * Null elements are skipped; empty arrays yield Long.MaxValue
  * components (callers filter empty shingle sets upstream). */
case class PortableMinHashSignature(child: Expression, k: Int, mod: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_portable_minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val d = org.apache.commons.codec.digest.DigestUtils.md5(
          arr.getUTF8String(j).getBytes)
        var v = Md5Seeds.h1(d) % mod
        val h2 = Md5Seeds.h2(d) % mod
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
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val h2 = ctx.freshName("h2")
      val d = ctx.freshName("digest")
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = $arr.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$arr.isNullAt($j)) {
         |    byte[] $d = org.apache.commons.codec.digest.DigestUtils.md5(
         |      $arr.getUTF8String($j).getBytes());
         |    long $v = graft.functions.Md5Seeds.h1($d) % ${mod}L;
         |    long $h2 = graft.functions.Md5Seeds.h2($d) % ${mod}L;
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

  override protected def withNewChildInternal(newChild: Expression): PortableMinHashSignature =
    copy(child = newChild)
}

/** `array<string> → array<long>`: each element's portable 60-bit token
  * hash (md5 hex chars 1-15 as a long) in one codegen'd pass — the
  * portable-simhash analogue of xxhash64-per-token, replacing an
  * interpreted `transform(ws, conv(substring(md5(w),1,15),16,10))`.
  * Null elements stay null (SimHash64 skips them). */
case class Md5Prefix60Array(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = "graft_md5_prefix60_array"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val d = org.apache.commons.codec.digest.DigestUtils.md5(
          arr.getUTF8String(j).getBytes)
        out(j) = Md5Seeds.h1(d)
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val d = ctx.freshName("digest")
      s"""
         |int $n = $arr.numElements();
         |Object[] $out = new Object[$n];
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$arr.isNullAt($j)) {
         |    byte[] $d = org.apache.commons.codec.digest.DigestUtils.md5(
         |      $arr.getUTF8String($j).getBytes());
         |    $out[$j] = graft.functions.Md5Seeds.h1($d);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60Array =
    copy(child = newChild)
}

/** Codegen'd Bloom-sketch membership probe over a string key — the
  * native-Expression form of a driver-built
  * `org.apache.spark.util.sketch.BloomFilter` probe (the same
  * embed-the-sketch-in-the-plan mechanism Spark's runtime row-level
  * filtering uses). The serialized sketch rides as a foldable BINARY
  * child — a `Literal`, so two probes over bit-identical sketches
  * compare equal and plan canonicalization / cache / exchange reuse
  * still work (an `Array[Byte]` case-class field would be
  * reference-equal only, the same reason Spark's own
  * BloomFilterMightContain carries its sketch as a child expression).
  * It ships to executors once per stage with the task binary; the
  * deserialized filter is memoized in a per-JVM cache keyed by the
  * sketch bytes ([[BloomMightContain.cached]]) — the @transient lazy
  * alone would re-deserialize per TASK, since each task deserializes
  * its own copy of the plan (and the expression instance holding the
  * lazy val) from the task binary, and a production-shingle-count
  * sketch is MBs. Probing hashes the key's UTF-8 bytes — identical
  * to `mightContainString`. This replaces a Scala UDF probe: the
  * filter stays inside whole-stage codegen with no per-row closure
  * dispatch. NULL input → NULL. */
case class BloomMightContain(valueExpr: Expression, bloomExpr: Expression)
    extends BinaryExpression {

  override def left: Expression = valueExpr
  override def right: Expression = bloomExpr

  override def checkInputDataTypes(): TypeCheckResult =
    (valueExpr.dataType, bloomExpr.dataType) match {
      case (org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.BinaryType) if bloomExpr.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (v, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, foldable binary) inputs, got " +
          s"${v.sql} and ${b.sql}")
    }

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val filter =
    BloomMightContain.cached(bloomExpr.eval().asInstanceOf[Array[Byte]])

  def probe(s: org.apache.spark.unsafe.types.UTF8String): Boolean =
    filter.mightContainBinary(s.getBytes)

  override def nullSafeEval(v: Any, b: Any): Any =
    probe(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj(
      "bloomProbe", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, (v, _) => s"${ev.value} = $self.probe($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(valueExpr = newLeft, bloomExpr = newRight)
}

object BloomMightContain {
  /** Per-JVM cache of deserialized Bloom sketches, keyed by sketch
    * CONTENT (ByteBuffer equals/hashCode compare bytes): every task
    * on an executor deserializes its own plan copy, so without this
    * an MB-scale sketch is parsed once per task instead of once per
    * JVM. Bounded — distinct sketches are per-query driver builds,
    * but a long-lived executor crossing many queries must not leak. */
  private val MaxCached = 16
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[
      java.nio.ByteBuffer, org.apache.spark.util.sketch.BloomFilter]()

  private[graft] def cached(
      bytes: Array[Byte]): org.apache.spark.util.sketch.BloomFilter = {
    if (cache.size > MaxCached) cache.clear()
    cache.computeIfAbsent(java.nio.ByteBuffer.wrap(bytes), _ =>
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bytes)))
  }
}

object HashFunctions {
  /** Codegen'd SimHash over an `array<bigint>` of token hashes. */
  def simhash64(tokenHashes: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokenHashes)))

  /** Fused codegen'd portable minhash straight from shingle strings. */
  def portableMinhashSignature(shingles: Column, k: Int, mod: Long): Column =
    Bridge.column(PortableMinHashSignature(Bridge.expression(shingles), k, mod))

  /** Codegen'd portable 60-bit md5-prefix hash per array element. */
  def md5Prefix60Array(tokens: Column): Column =
    Bridge.column(Md5Prefix60Array(Bridge.expression(tokens)))

  /** Codegen'd Bloom membership probe against a driver-built sketch. */
  def bloomMightContain(
      key: Column, filter: org.apache.spark.util.sketch.BloomFilter): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    filter.writeTo(bos)
    Bridge.column(BloomMightContain(Bridge.expression(key),
      org.apache.spark.sql.catalyst.expressions.Literal(
        bos.toByteArray, org.apache.spark.sql.types.BinaryType)))
  }
}
