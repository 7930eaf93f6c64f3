package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowed Rabin-Karp fingerprint: the minimum 64-bit polynomial
  * rolling hash over all `window`-byte windows of the UTF-8 text —
  * the classic content-defined document fingerprint (one selected
  * hash per document; equal byte runs of `window` length collide, so
  * near-identical documents tend to share fingerprints).
  *
  * Base 257, arithmetic mod 2^64 (natural long overflow — identical in
  * Java and generated code). Texts shorter than the window hash their
  * full content as a single window; empty text fingerprints to 0.
  * Total function, deterministic, codegen'd single pass.
  *
  * `portable = true` swaps the arithmetic to mod 2^31-1 — still an
  * O(n) rolling update (bit-identical to the per-window fold), but the
  * FOLD formulation is expressible verbatim in SQL (`list_reduce` over
  * char codes), which is how the driver's DuckDB oracle value-checks
  * the fingerprint. Caveat: the SQL mirror folds CHARACTER CODES while
  * this folds UTF-8 BYTES — identical for ASCII text only (true of the
  * oracle corpus; non-ASCII text still fingerprints deterministically,
  * just not char-fold-comparably). Production callers keep the
  * mod-2^64 form, spec-tested against its own naive oracle.
  */
case class RollingMinHash(child: Expression, window: Int, portable: Boolean = false)
    extends UnaryExpression {
  require(window >= 2 && window <= 1024, "window must be in [2, 1024]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_rolling_minhash"

  /** Portable-mode hash: min over windows of
    * `fold(bytes, acc = 0)((acc * 257 + b) mod p)`, p = 2^31-1 —
    * computed with an O(n) rolling update (mathematically identical to
    * the fold mod p; RollingHashSpec checks it against the naive
    * per-window recompute). */
  def hashBytesPortable(bytes: Array[Byte]): Long = {
    val p = 2147483647L
    val B = 257L
    val n = bytes.length
    if (n == 0) return 0L
    val w = math.min(window, n)
    var pow = 1L // B^(w-1) mod p
    var i = 1
    while (i < w) { pow = pow * B % p; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = (h * B + (bytes(i) & 0xff)) % p; i += 1 }
    var minH = h
    i = w
    while (i < n) {
      var t = (h - (bytes(i - w) & 0xff) * pow % p) % p
      if (t < 0) t += p
      h = (t * B + (bytes(i) & 0xff)) % p
      if (h < minH) minH = h
      i += 1
    }
    minH
  }

  /** Shared by interpreted eval and tests; mirrors the generated code. */
  def hashBytes(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val w = math.min(window, n)
    val B = 257L
    var pow = 1L // B^(w-1)
    var i = 1
    while (i < w) { pow *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = h * B + (bytes(i) & 0xff); i += 1 }
    var minH = h
    i = w
    while (i < n) {
      h = (h - (bytes(i - w) & 0xff) * pow) * B + (bytes(i) & 0xff)
      if (java.lang.Long.compareUnsigned(h, minH) < 0) minH = h
      i += 1
    }
    minH
  }

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[UTF8String].getBytes
    if (portable) hashBytesPortable(b) else hashBytes(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (portable) {
      val self = ctx.addReferenceObj("rollingMinHash", this, classOf[RollingMinHash].getName)
      nullSafeCodeGen(ctx, ev, str =>
        s"${ev.value} = $self.hashBytesPortable($str.getBytes());")
    } else nullSafeCodeGen(ctx, ev, str => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val w = ctx.freshName("w")
      val pow = ctx.freshName("pow")
      val h = ctx.freshName("h")
      val minH = ctx.freshName("minH")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $str.getBytes();
         |int $n = $bytes.length;
         |long $minH = 0L;
         |if ($n > 0) {
         |  int $w = Math.min($window, $n);
         |  long $pow = 1L;
         |  for (int $i = 1; $i < $w; $i++) $pow *= 257L;
         |  long $h = 0L;
         |  for (int $i = 0; $i < $w; $i++) $h = $h * 257L + ($bytes[$i] & 0xff);
         |  $minH = $h;
         |  for (int $i = $w; $i < $n; $i++) {
         |    $h = ($h - ($bytes[$i - $w] & 0xff) * $pow) * 257L + ($bytes[$i] & 0xff);
         |    if (Long.compareUnsigned($h, $minH) < 0) $minH = $h;
         |  }
         |}
         |${ev.value} = $minH;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
}

/** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, the
  * MOSS algorithm): from the sequence of `k`-gram rolling hashes,
  * select the minimum of every `w` consecutive hashes and return the
  * DISTINCT selected values, sorted. Guarantee: any substring of
  * length ≥ w + k − 1 shared by two documents contributes at least one
  * shared fingerprint, while only ~2/(w+1) of all hashes are kept —
  * the storage/recall dial between "one min per doc" (RollingMinHash)
  * and "every window" (CorpusOps.duplicateSpans).
  *
  * Single pass, O(n): rolling hash + monotonic-deque window minima.
  * `portable = true` uses the mod 2³¹−1 char-fold arithmetic whose SQL
  * mirror the DuckDB oracle runs verbatim (ASCII caveat as in
  * [[RollingMinHash]]); default is mod 2⁶⁴ with unsigned minima.
  */
case class WinnowedFingerprints(
    child: Expression, k: Int, w: Int, portable: Boolean = false)
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.ArrayType

  require(k >= 2 && k <= 1024, "k-gram size must be in [2, 1024]")
  require(w >= 1 && w <= 4096, "winnow window must be in [1, 4096]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_winnowed_fingerprints"

  private def less(a: Long, b: Long): Boolean =
    if (portable) a < b else java.lang.Long.compareUnsigned(a, b) < 0

  /** All k-gram rolling hashes (length-capped k for short texts). */
  private def grams(bytes: Array[Byte]): Array[Long] = {
    val n = bytes.length
    if (n == 0) return Array.empty
    val kk = math.min(k, n)
    val p = 2147483647L
    val B = 257L
    val out = new Array[Long](n - kk + 1)
    var pow = 1L
    var i = 1
    while (i < kk) { pow = if (portable) pow * B % p else pow * B; i += 1 }
    var h = 0L
    i = 0
    while (i < kk) {
      h = if (portable) (h * B + (bytes(i) & 0xff)) % p else h * B + (bytes(i) & 0xff)
      i += 1
    }
    out(0) = h
    i = kk
    while (i < n) {
      if (portable) {
        var t = (h - (bytes(i - kk) & 0xff) * pow % p) % p
        if (t < 0) t += p
        h = (t * B + (bytes(i) & 0xff)) % p
      } else {
        h = (h - (bytes(i - kk) & 0xff) * pow) * B + (bytes(i) & 0xff)
      }
      out(i - kk + 1) = h
      i += 1
    }
    out
  }

  /** Shared by interpreted and codegen paths. */
  def winnow(str: UTF8String): GenericArrayData = {
    val hs = grams(str.getBytes)
    if (hs.isEmpty) return new GenericArrayData(Array.empty[Long])
    val ww = math.min(w, hs.length)
    // Monotonic deque of indices with ascending hash values.
    val deque = new Array[Int](hs.length)
    var head = 0; var tail = 0 // [head, tail)
    val selected = scala.collection.mutable.TreeSet.empty[Long](
      if (portable) Ordering.Long
      else Ordering.fromLessThan[Long](java.lang.Long.compareUnsigned(_, _) < 0))
    var i = 0
    while (i < hs.length) {
      while (tail > head && !less(hs(deque(tail - 1)), hs(i))) tail -= 1
      deque(tail) = i; tail += 1
      while (deque(head) <= i - ww) head += 1
      if (i >= ww - 1) selected += hs(deque(head))
      i += 1
    }
    new GenericArrayData(selected.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    winnow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("winnowed", this, classOf[WinnowedFingerprints].getName)
    nullSafeCodeGen(ctx, ev, str => s"${ev.value} = $self.winnow($str);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowedFingerprints =
    copy(child = newChild)
}

object RollingHashFunctions {
  /** Winnowed rolling-hash fingerprint of a string column. */
  def rollingMinHash(text: Column, window: Int): Column =
    Bridge.column(RollingMinHash(Bridge.expression(text), window))

  /** Engine-portable (mod 2^31-1) fingerprint — oracle-checkable. */
  def rollingMinHashPortable(text: Column, window: Int): Column =
    Bridge.column(RollingMinHash(Bridge.expression(text), window, portable = true))

  /** Winnowing fingerprint set (sorted distinct window minima). */
  def winnowedFingerprints(text: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowedFingerprints(Bridge.expression(text), k, w))

  /** Engine-portable winnowing — oracle-checkable (ASCII caveat). */
  def winnowedFingerprintsPortable(text: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowedFingerprints(Bridge.expression(text), k, w, portable = true))
}
