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

object RollingHashFunctions {
  /** Winnowed rolling-hash fingerprint of a string column. */
  def rollingMinHash(text: Column, window: Int): Column =
    Bridge.column(RollingMinHash(Bridge.expression(text), window))

  /** Engine-portable (mod 2^31-1) fingerprint — oracle-checkable. */
  def rollingMinHashPortable(text: Column, window: Int): Column =
    Bridge.column(RollingMinHash(Bridge.expression(text), window, portable = true))
}
