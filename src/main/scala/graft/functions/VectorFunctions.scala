package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Whole-stage-codegen'd dot product over `array<double>` columns.
  *
  * The built-in composition `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * is semantically identical but runs each element through interpreted
  * lambda dispatch — ~100 ns/element. This expression generates a tight
  * primitive loop (~1 ns/element), which matters when a similarity join
  * evaluates millions of vector pairs (SURVEY.md §7.2 step 7's
  * brute-force top-k is O(n²·d) dot products).
  *
  * Null semantics, by mode:
  *   - lenient (default, the Column API): null elements contribute 0,
  *     lengths may differ (min length wins); a null array yields null.
  *   - strict (`strict = true`, used by the optimizer rewrite in
  *     [[graft.plans.DotProductRewrite]]): bit-for-bit the semantics of
  *     `aggregate(zip_with(a, b, _*_), 0d, _+_)` — any null element or
  *     length mismatch yields NULL, so the rewrite is always
  *     semantics-preserving.
  */
case class DotProduct(left: Expression, right: Expression, strict: Boolean = false)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullable: Boolean = strict || super.nullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (strict && x.numElements() != y.numElements()) return null
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) {
        if (strict) return null
      } else s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      // `ev.isNull` may only be referenced when the expression is
      // nullable — with strict = false and NON-nullable children,
      // nullSafeCodeGen's non-nullable branch never DECLARES the
      // isNull variable, and a stray reference made Janino reject the
      // whole projection ("isNull_N is not an rvalue"), silently
      // de-codegening every plan built over non-nullable arrays
      // (Datasets of case classes, MemoryStream inputs). strict = true
      // forces nullable, so its isNull writes are always legal.
      val strictNull =
        if (strict) s"${ev.isNull} = true;" else "/* lenient: skip */"
      val strictLen =
        if (strict) s"if ($a.numElements() != $b.numElements()) ${ev.isNull} = true;"
        else ""
      val earlyExit = if (strict) s" && !${ev.isNull}" else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |$strictLen
         |for (int $i = 0; $i < $n$earlyExit; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    $strictNull
         |  } else {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the custom vector expressions. */
/** All-centroid scores in one pass: out(c) = 2·dot(v, M(c)) − ‖M(c)‖²
  * (argmax ⇔ nearest centroid; ‖v‖² is row-constant). The centroid
  * matrix rides along as a reference object instead of k×dim literal
  * nodes — composing k [[DotProduct]] calls put thousands of literals
  * in the plan and dominated IVF fit time with codegen compilation. */
case class CentroidScores(child: Expression, cents: Seq[Seq[Double]])
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  require(cents.nonEmpty && cents.forall(_.length == cents.head.length),
    "centroid rows must be non-empty and share one dimensionality")

  @transient private lazy val matrix: Array[Array[Double]] = cents.map(_.toArray).toArray
  @transient private lazy val normSq: Array[Double] = matrix.map(_.map(x => x * x).sum)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "graft_centroid_scores"

  /** Shared by interpreted and codegen paths. Dimension mismatches
    * fail fast — a truncated dot would silently index the row under an
    * arbitrary centroid, making it unfindable by probes. */
  def score(arr: ArrayData): GenericArrayData = {
    val k = matrix.length
    val dim = if (k == 0) 0 else matrix(0).length
    if (arr.numElements() != dim)
      throw new IllegalArgumentException(
        s"$prettyName: vector has ${arr.numElements()} dims, centroids have $dim")
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      val m = matrix(c)
      var s = 0.0
      var d = 0
      while (d < dim) { s += arr.getDouble(d) * m(d); d += 1 }
      out(c) = 2 * s - normSq(c)
      c += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = score(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("centroidScores", this, classOf[CentroidScores].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $self.score($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidScores =
    copy(child = newChild)
}

/** Asymmetric-distance (ADC) score of a raw query vector against a
  * product-quantized database vector: the PQ approximation of
  * `dot(query, x)` is `Σ_j dot(query_j, books(j)(codes(j)))` — the
  * query stays exact, the database side is its per-subspace codeword.
  *
  * The codebooks ride along as a reference object (like
  * [[CentroidScores]]): embedding m×k×subDim doubles as literal plan
  * nodes would dominate codegen compile time. One codegen'd call per
  * (query, code) pair — a candidate join scoring millions of pairs
  * reads m·subDim doubles per pair with zero allocation.
  */
case class AdcScore(
    left: Expression, right: Expression, books: Seq[Seq[Seq[Double]]])
    extends BinaryExpression {
  import org.apache.spark.sql.types.IntegerType

  require(books.nonEmpty && books.forall(_.nonEmpty),
    "codebooks must be non-empty per subspace")
  require(books.forall(b => b.forall(_.length == b.head.length)),
    "codewords within a subspace must share one dimensionality")

  @transient private lazy val mats: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val subDims: Array[Int] = mats.map(_.head.length)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<int>), got (${l.sql}, ${r.sql})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_adc_score"

  @transient private lazy val totalDim: Int = subDims.sum

  /** Shared by interpreted and codegen paths; fails fast on dimension
    * or code mismatches BEFORE touching array memory (a late check
    * would let the loop read past an UnsafeArrayData buffer, scoring
    * garbage; a silently truncated score would rank wrong). */
  def score(q: ArrayData, codes: ArrayData): Double = {
    val m = mats.length
    if (codes.numElements() != m)
      throw new IllegalArgumentException(
        s"$prettyName: ${codes.numElements()} codes for $m subspaces")
    if (q.numElements() != totalDim)
      throw new IllegalArgumentException(
        s"$prettyName: query has ${q.numElements()} dims, codebooks cover $totalDim")
    var total = 0.0
    var off = 0
    var j = 0
    while (j < m) {
      val code = codes.getInt(j)
      if (code < 0 || code >= mats(j).length)
        throw new IllegalArgumentException(
          s"$prettyName: code $code out of range for subspace $j (${mats(j).length} codewords)")
      val cw = mats(j)(code)
      val sd = subDims(j)
      var d = 0
      var s = 0.0
      while (d < sd) { s += q.getDouble(off + d) * cw(d); d += 1 }
      total += s
      off += sd
      j += 1
    }
    total
  }

  override def nullSafeEval(q: Any, codes: Any): Any =
    score(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("adcScore", this, classOf[AdcScore].getName)
    nullSafeCodeGen(ctx, ev, (q, c) => s"${ev.value} = $self.score($q, $c);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScore =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  /** Codegen'd dot product of two `array<double>` columns. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** One-pass scores of a vector against every centroid row. */
  def centroidScores(v: Column, cents: Seq[Seq[Double]]): Column =
    Bridge.column(CentroidScores(Bridge.expression(v), cents))

  /** ADC score of a raw query against PQ codes under `books`. */
  def adcScore(q: Column, codes: Column, books: Seq[Seq[Seq[Double]]]): Column =
    Bridge.column(AdcScore(Bridge.expression(q), Bridge.expression(codes), books))
}
