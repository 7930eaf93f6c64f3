package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.DotProduct

/** Optimizer rewrite: the idiomatic-but-interpreted dot-product
  * composition
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0d, (acc, v) => acc + v) }}}
  *
  * becomes the codegen'd [[graft.functions.DotProduct]] primitive loop
  * (~100× on the per-element path). Users keep writing the portable
  * built-in formulation — exactly what the Spark API docs suggest for a
  * dot product — and automatically get the fast path when the rule is
  * installed (via `spark.sql.extensions=graft.functions.GraftExtensions`
  * or `GraftFunctions.register`).
  *
  * Strict-mode DotProduct reproduces the composition's null semantics
  * bit-for-bit (null element or length mismatch → NULL; sequential
  * left-to-right IEEE adds), so the rewrite is always
  * semantics-preserving — guarded to `array<double>` inputs and the
  * exact lambda shapes.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(l, r,
            LambdaFunction(Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _),
              Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
          Literal(zero, DoubleType),
          LambdaFunction(Add(aa: NamedLambdaVariable, ae: NamedLambdaVariable, _),
            Seq(la: NamedLambdaVariable, le: NamedLambdaVariable), _),
          LambdaFunction(fv: NamedLambdaVariable, Seq(ff: NamedLambdaVariable), _))
        if zero == 0.0 && isDoubleArray(l) && isDoubleArray(r) &&
          mx.exprId == zx.exprId && my.exprId == zy.exprId &&
          aa.exprId == la.exprId && ae.exprId == le.exprId &&
          fv.exprId == ff.exprId =>
      DotProduct(l, r, strict = true)
  }
}
