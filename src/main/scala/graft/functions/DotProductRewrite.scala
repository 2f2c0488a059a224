package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rewrite: the composable dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x) }}}
  *
  * becomes the fused [[DotProduct]] expression — same left-to-right
  * double fold, no per-row zipped intermediate array, stays inside
  * whole-stage codegen. Users write the readable builtin composition;
  * the plan runs the hot-path form.
  *
  * Soundness gates (the rewrite fires ONLY when provably equivalent):
  *  - both sides are `array<double>` with `containsNull = false` — the
  *    composable form returns NULL if any element is null (null
  *    propagates through the multiply and the fold), while the fused
  *    loop skips null elements; nullability proof required, not assumed;
  *  - the zero literal is exactly double 0.0;
  *  - the merge lambda is exactly `acc + x` and the zip lambda exactly
  *    `x * y` over the bound lambda variables (either argument order);
  *  - the finish lambda is the identity;
  *  - both array children are deterministic — the guarded output
  *    references each array twice (`size` and the fused loop), which is
  *    only equivalent to the original single-evaluation form when
  *    repeated evaluation yields the same value (Spark's own rewrite
  *    rules gate on the same condition).
  *
  * Array LENGTH is a runtime property no static gate can prove equal, and
  * the two forms differ there: `zip_with` null-pads the shorter array
  * (→ the fold returns NULL) while the fused loop stops at the shorter
  * side (→ a partial sum). The rewrite therefore emits a guarded
  * expression — `IF(size(a) = size(b), graft_dot(a, b), NULL)` — whose
  * equal-length fast path is the fused loop and whose mismatch path
  * reproduces the composable form's NULL exactly (including null input
  * arrays: the IF condition goes NULL → else branch → NULL).
  *
  * Registered via [[GraftExtensions]] (`injectOptimizerRule`) or
  * `spark.experimental.extraOptimizations`.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isNonNullDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, containsNull) => !containsNull
    case _ => false
  }

  private def isZeroD(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case _ => false
  }

  /** `l op r` uses exactly the two bound lambda variables, either order. */
  private def usesVars(l: Expression, r: Expression,
                       v1: NamedLambdaVariable, v2: NamedLambdaVariable): Boolean =
    (l, r) match {
      case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
        Set(a.exprId, b.exprId) == Set(v1.exprId, v2.exprId)
      case _ => false
    }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(mx, my, _), Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
          zero,
          LambdaFunction(Add(ax, ay, _), Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
          finish)
        if isZeroD(zero) && isNonNullDoubleArray(a) && isNonNullDoubleArray(b) &&
           a.deterministic && b.deterministic &&
           usesVars(mx, my, zx, zy) && usesVars(ax, ay, acc, el) && isIdentity(finish) =>
      If(EqualTo(Size(a, legacySizeOfNull = false), Size(b, legacySizeOfNull = false)),
         DotProduct(a, b),
         Literal(null, DoubleType))
  }
}
