package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.DotProductF

/** Optimizer rule: rewrite the portable HOF dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *             0.0D, (acc, v) -> acc + v)
  *
  * to the codegen'd [[DotProductF]] kernel — a SQL user who writes the
  * textbook fold gets the tight primitive loop without knowing
  * `graft_dot` exists. The kernel is bit-identical to the fold on
  * non-null elements (same index order, same widening, same 0.0 seed —
  * DotProductFSuite pins it ULP-exact), so the rewrite cannot move a
  * result.
  *
  * Divergence discipline — the two forms differ in exactly two cases,
  * and the rule neutralizes both:
  *   - null array ELEMENTS: the fold propagates null through the sum,
  *     the kernel reads a primitive 0.0f → only fire when both array
  *     types carry `containsNull = false`;
  *   - UNEQUAL lengths: zip_with pads the shorter side with nulls, so
  *     the fold returns null, while the kernel loops over min(len) →
  *     rewrite to `if (size(a) = size(b)) graft_dot(a, b) else null`.
  *     The guard references a and b twice, so the rule additionally
  *     requires both to be deterministic (whole-stage codegen's
  *     subexpression elimination collapses the repeated evaluation).
  * Null ARRAYS agree under the guard too: size(null) is null, the
  * equality is null, If takes the else branch → null, matching the
  * fold. Injected by [[graft.GraftExtensions]]; anything that doesn't
  * match the exact shape is left untouched.
  */
object DotRewriteRule extends Rule[LogicalPlan] {

  private def nonNullFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, containsNull) => !containsNull
    case _ => false
  }

  /** The lambda body `double(x) * double(y)` over exactly (x, y). */
  private def isWidenedProduct(
      body: Expression, x: NamedLambdaVariable, y: NamedLambdaVariable): Boolean = {
    def isVar(e: Expression, v: NamedLambdaVariable) = e match {
      case Cast(inner: NamedLambdaVariable, DoubleType, _, _) =>
        inner.exprId == v.exprId
      case inner: NamedLambdaVariable =>
        inner.exprId == v.exprId && inner.dataType == DoubleType
      case _ => false
    }
    body match {
      case m: Multiply =>
        (isVar(m.left, x) && isVar(m.right, y)) ||
          (isVar(m.left, y) && isVar(m.right, x))
      case _ => false
    }
  }

  /** The merge lambda `acc + v` (either operand order). */
  private def isSum(
      body: Expression, acc: NamedLambdaVariable, v: NamedLambdaVariable): Boolean =
    body match {
      case a: Add =>
        def is(e: Expression, nv: NamedLambdaVariable) = e match {
          case x: NamedLambdaVariable => x.exprId == nv.exprId
          case _ => false
        }
        (is(a.left, acc) && is(a.right, v)) ||
          (is(a.left, v) && is(a.right, acc))
      case _ => false
    }

  /** The finish lambda is the identity over its single argument. */
  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      body.exprId == arg.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(prod,
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0d, DoubleType),
          LambdaFunction(merge,
            Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          finish)
        if nonNullFloatArray(a) && nonNullFloatArray(b) &&
          a.deterministic && b.deterministic &&
          isWidenedProduct(prod, x, y) && isSum(merge, acc, v) &&
          isIdentity(finish) =>
        If(EqualTo(Size(a, legacySizeOfNull = false),
            Size(b, legacySizeOfNull = false)),
          DotProductF(a, b),
          Literal(null, DoubleType))
    }
}
