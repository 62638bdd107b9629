package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: recognize the DECLARATIVE sequential dot-product fold
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0.0d, (acc, v) => acc + v) }}}
  *
  * and swap in the fused codegen'd [[DotFold]] kernel. Users (and our own
  * older queries) write the composable higher-order form; the engine runs
  * the native loop — the Catalyst-idiomatic way to accelerate a pattern
  * without changing any caller (registered via
  * [[GraftExtensions]]' `injectOptimizerRule`).
  *
  * The match is deliberately conservative — it fires ONLY when the rewrite
  * is bit-exact:
  *  - zero literal is exactly 0.0d (DotFold's accumulator seed);
  *  - the element product is a DOUBLE multiply of the two zip lambda
  *    variables (casts to double stripped — a float×float multiply is NOT
  *    fused, its product rounds differently);
  *  - the merge lambda is exactly `acc + v` in double;
  *  - the finish lambda is the identity;
  *  - both inputs are float/double arrays (DotFold's accepted types).
  * Anything else keeps the interpreted-but-general HOF path.
  */
object FuseDotFold extends Rule[LogicalPlan] {

  private def stripDoubleCast(e: Expression): Expression = e match {
    case Cast(c, DoubleType, _, _) => stripDoubleCast(c)
    case other                     => other
  }

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean =
    stripDoubleCast(e) match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case _                       => false
    }

  private def isVarPair(l: Expression, r: Expression,
      x: NamedLambdaVariable, y: NamedLambdaVariable): Boolean =
    (sameVar(l, x) && sameVar(r, y)) || (sameVar(l, y) && sameVar(r, x))

  private def supported(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _                                                  => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(mul: Multiply, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          zero @ Literal(_, DoubleType),
          LambdaFunction(add: Add, Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
          finish)
        if zero.value != null &&
          java.lang.Double.doubleToLongBits(
             zero.value.asInstanceOf[Double]) == java.lang.Double.doubleToLongBits(0.0) &&
          mul.dataType == DoubleType &&
          isVarPair(mul.left, mul.right, x, y) &&
          add.dataType == DoubleType &&
          ((sameVar(add.left, acc) && sameVar(add.right, el)) ||
            (sameVar(add.left, el) && sameVar(add.right, acc))) &&
          isIdentityFinish(finish) &&
          supported(a) && supported(b) =>
      DotFold(a, b)
  }

  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(v: NamedLambdaVariable), _) => sameVar(body, v)
    case _                                                    => false
  }
}
