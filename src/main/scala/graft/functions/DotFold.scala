package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native sequential-fold dot product over two numeric arrays, in double —
  * a codegen'd Catalyst `Expression` (the brief's preference (b): a custom
  * scalar function where built-ins can't express the semantics FAST).
  *
  * Why it exists: the declarative form `aggregate(zip_with(a, b, (x, y) =>
  * x*y), 0.0, _+_)` is semantically right but Spark evaluates higher-order
  * functions INTERPRETED — one closure dispatch per element per row, outside
  * whole-stage codegen (measured ~30× slower than codegen'd arithmetic on
  * this corpus; see the minhash history in git). This expression generates a
  * tight Java loop inside whole-stage codegen instead.
  *
  * Bit-exactness contract (what makes it usable under the DuckDB oracle):
  * the fold is a SEQUENTIAL left-to-right sum starting at 0.0 over exact
  * double products of the (possibly float) inputs — the same IEEE operation
  * order as the HOF form it replaces and as DuckDB's `list_reduce` twin, so
  * all three produce bit-identical doubles. Null element or length mismatch
  * → NULL, matching `zip_with`'s null padding semantics.
  */
case class DotFold(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT> or ARRAY<DOUBLE> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val (lt, rt) = (elemType(left).get, elemType(right).get)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (lt == FloatType) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rt == FloatType) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xi * yi
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      def get(arr: String, idx: String, t: DataType): String =
        if (t == FloatType) s"(double) $arr.getFloat($idx)" else s"$arr.getDouble($idx)"
      s"""
         |int $n = $a.numElements();
         |boolean $bad = ($n != $b.numElements());
         |double $acc = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $acc += ${get(a, i, elemType(left).get)} * ${get(b, i, elemType(right).get)};
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotFold =
    copy(left = newLeft, right = newRight)
}

/** Session extensions: registers the engine's native functions in the
  * session's FunctionRegistry (so `graft_dot` is callable from SQL and via
  * `call_function`) and the [[FuseDotFold]] optimizer rule (so the
  * declarative HOF dot-product fold runs on the fused kernel) — wire with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`.
  *
  * Also surfaces Spark's own bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind AQE's injected runtime row-level filters, present in the engine
  * but not SQL-registered) as `graft_bloom_agg` / `graft_might_contain`,
  * so a pipeline can build and apply a semi-join prefilter EXPLICITLY
  * where the optimizer's cost model wouldn't inject one. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotFold].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot takes exactly 2 arguments")
        DotFold(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_subwords"),
      new ExpressionInfo(classOf[SubwordFold].getName, "graft_subwords"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_subwords takes exactly 1 argument")
        SubwordFold(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(c) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c)
        case Seq(c, n) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, n)
        case _ => throw new IllegalArgumentException(
          "graft_bloom_agg takes (xxhash64 value[, estimated items])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_might_contain takes exactly 2 arguments")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head, children(1))
      }))
    ext.injectOptimizerRule(_ => FuseDotFold)
  }
}
