package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** `vec_dot(array<double>, array<double>) → double` — a native Catalyst
  * expression with whole-stage codegen.
  *
  * The built-in formulation `aggregate(zip_with(a, b, _*_), 0d, _+_)` is
  * semantically identical but interpreted per element (lambda closures +
  * boxing); on pairwise similarity workloads that evaluation dominates the
  * query. This expression compiles to a primitive `double` loop inside the
  * generated code — preference order (b) of the build contract: a custom
  * `Expression` where built-ins can't express the op *efficiently*, well
  * before any UDF.
  *
  * Accumulation is in strict index order, so results are bit-identical to
  * the interpreted fold (and to the DuckDB oracle's list_dot_product).
  * Callers must supply array<double> (widen floats first — see
  * [[graft.functions.VectorFunctions.toDouble]]).
  */
case class VecDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session extensions registering graft's native functions. Enabled via
  * `spark.sql.extensions=graft.plans.GraftExtensions` (set by
  * [[graft.GraftSession]]), so `call_function("vec_dot", a, b)` and SQL
  * `vec_dot(a, b)` resolve in every session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDotProduct].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDotProduct(children(0), children(1))))
  }
}
