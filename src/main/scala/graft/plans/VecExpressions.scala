package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

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

/** `vec_lsh_bits(array<double>, nPlanes) → array<int>` — the random-
  * hyperplane LSH signature as a native codegen expression.
  *
  * Semantically identical to the built-in formulation in
  * [[graft.functions.VectorFunctions.hyperplaneBitsBuiltin]] (plane
  * coefficients ±1 from xxhash64(plane, dim) — replicated here via the
  * same XXH64.hashInt chain Spark's xxhash64 uses for two int children,
  * seed 42; strict index-order accumulation), but compiled to a primitive
  * nested loop instead of nPlanes × dim interpreted lambda closures — the
  * signature computation dominates LSH index builds otherwise. Equality
  * with the interpreted form is pinned in ScalaTest. */
case class VecLshBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "vec_lsh_bits"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val nPlanes = b.asInstanceOf[Int]
    val dim = v.numElements()
    val bits = new Array[Int](nPlanes)
    var p = 0
    while (p < nPlanes) {
      val seedP = XXH64.hashInt(p, 42L)
      var s = 0.0
      var i = 0
      while (i < dim) {
        val h = XXH64.hashInt(i, seedP)
        val x = v.getDouble(i)
        s += (if (((h % 2) + 2) % 2 == 0) x else -x)
        i += 1
      }
      bits(p) = if (s >= 0) 1 else 0
      p += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val dim = ctx.freshName("dim")
      val seedP = ctx.freshName("seedP")
      val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val bits = ctx.freshName("bits")
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      s"""
         |int $dim = $a.numElements();
         |int[] $bits = new int[$b];
         |for (int $p = 0; $p < $b; $p++) {
         |  long $seedP = $xxh.hashInt($p, 42L);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    long $h = $xxh.hashInt($i, $seedP);
         |    double $x = $a.getDouble($i);
         |    $s += ((($h % 2L) + 2L) % 2L == 0L) ? $x : -$x;
         |  }
         |  $bits[$p] = ($s >= 0.0) ? 1 : 0;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($bits);
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
    extensions.injectFunction((
      new FunctionIdentifier("vec_lsh_bits"),
      new ExpressionInfo(classOf[VecLshBits].getName, "vec_lsh_bits"),
      (children: Seq[Expression]) => VecLshBits(children(0), children(1))))
  }
}
