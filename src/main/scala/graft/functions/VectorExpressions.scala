package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd vector kernels. Spark's higher-order functions (`zip_with` +
  * `aggregate`) evaluate their lambdas *interpreted* — measured 28 s for
  * 2 M × 64-dim cosines at sf0.1 — so the hot inner product is a native
  * Catalyst expression with `doGenCode`: a tight primitive `double` loop
  * inside whole-stage codegen (no boxing, no per-element virtual calls).
  * Same left-to-right summation order as the interpreted fold, so results
  * are bit-identical and remain oracle-portable.
  */
case class DotProduct(left: Expression, right: Expression)
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
      // freshName: several DotProducts can land in one codegen function
      // (e.g. vec_cosine = dot(a,b)/sqrt(dot(a,a)*dot(b,b))); fixed local
      // names collide there and janino rejects the whole stage.
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

object VectorFunctions {
  /** Column API for the codegen'd inner product. Inputs are cast to
    * `array<double>` at the column layer (float→double is exact), so the
    * expression always sees primitive double arrays. */
  def vec_dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a.cast("array<double>")),
      GraftColumnBridge.expression(b.cast("array<double>"))))

  def vec_norm(a: Column): Column = org.apache.spark.sql.functions.sqrt(vec_dot(a, a))

  def vec_cosine(a: Column, b: Column): Column =
    vec_dot(a, b) / (vec_norm(a) * vec_norm(b))

  /** Register for SQL use (`SELECT vec_dot(a, b) ...`). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
}
