package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd byte-wise Hamming distance between two strings; null when the
  * lengths differ (distance undefined — callers align lengths first, as
  * [[graft.ops.Relational.hammingNearPairs]] does in its blocking key).
  *
  * Byte-wise equals codepoint-wise for ASCII/1-byte text, which is what
  * identifier/SKU/name linkage compares; the naive column form
  * (`size(filter(sequence…substr…))`) walks interpreted lambdas with two
  * substring allocations per position — this is one primitive loop inside
  * whole-stage codegen, no allocation beyond the byte views.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "hamming"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String].getBytes
    val y = b.asInstanceOf[UTF8String].getBytes
    if (x.length != y.length) null
    else {
      var acc = 0
      var i = 0
      while (i < x.length) { if (x(i) != y(i)) acc += 1; i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xb = ctx.freshName("xb")
      val yb = ctx.freshName("yb")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |byte[] $xb = $a.getBytes();
         |byte[] $yb = $b.getBytes();
         |if ($xb.length != $yb.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $acc = 0;
         |  for (int $i = 0; $i < $xb.length; $i++) {
         |    if ($xb[$i] != $yb[$i]) $acc++;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingDistance =
    copy(left = l, right = r)
}

object StringDistanceFunctions {
  def hamming(a: Column, b: Column): Column =
    GraftColumnBridge.column(HammingDistance(
      GraftColumnBridge.expression(a.cast("string")),
      GraftColumnBridge.expression(b.cast("string"))))

  /** Register for SQL use (`SELECT hamming(a, b) ...`). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hamming", exprs => HammingDistance(exprs(0), exprs(1)), "built-in")
}
