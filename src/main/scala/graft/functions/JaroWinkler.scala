package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Jaro-Winkler similarity — the name-matching staple of record
  * linkage (Winkler, "String Comparator Metrics and Enhanced Decision
  * Rules in the Fellegi-Sunter Model", 1990). Standard parameters:
  * match window ⌊max(|a|,|b|)/2⌋−1, prefix bonus p=0.1 over at most 4
  * chars, boost only when the Jaro score exceeds 0.7 — the same constants
  * DuckDB's `jaro_winkler_similarity` uses, which is what lets the q206
  * oracle hash-match (scores rounded to 6 decimals; the arithmetic tail
  * can differ in the last ulp across implementations).
  *
  * Spark ships `levenshtein` but nothing in the Jaro family; a UDF would
  * box two strings per row — this is a primitive nested loop inside
  * whole-stage codegen.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.similarity($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinkler =
    copy(left = l, right = r)
}

object JaroWinkler {

  /** Standard Jaro-Winkler on UTF-16 chars (≡ codepoints for the ASCII
    * identifiers linkage runs on). */
  def similarity(a: String, b: String): Double = {
    if (a.equals(b)) return 1.0
    val la = a.length; val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatched = new Array[Boolean](la)
    val bMatched = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!bMatched(j) && a.charAt(i) == b.charAt(j)) {
          aMatched(i) = true; bMatched(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars in order of appearance
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatched(i)) {
        while (!bMatched(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    while (l < math.min(4, math.min(la, lb)) && a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  def jaroWinkler(a: Column, b: Column): Column =
    GraftColumnBridge.column(JaroWinkler(
      GraftColumnBridge.expression(a.cast("string")),
      GraftColumnBridge.expression(b.cast("string"))))

  /** Register for SQL use (`SELECT jaro_winkler(a, b) ...`). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler", exprs => JaroWinkler(exprs(0), exprs(1)), "built-in")
}
