package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native Catalyst expression — the text-
  * canonicalization step every multilingual corpus pipeline runs before
  * dedup/fingerprinting (NFC for storage canonicalization; NFKC for
  * match-time folding of ligatures/width variants). Spark ships no
  * normalizer function; a Scala UDF would box every row — this is a
  * codegen'd call with a fast-path: pure-ASCII rows (the overwhelming
  * majority in practice) are detected with one byte scan and returned
  * without copying; only rows that might need it pay the JDK
  * `java.text.Normalizer` cost.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(form == "NFC" || form == "NFD" || form == "NFKC" || form == "NFKD",
    s"unsupported normalization form: $form")

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.functions.UnicodeNormalize.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {

  /** Runtime helper shared by eval and generated code. ASCII fast path:
    * ASCII is closed under every normalization form, so a negative
    * high-bit scan returns the input UTF8String untouched. */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) { if (bytes(i) < 0) ascii = false; i += 1 }
    if (ascii) s
    else UTF8String.fromString(
      Normalizer.normalize(s.toString, Normalizer.Form.valueOf(form)))
  }

  def nfc(c: Column): Column = form(c, "NFC")
  def nfkc(c: Column): Column = form(c, "NFKC")

  def form(c: Column, f: String): Column =
    GraftColumnBridge.column(UnicodeNormalize(
      GraftColumnBridge.expression(c.cast("string")), f))

  /** Register for SQL use (`SELECT unicode_normalize(s, 'NFC') ...` —
    * the form argument must be a literal string). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unicode_normalize", exprs => {
        val f = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: UTF8String, StringType) =>
            v.toString.toUpperCase
          case other => throw new IllegalArgumentException(
            s"unicode_normalize form must be a string literal, got $other")
        }
        UnicodeNormalize(exprs.head, f)
      }, "built-in")
}
