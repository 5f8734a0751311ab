package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Generator emitting the 64-bit hash of every `n`-token shingle of a text
  * column — one narrow pass per row, NO shuffle.
  *
  * The composable-expression form (`posexplode(split(...))` + a window of
  * `lead`s, see `Dedup.shingleHashRows`'s history) costs a full-corpus
  * hash-partition + sort on the document id just to see adjacent tokens
  * together. But shingling is row-local: this generator tokenizes,
  * hashes each token (xxhash64, seed 42 — same chain as the SQL
  * `xxhash64(...)`), and slides the n-window inside one `eval`, so the
  * shingle relation is produced map-side and the only shuffles left in the
  * dedup pipeline are the ones the algebra genuinely needs (the signature
  * group-by / shingle join). At 100 TB this removes the largest exchange
  * in the corpus-dedup DAG.
  *
  * CodegenFallback is fine here: the cost is per-row (one call per
  * document), not per-element like an interpreted HOF lambda.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes needs a string column and n >= 1 (got ${child.dataType}, n=$n)")

  override def elementSchema: StructType =
    StructType(StructField("h", LongType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) return Nil
    val toks = t.asInstanceOf[UTF8String].toString.trim
      .split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return Nil
    val th = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      th(i) = XxHash64Function.hash(UTF8String.fromString(toks(i)), StringType, 42L)
      i += 1
    }
    val out = new Array[InternalRow](toks.length - n + 1)
    i = 0
    while (i <= toks.length - n) {
      var acc = 42L
      var j = 0
      while (j < n) { acc = XxHash64Function.hash(th(i + j), LongType, acc); j += 1 }
      out(i) = InternalRow(acc)
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** String form of [[ShingleHashes]]: emits every `n`-token shingle of the
  * text as a space-joined string, WITH multiplicity (frequency signals
  * like the repetition report need the counts). Same no-shuffle rationale. */
case class ShingleStrings(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_strings needs a string column and n >= 1 (got ${child.dataType}, n=$n)")

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) return Nil
    val toks = t.asInstanceOf[UTF8String].toString.trim
      .split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return Nil
    val out = new Array[InternalRow](toks.length - n + 1)
    var i = 0
    while (i <= toks.length - n) {
      out(i) = InternalRow(UTF8String.fromString(toks.slice(i, i + n).mkString(" ")))
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleStrings =
    copy(child = newChild)
}
