package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Privacy transforms for sharing/derived datasets — the masking layer a
  * governed lakehouse puts between raw PII and downstream consumers
  * (complements [[graft.llm.TextAnalysis.redactPii]], which scrubs
  * free text):
  *
  *  - [[pseudonym]]: keyed surrogate (SHA-256 over a secret pepper + the
  *    value). DETERMINISTIC, so referential integrity survives — the same
  *    key pseudonymizes identically in every table and joins still work —
  *    while reversal requires the pepper (rotate the pepper → all tokens
  *    rotate). This is tokenization-by-MAC, the standard join-preserving
  *    de-identification shape.
  *  - [[generalize]]: numeric binning (floor to a bucket width) — the
  *    k-anonymity-style coarsening for quasi-identifiers.
  *  - [[nullify]]: constant suppression for columns a consumer must not
  *    see (schema survives, values do not).
  *
  * All three are pure codegen'd expressions (no UDFs): masking a 100 TB
  * table is one scan-and-write with zero shuffles.
  */
object Privacy {

  /** Keyed surrogate token: `sha256(pepper || ':' || value)`, hex.
    * Null-safe: null stays null (a token for null would link all
    * null-keyed rows). */
  def pseudonym(c: Column, pepper: String): Column =
    when(c.isNull, lit(null).cast("string"))
      .otherwise(sha2(concat(lit(pepper), lit(":"), c.cast("string")), 256))

  /** Generalize a numeric to its bucket floor (width > 0). */
  def generalize(c: Column, width: Double): Column = {
    require(width > 0, "bucket width must be positive")
    floor(c.cast("double") / width) * width
  }

  /** Suppress a column's values, keeping its slot in the schema. */
  def nullify(c: Column): Column = lit(null).cast("string").as(c.toString)
}
