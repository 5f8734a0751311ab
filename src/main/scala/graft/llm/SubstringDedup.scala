package graft.llm

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring-level duplication detection — the suffix-array-style
  * dedup signal ("this exact span of ≥L characters also occurs elsewhere
  * in the corpus") that near-dup MinHash/SimHash cannot express, because
  * those score whole documents while training-data contamination and
  * boilerplate live in SPANS (Lee et al. 2022 remove duplicated
  * substrings, not duplicated documents).
  *
  * Algorithm, fully relational (no suffix array materialized):
  *  1. every character position emits its fixed-length L-gram
  *     (`explode(sequence)` + `substr` — codegen'd, no UDF);
  *  2. one hash aggregation on the gram finds grams occurring at ≥2
  *     corpus positions (within-doc repeats count: they are exactly the
  *     boilerplate case) and re-emits the positions — aggregate-then-
  *     re-explode, so the corpus-wide gram relation is shuffled ONCE;
  *  3. per document, consecutive duplicated positions collapse to
  *     maximal runs (gaps-and-islands: `i - row_number()`), each run
  *     covering chars [min(i), max(i)+L-1];
  *  4. runs whose character intervals overlap (position gap < L) merge
  *     via the running-max-end interval union, giving disjoint
  *     duplicated spans and therefore an exact duplicated-char count.
  *
  * Every duplicated substring of length ≥ L contains a duplicated L-gram
  * at each of its positions, so the spans are exact (no sampling, no
  * winnowing): a character is counted iff it lies inside some duplicated
  * run of length ≥ L.
  *
  * At 100 TB: cost is Θ(total chars) rows through one gram-keyed
  * exchange (the same asymptotics as distributed suffix-array builds,
  * with a ~L-byte constant) and one doc-keyed window. Gram groups are
  * bounded by the corpus duplication count per gram; a degenerate corpus
  * (one char repeated everywhere) concentrates a single gram key — for
  * such inputs swap step 2 for the two-pass count-then-join form, which
  * trades a second exchange for no per-key collection.
  */
object SubstringDedup {

  /** Per-document duplicated-span profile: `(id, dup_chars, max_span,
    * dup_frac)` for every document containing at least one substring of
    * length ≥ `gramLen` that occurs at ≥2 positions corpus-wide. */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      gramLen: Int): DataFrame = {
    val L = gramLen
    // the length guard matters: Spark's sequence(1, n) DESCENDS when n < 1
    val grams = docs
      .filter(length(col(textCol)) >= L)
      .select(col(idCol).as("id"), col(textCol).as("t"))
      .withColumn("i", explode(sequence(lit(1), length(col("t")) - lit(L - 1))))
      .select(col("id"), col("i"), col("t").substr(col("i"), lit(L)).as("gram"))
      .localCheckpoint() // reused by the count pass and the semi join

    // count pass stays a codegen'd declarative agg (partial aggregation,
    // no per-group object collection); the duplicated-gram set is small
    // whenever duplication is rare, so AQE turns the semi join into a
    // broadcast — the full gram relation then never shuffles twice
    val dupGrams = grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2).select(col("gram"))
    val dupPos = grams.join(dupGrams, Seq("gram"), "left_semi")
      .select(col("id"), col("i"))

    val wIsl = Window.partitionBy(col("id")).orderBy(col("i"))
    val runs = dupPos
      .withColumn("grp", col("i") - row_number().over(wIsl))
      .groupBy(col("id"), col("grp"))
      .agg(min(col("i")).as("s"), (max(col("i")) + lit(L - 1)).as("e"))

    // interval union: runs overlap when the position gap is < L
    val wPrev = Window.partitionBy(col("id")).orderBy(col("s"), col("e"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wOrd = Window.partitionBy(col("id")).orderBy(col("s"), col("e"))
    val merged = runs
      .withColumn("pme", max(col("e")).over(wPrev))
      .withColumn("f", when(col("pme").isNull || col("s") > col("pme"), 1).otherwise(0))
      .withColumn("mgrp", sum(col("f")).over(wOrd))
      .groupBy(col("id"), col("mgrp"))
      .agg(min(col("s")).as("ms"), max(col("e")).as("me"))

    val lens = docs.select(col(idCol).as("id"), length(col(textCol)).as("len"))
    merged.groupBy(col("id"))
      .agg(sum(col("me") - col("ms") + 1).cast("long").as("dup_chars"),
        max(col("me") - col("ms") + 1).cast("long").as("max_span"))
      .join(lens, "id")
      .select(col("id").as(idCol), col("dup_chars"), col("max_span"),
        round(col("dup_chars").cast("double") / col("len"), 6).as("dup_frac"))
  }
}
