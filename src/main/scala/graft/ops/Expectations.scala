package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality expectations — DLT's `expect_all_or_drop` surface
  * (reference: DimUser.py:3-8 `{"rule 1": "user_id IS NOT NULL"}`;
  * readme.md:119-120), as filter + `observe()` metrics so violation
  * counts surface without a second pass over the data (C6).
  */
case class Expectation(name: String, predicate: String)

object Expectations {

  /** Drop rows violating ANY expectation (SQL three-valued logic: a NULL
    * predicate is a violation, matching DLT). Violation counts per rule are
    * attached as an `observe` metric named `observationName`, readable from
    * `df.collectResult`/`StreamingQueryListener` with zero extra scans. */
  def expectAllOrDrop(
      df: DataFrame,
      expectations: Seq[Expectation],
      observationName: String = "quality"): DataFrame = {
    if (expectations.isEmpty) df
    else {
      val preds = expectations.map(e => expr(e.predicate))
      val metrics = expectations.zip(preds).map { case (e, p) =>
        sum(when(p, 0).otherwise(1)).as(s"violations_${e.name.replaceAll("\\W", "_")}")
      }
      df.observe(observationName, metrics.head, metrics.tail: _*)
        .filter(preds.reduce(_ && _))
    }
  }

  /** Quarantine split: every row tagged with the FIRST violated rule name
    * (null = clean), so a pipeline can route good rows onward and bad rows
    * to a quarantine sink with their reject reason — the recoverable form
    * of expect-or-drop (dropped data at 100 TB is an incident; quarantined
    * data is a backfill). One pass, no second scan: the tag is a single
    * codegen'd CASE expression. */
  def tagViolations(
      df: DataFrame,
      expectations: Seq[Expectation],
      tagCol: String = "__rejected_by"): DataFrame = {
    val tag = expectations.foldRight(lit(null).cast("string")) { (e, acc) =>
      when(!coalesce(expr(e.predicate), lit(false)), lit(e.name)).otherwise(acc)
    }
    df.withColumn(tagCol, tag)
  }

  /** (good, quarantined) pair from one tagging pass. */
  def quarantine(
      df: DataFrame,
      expectations: Seq[Expectation]): (DataFrame, DataFrame) = {
    val tagged = tagViolations(df, expectations)
    (tagged.filter(col("__rejected_by").isNull).drop("__rejected_by"),
      tagged.filter(col("__rejected_by").isNotNull))
  }

  // ── Table-level constraint checks (the dbt-test / DLT-expectation gap:
  // expectations above are ROW-level; uniqueness and referential
  // integrity need the whole table) ──────────────────────────────────────

  /** Primary-key violations: one row per duplicated key with its
    * multiplicity (empty ⇔ the key is unique). One hash aggregation on
    * the key — the natural shuffle, nothing extra. */
  def primaryKeyViolations(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)

  /** Referential-integrity orphans: child rows whose key has no match in
    * `parent` (empty ⇔ the FK holds). Null child keys are skipped — SQL
    * FK semantics. Anti join on the key; Spark broadcasts the parent key
    * set when small. */
  def foreignKeyOrphans(child: DataFrame, childKeys: Seq[String],
      parent: DataFrame, parentKeys: Seq[String]): DataFrame = {
    val p = parent.select(parentKeys.map(col): _*).toDF(childKeys: _*)
    child.filter(childKeys.map(k => col(k).isNotNull).reduce(_ && _))
      .join(p, childKeys, "left_anti")
  }
}
