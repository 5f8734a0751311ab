package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end corpus-curation pipeline the individual LLM operators
  * exist for: score → filter → dedup → annotate, as one composed
  * DataFrame transform (quality gate, language tag, exact-dedup
  * canonicalization). Chunking ([[TextChunker]]) and near-dup removal
  * ([[Dedup.minhashNearDupPairs]] anti-join) compose downstream.
  *
  * Plan shape: one narrow scoring pass (all codegen), one shuffle on the
  * content fingerprint for dedup. Nothing else.
  */
object Curation {

  /** Keep documents scoring ≥ `minQuality`, collapse exact duplicates to
    * the lowest-id representative, and annotate with language + stats. */
  def curate(df: DataFrame, idCol: String, textCol: String,
      minQuality: Double = 1.0): DataFrame = {
    val scored = df.select(
        col(idCol),
        col(textCol),
        TextAnalysis.qualityScore(col(textCol)).as("quality"),
        TextAnalysis.langId(col(textCol)).as("lang_pred"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"),
        TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .filter(col("quality") >= minQuality)
    val w = Window.partitionBy(col("fp")).orderBy(col(idCol).asc)
    scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("lang_pred"), col("quality"), col("n_tokens"))
  }
}
