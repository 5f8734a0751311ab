package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169) — rank a raw corpus by how target-like each document
  * is under cheap bag-of-words language models: the importance weight of a
  * document is the average per-token log-ratio between a TARGET unigram LM
  * and the RAW-corpus unigram LM,
  * {{{
  *   w(d) = (1/|d|) Σ_{tok ∈ d} ln p_target(tok) / p_raw(tok)
  * }}}
  * with add-1 smoothing over the union vocabulary (`p(tok) =
  * (c+1)/(N+V)`), so tokens unseen in either corpus stay finite and the
  * ratio is defined everywhere. Top-weighted documents are the ones to
  * keep when distilling a web-scale crawl toward a high-quality target
  * distribution (the paper hashes n-grams into a fixed feature space; the
  * hashing step is a drop-in replacement for the token key here and
  * changes nothing about the plan shape).
  *
  * Scale shape: both LMs are single hash aggregations over their token
  * relations (vocabulary-bounded, map-side partial agg); scoring is ONE
  * hash join from the raw token relation to the merged LM table keyed by
  * token, then a per-doc decimal sum — no iteration, no driver state.
  * The normalizers (N_t, N_r, V) are 1-row scalar broadcasts. Per-term
  * DECIMAL(18,9) casts make the sum order-independent and the ranking
  * engine-portable (the q243/NaiveBayes rule).
  */
object Dsir {

  /** Importance weights for every document of `raw` against `target`.
    * Returns `(id, n_toks, weight)` with `weight` rounded to 6 decimals.
    * Tokens of a raw doc absent from BOTH corpora still contribute
    * `ln (N_r+V)/(N_t+V)` — a constant offset that cancels in ranking. */
  def importanceWeights(raw: DataFrame, target: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val rawToks = raw.select(col(idCol).as("id"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val tgtToks = target.select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))

    val cr = rawToks.groupBy(col("tok")).agg(count(lit(1)).as("c_raw"))
    val ct = tgtToks.groupBy(col("tok")).agg(count(lit(1)).as("c_tgt"))
    val lm = cr.join(ct, Seq("tok"), "full_outer")
      .select(col("tok"), coalesce(col("c_raw"), lit(0L)).as("c_raw"),
        coalesce(col("c_tgt"), lit(0L)).as("c_tgt"))
    val scalars = lm.agg(sum(col("c_raw")).as("n_raw"),
      sum(col("c_tgt")).as("n_tgt"), count(lit(1)).as("v"))

    rawToks.groupBy(col("id"), col("tok")).agg(count(lit(1)).as("m"))
      .join(lm, Seq("tok"), "left_outer")
      .crossJoin(broadcast(scalars))
      .select(col("id"), col("m"),
        (col("m").cast("double") *
          log(((coalesce(col("c_tgt"), lit(0L)) + 1).cast("double") /
              (col("n_tgt") + col("v")).cast("double")) /
            ((coalesce(col("c_raw"), lit(0L)) + 1).cast("double") /
              (col("n_raw") + col("v")).cast("double"))))
          .cast("decimal(18,9)").as("term"))
      .groupBy(col("id"))
      .agg(sum(col("m")).as("n_toks"), sum(col("term")).as("lsum"))
      .select(col("id"), col("n_toks"),
        round(col("lsum").cast("double") / col("n_toks"), 6).as("weight"))
  }
}
