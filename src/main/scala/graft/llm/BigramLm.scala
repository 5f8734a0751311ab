package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Bigram language-model scoring — the PERPLEXITY-FILTER stage of a
  * training-data pipeline (CCNet/Gopher keep documents whose LM score is
  * unsurprising; a KenLM 5-gram is the usual tool, an add-1-smoothed
  * bigram LM is its engine-portable core): train transition counts on a
  * reference corpus, score every document by its mean transition
  * log-probability. Low (very negative) scores flag gibberish/boilerplate;
  * suspiciously-high scores flag templated text.
  *
  * Determinism/portability: each transition's
  * `ln((c2 + 1) / (c1 + |V|))` is rounded to 12 dp and decimal-summed
  * (order-free), the per-doc mean rounded to 6 — the engine's q224/PSI
  * discipline, so scores replay bit-for-bit in any SQL engine.
  *
  * Scale shape: the model is two vocabulary-bounded aggregations (bigram
  * and history counts — never corpus-sized); scoring is one hash join of
  * the corpus' bigram rows against the model plus one per-doc aggregation.
  * Nothing reaches the driver; |V| is a broadcast scalar.
  */
object BigramLm {

  /** Directional adjacent-token pairs `(id, w1, w2)`, one row per
    * transition (row-local zip — no shuffle). */
  def bigramRows(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextAnalysis.tokens(lower(col(textCol)))
    val a = slice(toks, lit(1), greatest(size(toks) - 1, lit(0)))
    val b = slice(toks, lit(2), greatest(size(toks) - 1, lit(0)))
    docs.select(col(idCol).as("id"),
        explode(zip_with(a, b, (x, y) => struct(x.as("w1"), y.as("w2")))).as("p"))
      .select(col("id"), col("p.w1"), col("p.w2"))
  }

  /** Score every `docs` row under an add-1 bigram LM trained on `train`:
    * `(id, n_bigrams, avg_logprob)`. Docs with fewer than 2 tokens score
    * `(0, 0.0)` — explicitly present, never dropped. */
  def scoreDocs(train: DataFrame, docs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val tb = bigramRows(train, idCol, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val t1 = tb.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val vocab = train
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("w"))
      .agg(countDistinct(col("w")).as("vv"))

    val scored = bigramRows(docs, idCol, textCol)
      .join(tb, Seq("w1", "w2"), "left_outer")
      .join(t1, Seq("w1"), "left_outer")
      .crossJoin(broadcast(vocab))
      .select(col("id"),
        round(log((coalesce(col("c2"), lit(0L)).cast("double") + 1.0) /
          (coalesce(col("c1"), lit(0L)).cast("double") + col("vv").cast("double"))), 12)
          .cast(DecimalType(28, 12)).as("term"))
      .groupBy(col("id"))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        (round(sum(col("term")).cast("double") / count(lit(1)), 6) + lit(0.0))
          .as("avg_logprob"))

    docs.select(col(idCol).as("id")).distinct()
      .join(scored, Seq("id"), "left_outer")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        (coalesce(col("avg_logprob"), lit(0.0)) + lit(0.0)).as("avg_logprob"))
  }
}
