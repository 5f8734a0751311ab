package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed multinomial Naive Bayes over word unigrams — the TRAINED
  * counterpart of [[TextAnalysis.modelScore]] (whose weights are shipped
  * literals): here the model is *fit on the corpus itself* in one
  * distributed counting pass and applied in one join, the fastText-style
  * "train a cheap classifier on labeled seed data, score everything"
  * pattern curation pipelines use for language ID, quality tiers, and
  * domain routing.
  *
  * Model (add-1 / Laplace smoothing, natural log):
  * {{{
  *   score(l, d) = ln P(l) + Σ_{tok ∈ d} m_tok · ln (c(l,tok) + 1) / (N_l + V)
  * }}}
  * with `V` = |train vocabulary| and unseen tokens contributing
  * `ln 1/(N_l + V)` (the standard smoothed back-off — they still
  * discriminate via each class's mass `N_l`).
  *
  * Scale shape: TRAINING is two hash aggregations — per-(label, token)
  * counts (vocabulary-bounded, partial-agg combines map-side) and
  * per-label token mass — plus a 1-row scalar for V; no iteration, no
  * driver-side model materialization: the "model" stays a DataFrame and
  * SCORING is a hash join from the test token relation to it, keyed by
  * token. The label dimension (|labels| rows) broadcasts. Per-ulp libm
  * drift between engines is absorbed by casting each additive term to
  * DECIMAL(18,9) before the order-independent decimal sum (the BM25/q243
  * rule), so scores — and therefore argmax picks — are engine-portable.
  */
object NaiveBayes {

  /** Fit on `train`, score and classify `test`.
    * Returns `(id, pred, score)` — `pred` is the argmax label (ties broken
    * by label ascending), `score` the winning smoothed log-likelihood
    * rounded to 6 decimals. */
  def trainPredict(train: DataFrame, test: DataFrame,
      idCol: String, textCol: String, labelCol: String): DataFrame = {
    val trainToks = train.select(col(labelCol).as("lab"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))

    val classTok = trainToks.groupBy(col("lab"), col("tok"))
      .agg(count(lit(1)).as("ctok"))
    val classMass = trainToks.groupBy(col("lab"))
      .agg(count(lit(1)).as("nl"))
    val vocab = trainToks.agg(countDistinct(col("tok")).as("v"))
    val priors = train.groupBy(col(labelCol).as("lab"))
      .agg(count(lit(1)).as("ndocs"))
      .crossJoin(broadcast(train.agg(count(lit(1)).as("ntotal"))))
      .select(col("lab"),
        log(col("ndocs").cast("double") / col("ntotal")).as("lprior"))

    // Test token relation with multiplicities (one row per distinct token
    // per doc — repeats weight the sum, they don't repeat the join).
    val testToks = test.select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy(col("id"), col("tok")).agg(count(lit(1)).as("m"))

    // Every (test token × label) pair, with the trained count or 0: the
    // label dim is |labels| rows — broadcast — so this is a map-side
    // expansion of the token relation, then one hash join on (lab, tok).
    val labels = classMass.select(col("lab"))
    val scored = testToks
      .join(broadcast(labels))
      .join(classTok, Seq("lab", "tok"), "left_outer")
      .join(broadcast(classMass), Seq("lab"))
      .crossJoin(broadcast(vocab))
      .select(col("id"), col("lab"),
        (col("m").cast("double") *
          log((coalesce(col("ctok"), lit(0L)) + lit(1)).cast("double") /
            (col("nl") + col("v")).cast("double")))
          .cast("decimal(18,9)").as("term"))
      .groupBy(col("id"), col("lab"))
      .agg(sum(col("term")).as("loglik"))
      .join(broadcast(priors), Seq("lab"))
      .select(col("id"), col("lab"),
        round(col("loglik").cast("double") +
          col("lprior").cast("decimal(18,9)").cast("double"), 6).as("score"))

    val w = Window.partitionBy(col("id"))
      .orderBy(col("score").desc, col("lab"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("id"), col("lab").as("pred"), col("score"))
  }
}
