package graft.llm

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Distributed lexical ranking — BM25 over a document corpus, the standard
  * retrieval/quality score (and the cheap pre-filter in front of embedding
  * rerankers in training-data curation).
  *
  * One pass tokenizes (explode before the shuffle); doc lengths and term
  * frequencies aggregate on (doc, term); document frequencies on term.
  * Corpus scalars (N, avgdl) ride a broadcast 1-row cross join — no driver
  * collect. Per-term contributions are summed as DECIMAL(18,9), so the
  * final score is independent of partial-aggregation order (same
  * determinism rule as the engine's money sums).
  *
  * At 100 TB: the only wide exchanges are the (doc_id) and (term) hash
  * aggregations; query terms and the df table broadcast.
  */
object Ranking {

  /** (id, score, per-query-term tf rows folded in): BM25 with the usual
    * k1/b defaults, natural-log idf `ln(1 + (N - df + .5)/(df + .5))`.
    * Only documents containing ≥1 query term appear. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col(idCol).as("id"),
        explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter($"w" =!= "")
    val dl = toks.groupBy($"id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum($"dl").cast("double") / count(lit(1)).cast("double")).as("avgdl"))
    val q = queryTerms.toDF("w")
    val tf = toks.join(broadcast(q), "w").groupBy($"id", $"w").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy($"w").agg(count(lit(1)).as("df"))
    val contrib = tf.join(broadcast(dfreq), "w").join(dl, "id").crossJoin(broadcast(stats))
      .withColumn("idf",
        F.log(lit(1.0) + ($"n_docs" - $"df" + 0.5) / ($"df" + 0.5)))
      .withColumn("c",
        ($"idf" * ($"tf" * lit(k1 + 1)) /
          ($"tf" + lit(k1) * (lit(1 - b) + lit(b) * $"dl" / $"avgdl")))
          .cast("decimal(18,9)"))
    contrib.groupBy($"id")
      .agg(round(sum($"c").cast("double"), 6).as("score"))
      .select(col("id").as(idCol), $"score")
  }

  /** Inverted index over word n-gram terms: `(term, df, postings)` with
    * postings as the sorted id list. Two-pass so posting lists are only
    * materialized for terms inside the [minDf, maxDf] band: the df count
    * is a codegen'd partial aggregation over the full term relation, the
    * band (small for any selective band) broadcasts back via AQE, and
    * only the surviving rows reach the collect. A stop-word-heavy term
    * therefore never builds its (huge) posting list just to be dropped —
    * the same discipline BM25 engines apply with df ceilings.
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 1, minDf: Long = 1L, maxDf: Long = Long.MaxValue): DataFrame = {
    val rows = Dedup.shingleRows(docs, idCol, textCol, n) // distinct (id, shingle)
    val band = rows.groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf && col("df") <= maxDf)
    rows.join(band, "shingle")
      .groupBy(col("shingle"), col("df"))
      .agg(array_join(
        transform(array_sort(collect_list(col("id"))), _.cast("string")),
        ",").as("postings"))
      .select(col("shingle").as("term"), col("df").cast("long").as("df"),
        col("postings"))
  }

  /** Reciprocal Rank Fusion (Cormack et al. 2009): merge any number of
    * ranked candidate lists into one by `Σ 1/(k + rank)`. The standard
    * hybrid-retrieval combiner (lexical BM25 leg ⊕ embedding-cosine leg)
    * — rank-based, so the legs' incomparable score scales never touch.
    *
    * Each input is `(id, rank)` with ranks 1..n. Fusion is a union +
    * one hash aggregation on id — no join tree, so adding a leg adds a
    * scan, not a shuffle stage. Candidate lists are top-k-bounded
    * upstream, so the fused relation is small regardless of corpus size.
    */
  def rrfFuse(legs: Seq[DataFrame], idCol: String, rankCol: String,
      k: Int = 60): DataFrame = {
    require(legs.nonEmpty, "rrfFuse needs at least one ranked leg")
    val norm = legs.map(_.select(col(idCol).as("id"),
      (lit(1.0) / (lit(k) + col(rankCol))).as("contrib")))
    norm.reduce(_ unionByName _)
      .groupBy(col("id"))
      .agg(round(sum(col("contrib")), 6).as("rrf"),
        count(lit(1)).cast("long").as("n_legs"))
      .select(col("id").as(idCol), col("rrf"), col("n_legs"))
  }
}
