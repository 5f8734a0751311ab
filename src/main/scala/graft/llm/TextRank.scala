package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over the
  * word co-occurrence graph — words that keep company with many
  * well-connected words rank high, the unsupervised keyword signal
  * curation pipelines use where tf-idf needs a background corpus.
  *
  * Determinism/portability: per-iteration rank vectors are QUANTIZED to
  * DECIMAL(18,12) and every damped contribution is decimal-cast before
  * its order-free sum (the engine's q243 rule applied once per
  * iteration), so after any number of iterations the scores — and the
  * keyword ordering — replay bit-for-bit in any SQL engine.
  *
  * Scale shape: edges come from a row-local zip of adjacent tokens (one
  * hash agg on the (w1,w2) pair key — vocabulary-bounded); each PageRank
  * iteration is one join from the edge relation to the rank vector (both
  * keyed by word) plus one aggregation — no driver-side state, the rank
  * vector never leaves DataFrame land, and iterations chain as narrow
  * plan layers (5 iterations ≈ 5 joins, all broadcast-able when the
  * vocabulary is model-sized).
  */
object TextRank {

  /** Undirected co-occurrence edges from ADJACENT token pairs:
    * `(w1, w2, weight)` with w1 < w2 (self-pairs dropped), weight = corpus
    * occurrence count. Pair construction is row-local (array zip). */
  def cooccurrenceEdges(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextAnalysis.tokens(lower(col(textCol)))
    val a = slice(toks, lit(1), greatest(size(toks) - 1, lit(0)))
    val b = slice(toks, lit(2), greatest(size(toks) - 1, lit(0)))
    val pairs = filter(
      zip_with(a, b, (x, y) =>
        when(x < y, struct(x.as("w1"), y.as("w2")))
          .when(x > y, struct(y.as("w1"), x.as("w2")))),
      p => p.isNotNull)
    docs.select(explode(pairs).as("p"))
      .select(col("p.w1"), col("p.w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("weight"))
  }

  /** Weighted PageRank over undirected edges, `iters` damped rounds.
    * Returns `(word, score)` with score the DECIMAL(18,12)-quantized
    * stationary estimate. */
  def pageRank(edges: DataFrame, iters: Int = 5, damping: Double = 0.85): DataFrame = {
    // The edge relation, out-weight table, and node list are
    // iteration-INVARIANT: pin their lineage once (localCheckpoint, the
    // Pca/Graph precedent) so each round's plan references materialized
    // blocks instead of re-embedding the tokenize→explode→groupBy edge
    // derivation — without this the final plan holds ~2^iters copies of
    // the corpus tokenization subtree.
    val dir = edges.select(col("w1").as("s"), col("w2").as("t"), col("weight"))
      .unionByName(edges.select(col("w2").as("s"), col("w1").as("t"), col("weight")))
      .localCheckpoint(true)
    val outw = dir.groupBy(col("s")).agg(sum(col("weight")).as("ow"))
      .localCheckpoint(true)
    val nodes = dir.select(col("s").as("word")).distinct().localCheckpoint(true)
    val n = nodes.count()
    val base = (1.0 - damping) / n
    var pr = nodes.withColumn("pr",
      round(lit(1.0 / n), 12).cast(DecimalType(18, 12)))
    for (it <- 1 to iters) {
      val contrib = dir
        .join(pr.select(col("word").as("s"), col("pr")), Seq("s"))
        .join(outw, Seq("s"))
        .select(col("t"),
          ((col("weight").cast("double") / col("ow").cast("double")) *
            col("pr").cast("double")).cast(DecimalType(28, 12)).as("c"))
        .groupBy(col("t")).agg(sum(col("c")).as("cs"))
      pr = nodes
        .join(contrib.select(col("t").as("word"), col("cs")), Seq("word"), "left_outer")
        .select(col("word"),
          round(lit(base) + lit(damping) *
            coalesce(col("cs"), lit(0)).cast("double"), 12)
            .cast(DecimalType(18, 12)).as("pr"))
      // Pin the rank vector every 8 rounds: with dir/outw/nodes already
      // materialized each un-pinned round adds only a fixed 2-join layer
      // (linear, all broadcast-able when the vocabulary is model-sized),
      // so an eager job per round would cost more in scheduling than it
      // saves; periodic pinning still bounds lineage depth for large
      // iteration counts (Graph.shortestPaths' checkpointEvery pattern).
      if (it % 8 == 0 && it < iters) pr = pr.localCheckpoint(true)
    }
    pr.select(col("word"), col("pr").as("score"))
  }
}
