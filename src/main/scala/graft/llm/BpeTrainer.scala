package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge training (Sennrich et al.,
  * "Neural Machine Translation of Rare Words with Subword Units",
  * ACL'16) — the tokenizer-training step of an LLM data pipeline, run as
  * a Spark job:
  *
  *  - the corpus is collapsed to a (word, count) frequency table once —
  *    pair statistics are identical on it, and it is the only state the
  *    loop touches (distributed; at 100 TB the word table is billions of
  *    rows but each iteration is one small-key aggregation over it);
  *  - each iteration counts adjacent token pairs weighted by word count
  *    (explode → sum — shuffle keys are short pair strings), picks the
  *    most frequent pair (count desc, pair asc — a deterministic 1-row
  *    reduce), and rewrites the token arrays with a codegen'd greedy
  *    left-to-right fold (`aggregate` HOF — no UDF);
  *  - token arrays are `localCheckpoint`ed per round so the plan stays
  *    O(1) across iterations (same lineage-pinning as the other iterative
  *    operators).
  *
  * Returns the merge table: (step, left, right, freq) — the learned
  * vocabulary in merge order, which IS a BPE tokenizer definition.
  */
object BpeTrainer {

  /** Greedy left-to-right merge of adjacent (a, b) into a+b over a token
    * array, as a pure codegen'd fold. State: (out, prev) — `prev` holds
    * the one-token lookbehind; "" is the empty sentinel (tokens are never
    * empty). "aaa" under (a,a) → ["aa", "a"], the BPE-standard greedy. */
  private def mergePair(tokens: Column, a: String, b: String): Column = {
    val flush = (acc: Column) =>
      when(acc.getField("prev") === "", acc.getField("out"))
        .otherwise(concat(acc.getField("out"), array(acc.getField("prev"))))
    aggregate(tokens,
      struct(array().cast("array<string>").as("out"), lit("").as("prev")),
      (acc, x) => when(acc.getField("prev") === lit(a) && x === lit(b),
          struct(concat(acc.getField("out"), array(lit(a + b))).as("out"),
            lit("").as("prev")))
        .otherwise(struct(flush(acc).as("out"), x.as("prev"))),
      acc => flush(acc))
  }

  /** Tokenize `textCol` with an already-learned merge table, applied in
    * merge order — the inference half of the trainer. Scale shape: merges
    * run once over the DISTINCT-word vocabulary (a tiny table next to the
    * corpus), and documents pick up their tokens through an equi-join on
    * the word — the per-row work at 100 TB is a hash probe, not k merge
    * folds. Output: (id, tokens, n_tokens), token order = word order. */
  def encode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val docWords = df.select(col(idCol).as("id"),
        posexplode(split(lower(col(textCol)), "\\s+")).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
    var vocab = docWords.select("w").distinct()
      .withColumn("toks", filter(split(col("w"), ""), t => t =!= ""))
    merges.foreach { case (a, b) =>
      vocab = vocab.withColumn("toks", mergePair(col("toks"), a, b))
    }
    docWords.join(vocab, "w")
      .groupBy(col("id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("toks")))),
        x => x.getField("toks"))).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")))
  }

  /** Train `numMerges` BPE merges over the whitespace-tokenized, lowercased
    * words of `textCol`. Initial tokens are single characters. Stops early
    * when no adjacent pair occurs at least `minFreq` times. */
  def train(df: DataFrame, textCol: String,
      numMerges: Int, minFreq: Long = 2L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    var words = df
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(filter(split(col("w"), ""), t => t =!= "").as("toks"), col("cnt"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      val top = words
        .filter(size(col("toks")) >= 2)
        .select(explode(zip_with(
          // adjacent pairs over the FULL token array (length-driven slices:
          // a fixed cap would silently undercount pathologically long words)
          slice(col("toks"), lit(1), size(col("toks")) - 1), // left operands
          slice(col("toks"), lit(2), size(col("toks")) - 1), // right, shifted by one
          (l, r) => struct(l.as("l"), r.as("r")))).as("p"), col("cnt"))
        .filter(col("p.r").isNotNull)
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("freq"))
        .orderBy(col("freq").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty || top.head.getLong(2) < minFreq) done = true
      else {
        val (a, b, f) = (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        step += 1
        merges += ((step, a, b, f))
        words = words.withColumn("toks", mergePair(col("toks"), a, b))
          .localCheckpoint()
      }
    }
    merges.toSeq.toDF("step", "left", "right", "freq")
  }
}
