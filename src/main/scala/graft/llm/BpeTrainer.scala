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

  /** Inverse of [[encode]]/[[encodeAtScale]] at the text level: BPE is a
    * LOSSLESS segmentation of each (lowercased, whitespace-split) word,
    * so concatenating a doc's tokens must reproduce its normalized
    * character stream exactly — the round-trip invariant tokenizer
    * pipelines assert before shipping a merge table. */
  def decode(tokens: Column): Column = array_join(tokens, "")

  /** Vocab-scale tokenization (the 32k-merge production path): [[encode]]
    * stacks one column-fold PER MERGE, so a real vocabulary builds a
    * 32k-deep Catalyst expression tree — analysis cost explodes long
    * before any data moves. This form broadcasts the merge table as a
    * rank map and tokenizes each distinct word in a partition-local
    * kernel: repeatedly merge the LOWEST-RANK adjacent pair present
    * (greedy left-to-right within a round) until none remains — the
    * canonical BPE inference loop, provably equal to applying merges in
    * rank order (a merge's output token can only appear in later-ranked
    * merges, so no earlier merge ever becomes applicable again; pinned
    * against [[encode]] in LlmOpsSpec). Documents still pick up tokens
    * via the word equi-join — per-corpus-row work at 100 TB stays a hash
    * probe; the O(len²) worst-case loop runs once per DISTINCT word. */
  def encodeAtScale(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // array for O(1) rank→pair lookup in the kernel loop (a Seq could be
    // a List: O(n) apply × rounds × words = quadratic at 32k merges)
    val mergeArr = merges.toArray
    val rank = merges.zipWithIndex.toMap
    val bc = spark.sparkContext.broadcast(rank)
    val docWords = df.select(col(idCol).as("id"),
        posexplode(split(lower(col(textCol)), "\\s+")).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
    val vocab = docWords.select("w").distinct().as[String]
      .mapPartitions { words =>
        val r = bc.value
        words.map { w =>
          var toks = w.split("").filter(_.nonEmpty)
          var more = toks.length > 1
          while (more) {
            // lowest-rank pair present this round
            var best = Int.MaxValue
            var i = 0
            while (i < toks.length - 1) {
              r.get((toks(i), toks(i + 1))).foreach(k => if (k < best) best = k)
              i += 1
            }
            if (best == Int.MaxValue) more = false
            else {
              val (a, b) = mergeArr(best)
              val out = scala.collection.mutable.ArrayBuffer[String]()
              var j = 0
              while (j < toks.length) {
                if (j < toks.length - 1 && toks(j) == a && toks(j + 1) == b) {
                  out += a + b; j += 2
                } else { out += toks(j); j += 1 }
              }
              toks = out.toArray
            }
          }
          (w, toks.toSeq)
        }
      }.toDF("w", "toks")
    docWords.join(vocab, "w")
      .groupBy(col("id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("toks")))),
        x => x.getField("toks"))).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")))
  }

  /** UTF-8 byte order — Spark's string sort order (UTF8String binary
    * compare), so local tie-breaks match the distributed `orderBy`
    * exactly even off-ASCII. */
  private val utf8Order: Ordering[String] = (x: String, y: String) => {
    val a = x.getBytes("UTF-8"); val b = y.getBytes("UTF-8")
    var i = 0
    var c = 0
    val n = math.min(a.length, b.length)
    while (i < n && c == 0) {
      c = (a(i) & 0xff) - (b(i) & 0xff)
      i += 1
    }
    if (c != 0) c else a.length - b.length
  }

  /** Vocab-scale training (the 32k-merge production path): the corpus
    * collapses to a (word, count) table distributed, the table is capped
    * to the `vocabCap` most frequent word TYPES (deterministic: count
    * desc, word asc in UTF-8 order), and the merge loop runs as one
    * tight LOCAL fit over the capped table — the same training economics
    * as [[ProductQuantizer.train]]: BPE statistics are model-training
    * state bounded by `vocabCap × avgWordLen` bytes, not corpus data,
    * and 32k sequential Spark jobs (one `limit(1).collect()` argmax per
    * merge) would be pure scheduling overhead at any corpus size. With
    * `vocabCap ≥ |distinct words|` the result is IDENTICAL to [[train]]
    * (same counts, same greedy argmax, same tie-breaks — pinned in
    * LlmOpsSpec); a real cap trades exactness on the rare-word tail for
    * a merge loop whose cost is independent of corpus size, which is how
    * production tokenizer trainers (SentencePiece, HF) behave.
    *
    * Scale shape at 100 TB: ONE distributed map-side-combined word-count
    * aggregation + a TakeOrdered of `vocabCap` short strings; everything
    * after is driver-local and flat in corpus size (soaked in ScaleSoak:
    * 10× corpus ⇒ flat train time). */
  def trainCapped(df: DataFrame, textCol: String, numMerges: Int,
      minFreq: Long = 2L, vocabCap: Int = 200000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val capped = df
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(vocabCap)
      .as[(String, Long)].collect()

    // local greedy BPE over the capped table — same algebra as the
    // distributed loop: pair counts weighted by word count, argmax by
    // (freq desc, left asc, right asc), greedy left-to-right rewrite
    var words: Array[(Array[String], Long)] =
      capped.map { case (w, c) => (w.split("").filter(_.nonEmpty), c) }
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      val freqs = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (toks, cnt) =>
        var i = 0
        while (i < toks.length - 1) {
          freqs.merge((toks(i), toks(i + 1)), cnt, _ + _)
          i += 1
        }
      }
      var best: ((String, String), Long) = null
      freqs.forEach { (p, f) =>
        if (best == null || f > best._2 ||
            (f == best._2 && (utf8Order.compare(p._1, best._1._1) < 0 ||
              (p._1 == best._1._1 && utf8Order.compare(p._2, best._1._2) < 0))))
          best = (p, f)
      }
      if (best == null || best._2 < minFreq) done = true
      else {
        val ((a, b), f) = best
        step += 1
        merges += ((step, a, b, f))
        words = words.map { case (toks, cnt) =>
          if (toks.length < 2) (toks, cnt)
          else {
            val out = scala.collection.mutable.ArrayBuffer[String]()
            var i = 0
            while (i < toks.length) {
              if (i < toks.length - 1 && toks(i) == a && toks(i + 1) == b) {
                out += a + b; i += 2
              } else { out += toks(i); i += 1 }
            }
            (out.toArray, cnt)
          }
        }
      }
    }
    merges.toSeq.toDF("step", "left", "right", "freq")
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
