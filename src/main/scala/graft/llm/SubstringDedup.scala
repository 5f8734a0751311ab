package graft.llm

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

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
  *  2. the positions whose gram matches the target gram set survive a
  *     left-semi join (for self-dedup the target set is "grams at ≥2
  *     corpus positions" from a codegen'd count pass; for
  *     decontamination it is the benchmark's distinct grams) — the
  *     match set is small in the non-pathological case, so AQE
  *     broadcasts it and the gram relation is exchanged at most once;
  *  3. per document, consecutive matching positions collapse to maximal
  *     runs (gaps-and-islands: `i - row_number()`), each run covering
  *     chars [min(i), max(i)+L-1];
  *  4. runs whose character intervals overlap or touch (position gap
  *     ≤ L) merge via the running-max-end interval union, giving the
  *     maximal CONTIGUOUS runs of matched characters — so `max_span` is
  *     exactly the longest contiguous duplicated-char stretch and
  *     `dup_chars` the exact matched-char count.
  *
  * Every duplicated substring of length ≥ L contains a duplicated L-gram
  * at each of its positions, so the spans are exact (no sampling, no
  * winnowing): a character is counted iff it lies inside some matching
  * run of length ≥ L.
  *
  * At 100 TB: cost is Θ(total chars) rows through one gram-keyed
  * exchange (the same asymptotics as distributed suffix-array builds,
  * with a ~L-byte constant) and one doc-keyed window. A degenerate
  * corpus (one char repeated everywhere) concentrates a single gram
  * key — for such inputs the count pass's partial aggregation still
  * combines map-side, and the semi join degrades to a shuffle join
  * rather than failing.
  */
object SubstringDedup {

  /** (id, i, gram) — every character position's L-gram. The length guard
    * matters: Spark's `sequence(1, n)` DESCENDS when n < 1. */
  private def gramsOf(docs: DataFrame, idCol: String, textCol: String,
      L: Int): DataFrame =
    docs.filter(length(col(textCol)) >= L)
      .select(col(idCol).as("id"), col(textCol).as("t"))
      .withColumn("i", explode(sequence(lit(1), length(col("t")) - lit(L - 1))))
      .select(col("id"), col("i"), col("t").substr(col("i"), lit(L)).as("gram"))

  /** Matching positions → disjoint spans → per-doc stats (steps 3–4). */
  private def spanStats(matchPos: DataFrame, lens: DataFrame, L: Int,
      idCol: String): DataFrame = {
    val wIsl = Window.partitionBy(col("id")).orderBy(col("i"))
    val runs = matchPos
      .withColumn("grp", col("i") - row_number().over(wIsl))
      .groupBy(col("id"), col("grp"))
      .agg(min(col("i")).as("s"), (max(col("i")) + lit(L - 1)).as("e"))

    // interval union over chars: merge on overlap OR adjacency (s = pme+1),
    // so each merged group is a maximal contiguous matched-char run
    val wPrev = Window.partitionBy(col("id")).orderBy(col("s"), col("e"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wOrd = Window.partitionBy(col("id")).orderBy(col("s"), col("e"))
    val merged = runs
      .withColumn("pme", max(col("e")).over(wPrev))
      .withColumn("f", when(col("pme").isNull || col("s") > col("pme") + 1, 1).otherwise(0))
      .withColumn("mgrp", sum(col("f")).over(wOrd))
      .groupBy(col("id"), col("mgrp"))
      .agg(min(col("s")).as("ms"), max(col("e")).as("me"))

    merged.groupBy(col("id"))
      .agg(sum(col("me") - col("ms") + 1).cast("long").as("dup_chars"),
        max(col("me") - col("ms") + 1).cast("long").as("max_span"))
      .join(lens, "id")
      .select(col("id").as(idCol), col("dup_chars"), col("max_span"),
        round(col("dup_chars").cast("double") / col("len"), 6).as("dup_frac"))
  }

  /** Per-document duplicated-span profile: `(id, dup_chars, max_span,
    * dup_frac)` for every document containing at least one substring of
    * length ≥ `gramLen` that occurs at ≥2 positions corpus-wide
    * (within-doc repeats count — they are exactly the boilerplate case). */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      gramLen: Int): DataFrame = {
    val L = gramLen
    // reused by the count pass and the semi join
    val grams = gramsOf(docs, idCol, textCol, L).localCheckpoint()
    val dupGrams = grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2).select(col("gram"))
    val dupPos = grams.join(dupGrams, Seq("gram"), "left_semi")
      .select(col("id"), col("i"))
    val lens = docs.select(col(idCol).as("id"), length(col(textCol)).as("len"))
    spanStats(dupPos, lens, L, idCol)
  }

  /** Winnowed fingerprints (Schleimer et al. 2003, robust winnowing) —
    * the 100 TB path for substring dedup. From every window of `w`
    * consecutive gram positions, select the (hash, position)-minimal
    * gram as a fingerprint. GUARANTEE: any matched span of length
    * ≥ w + gramLen − 1 shares at least one selected fingerprint between
    * its occurrences; expected density 2/(w+1), so only ~2n/(w+1)
    * fingerprints per n chars ever participate in set algebra.
    *
    * Selection is computed ROW-LOCALLY with nested higher-order array
    * functions (per-doc hash array → per-window argmin) — no window
    * operator, no exchange, nothing shuffles until the (much smaller)
    * fingerprint relation itself. [[duplicatedSpans]] shuffles every
    * char position; this shuffles a ~(w+1)/2-times-smaller relation at
    * the price of exactness (span boundaries need a verify pass).
    * Output: distinct `(id, i, h)` fingerprints. */
  def winnowedFingerprints(docs: DataFrame, idCol: String, textCol: String,
      gramLen: Int, w: Int): DataFrame = {
    val L = gramLen
    val t = col("t")
    val hs = transform(
      sequence(lit(1), length(t) - lit(L - 1)),
      i => xxhash64(t.substr(i, lit(L))))
    // argmin per full window [j, j+w-1] as a single w-step fold (no array
    // copies): min hash, earliest position on ties (strict <)
    val sel = array_distinct(transform(
      sequence(lit(1), size(col("hs")) - lit(w - 1)),
      j => aggregate(
        sequence(j + lit(1), j + lit(w - 1)),
        struct(element_at(col("hs"), j.cast("int")).as("h"),
          j.cast("long").as("i")),
        (acc, p) => when(element_at(col("hs"), p.cast("int")) < acc("h"),
            struct(element_at(col("hs"), p.cast("int")).as("h"),
              p.cast("long").as("i")))
          .otherwise(acc))))
    docs.filter(length(col(textCol)) >= L + w - 1) // need ≥1 full window
      .select(col(idCol).as("id"), col(textCol).as("t"))
      .withColumn("hs", hs)
      .select(col("id"), explode(sel).as("fp"))
      .select(col("id"), col("fp.i").as("i"), col("fp.h").as("h"))
  }

  /** Span-level DECONTAMINATION: for each `train` document, the disjoint
    * spans of length ≥ `gramLen` that appear verbatim anywhere in the
    * `bench` corpus (the eval-set-leak removal step — doc-level n-gram
    * overlap scores flag documents; this returns the exact characters to
    * cut). Same span machinery as [[duplicatedSpans]], but the match set
    * is the benchmark's distinct grams — typically millions of times
    * smaller than the train corpus, so it broadcasts and the train gram
    * relation never shuffles at all. */
  def contaminatedSpans(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, gramLen: Int): DataFrame = {
    val L = gramLen
    val trainGrams = gramsOf(train, idCol, textCol, L)
    val benchGrams = gramsOf(bench, idCol, textCol, L)
      .select(col("gram")).distinct()
    val hitPos = trainGrams.join(benchGrams, Seq("gram"), "left_semi")
      .select(col("id"), col("i"))
    val lens = train.select(col(idCol).as("id"), length(col(textCol)).as("len"))
    spanStats(hitPos, lens, L, idCol)
  }

  /** CONTENT-DEFINED chunking (rolling-hash/Rabin-style, the storage-dedup
    * and CommonCrawl-pipeline chunker): cut after position i whenever the
    * polynomial hash of the w-char window ending at i is ≡ 0 mod
    * `divisor` (expected chunk length ≈ divisor chars). Unlike the
    * ALIGNED windows of [[SegmentDedup]], boundaries derive from CONTENT:
    * a one-character insertion shifts every fixed segment after it but
    * CDC boundaries resynchronize within ~one window — shared text keeps
    * producing identical chunks, which is the whole point.
    *
    * Everything up to the chunk relation is row-local (nested HOFs:
    * O(n·w) hash work per doc, zero shuffles — the winnowing cost shape);
    * hash arithmetic is portable integer math (B=257, M=1e9+7, the same
    * fold any SQL engine replays exactly). Docs shorter than `w` are one
    * whole-doc chunk. Returns the exploded chunk relation
    * `(id, chunk_idx, chunk)` — chunk_idx 1-based in doc order. */
  def contentDefinedChunks(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 8, divisor: Int = 64): DataFrame = {
    // r14 opt (guide §1.2 "per-task work"): the boundary scan is a
    // PRIMITIVE per-partition kernel. The former Column-expression form
    // (split → per-position unrolled w-step fold over element_at/ascii)
    // allocated a 1-char string per character access and re-hashed every
    // window from scratch through codegen'd expression dispatch — measured
    // 183 CPU-s for q257 at sf0.1, >95% of the operator. The kernel runs
    // the identical integer fold (B=257, M=1e9+7, window end offsets
    // i ∈ [w, n]) over a code-point array — same cuts, same chunks, byte
    // for byte (Spark's split/substr/length/ascii are all code-point
    // based, as is the DuckDB oracle replay). Still row-local: no
    // exchange, no window operator, chunk rows stream out per doc.
    val spark = docs.sparkSession
    val in = docs.select(col(idCol).as("id"), col(textCol).cast("string").as("__t"))
    val schema = StructType(Seq(
      in.schema("id"),
      StructField("chunk_idx", IntegerType, nullable = false),
      StructField("chunk", StringType, nullable = true)))
    val M = 1000000007L
    val div = divisor.toLong
    val rdd = in.rdd.mapPartitions { it =>
      it.flatMap { row =>
        val t = if (row.isNullAt(1)) null else row.getString(1)
        if (t == null || t.isEmpty) Iterator.empty
        else {
          val cps = t.codePoints().toArray
          val n = cps.length
          val cuts = new scala.collection.mutable.ArrayBuffer[Int]
          if (n >= w) {
            var i = w // 1-based window END offset, window = cps[i-w .. i-1]
            while (i <= n) {
              var h = 0L
              var k = i - w
              while (k < i) { h = (h * 257L + cps(k)) % M; k += 1 }
              if (h % div == 0L) cuts += i
              i += 1
            }
          }
          val id = row.get(0)
          val out = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]
          var prev = 0 // 0-based exclusive chunk start
          var idx = 0
          (cuts :+ n).foreach { e =>
            if (e > prev) { // the empty trailing remainder drops out
              idx += 1
              out += org.apache.spark.sql.Row(id, idx, new String(cps, prev, e - prev))
            }
            prev = e
          }
          out.iterator
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Per-doc CDC dedup report: a chunk occurring in more than
    * `maxDocFreq` distinct docs is duplicated; every occurrence counts.
    * `(id, n_chunks, n_dup_chunks, dup_chars)` — one chunk-keyed count +
    * one join, the [[SegmentDedup]] scale shape. */
  def cdcDedupReport(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 8, divisor: Int = 64, maxDocFreq: Long = 1L): DataFrame = {
    val chunks = contentDefinedChunks(docs, idCol, textCol, w, divisor)
    val dup = chunks.groupBy(col("chunk"))
      .agg(countDistinct(col("id")).as("dfreq"))
      .filter(col("dfreq") > maxDocFreq)
      .select(col("chunk"), lit(true).as("is_dup"))
    val perDoc = chunks.join(dup, Seq("chunk"), "left_outer")
      .groupBy(col("id"))
      .agg(count(lit(1)).cast("long").as("n_chunks"),
        sum(coalesce(col("is_dup"), lit(false)).cast("long")).as("n_dup_chunks"),
        sum(when(coalesce(col("is_dup"), lit(false)), length(col("chunk")))
          .otherwise(lit(0)).cast("long")).as("dup_chars"))
    // Back-fill docs with no chunk rows (empty text): same contract as
    // SegmentDedup.segmentDedup — silently dropping inputs from the
    // report is a data-loss bug, an empty doc reports all-zero counts.
    docs.select(col(idCol).as("id")).distinct()
      .join(perDoc, Seq("id"), "left_outer")
      .select(col("id"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_dup_chunks"), lit(0L)).as("n_dup_chunks"),
        coalesce(col("dup_chars"), lit(0L)).as("dup_chars"))
  }
}
