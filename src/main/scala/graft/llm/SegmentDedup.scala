package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Segment-level corpus dedup — the CCNet/RefinedWeb "drop duplicated
  * lines/paragraphs across the corpus" pass, the unit BETWEEN whole-document
  * dedup (MinHash/SimHash families) and raw character spans
  * ([[SubstringDedup]]): boilerplate headers, navigation chrome, license
  * blurbs and quote chains repeat across *different* pages and should be cut
  * from every copy but one, while the surrounding document survives.
  *
  * The corpus here has no newline structure, so the "line" unit is a fixed
  * window of `segWords` consecutive tokens aligned to word boundaries
  * (non-overlapping; the final partial window is its own segment). A segment
  * is DUPLICATED when it occurs in more than `maxDocFreq` distinct
  * documents; every occurrence is dropped except — with `keepFirst` — the
  * globally first one (minimal `(id, seg_idx)`), which preserves exactly one
  * copy of the shared text in the corpus (CCNet's dedup keeps one).
  *
  * Scale shape (the 100 TB contract):
  *  - segment construction is ROW-LOCAL (array HOFs over the token array —
  *    no explode-then-window, no shuffle to build segments);
  *  - the only exchanges are (a) one hash aggregation keyed by the segment
  *    text — ~n/segWords rows per doc, partial-agg combines repeats
  *    map-side, and the aggregate carries only (docfreq, keeper) per
  *    segment; (b) the join of that (filtered to duplicated segments only —
  *    a small relation by construction) back to the exploded segments,
  *    which AQE turns into a broadcast when the dup set is small; (c) the
  *    per-doc reassembly agg, keyed by the doc id.
  *  - At corpus scale the group key would be `xxhash64(seg)` with the
  *    string carried only doc-side (64-bit keys shuffle ~5× less than
  *    40-char segments); grouping by the text itself here keeps the result
  *    engine-portable (no Spark-private hash in the contract) — the swap is
  *    a one-line change that does not alter the plan shape.
  */
object SegmentDedup {

  /** Per-document dedup report + reconstructed text:
    * `(id, n_segs, n_dropped, kept_text)`. `n_dropped` counts dropped
    * segment occurrences; `kept_text` is the surviving segments re-joined
    * in original order (single spaces — the tokenizer's normal form). */
  def segmentDedup(docs: DataFrame, idCol: String, textCol: String,
      segWords: Int = 4, maxDocFreq: Long = 1L,
      keepFirst: Boolean = true): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    // Row-local: token array → array of segment strings, then explode with
    // the 1-based segment index.
    val nSegs = ceil(size(toks).cast("double") / segWords).cast("int")
    // sequence(1, 0) would step BACKWARDS ([1,0]) — guard the empty doc.
    val segArr = when(nSegs <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), nSegs),
        i => array_join(slice(toks, (i - 1) * segWords + 1, lit(segWords)), " ")))
    val segs = docs.select(col(idCol).as("id"),
        posexplode(segArr).as(Seq("seg0", "seg")))
      .select(col("id"), (col("seg0") + 1).as("seg_idx"), col("seg"))

    // One pass over the segment relation: distinct-doc frequency + the
    // globally-first occurrence (lexicographic min over (id, seg_idx)).
    val dup = segs.groupBy(col("seg"))
      .agg(countDistinct(col("id")).as("dfreq"),
        min(struct(col("id"), col("seg_idx"))).as("keeper"))
      .filter(col("dfreq") > maxDocFreq)
      .select(col("seg"), col("keeper.id").as("keep_id"),
        col("keeper.seg_idx").as("keep_seg_idx"))

    val flagged = segs.join(dup, Seq("seg"), "left_outer")
      .withColumn("drop",
        col("keep_id").isNotNull && (
          if (keepFirst)
            !(col("id") === col("keep_id") && col("seg_idx") === col("keep_seg_idx"))
          else lit(true)))

    val report = flagged.groupBy(col("id"))
      .agg(count(lit(1)).cast("long").as("n_segs"),
        sum(col("drop").cast("long")).as("n_dropped"),
        array_join(transform(array_sort(collect_list(
            when(!col("drop"), struct(col("seg_idx"), col("seg"))))),
          x => x("seg")), " ").as("kept_text"))
    // A doc with zero segments (empty text) has no rows in the segment
    // relation — it must still appear in the report (a dedup pass that
    // silently drops inputs is a data-loss bug, not a dedup).
    docs.select(col(idCol).as("id")).join(report, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("n_segs"), lit(0L)).as("n_segs"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
  }
}
