package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for 100 TB-scale corpora (BASELINE.json
  * north-star). Design rules throughout:
  *  - shuffle keys are *hashes* (fingerprint / band bucket), never raw text,
  *    so shuffle payloads stay small and skew is bounded by hash uniformity;
  *  - candidate generation (LSH) is separated from exact verification, so
  *    the O(n²) step only ever runs inside tiny candidate groups;
  *  - everything is built from codegen'd higher-order array functions —
  *    no UDFs, no driver-side loops.
  */
object Dedup {

  // ── Exact dedup ────────────────────────────────────────────────────────

  /** Exact dedup by normalized-content fingerprint: one hash-shuffle on the
    * md5 key; emits one row per distinct content with the canonical
    * (minimum) id and the group size. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("dup_count"))

  // ── Shingling ──────────────────────────────────────────────────────────

  /** Distinct (id, shingle) rows — the exploded shingle relation every
    * set-similarity operator joins on. Built from `posexplode` + window
    * `lead` so tokenization and shingle assembly stay in whole-stage
    * codegen (the array-lambda variant [[shingles]] is interpreted and
    * measured ~4 s for just 5k docs). One window shuffle on id. */
  def shingleRows(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    shingleOccurrences(df, idCol, textCol, n).distinct()

  /** Distinct (id, shingle-HASH) rows — the shuffle-lean form the pair
    * operators join on. Tokens are hashed to 64-bit longs BEFORE the
    * shingle window, so the per-doc sort and every downstream
    * shuffle/join carries fixed 8-byte keys instead of n-word strings;
    * shingle identity is the hash of the n token hashes (two distinct
    * shingles colliding inside one doc pair ≈ 2^-64 — below any
    * observable effect; the oracle comparisons stay exact in practice).
    * Same one-window shape as [[shingleRows]]. */
  def shingleHashRows(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    // row-local generator — no shuffle (the posexplode + lead-window form
    // this replaces hash-partitioned and sorted the whole corpus by id
    // before any set algebra even started)
    val gen = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.ShingleHashes(
        org.apache.spark.sql.GraftColumnBridge.expression(col(textCol)), n))
    df.select(col(idCol).as("id"), gen)
      .select(col("id"), col("h"))
      .distinct()
  }

  /** Every (id, shingle) occurrence — NOT deduplicated (multiplicity
    * preserved, for frequency-based signals like [[TextAnalysis
    * repetition reports]]). Set-similarity operators use the distinct
    * form [[shingleRows]]. */
  def shingleOccurrences(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    // row-local generator — no shuffle (see [[graft.functions.ShingleStrings]])
    val gen = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.ShingleStrings(
        org.apache.spark.sql.GraftColumnBridge.expression(col(textCol)), n))
    df.select(col(idCol).as("id"), gen)
      .select(col("id"), col("shingle"))
  }

  /** Distinct word n-gram shingles per document, as an array column.
    * Convenience/API form; prefer [[shingleRows]] in pipelines (this one
    * evaluates interpreted). Documents shorter than `n` tokens yield an
    * empty shingle set (guarded — Spark's `sequence(0, -1)` would count
    * *down*). */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.tokens(text)
    when(size(toks) >= n,
      array_distinct(
        transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  // ── MinHash + LSH ──────────────────────────────────────────────────────

  /** MinHash signature: `numHashes` independent permutations approximated
    * by seeded xxhash64; each signature slot is the min hash over the
    * shingle set. */
  def minhashSignature(shinglesCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map { seed =>
      array_min(transform(shinglesCol, s => xxhash64(s, lit(seed))))
    }: _*)

  /** LSH banding: split the signature into `bands` bands and hash each —
    * docs sharing any (band index, band hash) are candidates. Emitted
    * exploded so the bucket join shuffles on the band hash. */
  def lshBands(signatureCol: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => struct(
        b.as("band"),
        xxhash64(concat_ws(",",
          transform(slice(signatureCol, b * rowsPerBand + 1, lit(rowsPerBand)), _.cast("string"))), b)
          .as("bucket")))

  /** Signature + banding over an exploded shingle-hash relation (from
    * [[shingleHashRows]]): ONE [[graft.functions.MinHashSignature]]
    * aggregate computes all `numHashes` slots in a compiled loop (the
    * previous 96-separate-min-aggregates shape codegen'd past the JIT
    * method-size budget and ran interpreted — see the aggregate's doc),
    * one hash-shuffle on id; then each band hashes its signature slots
    * directly (multi-arg xxhash64 over longs, bit-exact with the old
    * form). Returns (id, band, bucket) rows — docs sharing a
    * (band, bucket) are LSH candidates. */
  /** `(id, sig)` — the `numHashes`-slot minhash signature per doc from a
    * shingle-hash relation. The signature IS the mergeable sketch: the
    * fraction of equal slots between two signatures is an unbiased
    * estimator of Jaccard similarity with std ≈ √(J(1−J)/numHashes). */
  def minhashSignatures(shEx: DataFrame, numHashes: Int = 96): DataFrame = {
    val sigAgg = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.MinHashSignature(
        org.apache.spark.sql.GraftColumnBridge.expression(col("h")),
        numHashes).toAggregateExpression())
    shEx.groupBy("id").agg(sigAgg.as("sig"))
  }

  def bandRows(shEx: DataFrame, numHashes: Int = 96, bands: Int = 24): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sig = minhashSignatures(shEx, numHashes)
    val bandStructs = (0 until bands).map { b =>
      val slots = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => col("sig").getItem(i))
      struct(lit(b).as("band"), xxhash64(slots :+ lit(b): _*).as("bucket"))
    }
    sig.select(col("id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** MinHash+LSH near-duplicate pairs with *exact* verification:
    *
    *  1. shingle + minhash each doc (narrow, codegen)
    *  2. explode bands → shuffle on (band, bucket) → self-join inside
    *     buckets only (the classic LSH candidate join; at 100 TB this is
    *     the only step that shuffles, and its keys are 8-byte hashes)
    *  3. exact Jaccard on candidate pairs from the carried shingle sets;
    *     keep pairs ≥ `threshold`
    *
    * Band geometry trades recall against candidate volume: r=2 bands flood
    * the verify step with weakly-similar candidates (measured ~1M pairs /
    * 14 s on the sf0.1 word-soup corpus), while the default r=4, b=24
    * keeps recall at s=0.8 at 1−(1−s⁴)²⁴ ≈ 1−3e-6 with ~2k candidates.
    * The verify step makes precision exact, so the output equals the
    * all-pairs answer on any corpus whose near-dup pairs sit above the
    * threshold margin.
    */
  def minhashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.5,
      shingleN: Int = 3,
      numHashes: Int = 96,
      bands: Int = 24): DataFrame = {
    // The shingle-hash relation feeds three consumers (signature + both
    // verify legs); materialize it once as an RDD checkpoint
    // (localCheckpoint: executor-local blocks, lineage cut) — measured
    // faster than both 3x recompute and persist()'s columnar-cache
    // serialization.
    val shEx = shingleHashRows(df, idCol, textCol, shingleN).localCheckpoint()
    nearDupPairsFromBands(shEx, bandRows(shEx, numHashes, bands), threshold)
  }

  /** [[minhashNearDupPairs]] over PRE-computed (id, h) shingle hashes and
    * (id, band, bucket) band rows — for callers that already paid for them
    * and reuse them elsewhere (the streaming corpus-dedup loop computes
    * each batch's shingles/bands ONCE and shares them across within-batch
    * dedup, index probe, and index append; the 96-way min-hash aggregation
    * is the pipeline's dominant CPU cost, so recomputing it per consumer
    * triples the bill). */
  def nearDupPairsFromBands(
      shEx: DataFrame,
      banded: DataFrame,
      threshold: Double): DataFrame = {
    val candidates = banded.alias("a").join(banded.alias("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("d1"), col("b.id").as("d2"))
      .dropDuplicates("d1", "d2")

    // Exact verify, kernel form (same shape as [[prefixJaccardPairs]]):
    // per-doc sorted shingle arrays, one hash-join lookup per side, and a
    // codegen'd array_intersect per candidate pair. The previous form
    // re-joined candidates against the exploded posting relation — a
    // |cand| × |doc-size| row expansion that is invisible while banding
    // keeps candidates rare but becomes the dominant shuffle on dup-heavy
    // corpora (measured 90% of ppjoin's 10× soak run before the same
    // change there). Verification work is now O(|cand|) rows.
    val docSets = shEx.groupBy("id").agg(sort_array(collect_list(col("h"))).as("hs"))
    candidates
      .join(docSets.select(col("id").as("d1"), col("hs").as("h1")), "d1")
      .join(docSets.select(col("id").as("d2"), col("hs").as("h2")), "d2")
      .withColumn("i", size(array_intersect(col("h1"), col("h2"))).cast("long"))
      .withColumn("jaccard", col("i").cast("double") /
        (size(col("h1")) + size(col("h2")) - col("i")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  /** Exact Jaccard over candidate (sh1, sh2) shingle-set pairs. */
  private def verifyJaccard(pairs: DataFrame, threshold: Double): DataFrame =
    pairs
      .withColumn("jaccard",
        size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))

  /** All-pairs n-gram Jaccard via shingle inverted index — the exact
    * baseline the LSH path approximates. Shuffles on the shingle string;
    * at scale prefer [[minhashNearDupPairs]], but this stays distributed:
    * the pair-aggregation reduces on (d1,d2) and never materializes a
    * cross join. */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.5,
      shingleN: Int = 3): DataFrame = {
    // three consumers (counts + both join legs) — materialize once; the
    // inverted index joins on the 8-byte shingle hash, never the string
    val sh = shingleHashRows(df, idCol, textCol, shingleN).localCheckpoint()
    val counts = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = sh.alias("a").join(sh.alias("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("d1"), col("b.id").as("d2"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(counts.withColumnRenamed("id", "d1").withColumnRenamed("n", "n1"), "d1")
      .join(counts.withColumnRenamed("id", "d2").withColumnRenamed("n", "n2"), "d2")
      .withColumn("jaccard", col("i").cast("double") / (col("n1") + col("n2") - col("i")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  /** All-pairs set-similarity join with PREFIX FILTERING (the PPJoin
    * family's core pruning — Xiao et al., "Efficient Similarity Joins for
    * Near Duplicate Detection", WWW'08): order each document's shingle
    * hashes by a global canonical order and keep only the first
    * `|s| − ⌈t·|s|⌉ + 1` as its index prefix. Any pair with Jaccard ≥ t
    * must share an element in BOTH prefixes (≥ t·|s| common elements
    * cannot all hide in a suffix of length ⌈t·|s|⌉ − 1), so the
    * inverted-index join runs over prefixes only — then candidates are
    * verified by an exact intersection count restricted to candidate
    * pairs. Higher thresholds prune harder; the full-index form is the
    * t → 0 degenerate case.
    *
    * The canonical order is ASCENDING GLOBAL DOCUMENT FREQUENCY (ties by
    * hash) — the ordering the PPJoin paper's pruning power depends on.
    * Any consistent total order is CORRECT, but ordering by raw hash puts
    * frequent shingles in prefixes, and the candidate pairs a shingle
    * generates grow quadratically in its posting length — a 10× corpus
    * soak measured 57× wall on hash order vs frequency order, because the
    * longest postings (stop-phrase shingles) landed in prefixes. Rarest-
    * first makes every prefix posting short by construction, so candidate
    * growth tracks corpus growth ~linearly. Costs one extra shuffle (the
    * frequency join) — cheap next to the candidate join it shrinks.
    * Same output contract as [[ngramJaccardPairs]]: (d1, d2, jaccard). */
  def prefixJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.5,
      shingleN: Int = 3): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold must be in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val sh = shingleHashRows(df, idCol, textCol, shingleN).localCheckpoint()
    val counts = sh.groupBy("id").agg(count(lit(1)).as("n"))
    // global document frequency of each shingle — distributed agg on h,
    // never materialized on the driver
    val freq = sh.groupBy("h").agg(count(lit(1)).as("df"))
    // per-doc rank by (global frequency asc, h) — an id-partitioned window
    // (each doc sorts its own shingles; no corpus-wide SORT is ever run,
    // the global ORDER exists only as the (df, h) sort key)
    val prefix = sh
      .join(freq, "h")
      .withColumn("r", row_number().over(
        Window.partitionBy("id").orderBy(col("df"), col("h"))))
      .join(counts, "id")
      .filter(col("r") <= col("n") - ceil(lit(threshold) * col("n")) + 1)
      .select("id", "h", "r", "n")
    // Candidate join over prefix postings with the paper's two
    // exactness-preserving per-match prunes applied IN the join condition
    // (before the distinct — they shrink the shuffle, not just the output):
    //  - length filter: Jaccard ≥ t forces t·max(n1,n2) ≤ min(n1,n2);
    //  - positional filter: a match at prefix ranks (r1, r2) bounds the
    //    overlap by 1 + min(n1−r1, n2−r2), which must reach the
    //    equivalent-overlap threshold ⌈t/(1+t)·(n1+n2)⌉.
    val t = lit(threshold)
    val cand = prefix.alias("a").join(prefix.alias("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id") &&
          col("a.n") >= t * col("b.n") && col("b.n") >= t * col("a.n") &&
          // ceil over an FP product can round UP by 1 ulp at exact-threshold
          // boundaries (t/(1+t)·(n1+n2) landing a hair above an integer) and
          // wrongly drop a pair with Jaccard == threshold; the 1e-9 slack
          // keeps the bound exactness-preserving (it can only ADMIT an extra
          // candidate, which exact verification then rejects).
          (lit(1) + least(col("a.n") - col("a.r"), col("b.n") - col("b.r"))) >=
            ceil(t / (t + 1) * (col("a.n") + col("b.n")) - lit(1e-9)))
      .select(col("a.id").as("d1"), col("b.id").as("d2"))
      .distinct()
    // Exact verification with per-doc sorted shingle arrays and a
    // codegen'd array_intersect per candidate (the Vernica/Carey/Li
    // kernel-verification shape). The previous form re-joined candidates
    // against the full posting relation — a |cand| × |doc| row explosion
    // whose shuffle dominated at 10× scale (ScaleSoak: verification was
    // ~90% of a 187 s run). Arrays keep verification at |cand| ROWS (one
    // hash-join lookup per side), with the intersection fused into
    // whole-stage codegen.
    val docSets = sh.groupBy("id").agg(sort_array(collect_list(col("h"))).as("hs"))
    cand
      .join(docSets.select(col("id").as("d1"), col("hs").as("h1")), "d1")
      .join(docSets.select(col("id").as("d2"), col("hs").as("h2")), "d2")
      .withColumn("i", size(array_intersect(col("h1"), col("h2"))).cast("long"))
      .withColumn("jaccard", col("i").cast("double") /
        (size(col("h1")) + size(col("h2")) - col("i")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  // ── Dedup clustering (connected components) ────────────────────────────

  /** Connected components over an undirected pair relation — near-dup
    * PAIRS become dedup CLUSTERS (keep one doc per component). Iterative
    * min-label propagation: each round every node takes the minimum label
    * among itself and its neighbors, until a fixpoint — all joins/groupBys
    * on 8-byte ids, no driver-side graph, each round one shuffle on the
    * edge key. Rounds needed = cluster diameter, which for near-dup
    * clusters is tiny (they are near-cliques); `maxIters` bounds
    * pathological chains. Cost bound: rounds × O(|E|) shuffled rows —
    * LINEAR in |E| at fixed diameter, pinned empirically through 100×
    * planted edges in ScaleSoak (constant-diameter stars isolate the
    * |E| term from round growth). Labels are `localCheckpoint`ed per round so the
    * plan does not grow with iterations (lineage cut — the standard
    * iterative-algorithm pattern, same as GraphX/Pregel).
    *
    * Returns (id, comp): every node that appears in `pairs`, labeled by
    * its component's minimum id (the canonical representative). */
  def connectedComponents(
      pairs: DataFrame, aCol: String, bCol: String, maxIters: Int = 50): DataFrame = {
    val e0 = pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
    val edges = e0
      .unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id")).localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val nbrMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(edges("src").as("nid")).agg(min(col("comp")).as("nbr_comp"))
      val stepped = labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(col("id"), col("comp").as("__old"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"))
      // pointer jumping: compose with the PREVIOUS round's (already
      // checkpointed — no recompute) label map. L_{t+1}(v) =
      // min(M(v), L_t(M(v))) reaches everything M(v) reached in t rounds,
      // so label paths double per round — O(log diameter) convergence
      // instead of O(diameter). Labels are always node ids, so the
      // lookup join resolves.
      val lookup = labels.select(col("id").as("jid"), col("comp").as("jcomp"))
      // carry the previous label through the round so convergence is read
      // off the (already materialized) checkpoint — no extra join/job
      val next = stepped.join(lookup, stepped("comp") === lookup("jid"), "left")
        .select(col("id"), col("__old"),
          least(col("comp"), coalesce(col("jcomp"), col("comp"))).as("comp"))
        .localCheckpoint()
      converged = next.filter(col("comp") =!= col("__old")).limit(1).count() == 0L
      labels = next.select(col("id"), col("comp"))
      i += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponents: no fixpoint after $maxIters rounds " +
        "(graph diameter exceeds 2^maxIters — raise maxIters)")
    labels
  }

  /** Near-dup dedup clusters end to end: exact-verified Jaccard pairs →
    * connected components → (doc, cluster canonical). */
  def nearDupClusters(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5): DataFrame =
    connectedComponents(
      minhashNearDupPairs(df, idCol, textCol, threshold), "d1", "d2")

  // ── Benchmark contamination ────────────────────────────────────────────

  /** Training-set contamination check: which corpus docs share at least one
    * word n-gram with any benchmark doc, and how many distinct shingles
    * overlap. The benchmark's (much smaller) shingle set is the join's
    * build side; the corpus side reduces per doc — an inverted-index
    * semi-join shape that shuffles hashes, never text, and never
    * materializes a doc×doc product. At 100 TB the benchmark shingle set
    * broadcasts and the corpus never shuffles at all. */
  def contaminationReport(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val benchShingles = shingleHashRows(benchmark, idCol, textCol, n)
      .select(col("h")).distinct()
    shingleHashRows(corpus, idCol, textCol, n)
      .join(broadcast(benchShingles), Seq("h"), "left_semi")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_overlap"))
  }

  // ── SimHash ────────────────────────────────────────────────────────────

  /** 64-bit SimHash over the token multiset: per bit, sum ±1 votes from
    * each token's xxhash64, take the sign. Near-identical docs collide on
    * the full 64-bit value; Hamming-near docs can be banded like LSH.
    * Pure nested higher-order functions — still no UDF. */
  def simhash64(text: Column): Column = {
    val masks = array((0 until 64).map(i => lit(1L << i)): _*)
    val toks = TextAnalysis.tokens(TextAnalysis.normalize(text))
    val votes = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, masks,
          (a, m) => a + when(h.bitwiseAND(m) =!= 0, 1L).otherwise(-1L))
      })
    aggregate(
      zip_with(votes, masks, (v, m) => when(v >= 0, m).otherwise(0L)),
      lit(0L),
      (acc, bit) => acc.bitwiseOR(bit))
  }

  /** Per-token 64-bit hash, projected as (lo32, hi32) halves so the 64
    * bit-vote aggregates test bits with cheap shifts on two pre-computed
    * longs (one hash evaluation per token row, not 64). Bit i of the hash
    * is bit `i % 32` of `lo` when `i < 32`, of `hi` otherwise. Default for
    * production: xxhash64 (codegen'd, fastest). */
  val xxTokenHash: Column => (Column, Column) = { t =>
    val h = xxhash64(t)
    (h.bitwiseAND(lit(0xffffffffL)), shiftrightunsigned(h, 32))
  }

  /** Portable token hash: the first 16 hex chars of md5 as two 32-bit
    * halves. Slower than [[xxTokenHash]] but replayable digit-by-digit in
    * any engine with `md5()` — the DuckDB-oracled gate queries use it so
    * the full sign-vote algebra is verified in closed form. */
  val md5TokenHash: Column => (Column, Column) = { t =>
    val m = md5(t)
    (conv(substring(m, 1, 8), 16, 10).cast("long"),
      conv(substring(m, 9, 8), 16, 10).cast("long"))
  }

  /** SimHash per doc via explode + 64 codegen'd sum-aggregates (the
    * nested-HOF [[simhash64]] is interpreted; this path computes identical
    * values with one hash-shuffle on id). */
  def simhashTable(df: DataFrame, idCol: String, textCol: String,
      tokenHash: Column => (Column, Column) = xxTokenHash): DataFrame = {
    val (lo, hi) = tokenHash(col("tok"))
    val toks = df.select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(TextAnalysis.normalize(col(textCol)))).as("tok"))
      .select(col("id"), lo.as("hLo"), hi.as("hHi"))
    val voteAggs = (0 until 64).map { i =>
      val chunk = if (i < 32) col("hLo") else col("hHi")
      sum(when(shiftright(chunk, i % 32).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
        .as(s"v$i")
    }
    df.select(col(idCol).as("id"))
      .join(
        toks.groupBy("id").agg(voteAggs.head, voteAggs.tail: _*)
          .select(col("id"),
            (0 until 64).map(i => when(col(s"v$i") >= 0, lit(1L << i)).otherwise(0L))
              .reduce((a, b) => a.bitwiseOR(b)).as("simhash")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("simhash"), lit(0L)).as("simhash"))
  }

  /** SimHash near-dup buckets: docs sharing an identical 64-bit simhash. */
  def simhashGroups(df: DataFrame, idCol: String, textCol: String,
      tokenHash: Column => (Column, Column) = xxTokenHash): DataFrame =
    simhashTable(df, idCol, textCol, tokenHash)
      .groupBy("simhash")
      .agg(min(col("id")).as("canonical_id"), count(lit(1)).as("dup_count"))

  /** SimHash near-dup PAIRS within a Hamming radius — the banded form:
    * split the 64-bit hash into `bands` fixed bit-slices; by pigeonhole,
    * two hashes within Hamming distance `bands - 1` share at least one
    * slice, so candidates are generated by equality joins on (band, slice)
    * — 8-byte shuffle keys, no cross join — then verified exactly with
    * `bit_count(xor) <= maxHamming`. Guaranteed-complete recall whenever
    * `maxHamming < bands` (the classic HammingLSH construction). */
  def simhashNearDupPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, bands: Int = 4,
      tokenHash: Column => (Column, Column) = xxTokenHash): DataFrame = {
    require(maxHamming < bands,
      s"maxHamming=$maxHamming needs bands>$maxHamming for complete recall")
    val bits = 64 / bands
    val sh = simhashTable(df, idCol, textCol, tokenHash).localCheckpoint()
    val banded = sh.select(col("id"), col("simhash"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            col("simhash").cast("long")
              .bitwiseAND(lit(((1L << bits) - 1) << (b * bits))).as("slice"))
        }: _*)).as("bb"))
      .select(col("id"), col("simhash"), col("bb.band"), col("bb.slice"))
    banded.alias("a").join(banded.alias("b"),
        col("a.band") === col("b.band") && col("a.slice") === col("b.slice") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("d1"), col("b.id").as("d2"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .dropDuplicates("d1", "d2")
      .filter(col("hamming") <= maxHamming)
  }
}
