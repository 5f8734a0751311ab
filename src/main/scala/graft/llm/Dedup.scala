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

  /** Distinct word n-gram shingles per document, as an array column.
    * `transform(sequence(...))` keeps shingling inside codegen. Documents
    * shorter than `n` tokens yield an empty shingle set (guarded — Spark's
    * `sequence(0, -1)` would count *down*). */
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

  /** MinHash+LSH near-duplicate pairs with *exact* verification:
    *
    *  1. shingle + minhash each doc (narrow, codegen)
    *  2. explode bands → shuffle on (band, bucket) → self-join inside
    *     buckets only (the classic LSH candidate join; at 100 TB this is
    *     the only step that shuffles, and its keys are 8-byte hashes)
    *  3. exact Jaccard on candidate pairs from the carried shingle sets;
    *     keep pairs ≥ `threshold`
    *
    * With rowsPerBand=2, bands=32 the recall at s=0.8 is 1−(1−s²)³² ≈
    * 1−6e-15 — the verify step makes precision exact, so the output equals
    * the all-pairs answer on any corpus whose near-dup pairs sit above the
    * threshold margin.
    */
  def minhashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.5,
      shingleN: Int = 3,
      numHashes: Int = 64,
      bands: Int = 32): DataFrame = {
    val rowsPerBand = numHashes / bands
    val withSig = df
      .select(col(idCol).as("id"), shingles(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))

    val banded = withSig
      .select(col("id"), col("sh"),
        explode(lshBands(col("sig"), bands, rowsPerBand)).as("bb"))
      .select(col("id"), col("sh"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))

    val a = banded.alias("a")
    val b = banded.alias("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("d1"), col("b.id").as("d2"),
        col("a.sh").as("sh1"), col("b.sh").as("sh2"))
      .dropDuplicates("d1", "d2")

    verifyJaccard(candidates, threshold)
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
    val sh = df
      .select(col(idCol).as("id"), explode(shingles(col(textCol), shingleN)).as("shingle"))
    val counts = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = sh.alias("a").join(sh.alias("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("d1"), col("b.id").as("d2"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(counts.withColumnRenamed("id", "d1").withColumnRenamed("n", "n1"), "d1")
      .join(counts.withColumnRenamed("id", "d2").withColumnRenamed("n", "n2"), "d2")
      .withColumn("jaccard", col("i").cast("double") / (col("n1") + col("n2") - col("i")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
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

  /** SimHash near-dup buckets: docs sharing an identical 64-bit simhash. */
  def simhashGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), simhash64(col(textCol)).as("simhash"))
      .groupBy("simhash")
      .agg(min(col("id")).as("canonical_id"), count(lit(1)).as("dup_count"))
}
