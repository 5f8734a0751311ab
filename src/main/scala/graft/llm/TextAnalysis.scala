package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (BASELINE.json north-star: lang-ID, quality scoring, token counting,
  * fingerprinting). Everything is pure `Column` expressions — no UDFs —
  * so the whole surface stays inside whole-stage codegen and scales as
  * ordinary narrow transformations (zero shuffles).
  */
object TextAnalysis {

  /** Lowercase, strip non-alphanumerics to spaces — the canonical text
    * normalization shared by fingerprinting and shingling. */
  def normalize(text: Column): Column =
    regexp_replace(lower(text), "[^a-z0-9 ]", " ")

  /** Whitespace tokens, empty-safe. */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  /** Plain whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: letter runs, digit runs, and punctuation runs
    * each count as one token (the pre-tokenizer split GPT-style BPE vocabs
    * assume). */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"), lit(0)))

  /** Characters that are neither alphanumeric nor whitespace, as a ratio
    * of total characters. */
  def punctRatio(text: Column): Column =
    size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0))).cast("double") /
      length(text).cast("double")

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for", "on", "with", "as", "by")
  val SpanishStopwords: Seq[String] =
    Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "las", "por", "con", "para", "es", "del")
  val GermanStopwords: Seq[String] =
    Seq("der", "die", "das", "und", "in", "den", "von", "zu", "mit", "sich", "des", "auf", "ist", "ein", "eine")

  private def stopwordHits(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(stopwords.map(lit): _*), t)))

  /** Fraction of tokens that are (English) stopwords — a standard quality
    * signal (too low ⇒ word soup / non-language). */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(lower(text))
    stopwordHits(toks, EnglishStopwords).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** n-gram-heuristic language ID: count stopword hits per candidate
    * language, take the argmax (ties broken en > es > de — deterministic). */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val en = stopwordHits(toks, EnglishStopwords)
    val es = stopwordHits(toks, SpanishStopwords)
    val de = stopwordHits(toks, GermanStopwords)
    when(en >= es && en >= de, "en").when(es >= de, "es").otherwise("de")
  }

  /** Composite quality score in [0,1]: length, punctuation, stopword and
    * word-shape signals, equally weighted. Deterministic double math. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val meanLen = length(regexp_replace(text, "\\s+", "")).cast("double") / greatest(nTok, lit(1.0))
    val s1 = when(nTok >= 10, 0.25).otherwise(0.0)
    val s2 = when(punctRatio(text) < 0.1, 0.25).otherwise(0.0)
    val s3 = when(stopwordRatio(text) > 0.02, 0.25).otherwise(0.0)
    val s4 = when(meanLen >= 3.0 && meanLen <= 10.0, 0.25).otherwise(0.0)
    s1 + s2 + s3 + s4
  }

  /** Content fingerprint: md5 over whitespace-normalized text — the
    * exact-dedup key (hash-groupBy dedup shuffles on this). */
  /** Gopher-style repetition signal per document: how much of the text is
    * the same n-gram said again and again. Emits per doc the total n-gram
    * occurrence count, the share held by the single most frequent n-gram
    * (`top_ngram_frac`), and the distinct/total ratio (`distinct_frac` —
    * low means boilerplate). Two hash aggregations over the exploded
    * n-gram relation; the quality-filter companion to the dedup family.
    * (Repeated-n-gram thresholds are standard corpus-quality gates — cf.
    * the Gopher/MassiveText filtering rules.) */
  def repetitionReport(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      n: Int = 2): org.apache.spark.sql.DataFrame =
    Dedup.shingleOccurrences(df, idCol, textCol, n)
      .groupBy(col("id"), col("shingle")).agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(sum(col("c")).as("n_ngrams"),
        (max(col("c")).cast("double") / sum(col("c")).cast("double")).as("top_ngram_frac"),
        (count(lit(1)).cast("double") / sum(col("c")).cast("double")).as("distinct_frac"))

  /** Corpus-trained bigram language-model scoring with add-one smoothing:
    * per-document mean of ln((C(w1,w2)+1)/(C(w1)+V)) over its bigrams —
    * the classic perplexity-style quality signal curation pipelines rank
    * by (a doc whose word transitions are corpus-typical scores high; word
    * salad scores low). Docs with fewer than two tokens are dropped
    * (no bigrams to score).
    *
    * Scale shape: the count tables are two hash aggregations keyed by
    * (w1) and (w1,w2) — vocabulary-bounded, heavy-hitter-friendly with
    * partial aggregation; scoring joins on those keys; V is a 1-row
    * scalar broadcast. No collect, no UDFs, everything codegen'd. */
  def bigramLogLik(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      posexplode(tokens(lower(col(textCol)))).as(Seq("pos", "tok")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    val bg = toks.withColumn("prev", lag(col("tok"), 1).over(w))
      .filter(col("prev").isNotNull)
    val uni = toks.groupBy(col("tok").as("prev")).agg(count(lit(1)).as("cw"))
    val big = bg.groupBy(col("prev"), col("tok")).agg(count(lit(1)).as("cww"))
    val vocab = toks.agg(countDistinct(col("tok")).as("v"))
    bg.join(big, Seq("prev", "tok"))
      .join(uni, Seq("prev"))
      .crossJoin(broadcast(vocab))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        round(avg(log((col("cww") + 1).cast("double")
          / (col("cw") + col("v")).cast("double"))), 6).as("mean_loglik"))
  }

  /** PII redaction for training corpora: emails, then long digit runs
    * (phone/account/SSN-ish), each replaced by a typed placeholder. Order
    * matters — emails first so their digits aren't half-eaten by the
    * number pass. Pure codegen'd regexp_replace chain; patterns are
    * conservative (precision over recall) since dropped PII is worse than
    * an over-redacted token in a training document. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
      "[0-9][0-9 ()+.-]{5,}[0-9]", "[NUM]")

  /** Count of PII matches the same passes would redact (audit metric). */
  def piiMatchCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit(0))) +
      size(regexp_extract_all(
        regexp_replace(text, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
        lit("[0-9][0-9 ()+.-]{5,}[0-9]"), lit(0)))

  /** Quality-MODEL scoring: a logistic regression over the same cheap
    * text features the heuristic [[qualityScore]] thresholds — the shape
    * production pipelines use once weights come from a trained classifier
    * (fasttext-style quality model distilled to a linear head). Weights
    * are model parameters shipped as literals; the whole score is one
    * codegen'd expression per row, zero shuffles, no UDF. Rounded to 6
    * decimals so the last-ulp spread of libm `exp` across engines cannot
    * surface (same rule as BM25). */
  def modelScore(text: Column,
      bias: Double = -1.5, wTokens: Double = 0.02,
      wStop: Double = 8.0, wPunct: Double = -6.0): Column = {
    val z = lit(bias) +
      lit(wTokens) * tokenCount(text).cast("double") +
      lit(wStop) * stopwordRatio(text) +
      lit(wPunct) * punctRatio(text)
    round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
  }

  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(normalize(text))).cast("binary"))

  /** Fold common Cyrillic/Greek HOMOGLYPHS to their Latin lookalikes —
    * the normalization that defeats confusable-substitution evasion
    * (spam/SEO text swaps 'o' for Cyrillic 'о' so byte-level dedup and
    * fingerprints miss the duplicate; [[normalize]] even DELETES the
    * impostor chars, mangling tokens). One codegen'd `translate` — apply
    * before [[fingerprint]]/shingling for an adversary-resistant dedup
    * key. Mapping is 1:1 by position (both strings same length). */
  def foldHomoglyphs(text: Column): Column =
    translate(text,
      "аеорсхуіѕјԛԝɡАЕОРСХУІЅЈ",
      "aeopcxyisjqwgAEOPCXYISJ")
}
