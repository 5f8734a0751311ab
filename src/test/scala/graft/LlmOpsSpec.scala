package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Invariants of the LLM-pipeline operators (dedup, similarity, text
  * analysis, multimodal plumbing) beyond the driver's oracle checks. */
class LlmOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = graft.tables.Tables.documents(spark, dir)
  private def embs = graft.tables.Tables.embeddings(spark, dir)

  test("shingles: short docs yield empty set, not inverted sequence") {
    val df = Seq((1L, "one two"), (2L, "one two three four")).toDF("doc_id", "text")
    val sh = df.select(size(Dedup.shingles($"text", 3)).as("n")).as[Int].collect()
    assert(sh.toSeq == Seq(0, 2))
  }

  test("minhash LSH pairs == exact all-pairs n-gram jaccard (full recall on testdata)") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashNearDupPairs(docs, "doc_id", "text", 0.5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(lsh == exact)
  }

  test("prefixJaccardPairs ≡ full-index jaccard pairs at every threshold") {
    Seq(0.3, 0.5, 0.8).foreach { t =>
      val full = Dedup.ngramJaccardPairs(docs, "doc_id", "text", t)
        .as[(Long, Long, Double)].collect().toSet
      val pref = Dedup.prefixJaccardPairs(docs, "doc_id", "text", t)
        .as[(Long, Long, Double)].collect().toSet
      assert(pref == full, s"threshold $t")
    }
    intercept[IllegalArgumentException] {
      Dedup.prefixJaccardPairs(docs, "doc_id", "text", 0.0)
    }
  }

  test("BpeTrainer: hand-computed merges, greedy overlap rule, tie-break, early stop") {
    // corpus: aaab ×2, aab ×1.
    // round 1: (a,a) freq 5 beats (a,b) freq 3 → aaab=[aa,a,b], aab=[aa,b]
    // round 2: (a,b)=2 ties (aa,a)=2 → pair-asc tie-break picks (a,b)
    // round 3: (aa,ab)=2; then best remaining (aa,b)=1 < minFreq → stop
    val df = Seq("aaab aaab aab").toDF("text")
    val got = graft.llm.BpeTrainer.train(df, "text", numMerges = 10)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "a", 5L), (2, "a", "b", 2L), (3, "aa", "ab", 2L)))

    // numMerges caps the loop even when more merges are available
    val capped = graft.llm.BpeTrainer.train(df, "text", numMerges = 1)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(capped == Seq((1, "a", "a", 5L)))
  }

  test("BpeTrainer.trainCapped ≡ train on the gate corpus (uncapped); cap keeps head merges") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dist = graft.llm.BpeTrainer.train(docs, "text", numMerges = 12)
      .as[(Int, String, String, Long)].collect().toSeq
    // vocabCap above the distinct-word count ⇒ bit-identical merge table
    // (same counts, same argmax, same UTF-8 tie-breaks, same greedy fold)
    val local = graft.llm.BpeTrainer.trainCapped(docs, "text", numMerges = 12,
        vocabCap = 10000000)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(local == dist,
      s"local fit diverged from distributed loop:\n$local\nvs\n$dist")
    // a real cap still learns the head of the merge sequence: frequent
    // pairs live in frequent words, so the first merges are stable
    val capped = graft.llm.BpeTrainer.trainCapped(docs, "text", numMerges = 12,
        vocabCap = 2000)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(capped.nonEmpty)
    assert(capped.map(m => (m._2, m._3)).take(3) ==
      dist.map(m => (m._2, m._3)).take(3),
      "capped trainer must agree with the exact trainer on the head merges")
  }

  test("BpeTrainer.encodeAtScale ≡ encode on the gate corpus; handles a deep merge table") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = graft.llm.BpeTrainer.train(docs, "text", numMerges = 12)
      .orderBy($"step").as[(Int, String, String, Long)].collect()
      .map(m => (m._2, m._3)).toSeq
    val ref = graft.llm.BpeTrainer.encode(docs, "doc_id", "text", merges)
      .select($"id", $"tokens").as[(Long, Seq[String])].collect().toMap
    val scale = graft.llm.BpeTrainer.encodeAtScale(docs, "doc_id", "text", merges)
      .select($"id", $"tokens").as[(Long, Seq[String])].collect().toMap
    assert(scale == ref, "rank-map kernel diverged from the per-merge fold")

    // a production-depth merge table (thousands of entries) — the fold
    // path would build a plan that deep; the kernel must stay O(1) plan
    val deep = merges ++ (1 to 5000).map(i => (s"z$i", s"z$i"))
    val deepToks = graft.llm.BpeTrainer
      .encodeAtScale(docs.limit(5), "doc_id", "text", deep)
      .select($"id", $"tokens").as[(Long, Seq[String])].collect().toMap
    assert(deepToks == ref.view.filterKeys(deepToks.contains).toMap,
      "irrelevant deep merges must not change tokenization")
  }

  test("BpeTrainer.encode: merges apply in order; round-trip preserves text; unseen words tokenize") {
    val corpus = Seq((1L, "aaab aaab aab")).toDF("doc_id", "text")
    val merges = graft.llm.BpeTrainer.train(corpus, "text", numMerges = 10)
      .orderBy($"step").as[(Int, String, String, Long)].collect()
      .map(m => (m._2, m._3)).toSeq
    // training corpus words reproduce the trainer's final tokenization
    val enc = graft.llm.BpeTrainer.encode(corpus, "doc_id", "text", merges)
      .select($"tokens").as[Seq[String]].head()
    assert(enc == Seq("aaab", "aaab", "aa", "b"))
    // unseen text tokenizes with the same merges; concatenation round-trips
    val novel = Seq((9L, "ab aaa ba")).toDF("doc_id", "text")
    val novelToks = graft.llm.BpeTrainer.encode(novel, "doc_id", "text", merges)
      .select($"tokens").as[Seq[String]].head()
    assert(novelToks == Seq("ab", "aa", "a", "b", "a"))
    assert(novelToks.mkString == "abaaaba")
  }

  test("labelCentroids: exact means per (label, dim); counts carried") {
    val df = Seq(
      (0, Seq(1.0f, 2.0f)), (0, Seq(3.0f, 6.0f)),
      (1, Seq(10.0f, 0.0f))).toDF("label", "embedding")
    val got = graft.llm.Similarity.labelCentroids(df, "label", "embedding")
      .as[(Int, Long, Long, Double)].collect()
      .map { case (l, d, n, c) => (l, d) -> ((n, c)) }.toMap
    assert(got == Map(
      (0, 0L) -> ((2L, 2.0)), (0, 1L) -> ((2L, 4.0)),
      (1, 0L) -> ((1L, 10.0)), (1, 1L) -> ((1L, 0.0))))
  }

  test("simhash: identical normalized texts collide, different texts don't all collide") {
    val df = Seq((1L, "Spark query engine"), (2L, "spark  QUERY engine!"), (3L, "totally different words here"))
      .toDF("doc_id", "text")
    val hashes = df.select($"doc_id", Dedup.simhash64($"text").as("h"))
      .as[(Long, Long)].collect().toMap
    assert(hashes(1L) == hashes(2L)) // normalization-invariant
    assert(hashes(1L) != hashes(3L))
  }

  test("simhashNearDupPairs == brute-force Hamming pairs (complete recall when radius < bands)") {
    val sh = Dedup.simhashTable(docs, "doc_id", "text")
    val brute = sh.alias("a").join(sh.alias("b"), col("a.id") < col("b.id"))
      .filter(bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))) <= 3)
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSet
    val banded = Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 3, bands = 4)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(banded == brute)
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 4, bands = 4)
    }
  }

  test("redactPii: emails then digit runs, audit count matches redactions") {
    val df = Seq(
      (1L, "contact john.doe+x@mail.example.org or call 555-123-4567 now"),
      (2L, "no pii here"),
      (3L, "two mails a@b.io c@d.net and account 12 34 56 789")).toDF("id", "t")
    val out = df.select($"id",
        TextAnalysis.redactPii($"t").as("r"),
        TextAnalysis.piiMatchCount($"t").as("n"))
      .as[(Long, String, Int)].collect().sortBy(_._1)
    assert(out(0)._2 == "contact [EMAIL] or call [NUM] now" && out(0)._3 == 2)
    assert(out(1)._2 == "no pii here" && out(1)._3 == 0)
    assert(out(2)._2 == "two mails [EMAIL] [EMAIL] and account [NUM]" && out(2)._3 == 3)
  }

  test("contaminationReport: only docs sharing a benchmark n-gram, distinct counts") {
    val bench = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "x alpha beta gamma y"),        // shares "alpha beta gamma"
      (11L, "beta gamma delta q beta gamma delta"), // shares "beta gamma delta" (distinct → 1)
      (12L, "nothing in common here")).toDF("doc_id", "text")
    val got = Dedup.contaminationReport(corpus, bench, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 1L, 11L -> 1L))
  }

  test("connectedComponents: chain, triangle, pair resolve to min-id components") {
    // chain 1-2-3-4 (diameter 3), triangle 10-11-12 + 11-12, pair 20-21
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("d1", "d2")
    val got = Dedup.connectedComponents(pairs, "d1", "d2")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))

    // pointer jumping: a 100-node chain (diameter 99) must converge in
    // O(log d) rounds — 12 iterations suffice only because label paths
    // double per round; plain propagation would need ~99
    val chain = (1L until 100L).map(i => (i, i + 1)).toDF("d1", "d2")
    val comps = Dedup.connectedComponents(chain, "d1", "d2", maxIters = 12)
      .as[(Long, Long)].collect()
    assert(comps.length == 100 && comps.forall(_._2 == 1L))
  }

  test("packSequences: budget respected, all docs packed, deterministic, greedy on a known slice") {
    val d = docs.select($"doc_id", $"lang",
      TextAnalysis.tokenCount($"text").cast("long").as("n_tokens"))
    val packed = graft.llm.Packing.packSequences(d, "doc_id", "n_tokens",
      Seq("lang"), budget = 512, shards = 8)

    // every doc appears exactly once
    assert(packed.count() == d.count())
    assert(packed.select("doc_id").distinct().count() == d.count())

    // no pack exceeds the budget unless it is a single oversized doc
    val over = packed.groupBy($"lang", $"shard", $"pack_id")
      .agg(sum($"n_tokens").as("tot"), count(lit(1)).as("nd"))
      .filter($"tot" > 512 && $"nd" > 1)
    assert(over.count() == 0)

    // deterministic across reruns
    val again = graft.llm.Packing.packSequences(d, "doc_id", "n_tokens",
      Seq("lang"), budget = 512, shards = 8)
    assert(packed.orderBy("doc_id").collect().toSeq ==
      again.orderBy("doc_id").collect().toSeq)

    // greedy semantics on one known slice: replay the fold in Scala
    val slice = packed.filter($"lang" === "en" && $"shard" === 0)
      .orderBy("doc_id").as[(String, Int, Long, Long, Long)].collect()
    var acc = Long.MaxValue; var pid = -1L
    slice.foreach { case (_, _, packId, _, t) =>
      if (acc > 512 - t) { pid += 1; acc = 0 }
      acc += t
      assert(packId == pid)
    }
  }

  test("targetMixture: output proportions track targets, binding stratum kept ~whole, reproducible") {
    val targets = Map("en" -> 0.4, "fr" -> 0.3, "de" -> 0.1, "es" -> 0.1, "zh" -> 0.1)
    val mixed = graft.llm.Sampling.targetMixture(docs, "doc_id", "lang", targets)
    val got = mixed.groupBy($"lang").count().as[(String, Long)].collect().toMap
    val total = got.values.sum.toDouble
    assert(got.keySet == targets.keySet)
    // proportions within hash-bucketing noise of the targets
    targets.foreach { case (lang, w) =>
      val p = got(lang) / total
      assert(math.abs(p - w) < 0.08, s"$lang: got ${p}%, want $w")
    }
    // the binding stratum (max observed count/weight pressure) keeps ≥90%
    val counts = docs.groupBy($"lang").count().as[(String, Long)].collect().toMap
    val binding = targets.keys.minBy(l => counts(l) / targets(l))
    assert(got(binding).toDouble / counts(binding) > 0.9)
    // reproducible
    val again = graft.llm.Sampling.targetMixture(docs, "doc_id", "lang", targets)
    assert(again.select("doc_id").as[Long].collect().sorted.toSeq ==
      mixed.select("doc_id").as[Long].collect().sorted.toSeq)
    // strata outside the target map are dropped
    val sub = graft.llm.Sampling.targetMixture(docs, "doc_id", "lang", Map("en" -> 1.0))
    assert(sub.select("lang").distinct().as[String].collect().toSeq == Seq("en"))
  }

  test("packSequencesGlobal: budget respected, exact coverage, deterministic, waste ≤ shard-local") {
    val d = docs.select($"doc_id",
      TextAnalysis.tokenCount($"text").cast("long").as("n_tokens"))
    val packed = graft.llm.Packing.packSequencesGlobal(d, "doc_id", "n_tokens",
      budget = 512, numPartitions = 8)

    // every doc appears exactly once
    assert(packed.count() == d.count())
    assert(packed.select("doc_id").distinct().count() == d.count())

    // no pack exceeds the budget unless it is a single oversized doc
    val over = packed.groupBy($"pack_id")
      .agg(sum($"n_tokens").as("tot"), count(lit(1)).as("nd"))
      .filter($"tot" > 512 && $"nd" > 1)
    assert(over.count() == 0)

    // deterministic across reruns
    val again = graft.llm.Packing.packSequencesGlobal(d, "doc_id", "n_tokens",
      budget = 512, numPartitions = 8)
    assert(packed.orderBy("doc_id").collect().toSeq ==
      again.orderBy("doc_id").collect().toSeq)

    // best-fit-decreasing over the global size order packs at least as
    // tightly as random-order shard-local next-fit: fewer (or equal) packs
    val shardLocal = graft.llm.Packing.packSequences(
      d.withColumn("g", lit(1)), "doc_id", "n_tokens", Seq("g"), budget = 512, shards = 8)
    val nGlobal = packed.select("pack_id").distinct().count()
    val nLocal = shardLocal.select($"shard", $"pack_id").distinct().count()
    assert(nGlobal <= nLocal, s"global packing used $nGlobal packs vs shard-local $nLocal")
  }

  test("MinHashIndex: probe equals cross-set exact pairs; verify reads only candidate buckets") {
    val work = java.nio.file.Files.createTempDirectory("mhidxspec").toString
    val idx = new graft.llm.MinHashIndex(s"$work/idx")
    val old = docs.filter($"doc_id" % 2 === 0)
    val fresh = docs.filter($"doc_id" % 2 === 1)
    idx.build(spark, old, "doc_id", "text")

    val got = idx.probe(spark, fresh, "doc_id", "text", 0.5)
      .select($"d_new", $"d_old").as[(Long, Long)].collect().toSet
    // truth: exact all-pairs restricted to (odd, even) — every testdata
    // near-dup pair is ≥0.9 jaccard, far above the band-geometry recall knee
    val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5)
      .select($"d1", $"d2").as[(Long, Long)].collect()
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .collect { case (n, o) if n % 2 == 1 && o % 2 == 0 => (n, o) }.toSet
    assert(got == truth, s"probe=${got.size} truth=${truth.size}")

    // the index survives a fresh session read and probes deterministically
    val again = idx.probe(spark, fresh, "doc_id", "text", 0.5)
      .select($"d_new", $"d_old").as[(Long, Long)].collect().toSet
    assert(again == got)

    // empty probe batch → empty result with the right schema
    val none = idx.probe(spark, fresh.filter($"doc_id" < 0), "doc_id", "text", 0.5)
    assert(none.count() == 0 && none.columns.toSeq == Seq("d_new", "d_old", "jaccard"))

    // incremental add: build(¼) + add(¼) probes identically to build(½) —
    // appended fingerprints are indistinguishable from originally-built ones
    val idx2 = new graft.llm.MinHashIndex(s"$work/idx2")
    idx2.build(spark, docs.filter($"doc_id" % 4 === 0), "doc_id", "text")
    idx2.add(spark, docs.filter($"doc_id" % 4 === 2), "doc_id", "text")
    val incr = idx2.probe(spark, fresh, "doc_id", "text", 0.5)
      .select($"d_new", $"d_old").as[(Long, Long)].collect().toSet
    assert(incr == got, s"incremental=${incr.size} rebuilt=${got.size}")
  }

  test("StreamingCorpusDedup: per-batch rejection matches ground-truth greedy; drain is idempotent") {
    val work = java.nio.file.Files.createTempDirectory("scdedup").toString
    docs.filter($"doc_id" % 2 === 0).coalesce(1).write.parquet(s"$work/src/f1")
    docs.filter($"doc_id" % 2 === 1).coalesce(1).write.parquet(s"$work/src/f2")
    // pin batch order: the file stream drains oldest-mtime first
    val t0 = System.currentTimeMillis() - 120000
    for ((d, t) <- Seq(("f1", t0), ("f2", t0 + 60000)); f <- new java.io.File(s"$work/src/$d").listFiles())
      f.setLastModified(t)
    val cfg = graft.streaming.AutoIngest.Config(s"$work/src/*", s"$work/schema",
      s"$work/ck", maxFilesPerTrigger = Some(1))
    graft.llm.StreamingCorpusDedup.run(spark, cfg, s"$work/idx", s"$work/kept")
    val kept = graft.llm.StreamingCorpusDedup.readKept(spark, s"$work/kept")
      .select($"doc_id").as[Long].collect().toSet

    // ground truth: exact all-pairs (≡ the verified LSH pairs on this corpus),
    // replayed through the same two-batch greedy policy
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5)
      .select($"d1", $"d2").as[(Long, Long)].collect()
    val all = docs.select($"doc_id").as[Long].collect().toSet
    val evens = all.filter(_ % 2 == 0)
    val odds = all.filter(_ % 2 == 1)
    val keptB1 = evens -- evens.filter(e => pairs.exists { case (a, b) => b == e && a % 2 == 0 })
    val survB2 = odds -- odds.filter(o => pairs.exists { case (a, b) => b == o && a % 2 == 1 })
    val expected = keptB1 ++ survB2.filterNot(o => pairs.exists { case (a, b) =>
      (a == o && keptB1(b)) || (b == o && keptB1(a)) })
    assert(kept == expected, s"kept=${kept.size} expected=${expected.size}")
    assert(kept.size < all.size) // something was actually rejected

    // replay with no new files: checkpoint makes the drain a no-op
    graft.llm.StreamingCorpusDedup.run(spark, cfg, s"$work/idx", s"$work/kept")
    val again = graft.llm.StreamingCorpusDedup.readKept(spark, s"$work/kept")
      .select($"doc_id").as[Long].collect().toSet
    assert(again == kept)
  }

  test("HLL sketches: union of per-source sketches ≡ whole-corpus sketch; ≤2% error") {
    import org.apache.spark.sql.functions.expr
    val bySource = docs.groupBy($"source").agg(expr("hll_sketch_agg(doc_id, 14)").as("sk"))
    val unionEst = bySource.agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))"))
      .as[Long].head()
    val wholeEst = docs.agg(expr("hll_sketch_estimate(hll_sketch_agg(doc_id, 14))"))
      .as[Long].head()
    val exact = docs.select("doc_id").distinct().count()
    // mergeability: register-max union of slice sketches equals the sketch
    // built in one pass — the invariant that makes stored sketches composable
    assert(unionEst == wholeEst, s"union=$unionEst whole=$wholeEst")
    assert(math.abs(unionEst - exact).toDouble / exact < 0.02,
      s"estimate=$unionEst exact=$exact")
  }

  test("ProductQuantizer: well-formed codes, ADC+rerank recall vs brute force, deterministic retrain") {
    val emb = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val m = 16
    val cents = graft.llm.ProductQuantizer.train(emb, "vec_id", "embedding", m = m)
    assert(cents.count() == m * 16)
    assert(cents.select(size($"cv")).distinct().as[Int].collect().toSeq == Seq(64 / m))

    val codes = graft.llm.ProductQuantizer.encode(emb, cents, "vec_id", "embedding", m = m)
    val n = emb.count()
    assert(codes.count() == n * m) // m codes per vector
    val range = codes.agg(min($"code"), max($"code")).as[(Int, Int)].head()
    assert(range._1 >= 0 && range._2 < 16, s"code range $range")

    // recall@1 of ADC + exact rerank against the exact baseline
    val queries = emb.filter($"vec_id" < 50)
    val got = graft.llm.ProductQuantizer
      .adcTopK(queries, emb, cents, codes, "vec_id", "embedding", k = 1, m = m, rerank = 100)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    val want = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    val hits = want.count { case (q, nb) => got.get(q).contains(nb) }
    assert(hits >= (want.size * 0.8).toInt, s"recall@1 $hits/${want.size}")

    // decimal-exact means + hash seeding ⇒ retraining is bit-identical
    val cents2 = graft.llm.ProductQuantizer.train(emb, "vec_id", "embedding", m = m)
    val c1 = cents.select($"sub", $"code", $"cv").as[(Int, Int, Seq[Double])].collect().toSet
    val c2 = cents2.select($"sub", $"code", $"cv").as[(Int, Int, Seq[Double])].collect().toSet
    assert(c1 == c2)
  }

  test("VectorIndex.add: appended vectors searchable, no new cells, still ≤ brute force") {
    val work = java.nio.file.Files.createTempDirectory("vecidxadd").toString
    val idx = new graft.llm.VectorIndex(s"$work/idx")
    idx.build(spark, embs.filter($"vec_id" % 2 === 0), "vec_id", "embedding",
      nCentroids = 8, trainIters = 1)
    idx.add(spark, embs.filter($"vec_id" % 2 === 1), "vec_id", "embedding")

    // cells stay within the built codebook (appends join existing dirs)
    val cells = spark.read.parquet(s"$work/idx/data")
      .select($"__cell").distinct().as[Long].collect().toSet
    val cents = spark.read.parquet(s"$work/idx/centroids")
      .select($"cent_id").as[Long].collect().toSet
    assert(cells.subsetOf(cents), s"cells $cells ⊄ centroids $cents")

    val queries = embs.filter($"vec_id" < 20)
    val got = idx.search(spark, queries, "vec_id", "embedding", 1, nProbe = 4)
      .select($"query_id", $"neighbor_id", $"cos").as[(Long, Long, Double)].collect()
    // added (odd) vectors are actually findable as neighbors
    assert(got.exists(_._2 % 2 == 1), "no added vector ever surfaced in search")
    val brute = graft.llm.Similarity.bruteForceTopK(queries, embs, "vec_id", "embedding", 1)
      .select($"query_id", $"cos").as[(Long, Double)].collect().toMap
    got.foreach { case (q, _, cos) => assert(cos <= brute(q) + 1e-9) }

    // deterministic across repeated searches
    val again = idx.search(spark, queries, "vec_id", "embedding", 1, nProbe = 4)
      .select($"query_id", $"neighbor_id", $"cos").as[(Long, Long, Double)].collect()
    assert(again.toSet == got.toSet)
  }

  test("VectorIndex: search ≤ brute force, probes prune the cell scan, self-neighbor sane") {
    val work = java.nio.file.Files.createTempDirectory("vecidxspec").toString
    val idx = new graft.llm.VectorIndex(s"$work/idx")
    idx.build(spark, embs, "vec_id", "embedding", nCentroids = 8, trainIters = 1)

    val queries = embs.filter($"vec_id" < 20)
    val got = idx.search(spark, queries, "vec_id", "embedding", 1, nProbe = 2)
      .select($"query_id", $"cos").as[(Long, Double)].collect().toMap
    val brute = graft.llm.Similarity.bruteForceTopK(queries, embs, "vec_id", "embedding", 1)
      .select($"query_id", $"cos").as[(Long, Double)].collect().toMap
    assert(got.nonEmpty)
    got.foreach { case (q, cos) => assert(cos <= brute(q) + 1e-9, s"query $q beat brute force") }

    // partition pruning: the cell predicate must land in the scan's
    // PartitionFilters (directory-level pruning, not a post-scan filter)
    val scans = idx.cellScan(spark, Seq(0L, 1L)).queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val pf = scans.head.metadata.getOrElse("PartitionFilters", "")
    assert(pf.contains("__cell"), s"cell filter not a partition filter: $pf")
  }

  test("exactGroups: duplicated text collapses to one canonical group") {
    val df = Seq((1L, "a b c"), (2L, "a  B c!"), (3L, "x y z")).toDF("doc_id", "text")
    val g = Dedup.exactGroups(df, "doc_id", "text")
    assert(g.count() == 2)
    assert(g.filter($"dup_count" === 2).select("canonical_id").as[Long].head() == 1L)
  }

  test("vec_dot registered for SQL; codegen expression computes the dot product") {
    graft.functions.VectorFunctions.register(spark)
    val r = spark.sql("SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .as[Double].head()
    assert(r == 11.0)
    // float arrays are cast exactly
    val f = Seq((Array(1.5f, 2.5f), Array(2.0f, 4.0f))).toDF("a", "b")
      .select(graft.functions.VectorFunctions.vec_dot($"a", $"b")).as[Double].head()
    assert(f == 13.0)
  }

  test("cosine: self-similarity is 1.0; orthogonal is 0.0") {
    val df = Seq((Array(1f, 0f), Array(1f, 0f), Array(0f, 2f))).toDF("a", "b", "c")
    val r = df.select(
      Similarity.cosine($"a", $"b").as("same"),
      Similarity.cosine($"a", $"c").as("orth")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12 && math.abs(r.getDouble(1)) < 1e-12)
  }

  test("lshTopK: approximate cos never exceeds brute-force cos per query") {
    val q = embs.filter($"vec_id" < 20)
    val bf = Similarity.bruteForceTopK(q, embs, "vec_id", "embedding", 1)
      .select("query_id", "cos").as[(Long, Double)].collect().toMap
    val lsh = Similarity.lshTopK(q, embs, "vec_id", "embedding", 1, numPlanes = 4)
      .select("query_id", "cos").as[(Long, Double)].collect().toMap
    lsh.foreach { case (id, c) => assert(c <= bf(id) + 1e-12, s"query $id") }
  }

  test("lshTopK multi-probe: recall ≥ single-probe, still bounded by brute force") {
    val queries = embs.filter($"vec_id" < 50)
    def top1(multi: Boolean) = graft.llm.Similarity
      .lshTopK(queries, embs, "vec_id", "embedding", 1, numPlanes = 6, multiProbe = multi)
      .select($"query_id", $"cos").as[(Long, Double)].collect().toMap
    val brute = graft.llm.Similarity.bruteForceTopK(queries, embs, "vec_id", "embedding", 1)
      .select($"query_id", $"cos").as[(Long, Double)].collect().toMap
    val single = top1(multi = false)
    val multi = top1(multi = true)
    // multi-probe answers at least as many queries, each at least as well
    assert(multi.keySet.size >= single.keySet.size)
    single.foreach { case (q, cos) => assert(multi(q) >= cos - 1e-12) }
    multi.foreach { case (q, cos) => assert(cos <= brute(q) + 1e-9) }
    // aggregate recall (exact top-1 found) must not decrease
    val hitS = single.count { case (q, cos) => math.abs(cos - brute(q)) < 1e-9 }
    val hitM = multi.count { case (q, cos) => math.abs(cos - brute(q)) < 1e-9 }
    info(s"recall@1 single=$hitS/${brute.size} multi=$hitM/${brute.size}")
    assert(hitM >= hitS)
    // quantified floors (PQ-spec style), not just "≥ single". The fixture
    // embeddings are near-uniform random — the worst case for hyperplane
    // LSH (top-1 is barely closer than the bucket crowd), so the honest
    // floor is low in absolute terms; measured: single 3/50, multi 9/50.
    assert(hitM >= (brute.size * 0.15).toInt, s"multi-probe recall@1 $hitM/${brute.size} < 15%")
    assert(hitM >= 2 * hitS, s"Hamming-1 probing should ≥2× single-probe recall here ($hitM vs $hitS)")
  }

  test("ANN recall floor on ORGANIC embeddings: ≥0.8 recall@10 at documented cost " +
    "(multi-table LSH and trained IVF)") {
    // The r6 gap: planted-copy oracles prove the machinery, but a user
    // tuning parameters needs a pinned quality floor on non-planted data.
    // The fixture is near-uniform random — LSH/IVF's WORST case (top-10
    // cosine ≈ 0.3) — so the floors here are the honest lower bound; the
    // documented cost (candidate fraction) is the price of 0.8+ recall on
    // structureless data. Parameters match the Similarity scaladoc tables.
    val queries = embs.filter($"vec_id" < 50)
    val truth = Similarity.bruteForceTopK(queries, embs, "vec_id", "embedding", 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    def recallAt10(ann: org.apache.spark.sql.DataFrame): Double = {
      val got = ann.select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      truth.map { case (q, t) => got.getOrElse(q, Set.empty[Long]).count(t).toDouble / t.size }
        .sum / truth.size
    }

    val lsh = recallAt10(Similarity.lshTopK(queries, embs, "vec_id", "embedding",
      k = 10, numPlanes = 4, numTables = 16))
    info(f"multi-table LSH (planes=4, tables=16) recall@10 = $lsh%.3f")
    assert(lsh >= 0.8, f"LSH recall@10 $lsh%.3f < 0.8 floor")

    val ivf = recallAt10(Similarity.ivfTopK(queries, embs, "vec_id", "embedding",
      k = 10, nCentroids = 32, nProbe = 20, trainIters = 2))
    info(f"trained IVF (nlist=32, nProbe=20, iters=2) recall@10 = $ivf%.3f")
    assert(ivf >= 0.8, f"IVF recall@10 $ivf%.3f < 0.8 floor")

    // the cheap settings stay cheap-and-lossy (the documented trade is
    // real, not an artifact of the floor parameters being defaults)
    val cheap = recallAt10(Similarity.lshTopK(queries, embs, "vec_id", "embedding",
      k = 10, numPlanes = 4, numTables = 1))
    info(f"single-table LSH (planes=4) recall@10 = $cheap%.3f")
    assert(cheap < lsh, "multi-table must beat single-table on recall")
  }

  test("ANN recall on CLUSTERED embeddings (mixture of Gaussians): ≥0.9 recall@10 " +
    "at ≤ half the uniform fixture's candidate cost") {
    // The uniform fixture above is LSH/IVF's worst case; real embedding
    // corpora are CLUSTERED, and there the same machinery earns higher
    // recall at LOWER candidate cost. Pin that: a 16-cluster Gaussian
    // mixture must reach recall@10 ≥ 0.9 with HALF the uniform fixture's
    // tables (LSH: 8 vs 16 → ~half the candidate fraction) and well under
    // half its probe fraction (IVF: nProbe 8/32 vs 20/32).
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(16)(Array.fill(64)(rnd.nextGaussian()))
    val pts = (0 until 800).map { i =>
      val c = centers(i % 16)
      (i.toLong, c.map(x => (x + 0.5 * rnd.nextGaussian()).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val queries = pts.filter($"vec_id" < 50)
    val truth = Similarity.bruteForceTopK(queries, pts, "vec_id", "embedding", 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recallAt10(ann: org.apache.spark.sql.DataFrame): Double = {
      val got = ann.select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      truth.map { case (q, t) => got.getOrElse(q, Set.empty[Long]).count(t).toDouble / t.size }
        .sum / truth.size
    }
    // parameter → recall curve on clustered data (the regime users tune in)
    val curve = Seq(4, 8, 16).map { tables =>
      tables -> recallAt10(Similarity.lshTopK(queries, pts, "vec_id", "embedding",
        k = 10, numPlanes = 4, numTables = tables))
    }
    curve.foreach { case (t, r) => info(f"LSH planes=4 tables=$t%2d recall@10 = $r%.3f") }
    val lshHalf = curve.find(_._1 == 8).get._2
    assert(lshHalf >= 0.9,
      f"clustered LSH recall@10 $lshHalf%.3f < 0.9 at tables=8 (half the uniform fixture's 16)")

    val ivfCurve = Seq(4, 8).map { probe =>
      probe -> recallAt10(Similarity.ivfTopK(queries, pts, "vec_id", "embedding",
        k = 10, nCentroids = 32, nProbe = probe, trainIters = 2))
    }
    ivfCurve.foreach { case (p, r) => info(f"IVF nlist=32 nProbe=$p recall@10 = $r%.3f") }
    val ivfQuarter = ivfCurve.find(_._1 == 8).get._2
    assert(ivfQuarter >= 0.9,
      f"clustered IVF recall@10 $ivfQuarter%.3f < 0.9 at nProbe=8 (vs 20 on uniform)")
  }

  test("simhashCosinePairs: planted near-dups fully recalled, output exact, no false pairs") {
    val base = embs.select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    val pert = base.filter($"vec_id" < 50)
      .select(($"vec_id" + 1000000L).as("vec_id"),
        transform($"v", (x, i) =>
          x * (lit(1.0) + (pmod($"vec_id" + i, lit(7)) - lit(3)) * lit(2e-4))).as("v"))
    val pairs = graft.llm.Similarity
      .simhashCosinePairs(base.unionByName(pert), "vec_id", "v", threshold = 0.99)
      .select($"d1", $"d2", $"cos").as[(Long, Long, Double)].collect()
    // recall 1 on the planted set: every (i, i+1000000) pair found
    val found = pairs.map(p => (p._1, p._2)).toSet
    (0L until 50L).foreach { i =>
      assert(found.contains((i, i + 1000000L)), s"planted pair $i missing")
    }
    // precision 1: candidates are exact-verified, so every emitted pair
    // genuinely clears the threshold (cos ≈ 1 for a tiny perturbation)
    assert(pairs.forall(_._3 >= 0.99))
    assert(found.size == 50) // random 64-d vectors never hit 0.99
  }

  test("semanticDedup: drops exactly the planted near-dups; keepBest keeps the high-quality twin") {
    val base = embs.select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    val pert = base.filter($"vec_id" < 40)
      .select(($"vec_id" + 1000000L).as("vec_id"),
        transform($"v", (x, i) =>
          x * (lit(1.0) + (pmod($"vec_id" + i, lit(7)) - lit(3)) * lit(2e-4))).as("v"))
    val all = base.unionByName(pert)
    val baseIds = base.select($"vec_id").as[Long].collect().toSet

    // min-id canonical: kept = exactly the original corpus
    val kept = graft.llm.Similarity.semanticDedup(all, "vec_id", "v", k = 8, threshold = 0.99)
      .select($"vec_id").as[Long].collect().toSet
    assert(kept == baseIds)

    // quality-aware canonical: the perturbed twin wins where its quality is higher
    val scored = all.withColumn("quality",
      when($"vec_id" >= 1000000L, 2.0).otherwise(1.0))
    val keptQ = graft.llm.Similarity.semanticDedup(scored, "vec_id", "v",
        k = 8, threshold = 0.99, keepBest = Some("quality"))
      .select($"vec_id").as[Long].collect().toSet
    assert(keptQ == (baseIds -- (0L until 40L)) ++ (0L until 40L).map(_ + 1000000L))
    assert(keptQ.size == baseIds.size)

    // hot-cell cap: sub-splitting can only LOSE pairs (recall trade), so
    // drops shrink monotonically and precision stays 1 (every dropped doc
    // is a genuine planted dup)
    val allIds = baseIds ++ (0L until 40L).map(_ + 1000000L)
    val dropsNoCap = allIds -- kept
    val keptCap = graft.llm.Similarity.semanticDedup(all, "vec_id", "v",
        k = 8, threshold = 0.99, maxCellRows = Some(16))
      .select($"vec_id").as[Long].collect().toSet
    val dropsCap = allIds -- keptCap
    assert(dropsCap.subsetOf(dropsNoCap))
    assert(dropsCap.forall(_ >= 1000000L), "capped dedup must only drop planted dups")
  }

  test("ivfTopK: answers every query; approximate cos never exceeds brute force") {
    val q = embs.filter($"vec_id" < 20)
    val bf = Similarity.bruteForceTopK(q, embs, "vec_id", "embedding", 1)
      .select("query_id", "cos").as[(Long, Double)].collect().toMap
    val ivf = Similarity.ivfTopK(q, embs, "vec_id", "embedding", 1, nCentroids = 8, nProbe = 3)
      .select("query_id", "cos").as[(Long, Double)].collect().toMap
    assert(ivf.size == 20)
    ivf.foreach { case (id, c) => assert(c <= bf(id) + 1e-12, s"query $id") }
  }

  test("kmeansCentroids: unit-norm centroids; trained IVF still ≤ brute force") {
    val cents = Similarity.kmeansCentroids(embs, "vec_id", "embedding", k = 8, iters = 2)
      .select($"cent_id", $"cv0").as[(Long, Seq[Double])].collect()
    assert(cents.length == 8)
    cents.foreach { case (_, v) =>
      assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9)
    }
    val q = embs.filter($"vec_id" < 20)
    val bf = Similarity.bruteForceTopK(q, embs, "vec_id", "embedding", 1)
      .select("query_id", "cos").as[(Long, Double)].collect().toMap
    val ivf = Similarity.ivfTopK(q, embs, "vec_id", "embedding", 1,
        nCentroids = 8, nProbe = 3, trainIters = 2)
      .select("query_id", "cos").as[(Long, Double)].collect().toMap
    assert(ivf.size == 20)
    ivf.foreach { case (id, c) => assert(c <= bf(id) + 1e-12, s"query $id") }
  }

  test("TextChunker: coverage, overlap, and short-doc invariants") {
    import graft.llm.TextChunker
    val df = Seq((1L, (1 to 100).map(i => s"w$i").mkString(" ")), (2L, "tiny doc"))
      .toDF("doc_id", "text")
    val chunks = TextChunker.chunk(df, "doc_id", "text", chunkSize = 64, overlap = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    val doc1 = chunks.filter(_._1 == 1L).sortBy(_._2)
    // 100 tokens, stride 48 → ceil(84/48)=2 chunks: [0,64), [48,100)
    assert(doc1.map(c => (c._3, c._4)).toSeq == Seq((0L, 64L), (48L, 100L)))
    // overlap region identical in both chunks
    val t1 = doc1(0)._5.split(" "); val t2 = doc1(1)._5.split(" ")
    assert(t1.slice(48, 64).toSeq == t2.slice(0, 16).toSeq)
    // short doc → exactly one whole-doc chunk
    val doc2 = chunks.filter(_._1 == 2L)
    assert(doc2.length == 1 && doc2(0)._5 == "tiny doc" && doc2(0)._4 == 2L)
  }

  test("Sampling: deterministic, consistent under corpus growth, rate-accurate") {
    import graft.llm.Sampling
    val d1 = docs.limit(200)
    val s1 = Sampling.stratifiedSample(d1, "doc_id", "lang", Map.empty, defaultRate = 20)
      .select("doc_id").as[Long].collect().toSet
    val s1b = Sampling.stratifiedSample(d1, "doc_id", "lang", Map.empty, defaultRate = 20)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s1b) // reproducible
    // consistency: growing the corpus never changes membership of old rows
    val s2 = Sampling.stratifiedSample(docs, "doc_id", "lang", Map.empty, defaultRate = 20)
      .select("doc_id").as[Long].collect().toSet
    assert(s1.subsetOf(s2))
    // rate roughly holds (20% of 500 ± generous tolerance)
    assert(s2.size > 50 && s2.size < 150)
  }

  test("reservoirPerKey: exactly k per group, reproducible, growth-stable prefix") {
    import graft.llm.Sampling
    val docs = (1L to 200L).map(i => (i, if (i % 3 == 0) "de" else "en"))
      .toDF("doc_id", "lang")
    val s1 = Sampling.reservoirPerKey(docs, "lang", "doc_id", 5)
    val counts = s1.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts == Map("en" -> 5L, "de" -> 5L))
    // reproducible across runs
    val s2 = Sampling.reservoirPerKey(docs, "lang", "doc_id", 5)
    assert(s1.select("doc_id").as[Long].collect().sorted.sameElements(
      s2.select("doc_id").as[Long].collect().sorted))
    // a tiny group yields the whole group
    val small = Sampling.reservoirPerKey(
      docs.filter($"doc_id" <= 4), "lang", "doc_id", 5)
    assert(small.count() == 4)
  }

  test("langId: plants classify correctly") {
    val df = Seq(
      ("the cat sat on the mat and it is a hat", "en"),
      ("el perro y la casa de los gatos es una", "es"),
      ("der hund und die katze ist ein tier von", "de")).toDF("text", "expected")
    val got = df.select(TextAnalysis.langId($"text").as("got"), $"expected")
      .as[(String, String)].collect()
    got.foreach { case (g, e) => assert(g == e) }
  }

  test("quality score is in [0,1]; token counts non-negative") {
    val r = docs.select(
      min(TextAnalysis.qualityScore($"text")).as("mn"),
      max(TextAnalysis.qualityScore($"text")).as("mx"),
      min(TextAnalysis.tokenCount($"text")).as("tmin")).head()
    assert(r.getDouble(0) >= 0.0 && r.getDouble(1) <= 1.0 && r.getInt(2) >= 0)
  }

  test("decodeStub: schema extended, deterministic, content preserved") {
    val media = docs.limit(10).withColumn("content", $"text".cast("binary"))
    val d1 = Multimodal.decodeStub(media, "content")
    assert(d1.columns.takeRight(3).toSeq ==
      Seq("decoded_width", "decoded_height", "decoded_mean_luma"))
    val a = d1.select("doc_id", "decoded_width").as[(Long, Int)].collect().toMap
    val b = Multimodal.decodeStub(media, "content")
      .select("doc_id", "decoded_width").as[(Long, Int)].collect().toMap
    assert(a == b && a.values.forall(w => w >= 64 && w < 1024))
  }

  test("resizeStub: shape-correct output, metadata filled, deterministic") {
    import graft.llm.Multimodal
    val df = Seq((1L, ("x" * 1000).getBytes), (2L, "ab".getBytes))
      .toDF("id", "content")
    val out = Multimodal.resizeStub(df, "content", 8, 8)
    val r = out.orderBy($"id").collect()
    assert(out.columns.contains("resized") && out.columns.contains("resized_width"))
    val big = r(0).getAs[Array[Byte]]("resized")
    assert(big.length == 67) // ceil(1000/15): budget 64 → ratio 15
    assert(r(0).getInt(r(0).fieldIndex("resized_width")) == 8)
    val small = r(1).getAs[Array[Byte]]("resized")
    assert(small.length == 2) // ratio 1: shorter than budget, kept as-is
    // deterministic across runs
    val again = Multimodal.resizeStub(df, "content", 8, 8)
      .orderBy($"id").collect()(0).getAs[Array[Byte]]("resized")
    assert(java.util.Arrays.equals(big, again))
  }

  test("video frames: fixed-stride slices are real decodable frames, sampling keeps every Nth") {
    val base = docs.limit(6).select($"doc_id")
      .withColumn("nf", (lit(4) + pmod($"doc_id", lit(3))).cast("int"))
    val vid = Multimodal.syntheticVideo(base, "doc_id", "nf")
    val out = Multimodal.decodeVideoFrames(vid, "content", Multimodal.bmpFrameBytes, 2)
      .select($"doc_id", $"nf", $"frame_idx", $"decoded_width", $"decoded_height",
        $"decoded_mean_luma", $"decoded_real")
      .collect()
    out.foreach { r =>
      assert(r.getBoolean(6), "every sampled slice must decode as a real image")
      assert(r.getInt(3) == 16 && r.getInt(4) == 16)
      val g = ((r.getLong(0) * 7 + r.getInt(2) * 31) % 256).toInt
      assert(math.abs(r.getDouble(5) - g / 255.0) < 1e-9,
        s"doc ${r.getLong(0)} frame ${r.getInt(2)}: luma ${r.getDouble(5)} != ${g / 255.0}")
    }
    // everyNth=2 keeps ceil(nf/2) frames, at even indices
    out.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val nf = rs.head.getInt(1)
      assert(rs.length == (nf + 1) / 2)
      assert(rs.map(_.getInt(2)).sorted.toSeq == (0 until nf by 2).toSeq)
    }
    // everyNth=1 decodes the full frame sequence
    val full = Multimodal.decodeVideoFrames(vid, "content", Multimodal.bmpFrameBytes, 1)
    assert(full.count() == base.select(sum($"nf")).as[Long].head())
  }

  test("WAV kernels: our writer round-trips through the JDK's own audio stack; decode is exact") {
    val base = docs.limit(8).select($"doc_id")
      .withColumn("n", (lit(800) + pmod($"doc_id", lit(5)) * 80).cast("int"))
    val wav = Multimodal.syntheticWav(base, "doc_id", "n")
    val rows = Multimodal.decodeWav(wav, "content")
      .select($"doc_id", $"n", $"content", $"sample_rate", $"channels",
        $"n_frames", $"peak_abs", $"sum_sq", $"zero_crossings", $"decoded_real")
      .collect()
    rows.foreach { r =>
      val docId = r.getLong(0); val n = r.getInt(1)
      val bytes = r.getAs[Array[Byte]](2)
      assert(r.getBoolean(9), "real decode expected")
      assert(r.getInt(3) == 8000 && r.getInt(4) == 1 && r.getInt(5) == n)

      // independent referee: javax.sound.sampled parses OUR bytes the same
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      assert(ais.getFormat.getSampleRate == 8000f)
      assert(ais.getFormat.getChannels == 1)
      assert(ais.getFormat.getSampleSizeInBits == 16)
      assert(ais.getFrameLength == n.toLong)

      // closed-form replay of the signal agrees with the decoded stats
      val samples = (0 until n).map(i => ((docId * 31 + i.toLong * 7919) % 20001) - 10000)
      assert(r.getInt(6) == samples.map(math.abs).max)
      assert(r.getLong(7) == samples.map(s => s * s).sum)
      assert(r.getLong(8) == samples.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)))
    }

    // garbage payloads are flagged, not faked
    val junk = Seq((1L, "definitely not RIFF".getBytes)).toDF("doc_id", "content")
    val bad = Multimodal.decodeWav(junk, "content").collect()(0)
    assert(!bad.getBoolean(bad.fieldIndex("decoded_real")))
    assert(bad.isNullAt(bad.fieldIndex("sum_sq")))
  }

  test("Quantization: codes in int8 range, max_err bounded by scale/2, round-trip faithful") {
    val q = graft.llm.Quantization.quantizeInt8(embs, "vec_id", "embedding")
    assert(q.count() == embs.count())
    val range = q.select(explode($"codes").as("c"))
      .agg(min($"c"), max($"c")).as[(Byte, Byte)].head()
    assert(range._1 >= -127 && range._2 <= 127, s"code range $range")

    // symmetric round-to-nearest: every element's reconstruction error is
    // at most half a quantization step
    val audit = graft.llm.Quantization.int8ErrorAudit(embs, "vec_id", "embedding")
      .select($"vec_id", $"scale", $"max_err").as[(Long, Double, Double)].collect()
    audit.foreach { case (id, scale, maxErr) =>
      // audit values are round(6)ed — allow half-ulp-of-rounding slack
      assert(maxErr <= scale / 2 + 1e-6, s"vec $id: max_err $maxErr > scale/2 ${scale / 2}")
    }

    // dequantized vectors still rank like the originals: cosine ≥ 0.99
    val deq = q.select($"vec_id",
      graft.llm.Quantization.dequantize($"codes", $"scale").as("dv"))
    val both = embs.select($"vec_id", transform($"embedding", _.cast("double")).as("ov"))
      .join(deq, "vec_id")
    val worst = both.select(
      (graft.functions.VectorFunctions.vec_dot($"ov", $"dv")
        / (sqrt(graft.functions.VectorFunctions.vec_dot($"ov", $"ov"))
          * sqrt(graft.functions.VectorFunctions.vec_dot($"dv", $"dv")))).as("cos"))
      .agg(min($"cos")).as[Double].head()
    assert(worst >= 0.99, s"worst round-trip cosine $worst")
  }

  test("bigramLogLik: scores negative, bigram counts = tokens-1, typical text beats word salad") {
    val out = graft.llm.TextAnalysis.bigramLogLik(docs, "doc_id", "text")
    val joined = out.join(docs.select($"doc_id",
      graft.llm.TextAnalysis.tokenCount($"text").cast("long").as("nt")), "doc_id")
    // every scored doc has exactly (tokens − 1) bigrams and a negative
    // mean log-likelihood (probabilities < 1)
    assert(joined.filter($"n_bigrams" =!= $"nt" - 1).count() == 0)
    assert(out.filter($"mean_loglik" >= 0).count() == 0)
    // hand-checkable controlled corpus: counts C(a)=C(b)=8, C(a,b)=8,
    // C(b,a)=6, singleton chain q r s t, V=6 →
    //   d1 = (4·ln(9/14) + 3·ln(7/14)) / 7, d3 = ln(2/7)
    val tiny = Seq(
      (1L, "a b a b a b a b"),
      (2L, "a b a b a b a b"),
      (3L, "q r s t")).toDF("doc_id", "text")
    val got = graft.llm.TextAnalysis.bigramLogLik(tiny, "doc_id", "text")
      .select($"doc_id", $"mean_loglik").as[(Long, Double)].collect().toMap
    val d1 = (4 * math.log(9.0 / 14) + 3 * math.log(7.0 / 14)) / 7
    val d3 = math.log(2.0 / 7)
    assert(math.abs(got(1L) - d1) < 1e-5, s"d1 ${got(1L)} vs $d1")
    assert(math.abs(got(3L) - d3) < 1e-5, s"d3 ${got(3L)} vs $d3")
    assert(got(1L) > got(3L)) // corpus-typical transitions beat a rare chain
  }

  test("frameSample: sampled frame count matches arithmetic") {
    val df = Seq(("x" * 250)).toDF("t").withColumn("content", $"t".cast("binary"))
    val r = Multimodal.frameSample(df, "content", 100, 2)
      .select("n_frames_sampled").as[Int].head()
    // 250 bytes → 3 frames → keep indices 0, 2 → 2 sampled
    assert(r == 2)
  }

  test("SubstringDedup: planted spans — overlap merge, within-doc repeat, short-doc exclusion") {
    // L=10. Doc 1's grams at positions 1 and 3 are each duplicated
    // (in docs 2 and 3 resp.) but position 2's gram is not — the two
    // runs [1,10] and [3,12] overlap in characters and must union to
    // [1,12], the interval-merge path the sf corpus (whole-doc dups)
    // barely exercises. Doc 6 repeats a 12-char block within itself:
    // both copies count (boilerplate semantics), runs don't overlap.
    val docs = Seq(
      (1L, "abcdefghijkl"),            // merged span [1,12]
      (2L, "QQQabcdefghij"),           // "abcdefghij" @4 → [4,13]
      (3L, "cdefghijklZZZ"),           // "cdefghijkl" @1 → [1,10]
      (4L, "tooshort"),                // < L: no grams, absent
      (5L, "0123456789!@#$%^&*()_-="), // all grams unique, absent
      (6L, "KLMNOPQRSTUV#KLMNOPQRSTUV") // within-doc: [1,12] + [14,25]
    ).toDF("doc_id", "text")
    val got = graft.llm.SubstringDedup
      .duplicatedSpans(docs, "doc_id", "text", 10)
      .as[(Long, Long, Long, Double)].collect().toList.sortBy(_._1)
    assert(got == List(
      (1L, 12L, 12L, 1.0),
      (2L, 10L, 10L, 0.769231),
      (3L, 10L, 10L, 0.769231),
      (6L, 24L, 12L, 0.96)), got.toString)
  }

  test("contaminatedSpans: only bench-matching spans count; train-train dup ignored") {
    // L=10. Train doc 1 embeds a 12-char bench substring → merged span 12.
    // Train docs 2+3 duplicate EACH OTHER (not the bench) → must NOT be
    // flagged: cross-train duplication is duplicatedSpans' business.
    val train = Seq(
      (1L, "XXabcdefghijklXX"),       // bench's abcdefghijkl at pos 3..14
      (2L, "WWWWWWWWWWWWQ"),          // dup of doc 3, absent from bench
      (3L, "QWWWWWWWWWWWW")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "abcdefghijkl"),
      (101L, "zzzzzzzzzzzz")).toDF("doc_id", "text")
    val got = graft.llm.SubstringDedup
      .contaminatedSpans(train, bench, "doc_id", "text", 10)
      .as[(Long, Long, Long, Double)].collect().toList.sortBy(_._1)
    assert(got == List((1L, 12L, 12L, 0.75)), got.toString)
  }

  test("Sharding.assignShards: layout-independent, contiguous per-shard order, seed shifts") {
    val base = docs.select($"doc_id", $"text")
    val a = graft.llm.Sharding.assignShards(base.repartition(1), "doc_id", 4)
      .select($"doc_id", $"shard_id", $"pos_in_shard")
      .as[(Long, Long, Int)].collect().toSet
    val b = graft.llm.Sharding.assignShards(base.repartition(7), "doc_id", 4)
      .select($"doc_id", $"shard_id", $"pos_in_shard")
      .as[(Long, Long, Int)].collect().toSet
    // identical assignment AND order no matter the input partitioning
    assert(a == b)
    // positions are exactly 1..n within every shard
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).toList.sorted == (1 to rows.size).toList)
    }
    // every shard populated, no shard starved (LCG spreads the id range)
    assert(a.map(_._2) == (0L to 3L).toSet)
    // a different seed produces a different permutation
    val c = graft.llm.Sharding.assignShards(base, "doc_id", 4, seed = 99L)
      .select($"doc_id", $"shard_id", $"pos_in_shard")
      .as[(Long, Long, Int)].collect().toSet
    assert(a != c)
  }

  test("invertedIndex: df band, sorted postings, within-doc repeats collapse") {
    val d = Seq(
      (3L, "x y x y"),     // bigrams: "x y"(×2 → once), "y x"
      (1L, "x y z"),       // "x y", "y z"
      (2L, "x y q"),       // "x y", "y q"
      (4L, "solo")         // < 2 tokens: nothing
    ).toDF("doc_id", "text")
    val all = graft.llm.Ranking.invertedIndex(d, "doc_id", "text", n = 2)
      .as[(String, Long, String)].collect().toSet
    assert(all == Set(("x y", 3L, "1,2,3"), ("y x", 1L, "3"),
      ("y z", 1L, "1"), ("y q", 1L, "2")), all.toString)
    // band filter keeps only the 2..maxDf tier
    val band = graft.llm.Ranking.invertedIndex(d, "doc_id", "text", n = 2,
      minDf = 2L, maxDf = 8L).as[(String, Long, String)].collect().toSet
    assert(band == Set(("x y", 3L, "1,2,3")))
  }

  test("rrfFuse: hand-computed fusion, shared id sums both legs") {
    val lex = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rank")
    val vec = Seq((20L, 1L), (40L, 2L)).toDF("id", "rank")
    val got = graft.llm.Ranking.rrfFuse(Seq(lex, vec), "id", "rank", 60)
      .as[(Long, Double, Long)].collect().toList.sortBy(_._1)
    assert(got == List(
      (10L, 0.016393, 1L),              // 1/61
      (20L, 0.032522, 2L),              // 1/62 + 1/61
      (30L, 0.015873, 1L),              // 1/63
      (40L, 0.016129, 1L)), got.toString) // 1/62
  }

  test("segmentDedup: keep-first cut, within-doc repeats survive, empty doc safe") {
    // W=2 segments: doc1 = [a b][c d], doc2 = [a b][a b][x y] (within-doc
    // repeat of "a b"), doc3 = [c d][z z], doc4 = "" (no segments).
    val d = Seq((1L, "a b c d"), (2L, "a b a b x y"),
      (3L, "c d z z"), (4L, "")).toDF("doc_id", "text")
    val got = graft.llm.SegmentDedup
      .segmentDedup(d, "doc_id", "text", segWords = 2)
      .as[(Long, Long, Long, String)].collect().toList.sortBy(_._1)
    // "a b" in docs {1,2} → keeper (1,1); BOTH doc2 occurrences drop.
    // "c d" in docs {1,3} → keeper (1,2); doc3's drops. "x y"/"z z" unique.
    assert(got == List(
      (1L, 2L, 0L, "a b c d"),
      (2L, 3L, 2L, "x y"),
      (3L, 2L, 1L, "z z"),
      (4L, 0L, 0L, "")), got.toString)
    // keepFirst=false: CCNet-style drop of EVERY duplicated occurrence
    val all = graft.llm.SegmentDedup
      .segmentDedup(d, "doc_id", "text", segWords = 2, keepFirst = false)
      .as[(Long, Long, Long, String)].collect().toList.sortBy(_._1)
    assert(all.map(r => (r._1, r._3)) == List((1L, 2L), (2L, 2L), (3L, 1L), (4L, 0L)))
    assert(all.head._4 == "", all.toString) // doc1 loses both segments
  }

  test("segmentDedup: a segment repeated only WITHIN one doc is not corpus-duplicated") {
    val d = Seq((1L, "p q p q"), (2L, "r s t u")).toDF("doc_id", "text")
    val got = graft.llm.SegmentDedup
      .segmentDedup(d, "doc_id", "text", segWords = 2)
      .as[(Long, Long, Long, String)].collect().toList.sortBy(_._1)
    assert(got.forall(_._3 == 0L), got.toString) // dfreq=1 everywhere
  }

  test("NaiveBayes: learned vocabulary separates labels; ties break label-asc") {
    val train = Seq(
      (1L, "cat cat dog", "pets"), (2L, "cat dog dog", "pets"),
      (3L, "tensor graph", "ml"), (4L, "graph tensor tensor", "ml")
    ).toDF("doc_id", "text", "lab")
    val test = Seq((10L, "cat dog"), (11L, "tensor tensor"), (12L, "unseen"))
      .toDF("doc_id", "text")
    val got = graft.llm.NaiveBayes
      .trainPredict(train, test, "doc_id", "text", "lab")
      .as[(Long, String, Double)].collect().toList.sortBy(_._1)
    assert(got.map(r => (r._1, r._2)) ==
      List((10L, "pets"), (11L, "ml"), (12L, "ml")), got.toString)
    // doc 12 "unseen": equal priors, back-off 1/(N_l+V) per class — the
    // smaller class mass (ml: 5 tokens vs pets: 6) gives the larger
    // smoothed likelihood, so "ml" wins on score, not on tie-break.
  }

  test("NaiveBayes: exact score tie breaks label-asc") {
    // Symmetric classes (same mass, same priors, same count profile) —
    // an unseen token scores identically under both → label asc wins.
    val train = Seq((1L, "aa aa", "zz_lab"), (2L, "bb bb", "aa_lab"))
      .toDF("doc_id", "text", "lab")
    val test = Seq((10L, "unseen")).toDF("doc_id", "text")
    val got = graft.llm.NaiveBayes
      .trainPredict(train, test, "doc_id", "text", "lab")
      .as[(Long, String, Double)].collect().toList
    assert(got.map(r => (r._1, r._2)) == List((10L, "aa_lab")), got.toString)
  }

  test("leakageSafeSplit: near-dup pairs never straddle the boundary; singletons self-group") {
    val docs = (1L to 20L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // clusters: {1,2,3} (chained), {7,8}; the rest singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("d1", "d2")
    val got = graft.llm.Sampling
      .leakageSafeSplit(docs, "doc_id", pairs, "d1", "d2")
      .as[(Long, Long, String)].collect().toList.sortBy(_._1)
    assert(got.size == 20)
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L)._2 == 1L && byId(2L)._2 == 1L && byId(3L)._2 == 1L)
    assert(byId(7L)._2 == 7L && byId(8L)._2 == 7L)
    assert(byId(4L)._2 == 4L) // singleton
    // the leak-safety property itself: same group ⇒ same split
    got.groupBy(_._2).values.foreach { grp =>
      assert(grp.map(_._3).distinct.size == 1, grp.toString)
    }
    // both labels actually occur over a spread of group ids
    assert(got.map(_._3).distinct.sorted == List("test", "train"), got.toString)
  }

  test("RandomProjection: planted duplicate projects to cos 1; JL error bounded; sign matrix non-degenerate") {
    import graft.llm.{RandomProjection, Similarity}
    val emb = embs.select($"vec_id",
      transform($"embedding", _.cast("double")).as("v"))
    // plant an exact copy of vec 0 at id 999999
    val planted = emb.filter($"vec_id" === 0)
      .select(lit(999999L).as("vec_id"), $"v")
    val proj = RandomProjection.project(emb.unionByName(planted), "vec_id", "v", 16)
    val top1 = Similarity.bruteForceTopK(
        proj.filter($"vec_id" === 0), proj, "vec_id", "y", 1)
      .select($"neighbor_id", round($"cos", 6)).as[(Long, Double)].head()
    assert(top1 == ((999999L, 1.0)), top1.toString)

    // JL preservation: mean |cos_proj − cos_exact| over a pair sample is
    // within the dOut=16 regime (~1/√16); a factorizing (degenerate) sign
    // matrix fails this at ~0.9 because every projected cos is ±1.
    val sample = emb.filter($"vec_id" < 30)
    val a = sample.select($"vec_id".as("ida"), $"v".as("va"))
    val b = sample.select($"vec_id".as("idb"), $"v".as("vb"))
    val pa = RandomProjection.project(sample, "vec_id", "v", 16)
    val ya = pa.select($"vec_id".as("ida"), $"y".as("ya"))
    val yb = pa.select($"vec_id".as("idb"), $"y".as("yb"))
    val meanErr = a.join(b, $"ida" < $"idb")
      .join(ya, Seq("ida")).join(yb, Seq("idb"))
      .select(abs(Similarity.cosine($"va", $"vb") -
        Similarity.cosine($"ya", $"yb")).as("err"))
      .agg(avg($"err")).as[Double].head()
    assert(meanErr < 0.35, s"JL mean cos error $meanErr — projection degenerate?")
  }

  test("contentDefinedChunks: boundaries resynchronize after an insertion; short docs are one chunk") {
    import graft.llm.SubstringDedup
    val base = "the quick brown fox jumps over the lazy dog while seventeen " +
      "green bottles stand on the wall and the rain in spain falls mainly on the plain " +
      "as colorless green ideas sleep furiously near the silent harbor lights tonight"
    val d = Seq((1L, base), (2L, "Z" + base), (3L, "ab")).toDF("doc_id", "text")
    val ch = SubstringDedup.contentDefinedChunks(d, "doc_id", "text", 8, 32)
      .as[(Long, Long, String)].collect().toList
    val c1 = ch.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    val c2 = ch.filter(_._1 == 2L).sortBy(_._2).map(_._3)
    val c3 = ch.filter(_._1 == 3L).map(_._3)
    assert(c1.mkString == base && c2.mkString == "Z" + base) // lossless cover
    assert(c1.size >= 3, s"text too short for the test: ${c1.size} chunks")
    // content-defined boundaries RESYNC after the unshared prefix: every
    // chunk of doc1 except the first reappears verbatim in doc2 (a fixed
    // ALIGNED chunker shares nothing after a 1-char insertion)
    assert(c1.drop(1).forall(c2.toSet), (c1, c2).toString)
    assert(c3 == List("ab")) // shorter than the window: one whole-doc chunk
  }

  test("cdcDedupReport: planted shared block is found; unique docs report zero") {
    import graft.llm.SubstringDedup
    val shared = "uniform resource locator canonicalization for training corpora " +
      "requires deterministic lowercase folding of the host and scheme parts always"
    val d = Seq(
      (1L, "intro text first " + shared + " outro one"),
      (2L, "different preamble here " + shared + " and a tail"),
      (3L, "completely unrelated content that shares nothing with the others at all")
    ).toDF("doc_id", "text")
    val got = SubstringDedup.cdcDedupReport(d, "doc_id", "text", 8, 32)
      .as[(Long, Long, Long, Long)].collect().toList.sortBy(_._1)
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L)._3 > 0 && byId(2L)._3 > 0, got.toString) // shared block chunks pair up
    assert(byId(3L)._3 == 0 && byId(3L)._4 == 0, got.toString)
  }

  test("TextRank: hub outranks leaves, symmetric leaves tie exactly; self-pairs dropped") {
    import graft.llm.TextRank
    // star graph: hub—l1, hub—l2, hub—l3 each weight 1; "x x" self-pair
    val d = Seq((1L, "l1 hub l2"), (2L, "hub l3"), (3L, "x x"))
      .toDF("doc_id", "text")
    val edges = TextRank.cooccurrenceEdges(d, "doc_id", "text")
    assert(edges.as[(String, String, Long)].collect().toSet ==
      Set(("hub", "l1", 1L), ("hub", "l2", 1L), ("hub", "l3", 1L)))
    val pr = TextRank.pageRank(edges, iters = 5)
      .as[(String, java.math.BigDecimal)].collect().toMap
    assert(pr("hub").doubleValue > pr("l1").doubleValue, pr.toString)
    assert(pr("l1") == pr("l2") && pr("l2") == pr("l3"), pr.toString) // exact tie
    // probability mass ≈ 1 (12-dp quantization drift only)
    val total = pr.values.map(_.doubleValue).sum
    assert(math.abs(total - 1.0) < 1e-9, total.toString)
  }

  test("Pca: planted dominant axis recovered, loadings unit-norm, eigenvalue ≈ axis variance") {
    import graft.llm.Pca
    // dim 0 carries variance ~100× the rest: the top component must be ≈ e0
    val rows = (0 until 200).map { k =>
      val t = (k % 21) - 10  // mean-zero ramp on dim 0
      val v = Array.tabulate(8)(j =>
        if (j == 0) t.toFloat
        else (((k * 31 + j * 17) % 7) - 3) * 0.1f) // small deterministic noise
      (k.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val cov = Pca.covariance(rows, "vec_id", "embedding")
    val comp = Pca.topComponent(spark, cov, 8, iters = 10)
      .as[(Int, Double, Double)].collect().sortBy(_._1)
    val loadings = comp.map(_._2)
    assert(math.abs(loadings.map(x => x * x).sum - 1.0) < 1e-6,
      s"not unit norm: ${loadings.toSeq}")
    assert(math.abs(loadings(0)) > 0.99,
      s"dominant axis not recovered: ${loadings.toSeq}")
    // eigenvalue ≈ variance of the ramp (mean 0, values -10..10 over 21)
    val varRamp = (0 until 200).map(k => (k % 21) - 10).map(t => t * t).sum / 200.0
    assert(math.abs(comp.head._3 - varRamp) / varRamp < 0.05,
      s"eigenvalue ${comp.head._3} vs ramp variance $varRamp")
  }

  test("Pca.topComponent: d² driver-collect guard rejects over-large d with a pointer " +
    "to the distributed fallback") {
    import graft.llm.Pca
    val cov = Seq((0, 0, BigDecimal(1))).toDF("i", "j", "c")
    val e = intercept[IllegalArgumentException] {
      Pca.topComponent(spark, cov, d = 5000)
    }
    assert(e.getMessage.contains("d² <= 16M") || e.getMessage.contains("d² <= 16M"),
      e.getMessage)
    assert(e.getMessage.contains("distributed"), e.getMessage)
  }

  test("Pca.topComponentDistributed ≡ topComponent, bit-identical at small d") {
    import graft.llm.Pca
    import org.apache.spark.sql.functions.{abs => sqlAbs, round => sqlRound}
    // the q292 banded Toeplitz covariance at a d the local path accepts
    val d = 48
    val cov = spark.range(d).select($"id".cast("int").as("i"))
      .crossJoin(spark.range(-8, 9).select($"id".cast("int").as("o")))
      .select($"i", ($"i" + $"o").as("j"), $"o")
      .filter($"j" >= 0 && $"j" < d)
      .select($"i", $"j",
        sqlRound(lit(1.0) / (lit(1.0) + sqlAbs($"o").cast("double")), 9)
          .cast(org.apache.spark.sql.types.DecimalType(18, 9)).as("c"))
    val local = Pca.topComponent(spark, cov, d, iters = 10)
      .as[(Int, Double, Double)].collect().sortBy(_._1).toSeq
    val dist = Pca.topComponentDistributed(spark, cov, d, iters = 10)
      .as[(Int, Double, Double)].collect().sortBy(_._1).toSeq
    assert(local == dist, s"distributed/local drift:\n${
      local.zip(dist).filter(p => p._1 != p._2).take(5)}")
    // and on a DENSE covariance from real-shaped vectors
    val rows = (0 until 60).map { k =>
      (k.toLong, Array.tabulate(8)(j => (((k * 13 + j * 7) % 11) - 5) * 0.2f).toSeq)
    }.toDF("vec_id", "embedding")
    val dcov = Pca.covariance(rows, "vec_id", "embedding")
    val l2 = Pca.topComponent(spark, dcov, 8, iters = 10)
      .as[(Int, Double, Double)].collect().sortBy(_._1).toSeq
    val d2 = Pca.topComponentDistributed(spark, dcov, 8, iters = 10)
      .as[(Int, Double, Double)].collect().sortBy(_._1).toSeq
    assert(l2 == d2, s"dense distributed/local drift: $l2 vs $d2")
  }

  test("Pca.debiasReport: distributed routing ≡ local report, bit-identical at d=64") {
    import graft.llm.Pca
    // the whole REPORT (projections + norms), not just the component: the
    // q312 path (d > 4000 → topComponentDistributed) must reproduce q261's
    // local numbers exactly when forced at a d the local guard accepts
    val local = Pca.debiasReport(spark, embs, "vec_id", "embedding", 64, iters = 10)
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1).toSeq
    val dist = Pca.debiasReport(spark, embs, "vec_id", "embedding", 64, iters = 10,
        forceDistributed = true)
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1).toSeq
    assert(local.nonEmpty && local == dist, s"debias routing drift:\n${
      local.zip(dist).filter(p => p._1 != p._2).take(5)}")
  }

  test("Pca.debiasReport: FUSED few-vectors distributed path ≡ local, bit-identical (r14)") {
    import graft.llm.Pca
    // n = 3 < defaultParallelism hits the fused kernel→packed-iteration
    // branch (the q312 shape: the covariance kernel's per-partition arrays
    // feed the power iteration with no d²-row DataFrame in between);
    // forceDistributed at d = 64 lets the LOCAL report pin it bit for bit.
    val d = 64
    assert(spark.sparkContext.defaultParallelism > 3,
      "fixture must stay on the few-vectors branch (n < cores)")
    val few = spark.range(3).select($"id".cast("long").as("vec_id"))
      .select($"vec_id", transform(sequence(lit(0), lit(d - 1)),
        i => ((($"vec_id" + 1) * 31 + i.cast("long") * 17) % 97)
          .cast("double") / 97.0).as("embedding"))
    val local = Pca.debiasReport(spark, few, "vec_id", "embedding", d, iters = 5)
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1).toSeq
    val fused = Pca.debiasReport(spark, few, "vec_id", "embedding", d, iters = 5,
        forceDistributed = true)
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1).toSeq
    assert(local.nonEmpty && local == fused, s"fused few-vectors drift:\n${
      local.zip(fused).filter(p => p._1 != p._2).take(5)}")
  }

  test("Pca.topComponents deflation: distributed ≡ local bit-identical; components orthogonal, eigenvalues descend") {
    import graft.llm.Pca
    // two planted factors with WELL-SEPARATED variances (power iteration
    // at 10 rounds needs λ₂/λ₁ ≪ 1 to converge; a close spectrum is a
    // more-iterations problem, not a deflation problem) + small noise
    val rows = (0 until 80).map { k =>
      val a = ((k * 13 % 17) - 8) * 1.0f
      val b = ((k * 7 % 11) - 5) * 0.4f
      (k.toLong, Array.tabulate(12) { j =>
        val noise = (((k * 17 + j * 5) % 13) - 6) * 0.02f
        j match {
          case 0 => 0.8f * a + noise
          case 1 => 0.6f * a + noise
          case 2 => 0.8f * b + noise
          case 3 => -0.6f * b + noise
          case _ => noise
        }
      }.toSeq)
    }.toDF("vec_id", "embedding")
    val cov = Pca.covariance(rows, "vec_id", "embedding")
    val local = Pca.topComponents(spark, cov, 12, k = 3, iters = 10)
      .as[(Int, Int, Double, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val dist = Pca.topComponentsDistributed(spark, cov, 12, k = 3, iters = 10)
      .as[(Int, Int, Double, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(local == dist, s"deflation distributed/local drift:\n${
      local.zip(dist).filter(p => p._1 != p._2).take(5)}")
    // eigenvalues strictly descend across deflation steps
    val eigs = local.groupBy(_._1).toSeq.sortBy(_._1).map(_._2.head._4)
    assert(eigs == eigs.sorted.reverse && eigs.distinct.size == eigs.size,
      s"eigenvalues not descending: $eigs")
    // successive components near-orthogonal (quantized arithmetic: ~1e-6)
    val byComp = local.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    for (a <- 0 until 3; b <- a + 1 until 3) {
      val dot = byComp(a).zip(byComp(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(dot) < 1e-4, s"components $a,$b not orthogonal: $dot")
    }
  }

  test("dhash64: cross-resolution twins land at small Hamming distance, distinct patterns far") {
    import graft.llm.Multimodal
    val base = (0L until 50L).map(k => (k, 2)).toDF("seed", "scale")
    val twin = (0L until 50L).map(k => (k, 4)).toDF("seed", "scale")
    def hashes(df: org.apache.spark.sql.DataFrame) =
      Multimodal.dhash64(Multimodal.syntheticBlockPng(df, "seed", "scale"), "content")
        .select($"seed", $"dhash", $"dhash_real").as[(Long, Long, Boolean)].collect()
    val hb = hashes(base); val ht = hashes(twin)
    assert(hb.forall(_._3) && ht.forall(_._3), "real decode expected")
    val mb = hb.map(r => r._1 -> r._2).toMap
    val planted = ht.map(r => java.lang.Long.bitCount(mb(r._1) ^ r._2))
    info(s"planted Hamming: max=${planted.max} mean=${planted.sum / 50.0}")
    assert(planted.max <= 8, s"cross-resolution twin drifted: max Hamming ${planted.max}")
    // distinct patterns: pairwise distances concentrate near 32 (random)
    val cross = for (i <- 0 until 20; j <- (i + 1) until 20)
      yield java.lang.Long.bitCount(mb(i.toLong) ^ mb(j.toLong))
    info(s"cross-pattern Hamming: min=${cross.min} mean=${cross.sum.toDouble / cross.size}")
    assert(cross.min > 12, s"distinct patterns too close: min Hamming ${cross.min}")
  }

  test("weightedReservoirPerKey: heavy weights dominate the sample; exact size per group") {
    val df = (0L until 1000L).map(i =>
      (i, if (i < 10) "g1" else "g1", if (i < 10) 100.0 else 0.1))
      .toDF("id", "g", "w")
    val got = graft.llm.Sampling.weightedReservoirPerKey(df, "g", "id", $"w", 5)
      .select("id").as[Long].collect().toSet
    assert(got.size == 5)
    // A-ES: P(heavy in top) ≈ 1; with 10 heavy rows at 1000× weight the
    // top-5 is essentially all-heavy (deterministic given the hash-u draw)
    assert(got.count(_ < 10) >= 4, s"heavy rows underrepresented: $got")
    // reproducible: same input → identical sample
    val again = graft.llm.Sampling.weightedReservoirPerKey(df, "g", "id", $"w", 5)
      .select("id").as[Long].collect().toSet
    assert(again == got)
  }

  test("foldHomoglyphs: confusable-substituted text folds back; fingerprint pairs twins") {
    val t = graft.llm.TextAnalysis
    val df = Seq(
      (1L, "the quick brown fox"),
      // Cyrillic о/е/а substituted (bytes differ, looks identical)
      (2L, "the quick brоwn fоx".replace('e', 'е').replace('a', 'а')),
      (3L, "a different sentence")).toDF("id", "text")
    val fp = df.select($"id", t.fingerprint(t.foldHomoglyphs($"text")).as("f"),
        t.fingerprint($"text").as("plain"))
      .as[(Long, String, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(fp(1L)._1 == fp(2L)._1, "folded fingerprints must pair the twins")
    assert(fp(1L)._2 != fp(2L)._2, "plain fingerprints must differ (the evasion works)")
    assert(fp(1L)._1 != fp(3L)._1, "distinct text stays distinct")
  }

  test("Dsir: target-typical docs outweigh raw-typical; weight is per-token mean") {
    val raw = Seq((1L, "alpha alpha beta"), (2L, "gamma gamma delta"),
      (3L, "alpha gamma")).toDF("doc_id", "text")
    val target = Seq((100L, "alpha alpha alpha beta")).toDF("doc_id", "text")
    val w = graft.llm.Dsir.importanceWeights(raw, target, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toList.sortBy(_._1)
    val byId = w.map(r => r._1 -> r._3).toMap
    // doc1 is made of target-frequent tokens, doc2 of target-absent ones.
    assert(byId(1L) > byId(3L) && byId(3L) > byId(2L), w.toString)
    assert(w.map(r => (r._1, r._2)) == List((1L, 3L), (2L, 3L), (3L, 2L)))
  }
}
