package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only 10× scale soak of the candidate-capped dedup/ANN operators
  * (VERDICT r3 #1): synthesizes a ~sf1 corpus from sf0.1 by key-offset
  * copies — WITHOUT touching /root/testdata — and times each operator at
  * both scales to prove candidate sets don't blow up super-linearly.
  *
  * Copy construction keeps the duplicate structure LINEAR (10× docs →
  * 10× near-dup pairs), because a naive 10× copy would make every doc a
  * 10-way exact-dup group (quadratic pair growth — a different corpus,
  * not a bigger one):
  *  - documents: copy i injects a copy-specific tag token every 3 words,
  *    so EVERY word-3-gram shingle of copy i contains a tag ≠ copy k's —
  *    cross-copy jaccard ≈ 0 while within-copy planted near-dups are
  *    preserved verbatim;
  *  - embeddings: copy i applies a per-copy diagonal ±1 sign-flip (an
  *    orthogonal transform — within-copy cosines are preserved EXACTLY,
  *    so planted near-dup pairs survive), with patterns differing in
  *    ~3/8 of dims between copies → cross-copy cosine ≈ 0.25, far below
  *    the 0.99 thresholds.
  *
  * Usage: runMain graft.tools.ScaleSoak [soakDir] [sfDir]
  */
object ScaleSoak {
  def main(args: Array[String]): Unit = {
    val soakDir = args.headOption.getOrElse("/tmp/graft_soak/sf1")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    // dev-only family filter: args(2) ∈ {docs, scd, events, cc, all} —
    // re-running one family after a substrate change must not pay the
    // whole soak
    val family = if (args.length > 2) args(2) else "all"
    def fam(name: String): Boolean = family == "all" || family == name
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def time[T](name: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
      val r = f
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[soak] $name%-34s wall=$w%8.2f cpu=${(osBean.getProcessCpuTime - c0) / 1e9}%8.2f")
      (r, w)
    }

    // ── synthesize sf~1 once ────────────────────────────────────────────
    val copies = 10
    if (!new java.io.File(s"$soakDir/documents.parquet").exists()) {
      val docs = graft.tables.Tables.documents(spark, sfDir)
      val docCopies = (0 until copies).map { i =>
        if (i == 0) docs
        else docs
          .withColumn("doc_id", $"doc_id" + i * 10000000L)
          .withColumn("text", regexp_replace($"text", "((\\S+ ){3})", s"$$1zq${i}tag "))
      }
      docCopies.reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite").parquet(s"$soakDir/documents.parquet")

      val emb = graft.tables.Tables.embeddings(spark, sfDir)
      val embCopies = (0 until copies).map { i =>
        if (i == 0) emb
        else emb
          .withColumn("vec_id", $"vec_id" + i * 10000000L)
          .withColumn("embedding", transform($"embedding", (x, j) =>
            when(pmod(j * 37 + lit(i * 13), lit(4)) === 0, -x).otherwise(x)))
      }
      embCopies.reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite").parquet(s"$soakDir/embeddings.parquet")
    }

    def run(tag: String, docs: DataFrame, emb: DataFrame): Map[String, Double] = {
      println(s"── $tag: docs=${docs.count()}, vectors=${emb.count()}")
      val embD = emb.select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
        .localCheckpoint()
      val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      def t(name: String)(f: => Long): Unit = {
        val (rows, w) = time(s"$tag/$name")(f)
        println(s"[soak]   rows=$rows")
        results(name) = w
      }
      t("minhash_pairs") {
        graft.llm.Dedup.minhashNearDupPairs(docs, "doc_id", "text", 0.5).count()
      }
      t("incremental_index") {
        val work = java.nio.file.Files.createTempDirectory("soak-mhidx").toString
        val idx = new graft.llm.MinHashIndex(s"$work/idx")
        idx.build(spark, docs.filter($"doc_id" % 2 === 0), "doc_id", "text")
        idx.probe(spark, docs.filter($"doc_id" % 2 === 1), "doc_id", "text", 0.5).count()
      }
      t("ppjoin") {
        graft.llm.Dedup.prefixJaccardPairs(docs, "doc_id", "text", threshold = 0.7).count()
      }
      t("connected_components") {
        val pairs = graft.llm.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5)
        graft.llm.Dedup.connectedComponents(pairs, "d1", "d2").count()
      }
      t("streaming_dedup") {
        val work = java.nio.file.Files.createTempDirectory("soak-sdedup").toString
        docs.filter($"doc_id" % 2 === 0).coalesce(4).write.parquet(s"$work/src/f1")
        docs.filter($"doc_id" % 2 === 1).coalesce(4).write.parquet(s"$work/src/f2")
        val t0 = System.currentTimeMillis() - 120000
        for ((d, tm) <- Seq(("f1", t0), ("f2", t0 + 60000));
             f <- new java.io.File(s"$work/src/$d").listFiles())
          f.setLastModified(tm)
        val cfg = graft.streaming.AutoIngest.Config(s"$work/src/*", s"$work/schema",
          s"$work/ck", maxFilesPerTrigger = Some(4))
        graft.llm.StreamingCorpusDedup.run(spark, cfg, s"$work/idx", s"$work/kept")
        graft.llm.StreamingCorpusDedup.readKept(spark, s"$work/kept").count()
      }
      t("semantic_dedup") {
        graft.llm.Similarity.semanticDedup(embD, "vec_id", "v", k = 8, threshold = 0.99).count()
      }
      t("cosine_neardup_pairs") {
        graft.llm.Similarity.simhashCosinePairs(embD, "vec_id", "v", threshold = 0.99).count()
      }
      t("ann_lsh_multitable") {
        // the recall-floor setting (planes=4, tables=16; LlmOpsSpec pins
        // ≥0.8 recall@10 here). The query set is PINNED to the base copy
        // (fixed 50 queries at any corpus size) so the row isolates the
        // per-query cost curve: candidates ≈ tables·n/2^planes per query
        // — linear in corpus size at fixed params (production raises
        // numPlanes ~log n to hold the candidate FRACTION constant)
        graft.llm.Similarity.lshTopK(
          embD.filter(col("vec_id") < 5000 && col("vec_id") % 100 === 0),
          embD, "vec_id", "v",
          k = 10, numPlanes = 4, numTables = 16).count()
      }
      t("ann_lsh_clustered") {
        // the CLUSTERED regime (LlmOpsSpec pins recall@10 ≥0.9 here at
        // HALF the uniform fixture's tables): synthesize a 16-center
        // Gaussian mixture sized to this tag's corpus so the row tracks
        // the candidate-cost curve on real-shaped data
        val n = embD.count().toInt
        val mix = spark.range(n).select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(63)), j =>
            sin(pmod(col("id"), lit(16)) * 7 + j * 13) +
              sin(col("id") * 37 + j * 101) * 0.5).as("v"))
          .localCheckpoint()
        graft.llm.Similarity.lshTopK(
          mix.filter(col("vec_id") < 50), mix, "vec_id", "v",
          k = 10, numPlanes = 4, numTables = 8).count()
      }
      t("bpe_train_capped") {
        // vocab-scale trainer (VERDICT r5 #4): one distributed word-count
        // + capped local fit — must be ~flat at 10× corpus (the merge
        // loop never sees corpus size, only the word-count agg does)
        graft.llm.BpeTrainer.trainCapped(docs, "text", numMerges = 32,
          vocabCap = 50000).count()
      }
      t("winnowed_dedup") {
        // the scale path: row-local selection, only ~2n/(w+1) fingerprints
        // shuffle — compare against substring_dedup's full-gram exchange
        val fps = graft.llm.SubstringDedup
          .winnowedFingerprints(docs, "doc_id", "text", 40, 10)
        fps.groupBy(col("h")).agg(count(lit(1)).as("c"))
          .filter(col("c") >= 2).count()
      }
      t("substring_dedup") {
        // exact span detection is Θ(total chars) rows through one
        // gram-keyed exchange — must stay ~linear at 10× corpus (the
        // tag-injected copies keep cross-copy 40-grams distinct, so the
        // duplicated-gram set also grows 10×, not 100×)
        graft.llm.SubstringDedup.duplicatedSpans(docs, "doc_id", "text", 40).count()
      }
      t("pq_train_encode_adc") {
        val cents = graft.llm.ProductQuantizer.train(emb, "vec_id", "embedding", m = 16, iters = 2)
        val codes = graft.llm.ProductQuantizer.encode(emb, cents, "vec_id", "embedding", m = 16)
        graft.llm.ProductQuantizer.adcTopK(
          emb.filter($"vec_id" < 100), emb, cents, codes, "vec_id", "embedding",
          k = 1, m = 16, rerank = 100).count()
      }
      t("segment_dedup") {
        // cost = one segment-keyed count + one join; ~n/W segment rows
        graft.llm.SegmentDedup.segmentDedup(docs, "doc_id", "text", 4)
          .filter(col("n_dropped") > 0).count()
      }
      t("nb_classifier") {
        // training = two vocab-bounded aggs; scoring = |labels|× token rows
        val train = docs.filter(col("doc_id") % 5 =!= 0)
        val test = docs.filter(col("doc_id") % 5 === 0)
        graft.llm.NaiveBayes.trainPredict(train, test, "doc_id", "text", "lang").count()
      }
      t("dsir_weights") {
        // two LM count aggs + one token-keyed scoring join over raw
        graft.llm.Dsir.importanceWeights(docs,
          docs.filter(col("lang") === "zh"), "doc_id", "text").count()
      }
      t("cdc_chunk_dedup") {
        // row-local O(n·w) hash kernel + one chunk-keyed count
        graft.llm.SubstringDedup.cdcDedupReport(
          docs.repartition(32), "doc_id", "text", 8, 32)
          .filter(col("n_dup_chunks") > 0).count()
      }
      t("textrank") {
        // vocab-keyed joins; corpus size only affects the edge count pass
        graft.llm.TextRank.pageRank(
          graft.llm.TextRank.cooccurrenceEdges(docs, "doc_id", "text"), 5).count()
      }
      results.toMap
    }

    val small = if (!fam("docs")) Map.empty[String, Double] else run("sf0.1",
      graft.tables.Tables.documents(spark, sfDir),
      graft.tables.Tables.embeddings(spark, sfDir))
    val big = if (!fam("docs")) Map.empty[String, Double] else run("sf1",
      spark.read.parquet(s"$soakDir/documents.parquet"),
      spark.read.parquet(s"$soakDir/embeddings.parquet"))

    // ── CDC core at 10×: bucketed SCD1 merge ──────────────────────────────
    // The BucketedSnapshotTable contract is merge IO = O(affected buckets),
    // and production sizing grows numBuckets with the table (4096 at
    // 100 TB) so bucket SIZE stays constant. Under that sizing a
    // trickle-CDC batch (10 keys → ≤10 buckets) must cost the SAME at any
    // table size — the flat-merge property that makes the format viable at
    // 100 TB. The full build is O(table) and should scale ~linearly.
    def scdSoak(tag: String, mult: Int): Map[String, Double] = {
      val base = graft.tables.Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
      // offset BOTH keys: 10× orders means more customers too, not
      // 10×-longer per-customer histories
      val orders =
        if (mult == 1) base
        else (0 until mult).map(i =>
          base.withColumn("o_orderkey", col("o_orderkey") + i * 100000000L)
            .withColumn("o_custkey", col("o_custkey") + i * 100000000L))
          .reduce(_ unionByName _)
      val work = java.nio.file.Files.createTempDirectory(s"soak-scd").toString
      val t = new graft.tables.BucketedSnapshotTable(s"$work/t",
        numBuckets = 64 * mult, keys = Seq("o_orderkey"))
      val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      val (_, buildW) = time(s"$tag/bucketed_build") {
        t.scd1Merge(spark, orders.withColumn("op_seq", lit(1)), "op_seq")
      }
      results("bucketed_build") = buildW
      val batch = orders.limit(10)
        .withColumn("o_totalprice", col("o_totalprice") + 1.0)
        .withColumn("op_seq", lit(2))
        .localCheckpoint() // pin the batch: limit() is otherwise re-planned
      val (touched, mergeW) = time(s"$tag/bucketed_merge_10keys") {
        t.scd1Merge(spark, batch, "op_seq")
      }
      println(s"[soak]   buckets touched=${touched.size} of ${64 * mult}")
      results("bucketed_merge_10keys") = mergeW
      // CDF between the build and the trickle merge: manifest diff says
      // ≤10 buckets changed, so the feed must be flat in table size
      val (nChanges, cdfW) = time(s"$tag/bucketed_changes_trickle") {
        t.changes(spark, 1, 2, withChangedColumns = true).count()
      }
      println(s"[soak]   cdf rows=$nChanges")
      results("bucketed_changes_trickle") = cdfW
      // point lookup: driver-side bucket hash → ≤10 bucket dirs scanned;
      // flat in table size under production bucket sizing
      val probe = batch.select("o_orderkey")
      val (nHit, lookW) = time(s"$tag/bucketed_point_lookup") {
        t.readKeys(spark, probe).count()
      }
      println(s"[soak]   lookup rows=$nHit")
      results("bucketed_point_lookup") = lookW
      // predicate UPDATE: the discovery scan is O(table) (column-pruned
      // count) but the rewrite is O(matched buckets) — expect ~linear
      // discovery dominated by the scan, flat rewrite
      val (un, updW) = time(s"$tag/bucketed_update_pred") {
        t.update(spark, col("o_orderkey") % 1000000L === 7L,
          Seq("o_totalprice" -> (col("o_totalprice") + 2.0)))
      }
      println(s"[soak]   update touched=${un._1.size} rows=${un._2}")
      results("bucketed_update_pred") = updW

      // r9: ANALYZE backfill is O(table) (~linear — one column-pruned scan
      // per batch dir), after which a range UPDATE isolating a recent
      // merge's values is stats-pruned — discovery FLAT in table size
      // (contrast with bucketed_update_pred's O(table) discovery above)
      val ta = new graft.tables.BucketedSnapshotTable(s"$work/t",
        numBuckets = 64 * mult, keys = Seq("o_orderkey"),
        statsCols = Seq("o_orderdate"))
      val (_, anW) = time(s"$tag/bucketed_analyze") { ta.analyze(spark) }
      results("bucketed_analyze") = anW
      // o_orderdate in the testdata is TIMESTAMP_NTZ — keep both the
      // merged values and the predicate literal in that type so the
      // folded micros line up with the stats quantization
      ta.scd1Merge(spark, batch
        .withColumn("o_orderdate", lit("2100-01-01 00:00:00").cast("timestamp_ntz"))
        .withColumn("op_seq", lit(3)), "op_seq")
      val (ur, updPW) = time(s"$tag/bucketed_update_stats_pruned") {
        ta.update(spark,
          col("o_orderdate") >= lit("2099-12-01 00:00:00").cast("timestamp_ntz"),
          Seq("o_totalprice" -> (col("o_totalprice") + 3.0)))
      }
      println(s"[soak]   stats-pruned update touched=${ur._1.size} rows=${ur._2}")
      results("bucketed_update_stats_pruned") = updPW

      // r9: OPTIMIZE moves every bucket dir; contentV keeps a CDF window
      // spanning it FLAT (dir comparison would re-read the whole table)
      val vBefore = ta.currentVersion(spark).get
      val (_, optW) = time(s"$tag/bucketed_optimize") { ta.compact(spark) }
      results("bucketed_optimize") = optW
      ta.scd1Merge(spark, batch.withColumn("op_seq", lit(4)), "op_seq")
      val vAfter = ta.currentVersion(spark).get
      val (nCo, coW) = time(s"$tag/bucketed_changes_post_optimize") {
        ta.changes(spark, vBefore, vAfter).count()
      }
      println(s"[soak]   post-optimize cdf rows=$nCo")
      results("bucketed_changes_post_optimize") = coW

      // r9: exactly-once mirror — after the O(table) bootstrap, a 10-key
      // window apply (manifest-pruned diff + ≤10-bucket target merge) must
      // be flat in table size
      val mirror = new graft.tables.BucketedSnapshotTable(s"$work/m",
        numBuckets = 64 * mult, keys = Seq("o_orderkey"))
      ta.applyChangesTo(spark, s"$work/ck", mirror, "soak") // bootstrap, untimed
      ta.scd1Merge(spark, batch
        .withColumn("o_totalprice", col("o_totalprice") + 9.0)
        .withColumn("op_seq", lit(5)), "op_seq")
      val (_, mirW) = time(s"$tag/bucketed_mirror_window") {
        ta.applyChangesTo(spark, s"$work/ck", mirror, "soak")
      }
      results("bucketed_mirror_window") = mirW

      // r9: per-batch Bloom sidecars — the point-predicate complement.
      // o_custkey is a NON-key column (bucketed by o_orderkey), so its
      // [min,max] spans the domain in every file and range stats prune
      // nothing; the bloom probe keeps only the ~|orders-of-one-customer|
      // files. Backfill is O(table); the point UPDATE must be flat.
      val tb = new graft.tables.BucketedSnapshotTable(s"$work/t",
        numBuckets = 64 * mult, keys = Seq("o_orderkey"),
        bloomCols = Seq("o_custkey"))
      val (_, abW) = time(s"$tag/bucketed_analyze_bloom") {
        tb.analyze(spark, onlyMissing = true)
      }
      results("bucketed_analyze_bloom") = abW
      val probeCust = base.select("o_custkey").head.getLong(0)
      val (ub, blW) = time(s"$tag/bucketed_update_bloom_point") {
        tb.update(spark, col("o_custkey") === lit(probeCust),
          Seq("o_totalprice" -> (col("o_totalprice") + 4.0)))
      }
      println(s"[soak]   bloom-point update touched=${ub._1.size} rows=${ub._2}")
      results("bucketed_update_bloom_point") = blW
      // the read-side lookup rides the same probe: flat in table size
      val (nL, prW) = time(s"$tag/bucketed_read_bloom_point") {
        tb.readPrunedPoint(spark, "o_custkey", probeCust)
          .filter(col("o_custkey") === probeCust).count()
      }
      println(s"[soak]   bloom-point read rows=$nL")
      results("bucketed_read_bloom_point") = prW
      // r10: consolidated per-dir blob — the probe's driver IO is a READ
      // COUNT of O(batch dirs), not O(files): analyze() above collapsed
      // each dir's per-file sidecars into one offset-indexed blob, so this
      // row stays ~2 reads per dir as buckets scale 64 → 640
      graft.tables.BloomIndex.probeReads.set(0)
      val (kc, _) = tb.pruneStats(spark, col("o_custkey") === lit(probeCust))
      val ioReads = graft.tables.BloomIndex.probeReads.get
      val nDirs = tb.manifest(spark).values.toSet.size
      println(s"[soak]   bloom probe IO reads=$ioReads over $nDirs dirs (kept $kc files)")
      results("bucketed_bloom_probe_io_reads") = ioReads.toDouble

      // r9: plain-dim mirror with FILE-LEVEL window pruning — an
      // append-mostly dim's `_files_v<N>` manifests share prior files, so
      // the window diff reads only the appended files: flat in dim size
      // (the pre-r9 cost was two full snapshot reads per window)
      val dim = new graft.tables.SnapshotTable(s"$work/dim")
      dim.write(spark, orders)                     // O(dim) seed, untimed
      val pm = new graft.tables.BucketedSnapshotTable(s"$work/pm",
        numBuckets = 64 * mult, keys = Seq("o_orderkey"))
      dim.applyChangesTo(spark, Seq("o_orderkey"), s"$work/pck", pm, "psoak")
      dim.append(spark, batch.drop("op_seq").withColumn("o_custkey", lit(1L))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .withColumn("o_orderkey", col("o_orderkey") + 900000000L))
      val (_, pmW) = time(s"$tag/plain_mirror_append_window") {
        dim.applyChangesTo(spark, Seq("o_orderkey"), s"$work/pck", pm, "psoak")
      }
      results("plain_mirror_append_window") = pmW

      // ── r11: incremental MV — bootstrap is O(source), the trickle
      //    refresh (one customer's orders change → ONE group) must be
      //    FLAT in source size: the feed is manifest-pruned and the state
      //    merge rewrites ≤1 bucket
      val msrc = new graft.tables.BucketedSnapshotTable(s"$work/msrc",
        numBuckets = 64 * mult, keys = Seq("o_orderkey"))
      msrc.scd1Merge(spark, orders
        .withColumn("price", col("o_totalprice").cast("decimal(18,2)"))
        .select("o_orderkey", "o_custkey", "price")
        .withColumn("op_seq", lit(1L)), "op_seq") // untimed O(table) seed
      val mv = graft.tables.MaterializedAggView.create(spark, s"$work/mv",
        s"$work/msrc", sourceKeys = Nil, groupBy = Seq("o_custkey"),
        aggs = Seq(graft.tables.MaterializedAggView.Agg("count", None, "n"),
          graft.tables.MaterializedAggView.Agg("sum", Some("price"), "rev")),
        numBuckets = 64 * mult)
      val (_, bootW) = time(s"$tag/mv_bootstrap") { mv.refresh(spark) }
      results("mv_bootstrap") = bootW
      // r14 (verdict #2): every MV trickle row times THREE samples and
      // records the MEDIAN — the r13 100× mvs_refresh_dim_trickle 1.40×
      // datapoint was a single sample, and medians separate sandbox
      // noise from a real super-linear planning term. Each sample folds
      // its own fresh window, so every round does identical-shape work.
      def median3(name: String)(prepare: Int => Unit)(timedBody: => Unit): Double = {
        val ws = (0 until 3).map { i =>
          prepare(i)
          val (_, w) = time(s"$name#$i")(timedBody)
          w
        }.sorted
        println(f"[soak] $name%-34s median=${ws(1)}%8.2f over 3 samples")
        ws(1)
      }
      val cust = orders.agg(min(col("o_custkey"))).head.getLong(0)
      results("mv_refresh_trickle") = median3(s"$tag/mv_refresh_trickle") { i =>
        msrc.scd1Merge(spark, orders.filter(col("o_custkey") === cust).limit(10)
          .withColumn("price", col("o_totalprice").cast("decimal(18,2)") + lit(1 + i))
          .select("o_orderkey", "o_custkey", "price")
          .withColumn("op_seq", lit(2L + i)).localCheckpoint(), "op_seq")
      } { mv.refresh(spark) }
      // the same window through the STREAMING source: fixed streaming
      // machinery + the manifest-pruned feed — flat in table size
      val (_, strW) = time(s"$tag/cdf_stream_window") {
        val q = spark.readStream.format("graft-cdf")
          .option("path", s"$work/msrc").option("startingVersion", "2").load()
          .writeStream.format("parquet").option("path", s"$work/cdfsink")
          .option("checkpointLocation", s"$work/cdfck")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      results("cdf_stream_window") = strW

      // ── r11: hive partition pruning composed with stats skipping — the
      //    kept-file FRACTION stays constant as files grow linearly, and
      //    the pruned read touches only one year's top price range
      val pt = new graft.tables.SnapshotTable(s"$work/pt")
      pt.writeIndexed(spark, orders.withColumn("o_year", year(col("o_orderdate"))),
        statsCols = Seq("o_totalprice"), clusterBy = Seq("o_totalprice"),
        clusterPartitions = 8 * mult, partitionByCols = Seq("o_year")) // untimed seed
      val (pRows, ppW) = time(s"$tag/partitioned_pruned_read") {
        org.apache.spark.sql.GraftColumnBridge.graftSql(spark,
          s"SNAPSHOT '$work/pt' WHERE o_year = 1997 AND o_totalprice >= 490000")
          .count()
      }
      val (keptP, totP) = pt.pruneStats(spark,
        col("o_year") === 1997 && col("o_totalprice") >= 490000)
      println(s"[soak]   partitioned read rows=$pRows kept=$keptP/$totP files")
      results("partitioned_pruned_read") = ppW

      // ── r11: incremental JOIN MV — the fact trickle folds through a
      //    bucket-pruned dim lookup (leg 1); a dim attribute flip reads
      //    the OLD fact through the bloom-pruned IN-list leg (leg 2,
      //    riding tb's o_custkey sidecars): both must be FLAT in fact
      //    size after the untimed O(join) bootstrap
      val agg = graft.tables.MaterializedAggView.Agg
      val jdim = new graft.tables.BucketedSnapshotTable(s"$work/jdim", 16,
        Seq("o_custkey"))
      jdim.scd1Merge(spark, orders.select("o_custkey").distinct()
        .withColumn("seg", col("o_custkey") % 7)
        .withColumn("dseq", lit(1L)), "dseq") // untimed dim seed
      val jmv = graft.tables.MaterializedJoinAggView.create(spark, s"$work/jmv",
        s"$work/t", Nil, s"$work/jdim", Nil, Seq("o_custkey"), Seq("seg"),
        Seq(agg("count", None, "n"), agg("sum", Some("o_totalprice"), "rev")),
        numBuckets = 16)
      jmv.refresh(spark) // untimed O(join) bootstrap
      results("mvj_refresh_fact_trickle") =
        median3(s"$tag/mvj_refresh_fact_trickle") { i =>
          tb.scd1Merge(spark, batch.withColumn("op_seq", lit(9L + i)), "op_seq")
        } { jmv.refresh(spark) }
      results("mvj_refresh_dim_trickle") =
        median3(s"$tag/mvj_refresh_dim_trickle") { i =>
          jdim.scd1Merge(spark, orders.select("o_custkey").distinct()
            .filter(col("o_custkey") === lit(probeCust))
            .withColumn("seg", lit(99L + i)).withColumn("dseq", lit(2L + i))
            .localCheckpoint(), "dseq")
        } { jmv.refresh(spark) }

      // ── r11b: incremental STAR MV (3-way) — the telescoping identity's
      //    legs at 10×: a fact trickle folds through TWO bucket-pruned
      //    dim lookups; a dim flip reads the old fact IN-list-pruned plus
      //    the OTHER dim point-read. Both must be flat in fact size after
      //    the untimed O(star join) bootstrap (the join rows above cover
      //    the same mechanics pairwise; these pin the N-way composition)
      val sdima = new graft.tables.BucketedSnapshotTable(s"$work/sdima", 16,
        Seq("o_custkey"))
      sdima.scd1Merge(spark, orders.select("o_custkey").distinct()
        .withColumn("seg", col("o_custkey") % 7)
        .withColumn("dseq", lit(1L)), "dseq") // untimed dim seed
      val sdimb = new graft.tables.BucketedSnapshotTable(s"$work/sdimb", 16,
        Seq("o_custkey"))
      sdimb.scd1Merge(spark, orders.select("o_custkey").distinct()
        .withColumn("tier", col("o_custkey") % 5)
        .withColumn("dseq", lit(1L)), "dseq") // untimed dim seed
      val smv = graft.tables.MaterializedStarAggView.create(spark, s"$work/smv",
        s"$work/t", Nil, Seq(
          graft.tables.MaterializedStarAggView.Dim(s"$work/sdima", Nil, Seq("o_custkey")),
          graft.tables.MaterializedStarAggView.Dim(s"$work/sdimb", Nil, Seq("o_custkey"))),
        Seq("seg", "tier"),
        Seq(agg("count", None, "n"), agg("sum", Some("o_totalprice"), "rev")),
        numBuckets = 16)
      smv.refresh(spark) // untimed O(star join) bootstrap
      results("mvs_refresh_fact_trickle") =
        median3(s"$tag/mvs_refresh_fact_trickle") { i =>
          tb.scd1Merge(spark, batch.withColumn("op_seq", lit(20L + i)), "op_seq")
        } { smv.refresh(spark) }
      results("mvs_refresh_dim_trickle") =
        median3(s"$tag/mvs_refresh_dim_trickle") { i =>
          sdima.scd1Merge(spark, orders.select("o_custkey").distinct()
            .filter(col("o_custkey") === lit(probeCust))
            .withColumn("seg", lit(98L + i)).withColumn("dseq", lit(2L + i))
            .localCheckpoint(), "dseq")
        } { smv.refresh(spark) }
      results.toMap
    }
    // r13: optional multiplier list (args(3), default "1,10") — the
    // verdict-#6 two-decade datapoint runs `scd 10,100` to pin the MV
    // trickle rows flat across 10× AND 100× (summary table still prints
    // the 1-vs-10 ratio when both are present; other multipliers report
    // through their [soak] rows)
    val scdMults: Seq[Int] =
      if (args.length > 3) args(3).split(",").map(_.trim.toInt).toSeq
      else Seq(1, 10)
    val scdRuns: Map[Int, Map[String, Double]] =
      if (fam("scd")) scdMults.map(m =>
        m -> scdSoak(if (m == 1) "sf0.1" else s"${m}x", m)).toMap
      else Map.empty
    val scdSmall = scdRuns.getOrElse(1, Map.empty[String, Double])
    val scdBig = scdRuns.getOrElse(10, Map.empty[String, Double])

    // ── Events-analytics family at 10× (the reference's own operators) ───
    // Copies offset BOTH event_id and user_id: 10× users with unchanged
    // per-user event counts, so per-user windows/sessions/funnels see the
    // same partition sizes and only the number of keys grows — the shape
    // a 10× production corpus actually has (more users, not 10×-longer
    // histories). All four are per-key window/join/agg plans that should
    // scale ~linearly.
    def eventsSoak(tag: String, mult: Int): Map[String, Double] = {
      val base = graft.tables.Tables.events(spark, sfDir)
      val ev = (if (mult == 1) base
        else (0 until mult).map(i => base
          .withColumn("event_id", col("event_id") + i * 100000000L)
          .withColumn("user_id", col("user_id") + i * 100000000L))
          .reduce(_ unionByName _)).localCheckpoint()
      val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      def t(name: String)(f: => Long): Unit = {
        val (rows, w) = time(s"$tag/$name")(f)
        println(s"[soak]   rows=$rows")
        results(name) = w
      }
      t("asof_join") {
        val e = ev.select(col("event_id"), col("user_id"), col("ts"))
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
            col("event_id").as("p_event_id"))
        graft.plans.AsOfJoin.asofJoin(e, p, "user_id", "p_user", "ts", "p_ts").count()
      }
      t("funnel") {
        graft.ops.Funnel.funnel(ev, "user_id", "event_type", "ts",
          Seq("view", "click", "purchase")).count()
      }
      t("sessionize") {
        graft.ops.Funnel.sessionize(ev, "user_id", "ts", "event_id", 3600L)
          .groupBy(col("user_id"), col("session")).agg(count(lit(1))).count()
      }
      t("latest_by_key") {
        graft.ops.Relational.latestByKey(ev, Seq("user_id"), col("ts"),
          Seq(col("event_id"))).count()
      }
      results.toMap
    }
    val evSmall = if (fam("events")) eventsSoak("sf0.1", 1) else Map.empty[String, Double]
    val evBig = if (fam("events")) eventsSoak("sf1", 10) else Map.empty[String, Double]

    // ── connected components at 10× and 100× planted edges ──────────────
    // Pins the cost bound documented on Dedup.connectedComponents: each
    // round is ONE bounded shuffle of O(|E|) rows and rounds = component
    // diameter. The planted graph fixes the diameter (4-node stars — the
    // near-clique shape real near-dup clusters have), so total cost must
    // stay ~LINEAR in |E| through 100×. (The docs-derived soak above
    // conflates edge growth with round growth; this isolates |E|.)
    def ccSoak(mult: Int): Double = {
      val E = 30000L * mult
      val edges = spark.range(E).select(
          ((col("id") / 3) * 4).as("src"),
          ((col("id") / 3) * 4 + (col("id") % 3) + 1).as("dst"))
        .localCheckpoint()
      val (comps, w) = time(s"${mult}x/cc_planted_${E}e") {
        graft.llm.Dedup.connectedComponents(edges, "src", "dst").count()
      }
      println(s"[soak]   labeled nodes=$comps")
      w
    }
    val (cc1, cc10, cc100) =
      if (fam("cc")) (ccSoak(1), ccSoak(10), ccSoak(100)) else (0.0, 0.0, 0.0)
    println(f"[soak] planted-CC linearity: 10x=${cc10 / cc1}%.2f 100x=${cc100 / cc1}%.2f (vs 10/100 if perfectly linear, minus fixed per-round overhead)")

    println(f"${"operator"}%-24s ${"sf0.1"}%8s ${"sf1"}%8s ${"ratio"}%7s")
    (small.keys ++ scdSmall.keys ++ evSmall.keys).foreach { k =>
      val s = small.getOrElse(k, scdSmall.getOrElse(k, evSmall(k)))
      val b = big.getOrElse(k, scdBig.getOrElse(k, evBig(k)))
      println(f"$k%-24s $s%8.2f $b%8.2f ${b / s}%7.2f")
    }
    spark.stop()
  }
}
