package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests: the properties that make queries scale
  * (pushdown reaching the scan, dimensions broadcast, top-k never sorting
  * globally, column pruning) are asserted against the optimizer output so
  * a refactor can't silently trade them away. Runs on sf0.001 — plan
  * shape, not data volume, is under test. */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def planOf(q: String): String = {
    val df = SparkEntry.queries(q)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("q2: CDC watermark predicate is pushed into the parquet scan") {
    // Tables.eventsSince filters in raw storage units (nanos) so the scan
    // carries a GreaterThan pushed filter instead of a post-scan cast
    val plan = planOf("q2_cdc_filter")
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThan(ts,"),
      s"watermark filter not pushed:\n${plan.take(2000)}")
  }

  test("SNAPSHOT pruning relation keeps parquet pushdown + column pruning (r10)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("planidx").toString
    val t = new graft.tables.BucketedSnapshotTable(s"$work/t", 8, Seq("k"),
      statsCols = Seq("d"))
    t.scd1Merge(spark, (1 to 80).map(i => (i, 1L, i.toLong, s"v$i", s"w$i"))
      .toDF("k", "seq", "d", "v", "w"), "seq")
    val df = org.apache.spark.sql.GraftColumnBridge
      .graftSql(spark, s"SNAPSHOT '$work/t' WHERE d >= 70")
      .select($"k", $"v")
    val plan = df.queryExecution.executedPlan.toString
    // the file index must not cost us the ordinary parquet goodness: the
    // row filter is still pushed to the scan, and only the referenced
    // columns are read
    assert(plan.contains("PushedFilters: [IsNotNull(d), GreaterThanOrEqual(d,70)"),
      s"filter not pushed through the pruning relation:\n${plan.take(1500)}")
    assert(plan.contains("ReadSchema") && !plan.contains("w#") ||
      "ReadSchema: [^\\n]*".r.findFirstIn(plan).exists(rs =>
        !rs.contains("w:") && rs.contains("v:")),
      s"column pruning lost:\n${plan.take(1500)}")
    assert(plan.contains("*(1)") || plan.contains("WholeStageCodegen"),
      "scan left whole-stage codegen")
    assert(df.as[(Int, String)].collect().toSet ==
      (70 to 80).map(i => (i, s"v$i")).toSet)
  }

  test("q4: star-join dimensions broadcast; fact side never broadcasts") {
    val plan = planOf("q4_star_join")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 3, s"expected >=3 broadcast joins (cu/n/r), got $broadcasts")
    // the lineitem⋈orders leg must be a real distributed join, not BNLJ
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q11: top-k plans as TakeOrderedAndProject (no global sort)") {
    val plan = planOf("q11_topk")
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("q48: selective filters stay below the join; top-k bounded") {
    val plan = planOf("q48_shipping_priority")
    assert(plan.contains("TakeOrderedAndProject"))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate")
      || plan.contains("GreaterThan(l_shipdate"),
      s"lineitem date filter not at the scan:\n${plan.take(3000)}")
  }

  test("q20: column pruning — scan reads only doc_id and text") {
    val df = SparkEntry.queries("q20_token_count")(spark, dir)
    // sparkPlan: the pre-AQE physical plan (AdaptiveSparkPlanExec hides
    // its children from collect() until execution)
    val scans = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val readCols = scans.head.requiredSchema.fieldNames.toSet
    assert(readCols == Set("doc_id", "text"), s"scan reads $readCols")
  }

  test("q5/q6: semi and anti joins plan as semi/anti, not inner+dedup") {
    assert(planOf("q5_semi_join").contains("LeftSemi"))
    assert(planOf("q6_anti_join").contains("LeftAnti"))
  }

  test("q42: as-of join plans the custom sorted-merge operator, no cross product") {
    val plan = planOf("q42_asof_join")
    assert(plan.contains("AsOfJoin"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q115: LATERAL LIMIT decorrelates to WindowGroupLimit, no nested-loop join") {
    val plan = planOf("q115_lateral_topn")
    // the correlated ORDER BY+LIMIT must become a group-limit window (with
    // a map-side partial before the shuffle), never a per-row re-execution
    assert(plan.contains("WindowGroupLimit"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q130/q137: correlated EXISTS/NOT EXISTS decorrelate to semi/anti joins") {
    val p130 = planOf("q130_priority_exists")
    assert(p130.contains("LeftSemi"))
    assert(!p130.contains("CartesianProduct") && !p130.contains("BroadcastNestedLoopJoin"))
    val p137 = planOf("q137_waiting_supplier")
    assert(p137.contains("LeftSemi") && p137.contains("LeftAnti"))
    assert(!p137.contains("CartesianProduct") && !p137.contains("BroadcastNestedLoopJoin"))
  }

  test("binnedRangeJoin ≡ naive non-equi join, and plans as an equi-join (no BNLJ)") {
    import org.apache.spark.sql.functions.col
    val ev = graft.tables.Tables.events(spark, dir).select(col("event_id"), col("value"))
    val iv = spark.range(0, 120).select(col("id").as("iv_id"),
      (col("id") * 3.0).as("lo"), (col("id") * 3.0 + 9.0).as("hi"))
    val binned = graft.ops.Relational.binnedRangeJoin(ev, "value", iv, "lo", "hi", 3.0)
    val naive = ev.join(iv, col("value") >= col("lo") && col("value") < col("hi"))
    assert(binned.select("event_id", "iv_id").collect().toSet ==
      naive.select("event_id", "iv_id").collect().toSet)
    val plan = binned.queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"plan=$plan")
  }

  test("binnedIntervalJoin ≡ naive overlap join, exactly-once per pair, no BNLJ") {
    import org.apache.spark.sql.functions.col
    // events-derived intervals on two grains: [value, value+7) vs [id*2, id*2+5)
    val a = graft.tables.Tables.events(spark, dir)
      .select(col("event_id"), col("value").as("a_lo"), (col("value") + 7.0).as("a_hi"))
    val b = spark.range(0, 150).select(col("id").as("b_id"),
      (col("id") * 2.0).as("b_lo"), (col("id") * 2.0 + 5.0).as("b_hi"))
    val binned = graft.ops.Relational.binnedIntervalJoin(a, "a_lo", "a_hi", b, "b_lo", "b_hi", 4.0)
    val naive = a.join(b, col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi"))
    val got = binned.select("event_id", "b_id").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = naive.select("event_id", "b_id").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.size == got.toSet.size, "pair emitted more than once")
    assert(got.toSet == want.toSet && got.size == want.size)
    val plan = binned.queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("shingle hashing is map-side: a Generate node, no window sort, one exchange (the distinct)") {
    val docs = graft.tables.Tables.documents(spark, dir)
    val plan = graft.llm.Dedup.shingleHashRows(docs, "doc_id", "text")
      .queryExecution.sparkPlan.toString
    assert(plan.contains("Generate"), plan.take(1500))
    assert(!plan.contains("Window"), plan.take(1500))
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected ≤1 exchange (distinct), got $exchanges:\n${plan.take(1500)}")
  }

  test("q236: per-source cap plans as WindowGroupLimit; q237 fuses to one documents scan") {
    val p236 = planOf("q236_domain_caps")
    assert(p236.contains("WindowGroupLimit"), p236.take(2000))
    // all four scalar stages (lang-id, quality, fingerprint, token count)
    // must fuse into a single pass over documents — one scan, no re-read
    val df = SparkEntry.queries("q237_curation_pipeline")(spark, dir)
    val scans = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.size == 1, s"expected 1 documents scan, got ${scans.size}")
  }

  test("similarity verify legs use the array kernel, not a posting re-join") {
    // Verification must stay at |candidates| ROWS: per-doc sorted shingle
    // arrays + codegen'd array_intersect (Vernica/Carey/Li kernel). The
    // posting-relation re-join it replaced expanded each candidate by the
    // doc's full shingle set — 90% of a 390 s ppjoin soak run at 10×
    // scale. Pin the kernel so a refactor can't quietly reintroduce the
    // expansion.
    val docs = graft.tables.Tables.documents(spark, dir)
    for (df <- Seq(
        graft.llm.Dedup.prefixJaccardPairs(docs, "doc_id", "text", 0.7),
        graft.llm.Dedup.minhashNearDupPairs(docs, "doc_id", "text", 0.5))) {
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("array_intersect"), plan.take(1500))
      assert(plan.contains("sort_array"), plan.take(1500))
    }
  }

  test("dynamic partition pruning: selective dim filter prunes fact partitions at runtime") {
    import org.apache.spark.sql.functions.{col, lit, count}
    val work = java.nio.file.Files.createTempDirectory("dpp").toString
    graft.tables.Tables.events(spark, dir)
      .write.partitionBy("event_type").mode("overwrite").parquet(s"$work/fact")
    val fact = spark.read.parquet(s"$work/fact")
    val dim = graft.tables.Tables.events(spark, dir)
      .select(col("event_type"), col("value")).distinct()
      .filter(col("value") > 300) // selective: few event_types survive
    val q = fact.join(dim, Seq("event_type")).agg(count(lit(1)))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"), plan.take(2000))
  }

  test("AQE coalesces over-provisioned shuffle partitions") {
    import org.apache.spark.sql.functions.{count, lit, col}
    val df = graft.tables.Tables.nation(spark, dir)
      .groupBy(col("n_regionkey")).agg(count(lit(1)).as("n"))
    val qe = df.queryExecution
    qe.executedPlan.execute().count() // finalize the adaptive plan
    val plan = qe.executedPlan.toString
    assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"), plan.take(2000))
  }

  test("cached relation re-plans as InMemoryTableScan") {
    val df = graft.tables.Tables.region(spark, dir)
    df.cache()
    try {
      df.count() // materialize
      val again = graft.tables.Tables.region(spark, dir).filter("r_regionkey >= 0")
      assert(again.queryExecution.executedPlan.toString.contains("InMemoryTableScan"))
    } finally df.unpersist()
  }

  test("join strategy hints are honored (shuffle_hash overrides sort-merge)") {
    val o = graft.tables.Tables.orders(spark, dir)
    val li = graft.tables.Tables.lineitem(spark, dir)
    import org.apache.spark.sql.functions.col
    val hinted = li.hint("shuffle_hash")
      .join(o, col("l_orderkey") === col("o_orderkey"))
    assert(hinted.queryExecution.sparkPlan.toString.contains("ShuffledHashJoin"))
  }

  test("whole-stage codegen covers the hot scalar pipelines") {
    // q3's transform stack (upper/trim/regexp_replace/when) must fuse into
    // codegen stages. (q20's higher-order lambdas are CodegenFallback by
    // Spark design — that hot path uses explode+aggregate instead, see
    // Dedup.shingleRows / simhashTable.)
    // AQE reports 0 codegen subtrees before execution — disable it for the
    // explain (plan shape under test, not runtime adaptivity)
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("q3_transforms")(spark, dir)
      val codegen = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
      assert(codegen.contains("WholeStageCodegen subtrees"))
      assert(!codegen.startsWith("Found 0 WholeStageCodegen"), codegen.linesIterator.next())
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("runtime bloom filter: selective dim filter injects might_contain on the fact scan") {
    // Spark's InjectRuntimeFilter turns a selective filter on the build side
    // of a shuffle join into a bloom-filter probe on the big side — at
    // 100 TB this skips most fact partitions before the join. Thresholds
    // are sized for production data; lower them so the sf0.001 plan shows
    // the same shape.
    import org.apache.spark.sql.functions.col
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // the rule only fires for probably-shuffle joins; at sf0.001 the dim
      // side is broadcastable-by-size, which at 100 TB it would not be
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val o = graft.tables.Tables.orders(spark, dir)
        .filter(col("o_orderstatus") === "P").hint("shuffle_hash")
      val li = graft.tables.Tables.lineitem(spark, dir)
      val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"runtime bloom filter not injected:\n${plan.take(3000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed sort-merge join at runtime (no manual salting)") {
    // Relational.saltedJoin is the static answer to skew; AQE's skew-join
    // split is the runtime one. Thresholds shrunk so a ~MB-scale skewed
    // partition triggers the same re-plan a multi-GB one would in
    // production.
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 90% of the left lands on key 0 — one hot shuffle partition
      val left = spark.range(200000)
        .select(when(col("id") % 10 === 0, col("id") % 1000).otherwise(0L).as("k"),
          col("id").as("v"))
      val right = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = left.join(right, "k")
      // execute THIS QueryExecution (count() would build its own): AQE
      // re-plans from runtime shuffle stats and finalizes the plan
      val qe = joined.queryExecution
      qe.executedPlan.execute().count()
      val plan = qe.executedPlan.toString
      assert(plan.contains("skew=true"), s"skew join not split:\n${plan.take(3000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("nested schema pruning: projecting one struct leaf narrows the read schema") {
    import org.apache.spark.sql.functions._
    val work = java.nio.file.Files.createTempDirectory("nestedprune").toString
    graft.tables.Tables.events(spark, dir)
      .select(col("event_id"),
        struct(col("user_id"), col("event_type"),
          struct(col("value"), col("ts")).as("measure")).as("payload"))
      .coalesce(2).write.mode("overwrite").parquet(s"$work/t")
    val df = spark.read.parquet(s"$work/t").select(col("payload.measure.value"))
    val scans = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val schema = scans.head.requiredSchema.catalogString
    assert(schema.contains("value"), schema)
    // the sibling leaves must NOT be read
    assert(!schema.contains("event_type") && !schema.contains("user_id") &&
      !schema.contains("ts"), s"nested pruning failed: $schema")
  }

  test("TopKPairs aggregate == window row_number form under any partitioning") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val spark2 = spark; import spark2.implicits._
    val o = graft.tables.Tables.orders(spark, dir)
    def viaAgg(parts: Int) = o.repartition(parts)
      .groupBy($"o_orderpriority")
      .agg(graft.functions.TopKAgg.topkPairs($"o_totalprice", $"o_orderkey", 5).as("top"))
      .select($"o_orderpriority", explode($"top").as("t"))
      .select($"o_orderpriority", $"t.id", $"t.v")
      .as[(String, Long, Double)].collect().toSet
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey".desc)
    val viaWindow = o.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice".cast("double"))
      .as[(String, Long, Double)].collect().toSet
    // associative merge: 1 partition and 17 partitions agree with the sort
    assert(viaAgg(1) == viaWindow)
    assert(viaAgg(17) == viaWindow)
  }

  test("vec_dot inner product compiles into whole-stage codegen") {
    import org.apache.spark.sql.functions._
    // source must be non-local (a literal relation constant-folds away)
    val df = spark.range(4)
      .select(array(col("id").cast("float"), lit(2f)).as("a"),
        array(lit(3f), lit(4f)).as("b"))
      .select(graft.functions.VectorFunctions.vec_dot(col("a"), col("b")).as("d"))
    val codegen = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(!codegen.startsWith("Found 0 WholeStageCodegen"), codegen.linesIterator.next())
    import spark.implicits._
    assert(df.as[Double].collect().toSet == Set(8.0, 11.0, 14.0, 17.0))
  }

  test("parquet aggregate pushdown: whole-table MAX answered by footer stats (v2 scan)") {
    // the watermark probe pattern (q7) at its cheapest: with the v2
    // reader + aggregatePushdown, MAX over a parquet table reads row-group
    // footers, not data pages — O(files) instead of O(rows)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.sources.useV1SourceList", "")
    s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    import org.apache.spark.sql.functions.max
    val df = s2.read.parquet(s"$dir/events.parquet").agg(max("event_id"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation: [MAX(event_id)]"),
      s"aggregate not pushed to the scan:\n${plan.take(2000)}")
    // and it still answers correctly
    val viaV1 = spark.read.parquet(s"$dir/events.parquet").agg(max("event_id"))
      .head().getLong(0)
    assert(df.head().getLong(0) == viaV1)
  }

  test("q242: dup-gram semi join broadcasts under AQE; no cross product") {
    val df = SparkEntry.queries("q242_substring_dedup")(spark, dir)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"dup-gram set not broadcast:\n${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q243: both retrieval legs bound by TakeOrderedAndProject before fusion") {
    val plan = planOf("q243_hybrid_rrf")
    assert("TakeOrderedAndProject".r.findAllIn(plan).size >= 2,
      s"legs not top-k bounded:\n${plan.take(3000)}")
  }

  test("q248: winnowed fingerprint selection is row-local — no exchange, no window operator") {
    val df = graft.llm.SubstringDedup.winnowedFingerprints(
      graft.tables.Tables.documents(spark, dir), "doc_id", "text", 40, 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Window"),
      s"fingerprint selection shuffles:\n${plan.take(2000)}")
  }

  test("q244: shard order is a per-shard window — never a global sort") {
    val df = graft.llm.Sharding.assignShards(
      graft.tables.Tables.documents(spark, dir), "doc_id", 8)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(shard_id"),
      s"window not partitioned by shard:\n${plan.take(3000)}")
  }

  test("q249: segment construction is row-local; dup set broadcasts under AQE") {
    // No Window operator anywhere (segments come from array HOFs, not
    // explode+window), and the duplicated-segment relation — small by
    // construction — reaches the segment relation as a broadcast join.
    val df = SparkEntry.queries("q249_segment_dedup")(spark, dir)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window "), s"segment build uses a window:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"dup-segment set not broadcast:\n${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q250: NB model dims (labels/mass/vocab/priors) broadcast; no cartesian blowup") {
    val df = SparkEntry.queries("q250_nb_classifier")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // label/mass/vocab/prior relations are model-sized — every one must
    // arrive as a broadcast, never a shuffle exchange on the token relation
    assert("BroadcastHashJoin|BroadcastExchange".r.findAllIn(plan).nonEmpty)
    assert(!plan.contains("CartesianProduct"),
      s"NB scoring degenerated to a cartesian:\n${plan.take(3000)}")
  }

  test("q257: CDC chunk build is row-local (no window/exchange before the chunk rows)") {
    val df = graft.llm.SubstringDedup.contentDefinedChunks(
      graft.tables.Tables.documents(spark, dir), "doc_id", "text", 8, 32)
    val plan = df.queryExecution.executedPlan.toString
    // everything up to the chunk relation is per-row kernel work (r14: a
    // primitive per-partition pass replaced the HOF expression tree): the
    // plan must stream the kernel rows with no Exchange and no Window
    assert(plan.contains("ExistingRDD"), s"no kernel scan found:\n${plan.take(2000)}")
    assert(!plan.contains("Exchange") && !plan.contains("Window"),
      s"chunk construction shuffles:\n${plan.take(3000)}")
  }

  test("q258: PageRank iterations join on the word key — no cartesian anywhere") {
    val df = SparkEntry.queries("q258_textrank")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"rank iteration degenerated:\n${plan.take(3000)}")
  }

  test("q258: iteration plan references the edge relation as pinned blocks — " +
    "zero copies of the corpus tokenization") {
    // The r6 scale-killer: un-pinned lineage embedded the tokenize→explode→
    // groupBy edge derivation ~16× in the final plan. With dir/outw/nodes
    // localCheckpoint'ed the executed plan must contain NO Generate
    // (explode) and NO parquet scan at all — every input is a materialized
    // block scan, so the corpus is tokenized exactly once (inside the
    // checkpoint jobs), never in the iteration plan.
    val edges = graft.llm.TextRank.cooccurrenceEdges(
      graft.tables.Tables.documents(spark, dir), "doc_id", "text")
    val pr = graft.llm.TextRank.pageRank(edges, iters = 5)
    pr.collect()
    val plan = pr.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"),
      s"tokenization re-embedded in the iteration plan:\n${plan.take(3000)}")
    assert(!plan.contains("FileScan"),
      s"corpus rescan in the iteration plan:\n${plan.take(3000)}")
  }

  test("q261: debias plan derives the centered cell relation ONCE (pinned) — " +
    "no explode or corpus rescan in the report plan") {
    // The r7 top profile entry: debiasReport used to derive `centered`
    // three times (covariance + two de-bias joins), re-running the
    // explode + broadcast-mean join over the full corpus each time. With
    // the cell relation localCheckpoint'ed and shared, the final report
    // plan must contain NO Generate (posexplode) and NO parquet FileScan —
    // every corpus input is the one pinned block.
    val df = graft.llm.Pca.debiasReport(spark,
      graft.tables.Tables.embeddings(spark, dir), "vec_id", "embedding", 64, iters = 10)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"),
      s"cell derivation re-embedded in the debias plan:\n${plan.take(3000)}")
    assert(!plan.contains("FileScan"),
      s"corpus rescan in the debias plan:\n${plan.take(3000)}")
  }

  test("q292: distributed power-iteration round plan is matvec-join-only — " +
    "pinned iterate, no d² driver materialization, no cartesian") {
    import org.apache.spark.sql.functions.{abs => sqlAbs, round => sqlRound, col, lit}
    val d = 64
    val cov = spark.range(d).select(col("id").cast("int").as("i"))
      .crossJoin(spark.range(-8, 9).select(col("id").cast("int").as("o")))
      .select(col("i"), (col("i") + col("o")).as("j"), col("o"))
      .filter(col("j") >= 0 && col("j") < d)
      .select(col("i"), col("j"),
        sqlRound(lit(1.0) / (lit(1.0) + sqlAbs(col("o")).cast("double")), 9)
          .cast(org.apache.spark.sql.types.DecimalType(18, 9)).as("c"))
    val out = graft.llm.Pca.topComponentDistributed(spark, cov, d, iters = 3)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // the returned iterate is a pinned block — the final plan must not
    // re-embed the matvec chain (lineage would double per round) nor any
    // cartesian/BNLJ
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(plan.contains("ExistingRDD") || plan.contains("LocalTableScan"),
      s"iterate not pinned:\n${plan.take(3000)}")
  }

  test("q272: dynamic partition pruning reaches the fact scan") {
    val df = SparkEntry.queries("q272_dynamic_partition_pruning")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the fact scan's partition filter must carry a runtime subquery
    // (dynamicpruning) on o_orderpriority — without it the join scans all
    // 5 partitions and DPP silently regressed
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning in:\n${plan.take(3000)}")
  }

  test("q262: kNN voting — query side broadcast, vote window partitioned by query") {
    val df = SparkEntry.queries("q262_knn_label")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"knn degenerated:\n${plan.take(3000)}")
    assert(plan.contains("windowspecdefinition(query_id"),
      s"vote window not per-query:\n${plan.take(3000)}")
  }

  test("q264: quality rules are one scan, zero exchanges before the sort") {
    val df = SparkEntry.queries("q264_gopher_rules")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // row-local predicates: the only exchange allowed is the final
    // ordering's range exchange
    assert("Exchange".r.findAllIn(plan).size <= 1,
      s"rule evaluation shuffles:\n${plan.take(3000)}")
    assert(!plan.contains("Window") && !plan.contains("Join"),
      s"unexpected operator:\n${plan.take(3000)}")
  }

  test("q251: DSIR scoring is one token-keyed join; scalars broadcast") {
    val df = SparkEntry.queries("q251_dsir_selection")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("BroadcastExchange"),
      s"LM normalizers not broadcast:\n${plan.take(3000)}")
    // the final top-50 must be a bounded sort, not a global one
    assert(plan.contains("TakeOrderedAndProject"),
      s"selection not top-k bounded:\n${plan.take(3000)}")
  }
}
