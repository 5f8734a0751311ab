package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Funnel, Graph}
import graft.llm.{Sampling, TextAnalysis}

/** Event-analytics + graph + sampling operators added in round 2:
  * hand-checkable semantics on tiny inputs, then invariants that must
  * hold under any partitioning. */
class AnalyticsOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ── triangle counting ────────────────────────────────────────────────

  test("triangleCount: K4 plus a pendant, duplicate/reversed edges collapse") {
    // K4 on {1,2,3,4} (4 triangles, every vertex in 3) + pendant 5-1.
    // Edge list deliberately dirty: reversed duplicates and a self-loop.
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (2L, 1L), (3L, 1L), // reversed dups
      (5L, 1L),           // pendant — no triangle
      (4L, 4L)            // self-loop — dropped
    ).toDF("src", "dst")
    val got = Graph.triangleCount(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCount: two triangles sharing an edge") {
    // 1-2-3 and 2-3-4: shared edge (2,3); nodes 2,3 in two triangles.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a", "b")
    val got = Graph.triangleCount(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("triangleCount: triangle-free graph (star + path) emits nothing") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L), (5L, 6L))
      .toDF("src", "dst")
    assert(Graph.triangleCount(edges, "src", "dst").count() === 0L)
  }

  // ── funnel ───────────────────────────────────────────────────────────

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("kCore: cascading peel on K4 + tail; k beyond degeneracy empties; dirty edges") {
    // K4 on {1,2,3,4} + path 4-5-6; dirty: reversed dup + self-loop
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (2L, 1L), (6L, 6L)).toDF("s", "d")
    // k=3: 6 peels (deg 1), then 5 (deg 1 after the cascade) → K4 remains
    val core3 = Graph.kCore(edges, "s", "d", 3).as[(Long, Long)].collect().toMap
    assert(core3 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k=2: the cascade still strips the tail — 6 first, then 5
    val core2 = Graph.kCore(edges, "s", "d", 2).as[(Long, Long)].collect().toMap
    assert(core2 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k above the degeneracy → empty core
    assert(Graph.kCore(edges, "s", "d", 4).isEmpty)
    // k=1 keeps every non-self-loop edge endpoint
    assert(Graph.kCore(edges, "s", "d", 1).count() == 6)
  }

  test("sessionize: gap starts a new session; ties share one; numbering is per user") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:20:00"), 2L), // 20 min — same session
      (1L, ts("2024-01-01 11:00:00"), 3L), // 40 min — new session
      (1L, ts("2024-01-01 11:00:00"), 4L), // tie — same session
      (2L, ts("2024-01-01 09:00:00"), 5L)  // other user restarts numbering
    ).toDF("user_id", "ts", "event_id")
    val got = Funnel.sessionize(ev, "user_id", "ts", "event_id", gapSeconds = 1800L)
      .select($"event_id", $"session").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
    // exact 30-minute gap does NOT split (strictly-greater rule)
    val edge = Seq((1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:30:00"), 2L)).toDF("user_id", "ts", "event_id")
    assert(Funnel.sessionize(edge, "user_id", "ts", "event_id", 1800L)
      .select($"session").as[Long].collect().toSet == Set(1L))
  }

  test("funnel: strictly-ordered stage completion, first-conversion wins") {
    val events = Seq(
      // u1 completes the whole funnel
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:05:00")),
      (1L, "purchase", ts("2024-01-01 10:10:00")),
      // u2's only click is BEFORE the first view → stops at view
      (2L, "click", ts("2024-01-01 09:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),
      // u3 skips click → purchase doesn't count
      (3L, "view", ts("2024-01-01 10:00:00")),
      (3L, "purchase", ts("2024-01-01 11:00:00")),
      // u4 never views → in no stage
      (4L, "click", ts("2024-01-01 10:00:00")),
      (4L, "purchase", ts("2024-01-01 11:00:00")),
      // u5: click ties the view timestamp → strict 'after' excludes it
      (5L, "view", ts("2024-01-01 10:00:00")),
      (5L, "click", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")

    val got = Funnel.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .select($"stage", $"users").as[(String, Long)].collect().toMap
    assert(got == Map("view" -> 4L, "click" -> 1L, "purchase" -> 1L))
  }

  test("funnel: later same-type events can still convert (min-after, not first-only)") {
    // u1's first click is before the view, but a second click follows it.
    val events = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 09:00:00")),
      (1L, "click", ts("2024-01-01 11:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.funnel(events, "user_id", "event_type", "ts", Seq("view", "click"))
      .select($"stage", $"users").as[(String, Long)].collect().toMap
    assert(got == Map("view" -> 1L, "click" -> 1L))
  }

  test("funnel: maxGap window excludes conversions that land too late") {
    val events = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:30:00")), // within 1h → converts
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "click", ts("2024-01-01 12:00:01"))  // past the 2h window
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click"), maxGapSeconds = Some(7200L))
      .select($"stage", $"users").as[(String, Long)].collect().toMap
    assert(got == Map("view" -> 2L, "click" -> 1L))
  }

  // ── weighted Bernoulli sampling ──────────────────────────────────────

  test("weightedBernoulli: weight 0 drops all, saturated weight keeps all") {
    val docs = (1 to 200).map(i => (i.toLong, i * 3)).toDF("doc_id", "n_chars")
    assert(Sampling.weightedBernoulli(docs, "doc_id", lit(0.0), 0.9).count() === 0L)
    assert(Sampling.weightedBernoulli(docs, "doc_id", lit(2.0), 0.5).count() === 200L)
  }

  test("weightedBernoulli: kept set is monotone in rate and reproducible") {
    val docs = (1 to 500).map(i => (i.toLong, (i % 40) / 40.0)).toDF("doc_id", "w")
    def keep(rate: Double): Set[Long] =
      Sampling.weightedBernoulli(docs, "doc_id", col("w"), rate)
        .select("doc_id").as[Long].collect().toSet
    val lo = keep(0.3); val hi = keep(0.9)
    assert(lo.subsetOf(hi))
    assert(lo == keep(0.3)) // same coin every run
    // higher-weight rows survive more often within the same rate
    val kept = Sampling.weightedBernoulli(docs, "doc_id", col("w"), 0.9)
    val meanKept = kept.agg(avg($"w")).head().getDouble(0)
    val meanAll = docs.agg(avg($"w")).head().getDouble(0)
    assert(meanKept > meanAll)
  }

  // ── BFS shortest paths ───────────────────────────────────────────────

  test("shortestPaths: multi-source min-hop on a path + branch, maxHops cap") {
    // 1→2→3→4→5 and 2→6; sources {1}: dists 1:0 2:1 3:2 6:2, 4 at hop 3,
    // 5 beyond maxHops=3.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (2L, 6L))
      .toDF("src", "dst")
    val got = ops.Graph.shortestPaths(edges, "src", "dst", Seq(1L), 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 6L -> 2L, 4L -> 3L))
  }

  test("shortestPaths: second source shadows longer routes; cycles terminate") {
    // cycle 1→2→3→1, sources {1,3}: 1:0, 3:0, 2:1 — revisits never lower.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val got = ops.Graph.shortestPaths(edges, "src", "dst", Seq(1L, 3L), 4)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 0L))
  }

  // ── histogram ────────────────────────────────────────────────────────

  test("histogram: bin edges, top-edge fold, out-of-range drop, count conservation") {
    val df = Seq(0.0, 5.0, 9.99, 10.0, 25.0, 99.9, 100.0, 100.1, -0.1)
      .toDF("x")
    val got = ops.Relational.histogram(df, "x", 10, 0.0, 100.0)
      .as[(Long, Double, Double, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // -0.1 and 100.1 dropped; 100.0 folds into bin 9; 10.0 opens bin 1
    assert(got(0L) == ((0.0, 10.0, 3L)))   // 0.0, 5.0, 9.99
    assert(got(1L) == ((10.0, 20.0, 1L)))  // 10.0
    assert(got(2L) == ((20.0, 30.0, 1L)))  // 25.0
    assert(got(9L) == ((90.0, 100.0, 2L))) // 99.9 and the folded 100.0
    assert(got.values.map(_._3).sum == 7L)
  }

  // ── Hamming near-pair linkage ────────────────────────────────────────

  test("hammingNearPairs ≡ brute-force pair scan on real part names") {
    val names = graft.tables.Tables.part(spark, "/root/testdata/sf0.001")
      .select($"p_name").distinct()
    val got = ops.Relational.hammingNearPairs(names, "p_name", "p_name", 2)
      .as[(String, String, Long)].collect().toSet

    val n = names.select($"p_name".as("x"))
    val brute = n.as("a").join(n.as("b"),
        length($"a.x") === length($"b.x") && $"a.x" < $"b.x")
      .withColumn("d", size(filter(sequence(lit(1), length($"a.x")),
        p => $"a.x".substr(p, lit(1)) =!= $"b.x".substr(p, lit(1)))).cast("long"))
      .filter($"d" <= 2)
      .select($"a.x", $"b.x", $"d").as[(String, String, Long)].collect().toSet
    assert(got == brute)
    assert(got.nonEmpty) // the fixture really exercises it
  }

  test("hammingNearPairs: distance 0 = exact duplicates; lengths never mix") {
    val df = Seq((1L, "abcd"), (2L, "abcd"), (3L, "abce"), (4L, "abcde"))
      .toDF("id", "t")
    val d0 = ops.Relational.hammingNearPairs(df, "id", "t", 0)
      .as[(Long, Long, Long)].collect().toSet
    assert(d0 == Set((1L, 2L, 0L)))
    val d1 = ops.Relational.hammingNearPairs(df, "id", "t", 1)
      .as[(Long, Long, Long)].collect().toSet
    // 4 ("abcde") pairs with nobody — different length
    assert(d1 == Set((1L, 2L, 0L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("JaroWinkler: textbook reference values, boost gating, edges, SQL form") {
    import graft.functions.JaroWinkler.similarity
    assert(math.abs(similarity("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(similarity("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-15)
    assert(math.abs(similarity("DWAYNE", "DUANE") - 0.84) < 1e-10)
    // no common prefix → no Winkler boost even above the 0.7 threshold
    assert(math.abs(similarity("JELLYFISH", "SMELLYFISH") - 0.8962962962962964) < 1e-15)
    assert(similarity("abc", "abc") == 1.0)
    assert(similarity("", "abc") == 0.0 && similarity("abc", "") == 0.0)
    assert(similarity("a", "b") == 0.0) // no matches

    graft.functions.JaroWinkler.register(spark)
    val viaSql = spark.sql("SELECT jaro_winkler('martha', 'marhta') AS v")
      .as[Double].head()
    assert(math.abs(viaSql - 0.9611111111111111) < 1e-15)
    // null propagation through the expression
    val n = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(graft.functions.JaroWinkler.jaroWinkler(col("a"), col("b")))
      .collect().head
    assert(n.isNullAt(0))
  }

  test("HammingDistance expression: codegen'd count, null on length mismatch, SQL form") {
    val df = Seq(("karolin", "kathrin"), ("abc", "abc"), ("abc", "abcd"))
      .toDF("a", "b")
    val got = df.select(
        graft.functions.StringDistanceFunctions.hamming($"a", $"b").as("d"))
      .as[Option[Int]].collect().toSeq
    assert(got == Seq(Some(3), Some(0), None))
    graft.functions.StringDistanceFunctions.register(spark)
    assert(spark.sql("SELECT hamming('1011101', '1001001')").head().getInt(0) == 2)
  }

  // ── profiling ────────────────────────────────────────────────────────

  test("profile: nulls, exact distincts, stringified bounds") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (null, "b"), (4L, null), (4L, "c")
    ).toDF("k", "s")
    val rows = ops.Relational.profile(df, Seq("k", "s"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(rows("k") == ("k", 5L, 1L, 3L, Some("1"), Some("4")))
    assert(rows("s") == ("s", 5L, 1L, 3L, Some("a"), Some("c")))
  }

  // ── snapshot schema evolution ────────────────────────────────────────

  test("SnapshotTable.changes aligns evolved schemas (added and dropped columns)") {
    val work = java.nio.file.Files.createTempDirectory("sev-spec").toString
    val t = new graft.tables.SnapshotTable(s"$work/t")
    t.write(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))          // v1
    t.write(spark, Seq((1L, "a", 10), (3L, "c", 30)).toDF("k", "v", "w")) // v2 adds w, drops k=2
    val c12 = t.changes(spark, Seq("k"), 1, 2)
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)), r.getString(3)))
      .toSet
    assert(c12 == Set(
      (1L, Some("a"), Some(10), "update"),  // w: absent → 10
      (2L, Some("b"), None, "delete"),      // dropped row, w null-filled
      (3L, Some("c"), Some(30), "insert")))
    // reverse direction: column disappears; unchanged values still differ on w
    t.write(spark, Seq((1L, "a"), (3L, "c")).toDF("k", "v"))          // v3 drops w
    val c23 = t.changes(spark, Seq("k"), 2, 3)
      .collect().map(r => (r.getLong(0), r.getString(3))).toSet
    assert(c23 == Set((1L, "update"), (3L, "update"))) // w: value → absent
  }

  // ── statistics ───────────────────────────────────────────────────────

  test("abTestZ: counts, rates, and z on a hand-checkable split") {
    // A: 4 trials 3 conv (.75); B: 4 trials 1 conv (.25); pooled p = .5
    // z = .5 / sqrt(.25 * .5) = 1.41421356...
    val df = Seq(
      ("A", true), ("A", true), ("A", true), ("A", false),
      ("B", true), ("B", false), ("B", false), ("B", false),
      ("C", true) // other groups ignored
    ).toDF("grp", "ok")
    val r = ops.Stats.abTestZ(df, "grp", $"ok", "A", "B").head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L &&
      r.getLong(2) == 4L && r.getLong(3) == 1L)
    assert(r.getDouble(4) == 0.75 && r.getDouble(5) == 0.25)
    assert(math.abs(r.getDouble(6) - 0.5 / math.sqrt(0.25 * 0.5)) < 1e-12)
  }

  test("groupedLinReg: exact fit on a perfect line; null on zero x-variance") {
    val df = Seq(
      ("a", 1, 3.0), ("a", 2, 5.0), ("a", 3, 7.0),  // y = 2x + 1
      ("b", 5, 9.0), ("b", 5, 11.0)                  // no x variance
    ).toDF("g", "x", "y")
    val rows = ops.Stats.groupedLinReg(df, "g", $"x", $"y")
      .collect().map(r => r.getString(0) ->
        (Option(r.get(2)), Option(r.get(3)))).toMap
    assert(rows("a") == ((Some(2.0), Some(1.0))))
    assert(rows("b") == ((None, None)))
  }

  test("corrMatrix: perfect, inverse, and constant-column cases in one pass") {
    val df = Seq(
      (1.0, 2.0, 9.0, 5.0), (2.0, 4.0, 8.0, 5.0),
      (3.0, 6.0, 7.0, 5.0), (4.0, 8.0, 6.0, 5.0)
    ).toDF("x", "y2x", "neg", "const")
    val rows = ops.Stats.corrMatrix(df, Seq("x", "y2x", "neg", "const"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> Option(r.get(2))).toMap
    assert(rows(("x", "y2x")) == Some(1.0))
    assert(rows(("x", "neg")) == Some(-1.0))
    assert(rows(("x", "const")) == None)
    assert(rows.size == 6)
  }

  test("groupedEntropy: uniform → ln k, degenerate → 0") {
    val df = Seq(
      ("u", "a"), ("u", "b"), ("u", "c"), ("u", "d"),
      ("one", "x"), ("one", "x"), ("one", "x")
    ).toDF("g", "v")
    val rows = ops.Stats.groupedEntropy(df, "g", "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows("u")._1 == 4L)
    assert(math.abs(rows("u")._2 - math.log(4.0)) < 1e-6)
    assert(rows("one") == ((1L, 0.0)))
  }

  // ── model scoring ────────────────────────────────────────────────────

  test("UnicodeNormalize: NFC recomposes, NFKC folds compatibility chars, SQL form, nulls") {
    import graft.functions.UnicodeNormalize
    val df = Seq(
      (1L, "café"),        // decomposed é
      (2L, "café"),         // precomposed é
      (3L, "ﬁnal plan"),    // ﬁ ligature
      (4L, "plain ascii"),
      (5L, null.asInstanceOf[String])).toDF("id", "s")
    val out = df.select($"id",
        UnicodeNormalize.nfc($"s").as("nfc"),
        UnicodeNormalize.nfkc($"s").as("nfkc"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out(1L)._1 == "café")            // NFC composes
    assert(out(1L)._1 == out(2L)._1)             // both forms canonicalize equal
    assert(out(3L)._1 == "ﬁnal plan")       // NFC preserves compatibility chars
    assert(out(3L)._2 == "final plan")           // NFKC folds the ligature
    assert(out(4L)._1 == "plain ascii")          // ASCII fast path: identity
    assert(out(5L) == (null, null))              // null passthrough

    UnicodeNormalize.register(spark)
    val viaSql = spark.sql(
      "SELECT unicode_normalize('café', 'NFC') AS v").as[String].head()
    assert(viaSql == "café")
    intercept[Exception] {
      graft.functions.UnicodeNormalize(
        org.apache.spark.sql.GraftColumnBridge.expression(lit("x")), "BOGUS")
    }
  }

  test("weightedMedian: half-total rule on hand-checkable weights") {
    // group g: values 1(w3), 2(w1), 3(w2) — total 6, cum(1)=3 → 2·3 ≥ 6 → median 1
    // group h: values 10(w1), 20(w1) — total 2, cum(10)=1 → 2 ≥ 2 → median 10
    val df = Seq(("g", 1.0, 3L), ("g", 2.0, 1L), ("g", 3.0, 2L),
      ("h", 10.0, 1L), ("h", 20.0, 1L)).toDF("k", "v", "w")
    val got = graft.ops.Stats.weightedMedian(df, "k", col("v"), col("w"))
      .as[(String, Double)].collect().toMap
    assert(got == Map("g" -> 1.0, "h" -> 10.0))
    // uniform weights degrade to the plain lower median
    val u = Seq(("g", 1.0, 1L), ("g", 2.0, 1L), ("g", 3.0, 1L)).toDF("k", "v", "w")
    assert(graft.ops.Stats.weightedMedian(u, "k", col("v"), col("w"))
      .as[(String, Double)].collect().toMap == Map("g" -> 2.0))
  }

  test("percentileDisc: band picks on hand-checkable cumulative counts") {
    // 1..10 in one group: p25 → cum ≥ 2.5 → 3; p50 → 5; p75 → 8; p100 → 10
    val df = (1 to 10).map(i => ("g", i.toDouble)).toDF("k", "v")
    val got = graft.ops.Stats.percentileDisc(df, "k", col("v"), Seq(25, 50, 75, 100))
      .as[(String, Int, Double)].collect().map { case (_, p, v) => p -> v }.toMap
    assert(got == Map(25 -> 3.0, 50 -> 5.0, 75 -> 8.0, 100 -> 10.0))
    // duplicated mass shifts bands: {1,1,1,9} → p50 lands on 1, p90 on 9
    val dup = Seq(("h", 1.0), ("h", 1.0), ("h", 1.0), ("h", 9.0)).toDF("k", "v")
    val got2 = graft.ops.Stats.percentileDisc(dup, "k", col("v"), Seq(50, 90))
      .as[(String, Int, Double)].collect().map { case (_, p, v) => p -> v }.toMap
    assert(got2 == Map(50 -> 1.0, 90 -> 9.0))
    intercept[IllegalArgumentException] {
      graft.ops.Stats.percentileDisc(df, "k", col("v"), Seq(0))
    }
  }

  test("groupedGini: perfect equality → 0, extreme concentration → (n−1)/n, ties stable") {
    val eq = Seq.fill(5)(("a", 10.0)).toDF("k", "x")
    val g1 = graft.ops.Stats.groupedGini(eq, "k", col("x")).collect().head
    assert(math.abs(g1.getDouble(2)) < 1e-12)
    // one owner takes everything: G = (n-1)/n = 0.75 for n=4
    val conc = Seq(("b", 0.0), ("b", 0.0), ("b", 0.0), ("b", 100.0)).toDF("k", "x")
    val g2 = graft.ops.Stats.groupedGini(conc, "k", col("x")).collect().head
    assert(math.abs(g2.getDouble(2) - 0.75) < 1e-12)
    // all-zero group → null (sx = 0)
    val z = Seq(("c", 0.0), ("c", 0.0)).toDF("k", "x")
    assert(graft.ops.Stats.groupedGini(z, "k", col("x")).collect().head.isNullAt(2))
  }

  test("psi: identical distributions → 0; a mass shift raises it; shared-support only") {
    val base = (Seq.fill(50)(1.0) ++ Seq.fill(50)(9.0)).toDF("v")
    val same = (Seq.fill(20)(1.0) ++ Seq.fill(20)(9.0)).toDF("v")
    val r0 = graft.ops.Stats.psi(base, same, col("v"), 0.0, 10.0, 10).collect().head
    assert(r0.getDouble(3) == 0.0)
    // 50/50 → 80/20: psi = (0.5-0.8)ln(0.5/0.8) + (0.5-0.2)ln(0.5/0.2) > 0
    val shifted = (Seq.fill(80)(1.0) ++ Seq.fill(20)(9.0)).toDF("v")
    val r1 = graft.ops.Stats.psi(base, shifted, col("v"), 0.0, 10.0, 10).collect().head
    val expect = (0.5 - 0.8) * math.log(0.5 / 0.8) + (0.5 - 0.2) * math.log(0.5 / 0.2)
    assert(math.abs(r1.getDouble(3) - expect) < 1e-5)
    // a bin present only in one side is excluded; totals renormalize
    val extra = (Seq.fill(20)(1.0) ++ Seq.fill(20)(9.0) ++ Seq.fill(99)(5.0)).toDF("v")
    val r2 = graft.ops.Stats.psi(base, extra, col("v"), 0.0, 10.0, 10).collect().head
    assert(r2.getLong(2) == 2 && r2.getDouble(3) == 0.0)
  }

  test("madOutliers: hand-checked median/MAD, threshold catches the planted spike") {
    // g: {1,2,3,4,100} → median 3, deviations {2,1,0,1,97} → MAD 1,
    // outliers where |x−3| > 3·1 → only 100
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0), ("g", 100.0)).toDF("k", "v")
    val r = graft.ops.Stats.madOutliers(df, "k", col("v")).collect().head
    assert(r.getLong(1) == 5)
    assert(r.getDouble(2) == 3.0 && r.getDouble(3) == 1.0)
    assert(r.getLong(4) == 1)
    // constant group: MAD 0, every different value is an outlier (none here)
    val const = Seq(("h", 5.0), ("h", 5.0), ("h", 5.0)).toDF("k", "v")
    val rc = graft.ops.Stats.madOutliers(const, "k", col("v")).collect().head
    assert(rc.getDouble(3) == 0.0 && rc.getLong(4) == 0)
  }

  test("targetEncode: smoothing pulls rare categories toward the prior") {
    // global mean = 10; a: n=2 mean 20, b: n=2 mean 0
    val df = Seq(("a", 20.0), ("a", 20.0), ("b", 0.0), ("b", 0.0)).toDF("c", "y")
    val enc = graft.ops.Stats.targetEncode(df, "c", col("y"), smoothing = 2.0)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    // a: (40 + 2·10)/(2+2) = 15 ; b: (0 + 20)/4 = 5
    assert(enc == Map("a" -> 15.0, "b" -> 5.0))
    // zero smoothing degrades to the plain category mean
    val raw = graft.ops.Stats.targetEncode(df, "c", col("y"), smoothing = 0.0)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(raw == Map("a" -> 20.0, "b" -> 0.0))
  }

  test("skyline2DByKey: independent frontiers per group") {
    val pts = Seq(("g", 1.0, 5.0), ("g", 2.0, 3.0), ("g", 3.0, 4.0),
      ("h", 1.0, 1.0), ("h", 2.0, 0.5)).toDF("k", "a", "b")
    val got = graft.ops.Relational.skyline2DByKey(pts, Seq("k"), "a", "b")
      .as[(String, Double, Double)].collect().toSet
    // g: (3,4) dominated by (2,3); h: both on frontier
    assert(got == Set(("g", 1.0, 5.0), ("g", 2.0, 3.0),
      ("h", 1.0, 1.0), ("h", 2.0, 0.5)))
  }

  test("skyline2DLarge ≡ skyline2D under any partitioning (map-side pre-reduce lossless)") {
    val rng = new scala.util.Random(11)
    val pts = (1 to 500).map(_ => (rng.nextDouble() * 100, rng.nextDouble() * 100))
      .toDF("a", "b")
    val direct = graft.ops.Relational.skyline2D(pts, "a", "b")
      .as[(Double, Double)].collect().toSet
    Seq(1, 3, 7).foreach { n =>
      val large = graft.ops.Relational.skyline2DLarge(pts.repartition(n), "a", "b")
        .as[(Double, Double)].collect().toSet
      assert(large == direct, s"partitions=$n")
    }
  }

  test("skyline2D ≡ brute-force dominance scan; ties and duplicates handled") {
    val pts = Seq((1.0, 5.0), (1.0, 5.0), (1.0, 7.0), (2.0, 5.0), (2.0, 3.0),
      (3.0, 3.0), (4.0, 1.0), (5.0, 2.0), (0.5, 9.0)).toDF("a", "b")
    val got = graft.ops.Relational.skyline2D(pts, "a", "b")
      .as[(Double, Double)].collect().toSet
    val arr = pts.as[(Double, Double)].collect().distinct
    val want = arr.filter { case (x, y) =>
      !arr.exists { case (px, py) =>
        px <= x && py <= y && (px < x || py < y)
      }
    }.toSet
    assert(got == want)
    assert(got == Set((0.5, 9.0), (1.0, 5.0), (2.0, 3.0), (4.0, 1.0)))
  }

  test("keySkew: uniform keys → 1, one hot key dominates") {
    val uniform = (1 to 100).map(i => i % 10).toDF("k")
    val u = graft.ops.Relational.keySkew(uniform, "k").collect().head
    assert((u.getLong(0), u.getLong(1), u.getLong(2), u.getDouble(3)) == ((100L, 10L, 10L, 1.0)))
    val hot = (Seq.fill(90)(1) ++ (2 to 11)).toDF("k")
    val h = graft.ops.Relational.keySkew(hot, "k").collect().head
    assert(h.getLong(2) == 90L && h.getDouble(3) == 9.9) // 90 / (100/11) = 9.9
  }

  test("welchT: hand-checked t and Welch df; degenerate arms emit null") {
    // a = {1,2,3,4}: mean 2.5, var 5/3; b = {2,4,6}: mean 4, var 4.
    // qa = 5/12, qb = 4/3; t = -1.5/sqrt(7/4); df = (7/4)²/((5/12)²/3 + (4/3)²/2)
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 2.0), ("b", 4.0), ("b", 6.0)).toDF("g", "y")
    val r = graft.ops.Stats.welchT(df, "g", col("y"), "a", "b").collect().head
    assert(r.getLong(0) == 4 && r.getLong(1) == 3)
    assert(math.abs(r.getDouble(2) - 2.5) < 1e-12)
    assert(math.abs(r.getDouble(3) - 4.0) < 1e-12)
    // t/df are rounded to 6 decimals at the edge
    val qa = (5.0 / 3.0) / 4.0; val qb = 4.0 / 3.0
    assert(math.abs(r.getDouble(4) - (-1.5 / math.sqrt(qa + qb))) < 1e-5)
    assert(math.abs(r.getDouble(5) -
      (qa + qb) * (qa + qb) / (qa * qa / 3.0 + qb * qb / 2.0)) < 1e-5)

    // single-element arm → null t/df, means still reported
    val deg = Seq(("a", 1.0), ("b", 2.0), ("b", 3.0)).toDF("g", "y")
    val d = graft.ops.Stats.welchT(deg, "g", col("y"), "a", "b").collect().head
    assert(d.isNullAt(4) && d.isNullAt(5))
    // zero-variance both arms → se = 0 → null
    val z = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0)).toDF("g", "y")
    val zr = graft.ops.Stats.welchT(z, "g", col("y"), "a", "b").collect().head
    assert(zr.isNullAt(4) && zr.isNullAt(5))
  }

  test("chiSquare: hand-checked 2×2 statistic; independent columns give ~0") {
    // contingency [[10, 20], [20, 10]]: n=60, all margins 30, E=7.5/15
    // chi2 = 4 * (5)²/ ... = (2.5²/7.5)*0 — compute: rows {a: (10,20)},
    // {b: (20,10)}; E(each cell) = 30*30/60 = 15; chi2 = 4*(5²/15) = 20/3.
    val rows =
      Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(10)(("b", "y"))
    val r = graft.ops.Stats.chiSquare(rows.toDF("u", "v"), "u", "v").collect().head
    assert(r.getLong(0) == 60 && r.getLong(1) == 2 && r.getLong(2) == 2)
    assert(r.getLong(3) == 1)
    assert(math.abs(r.getDouble(4) - 20.0 / 3.0) < 1e-9)

    // perfectly proportional margins → chi2 = 0
    val ind = Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(20)(("b", "y"))
    val ir = graft.ops.Stats.chiSquare(ind.toDF("u", "v"), "u", "v").collect().head
    assert(math.abs(ir.getDouble(4)) < 1e-9)
  }

  test("gridNearJoin ≡ brute-force radius scan; cell-boundary pairs included") {
    // points straddling cell boundaries at radius 2.0: (0,0)-(1.9,0) cross
    // a cell edge; (0,0)-(2.1,0) just outside; exact-radius pair included
    val pts = Seq(
      (1L, 0.0, 0.0), (2L, 1.9, 0.0), (3L, 2.1, 0.0), (4L, 0.0, 2.0),
      (5L, 10.0, 10.0), (6L, 11.0, 11.0), (7L, -1.0, -1.0)
    ).toDF("id", "x", "y")
    val got = graft.ops.Relational.gridNearJoin(pts, pts, "id", "x", "y", 2.0)
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val arr = pts.as[(Long, Double, Double)].collect()
    val want = (for {
      (ia, xa, ya) <- arr; (ib, xb, yb) <- arr
      if ia < ib && math.sqrt((xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)) <= 2.0
    } yield (ia, ib)).toSet
    assert(got == want)
    assert(got.contains((1L, 4L)) && got.contains((1L, 2L)) && !got.contains((1L, 3L)))
  }

  test("gridNearJoin ≡ brute force on a dense random cloud") {
    val rng = new scala.util.Random(7)
    val pts = (1L to 300L).map(i =>
      (i, rng.nextDouble() * 20, rng.nextDouble() * 20)).toDF("id", "x", "y")
    val got = graft.ops.Relational.gridNearJoin(pts, pts, "id", "x", "y", 1.5)
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val arr = pts.as[(Long, Double, Double)].collect()
    val want = (for {
      (ia, xa, ya) <- arr; (ib, xb, yb) <- arr
      if ia < ib && math.sqrt((xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)) <= 1.5
    } yield (ia, ib)).toSet
    assert(want.nonEmpty && got == want)
  }

  test("histogram sketch rollup: shard-merge ≡ direct sketch; estimator within a bin of exact") {
    import graft.ops.Stats
    val vals = (0 until 4000).map { i =>
      (s"g${i % 3}", s"shard${i % 7}", ((i * 37) % 1000) / 10.0 + (i % 3))
    }.toDF("g", "shard", "x")
    // merged shard sketches must equal the sketch computed in one pass
    val direct = Stats.histogramSketch(vals, Seq("g"), $"x", 50, 0.0, 125.0)
      .as[(String, Seq[Long])].collect().toMap
    val merged = Stats.mergeHistogramSketches(
        Stats.histogramSketch(vals, Seq("g", "shard"), $"x", 50, 0.0, 125.0),
        Seq("g"))
      .as[(String, Seq[Long])].collect().toMap
    assert(merged == direct)
    assert(direct.values.map(_.sum).sum == 4000) // no mass lost to sharding
    // percentile estimates land within one bin width of the exact value
    val est = Stats.histogramQuantiles(
        Stats.mergeHistogramSketches(
          Stats.histogramSketch(vals, Seq("g", "shard"), $"x", 50, 0.0, 125.0),
          Seq("g")),
        Seq("g"), Seq(50, 95), 0.0, 125.0)
      .select($"g", $"pct", $"estimate").as[(String, Long, Double)].collect()
    val binW = 125.0 / 50
    val byG = vals.as[(String, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).sorted).toMap
    est.foreach { case (g, pct, e) =>
      val xs = byG(g)
      val exact = xs(math.min(xs.length - 1,
        math.ceil(pct * xs.length / 100.0).toInt - 1))
      assert(math.abs(e - exact) <= binW + 1e-9,
        s"$g p$pct: est $e vs exact $exact (binW $binW)")
    }
    // clamping: out-of-range mass lands in the edge bins, never lost
    val clamped = Stats.histogramSketch(
      Seq(("a", -5.0), ("a", 9999.0)).toDF("g", "x"), Seq("g"), $"x", 4, 0.0, 8.0)
      .as[(String, Seq[Long])].head()._2
    assert(clamped == Seq(1L, 0L, 0L, 1L))
  }

  test("modelScore: bounded, 6-decimal, orders clean text above junk") {
    val docs = Seq(
      (1L, "the cat sat on the mat and it is a fine day for all of us to be here"),
      (2L, "#@! $$ %% ^^ && ** !! ?? ;; :: ~~ `` || \\ // [[ ]] {{ }}")
    ).toDF("doc_id", "text")
    val scores = docs.select($"doc_id", TextAnalysis.modelScore($"text").as("s"))
      .as[(Long, Double)].collect().toMap
    assert(scores.values.forall(s => s > 0.0 && s < 1.0))
    assert(scores(1L) > scores(2L))
    // round(_, 6): each score is the double nearest a 6-decimal value
    assert(scores.values.forall(s => math.abs(s * 1e6 - math.round(s * 1e6)) < 1e-4))
  }
}
