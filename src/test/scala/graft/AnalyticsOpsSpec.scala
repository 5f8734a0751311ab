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
