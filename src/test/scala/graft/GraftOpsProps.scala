package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the round-2 algebraic operators: the custom top-k
  * aggregate, the Morton interleave, connected components, and sequence
  * packing — each checked against a plain-Scala reference implementation
  * over random inputs and random partitionings. */
class GraftOpsProps extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def forAllSeeded[A](gen: Gen[A], n: Int = 10)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  test("TopKPairs ≡ sort-and-take reference for random data, k, partitioning") {
    val gen = for {
      n <- Gen.choose(0, 60)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(-50, 50), Gen.choose(0L, 30L)))
      k <- Gen.choose(1, 8)
      parts <- Gen.choose(1, 7)
    } yield (rows.map { case (v, p) => (v.toDouble, p) }.distinctBy(_._2), k, parts)
    forAllSeeded(gen) { case (rows, k, parts) =>
      val expect = rows.sortBy { case (v, p) => (-v, -p) }.take(k)
      val got =
        if (rows.isEmpty) Seq.empty
        else rows.toDF("v", "p").repartition(parts)
          .agg(graft.functions.TopKAgg.topkPairs($"v", $"p", k).as("t"))
          .selectExpr("inline(t)").as[(Double, Long)].collect().toSeq
      assert(got == expect, s"k=$k parts=$parts rows=$rows")
    }
  }

  test("mortonCode: de-interleave round-trips for random coordinates") {
    // reference de-interleave in plain Scala
    def unpack(z: Long, bits: Int): (Long, Long) = {
      var a = 0L; var b = 0L
      (0 until bits).foreach { i =>
        a |= ((z >> (2 * i)) & 1L) << i
        b |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (a, b)
    }
    val gen = Gen.listOfN(30, Gen.zip(Gen.choose(0L, 1023L), Gen.choose(0L, 1023L)))
    forAllSeeded(gen, n = 5) { pts =>
      if (pts.nonEmpty) {
        val zs = pts.toDF("a", "b")
          .select(col("a"), col("b"),
            graft.ops.Relational.mortonCode(col("a"), col("b"), 10).as("z"))
          .as[(Long, Long, Long)].collect()
        zs.foreach { case (a, b, z) => assert(unpack(z, 10) == ((a, b))) }
      }
    }
  }

  test("connectedComponents ≡ union-find reference on random graphs") {
    def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(x => x -> find(x)).toMap
    }
    val gen = for {
      n <- Gen.choose(1, 25)
      edges <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 15L), Gen.choose(0L, 15L)))
    } yield edges.filter { case (a, b) => a != b }
    forAllSeeded(gen, n = 6) { edges =>
      if (edges.nonEmpty) {
        val got = graft.llm.Dedup.connectedComponents(
            edges.toDF("d1", "d2"), "d1", "d2")
          .as[(Long, Long)].collect().toMap
        assert(got == ufComponents(edges))
      }
    }
  }

  test("packSequencesGlobal: coverage + budget + rank-block determinism on random corpora") {
    val gen = for {
      n <- Gen.choose(1, 60)
      docs <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 500L), Gen.choose(1L, 40L)))
      budget <- Gen.choose(20, 80)
      blockRows <- Gen.choose(4, 32)
    } yield (docs.distinctBy(_._1), budget, blockRows)
    forAllSeeded(gen, n = 6) { case (docs, budget, blockRows) =>
      val df = docs.toDF("id", "t")
      def run() = graft.llm.Packing
        .packSequencesGlobal(df, "id", "t", budget, numPartitions = 5, blockRows = blockRows)
        .select($"pack_id", $"id", $"n_tokens").as[(Long, Long, Long)].collect()
      val packed = run()
      // exact coverage
      assert(packed.map(_._2).sorted.toSeq == docs.map(_._1).sorted)
      // budget respected unless a pack is a single oversized doc
      packed.groupBy(_._1).foreach { case (_, ps) =>
        assert(ps.map(_._3).sum <= budget || ps.length == 1)
      }
      // rank-block isolation: every pack's docs share one block id
      packed.groupBy(_._1).foreach { case (pid, ps) =>
        assert(ps.forall(p => (p._1 >> 20) == (pid >> 20)))
      }
      // deterministic under re-run (pure function of the input set)
      assert(run().sortBy(_._2).toSeq == packed.sortBy(_._2).toSeq)
    }
  }

  test("Quantization int8: code range, error bound, scale formula on random vectors") {
    val gen = for {
      n <- Gen.choose(1, 12)
      vecs <- Gen.listOfN(n,
        Gen.zip(Gen.choose(0L, 1000L), Gen.listOfN(8, Gen.choose(-5.0, 5.0))))
    } yield vecs.distinctBy(_._1)
    forAllSeeded(gen, n = 6) { vecs =>
      val df = vecs.toDF("id", "v")
      val q = graft.llm.Quantization.quantizeInt8(df, "id", "v")
        .select($"id", $"scale", $"codes").as[(Long, Double, Seq[Byte])].collect()
      val byId = vecs.toMap
      q.foreach { case (id, scale, codes) =>
        val v = byId(id)
        // exact scale formula, full int8 range, per-element error ≤ scale/2
        assert(math.abs(scale - v.map(math.abs).max / 127.0) < 1e-12)
        assert(codes.forall(c => c >= -127 && c <= 127))
        v.zip(codes).foreach { case (x, c) =>
          val err = math.abs(x - c * scale)
          assert(err <= scale / 2 + 1e-9, s"id $id: |$x - $c*$scale| = $err")
        }
      }
    }
  }

  test("packSequences: coverage + budget + order invariants on random corpora") {
    val gen = for {
      n <- Gen.choose(1, 50)
      docs <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 500L), Gen.choose(1L, 40L)))
      budget <- Gen.choose(20, 80)
    } yield (docs.distinctBy(_._1), budget)
    forAllSeeded(gen, n = 6) { case (docs, budget) =>
      val df = docs.map { case (id, t) => (id, "g", t) }.toDF("id", "g", "t")
      val packed = graft.llm.Packing.packSequences(df, "id", "t", Seq("g"), budget, shards = 4)
        .select($"shard", $"pack_id", $"id", $"n_tokens")
        .as[(Int, Long, Long, Long)].collect()
      assert(packed.map(_._3).sorted.toSeq == docs.map(_._1).sorted)
      packed.groupBy(p => (p._1, p._2)).foreach { case (_, ps) =>
        assert(ps.map(_._4).sum <= budget || ps.length == 1)
      }
      // within a shard, ascending doc ids never go to an earlier pack
      packed.groupBy(_._1).foreach { case (_, ps) =>
        val byId = ps.sortBy(_._3)
        assert(byId.map(_._2).toSeq == byId.map(_._2).sorted.toSeq)
      }
    }
  }

  // brute-force span reference: the set of characters covered by any
  // length-l window at a hit position; spans = maximal consecutive runs
  private def refSpans(t: String, l: Int, hit: Int => Boolean)
      : Option[(Long, Long, Double)] = {
    val chars = (for (i <- 0 to t.length - l; if hit(i); c <- i until i + l)
      yield c).toSet
    if (chars.isEmpty) None
    else {
      val sorted = chars.toList.sorted
      var runs = List.empty[Int]; var runLen = 0; var prev = Int.MinValue
      for (c <- sorted) {
        if (c == prev + 1) runLen += 1
        else { if (runLen > 0) runs ::= runLen; runLen = 1 }
        prev = c
      }
      runs ::= runLen
      Some((chars.size.toLong, runs.max.toLong, chars.size.toDouble / t.length))
    }
  }

  private val corpusGen = for {
    n <- Gen.choose(2, 6)
    docs <- Gen.listOfN(n, Gen.choose(0, 28).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf('a', 'b')).map(_.mkString)))
    l <- Gen.choose(2, 5)
    parts <- Gen.choose(1, 5)
  } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }, l, parts)

  test("duplicatedSpans ≡ brute-force char-set reference on random 2-letter corpora") {
    // a 2-letter alphabet makes duplicated grams dense, hammering the
    // islands + interval-union legs (overlap, adjacency, within-doc)
    forAllSeeded(corpusGen, n = 12) { case (docs, l, parts) =>
      val occ = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
      for ((_, t) <- docs; i <- 0 to t.length - l) occ(t.substring(i, i + l)) += 1
      val expect = docs.flatMap { case (id, t) =>
        refSpans(t, l, i => occ(t.substring(i, i + l)) >= 2).map(r => id -> r)
      }.toMap
      val got = graft.llm.SubstringDedup.duplicatedSpans(
          docs.toDF("doc_id", "text").repartition(parts), "doc_id", "text", l)
        .as[(Long, Long, Long, Double)].collect()
      assert(got.map(_._1).sorted.toSeq == expect.keys.toSeq.sorted,
        s"docs=$docs l=$l")
      got.foreach { case (id, dc, ms, fr) =>
        val (edc, ems, efr) = expect(id)
        assert(dc == edc && ms == ems && math.abs(fr - efr) < 1.1e-6,
          s"id=$id got=($dc,$ms,$fr) want=($edc,$ems,$efr) docs=$docs l=$l")
      }
    }
  }

  test("invertedIndex ≡ brute-force postings on random tiny-vocab corpora") {
    val gen = for {
      n <- Gen.choose(1, 8)
      docs <- Gen.listOfN(n, Gen.choose(0, 10).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("u", "v", "w")).map(_.mkString(" "))))
      ng <- Gen.choose(1, 2)
      lo <- Gen.choose(1L, 2L)
      hi <- Gen.choose(2L, 5L)
      parts <- Gen.choose(1, 5)
    } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }, ng, lo, hi, parts)
    forAllSeeded(gen, n = 12) { case (docs, ng, lo, hi, parts) =>
      val expect = docs.flatMap { case (id, t) =>
        val toks = t.trim.split("\\s+").filter(_.nonEmpty)
        (0 to toks.length - ng).map(i => toks.slice(i, i + ng).mkString(" "))
          .distinct.map(term => term -> id)
      }.groupBy(_._1).view
        .mapValues(_.map(_._2).sorted)
        .filter { case (_, ids) => ids.size >= lo && ids.size <= hi }
        .map { case (term, ids) => (term, ids.size.toLong, ids.mkString(",")) }
        .toSet
      val got = graft.llm.Ranking.invertedIndex(
          docs.toDF("doc_id", "text").repartition(parts),
          "doc_id", "text", n = ng, minDf = lo, maxDf = hi)
        .as[(String, Long, String)].collect().toSet
      assert(got == expect, s"docs=$docs ng=$ng band=[$lo,$hi]")
    }
  }

  test("winnowedFingerprints: window coverage + shared-fingerprint guarantee") {
    val l = 3; val w = 3; val t = w + l - 1 // detection guarantee length
    forAllSeeded(corpusGen.map { case (docs, _, parts) => (docs, parts) }, n = 12) {
      case (docs, parts) =>
        val fps = graft.llm.SubstringDedup.winnowedFingerprints(
            docs.toDF("doc_id", "text").repartition(parts), "doc_id", "text", l, w)
          .as[(Long, Long, Long)].collect()
        val byDoc = fps.groupBy(_._1).view.mapValues(_.map(f => f._2 -> f._3).toMap).toMap
        // coverage: every full window of w gram positions holds ≥1 selection
        for ((id, text) <- docs; if text.length >= l + w - 1) {
          val nPos = text.length - l + 1
          val sel = byDoc.getOrElse(id, Map.empty).keySet
          for (j <- 1 to nPos - w + 1)
            assert((j until j + w).exists(p => sel(p.toLong)),
              s"window $j of doc $id uncovered; sel=$sel text=$text")
        }
        // guarantee: every t-length match between two positions shares a
        // selected fingerprint at the SAME offset inside both occurrences
        for {
          (a, ta) <- docs; (b, tb) <- docs
          ia <- 1 to ta.length - t + 1; ib <- 1 to tb.length - t + 1
          if (a, ia) != (b, ib) && ta.substring(ia - 1, ia + t - 1) == tb.substring(ib - 1, ib + t - 1)
        } {
          val fa = byDoc.getOrElse(a, Map.empty); val fb = byDoc.getOrElse(b, Map.empty)
          val hit = (0 to t - l).exists(k =>
            fa.get((ia + k).toLong).exists(h => fb.get((ib + k).toLong).contains(h)))
          assert(hit, s"match a=$a@$ia b=$b@$ib undetected; docs=$docs")
        }
    }
  }

  test("contaminatedSpans ≡ brute-force reference (train grams vs bench gram set)") {
    forAllSeeded(corpusGen, n = 12) { case (docs, l, parts) =>
      val (train, bench) = docs.partition(_._1 % 2 == 0)
      val benchGrams = (for ((_, t) <- bench; i <- 0 to t.length - l)
        yield t.substring(i, i + l)).toSet
      val expect = train.flatMap { case (id, t) =>
        refSpans(t, l, i => benchGrams(t.substring(i, i + l))).map(r => id -> r)
      }.toMap
      val got = graft.llm.SubstringDedup.contaminatedSpans(
          train.toDF("doc_id", "text").repartition(parts),
          bench.toDF("doc_id", "text"), "doc_id", "text", l)
        .as[(Long, Long, Long, Double)].collect()
      assert(got.map(_._1).sorted.toSeq == expect.keys.toSeq.sorted,
        s"docs=$docs l=$l")
      got.foreach { case (id, dc, ms, fr) =>
        val (edc, ems, efr) = expect(id)
        assert(dc == edc && ms == ems && math.abs(fr - efr) < 1.1e-6,
          s"id=$id got=($dc,$ms,$fr) want=($edc,$ems,$efr) docs=$docs l=$l")
      }
    }
  }
}
