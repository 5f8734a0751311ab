package graft

import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.ScdMerge

/** Property tests for the SCD merge algebra (SURVEY.md §5): for random
  * CDC event sets and random batch splits,
  *  - SCD1 state ≡ the direct latest-per-key window answer;
  *  - SCD2 one-shot ≡ any sequential batch decomposition (associativity);
  *  - replaying the final batch is a no-op (idempotency).
  */
object ScdMergeProps {
  case class Ev(id: Int, seq: Int, v: String)
  case class EvD(id: Int, seq: Int, v: String, del: Boolean)
}

class ScdMergeProps extends AnyFunSuite {
  import ScdMergeProps.Ev
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val genEvents: Gen[List[Ev]] = for {
    n <- Gen.choose(1, 40)
    evs <- Gen.listOfN(n, for {
      id <- Gen.choose(0, 5)
      seq <- Gen.choose(0, 20)
      v <- Gen.alphaLowerStr.map(_.take(4))
    } yield Ev(id, seq, v))
  } yield evs.distinctBy(e => (e.id, e.seq)) // (key, seq) unique, like real CDC

  private def df(evs: Seq[Ev]): DataFrame = evs.toDF("id", "seq", "v")

  private def canon2(d: DataFrame): Seq[(Int, Int, Option[Int])] =
    d.select("id", "__START_AT", "__END_AT").as[(Int, Int, Option[Int])]
      .collect().toSeq.sorted

  /** Deterministic property driver: fixed seeds, no scalatestplus bridge
    * needed (only scalatest + scalacheck resolve offline). */
  private def forAllSeeded[A](gen: Gen[A], n: Int = 12)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  test("scd1Upsert ≡ latest-per-key window, under any 2-way split") {
    forAllSeeded(Gen.zip(genEvents, Gen.choose(0, 20))) { case (evs, cut) =>
      if (evs.nonEmpty) {
        val (b1, b2) = evs.partition(_.seq < cut)
        var state: Option[DataFrame] = None
        if (b1.nonEmpty) state = Some(ScdMerge.scd1Upsert(state, df(b1), Seq("id"), "seq"))
        if (b2.nonEmpty) state = Some(ScdMerge.scd1Upsert(state, df(b2), Seq("id"), "seq"))
        val got = state.get.select("id", "seq").as[(Int, Int)].collect().toSeq.sorted
        val want = evs.groupBy(_.id).map { case (id, g) => (id, g.map(_.seq).max) }.toSeq.sorted
        assert(got == want)
      }
    }
  }

  test("scd2Merge: one-shot ≡ sequential split; replay idempotent") {
    forAllSeeded(Gen.zip(genEvents, Gen.choose(0, 20))) { case (evs, cut) =>
      if (evs.nonEmpty) {
        val oneShot = ScdMerge.scd2Merge(None, df(evs), Seq("id"), "seq")
        val (b1, b2) = evs.partition(_.seq < cut)
        var split: Option[DataFrame] = None
        if (b1.nonEmpty) split = Some(ScdMerge.scd2Merge(split, df(b1), Seq("id"), "seq"))
        if (b2.nonEmpty) split = Some(ScdMerge.scd2Merge(split, df(b2), Seq("id"), "seq"))
        assert(canon2(oneShot) == canon2(split.get))
        // replay the final (or only) batch — nothing changes
        val replayBatch = if (b2.nonEmpty) b2 else b1
        val replayed = ScdMerge.scd2Merge(split, df(replayBatch), Seq("id"), "seq")
        assert(canon2(replayed) == canon2(split.get))
      }
    }
  }

  test("scd2Merge invariants: per key, one open version and a gapless chain") {
    forAllSeeded(genEvents) { evs =>
      if (evs.nonEmpty) {
        val versions = canon2(ScdMerge.scd2Merge(None, df(evs), Seq("id"), "seq"))
        versions.groupBy(_._1).foreach { case (_, chain) =>
          val sorted = chain.sortBy(_._2)
          assert(sorted.count(_._3.isEmpty) == 1)          // exactly one open
          assert(sorted.last._3.isEmpty)                   // the newest is open
          sorted.sliding(2).foreach {
            case Seq((_, _, Some(end)), (_, s2, _)) => assert(end == s2) // gapless
            case _ => ()
          }
        }
      }
    }
  }

  // ── apply_as_deletes (CDC delete flows) ──────────────────────────────
  import ScdMergeProps.EvD

  private val genEventsD: Gen[List[EvD]] = for {
    n <- Gen.choose(1, 40)
    evs <- Gen.listOfN(n, for {
      id <- Gen.choose(0, 5)
      seq <- Gen.choose(0, 20)
      v <- Gen.alphaLowerStr.map(_.take(4))
      del <- Gen.prob(0.3)
    } yield EvD(id, seq, v, del))
  } yield evs.distinctBy(e => (e.id, e.seq))

  private def dfD(evs: Seq[EvD]): DataFrame = evs.toDF("id", "seq", "v", "del")
  private val delCond = Some(org.apache.spark.sql.functions.col("del"))

  test("scd1 deletes: winner-is-tombstone hides the key, under any RANDOM split; replay no-op") {
    // The split is a random event partition, NOT a sequence cut — batch 2
    // may deliver events OLDER than batch 1's (out-of-order delivery /
    // replay of a pre-delete batch). The persisted tombstone state is what
    // keeps a stale upsert from resurrecting a deleted key across batches.
    val genSplit = for {
      evs <- genEventsD
      mask <- Gen.listOfN(evs.size, Gen.prob(0.5))
    } yield (evs, mask)
    forAllSeeded(genSplit) { case (evs, mask) =>
      if (evs.nonEmpty) {
        val (b1p, b2p) = evs.zip(mask).partition(_._2)
        val (b1, b2) = (b1p.map(_._1), b2p.map(_._1))
        var state: Option[DataFrame] = None
        if (b1.nonEmpty) state = Some(ScdMerge.scd1Upsert(state, dfD(b1), Seq("id"), "seq", Nil, delCond))
        if (b2.nonEmpty) state = Some(ScdMerge.scd1Upsert(state, dfD(b2), Seq("id"), "seq", Nil, delCond))
        val got = ScdMerge.scd1Current(state.get)
          .select("id", "seq").as[(Int, Int)].collect().toSeq.sorted
        // closed form: per key keep max seq; key absent when that row is a delete
        val want = evs.groupBy(_.id).flatMap { case (id, g) =>
          val w = g.maxBy(_.seq)
          if (w.del) None else Some((id, w.seq))
        }.toSeq.sorted
        assert(got == want, s"\nevents=$evs mask=$mask")
        // the STATE retains exactly one row per key (winner, flagged)
        val stateKeys = state.get.select("id").as[Int].collect().toSeq.sorted
        assert(stateKeys == evs.map(_.id).distinct.sorted, "state must keep tombstoned keys")
        // replay the final batch — nothing changes
        val rb = if (b2.nonEmpty) b2 else b1
        val replayed = ScdMerge.scd1Current(
            ScdMerge.scd1Upsert(state, dfD(rb), Seq("id"), "seq", Nil, delCond))
          .select("id", "seq").as[(Int, Int)].collect().toSeq.sorted
        assert(replayed == want)
      }
    }
  }

  test("scd2 deletes: visible chain ≡ closed form (tombstone closes, no successor); replay no-op") {
    forAllSeeded(Gen.zip(genEventsD, Gen.choose(0, 20))) { case (evs, cut) =>
      if (evs.nonEmpty) {
        def visible(d: DataFrame): Seq[(Int, Int, Option[Int])] =
          canon2(d.filter(!org.apache.spark.sql.functions.col(ScdMerge.DeletedCol)))
        val (b1, b2) = evs.partition(_.seq < cut)
        var split: Option[DataFrame] = None
        if (b1.nonEmpty) split = Some(ScdMerge.scd2Merge(split, dfD(b1), Seq("id"), "seq", Nil, Nil, delCond))
        if (b2.nonEmpty) split = Some(ScdMerge.scd2Merge(split, dfD(b2), Seq("id"), "seq", Nil, Nil, delCond))
        // closed form: chain ALL events by seq (END = next start), then
        // drop tombstone rows from the visible history
        val want = evs.groupBy(_.id).toSeq.flatMap { case (id, g) =>
          val sorted = g.sortBy(_.seq)
          sorted.zipWithIndex.collect { case (e, i) if !e.del =>
            (id, e.seq, sorted.lift(i + 1).map(_.seq))
          }
        }.sorted
        assert(visible(split.get) == want, s"\nevents=$evs cut=$cut")
        val rb = if (b2.nonEmpty) b2 else b1
        val replayed = ScdMerge.scd2Merge(split, dfD(rb), Seq("id"), "seq", Nil, Nil, delCond)
        assert(visible(replayed) == want)
        // current(): a key whose newest event is a tombstone has NO row
        val curIds = ScdMerge.current(split.get).select("id").as[Int].collect().toSet
        val wantCur = evs.groupBy(_.id).collect {
          case (id, g) if !g.maxBy(_.seq).del => id
        }.toSet
        assert(curIds == wantCur)
      }
    }
  }

  test("scd2 deletes: stale tombstone splices history without touching current; PIT sees a hole") {
    // v1@10, v2@30 committed; then a LATE tombstone @20 arrives: v1 must
    // close at 20 (not 30), v2 stays current, and a fact at ts=25 enriches
    // to nulls (the key was deleted then)
    val b1 = Seq(EvD(1, 10, "a", false), EvD(1, 30, "b", false))
    val b2 = Seq(EvD(1, 20, "x", true))
    val s1 = ScdMerge.scd2Merge(None, dfD(b1), Seq("id"), "seq", Nil, Nil, delCond)
    val s2 = ScdMerge.scd2Merge(Some(s1), dfD(b2), Seq("id"), "seq", Nil, Nil, delCond)
    val vis = canon2(s2.filter(!org.apache.spark.sql.functions.col(ScdMerge.DeletedCol)))
    assert(vis == Seq((1, 10, Some(20)), (1, 30, None)), vis.toString)
    assert(ScdMerge.current(s2).select("seq").as[Int].collect().toSeq == Seq(30))
    assert(ScdMerge.history(s2).select("seq").as[Int].collect().toSeq == Seq(10))
    val facts = Seq((1, 25), (1, 15), (1, 35)).toDF("id", "fts")
    val pit = ScdMerge.pointInTimeJoin(facts, s2, Seq("id"), "fts")
      .select("fts", "v").as[(Int, Option[String])].collect().toMap
    assert(pit == Map(25 -> None, 15 -> Some("a"), 35 -> Some("b")), pit.toString)
  }

  test("scd2 deletes × trackHistoryExcept: tombstones break untracked runs; collapse still works") {
    import org.apache.spark.sql.functions.col
    // v(tracked=a, untracked=u1)@10, untracked-only change @20 (must NOT
    // open a version), tombstone @30, re-insert (a, u3)@40. The tombstone
    // must terminate the collapsed run at 30 even though __DELETED is not
    // in the except list (it is implicitly tracked), and the re-insert
    // opens a fresh version.
    val mk = (rows: Seq[(Int, Int, String, String, Boolean)]) =>
      rows.toDF("id", "seq", "tracked", "untracked", "del")
    val out = ScdMerge.scd2Merge(None,
      mk(Seq((1, 10, "a", "u1", false), (1, 20, "a", "u2", false),
        (1, 30, "a", "u2", true), (1, 40, "a", "u3", false))),
      Seq("id"), "seq", Nil, Seq("untracked"), Some(col("del")))
    val vis = out.filter(!col(ScdMerge.DeletedCol))
      .select("seq", "untracked", "__START_AT", "__END_AT")
      .as[(Int, String, Int, Option[Int])].collect().toSet
    // run [10..] collapsed (u2 is untracked, latest-by-seq payload), closed
    // AT 30 by the tombstone; fresh version at 40 open
    assert(vis == Set((20, "u2", 10, Some(30)), (40, "u3", 40, None)), vis.toString)
    assert(ScdMerge.current(out).select("seq").as[Int].collect().toSeq == Seq(40))
  }

  test("scd1 deletes: stale tombstone is ignored; delete-then-reinsert round-trips") {
    val s1 = ScdMerge.scd1Upsert(None, dfD(Seq(EvD(1, 10, "a", false))), Seq("id"), "seq", Nil, delCond)
    // stale delete @5 loses to stored @10
    val s2 = ScdMerge.scd1Upsert(Some(s1), dfD(Seq(EvD(1, 5, "x", true))), Seq("id"), "seq", Nil, delCond)
    assert(ScdMerge.scd1Current(s2).select("seq").as[Int].collect().toSeq == Seq(10))
    // fresh delete @20 hides the key (the tombstone row persists in state)
    val s3 = ScdMerge.scd1Upsert(Some(s2), dfD(Seq(EvD(1, 20, "x", true))), Seq("id"), "seq", Nil, delCond)
    assert(ScdMerge.scd1Current(s3).count() == 0)
    assert(s3.count() == 1, "tombstone must persist in the SCD1 state")
    val s4 = ScdMerge.scd1Upsert(Some(s3), dfD(Seq(EvD(1, 30, "c", false))), Seq("id"), "seq", Nil, delCond)
    assert(ScdMerge.scd1Current(s4).select("seq", "v").as[(Int, String)].collect().toSeq == Seq((30, "c")))
  }

  test("scd1 deletes: cross-batch out-of-order — a replayed pre-delete upsert cannot resurrect the key") {
    // b1: upsert@10 then delete@20 → key hidden. b2 replays the OLD
    // upsert@10 (out-of-order delivery). Without persisted tombstone state
    // the key would silently come back with stale data.
    val s1 = ScdMerge.scd1Upsert(None,
      dfD(Seq(EvD(1, 10, "a", false), EvD(1, 20, "x", true))), Seq("id"), "seq", Nil, delCond)
    assert(ScdMerge.scd1Current(s1).count() == 0)
    val s2 = ScdMerge.scd1Upsert(Some(s1),
      dfD(Seq(EvD(1, 10, "a", false))), Seq("id"), "seq", Nil, delCond)
    assert(ScdMerge.scd1Current(s2).count() == 0,
      "stale upsert after delete must stay invisible")
    // ...and a batch with NO delete predicate still honors the stored state
    val s3 = ScdMerge.scd1Upsert(Some(s2),
      dfD(Seq(EvD(1, 15, "b", false))).drop("del"), Seq("id"), "seq")
    assert(ScdMerge.scd1Current(s3).count() == 0,
      "delete tracking must persist even when a later batch passes no predicate")
  }
}
