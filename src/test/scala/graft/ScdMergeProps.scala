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
}
