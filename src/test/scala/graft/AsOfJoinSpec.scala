package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOfJoin

/** The custom as-of join operator: hand-checkable semantics, equivalence
  * with the compositional window form, and plan shape. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin: strictly-prior match per key, left-outer, ties excluded") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (2L, ts("2024-01-01 10:30:00"), 200.0)
    ).toDF("q_key", "q_ts", "px")
    val trades = Seq(
      (1L, ts("2024-01-01 10:30:00"), "t1"), // after 10:00 quote → 100.0
      (1L, ts("2024-01-01 11:00:00"), "t2"), // tie with 11:00 quote → strict → 100.0
      (1L, ts("2024-01-01 12:00:00"), "t3"), // after both → 110.0
      (2L, ts("2024-01-01 10:00:00"), "t4"), // before any quote → null
      (3L, ts("2024-01-01 10:00:00"), "t5")  // key never quoted → null
    ).toDF("key", "t_ts", "trade")

    val out = AsOfJoin.asofJoin(trades, quotes, "key", "q_key", "t_ts", "q_ts")
      .select($"trade", $"px").as[(String, Option[Double])].collect().toMap
    assert(out == Map("t1" -> Some(100.0), "t2" -> Some(100.0),
      "t3" -> Some(110.0), "t4" -> None, "t5" -> None))
  }

  test("asofJoin tolerance: too-old matches drop to null; boundary is inclusive") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (2L, ts("2024-01-01 09:00:00"), 200.0)
    ).toDF("q_key", "q_ts", "px")
    val trades = Seq(
      (1L, ts("2024-01-01 10:30:00"), "in30"),   // 1800s back — inclusive boundary
      (1L, ts("2024-01-01 10:30:01"), "out30"),  // 1801s back — dropped
      (2L, ts("2024-01-01 09:10:00"), "in10")    // 600s back — kept
    ).toDF("key", "t_ts", "trade")
    val out = AsOfJoin.asofJoin(trades, quotes, "key", "q_key", "t_ts", "q_ts",
        tolerance = Some(1800.0))
      .select($"trade", $"px").as[(String, Option[Double])].collect().toMap
    assert(out == Map("in30" -> Some(100.0), "out30" -> None, "in10" -> Some(200.0)))
  }

  test("asofJoin forward: earliest strictly-after match; composes with tolerance") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0)
    ).toDF("q_key", "q_ts", "px")
    val trades = Seq(
      (1L, ts("2024-01-01 09:30:00"), "before"),  // → earliest after = 10:00
      (1L, ts("2024-01-01 10:00:00"), "tie"),     // strict → 11:00
      (1L, ts("2024-01-01 10:30:00"), "mid"),     // → 11:00
      (1L, ts("2024-01-01 12:00:00"), "after")    // nothing after → null
    ).toDF("key", "t_ts", "trade")
    val fwd = AsOfJoin.asofJoin(trades, quotes, "key", "q_key", "t_ts", "q_ts",
        direction = "forward")
      .select($"trade", $"px").as[(String, Option[Double])].collect().toMap
    assert(fwd == Map("before" -> Some(100.0), "tie" -> Some(110.0),
      "mid" -> Some(110.0), "after" -> None))
    // forward + tolerance: "before" is 1800s from 10:00 (kept at 1800),
    // "mid" is 1800s from 11:00 (kept), "tie" is 3600s out (dropped)
    val fwdTol = AsOfJoin.asofJoin(trades, quotes, "key", "q_key", "t_ts", "q_ts",
        tolerance = Some(1800.0), direction = "forward")
      .select($"trade", $"px").as[(String, Option[Double])].collect().toMap
    assert(fwdTol == Map("before" -> Some(100.0), "tie" -> None,
      "mid" -> Some(110.0), "after" -> None))
  }

  test("custom exec ≡ window composition on events at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val e = graft.tables.Tables.events(spark, dir).select($"event_id", $"user_id", $"ts")
    val p = graft.tables.Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"), $"value".as("p_value"))

    val custom = AsOfJoin.asofJoin(e, p, "user_id", "p_user", "ts", "p_ts")
      .select($"event_id", $"p_value").as[(Long, Option[Double])].collect().toMap

    val win = AsOfJoin.asofJoinViaWindow(
        e.withColumn("user_key", $"user_id"),
        graft.tables.Tables.events(spark, dir).filter($"event_type" === "purchase")
          .select($"user_id".as("user_key"), $"ts".as("p_ts"), $"value".as("p_value")),
        "user_key", "ts", "p_ts", Seq("p_value"))
      .select($"event_id", $"asof_p_value").as[(Long, Option[Double])].collect().toMap

    assert(custom == win)
    assert(custom.size == 1000)
  }

  test("physical plan uses AsOfJoinExec with one exchange per side") {
    val dir = "/root/testdata/sf0.001"
    val e = graft.tables.Tables.events(spark, dir).select($"event_id", $"user_id", $"ts")
    val p = graft.tables.Tables.events(spark, dir).filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"), $"value".as("p_value"))
    val plan = AsOfJoin.asofJoin(e, p, "user_id", "p_user", "ts", "p_ts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
  }
}
