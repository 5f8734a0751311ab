package graft

import org.apache.spark.sql.{GraftColumnBridge, SparkSessionExtensions}
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions entry point: strategy + function injection. */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("GraftExtensions injects AsOfJoinStrategy and the vec_dot SQL function") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    GraftColumnBridge.applyExtensions(ext, spark)

    // strategy is live in the session planner
    assert(spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))

    // vec_dot resolves through the session function registry (SQL path)
    val d = spark.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].head()
    assert(d == 11.0)

    // the injected strategy plans an as-of join end to end
    val trades = Seq((1, 10, "t1"), (1, 20, "t2")).toDF("k", "t", "trade")
    val quotes = Seq((1, 5, 99.0), (1, 15, 101.0)).toDF("qk", "qt", "px")
    val out = graft.plans.AsOfJoin.asofJoin(trades, quotes, "k", "qk", "t", "qt")
      .select($"trade", $"px").collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(out == Set(("t1", 99.0), ("t2", 101.0)))
  }
}
