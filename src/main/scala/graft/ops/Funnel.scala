package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-event funnel analysis over an event stream — "how many users
  * did A, then B after A, then C after B". The reference's event model
  * (FactStream: one row per listening event, initial_load.sql:45-53)
  * implies exactly this query family even though its notebooks never run
  * one; every product-analytics engine ships it.
  *
  * Shape chosen for scale: per stage, one `groupBy(user)` aggregation of
  * the (filtered) event scan joined to the previous stage's frontier —
  * the frontier only ever shrinks, each join is an equi-join on the user
  * key (hash-partitioned both sides, AQE picks broadcast once the
  * frontier is small), and nothing is ordered globally. The alternative —
  * a per-user sorted window over all events — would shuffle the full
  * event log once per stage *and* sort it; this shuffles only the
  * matching stage's events.
  */
object Funnel {

  /** Gap-based sessionization: assign every event a per-user session
    * ordinal — a new session starts when the gap to the user's previous
    * event exceeds `gapSeconds`. One per-user window (lag + running sum of
    * session starts); nothing orders the corpus globally, and the window
    * partitions by the same key every downstream per-session aggregation
    * groups by, so the sort is reused. `tieCol` breaks equal-timestamp
    * ties so the ordering (and therefore session assignment) is total and
    * engine-portable. Appends `session` (long, 1-based per user). */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__prev", lag(col("__us"), 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        col("__us") - col("__prev") > gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("session", sum(col("__new")).over(w))
      .drop("__us", "__prev", "__new")
  }

  /** Per-stage completion counts. A user completes stage i when they have
    * an event of `stages(i)` strictly after their stage-(i-1) completion
    * time (earliest such event wins — the canonical "first conversion"
    * definition). With `maxGapSeconds`, the stage event must also land
    * within that window after the previous completion — the "convert
    * within N hours" product-analytics variant. Returns
    * (stage_idx, stage, users), one row per stage. */
  def funnel(events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      stages: Seq[String], maxGapSeconds: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val u = col(userCol)

    var frontier = events.filter(col(typeCol) === stages.head)
      .groupBy(u).agg(min(col(tsCol)).as("__t"))
    var out = frontier.agg(
      lit(0).as("stage_idx"), lit(stages.head).as("stage"),
      count(lit(1)).as("users"))

    for (i <- 1 until stages.size) {
      val prev = frontier.select(u.as("__u"), col("__t").as("__prev_t"))
      val within = maxGapSeconds match {
        case Some(g) =>
          col(tsCol) <= col("__prev_t") + expr(s"INTERVAL $g SECOND")
        case None => lit(true)
      }
      frontier = events.filter(col(typeCol) === stages(i))
        .join(prev, u === col("__u") && col(tsCol) > col("__prev_t") && within)
        .groupBy(u).agg(min(col(tsCol)).as("__t"))
      out = out.unionByName(frontier.agg(
        lit(i).as("stage_idx"), lit(stages(i)).as("stage"),
        count(lit(1)).as("users")))
    }
    out
  }
}
