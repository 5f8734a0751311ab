package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}

/** Point-in-time ("as-of") join — the canonical operator Spark's built-in
  * joins lack (SURVEY.md §4 lists none required by the reference; this is
  * the engine-surface extension for temporal star schemas: match each
  * left row to the single latest right row with the same key and
  * `rightTime < leftTime` (strict) — e.g. events against the SCD2 version
  * in effect at event time, without the M×N blowup of the
  * `join + row_number` encoding).
  *
  * Full custom-operator stack, per the extension preference order (c):
  * logical [[AsOfJoinPlan]] → [[AsOfJoinStrategy]] → [[AsOfJoinExec]]
  * (partition-local sorted merge). Registered per-session via
  * `spark.experimental.extraStrategies` (idempotent) — the same hook
  * `SparkSessionExtensions.injectPlannerStrategy` uses under the hood.
  *
  * Scale shape: one hash-shuffle + sort per side on (key, time) — the
  * same cost envelope as a sort-merge join — then a single forward pass
  * per partition with O(1) state (the last matching right row). No
  * candidate explosion for high-frequency right sides.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    // max lookback (pandas merge_asof `tolerance`): a match further back
    // than this is treated as no match. Units of `Cast(time, double)` —
    // SECONDS for timestamps, plain numeric difference otherwise.
    tolerance: Option[Double] = None) extends BinaryNode {
  // left-outer semantics: unmatched left rows keep nulls on the right
  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoinPlan =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Double] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partition both sides on the key …
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // … and sort each partition by (key, time) so one forward pass suffices
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val numRightFields = right.output.size
    val boundLk = BindReferences.bindReference(leftKey, left.output)
    val boundLt = BindReferences.bindReference(leftTime, left.output)
    val boundRk = BindReferences.bindReference(rightKey, right.output)
    val boundRt = BindReferences.bindReference(rightTime, right.output)
    // tolerance is evaluated in Cast(time, double) space (seconds for
    // timestamps) — bound lazily so the zero-tolerance path pays nothing
    val boundLtD = tolerance.map(_ => BindReferences.bindReference(
      org.apache.spark.sql.catalyst.expressions.Cast(leftTime,
        org.apache.spark.sql.types.DoubleType): Expression, left.output))
    val boundRtD = tolerance.map(_ => BindReferences.bindReference(
      org.apache.spark.sql.catalyst.expressions.Cast(rightTime,
        org.apache.spark.sql.types.DoubleType): Expression, right.output))
    val allOut = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      val proj = UnsafeProjection.create(allOut, allOut)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(numRightFields)

      new Iterator[InternalRow] {
        private var rCur: InternalRow = if (rIter.hasNext) rIter.next().copy() else null
        // the latest right row whose (key, time) precedes the current left row
        private var lastMatch: InternalRow = null
        private var lastMatchKey: Any = null
        private var lastMatchT: Double = 0.0

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = boundLk.eval(l)
          val lt = boundLt.eval(l)
          // advance the right side while it is strictly before (key, time)
          while (rCur != null && {
            val rk = boundRk.eval(rCur)
            val kc = keyOrd.compare(rk, lk)
            kc < 0 || (kc == 0 && timeOrd.compare(boundRt.eval(rCur), lt) < 0)
          }) {
            val rk = boundRk.eval(rCur)
            if (keyOrd.compare(rk, lk) == 0) {
              lastMatch = rCur; lastMatchKey = rk
              boundRtD.foreach(e => lastMatchT = e.eval(rCur).asInstanceOf[Double])
            }
            rCur = if (rIter.hasNext) rIter.next().copy() else null
          }
          // the latest-before match is also the NEAREST, so if it exceeds
          // the tolerance no earlier row can be inside it either
          val withinTol = tolerance.forall { tol =>
            lastMatch != null &&
              boundLtD.get.eval(l).asInstanceOf[Double] - lastMatchT <= tol
          }
          val m =
            if (lastMatch != null && keyOrd.compare(lastMatchKey, lk) == 0 && withinTol)
              lastMatch
            else nullRight
          proj(joined(l, m))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)
}

object AsOfJoin {

  private def ensureStrategy(spark: SparkSession): Unit = {
    val strategies = spark.experimental.extraStrategies
    if (!strategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = strategies :+ AsOfJoinStrategy
  }

  /** `left` as-of `right`: each left row picks the latest right row with
    * equal key and `rightTime` strictly before `leftTime` (left-outer).
    * Key/time columns are referenced by name and resolved here against the
    * analyzed children (the plan enters the session fully resolved — a
    * custom node's expressions are opaque to the analyzer). Rename ahead
    * of the call if the two sides share column names.
    *
    * pandas `merge_asof` parity knobs:
    *  - `tolerance`: max |leftTime − rightTime| for a match, in SECONDS
    *    for timestamp columns (plain numeric difference otherwise). The
    *    latest-before match is also the nearest, so tolerance is an O(1)
    *    per-row check in the merge pass — never a second scan.
    *  - `direction`: "backward" (default — latest right strictly before)
    *    or "forward" (earliest right strictly after), implemented by
    *    running the same sorted-merge plan on NEGATED time — zero extra
    *    operator code, identical cost envelope. */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      tolerance: Option[Double] = None,
      direction: String = "backward"): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward (got $direction)")
    if (direction == "forward") {
      import org.apache.spark.sql.functions.col
      // strictly-after in real time ≡ strictly-before in negated time
      val l2 = left.withColumn("__negt_l", -col(leftTime).cast("double"))
      val r2 = right.withColumn("__negt_r", -col(rightTime).cast("double"))
      return asofJoin(l2, r2, leftKey, rightKey, "__negt_l", "__negt_r",
        tolerance, "backward").drop("__negt_l", "__negt_r")
    }
    val lPlan = GraftColumnBridge.analyzed(left)
    val rPlan = GraftColumnBridge.analyzed(right)
    def attr(p: LogicalPlan, n: String) = p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not in ${p.output.map(_.name)}"))
    val plan = AsOfJoinPlan(lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, leftTime), attr(rPlan, rightTime), tolerance)
    GraftColumnBridge.ofRows(spark, plan)
  }

  /** The compositional (built-ins-only) form for cross-checking: union the
    * two sides, sort per key by time, forward-fill the last right payload
    * strictly before each left row. Same one-shuffle cost envelope; kept
    * as the portable reference implementation. */
  def asofJoinViaWindow(leftDf: DataFrame, rightDf: DataFrame,
      key: String, leftTimeCol: String, rightTimeCol: String,
      rightPayload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val l = leftDf.withColumn("__t", col(leftTimeCol)).withColumn("__isL", lit(1))
    val r = rightDf.select((key +: rightTimeCol +: rightPayload).distinct.map(col): _*)
      .withColumn("__t", col(rightTimeCol)).withColumn("__isL", lit(0))
    val lCols = l.columns
    val unioned = l.drop(rightPayload.filter(l.columns.contains): _*)
      .unionByName(r, allowMissingColumns = true)
    // right rows sort before left rows only when strictly earlier; at
    // equal time, left first (strict semantics)
    val w = Window.partitionBy(col(key)).orderBy(col("__t").asc, col("__isL").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val filled = rightPayload.foldLeft(unioned) { (df, p) =>
      df.withColumn(s"__asof_$p", last(when(col("__isL") === 0, col(p)), ignoreNulls = true).over(w))
    }
    filled.filter(col("__isL") === 1)
      .select(lCols.toSeq.filterNot(c => c == "__t" || c == "__isL").map(col) ++
        rightPayload.map(p => col(s"__asof_$p").as(s"asof_$p")): _*)
  }
}
