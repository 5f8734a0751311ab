package graft.tables

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The change-data-feed diff algebra shared by [[SnapshotTable.changes]]
  * and [[BucketedSnapshotTable.changes]] (Delta CDF analog, computed on
  * demand from two immutable snapshots rather than logged at write time):
  * one row per changed key with `_change_type` ∈ {insert, delete, update}
  * — update rows carry the NEW values, delete rows the old ones; with
  * `withChangedColumns`, update rows additionally carry
  * `_changed_columns`, the sorted comma-joined names of data columns whose
  * values differ null-safely ("" for inserts/deletes — every column
  * changed by definition).
  *
  * Scale shape: ONE keyed full-outer join, so the shuffle is on the
  * business key both snapshots are already clustered by in the common
  * case; the column diff and attribution are computed inside the same
  * joined row at zero extra shuffle. What differs between the two table
  * formats is only WHICH rows reach this join — the plain table feeds
  * whole snapshots, the bucketed table feeds only the buckets whose
  * manifest entry changed between the versions (metadata-pruned).
  *
  * Schema evolution across versions: both sides align to the union schema
  * (new version's order first, then old-only columns), null-filling what a
  * version lacks — a column added in the newer version reports prior rows
  * as updates (absent → value) and deletes carry null for it.
  */
private[tables] object ChangeFeed {

  def diff(oldS0: DataFrame, newS0: DataFrame, keys: Seq[String],
      withChangedColumns: Boolean): DataFrame =
    diff(oldS0, newS0, keys, withChangedColumns, withPreimage = false)

  /** `withPreimage` (r11, the Delta CDF row shape): an updated key emits
    * TWO rows — `update_preimage` carrying the OLD values and
    * `update_postimage` the new — instead of one `update` row with new
    * values only. What an incremental consumer that must RETRACT the old
    * contribution (a materialized aggregate, a downstream join state)
    * needs; both rows come out of the same joined row via one generated
    * explode, no second diff pass. */
  def diff(oldS0: DataFrame, newS0: DataFrame, keys: Seq[String],
      withChangedColumns: Boolean, withPreimage: Boolean): DataFrame = {
    val allCols: Seq[(String, org.apache.spark.sql.types.DataType)] =
      newS0.schema.map(f => f.name -> f.dataType) ++
        oldS0.schema.filterNot(f => newS0.columns.contains(f.name))
          .map(f => f.name -> f.dataType)
    def align(df: DataFrame): DataFrame = df.select(allCols.map { case (n, dt) =>
      if (df.columns.contains(n)) col(n) else lit(null).cast(dt).as(n)
    }: _*)
    val oldS = align(oldS0)
    val newS = align(newS0)
    val dataCols = allCols.map(_._1).filterNot(keys.contains)
    val o = oldS.select(oldS.columns.map(c => col(c).as(s"__o_$c")): _*)
    val n = newS.select(newS.columns.map(c => col(c).as(s"__n_$c")): _*)
    val cond = keys.map(k => o(s"__o_$k") === n(s"__n_$k")).reduce(_ && _)
    val changedData =
      if (dataCols.isEmpty) lit(false)
      else dataCols.map(c => !(col(s"__o_$c") <=> col(s"__n_$c"))).reduce(_ || _)
    val changedColsExpr = concat_ws(",", array_sort(filter(
      array(dataCols.map(c =>
        when(!(col(s"__o_$c") <=> col(s"__n_$c")), lit(c))): _*),
      x => x.isNotNull)))
    val joined = o.join(n, cond, "full_outer")
      .withColumn("_change_type",
        when(col(s"__o_${keys.head}").isNull, "insert")
          .when(col(s"__n_${keys.head}").isNull, "delete")
          .when(changedData, "update"))
      .filter(col("_change_type").isNotNull)
    // preimage mode splits each update row into pre+post INSIDE the same
    // projection (explode of a 1-or-2 element literal array — codegen'd,
    // no second join pass); rows carrying old values are then delete OR
    // update_preimage instead of delete alone
    val exploded =
      if (!withPreimage) joined
      else joined
        .withColumn("_ct2", explode(
          when(col("_change_type") === "update",
            array(lit("update_preimage"), lit("update_postimage")))
            .otherwise(array(col("_change_type")))))
        .drop("_change_type").withColumnRenamed("_ct2", "_change_type")
    val oldValued =
      if (withPreimage) col("_change_type").isin("delete", "update_preimage")
      else col("_change_type") === "delete"
    val isUpdate =
      if (withPreimage) col("_change_type").startsWith("update")
      else col("_change_type") === "update"
    val baseCols =
      keys.map(k => coalesce(col(s"__n_$k"), col(s"__o_$k")).as(k)) ++
        dataCols.map(c => when(oldValued, col(s"__o_$c"))
          .otherwise(col(s"__n_$c")).as(c)) :+ col("_change_type")
    val outCols =
      if (!withChangedColumns) baseCols
      else baseCols :+ when(isUpdate, changedColsExpr)
        .otherwise(lit("")).as("_changed_columns")
    exploded.select(outCols: _*)
  }
}
