package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incrementally-maintained two-table inner equi-join view — the classic
  * delta-join identity (Blakeley et al., "Efficiently Updating
  * Materialized Views", SIGMOD'86):
  *
  * {{{ (A ∪ ΔA) ⋈ (B ∪ ΔB)  =  A⋈B  ∪  ΔA⋈B  ∪  A⋈ΔB  ∪  ΔA⋈ΔB }}}
  *
  * so an insert-only refresh never recomputes the base join: the work per
  * refresh is three joins whose left-or-right side is a DELTA (at 100 TB,
  * deltas are broadcastable or shuffle only the delta side against a
  * bucketed base), not the O(|A|·|B|/keys) base recompute. The view lives
  * in a [[SnapshotTable]], so refreshes commit atomically, readers see
  * only complete versions, and time travel gives the pre-refresh view.
  *
  * Insert-only contract: deltas must be NEW rows (no updates/deletes —
  * those are SCD territory, see [[graft.cdc.ScdMerge]]).
  */
final class MaterializedJoin(val view: SnapshotTable, keys: Seq[String]) {

  /** Commit the base join as version 1 of the view. */
  def initialize(spark: SparkSession, a: DataFrame, b: DataFrame): Int =
    view.write(spark, a.join(b, keys))

  /** Apply insert-only deltas: joins only the delta legs, unions them onto
    * the current view, and commits the next version. `aOld`/`bOld` are the
    * PRE-delta base tables (the view stores joins, not bases — callers
    * already keep the bases as tables). */
  def refresh(spark: SparkSession, aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame): Int = {
    val delta = aDelta.join(bOld, keys)
      .unionByName(aOld.join(bDelta, keys))
      .unionByName(aDelta.join(bDelta, keys))
    view.write(spark, view.read(spark).unionByName(delta))
  }

  def read(spark: SparkSession): DataFrame = view.read(spark)
}
