package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Relational

/** The auto-CDC merge algebra — what DLT's `create_auto_cdc_flow` does
  * (reference: DimUser.py:20-29 SCD2, FactStream.py:12-21 SCD1;
  * readme.md:112-118), re-expressed as pure DataFrame → DataFrame
  * transforms so it is unit-testable and sink-agnostic.
  *
  * Semantics reproduced (SURVEY.md §2.10 C4/C5/C7):
  *  - multiple updates to one key in a batch: every distinct sequence value
  *    becomes a version (SCD2) / only the highest survives (SCD1);
  *  - out-of-order events are ordered by `sequence_by`, not arrival — a
  *    late row becomes a historical version (SCD2) or is ignored when the
  *    stored sequence is newer (SCD1);
  *  - re-sent (key, seq) rows are idempotent: last arrival wins, counts
  *    never grow on replay.
  *
  * Scale design: both merges touch only *affected keys* — the target is
  * split with a semi/anti join against the batch's (small) key set, so the
  * window recompute runs over `|affected|` rows, not the whole table. AQE
  * turns the key-set join into a broadcast when the batch is small (the
  * steady-state case); the anti side streams through untouched. Each merge
  * is O(one shuffle on the business keys) beyond the scans.
  */
object ScdMerge {

  val StartCol = "__START_AT"
  val EndCol   = "__END_AT"

  /** SCD2 tombstone flag (see [[scd2Merge]]'s `applyAsDeletes`). Only
    * present when delete flows are enabled — delete-free tables keep
    * their exact historical schema. */
  val DeletedCol = "__DELETED"

  /** Schema evolution across batches (C3 meets C4/C5): a batch may add
    * columns the target lacks (and vice versa) — the union takes the name
    * union, null-filling the missing side, like DLT auto-CDC over an
    * evolved source. A column absent from the *winning* row is null in the
    * merged state (no cross-version carry-forward — version semantics stay
    * pure last-write). */
  private def unionEvolving(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b, allowMissingColumns = true)

  /** C5 — SCD Type 1 upsert: per business key, last write (highest
    * `sequence_by`) wins; ties prefer the incoming batch. No history.
    *
    * `applyAsDeletes` (DLT `create_auto_cdc_flow`'s parameter of the same
    * name — the reference leaves it unset, DimUser.py:20-29, so this is
    * beyond-parity): batch rows matching the predicate are TOMBSTONES.
    * Sequence-ordered like every other event (C7): the key is invisible
    * exactly while the tombstone is the key's newest event; a stale
    * tombstone (older than the stored row) is ignored, and a later upsert
    * after a delete re-inserts the key. At an exact (seq, tieBreak) tie an
    * upsert beats a tombstone (deterministic; DLT leaves this undefined).
    *
    * STATE vs VIEW (the DLT tombstone-management design): when delete
    * flows are enabled the returned STATE retains each deleted key's
    * winning tombstone row, flagged `__DELETED = true` — exactly like
    * [[scd2Merge]] persists tombstone versions. That stored tombstone is
    * what makes the semantics hold ACROSS batches under out-of-order
    * delivery: a later batch replaying a pre-delete upsert (older
    * sequence) loses the keyed reduction against the stored tombstone
    * instead of silently resurrecting the key. Read the visible table
    * with [[scd1Current]]. Delete-free merges return the plain row set
    * (no bookkeeping column), and a target that already carries
    * `__DELETED` keeps delete tracking even when a batch passes no
    * predicate. Replay-idempotent: re-applying a batch changes nothing.
    */
  def scd1Upsert(
      target: Option[DataFrame],
      updates: DataFrame,
      keys: Seq[String],
      seqCol: String,
      tieBreak: Seq[Column] = Nil,
      applyAsDeletes: Option[Column] = None): DataFrame = {

    // tombstones ride the SAME last-write-wins reduction as updates (one
    // extra bool column, no second pass); the winner's flag decides whether
    // the key is visible. Upsert-beats-delete tie rule via a trailing
    // tiebreak ((!__DELETED) desc: cast to int so non-delete = 1 wins the
    // desc ordering).
    val delEnabled = applyAsDeletes.isDefined ||
      target.exists(_.columns.contains(DeletedCol))
    val marked =
      if (!delEnabled) updates
      else updates.withColumn(DeletedCol,
        coalesce(applyAsDeletes.getOrElse(lit(false)), lit(false)))
    val tb = if (!delEnabled) tieBreak
             else tieBreak :+ (!col(DeletedCol)).cast("int")
    val upd = Relational.latestByKey(marked, keys, col(seqCol), tb)
    target match {
      case None => upd
      case Some(t0) =>
        // normalize the stored flag: absent → false (a delete-free table
        // gaining delete flows), null → false (schema-evolving reads
        // null-fill buckets written before the flag existed)
        val t =
          if (!delEnabled) t0
          else if (t0.columns.contains(DeletedCol))
            t0.withColumn(DeletedCol, coalesce(col(DeletedCol), lit(false)))
          else t0.withColumn(DeletedCol, lit(false))
        val keySet = upd.select(keys.map(col): _*).distinct()
        val untouched = t.join(keySet, keys, "left_anti")
        val affected  = t.join(keySet, keys, "left_semi")
        // union + one keyed reduction: higher seq wins, batch wins ties.
        val m = Relational.latestByKey(
          unionEvolving(
            affected.withColumn("__src", lit(0)),
            upd.withColumn("__src", lit(1))),
          keys, col(seqCol), col("__src") +: tb
        ).drop("__src")
        unionEvolving(untouched, m)
    }
  }

  /** Current visible rows of an SCD1 state ([[scd1Upsert]] output):
    * tombstoned keys removed and the bookkeeping column dropped.
    * Pass-through for delete-free states. */
  def scd1Current(state: DataFrame): DataFrame =
    nonTombstone(state).drop(DeletedCol)

  /** C4 — SCD Type 2 merge: maintain the full version chain per key with
    * `__START_AT`/`__END_AT`; current row has `__END_AT IS NULL`
    * (probed by the reference at silver_Dimensions.py:206-208).
    *
    * `targetVersions` must already carry __START_AT/__END_AT (or be None
    * for the initial load). Updates contribute one version per distinct
    * (key, seq); the chain — including end timestamps of *existing*
    * versions around a late arrival — is recomputed per affected key by a
    * single `lead()` window.
    */
  def scd2Merge(
      targetVersions: Option[DataFrame],
      updates: DataFrame,
      keys: Seq[String],
      seqCol: String,
      tieBreak: Seq[Column] = Nil,
      trackHistoryExcept: Seq[String] = Nil,
      applyAsDeletes: Option[Column] = None): DataFrame = {

    // `applyAsDeletes` (DLT parameter; beyond-parity — see scd1Upsert):
    // a matching batch row becomes a TOMBSTONE VERSION — stored with
    // __DELETED = true and __START_AT = its sequence, so the ordinary
    // rechain closes the previous version AT THE DELETE'S SEQUENCE without
    // opening a live successor ([[current]] excludes tombstones). Keeping
    // the tombstone as a row is what makes the semantics compose: a replay
    // dedups against it ((key, __START_AT) identity), a LATE pre-delete
    // version splices before it and correctly ends at the delete, a later
    // upsert re-opens the key (closing the tombstone row), and
    // [[pointInTimeJoin]] sees the deleted interval as dimension-less.
    // Delete-free merges never grow the __DELETED column.
    val delEnabled = applyAsDeletes.isDefined ||
      targetVersions.exists(_.columns.contains(DeletedCol))
    val updates2 =
      if (!delEnabled) updates
      else updates.withColumn(DeletedCol,
        coalesce(applyAsDeletes.getOrElse(lit(false)), lit(false)))
    val target2 = targetVersions.map { t =>
      if (delEnabled && !t.columns.contains(DeletedCol))
        t.withColumn(DeletedCol, lit(false))
      else t
    }

    val seqType = updates2.schema(seqCol).dataType
    val newVersions = updates2
      .withColumn(StartCol, col(seqCol))
      .withColumn(EndCol, lit(null).cast(seqType))

    def finish(versions: DataFrame): DataFrame =
      rechain(collapseUntracked(versions, keys, seqCol, trackHistoryExcept, tieBreak),
        keys, tieBreak)

    target2 match {
      case None => finish(dedupVersions(newVersions, keys, tieBreak))
      case Some(t) =>
        val keySet = newVersions.select(keys.map(col): _*).distinct()
        val untouched = t.join(keySet, keys, "left_anti")
        val affected  = t.join(keySet, keys, "left_semi")
        val combined = dedupVersions(
          unionEvolving(
            affected.withColumn("__src", lit(0)),
            newVersions.withColumn("__src", lit(1))),
          keys, tieBreak)
        unionEvolving(untouched, finish(combined))
    }
  }

  /** `track_history_except_column_list` (reference API surface:
    * DimUser.py:27, passed None there — the non-None semantics are DLT's:
    * a change confined to the excluded columns must NOT open a new SCD2
    * version; the current version is updated in place, keeping its
    * original `__START_AT`). The sequence column is implicitly untracked —
    * it advances on every event, so tracking it would make the except
    * list a no-op.
    *
    * Mechanics: order each key's versions by `__START_AT`, flag rows whose
    * *tracked* columns differ (null-safely) from the previous row, running-
    * sum the flags into version-group ids, then collapse each group to one
    * row carrying the group's earliest `__START_AT` and the values of its
    * newest row BY `seqCol` — not by `__START_AT`: an already-collapsed
    * target version keeps the seq of its latest constituent, which must
    * beat a late arrival with a larger start. A reverted tracked value
    * reopens a version (groups are runs, not distinct values).
    *
    * Late-data repair: a late TRACKED change can land inside an already-
    * collapsed run (stored run [10..] with latest seq 30; late b@20). The
    * run's constituents are gone — no SCD2 store keeps them — so after
    * collapsing, any version whose own seq postdates the next version's
    * start has its state resurrected at its seq and the chain re-collapsed:
    * current state is exactly right (a@30 wins again); only the truncated
    * first segment's untracked values are approximated by the run's latest
    * (the information a collapsed store inherently discards).
    *
    * All windows share the per-key partitioning the merge already shuffles
    * on — affected keys only, no extra shuffle. Requires versions to carry
    * `seqCol` (they do: the merge never drops it).
    */
  private def collapseUntracked(
      versions: DataFrame,
      keys: Seq[String],
      seqCol: String,
      untracked: Seq[String],
      tieBreak: Seq[Column]): DataFrame = {
    if (untracked.isEmpty) return versions
    val once = collapseOnce(versions, keys, seqCol, untracked, tieBreak)
    val wOrd = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(StartCol).asc +: tieBreak.map(_.asc): _*)
    val flagged = once.withColumn("__nxt", lead(col(StartCol), 1).over(wOrd))
    val resurrected = flagged
      .filter(col("__nxt").isNotNull && col(seqCol) > col("__nxt"))
      .withColumn(StartCol, col(seqCol))
    collapseOnce(
      flagged.drop("__nxt").unionByName(resurrected.drop("__nxt")),
      keys, seqCol, untracked, tieBreak)
  }

  private def collapseOnce(
      versions: DataFrame,
      keys: Seq[String],
      seqCol: String,
      untracked: Seq[String],
      tieBreak: Seq[Column]): DataFrame = {
    val skip = keys.toSet ++ untracked.toSet ++ Set(StartCol, EndCol, seqCol)
    val tracked = versions.columns.filterNot(skip.contains)
    val wOrd = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(StartCol).asc +: tieBreak.map(_.asc): _*)
    val changed = tracked.toSeq
      .map(c => !(col(c) <=> lag(col(c), 1).over(wOrd)))
      .reduceOption(_ || _).getOrElse(lit(false))
    val grouped = versions
      .withColumn("__chg",
        when(row_number().over(wOrd) === 1 || changed, 1).otherwise(0))
      .withColumn("__grp", sum(col("__chg"))
        .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wGrp = Window.partitionBy((keys :+ "__grp").map(col): _*)
    Relational.latestByKey(
        grouped.withColumn(StartCol, min(col(StartCol)).over(wGrp)),
        keys :+ "__grp", col(seqCol), tieBreak)
      .drop("__chg", "__grp")
  }

  /** Replay-idempotency: for duplicate (key, __START_AT) rows keep the
    * latest arrival (batch beats target, `__src` desc). */
  private def dedupVersions(df: DataFrame, keys: Seq[String], tieBreak: Seq[Column]): DataFrame = {
    val withSrc = if (df.columns.contains("__src")) df else df.withColumn("__src", lit(1))
    Relational.latestByKey(withSrc, keys :+ StartCol, col("__src"), tieBreak).drop("__src")
  }

  /** Recompute the per-key version chain: `__END_AT = lead(__START_AT)`.
    * Runs only over affected keys — one window shuffle sized by the batch's
    * key footprint, never the full table. */
  private def rechain(versions: DataFrame, keys: Seq[String], tieBreak: Seq[Column]): DataFrame = {
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(StartCol).asc +: tieBreak.map(_.asc): _*)
    versions.withColumn(EndCol, lead(col(StartCol), 1).over(w))
  }

  /** True rows only — tombstone versions are bookkeeping, not entity
    * state; tables without delete flows pass through untouched. */
  private def nonTombstone(versions: DataFrame): DataFrame =
    if (!versions.columns.contains(DeletedCol)) versions
    else versions.filter(!coalesce(col(DeletedCol), lit(false)))

  /** The reference's SCD2 history probe (F5): closed versions only
    * (tombstones excluded — a delete event is not an entity version). */
  def history(versions: DataFrame): DataFrame =
    nonTombstone(versions).filter(col(EndCol).isNotNull)

  /** Current snapshot of an SCD2 table. A key whose chain ends in a
    * tombstone has NO current row — the delete semantics. */
  def current(versions: DataFrame): DataFrame =
    nonTombstone(versions).filter(col(EndCol).isNull)

  /** Point-in-time (as-of-event-time) enrichment: each fact row joined to
    * the dimension version that was valid at `factTs` — `__START_AT ≤ ts`
    * and (`__END_AT IS NULL` or `ts < __END_AT`). LEFT join: facts
    * predating the key's first version survive with nulls.
    *
    * Plan shape at scale: an ordinary hash equi-join on `keys` with the
    * interval containment as a residual filter — per key the version
    * chain is short (it's a dimension), so the residual is cheap and no
    * range/BNLJ machinery is needed. Dimension columns are suffixed
    * nothing; fact columns win name clashes (facts keep their schema). */
  def pointInTimeJoin(facts: DataFrame, versions: DataFrame,
      keys: Seq[String], factTs: String): DataFrame = {
    val f = facts.alias("__f")
    // Tombstone rows are excluded from the dimension side: a fact whose ts
    // falls inside a deleted interval must enrich to nulls (left-join
    // miss), not to the delete event's payload. The preceding version's
    // __END_AT (= the delete's sequence) already bounds its own match.
    val d = nonTombstone(versions).alias("__d")
    val keyEq = keys.map(k => col(s"__f.$k") === col(s"__d.$k")).reduce(_ && _)
    val pit = col(s"__f.$factTs") >= col(s"__d.$StartCol") &&
      (col(s"__d.$EndCol").isNull || col(s"__f.$factTs") < col(s"__d.$EndCol"))
    val dimCols = versions.columns
      .filterNot(keys.contains).filterNot(facts.columns.contains)
      .filterNot(_ == DeletedCol) // uniformly false after the filter above
      .map(c => col(s"__d.$c"))
    f.join(d, keyEq && pit, "left")
      .select(facts.columns.map(c => col(s"__f.$c")) ++ dimCols: _*)
  }
}
