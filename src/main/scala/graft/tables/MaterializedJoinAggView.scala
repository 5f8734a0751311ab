package graft.tables

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incrementally-maintained aggregate over a two-table INNER equi-join —
  * the star-rollup the reference's gold layer recomputes nightly
  * (fact ⋈ dimension → GROUP BY), maintained from BOTH tables' change
  * feeds instead. The classic delta-join identity (Blakeley et al.,
  * SIGMOD'86), in signed-multiset form with preimage feeds:
  *
  * {{{ F_new⋈D_new − F_old⋈D_old  =  ΔF⋈D_new  +  F_old⋈ΔD }}}
  *
  * so a refresh never recomputes the base join:
  *
  *  - '''ΔF⋈D_new''' — the fact window's signed feed joined to the dim's
  *    CURRENT visible rows for exactly the delta's join keys
  *    (bucket-pruned `readKeys` when the dim is bucketed by the join key,
  *    its natural layout). Cost: O(fact delta).
  *  - '''F_old⋈ΔD''' — the dim window's signed feed joined to the fact
  *    AS OF the last refresh, read through the pruning file index with an
  *    IN-list on the changed join keys, so the fact scan skips to the
  *    files whose stats/Bloom sidecars admit those keys. Cost: O(fact
  *    rows under changed dim keys) — dim changes are rare and narrow at
  *    100 TB, and this is the leg that makes late-arriving or updated
  *    dimensions exact without a fact recompute (the preimage retracts
  *    the old dim attributes, the postimage re-adds the new ones, rows
  *    move between groups when a grouped dim attribute changes).
  *
  * Because `D_new ⊇ ΔD`, the cross term ΔF⋈ΔD rides the first leg and is
  * excluded from the second (F_old), no double counting. The signed
  * joined delta then folds into a bucketed state table exactly like
  * [[MaterializedAggView]]: O(changed groups) state IO per refresh.
  *
  * Supported aggregates: the purely additive set — `count(*)`,
  * `count(c)`, `sum(c)`, `avg(c)` (sum+count, read back DOUBLE) — plus
  * `count(distinct c)`, maintained EXACTLY via an auxiliary per-(group,
  * value) occurrence table over the JOIN result (the signed joined delta
  * is a plain signed feed as far as pair counts go; see
  * [[MaterializedAggView]] for the zero-crossing mechanics and crash
  * pinning, shared verbatim). Measures and group columns may come from
  * either side.
  *
  * Exactly-once: BOTH applied source versions are ledger-committed
  * atomically with the state merge, packed into one `txn:mvj` entry
  * (factV·2^20 + dimV — up to ~1M dim commits per fact epoch, plenty for
  * any real refresh cadence and validated at refresh). A replayed
  * refresh of an applied window no-ops; the identity re-derives the same
  * delta because versions are immutable until VACUUM.
  *
  * Contracts: JOIN KEYS must be non-null (the engine-wide bucketed-key
  * contract — they drive the pruned point reads); GROUP BY columns may
  * be NULL with exact SQL semantics — the signed joined delta passes
  * through the single-table view's null-mask state-boundary encoding
  * (see [[MaterializedAggView]]; legacy pre-mask specs keep the
  * non-null group contract and fail loudly on violation). Column names
  * across the two sides must be distinct apart from the join keys (the
  * usual Spark join rule); retention — both sources' versions between
  * two refreshes must outlive the refresh lag (`VACUUM … KEEP`), the
  * same rule as any CDF consumer.
  */
final class MaterializedJoinAggView(val root: String) {
  import MaterializedAggView.{Agg, NCol, SeqCol}
  import MaterializedJoinAggView._

  private def fs(spark: SparkSession) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def specPath = new Path(root, "_mvj")

  def spec(spark: SparkSession): Spec = {
    val f = fs(spark)
    if (!f.exists(specPath))
      throw new IllegalArgumentException(s"MaterializedJoinAggView $root: no _mvj spec")
    val in = f.open(specPath)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).toVector finally in.close()
    val kv = lines.map { l =>
      val i = l.indexOf('=')
      require(i > 0, s"MaterializedJoinAggView $root: malformed _mvj line '$l'")
      l.take(i) -> l.drop(i + 1)
    }.toMap
    def need(k: String) = kv.getOrElse(k, throw new IllegalArgumentException(
      s"MaterializedJoinAggView $root: _mvj lacks $k"))
    def list(k: String) = kv.getOrElse(k, "").split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val groupBy = list("groupBy")
    Spec(need("factRoot"), list("factKeys"), need("dimRoot"), list("dimKeys"),
      list("joinKeys"), groupBy, list("aggs").map(Agg.parse),
      kv.getOrElse("numBuckets", "16").toInt,
      nullMask = kv.get("nullMask").contains("1"),
      derived = MaterializedAggView.derivedOf(kv, groupBy))
  }

  /** State business keys: group columns plus the null-mask when the spec
    * records it (see [[MaterializedAggView.NullsCol]]). */
  private def groupKeys(sp: Spec): Seq[String] =
    if (sp.nullMask) sp.groupBy :+ MaterializedAggView.NullsCol else sp.groupBy

  private def state(sp: Spec) =
    new BucketedSnapshotTable(s"$root/state", sp.numBuckets, groupKeys(sp))

  /** Auxiliary occurrence-count table for one `count(distinct c)` over
    * the JOIN result — keyed (and bucketed) by (groupKeys…, value),
    * exactly the single-table view's shape: the signed JOINED delta is a
    * plain signed feed as far as pair-count maintenance is concerned. */
  private def auxState(sp: Spec, as: String) =
    new BucketedSnapshotTable(s"$root/dstate_$as", sp.numBuckets,
      groupKeys(sp) :+ MaterializedAggView.ValCol)

  /** Fault-injection hook for crash-recovery specs (the single-table
    * view's pattern): called between the aux and main commits. */
  private[tables] var onStep: String => Unit = _ => ()

  private def factFeed(spark: SparkSession, sp: Spec) =
    graft.streaming.ChangeFeedSource.adapter(spark, Map("path" -> sp.factRoot) ++
      (if (sp.factKeys.nonEmpty) Map("keys" -> sp.factKeys.mkString(",")) else Map.empty))
  private def dimFeed(spark: SparkSession, sp: Spec) =
    graft.streaming.ChangeFeedSource.adapter(spark, Map("path" -> sp.dimRoot) ++
      (if (sp.dimKeys.nonEmpty) Map("keys" -> sp.dimKeys.mkString(",")) else Map.empty))

  /** (fact version, dim version) the ledger records as applied. */
  def lastApplied(spark: SparkSession): (Int, Int) =
    state(spec(spark)).appliedTxn(spark, TxnId)
      .map(unpack).getOrElse((0, 0))

  /** Fold both sources' windows since the last refresh into the state;
    * returns ((factV, dimV) now applied, state buckets rewritten).
    *
    * Refreshes SERIALIZE on the view root's commit lock (see
    * [[MaterializedAggView.refresh]] for the race this closes: two
    * refreshers reading the same ledger base with a source commit landing
    * between their reads would double-fold the overlap). A holder stolen
    * from while paused aborts before the merge instead of double-committing. */
  def refresh(spark: SparkSession): ((Int, Int), Set[Int]) =
    CommitLock.withHeartbeatLock(fs(spark), root)(h => refreshLocked(spark, h))

  private def refreshLocked(spark: SparkSession,
      lock: CommitLock.Handle): ((Int, Int), Set[Int]) = {
    val sp = spec(spark)
    val st = state(sp)
    val (lastFV, lastDV) = st.appliedTxn(spark, TxnId).map(unpack).getOrElse((0, 0))
    val ff = factFeed(spark, sp)
    val df = dimFeed(spark, sp)
    val factV = ff.currentVersion.getOrElse(return ((lastFV, lastDV), Set.empty))
    val dimV = df.currentVersion.getOrElse(return ((lastFV, lastDV), Set.empty))
    require(dimV < (1 << 20),
      s"MaterializedJoinAggView $root: dim version $dimV exceeds the packed-ledger bound")
    if (factV <= lastFV && dimV <= lastDV) return ((lastFV, lastDV), Set.empty)

    // crash-replay window pinning (the single-table view's rule, on the
    // packed two-version ledger): if a distinct agg's aux table committed
    // a refresh the MAIN state never saw, replay EXACTLY that crashed
    // window — folding a longer net window against the crashed aux counts
    // would freeze any pair whose change reverted in between. The
    // remainder folds in an ordinary second pass below.
    val lastPacked = pack(lastFV, lastDV)
    val crashed = sp.aggs.filter(_.fn == "count_distinct").flatMap { a =>
      val dst = auxState(sp, a.as)
      if (!dst.exists(spark)) None
      else dst.appliedTxn(spark, TxnId).filter(_ > lastPacked)
    }
    val (effF, effD) =
      if (crashed.nonEmpty) unpack(crashed.max)
      else (math.max(factV, lastFV), math.max(dimV, lastDV))

    val sign = when(col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .otherwise(lit(-1L))
    val bookkeeping = Seq("_change_type", "_changed_columns")

    // ── leg 1: ΔF ⋈ D_new — dim looked up (bucket-pruned when the dim is
    //    bucketed by the join key) for exactly the fact delta's keys
    val leg1: Option[DataFrame] =
      if (effF <= lastFV) None
      else {
        val fd0 =
          if (lastFV == 0) ff.visibleAt(effF).withColumn("_change_type", lit("insert"))
          else ff.feed(lastFV, effF, withColumns = false, withPreimage = true)
        // pinned on incremental windows: the dim's bucket-hash probe is an
        // eager action, so an unpinned diff would execute twice (the
        // bootstrap skips the probe and is consumed exactly once)
        val fd1 = fd0.withColumn(SignCol, sign).drop(bookkeeping: _*)
        val fd = if (lastFV == 0) fd1 else fd1.localCheckpoint()
        // bootstrap = the full base join (once, like any MV bootstrap):
        // let Catalyst/AQE pick the strategy instead of point-reading the
        // whole fact keyset; incremental windows point-read the dim for
        // exactly the delta's keys
        val dimNow =
          if (lastFV == 0) df.visibleAt(effD)
          else dimVisiblePruned(spark, sp, effD,
            fd.select(sp.joinKeys.map(col): _*).distinct())
        Some(fd.join(dimNow, sp.joinKeys))
      }

    // ── leg 2: F_old ⋈ ΔD — the fact AS OF the last refresh, read through
    //    the pruning file index with an IN-list on the changed join keys
    //    (stats/Bloom file skipping), never the live fact (ΔF already
    //    rode leg 1 against D_new)
    val leg2: Option[DataFrame] =
      // lastFV == 0 tested BEFORE any work: on a bootstrap leg 1 carries
      // everything, and building (and eagerly checkpointing) the full dim
      // insert feed just to discard it would cost O(|dim|) IO per bootstrap
      if (effD <= lastDV || lastFV == 0) None
      else {
        val dd0 =
          if (lastDV == 0) df.visibleAt(effD).withColumn("_change_type", lit("insert"))
          else df.feed(lastDV, effD, withColumns = false, withPreimage = true)
        // pinned: consumed by the IN-list collect AND the legs plan
        val dd = dd0.withColumn(SignCol, sign).drop(bookkeeping: _*)
          .localCheckpoint()
        val changedKeys = dd.select(sp.joinKeys.map(col): _*).distinct()
        val factOld = factAsOfPruned(spark, sp, lastFV, changedKeys)
        Some(factOld.join(dd, sp.joinKeys))
      }

    val deltaRaw0 = (leg1, leg2) match {
      case (Some(a), Some(b)) => a.unionByName(b, allowMissingColumns = true)
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case (None, None) => return ((lastFV, lastDV), Set.empty)
    }
    // derived dims (r14): computed on the JOINED delta BEFORE any encoding
    // — a preimage-joined row derives the same value its insert did, so
    // the retraction algebra is untouched; from the fold down a derived
    // dim is just another group column (the kind-agnostic r13 design)
    val deltaRaw = MaterializedAggView.applyDerived(deltaRaw0, sp.derived,
      s"MaterializedJoinAggView $root")
    // null-mask encoding on the JOINED delta (group columns are plain
    // data columns until the fold, so the single-table view's state-
    // boundary encoding applies unchanged): nullable group values store
    // as typed stand-ins + the `__mv_nulls` mask key, measures that ARE
    // nullable group columns aggregate shadowed raw values, and every
    // key operation below runs null-free over (groupBy…, mask)
    val gk = groupKeys(sp)
    val overlap: Set[String] =
      if (sp.nullMask) sp.aggs.flatMap(_.col).toSet.intersect(sp.groupBy.toSet)
      else Set.empty
    def shadowCol(m: String) = s"__mv_raw_$m"
    def mcol(m: String): String = if (overlap(m)) shadowCol(m) else m
    val delta0 =
      if (sp.nullMask)
        MaterializedAggView.encodeNulls(
          overlap.foldLeft(deltaRaw)((d, m) => d.withColumn(shadowCol(m), col(m))),
          sp.groupBy)
      else deltaRaw
    // EXACTLY-ONE-distinct views take the ONE-PASS fold (onePassDeltas):
    // both maintenance grains derive from one (group, value)-grain base
    // aggregation of the joined delta, which then needs no pin of its
    // own (single consumer). Multi-distinct views keep the per-agg pair
    // passes and pin the joined delta (O(changed joined rows)) so the
    // delta-join legs run once, not once per consumer — NOT on a
    // bootstrap, where the delta is the FULL base join and materializing
    // fact-cardinality rows costs more than the few recomputations
    val distinctAggs = sp.aggs.filter(_.fn == "count_distinct")
    val onePass = distinctAggs.size == 1
    val delta =
      if (!onePass && lastPacked != 0L && distinctAggs.nonEmpty)
        delta0.localCheckpoint()
      else delta0

    val packedEff = pack(effF, effD)
    // ── additive fold: the shared algebra (one copy for all view kinds)
    val s = col(SignCol)
    val accTypes = MaterializedAggView.accumulatorTypes(sp.aggs, delta.schema)
    val sqTypes = MaterializedAggView.sumSqTypes(sp.aggs, delta.schema)
    val deltaAggs: Seq[Column] = MaterializedAggView.deltaAggsFor(
      sp.aggs, mcol, s, accTypes, sqTypes, delta.schema)
    val (grouped0, preparedPairs): (DataFrame, Option[DataFrame]) =
      if (onePass) {
        val (d0, pp) = MaterializedAggView.onePassDeltas(delta, s, gk,
          mcol(distinctAggs.head.col.get), deltaAggs,
          MaterializedAggView.sumTypesOf(accTypes, sqTypes))
        (d0, Some(pp))
      } else
        // pinned caller-side (`grouped` below) for the same reason as the
        // sibling view: three downstream actions would otherwise re-run
        // both delta-join legs
        (delta.groupBy(gk.map(col): _*).agg(deltaAggs.head, deltaAggs.tail: _*),
          None)

    // count(distinct c) over the JOIN result: the signed joined delta IS
    // a signed feed as far as pair-count maintenance goes — the shared
    // fold tracks per-(group, value) occurrence counts in this view's aux
    // table and emits a distinct delta where a count crosses zero. The
    // aux COMMITS run on auxEc concurrently with the main-side fold below
    // (see MaterializedAggView.refreshLocked: the dc deltas derive from
    // the pinned pre-merge transition frames; the Await before the main
    // commit preserves aux-strictly-before-main)
    val dcPrepared: Seq[(DataFrame, () => Unit)] =
      distinctAggs.map { a =>
        MaterializedAggView.foldDistinct(spark, auxState(sp, a.as), delta,
          col(SignCol), gk, mcol(a.col.get), TxnId, packedEff, lastPacked,
          dcCol(a.as),
          beforeMerge = () => lock.check(),
          afterMerge = () => onStep(s"aux-merged:${a.as}"),
          prepared = preparedPairs)
      }
    val auxFuts = dcPrepared.map { case (_, c) =>
      scala.concurrent.Future(c())(MaterializedAggView.auxEc) }
    // dc-delta groups ⊆ delta groups (both derive from the joined delta)
    val grouped = dcPrepared.map(_._1).foldLeft(grouped0)((d, dd) => d.join(dd, gk, "left"))
      .localCheckpoint()
    // null group keys the state machinery cannot represent fail LOUDLY
    // rather than silently dropping through the key-equality merges below
    // (legacy pre-mask specs: all group columns; mask specs: stand-in-less
    // types the encoding passes through). Cheap: `grouped` is checkpointed
    // at O(changed groups) rows and the probe is skipped when nothing is
    // at risk.
    MaterializedAggView.requireNoUnguardedNullGroups(grouped, sp.nullMask,
      sp.groupBy, s"MaterializedJoinAggView $root")

    val accCols: Seq[(String, DataType)] =
      MaterializedAggView.accColsFor(sp.aggs, accTypes, sqTypes)
    // STAGE the main merge while the aux commits are in flight (finally-
    // Await: no aux commit may outlive this frame on any exit path — see
    // MaterializedAggView.refreshLocked for the orphan-commit race)
    val stagedMain: Option[BucketedSnapshotTable.StagedScd1] = try {
      val cur: DataFrame =
        if (!st.exists(spark)) {
          val fields = gk.map(g => grouped.schema(g)) ++
            accCols.map { case (n, t) => StructField(n, t, nullable = true) }
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], StructType(fields))
        } else graft.cdc.ScdMerge.scd1Current(
            st.readKeys(spark, grouped.select(gk.map(col): _*)))
          .select((gk ++ accCols.map(_._1)).map(col): _*)
      val curA = cur.select(gk.map(col) ++
        accCols.map { case (n, _) => col(n).as(s"__cur_$n") }: _*)
      val folded = accCols.foldLeft(grouped.join(curA, gk, "left")) {
        case (d, (n, t)) =>
          d.withColumn(n,
            (coalesce(col(s"__cur_$n").cast(t), lit(0).cast(t)) +
              coalesce(col(n).cast(t), lit(0).cast(t))).cast(t))
      }.select((gk ++ accCols.map(_._1)).map(col): _*)

      // pinned: the merge executes its updates plan twice (bucket-probe
      // collect + staging write) — O(changed groups) rows
      val upserts = folded.withColumn(SeqCol, lit(packedEff))
        .localCheckpoint()
      st.stageScd1Merge(spark, upserts, SeqCol,
        applyAsDeletes = Some(col(NCol) === 0L),
        txn = Some((TxnId, packedEff)))
    } finally auxFuts.foreach(fu =>
      scala.concurrent.Await.ready(fu, scala.concurrent.duration.Duration.Inf))
    auxFuts.foreach(fu =>
      scala.concurrent.Await.result(fu, scala.concurrent.duration.Duration.Inf))
    lock.check() // abort rather than double-commit if the lock was stolen
    val touched = stagedMain match {
      case Some(h) => st.commitStagedScd1(spark, h)
      case None => Set.empty[Int] // empty window / ledger-replayed batch
    }
    if (effF < math.max(factV, lastFV) || effD < math.max(dimV, lastDV)) {
      // the pinned replay stopped at the crashed window's end — fold the
      // rest of the history in an ordinary pass under the same lock
      val (v2, t2) = refreshLocked(spark, lock)
      (v2, touched ++ t2)
    } else ((effF, effD), touched)
  }

  /** Dim's visible rows at `v` for exactly the given join keys —
    * bucket-pruned point read PINNED to version `v`'s manifest when the
    * dim is bucketed by the join keys (a concurrent dim commit between
    * the refresh's version capture and this read must not shift the leg
    * forward — the ledger records `v`, and reading newer rows would
    * double-apply that window on the next refresh), else the version
    * read semi-joined. */
  private def dimVisiblePruned(spark: SparkSession, sp: Spec, v: Int,
      keyRows: DataFrame): DataFrame = {
    val pruned = BucketedSnapshotTable.layoutOf(spark, sp.dimRoot) match {
      case Some(l) if l.keys.contains(sp.joinKeys) =>
        new BucketedSnapshotTable(sp.dimRoot, l.numBuckets, sp.joinKeys)
          .readKeysAt(spark, keyRows, v)
      case _ =>
        graft.streaming.ChangeFeedSource.adapter(spark, Map("path" -> sp.dimRoot) ++
          (if (sp.dimKeys.nonEmpty) Map("keys" -> sp.dimKeys.mkString(",")) else Map.empty))
          .visibleAt(v).join(keyRows, sp.joinKeys, "left_semi")
    }
    graft.cdc.ScdMerge.scd1Current(pruned)
  }

  /** The fact's visible rows AS OF version `v`, restricted to the changed
    * dim join keys. Small key sets inline as an IN-list so the pruning
    * file index skips fact files via stats/Bloom sidecars at planning
    * time; wide dim rewrites fall back to a broadcast semi-join over the
    * version read. */
  private def factAsOfPruned(spark: SparkSession, sp: Spec, v: Int,
      changedKeys: DataFrame): DataFrame = {
    val asOf: DataFrame = BucketedSnapshotTable.layoutOf(spark, sp.factRoot) match {
      case Some(l) =>
        new BucketedSnapshotTable(sp.factRoot, l.numBuckets,
          l.keys.getOrElse(sp.factKeys)).readIndexed(spark, Some(v))
      case None => new SnapshotTable(sp.factRoot).readIndexed(spark, Some(v))
    }
    val visible = graft.cdc.ScdMerge.scd1Current(asOf)
    if (sp.joinKeys.size == 1) {
      val k = sp.joinKeys.head
      val vals = changedKeys.limit(MaxInlineKeys + 1).collect().map(_.get(0))
      if (vals.length <= MaxInlineKeys)
        return visible.filter(col(k).isInCollection(vals.toSeq))
    }
    visible.join(broadcast(changedKeys), sp.joinKeys, "left_semi")
  }

  /** The state in rollup-partial format (`__cnt`, `__sum_<m>`,
    * `__nn_<m>` keyed by the group columns) — what the transparent
    * [[graft.plans.AggRollupRewrite]] join routing consumes. */
  private def rollupFormat(spark: SparkSession, version: Int): DataFrame = {
    val sp = spec(spark)
    val raw0 = graft.cdc.ScdMerge.scd1Current(state(sp).readVersion(spark, version))
    val raw =
      if (sp.nullMask) MaterializedAggView.decodeNulls(raw0, sp.groupBy) else raw0
    raw.select(MaterializedAggView.rollupColumns(sp.aggs, sp.groupBy): _*)
  }


  /** Register TRANSPARENT routing: any `Aggregate` over the INNER
    * equi-join of the fact and dim snapshot relations on exactly the
    * view's join keys, whose grouping ⊆ the view's GROUP BY and whose
    * aggregates are covered, is rewritten by the optimizer to read this
    * view's state — a kilobyte read in place of the join, with NO query
    * change. Exact as of the last refreshed (factV, dimV) — the usual
    * materialized-view staleness contract. */
  def registerRewrite(spark: SparkSession): Unit = {
    val sp = spec(spark)
    val measures = sp.aggs.filterNot(a => a.fn == "count" && a.col.isEmpty)
      .flatMap(_.col).distinct
    // shared wiring: per-query (state version, ledger value) pin + pair
    // relations for coarse-grain COUNT(DISTINCT) routing (decoded when
    // the spec carries the null mask)
    val (provider, distincts) = MaterializedAggView.rewriteProviders(spark,
      state(sp), TxnId, sp.aggs, as => auxState(sp, as), groupKeys(sp),
      v => rollupFormat(spark, v),
      if (sp.nullMask) df => MaterializedAggView.decodeNulls(df, sp.groupBy)
      else identity)
    // derived dims (r14): resolve each declared expression against the
    // JOINED column namespace (fact columns ++ the dim's additional
    // columns — exactly what a query grouping over the join resolves in)
    val derivedExprs = joinedSchema(spark, sp) match {
      case None => Map.empty[String,
        org.apache.spark.sql.catalyst.expressions.Expression]
      case Some(sc) => MaterializedAggView.resolveDerivedDims(spark, sc,
        sp.derived, s"MaterializedJoinAggView $root")
    }
    graft.plans.AggRollupRewrite.registerJoinView(spark, sp.factRoot,
      sp.dimRoot, sp.joinKeys, sp.groupBy, measures, provider, distincts,
      derivedExprs)
  }

  /** The fact ⋈ dim output schema (fact columns first, then the dim's
    * non-join columns) — the resolution namespace for derived-dim
    * expressions. None when either source is still empty. */
  private def joinedSchema(spark: SparkSession, sp: Spec): Option[StructType] = {
    if (sp.derived.isEmpty) return None
    val ff = factFeed(spark, sp); val df = dimFeed(spark, sp)
    for (fv <- ff.currentVersion; dv <- df.currentVersion) yield {
      val fS = ff.visibleAt(fv).schema
      val have = fS.fieldNames.toSet
      StructType(fS.fields.toSeq ++
        df.visibleAt(dv).schema.fields.toSeq.filterNot(f2 => have(f2.name)))
    }
  }

  /** Remove this view's transparent routing (SQL `ALTER MATERIALIZED
    * JOIN VIEW … DISABLE REWRITE`). */
  def unregisterRewrite(spark: SparkSession): Unit = {
    val sp = spec(spark)
    graft.plans.AggRollupRewrite.unregisterJoinView(sp.factRoot, sp.dimRoot)
  }

  /** Reclaim storage accumulated by refresh commits — state table to
    * `keep` versions, count-distinct aux tables to at least 2 (the
    * crash-replay pin needs at most one version of lookback; see
    * [[MaterializedAggView.vacuum]]). Returns the aux retention applied
    * (None = no aux tables). */
  def vacuum(spark: SparkSession, keep: Int = 2): Option[Int] = {
    val sp = spec(spark)
    MaterializedAggView.vacuumView(spark, state(sp), sp.aggs,
      as => auxState(sp, as), keep)
  }

  /** Group columns + one column per declared aggregate (avg as DOUBLE,
    * SQL null semantics). */
  def read(spark: SparkSession): DataFrame = {
    val sp = spec(spark)
    val raw0 = graft.cdc.ScdMerge.scd1Current(state(sp).read(spark))
    val raw =
      if (sp.nullMask) MaterializedAggView.decodeNulls(raw0, sp.groupBy) else raw0
    val outs: Seq[Column] = MaterializedAggView.readOutputs(sp.aggs)
    raw.select(sp.groupBy.map(col) ++ outs: _*)
  }
}

object MaterializedJoinAggView {
  import MaterializedAggView.Agg

  private val TxnId = "mvj"
  private val SignCol = "__mvj_sign"
  private val MaxInlineKeys = 1000
  private def nnCol(as: String) = s"__mv_nn_$as"
  private def sumCol(as: String) = s"__mv_sum_$as"
  private def dcCol(as: String) = s"__mv_dc_$as"

  private def pack(factV: Int, dimV: Int): Long = (factV.toLong << 20) | dimV.toLong
  private def unpack(p: Long): (Int, Int) = ((p >> 20).toInt, (p & ((1L << 20) - 1)).toInt)

  final case class Spec(factRoot: String, factKeys: Seq[String],
      dimRoot: String, dimKeys: Seq[String], joinKeys: Seq[String],
      groupBy: Seq[String], aggs: Seq[Agg], numBuckets: Int,
      nullMask: Boolean = true,
      /** DERIVED dimension columns (r14): (state column name, SQL expr
        * over the JOINED row) — `month(o_orderdate) AS m` in the view
        * DDL, maintained exactly like any group column (see
        * [[MaterializedAggView.Spec.derived]]). */
      derived: Seq[(String, String)] = Nil)

  /** Declare the view (no data moves until the first refresh). Join-view
    * aggregates: the additive set plus `count(distinct c)` (maintained
    * exactly via the aux occurrence table over the JOIN result — the
    * signed joined delta is a plain signed feed as far as pair counts
    * go). min/max stay out: they would need rescans over the JOIN, a
    * cost class [[MaterializedAggView]]'s single-table RESCAN mode
    * prices but a join cannot bound. */
  def create(spark: SparkSession, root: String,
      factRoot: String, factKeys: Seq[String],
      dimRoot: String, dimKeys: Seq[String],
      joinKeys: Seq[String], groupBy: Seq[String], aggs: Seq[Agg],
      numBuckets: Int = 16,
      derived: Seq[(String, String)] = Nil): MaterializedJoinAggView = {
    require(joinKeys.nonEmpty, "join view needs join keys")
    require(groupBy.nonEmpty, "join view needs GROUP BY columns")
    MaterializedAggView.validateDerived(groupBy, aggs, derived)
    derived.foreach { case (n, _) => require(!joinKeys.contains(n),
      s"derived dim '$n' collides with a join key") }
    require(groupBy.size <= 63, "the null mask is a 64-bit bitmask — at " +
      "most 63 GROUP BY columns")
    require(!(groupBy ++ aggs.flatMap(_.col)).exists(_.startsWith("__mv_")),
      "column names starting with __mv_ are reserved for view bookkeeping")
    require(aggs.nonEmpty, "join view needs at least one aggregate")
    aggs.foreach { a =>
      require((Set("count", "sum", "avg", "count_distinct") ++
        MaterializedAggView.VarFns)(a.fn),
        s"join views maintain additive and count-distinct aggregates — '${a.fn}' is not")
      require(a.fn == "count" || a.col.nonEmpty, s"${a.fn} needs a column")
    }
    require(aggs.map(_.as).distinct.size == aggs.size, "duplicate aggregate aliases")
    val mv = new MaterializedJoinAggView(root)
    val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new Path(root, "_mvj")
    if (f.exists(p))
      throw new IllegalArgumentException(s"MaterializedJoinAggView $root already exists")
    val content =
      s"""factRoot=$factRoot
         |factKeys=${factKeys.mkString(",")}
         |dimRoot=$dimRoot
         |dimKeys=${dimKeys.mkString(",")}
         |joinKeys=${joinKeys.mkString(",")}
         |groupBy=${groupBy.mkString(",")}
         |aggs=${aggs.map(_.render).mkString(",")}
         |numBuckets=$numBuckets
         |nullMask=1
         |""".stripMargin +
        derived.map { case (n, e) => s"derived.$n=$e\n" }.mkString
    val out = f.create(p, false)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    mv
  }
}
