package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.tables.BucketedSnapshotTable

/** Exactly-once streaming CDC merge into a [[BucketedSnapshotTable]] —
  * the 100 TB counterpart of [[SnapshotSink]] (which appends to a plain
  * snapshot table): each micro-batch runs the SCD merge algebra against
  * ONLY the buckets its keys hash to, so a high-frequency CDC stream into
  * a 4096-bucket table rewrites a handful of buckets per trigger, never
  * the table.
  *
  * Exactly-once under replay: `foreachBatch` + checkpoint alone is
  * at-least-once — after a crash between a batch's commit and the
  * checkpoint write, the restarted query REPLAYS that batch. The table's
  * manifest header carries a `txn:<queryId>=<batchId>` ledger written in
  * the same commit critical section as the data, so a replayed batch is
  * recognized and skipped (checked cheaply before staging, and
  * authoritatively inside the commit lock for racing restarts). The SCD
  * algebra itself is replay-idempotent too — the ledger just avoids the
  * wasted re-stage and keeps version history clean.
  *
  * Reference semantics: the DLT auto-CDC flows (FactStream.py:12-21 SCD1,
  * DimUser.py:20-29 SCD2) landing in a bucketed transactional target.
  */
object BucketedSink {

  /** Drain `df` (a streaming DataFrame) into `table` as SCD1 (last-write-
    * wins by `seqCol`) with AvailableNow semantics, exactly-once under
    * replay. `queryId` keys the transaction ledger — one stable id per
    * logical stream into this table. */
  def scd1StreamOnce(df: DataFrame, table: BucketedSnapshotTable,
      checkpointDir: String, queryId: String, seqCol: String,
      tieBreak: Seq[Column] = Nil,
      applyAsDeletes: Option[Column] = None): Unit =
    AutoIngest.foreachBatchOnce(df, checkpointDir) { (batch, id) =>
      table.scd1Merge(batch.sparkSession, batch, seqCol, tieBreak,
        applyAsDeletes, txn = Some((queryId, id)))
      ()
    }

  /** SCD2 variant: full `__START_AT`/`__END_AT` version chains per key,
    * micro-batch merges bucket-pruned and exactly-once as above. */
  def scd2StreamOnce(df: DataFrame, table: BucketedSnapshotTable,
      checkpointDir: String, queryId: String, seqCol: String,
      tieBreak: Seq[Column] = Nil,
      applyAsDeletes: Option[Column] = None): Unit =
    AutoIngest.foreachBatchOnce(df, checkpointDir) { (batch, id) =>
      table.scd2Merge(batch.sparkSession, batch, seqCol, tieBreak,
        applyAsDeletes, txn = Some((queryId, id)))
      ()
    }
}
