package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.tables.SnapshotTable

/** Exactly-once streaming append into a [[SnapshotTable]] — the
  * streaming-sink side of the transactional table (the Delta streaming
  * sink analog; reference K3/K4 land streams in Delta tables — see
  * `Databrick/spotify_dab/src/silver/dlt/transformations/SongsRaw.py`).
  *
  * `foreachBatch` + checkpoint is only at-least-once: after a crash
  * between a batch's write and the checkpoint commit, the restarted query
  * REPLAYS that batch. Routing the write through
  * [[SnapshotTable.appendTxn]] closes the gap — the table records the
  * high-water `batchId` per query in its commit critical section, so the
  * replayed batch is a clean no-op and every source record lands in the
  * table exactly once.
  *
  * Scale shape: each micro-batch commit is O(increment) (manifest append,
  * never a snapshot rewrite), so a high-frequency stream does not spend
  * its trigger interval rewriting history; `optimizeCompact` is the
  * matching maintenance job for the small files the stream accretes.
  */
object SnapshotSink {

  /** Drain `df` (a streaming DataFrame) into `table` with AvailableNow
    * semantics, exactly-once under replay. `queryId` keys the transaction
    * watermark — one stable id per logical stream into this table. */
  def appendStreamOnce(df: DataFrame, table: SnapshotTable,
      checkpointDir: String, queryId: String): Unit =
    AutoIngest.foreachBatchOnce(df, checkpointDir) { (batch, id) =>
      table.appendTxn(batch.sparkSession, batch, Some((queryId, id)))
      ()
    }
}
