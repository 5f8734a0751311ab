package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.StreamingQueryListener

/** C6 observability — surfaces `observe()` metrics (the expectation
  * violation counters attached by [[graft.ops.Expectations]]) from
  * streaming queries, the engine's analog of the DLT expectations UI
  * (readme.md:119-120). Register once per session:
  * `spark.streams.addListener(listener)`.
  *
  * Metrics accumulate per observation name across micro-batches
  * (violation counts are summed — each batch reports its own batch-local
  * counts).
  */
final class QualityListener extends StreamingQueryListener {

  private val metrics = TrieMap.empty[String, Map[String, Long]]

  /** observation name → (metric column → accumulated count). */
  def snapshot: Map[String, Map[String, Long]] = metrics.toMap

  def clear(): Unit = metrics.clear()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    e.progress.observedMetrics.forEach { (name: String, row: Row) =>
      val batch = row.schema.fieldNames.map { f =>
        val v = row.getAs[Any](f) match {
          case n: Number => n.longValue()
          case _         => 0L
        }
        f -> v
      }.toMap
      metrics.updateWith(name) {
        case Some(prev) => Some(batch.map { case (k, v) => k -> (v + prev.getOrElse(k, 0L)) } ++
          (prev -- batch.keySet))
        case None => Some(batch)
      }
    }
  }
}
