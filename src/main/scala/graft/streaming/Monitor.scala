package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

/** Pipeline monitoring (SURVEY.md §2.A T1, P11): the engine analog of
  * the reference's state-poll loops (`monitorMskcConnector`,
  * `/root/reference/bin/mskc-connector.sh:461-489`;
  * `bin/msk-cluster.sh:111-140`), which poll every ~6 s and render
  * elapsed time as HH:MM:SS (`bin/msk-cluster.sh:129`).
  *
  * Spark-native: a [[StreamingQueryListener]] receives progress events
  * push-style (no polling the control plane), and `pollUntil` covers the
  * blocking-wait shape for callers that want the reference's loop.
  */
object Monitor {

  /** One recorded progress tick. */
  final case class Tick(queryId: String, batchId: Long, numInputRows: Long,
                        timestamp: String)

  /** Listener that records every progress event (bounded by caller use;
    * detach with `spark.streams.removeListener`).
    */
  final class RecordingListener extends StreamingQueryListener {
    private val q = new ConcurrentLinkedQueue[Tick]()
    def ticks: Seq[Tick] = {
      val it = q.iterator(); val b = Seq.newBuilder[Tick]
      while (it.hasNext) b += it.next()
      b.result()
    }
    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit =
      q.add(Tick(e.progress.id.toString, e.progress.batchId,
        e.progress.numInputRows, e.progress.timestamp))
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }

  def attach(spark: SparkSession): RecordingListener = {
    val l = new RecordingListener
    spark.streams.addListener(l)
    l
  }

  /** The reference's elapsed-time rendering
    * (`date -u --date now-${N}sec '+%H:%M:%S'`). */
  def elapsedHms(millis: Long): String = {
    val s = millis / 1000
    f"${s / 3600}%02d:${(s % 3600) / 60}%02d:${s % 60}%02d"
  }

  /** Poll `condition` every `intervalMs` until true or `timeoutMs` —
    * the monitor-loop shape; returns total elapsed millis, or -1 on
    * timeout.
    */
  def pollUntil(condition: () => Boolean, intervalMs: Long = 200,
                timeoutMs: Long = 30000): Long = {
    val t0 = System.currentTimeMillis()
    while (System.currentTimeMillis() - t0 < timeoutMs) {
      if (condition()) return System.currentTimeMillis() - t0
      Thread.sleep(intervalMs)
    }
    -1L
  }

  /** Block until a streaming query goes idle (no data available) — the
    * "state left CREATING" analog for AvailableNow test runs.
    */
  def awaitIdle(query: StreamingQuery, timeoutMs: Long = 60000): Boolean =
    pollUntil(() => !query.status.isDataAvailable &&
      !query.status.isTriggerActive, 100, timeoutMs) >= 0
}
