package graft.sources

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.util.QueryExecutionListener

/** Log DELIVERY sink (SURVEY.md §2.A K5): the engine analog of the
  * reference's broker/connector log delivery — `LoggingInfo` routing
  * MSK broker logs to S3/CloudWatch (`/root/reference/bin/
  * msk-cluster.sh:73-85`) and connector logs likewise
  * (`bin/mskc-connector.sh:316-328`). The reference DELIVERS runtime
  * telemetry to a durable, queryable store; the Spark-first
  * equivalent delivers the engine's own execution telemetry — batch
  * query completions/failures and streaming progress ticks — to a
  * parquet log directory any session (or DuckDB) can scan.
  *
  * Where [[graft.streaming.Monitor]] is the LIVE view (push-style
  * listener, in-memory ticks, the reference's monitor loop), this is
  * the DURABLE one: same events, landed in the lake.
  *
  * Scale design: records are driver-side telemetry (bytes per query,
  * not per row), buffered in memory and written only on `flush()` —
  * the caller picks the cadence, so there is no per-event small-file
  * storm; each flush appends ONE parquet file of however many records
  * accumulated. Reading is a plain parquet scan, so retention is file
  * deletion and downstream analysis is just another query.
  */
object LogDelivery {

  /** One delivered telemetry record. `detail` is a JSON bag for
    * kind-specific fields so the on-disk schema stays stable as kinds
    * are added — the same schema-stability trick the CDC envelope
    * uses for payloads.
    */
  final case class Record(ts_ms: Long, kind: String, name: String,
      duration_ms: Long, rows: Long, status: String, detail: String)

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")

  /** An attached delivery: buffers engine telemetry until `flush()`.
    * Detach with `close()` (flushes first).
    */
  final class Delivery private[LogDelivery] (spark: SparkSession,
      dir: String) {
    private val buf = new ConcurrentLinkedQueue[Record]()
    private val flushSeq = new AtomicLong(0L)

    // flush()'s own parquet write is an action on THIS session, so it
    // re-enters the batch listener (ADVICE r6): left unchecked, every
    // flush enqueues a record for itself — the buffer never settles at
    // 0 on an idle engine and the log accumulates self-telemetry. The
    // flush write is recognized by its PLAN (a file write into the
    // delivery dir), not by a timing flag: execution-listener events
    // are delivered asynchronously, so an in-flush boolean could clear
    // before the event arrives.
    private val deliveryPath = {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .makeQualified(p).toUri.getPath
    }
    private def isSelfWrite(qe: QueryExecution): Boolean =
      qe.analyzed.collect {
        case i: org.apache.spark.sql.execution.datasources
            .InsertIntoHadoopFsRelationCommand => i.outputPath
      }.exists(p => p.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
        .makeQualified(p).toUri.getPath == deliveryPath)

    private val batchListener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = if (!isSelfWrite(qe)) {
        val rows = qe.executedPlan.metrics.get("numOutputRows")
          .map(_.value).getOrElse(-1L)
        buf.add(Record(System.currentTimeMillis(), "batch", funcName,
          durationNs / 1000000L, rows, "success",
          s"""{"plan_nodes":${qe.executedPlan.collectLeaves().size}}"""))
      }
      override def onFailure(funcName: String, qe: QueryExecution,
          error: Exception): Unit = if (!isSelfWrite(qe))
        buf.add(Record(System.currentTimeMillis(), "batch", funcName,
          -1L, -1L, "failure",
          s"""{"error":"${esc(String.valueOf(error.getMessage))}"}"""))
    }

    private val streamListener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        buf.add(Record(System.currentTimeMillis(), "stream", e.name match {
          case null => e.id.toString
          case n => n
        }, -1L, -1L, "started", s"""{"run_id":"${e.runId}"}"""))
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        buf.add(Record(System.currentTimeMillis(), "stream",
          Option(e.progress.name).getOrElse(e.progress.id.toString),
          e.progress.batchDuration, e.progress.numInputRows, "progress",
          s"""{"batch_id":${e.progress.batchId}}"""))
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        buf.add(Record(System.currentTimeMillis(), "stream",
          e.id.toString, -1L, -1L,
          e.exception.map(_ => "failed").getOrElse("terminated"),
          e.exception.map(m => s"""{"error":"${esc(m)}"}""")
            .getOrElse("{}")))
    }

    spark.listenerManager.register(batchListener)
    spark.streams.addListener(streamListener)

    /** Deliver everything buffered so far as ONE appended parquet
      * file; returns the number of records delivered. Thread-safe
      * with concurrent event arrival (drains what it sees).
      */
    def flush(): Long = {
      val drained = Seq.newBuilder[Record]
      var r = buf.poll()
      while (r != null) { drained += r; r = buf.poll() }
      val rs = drained.result()
      if (rs.nonEmpty) {
        import spark.implicits._
        // coalesce(1): telemetry volume is driver-scale; one file per
        // flush keeps the log dir listing ∝ flush count, not cores
        spark.createDataset(rs).coalesce(1)
          .write.mode("append").parquet(dir)
        flushSeq.incrementAndGet()
      }
      rs.size.toLong
    }

    def flushes: Long = flushSeq.get()

    /** Flush and detach both listeners. Recording stops at unregister:
      * an event still in flight on the async listener bus when close()
      * runs is dropped — the contract is "telemetry up to close", not
      * a transactional tail.
      */
    def close(): Unit = {
      flush()
      spark.listenerManager.unregister(batchListener)
      spark.streams.removeListener(streamListener)
    }
  }

  /** Attach a delivery to `spark`, landing telemetry under `dir`. */
  def attach(spark: SparkSession, dir: String): Delivery =
    new Delivery(spark, dir)

  /** The delivered log as a DataFrame — retention/analysis is just
    * another parquet scan.
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
