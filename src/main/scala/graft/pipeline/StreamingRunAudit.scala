package graft.pipeline

import java.sql.Timestamp
import java.util.UUID
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import graft.model.OrchestrationRun

/** Streaming mirror of the run-audit table (SURVEY.md §2.9 O2 / §1.4):
  * the reference audits one `OrchestrationRun` row per finished batch
  * orchestration; the streaming leg gets the same observability from a
  * [[StreamingQueryListener]] — one audit row per COMMITTED micro-batch
  * carrying rows processed and batch duration, plus a `Succeeded=false`
  * row if the query dies.
  *
  * Zero cost on the data path: progress events ride the listener bus
  * (driver-side, async), so the audit never adds an action or a scan to
  * the stream itself — the streaming analogue of the batch leg's
  * `observe()` metrics.
  *
  * Register with `spark.streams.addListener(new StreamingRunAudit(...))`;
  * scope it to one query by name via `queryName`.
  */
final class StreamingRunAudit(
    spark: SparkSession,
    audit: RunAudit,
    worker: String,
    queryName: Option[String] = None) extends StreamingQueryListener {

  private def wants(name: String): Boolean =
    queryName.forall(_ == name)

  override def onQueryStarted(
      event: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(
      event: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = event.progress
    if (wants(Option(p.name).getOrElse("")) && p.numInputRows > 0) {
      // progress.timestamp is the trigger START instant (ISO-8601)
      val start = Timestamp.from(java.time.Instant.parse(p.timestamp))
      val durMs = Option(p.durationMs.get("triggerExecution"))
        .map(_.longValue).getOrElse(0L)
      audit.append(spark, OrchestrationRun(
        id = UUID.randomUUID().toString,
        StartTime = start,
        EndTime = new Timestamp(start.getTime + durMs),
        Duration = durMs / 1000.0,
        ForcedLease = false,
        Succeeded = true,
        OrchestrationWorker = worker,
        // numInputRows counts trigger-INPUT rows across all sources, not
        // rows actually written — "ingested" keeps the audit truthful
        // when a batch filters rows or the query has several sources
        AdditionlInfo =
          s"Ingested ${p.numInputRows} input rows in micro-batch ${p.batchId}."))
    }
  }

  override def onQueryTerminated(
      event: StreamingQueryListener.QueryTerminatedEvent): Unit = {
    event.exception.foreach { e =>
      val now = new Timestamp(System.currentTimeMillis())
      audit.append(spark, OrchestrationRun(
        id = UUID.randomUUID().toString,
        StartTime = now, EndTime = now, Duration = 0.0,
        ForcedLease = false, Succeeded = false,
        OrchestrationWorker = worker,
        AdditionlInfo =
          s"There was errors while executing the orchestration. Exception info: $e"))
    }
  }
}
