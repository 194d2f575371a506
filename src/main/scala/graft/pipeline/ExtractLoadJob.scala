package graft.pipeline

import java.sql.Timestamp
import java.util.UUID
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.OrchestrationRun

/** The batch Extract→Load leg — the reference's orchestrator saga
  * (EtlProcess.cs:48-86, SURVEY.md §3.1) as a single-driver Spark job:
  * lease → extract → land → release+audit, with the reference's three
  * observable outcomes and messages:
  *
  *  - extract returned data  → land it, success audit (EtlProcess.cs:64)
  *  - extract returned null  → EMPTY SUCCESSFUL run, distinct audit
  *    message (EtlProcess.cs:66-69; "error-as-null" contract S1/P8-P9,
  *    SURVEY.md §7.4.6 — reproduce the branch, don't throw)
  *  - anything threw         → release with Succeeded=false + exception
  *    text, rethrow (EtlProcess.cs:79-85)
  *
  * Landing layout: Parquet partitioned by `LogicalPartition` — the
  * reference's Cosmos partition key `/LogicalPartition` (EtlProcess.cs:165).
  * Each landed row gets a FRESH uuid (P3, EtlProcess.cs:174): re-runs
  * duplicate data by design; `graft.ext.Dedup` is the opt-in fix.
  */
final class ExtractLoadJob(
    spark: SparkSession,
    extract: () => Option[DataFrame], // None == the reference's null-on-error
    landingDir: String,
    lock: RunLock,
    audit: RunAudit,
    worker: String) {

  sealed trait Outcome
  case object Skipped extends Outcome
  final case class Completed(landed: Long, forced: Boolean) extends Outcome

  def runOnce(): Outcome = {
    lock.tryAcquire(worker) match {
      case None =>
        // "Orchestration lease already in place. Skipping execution." (EtlProcess.cs:75)
        Skipped
      case Some(lease) =>
        val start = new Timestamp(lease.startMillis)
        def releaseAndAudit(succeeded: Boolean, msg: String): Unit = {
          val end = new Timestamp(System.currentTimeMillis())
          lock.release()
          audit.append(spark, OrchestrationRun(
            id = UUID.randomUUID().toString,
            StartTime = start,
            EndTime = end,
            Duration = (end.getTime - start.getTime) / 1000.0, // A4
            ForcedLease = lease.forced,
            Succeeded = succeeded,
            OrchestrationWorker = worker,
            AdditionlInfo = msg))
        }
        try {
          extract() match {
            case Some(df) =>
              // P3: fresh uuid per LANDED row (EtlProcess.cs:174)
              val landed = df.withColumn("id", expr("uuid()"))
              landed.write.mode(SaveMode.Append)
                .partitionBy("LogicalPartition").parquet(landingDir)
              // A1: items.Count() — THIS run's extracted items (EtlProcess.cs:64),
              // counted on the input (the landing dir is cumulative across runs).
              val n = df.count()
              releaseAndAudit(succeeded = true,
                s"Successful extracted and saved $n documents. Documents will be " +
                  "processed automatically by the TransformDocument function.")
              Completed(n, lease.forced)
            case None =>
              releaseAndAudit(succeeded = true,
                "Successful executed the orchestration. No documents retrieved " +
                  "from the Extract endpoint.")
              Completed(0L, lease.forced)
          }
        } catch {
          case e: Throwable =>
            releaseAndAudit(succeeded = false,
              s"There was errors while executing the orchestration. Exception info: $e")
            throw e
        }
    }
  }
}
