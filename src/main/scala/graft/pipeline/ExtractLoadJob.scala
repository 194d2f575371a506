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
    worker: String,
    dedupeByContent: Boolean = false) {

  /** Opt-in fix for the reference's by-design re-landing duplication
    * (fresh GUID per row ⇒ every re-run duplicates data, EtlProcess.cs:174;
    * SURVEY.md §7.4.7): anti-join the batch against the landing zone's
    * content fingerprints before writing. One hash column + one left-anti
    * join — at scale the fingerprint set is a bucketed ledger table
    * instead of a rescan. */
  private def dropAlreadyLanded(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val contentCols = df.columns.filterNot(_ == "id").sorted
    // sha2, not md5: a fingerprint COLLISION here silently drops a
    // genuinely-new document, and md5 collisions are constructible from
    // attacker-supplied content — the one property this anti-join
    // depends on. Both sides fingerprint at run time (nothing stored),
    // so there is no hash migration.
    def fp(d: DataFrame) = d.withColumn("_fp", sha2(concat_ws("\u0001",
      contentCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*), 256))
    val existing =
      try Some(spark.read.parquet(landingDir))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    existing match {
      case None => df
      case Some(e) =>
        fp(df).join(fp(e).select(col("_fp")).distinct(), Seq("_fp"), "left_anti")
          .drop("_fp")
    }
  }

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
        // once-only: the catch-all below re-invokes this on ANY throw —
        // including an audit-write failure AFTER a successful release. A
        // second run would re-release (logging a bogus "lost lease") and
        // overwrite the outcome with Succeeded=false for a run whose data
        // landed; the guard makes the retry a no-op and lets the original
        // exception surface.
        var finished = false
        def releaseAndAudit(succeeded: Boolean, msg: String): Unit = {
          if (finished) return
          finished = true
          val end = new Timestamp(System.currentTimeMillis())
          if (!lock.release(lease))
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"RunLock: worker $worker lost its lease before release " +
                "(expired and stolen); leaving the new holder's lock")
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
              val toLand = if (dedupeByContent) dropAlreadyLanded(df) else df
              // The audited count (A1, EtlProcess.cs:64) rides the WRITE
              // itself via observe(): one action, one scan — the metric is
              // by construction the rows actually written, so no persist +
              // second count() pass (and no risk of a source changing
              // between two executions). At 100 TB this halves the leg's
              // I/O; extra data-quality counters are free on the same pass.
              val obs = new org.apache.spark.sql.Observation(
                s"land-$worker-${UUID.randomUUID()}")
              // P3: fresh uuid per LANDED row (EtlProcess.cs:174)
              val landed = toLand.withColumn("id", expr("uuid()"))
                .observe(obs, count(lit(1)).as("n"),
                  count(when(col("LogicalPartition").isNull, 1))
                    .as("n_null_partition"))
              landed.write.mode(SaveMode.Append)
                .partitionBy("LogicalPartition").parquet(landingDir)
              val n = obs.get("n").asInstanceOf[Long]
              val nNullPart = obs.get("n_null_partition").asInstanceOf[Long]
              if (nNullPart > 0)
                org.slf4j.LoggerFactory.getLogger(getClass).warn(
                  s"ExtractLoadJob: $nNullPart rows landed with a null " +
                    "LogicalPartition (written to the null partition)")
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
