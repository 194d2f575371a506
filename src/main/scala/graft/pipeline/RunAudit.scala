package graft.pipeline

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import graft.model.OrchestrationRun

/** Append-only run-audit table — the reference's `orchestrationRuns`
  * container (EtlProcess.cs:105-131, SURVEY.md §2.9 O2) as a Parquet
  * append. One row per finished run, `AdditionlInfo` typo preserved for
  * wire fidelity (OrchestrationRun.cs:17).
  */
final class RunAudit(path: String) {

  def append(spark: SparkSession, run: OrchestrationRun): Unit = {
    import spark.implicits._
    Seq(run).toDS().write.mode(SaveMode.Append).parquet(path)
  }

  def read(spark: SparkSession): Dataset[OrchestrationRun] = {
    import spark.implicits._
    spark.read.schema(graft.model.Model.orchestrationRunSchema)
      .parquet(path).as[OrchestrationRun]
  }
}
