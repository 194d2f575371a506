package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.pipeline.{ExtractLoadJob, RunAudit, RunLock}
import graft.sources.Generator

/** §3.1 batch-leg saga: the three observable outcomes + audit rows. */
class PipelineSpec extends SparkSpec {

  private def mkJob(extract: () => Option[org.apache.spark.sql.DataFrame]) = {
    val base = Files.createTempDirectory("etl")
    val lock = new RunLock(base.resolve("lock"))
    val audit = new RunAudit(base.resolve("audit").toString)
    val job = new ExtractLoadJob(spark, extract, base.resolve("landing").toString,
      lock, audit, "worker-1")
    (job, lock, audit, base)
  }

  test("successful run lands data partitioned by LogicalPartition and audits success") {
    val (job, lock, audit, base) = mkJob(
      () => Some(Generator.sampleItems(spark, 30).drop("i")))
    val out = job.runOnce()
    assert(out.isInstanceOf[job.Completed])
    val landed = spark.read.parquet(base.resolve("landing").toString)
    assert(landed.count() == 30)
    // P3: fresh uuid per landed row
    assert(landed.select("id").distinct().count() == 30)
    // landing is hive-partitioned on the reference's Cosmos PK
    val parts = landed.select("LogicalPartition").distinct().collect().map(_.getString(0))
    assert(parts.toSet == Set("Partition_A", "Partition_B", "Partition_C"))
    val runs = audit.read(spark).collect()
    assert(runs.length == 1 && runs.head.Succeeded && !runs.head.ForcedLease)
    assert(runs.head.AdditionlInfo.startsWith("Successful extracted and saved 30 documents"))
    assert(!lock.isLocked, "lease must be released after the run")
  }

  test("null extract is an EMPTY SUCCESSFUL run with the distinct message") {
    val (job, _, audit, _) = mkJob(() => None)
    job.runOnce()
    val runs = audit.read(spark).collect()
    assert(runs.length == 1 && runs.head.Succeeded)
    assert(runs.head.AdditionlInfo ==
      "Successful executed the orchestration. No documents retrieved from the Extract endpoint.")
  }

  test("throwing extract releases with Succeeded=false and rethrows") {
    val (job, lock, audit, _) = mkJob(() => throw new RuntimeException("boom"))
    intercept[RuntimeException](job.runOnce())
    val runs = audit.read(spark).collect()
    assert(runs.length == 1 && !runs.head.Succeeded)
    assert(runs.head.AdditionlInfo.contains("boom"))
    assert(!lock.isLocked)
  }

  test("held lease skips the run entirely (no audit row)") {
    val (job, lock, audit, base) = mkJob(
      () => Some(Generator.sampleItems(spark, 5).drop("i")))
    assert(lock.tryAcquire("other-worker").isDefined)
    assert(job.runOnce() == job.Skipped)
    assert(!Files.exists(base.resolve("audit")))
  }
}
