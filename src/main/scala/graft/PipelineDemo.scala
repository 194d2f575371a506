package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{ExtractLoadJob, RunAudit, RunLock}
import graft.sources.Generator
import graft.streaming.TransformStream

/** End-to-end demo of the reference pipeline shape (SURVEY.md §3):
  * generate → Extract/Load (leased, audited, partitioned landing) →
  * change-feed-style streaming Transform → read back. Prints a one-line
  * JSON summary. Usage: runMain graft.PipelineDemo [nItems]
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.filterNot(_.startsWith("--")).map(_.toLong).getOrElse(100L)
    val dedup = args.contains("--dedup")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Files.createTempDirectory("graft-demo")
    val lock = new RunLock(base.resolve("lock"))
    val audit = new RunAudit(base.resolve("audit").toString)
    val landing = base.resolve("landing").toString
    // --dedup: frozen-content source + content ledger, run TWICE — the
    // second run must land zero rows (SURVEY.md §7.4.7 opt-in fix)
    def mkJob(lockName: String) = new ExtractLoadJob(spark,
      () => Some(
        if (dedup) Generator.sampleItems(spark, n, Some("2026-01-01 00:00:00"),
          deterministicIds = true).drop("i")
        else Generator.sampleItems(spark, n).drop("i")),
      landing, new RunLock(base.resolve(lockName)), audit, "demo-worker",
      dedupeByContent = dedup)

    val outcome = mkJob("lock1").runOnce()
    if (dedup) mkJob("lock2").runOnce()

    val ts = new TransformStream(spark, landing,
      base.resolve("transformed").toString, base.resolve("cp").toString,
      "East US,West US", maxFilesPerTrigger = 1)
    val q = ts.start()
    q.processAllAvailable(); q.stop()

    val transformed = ts.readTransformed()
    val nT = transformed.count()
    val nBatches = transformed.select("TransformBatch").distinct().count()
    val p2Violations = transformed.filter(
      col("Description").isNull || trim(col("Description")) === "" ||
        col("Name").isNull || trim(col("Name")) === "").count()
    val auditRows = audit.read(spark).collect()
      .map(r => s""""${r.AdditionlInfo.take(60)}"""").mkString("[", ",", "]")

    println(s"""{"outcome":"$outcome","landed":$n,"transformed":$nT,""" +
      s""""batches":$nBatches,"p2_violations":$p2Violations,"audit":$auditRows,""" +
      s""""dir":"$base"}""")
    spark.stop()
  }
}
