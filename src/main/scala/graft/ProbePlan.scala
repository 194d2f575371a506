package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch instrumentation main: runs one SparkEntry query with a stage
  * listener so per-stage wall times are visible. Not part of the driver
  * contract. Usage: runMain graft.ProbePlan <name> [explain].
  */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val dur = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s)
          .getOrElse(-1L)
        println(f"STAGE ${i.stageId}%4d ${dur}%6dms tasks=${i.numTasks}%4d ${i.name.take(90)}")
      }
    })

    val name = args.headOption.getOrElse("dedup_apply_pairs")
    val fn = SparkEntry.queries(name)
    if (args.contains("explain")) fn(spark, sfDir).explain("formatted")
    (1 to 2).foreach { r =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"RUN$r ${(System.nanoTime() - t0) / 1e9}%7.2fs  ($name)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
