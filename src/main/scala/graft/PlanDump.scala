package graft

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for named queries (plan-quality review).
  * Usage: runMain graft.PlanDump q1_agg q5_multi_join ...
  *
  * Session config MIRRORS [[Bench]] (AQE off, data-sized shuffle
  * partitions, fanout parallelism rule, SPARK_GRAFT_CPUS master) so the
  * dumped plan is the plan the bench actually times — the r14 plan
  * audit found the old fixed local[4]/AQE-on session dumped differently
  * shaped plans (AQE broadcast rewrites) than the benched ones.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        Bench.shufflePartitionsFor(Bench.fixtureBytes(sfDir), cpus.toInt).toString)
      .config("spark.default.parallelism",
        Bench.fanoutParallelismFor(cpus.toInt).toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
