package graft

import org.apache.spark.sql.SparkSession

/** Scratch instrumentation main: times named SparkEntry queries exactly
  * the way Bench does (noop sink, min-of-2, clearCache between runs).
  * Usage: runMain graft.ProbeQueries <name> [<name> ...]. Not part of
  * the driver contract.
  */
object ProbeQueries {
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

    val names = if (args.nonEmpty) args.toSeq else Seq("text_stats")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(f"PROBE $name%-28s MISSING")
        case Some(fn) =>
          val times = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            val dt = (System.nanoTime() - t0) / 1e9
            spark.catalog.clearCache()
            dt
          }
          println(f"PROBE $name%-28s run1=${times(0)}%7.2fs run2=${times(1)}%7.2fs")
      }
    }
    spark.stop()
  }
}
