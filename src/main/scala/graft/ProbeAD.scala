package graft
import org.apache.spark.sql.SparkSession
object ProbeAD {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time(n: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val fn = SparkEntry.queries("approx_distinct")
    time("run1")(fn(spark, dir).write.format("noop").mode("overwrite").save())
    time("run2")(fn(spark, dir).write.format("noop").mode("overwrite").save())
    fn(spark, dir).explain("formatted")
    spark.stop()
  }
}
