package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{Event, EventStreams}
import graft.sources.JsonSource
import graft.model.Model

/** End-to-end demo of the streaming analytics + JSON source surface:
  * events fixture → two-slice file stream → watermarked hourly windows +
  * stateful sessionization; plus a JSON schema-on-read round trip.
  * Usage: runMain graft.EventsDemo [sfDir]
  */
object EventsDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val fixture = Tables.events(spark, sfDir)
    val dir = Files.createTempDirectory("events-demo")
    val cut = fixture.selectExpr("percentile_approx(ts, 0.5) AS c")
      .collect()(0).getTimestamp(0)
    graft.sources.ParquetSlices.writeSingleFile(
      fixture.filter(col("ts") <= cut), dir.resolve("b0.parquet"))
    graft.sources.ParquetSlices.writeSingleFile(
      fixture.filter(col("ts") > cut), dir.resolve("b1.parquet"))

    val src = spark.readStream.schema(fixture.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)

    val qw = EventStreams.hourlyCounts(src, "2 hours")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("w").start()
    qw.processAllAvailable(); qw.stop()

    val qs = EventStreams.sessionize(spark,
        src.select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value")).as[Event])
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("s").start()
    qs.processAllAvailable(); qs.stop()

    // JSON round trip through the schema-on-read source
    val jsonDir = Files.createTempDirectory("events-json").toString
    graft.sources.Generator.sampleItems(spark, 50).drop("i")
      .write.mode("overwrite").json(jsonDir)
    val jsonBack = JsonSource.tryRead(spark, Model.sampleItemSchema, jsonDir)
      .map(_.count()).getOrElse(-1L)
    val jsonFail = JsonSource.tryRead(spark, Model.sampleItemSchema,
      "/nonexistent/endpoint").isEmpty

    val closedWindows = spark.table("w").count()
    val closedSessions = spark.table("s").count()
    val totalEvents = fixture.count()
    println(s"""{"events":$totalEvents,"closed_windows":$closedWindows,""" +
      s""""closed_sessions":$closedSessions,"json_roundtrip":$jsonBack,""" +
      s""""json_error_as_none":$jsonFail}""")
    spark.stop()
  }
}
