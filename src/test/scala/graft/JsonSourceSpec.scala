package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.model.Model
import graft.sources.JsonSource
import graft.pipeline.{ExtractLoadJob, RunAudit, RunLock}

/** S1 schema-on-read contract (EtlProcess.cs:133-161): unknown fields
  * dropped, missing fields null, failure → None → empty-successful run.
  */
class JsonSourceSpec extends SparkSpec {

  private def writeJson(lines: String*): String = {
    val dir = Files.createTempDirectory("jsonsrc")
    Files.write(dir.resolve("data.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("unknown JSON fields are silently dropped; missing fields become null") {
    val path = writeJson(
      """{"id":"a1","Date":"2026-01-01","Desc":"d","Done":"true","Name":"n","Pr":"p","LogicalPartition":"Partition_A","EXTRA_FIELD":"ignored"}""",
      """{"id":"a2","LogicalPartition":"Partition_B"}""")
    val df = JsonSource.read(spark, Model.sampleItemSchema, path)
    assert(df.columns.toSeq == Model.sampleItemSchema.fieldNames.toSeq)
    val rows = df.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("Desc") == "d")
    assert(rows(1).getAs[String]("Desc") == null, "missing field must read as null")
    assert(!df.columns.contains("EXTRA_FIELD"))
  }

  test("corrupt JSON line degrades to nulls, not an exception (PERMISSIVE)") {
    val path = writeJson(
      """{"id":"ok","LogicalPartition":"Partition_A"}""",
      """{not valid json at all""")
    val df = JsonSource.read(spark, Model.sampleItemSchema, path)
    assert(df.count() == 2) // both rows survive; corrupt one is all-null
  }

  test("bad path → None → ExtractLoadJob lands the empty-successful audit row") {
    val base = Files.createTempDirectory("jsonfail")
    val job = new ExtractLoadJob(spark,
      () => JsonSource.tryRead(spark, Model.sampleItemSchema,
        "/nonexistent/endpoint/down.json"),
      base.resolve("landing").toString,
      new RunLock(base.resolve("lock")),
      new RunAudit(base.resolve("audit").toString), "w1")
    job.runOnce()
    val runs = new RunAudit(base.resolve("audit").toString).read(spark).collect()
    assert(runs.length == 1 && runs.head.Succeeded)
    assert(runs.head.AdditionlInfo.contains("No documents retrieved"))
  }

  test("round-trip: generator → JSON landing → schema-on-read → transform") {
    val dir = Files.createTempDirectory("jsonrt").toString
    graft.sources.Generator.sampleItems(spark, 25, Some("2026-01-01 00:00:00"),
      deterministicIds = true).drop("i")
      .write.mode("overwrite").json(dir)
    val back = JsonSource.read(spark, Model.sampleItemSchema, dir)
    assert(back.count() == 25)
    val out = graft.ops.TransformOp.transform(
      back.withColumn("seq", lit(1)), lit("b"), col("seq"), "X,Y")
    assert(out.filter(col("Description").isNull).count() == 0)
  }
}
