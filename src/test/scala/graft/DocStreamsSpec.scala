package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, TextOps}
import graft.streaming.DocStreams

/** Drives the streaming curation pipeline over a file stream of the
  * documents fixture: batch 0 lands the "new crawl" slice, batch 1 lands
  * planted junk (a within-stream duplicate and a quality failure) — so
  * the stream-static anti-join, the watermark-bounded within-stream
  * dedup, and the gate all demonstrably fire across micro-batches.
  */
class DocStreamsSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text"))

  // compact arrival times (all within ~100 s) so every row stays inside
  // the 1-hour dedup watermark horizon
  private def withTs(df: DataFrame): DataFrame =
    df.withColumn("ts", (lit(1767225600L) + col("doc_id") % 100).cast("timestamp"))

  test("quality gate predicate stays in lock-step with qualityFlags") {
    val viaFlags = TextOps.qualityFlags(docs).filter(col("keep") === 1)
      .select("doc_id").as[Long].collect().toSet
    val viaKeep = docs.filter(TextOps.qualityKeep(col("text")))
      .select("doc_id").as[Long].collect().toSet
    assert(viaFlags == viaKeep, "qualityKeep diverged from qualityFlags")
  }

  test("streaming decontamination drops exactly the batch operator's drops") {
    val bench = docs.filter(col("doc_id") % 50 === 7)
      .select(concat_ws(" ",
        slice(TextOps.tokens(col("text")), 5, 20)).as("text"))
    val dir = Files.createTempDirectory("deconstream")
    val half = docs.filter(col("doc_id") % 2 === 0)
    graft.sources.ParquetSlices.writeSingleFile(
      withTs(half), dir.resolve("b0.parquet"))
    graft.sources.ParquetSlices.writeSingleFile(
      withTs(docs.filter(col("doc_id") % 2 === 1)), dir.resolve("b1.parquet"))
    val src = spark.readStream.schema(withTs(half).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = DocStreams.decontaminatedStream(src, bench, n = 8)
      .writeStream.outputMode("append")
      .format("memory").queryName("decon").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("decon").select("doc_id").as[Long].collect().sorted
    val batch = Dedup.decontaminate(docs, bench, n = 8)
      .select("doc_id").as[Long].collect().sorted
    assert(got.toSeq == batch.toSeq,
      s"stream kept ${got.length}, batch kept ${batch.length}")
  }

  test("streaming curation gates, dedupes vs base, and dedupes within the stream") {
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val baseFp = base.select(TextOps.fingerprint(col("text")).as("fp")).distinct()
    val stream0 = docs.filter(col("doc_id") % 3 === 0)
    // planted batch-1 rows: a re-landed copy of a batch-0 doc (same text,
    // new id — must be dropped by within-stream dedup) and a quality
    // failure (must be gated)
    val dupSrc = stream0.orderBy(col("doc_id")).limit(1)
      .select((col("doc_id") + 300000).as("doc_id"), col("text"))
    val junk = Seq((999999L, "too short")).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("docstream")
    graft.sources.ParquetSlices.writeSingleFile(withTs(stream0), dir.resolve("b0.parquet"))
    graft.sources.ParquetSlices.writeSingleFile(
      withTs(dupSrc.unionByName(junk)), dir.resolve("b1.parquet"))

    val src = spark.readStream.schema(withTs(stream0).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = DocStreams.curatedStream(src, baseFp)
      .writeStream.outputMode("append")
      .format("memory").queryName("curated").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("curated")

    // expected fingerprint set: quality-passing stream docs, minus base
    // fingerprints — exactly the fp set the batch incremental-dedup
    // operator keeps (one survivor per fingerprint)
    val expectedFps = stream0.filter(TextOps.qualityKeep(col("text")))
      .select(TextOps.fingerprint(col("text")).as("fp"))
      .join(baseFp, Seq("fp"), "left_anti")
      .distinct().collect().map(_.getString(0)).toSet
    val gotFps = got.select("fp").collect().map(_.getString(0))
    assert(gotFps.toSet == expectedFps, "surviving fingerprints diverge from batch")
    assert(gotFps.length == gotFps.toSet.size, "within-stream dedup emitted a dup")
    // the planted re-land and the gated doc never surface
    assert(got.filter(col("doc_id") >= 300000L).count() == 0,
      "batch-1 duplicate survived within-stream dedup")
    // batch equivalence: the incremental-dedup operator keeps one doc per
    // surviving fingerprint — same cardinality the stream emitted
    val batchKept = Dedup.incrementalDedup(base,
      stream0.filter(TextOps.qualityKeep(col("text")))).count()
    assert(batchKept == gotFps.length.toLong,
      s"stream kept ${gotFps.length} docs, batch operator kept $batchKept")
  }

  test("streaming near-dup gate drops exactly minhashLshAgainst's hits") {
    // base = raw corpus; stream = exact copies (every 10th doc), near
    // copies with a token tail (every 10th+3), and genuinely new docs
    // (reversed token order breaks the shingle sets)
    val base = docs
    val exact = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 500000).as("doc_id"), col("text"))
    val near = docs.filter(col("doc_id") % 10 === 3)
      .select((col("doc_id") + 600000).as("doc_id"),
        concat(col("text"), lit(" extra token tail")).as("text"))
    val fresh = docs.filter(col("doc_id") % 10 === 7)
      .select((col("doc_id") + 700000).as("doc_id"),
        concat_ws(" ", reverse(TextOps.tokens(col("text")))).as("text"))
    val batch0 = exact.unionByName(near)
    val dir = Files.createTempDirectory("neardupstream")
    graft.sources.ParquetSlices.writeSingleFile(withTs(batch0), dir.resolve("b0.parquet"))
    graft.sources.ParquetSlices.writeSingleFile(withTs(fresh), dir.resolve("b1.parquet"))
    val src = spark.readStream.schema(withTs(batch0).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = DocStreams.nearDupGatedStream(src, base, n = 3, threshold = 0.5)
      .writeStream.outputMode("append")
      .format("memory").queryName("neardupgate").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("neardupgate").select("doc_id").as[Long].collect().sorted
    val allIn = batch0.unionByName(fresh)
    val hitIds = Dedup.minhashLshAgainst(base, allIn, n = 3, threshold = 0.5)
      .select(col("i")).distinct().as[Long].collect().toSet
    val expect = withTs(allIn).select("doc_id").as[Long].collect()
      .filterNot(hitIds).sorted
    assert(got.toSeq == expect.toSeq,
      s"stream kept ${got.length}, batch gate keeps ${expect.length}")
    // the planted structure must actually exercise both outcomes
    assert(hitIds.nonEmpty && expect.nonEmpty, "degenerate planted corpus")
  }
}
