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

  test("streaming trending terms match exact batch counts when capacity suffices") {
    val half0 = docs.filter(col("doc_id") % 2 === 0)
    val half1 = docs.filter(col("doc_id") % 2 === 1)
    val dir = Files.createTempDirectory("trendstream")
    graft.sources.ParquetSlices.writeSingleFile(half0, dir.resolve("b0.parquet"))
    graft.sources.ParquetSlices.writeSingleFile(half1, dir.resolve("b1.parquet"))
    val src = spark.readStream.schema(half0.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = DocStreams.trendingTerms(spark, src, capacity = 256, shards = 4)
      .writeStream.outputMode("update")
      .format("memory").queryName("trend").start()
    q.processAllAvailable(); q.stop()
    // Update-mode sink accumulates per-trigger emissions; counts are
    // monotone, so max(count) per (shard, term) is the live sketch
    val sketch = spark.table("trend")
      .groupBy("shard", "term")
      .agg(max("count").as("count"), max("err").as("err"))
    // exact regime: no evictions anywhere -> err = 0 and counts exact
    assert(sketch.filter(col("err") =!= 0).count() == 0, "evictions in exact regime")
    val got = sketch.select("term", "count").as[(String, Long)].collect().toMap
    val want = docs.select(explode(TextOps.tokens(col("text"))).as("t"))
      .groupBy("t").count().as[(String, Long)].collect().toMap
    assert(got == want, s"sketch ${got.size} terms, batch ${want.size}")
    // a term must live in exactly one shard
    val multi = spark.table("trend").select("shard", "term").distinct()
      .groupBy("term").count().filter(col("count") > 1).count()
    assert(multi == 0, "term appeared in multiple shards")
  }

  test("streaming trending terms keep bounded state and honest error bounds") {
    // skewed single-trigger stream: 'hot' x40, 'warm' x9, singles x5
    val words = Seq.fill(40)("hot") ++ Seq.fill(9)("warm") ++
      Seq("a", "b", "c", "d", "e")
    val batch = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("trendbound")
    graft.sources.ParquetSlices.writeSingleFile(batch, dir.resolve("b0.parquet"))
    val src = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = DocStreams.trendingTerms(spark, src, capacity = 2, shards = 1)
      .writeStream.outputMode("update")
      .format("memory").queryName("trendbound").start()
    q.processAllAvailable(); q.stop()
    // one trigger -> the emission IS the current sketch: ≤ capacity rows
    val rows = spark.table("trendbound")
      .select("term", "count", "err").as[(String, Long, Long)].collect()
    assert(rows.length <= 2, s"state exceeded capacity: ${rows.toSeq}")
    // the >n/capacity term is guaranteed present, with true count inside
    // [count - err, count]
    val hot = rows.find(_._1 == "hot").getOrElse(fail("hot term evicted"))
    assert(hot._2 >= 40L && hot._2 - hot._3 <= 40L,
      s"hot bound violated: count=${hot._2} err=${hot._3}")
  }
}
