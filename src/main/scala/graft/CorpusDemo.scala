package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Bpe, Cluster, Dedup, Sampling, TextOps}

/** End-to-end training-data curation pipeline over the documents fixture —
  * the "a reference user could run their whole corpus job on this" demo,
  * chaining every stage in the order a production pipeline runs them:
  *
  *   quality gate → exact dedup → near-dup clustering → benchmark
  *   decontamination → mixture sampling → sequence packing → vocabulary +
  *   BPE tokenizer training
  *
  * Each stage is one of the library operators (all individually
  * oracle-checked or spec-gated); this main just composes them and prints
  * the per-stage corpus counts. Run:
  * `sbt "runMain graft.CorpusDemo /root/testdata/sf0.001"`.
  */
object CorpusDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // each stage is materialized (lineage cut) before the next builds on
    // it — without this every count re-runs the whole upstream chain and
    // the stacked plan eventually overflows analysis
    def stage(name: String, df: DataFrame): DataFrame = {
      val pinned = df.localCheckpoint()
      println(f"[corpus] $name%-24s ${pinned.count()}%6d docs")
      pinned
    }

    val raw = stage("raw",
      Tables.t(spark, sfDir, "documents").select(col("doc_id"), col("text"), col("lang")))

    // 1. quality gate (Gopher-style scan-speed filter)
    val quality = stage("quality_gate",
      raw.join(TextOps.qualityFlags(raw.select(col("doc_id"), col("text")))
        .filter(col("keep") === 1).select("doc_id"), Seq("doc_id")))

    // 2. exact dedup (content hash, min-id survivor)
    val exact = stage("exact_dedup", Dedup.dedupExact(quality))

    // 3. near-dup clustering (jaccard pairs -> connected components)
    val clustered = stage("cluster_dedup",
      Cluster.applyClusterDedup(exact,
        Dedup.ngramJaccardPairs(exact.select(col("doc_id"), col("text")))))

    // 4. benchmark decontamination (fake eval set = every 50th doc's slice)
    val bench = clustered.filter(col("doc_id") % 50 === 7)
      .select(concat_ws(" ", slice(TextOps.tokens(col("text")), 5, 20)).as("text"))
    val clean = stage("decontaminate", Dedup.decontaminate(clustered, bench))

    // 5. mixture sampling toward an even language blend
    val langs = clean.select("lang").distinct().collect().map(_.getString(0))
    val rates = Sampling.mixtureRates(clean, col("lang"),
      langs.map(_ -> 1.0 / langs.length).toMap)
    val mixed = stage("mixture_sample",
      Sampling.stratifiedHashSample(clean, col("doc_id"), col("lang"), rates))

    val curated = mixed.select(col("doc_id"), col("text"))

    // 6. sequence packing into ~2000-token bins
    val packed = TextOps.packBins(curated, 2000L)
    val nBins = packed.agg(coalesce(max(col("bin")) + 1, lit(0L)).as("n"))
      .head().getLong(0)
    println(f"[corpus] ${"pack_bins"}%-24s $nBins%6d bins")

    // 7. tokenizer artifacts: vocabulary + BPE merges
    val vocabN = TextOps.vocab(curated).count()
    val merges = Bpe.train(curated, nMerges = 8)
    println(f"[corpus] ${"vocab_terms"}%-24s $vocabN%6d terms")
    println(s"[corpus] bpe_merges               " +
      merges.map(m => s"${m.lhs}+${m.rhs}").mkString(", "))

    spark.stop()
  }
}
