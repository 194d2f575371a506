package graft

import org.apache.spark.sql.SparkSession
import graft.ext.Dedup
import graft.queries.Extensions

/** Scratch instrumentation main: stage-by-stage timings for the hot
  * extension queries. Not part of the driver contract.
  */
object BenchProbe {
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

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    val docs = Extensions.plantedDocs(spark, sfDir)
    time("plantedDocs")(docs.count())
    val toks = docs.select(org.apache.spark.sql.functions.explode(
      Dedup.shingles(org.apache.spark.sql.functions.col("text"), 3)))
    time("shingles_explode")(toks.count())
    time("shingles_distinct")(docs.select(org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.explode(
        Dedup.shingles(org.apache.spark.sql.functions.col("text"), 3)).as("sh"))
      .distinct().count())
    val sigs = Dedup.minhashSignatures(docs)
    time("minhash_signatures")(sigs.count())
    time("minhash_lsh_pairs")(Dedup.minhashLshPairs(docs).count())
    time("ngram_jaccard")(Dedup.ngramJaccardPairs(docs).count())
    time("simhash_pairs")(Dedup.simhashPairs(docs).count())
    spark.catalog.clearCache()
    time("cc_cluster")(graft.ext.Cluster.connectedComponents(
      Dedup.ngramJaccardPairs(docs)).count())
    spark.catalog.clearCache()
    time("cc_apply")(graft.ext.Cluster.applyClusterDedup(docs,
      Dedup.ngramJaccardPairs(docs)).count())
    spark.catalog.clearCache()
    time("pairs_apply")(Dedup.applyPairDedup(docs,
      Dedup.ngramJaccardPairs(docs)).count())
    spark.stop()
  }
}
