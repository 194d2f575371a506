package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators for shuffle elimination and skew handling —
  * the knobs that decide whether a 100 TB join is one co-located pass or
  * a cluster-melting exchange.
  */
object Layout {

  /** Write `df` as a bucketed+sorted managed table. Two tables bucketed
    * the same way on their join key sort-merge-join with NO exchange and
    * NO sort at query time — the shuffle is paid once at write time and
    * amortized over every subsequent join (the standard layout for a
    * 100 TB fact table joined repeatedly on the same key). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    // a previous JVM's in-memory catalog dies with the process but leaves
    // the managed location on disk; clear both or CREATE TABLE fails with
    // LOCATION_ALREADY_EXISTS. Managed locations are <warehouse>/<db>.db/
    // <table> for qualified names and <warehouse>/<table> in the default db.
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val relPath = table.toLowerCase.split('.') match {
      case Array(db, t) => s"$db.db/$t"
      case Array(t) => t
      case _ => sys.error(s"writeBucketed: unsupported table name '$table'")
    }
    val leftover = new java.io.File(warehouse, relPath)
    if (leftover.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(leftover)
    }
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Salted equi-join for skewed keys: the skewed (large) side gets a
    * random salt in [0, salts); the small side is replicated ×salts with
    * every salt value. A key holding S% of all rows fans out across
    * `salts` reducers instead of one straggler task.
    *
    * AQE's skew-join handles moderate skew automatically at runtime;
    * explicit salting is for the pathological keys AQE can't split
    * (single giant key inside one shuffle block). */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    // right/full-outer would emit each UNMATCHED small-side row once per
    // salt replica — silently wrong; only left-preserving types are sound
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "semi").contains(normalized),
      s"saltedJoin: joinType '$joinType' not supported — the small side is " +
        "replicated ×salts, so only inner/left_outer/left_semi are sound")
    val saltedL = skewed.withColumn("_salt",
      (rand(seed = 7) * salts).cast("int"))
    val saltedR = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedL.join(saltedR, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Range-partition + sort within partitions: the layout for downstream
    * consumers that need globally ordered output without a single-task
    * final sort. */
  def globalSortedLayout(df: DataFrame, key: Column, partitions: Int): DataFrame =
    df.repartitionByRange(partitions, key).sortWithinPartitions(key)

  /** Export a curated corpus as JSONL shards — the interchange format
    * training stacks consume — plus a `_MANIFEST.json` sidecar recording
    * shard count, row count, and a content checksum so downstream
    * loaders can verify completeness without re-scanning. Sharding
    * mirrors [[compactTo]]: ceil(n/target) files, range-clustered on
    * `key` so shard boundaries are stable, resumable ranges. The
    * checksum is an order-independent XOR-fold of per-row hashes —
    * computable distributed, identical at any parallelism. */
  def exportJsonlShards(df: DataFrame, path: String, key: Column,
      targetRowsPerFile: Long): Unit = {
    val n = df.count()
    val shards = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    df.repartitionByRange(shards, key)
      .sortWithinPartitions(key)
      .write.mode("overwrite").json(path)
    val checksum = df.select(
        xxhash64(to_json(struct(df.columns.map(col): _*))).as("h"))
      .agg(bit_xor(col("h")).as("s")) // XOR fold: order-independent, no overflow
      .head().getLong(0)
    val manifest =
      s"""{"rows": $n, "shards": $shards, "checksum": "${java.lang.Long.toHexString(checksum)}"}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "_MANIFEST.json"), manifest)
  }

  /** Compact a table into ~`targetRowsPerFile`-row parquet files,
    * range-clustered and sorted on `key` — the maintenance pass that keeps
    * a 100 TB table healthy: small-file merge (file count = ceil(n/target),
    * not one-per-task), plus key clustering so each file covers a narrow
    * disjoint key range and min/max row-group pruning can skip whole files
    * on key-predicate scans. One count + one range shuffle. */
  def compactTo(df: DataFrame, path: String, key: Column,
      targetRowsPerFile: Long): Unit = {
    val n = df.count()
    val files = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    df.repartitionByRange(files, key)
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(path)
  }
}
