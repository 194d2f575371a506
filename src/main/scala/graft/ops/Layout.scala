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
      graft.sources.ParquetSlices.deleteRecursively(leftover)
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

  /** Deterministic MONOTONIC shard id for a non-null numeric `key`:
    * boundary keys come from a hash-chosen sorted sample (hash-ordering
    * + limit is a pure function of the data — same trick as the IVF
    * quantizer's training sample) and are compiled into the plan as
    * literals, so EVERY job that evaluates the expression assigns the
    * identical shard. This is what `spark_partition_id()` after
    * `repartitionByRange` does NOT guarantee: the range partitioner
    * re-samples per execution with an RDD-id-dependent seed, so two jobs
    * over the same frame can disagree about shard boundaries — fatal
    * when one job computes per-shard offsets the other consumes.
    * Monotonic: key order implies shard order, so per-shard work + shard
    * offsets reassemble into a global order. */
  def orderedShard(df: DataFrame, key: Column, shards: Int,
      sampleSize: Int = 3200): Column = {
    val ks = df.select(key.cast("long").as("k"))
      .filter(col("k").isNotNull) // null keys would NPE the sample collect
      .orderBy(xxhash64(col("k")), col("k")).limit(sampleSize)
      .collect().map(_.getLong(0)).sorted
    if (ks.isEmpty || shards <= 1) lit(0)
    else (1 until shards)
      .map(i => ks(((i.toLong * ks.length) / shards).toInt)).distinct
      .foldLeft(lit(0))((acc, b) =>
        acc + when(key.cast("long") >= lit(b), 1).otherwise(0))
  }

  /** Distributed global row numbering in `order` order WITHOUT a global
    * window: assign each row a deterministic ordered shard
    * ([[orderedShard]]), count rows per shard (one tiny agg — `shards`
    * longs of driver state), prefix-sum the counts on the driver, and
    * add each shard's offset to a shard-local `row_number`. Because the
    * shard function is monotonic in the key, offset + local row number
    * ≡ `row_number() OVER (ORDER BY order)` at any parallelism — but
    * the single-task global sort that window would plan never happens.
    * Requires a unique non-null numeric `order` key (ties would make any
    * row_number nondeterministic). Appends `rn` (1-based, BIGINT) — the
    * stable global example-ID assignment a training-data export needs. */
  /** Driver-side prefix offsets for a frame carrying an ordered `_shard`
    * column: aggregate `perShard` within each shard (one tiny job — ≤
    * `shards` longs of driver state), prefix-sum on the driver, and
    * return a literal-map column giving every row the total of all
    * EARLIER shards — the glue that turns shard-local running values
    * into exact global ones. Shared by [[globalRowNumber]] and
    * [[graft.ext.TextOps.packBins]] so the offset math cannot diverge. */
  private[graft] def prefixOffsets(sharded: DataFrame, perShard: Column): Column = {
    val totals = sharded.groupBy(col("_shard"))
      .agg(perShard.cast("long").as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (pid, t) => val o = acc; acc += t; (pid, o) }
    if (offsets.isEmpty) lit(0L)
    else element_at(
      map(offsets.flatMap { case (p, o) => Seq(lit(p), lit(o)) }: _*),
      col("_shard"))
  }

  def globalRowNumber(df: DataFrame, order: Column, numShards: Int = 0,
      tiebreak: Seq[Column] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shards =
      if (numShards > 0) numShards
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val sharded = df.withColumn("_shard", orderedShard(df, order, shards))
    val offsetOf = prefixOffsets(sharded, count(lit(1)))
    // `order` alone must be unique UNLESS `tiebreak` completes the total
    // order: equal order keys always land in the same shard (the shard
    // function is a pure function of the key), so a shard-local tiebreak
    // yields the same global order as a single sort by (order, tiebreak)
    val w = Window.partitionBy(col("_shard")).orderBy(order +: tiebreak: _*)
    sharded
      .withColumn("rn", (row_number().over(w).cast("long") + offsetOf))
      .drop("_shard")
  }

  /** Z-value of two non-negative integer columns: their low `bits` bits
    * interleaved (a in even positions, b in odd). Sorting or
    * range-clustering on this key gives the classic Z-ORDER layout:
    * every file covers a compact rectangle in (a, b) space, so min/max
    * row-group pruning can skip files for predicates on EITHER column —
    * the multi-dimensional analogue of [[compactTo]]'s single-key
    * clustering. Pure bit arithmetic, codegen-friendly, no UDF. The
    * interleave runs in LONG space (returns BIGINT): at the default 16
    * bits the top interleaved bit lands in position 31, which would flip
    * the sign of an INT key and range-cluster the two opposite corners
    * of the key space into one partition. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"zValue: bits must be in [1,31], got $bits")
    val (al, bl) = (a.cast("long"), b.cast("long"))
    (0 until bits).map { i =>
      (shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Z-order clustering: range-partition + sort on the interleaved
    * [[zValue]] so each output partition/file covers a compact region of
    * the 2-D key space. One range shuffle, same cost as a 1-D layout. */
  def zorderLayout(df: DataFrame, a: Column, b: Column, partitions: Int,
      bits: Int = 16): DataFrame = {
    val z = zValue(a, b, bits)
    df.repartitionByRange(partitions, z).sortWithinPartitions(z)
  }

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

  /** Deterministic global shuffle for training export: every row gets a
    * pseudo-random but REPRODUCIBLE (shard, pos) address — shard from a
    * salted hash of the key, pos from the hash order within the shard.
    * Reading shards in order replays one fixed permutation of the corpus
    * at any parallelism, on any rerun, which is what epoch shuffling
    * needs and what `orderBy(rand())` cannot give (membership and order
    * change under retries and AQE re-planning; same discipline as
    * [[graft.ext.Sampling]]).
    *
    * Plan shape: hash + shard at scan, then ONE window partitioned by
    * shard for the position. Production exports use thousands of shards
    * (shard ≈ output file ≈ task); the per-shard sort is the same work a
    * shuffle-write of that shard costs anyway. The salt selects the
    * epoch permutation — vary it per epoch for fresh document order. */
  def shuffleShard(df: DataFrame, key: Column, nShards: Int,
      salt: String = "epoch0"): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    import org.apache.spark.sql.expressions.Window
    val h = graft.ext.Dedup.portableHash32(
      concat(lit(salt), lit(":"), key.cast("string")))
    df.withColumn("_h", h)
      .withColumn("shard", pmod(col("_h"), lit(nShards)).cast("int"))
      .withColumn("pos", row_number()
        .over(Window.partitionBy(col("shard")).orderBy(col("_h"), key))
        .cast("long"))
      .drop("_h")
  }
}
