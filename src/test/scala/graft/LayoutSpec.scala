package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Physical-layout guarantees: bucketed joins skip the exchange, salted
  * joins keep results identical while spreading skewed keys.
  */
class LayoutSpec extends SparkSpec {

  test("bucketed tables sort-merge-join with NO exchange") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    Layout.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    Layout.writeBucketed(o, "o_bucketed", "o_orderkey", 8)
    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
    // disable broadcast so the join strategy decision is about exchanges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // correctness unchanged
      val expected = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("salted join returns exactly the plain join's rows on a skewed key") {
    // make a pathologically skewed fact: 90% of rows on one key
    val skewed = spark.range(0, 10000).toDF("id")
      .withColumn("k", when(col("id") % 10 =!= 0, 1L).otherwise(col("id")))
    val dim = spark.range(0, 10000).toDF("k")
      .withColumn("name", concat(lit("dim_"), col("k")))
    val plain = skewed.join(dim, "k").agg(
      count(lit(1)).as("n"), sum(col("id")).as("s")).collect()(0)
    val salted = Layout.saltedJoin(skewed, dim, "k", salts = 8).agg(
      count(lit(1)).as("n"), sum(col("id")).as("s")).collect()(0)
    assert(plain.getLong(0) == salted.getLong(0), "row count changed by salting")
    assert(plain.getLong(1) == salted.getLong(1), "content changed by salting")
  }

  test("AQE splits skewed shuffle partitions in sort-merge joins (skew=true)") {
    // the runtime half of skew handling (salting is the plan-time half):
    // one hot key owns ~75% of the left side; AQE must detect the skewed
    // shuffle partition and split it instead of serializing the join on
    // one task. Guards that the session config keeps OptimizeSkewedJoin
    // reachable — at 100 TB this is the difference between a straggler
    // task and a balanced stage.
    val ss = spark
    import ss.implicits._
    val keep = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // scaled-down detection thresholds so the tiny fixture-sized data
      // exhibits the same behavior production sizes would
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val left = spark.range(0, 300000)
        .select(when(col("id") < 225000, 0L).otherwise(col("id")).as("k"),
          col("id").as("v"))
      val right = spark.range(0, 2000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = left.join(right, "k").select(count_distinct(col("v")).as("n"))
      // execute THIS dataset's own query execution — count() would build
      // a separate QueryExecution and leave this adaptive plan unfinalized
      val n = joined.collect()(0).getAs[Long]("n")
      // only the hot key matches (left non-zero keys start at 225000)
      assert(n == 225000L, s"unexpected join cardinality $n")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark/split the skewed join:\n${plan.take(3000)}")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("globalSortedLayout yields non-overlapping sorted partitions") {
    val df = Layout.globalSortedLayout(
      spark.read.parquet(s"$sf/orders.parquet"), col("o_orderkey"), 4)
    val bounds = df.select(col("o_orderkey"))
      .mapPartitions { it =>
        val s = it.map(_.getLong(0)).toSeq
        if (s.isEmpty) Iterator.empty
        else Iterator((s.min, s.max, (s == s.sorted)))
      }(org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaBoolean))
      .collect().sortBy(_._1)
    assert(bounds.forall(_._3), "a partition is not internally sorted")
    bounds.sliding(2).foreach {
      case Array(a, b) => assert(a._2 <= b._1, "partition ranges overlap")
      case _ =>
    }
  }

  test("exportJsonlShards writes verifiable shards with a manifest") {
    val out = java.nio.file.Files.createTempDirectory("jsonl").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = docs.count()
    Layout.exportJsonlShards(docs, out, col("doc_id"), 100L)
    val manifest = java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, "_MANIFEST.json"))
    assert(manifest.contains(s""""rows": $n"""), manifest)
    // the JSONL round-trips losslessly
    val back = spark.read.json(out)
    assert(back.count() == n)
    assert(back.select(sum(col("doc_id"))).head().getLong(0) ==
      docs.select(sum(col("doc_id"))).head().getLong(0))
    // checksum is partitioning-invariant: recompute from the reread data
    val expected = manifest.split("\"checksum\": \"")(1).split("\"")(0)
    val re = docs.repartition(7)
      .select(xxhash64(to_json(struct(col("doc_id"), col("text")))).as("h"))
      .agg(bit_xor(col("h"))).head().getLong(0)
    assert(java.lang.Long.toHexString(re) == expected,
      "checksum must not depend on partitioning")
  }

  test("globalRowNumber equals single-window row_number at any parallelism") {
    val df = spark.range(0, 5000).toDF("k")
      .withColumn("k", (col("k") * 2654435761L) % 100003L) // unique, scrambled
      .repartition(13)
    val got = Layout.globalRowNumber(df, col("k"), numShards = 7)
      .select("k", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = df.select("k").collect().map(_.getLong(0)).sorted
      .zipWithIndex.map { case (k, i) => k -> (i + 1L) }.toMap
    assert(got == expect, "distributed numbering diverged from the global order")
  }

  test("shuffleShard is a reproducible permutation: dense positions, salt-dependent order") {
    val df = spark.range(0, 1000).toDF("doc_id")
    val a = Layout.shuffleShard(df, col("doc_id"), nShards = 8)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // permutation: every key once, every (shard, pos) address unique,
    // positions dense 1..n_s within each shard
    assert(a.map(_._1).toSet.size == 1000)
    assert(a.map(t => (t._2, t._3)).toSet.size == 1000)
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq) }
    // rerun (different input partitioning) → identical addresses
    val b = Layout.shuffleShard(df.repartition(13), col("doc_id"), nShards = 8)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
    // a different salt (next epoch) permutes differently
    val c = Layout.shuffleShard(df, col("doc_id"), nShards = 8, salt = "epoch1")
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(c.sortBy(_._1).toSeq != a.sortBy(_._1).toSeq)
  }

  test("globalRowNumber is exact on random key sets (negatives, dups of sign, tiny)") {
    // random DISTINCT longs across both signs, several sizes incl. 0 and
    // 1 — the edges the fixture never exercises. Deterministic seeds.
    val rnd = new scala.util.Random(7)
    for (n <- Seq(0, 1, 2, 37, 1000)) {
      val keys = Iterator.continually(rnd.nextLong() % 100000L)
        .distinct.take(n).toSeq
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(keys.map(Tuple1(_)), 5)
          .map(t => org.apache.spark.sql.Row(t._1)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType))))
      val got = Layout.globalRowNumber(df, col("k"), numShards = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expect = keys.sorted.zipWithIndex
        .map { case (k, i) => k -> (i + 1L) }.toMap
      assert(got == expect, s"n=$n: numbering diverged")
    }
  }

  test("zValue matches a reference bit-interleave, including the INT sign edge") {
    def ref(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    val rnd = new scala.util.Random(11)
    // random pairs plus the corners that sign-flipped the old INT math
    val cases = Seq((0L, 0L), (65535L, 65535L), (32768L, 32768L), (1L, 65535L)) ++
      Seq.fill(50)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(cases.map(c => org.apache.spark.sql.Row(c._1, c._2)), 3),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.LongType))))
    val got = df.select(col("a"), col("b"), Layout.zValue(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cases.foreach { case (a, b) =>
      assert(got((a, b)) == ref(a, b, 16), s"z($a,$b) diverged")
      assert(got((a, b)) >= 0L, s"z($a,$b) went negative — sign bit leaked")
    }
  }

  test("zorderLayout clusters BOTH dimensions into compact per-partition regions") {
    // a full 64x64 grid: a z-curve cut into 16 ranges yields compact
    // rectangles, so every partition's x AND y extents are far below the
    // 63 a 1-D (x-only) clustering would leave on y
    val grid = spark.range(0, 4096).toDF("i")
      .select((col("i") % 64).cast("int").as("x"),
        (col("i") / 64).cast("int").as("y"))
      .repartition(17) // scrambled input partitioning
    val parts = Layout.zorderLayout(grid, col("x"), col("y"), 16, bits = 6)
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max(col("x")) - min(col("x"))).as("xr"),
        (max(col("y")) - min(col("y"))).as("yr"))
      .collect().map(r => (r.getInt(1), r.getInt(2)))
    val (avgX, avgY) = (parts.map(_._1).sum.toDouble / parts.length,
      parts.map(_._2).sum.toDouble / parts.length)
    assert(avgX <= 32 && avgY <= 32,
      s"z-order regions not compact: avg x-range $avgX, avg y-range $avgY")
  }

  test("compactTo merges to ceil(n/target) files with disjoint key ranges") {
    val out = java.nio.file.Files.createTempDirectory("compact").toString
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val n = orders.count()
    val target = 500L
    Layout.compactTo(orders, out, col("o_orderkey"), target)
    val expected = ((n + target - 1) / target).toInt
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    assert(files.length == expected,
      s"wanted $expected compacted files for $n rows, got ${files.length}")
    // every file must cover a disjoint o_orderkey range (min/max pruning)
    val ranges = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("o_orderkey")).as("lo"), max(col("o_orderkey")).as("hi"),
        count(lit(1)).as("rows"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array(a, b) => assert(a._2 <= b._1, s"file key ranges overlap: $a $b")
      case _ =>
    }
    assert(ranges.map(_._3).sum == n, "compaction lost rows")
  }

  test("dynamic partition overwrite splices a recomputed partition in place") {
    // the backfill primitive at 100 TB: re-land ONE day/status partition
    // without touching (or even listing) the others — overwrite mode
    // 'dynamic' replaces only partitions present in the incoming frame
    val s = spark
    val out = java.nio.file.Files.createTempDirectory("dpo").toString
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    val before = spark.read.parquet(out)
      .groupBy(col("o_orderstatus")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // byte-level evidence: sibling partitions must keep their exact
    // files (name -> length, mtime), not merely their row counts
    def files(status: String): Map[String, (Long, Long)] =
      Option(new java.io.File(out, s"o_orderstatus=$status").listFiles())
        .getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap
    val siblingFilesBefore = (before.keySet - "O").map(k => k -> files(k)).toMap
    // recompute the 'O' partition to HALF its rows and splice it in
    val repaired = orders.filter(col("o_orderstatus") === "O")
      .filter(col("o_orderkey") % 2 === 0)
    val prev = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try repaired.write.mode("overwrite").partitionBy("o_orderstatus")
      .parquet(out)
    finally prev match {
      case Some(v) => s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val after = spark.read.parquet(out)
      .groupBy(col("o_orderstatus")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after("O") == repaired.count(), "spliced partition not replaced")
    (before.keySet - "O").foreach { k =>
      assert(after(k) == before(k), s"untouched partition $k changed")
      assert(files(k) == siblingFilesBefore(k),
        s"sibling partition $k was rewritten (files/length/mtime changed)")
    }
  }

  test("partitioned layout + dim filter triggers dynamic partition pruning") {
    // write orders hive-partitioned by status, then join against a
    // FILTERED dim — the fact scan must carry a dynamicpruning
    // expression so only the matching partitions are read at runtime.
    // This is the layout contract that lets a 100 TB fact table skip
    // whole directories based on a runtime-computed dim key set.
    val s = spark
    import s.implicits._
    val out = java.nio.file.Files.createTempDirectory("dpp").toString
    spark.read.parquet(s"$sf/orders.parquet")
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    val fact = spark.read.parquet(out)
    // the dim must be a real filtered SCAN: a LocalRelation folds the
    // filter away and DPP's selective-predicate heuristic never fires
    val dimPath = java.nio.file.Files.createTempDirectory("dppdim").toString
    Seq(("F", "closed"), ("O", "open"), ("P", "pending"))
      .toDF("status", "label").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = fact.join(dim.filter(col("label") === "open"),
      col("o_orderstatus") === col("status"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
      s"no dynamic partition pruning on the partitioned fact scan:\n$plan")
    // and the pruned result is still correct
    val expect = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderstatus") === "O").count()
    assert(joined.count() == expect)
  }

  test("joinSkew ranks the planted hot key first with exact output math") {
    val s = spark
    import s.implicits._
    // key 7: 100 left x 50 right = 5000 out rows; everyone else 1x1
    val left = ((1L to 100L).map(_ => 7L) ++ (10L to 29L)).toDF("k")
    val right = ((1L to 50L).map(_ => 7L) ++ (20L to 39L)).toDF("k")
    val rows = graft.ops.Profile.joinSkew(left, right, "k", k = 5).collect()
    assert(rows.head.getLong(0) == 7L)
    assert(rows.head.getLong(1) == 100L && rows.head.getLong(2) == 50L)
    assert(rows.head.getLong(3) == 5000L)
    // total = 5000 + |{20..29}| x 1 = 5010; share exact
    assert(rows.head.getDouble(4) == 5000.0 / 5010.0)
    // keys on only one side contribute zero output but still appear
    val zeroSide = graft.ops.Profile.joinSkew(left, right, "k", k = 100)
      .filter(col("out_rows") === 0).count()
    assert(zeroSide == 20L, s"one-sided keys: $zeroSide")
  }
}
