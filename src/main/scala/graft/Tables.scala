package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Table loading + numeric canonicalization helpers shared by all queries.
  *
  * Oracle-parity rule: the driver hash-compares our parquet output against
  * DuckDB running the same SQL. Floating-point SUMs are order-dependent, and
  * Spark's partial aggregation order differs run-to-run — so every money/qty
  * aggregate goes through an exact DECIMAL(18,2) cast first (the fixtures
  * store 2-decimal values in doubles), then back to double AFTER the exact
  * aggregation. This makes results bit-identical across engines and across
  * partitionings, which is also what you want at 100 TB: decimal sums are
  * associative, so map-side partial aggregation stays enabled.
  */
object Tables {
  /** Memoized analyzed scans, keyed by (session, path). `spark.read.parquet`
    * builds a fresh InMemoryFileIndex (file listing) and re-reads the footer
    * for schema inference on EVERY call; across a 221-query suite each table
    * is re-opened hundreds of times, and that fixed cost is pure overhead —
    * the fixture dirs are immutable for the life of a session. A DataFrame
    * is an immutable logical plan, so sharing one per table is safe (callers
    * layer projections/filters on top without mutating it). Keyed by session
    * so a stopped session's plans are never served to a new one; tests that
    * write fresh parquet read it through `spark.read` directly, not here.
    *
    * Eviction: every insert first purges entries whose session's context
    * has stopped — otherwise a long-lived JVM cycling sessions (exactly
    * the spec-suite pattern) would retain dead SessionStates and their
    * plans for the life of the process. The purge is O(live entries)
    * (tables × sessions, ~tens) on the insert path only; cache hits pay
    * nothing. */
  private val scanCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Test seam ONLY: the eviction predicate. A spec cannot stop a real
    * second SparkContext (one per JVM, and the suite-shared one must
    * survive), so the eviction spec swaps this probe to mark a
    * `newSession()` as stopped and exercises the real insert path.
    * Production never touches it. */
  @volatile private[graft] var stoppedProbe: SparkSession => Boolean =
    _.sparkContext.isStopped

  private def purgeStopped(): Unit = {
    val it = scanCache.keySet.iterator()
    while (it.hasNext) if (stoppedProbe(it.next()._1)) it.remove()
  }

  /** Sessions currently holding cached scans — test hook for the
    * eviction contract. */
  private[graft] def cachedScanSessions: Set[SparkSession] = {
    val it = scanCache.keySet.iterator()
    val b = Set.newBuilder[SparkSession]
    while (it.hasNext) b += it.next()._1
    b.result()
  }

  /** Read one fixture table. Parquet scan: Catalyst pushes filters +
    * prunes columns into the scan automatically (verify via .explain:
    * PushedFilters / ReadSchema). */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val key = (spark, s"$dir/$name.parquet")
    val hit = scanCache.get(key)
    if (hit != null) hit
    else {
      purgeStopped()
      scanCache.computeIfAbsent(key, { case (s, p) => s.read.parquet(p) })
    }
  }

  /** The events fixture's `ts` physical type has varied across fixture
    * generations: TIMESTAMP(NANOS) (read as long via
    * spark.sql.legacy.parquet.nanosAsLong, set in every session builder)
    * and timestamp[us] without timezone (read as TIMESTAMP_NTZ under
    * Spark 4's inferTimestampNTZ default). Normalize every variant to a
    * microsecond TimestampType column: watermarks and unix_micros require
    * TIMESTAMP, and under the UTC session timezone the NTZ→LTZ cast is a
    * value-preserving identity, matching DuckDB's naive-timestamp read. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = t(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  /** Spread a small, CPU-heavy input across all cores before per-row
    * text/vector work. The bench fixture tables are single-row-group
    * parquet files, so their scans yield ONE task each; without this,
    * every per-row transform downstream of the scan (shingling, minhash,
    * language stats, dot products) serializes onto one of 32 cores while
    * the rest idle. The round-robin shuffle moves only the small table
    * (single-digit MBs). At production scale inputs arrive with
    * thousands of splits and this pre-balance is skipped — which is why
    * it lives at the fixture-reading call sites, not inside the
    * operators. */
  def fanout(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Memoized data-file counts per table path (the fixture dirs are
    * immutable for the life of the process, same contract as
    * [[scanCache]]). Hidden/metadata entries (`_SUCCESS`, dotfiles)
    * are excluded the way Spark's file index excludes them. */
  private val fileCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private[graft] def dataFileCount(spark: SparkSession, path: String): Int =
    fileCountCache.computeIfAbsent(path, { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val st = fs.getFileStatus(hp)
      Integer.valueOf(
        if (st.isFile) 1
        else fs.listStatus(hp).count { s =>
          val n = s.getPath.getName
          s.isFile && !n.startsWith("_") && !n.startsWith(".")
        })
    }).intValue()

  /** Read one fixture table pre-balanced for CPU-heavy per-row work —
    * [[t]] + [[fanout]], where the fanout is ADAPTIVE (r15): it is
    * SKIPPED when the table's data-file count alone already meets the
    * fanout target, because then the scan yields at least that many
    * independent tasks and the round-robin exchange — a full-corpus
    * shuffle — parallelizes nothing that the scan didn't. The test is
    * FILE count, not bytes/maxPartitionBytes: parquet assigns whole row
    * groups to one split, so byte-derived split estimates overcount for
    * large single-row-group files (the exact shape the fanout exists
    * for), while every FILE is at least one real schedulable task
    * regardless of its row-group layout — the estimate only ever errs
    * toward keeping the pre-balance. At 100 TB inputs arrive as
    * thousands of part files, so all ~95 tf call sites skip the
    * exchange; the single-file bench fixture keeps it, leaving the
    * driver's measurement protocol unchanged. */
  def tf(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = t(spark, dir, name)
    val target = spark.sparkContext.defaultParallelism
    if (dataFileCount(spark, s"$dir/$name.parquet") >= target) df
    else fanout(df)
  }

  /** THE library-wide cache sweep — the caller side of the cache
    * contract (see graft.ext.TextOps's "Cache contract" scaladoc):
    * multi-consumer operators persist internal frames that their
    * RETURNED lazy plan still references, so they cannot unpersist
    * before return; the caller consumes the result, then sweeps. This
    * drops both catalog-registered Dataset caches AND raw persistent
    * RDD blocks (iterative graph/CC rounds localCheckpoint RDDs that
    * `clearCache` can't see). Bench, Verify, and BenchCensus call this
    * after every query; a long-lived service embedding the operators
    * calls it at its own batch boundary. Per-call cache growth is
    * bounded by the operator's own pins, so sweep frequency trades
    * only reuse, never correctness (a swept plan recomputes). */
  def sweepOperatorCaches(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  /** Shared by the Bench/Verify mains. Every unpartitioned window this
    * engine executes ranks a BOUNDED frame: a limit-N result (zipf/vocab
    * top ranks), the grid CDF whose cardinality TextOps.lowerMedian
    * guards with a runtime error, a per-month series, or one
    * micro-batch. WindowExec's blanket move-everything warning is noise
    * for those — and a constant partition key cannot state the bound in
    * the plan because EliminateWindowPartitions strips foldable keys —
    * so the one logger is pinned to ERROR; the genuinely dangerous case
    * dies on the lowerMedian guard instead of a warning nobody reads. */
  def silenceBoundedWindowWarn(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)

  /** Totally-ordered presentation of a RESULT frame, for `.transform`.
    *
    * A terminal `orderBy` plans a range-partitioned sort whose
    * partitioner SAMPLES the child RDD to pick split points — executing
    * the entire upstream plan a SECOND time before the real sort runs
    * (measured ~2x end-to-end on detector-shaped queries: the sampling
    * pass re-runs the joins/aggregations, not just a scan). Result
    * tables are result-sized, so they take one exchange to a single
    * partition and a local sort instead: the upstream stays fully
    * parallel, runs exactly once, and the output is the same total
    * order. RangePartitioner skips sampling entirely at one partition,
    * which is what this shape guarantees statically.
    *
    * Contract: PRESENTATION surfaces only — the terminal sort the
    * driver's hash-compare consumes (it re-sorts rows anyway). Every
    * terminal sort in the query maps qualifies, including per-document
    * outputs: at production scale a presentation sort of a corpus-sized
    * output would simply be dropped (nobody totally orders 100 TB of
    * output to look at it), so the honest scale story is "no sort",
    * not "distributed sort". Library operators (graft.ext, graft.ops)
    * must NEVER call this — an operator that needs ordered data at
    * scale uses `orderBy`/`sortWithinPartitions` on its own partitioning
    * (q9_set_ops keeps one genuine global `orderBy` as that operator's
    * representative).
    *
    * The single-partition funnel is therefore NOT unconditional code: a
    * deployment running these query shapes over corpus-sized outputs
    * sets `spark.graft.presentationSort` and the terminal stage obeys
    * it — `off` drops the presentation sort entirely (the honest 100 TB
    * mode: the output stays on its upstream partitioning), `range`
    * plans a distributed range sort for the rare consumer that needs a
    * totally-ordered multi-partition result and accepts the sampling
    * double-execution, `local` (default) keeps the one-exchange local
    * sort that Verify/Bench rely on at fixture scale. */
  def ordered(cols: Column*)(df: DataFrame): DataFrame =
    df.sparkSession.conf.get("spark.graft.presentationSort", "local") match {
      case "off"   => df
      case "range" => df.orderBy(cols: _*)
      case _       => df.repartition(1).sortWithinPartitions(cols: _*)
    }

  /** ONE-scan planted-variant corpus: each input row explodes into the
    * rows of `variants` that are non-null for it (pass unconditional
    * variants as plain structs, conditional ones as
    * `when(pred, struct(...))` — when without otherwise is null). The
    * union-of-filtered-branches formulation this replaces re-decoded the
    * scanned columns once per branch (~0.45s/branch on the sf0.1 text
    * column); the explode is map-side and the row SET is identical.
    * All variant structs must share the field names in `fields`. */
  def plantedVariants(df: DataFrame, fields: Seq[String],
      variants: Column*): DataFrame =
    df.select(explode(filter(array(variants: _*), v => v.isNotNull)).as("_v"))
      .select(fields.map(f => col(s"_v.$f").as(f)): _*)

  /** Exact 2-decimal view of a double column (fixtures are 2-dp values). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Order-independent exact sum of a 2-dp double column, surfaced as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Exact average = exact sum / count, both surfaced as double — matches
    * DuckDB's CAST(SUM(DECIMAL) AS DOUBLE)/COUNT(*) exactly. */
  def davg(c: Column): Column = sum(dec(c)).cast("double") / count(lit(1))
}
