package graft.ext

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Bounded posting-list builder — the shared fat-bucket valve for every
  * blocked pair detector (SAX series neighbors, phash image near-dups,
  * MinHash-LSH bands). The problem it solves: the natural
  * `groupBy(block).agg(collect_list(member))` materializes an ENTIRE
  * block in one aggregation buffer before any size filter can see it,
  * so a degenerate hot block (millions of flat profiles on one shape
  * word, millions of flat-color thumbnails on one dHash) OOMs an
  * executor long before the pair filter runs.
  *
  * The fix is two-phase, SPLIT-don't-drop:
  *
  *   1. COUNT first: one map-combinable `groupBy(block).count()` pass —
  *      the df-cap discipline of [[Dedup.ngramJaccardPairs]]. The fat
  *      list (count > maxBucket) has at most |rows|/maxBucket entries.
  *      The pass runs EAGERLY (one tiny job at plan-construction time)
  *      because its count is load-bearing twice over: it decides the
  *      fat-join strategy on a MEASURED size instead of a forced
  *      `broadcast()` hint (at the 100 TB regime the fat list is
  *      10⁷–10⁸ entries — a forced broadcast would OOM the driver;
  *      see `broadcastFatMax`), and it short-circuits the whole split
  *      machinery when no block is fat (the common case at moderate
  *      scale: the plan is then the classic single-aggregation posting
  *      build over the pinned rows, no join at all).
  *   2. SPLIT fat blocks BEFORE collecting: each fat-block member hashes
  *      into one of G = ceil(2·count/maxBucket) groups; every unordered
  *      group pair (g1 ≤ g2) becomes its own SUB-posting holding only
  *      members of those two groups. Every collect_list buffer is then
  *      ≤ ~maxBucket members (2·count/G by construction) REGARDLESS of
  *      block size — G scales with the block, unlike a fixed split
  *      factor, so the bound survives a 100× corpus. Small blocks keep
  *      one copy and one posting (`_g1 = _g2 = -1`).
  *
  * Pair ownership keeps the result set IDENTICAL to the uncapped run: a
  * member lands in the G sub-postings that include its group, so a pair
  * co-occurs in several, but it is OWNED by exactly one — (g,g) owns
  * same-group pairs, (g1,g2) owns exactly the cross-group ones. Callers
  * apply [[Posting.owns]] at emission, next to their distance filter.
  * The replication cost (×G on fat-block members only) is the price of
  * spreading an inherently quadratic pair scan over G·(G+1)/2 tasks
  * instead of one; output volume is the query's semantics, not the
  * valve's.
  *
  * Cache lifecycle: the valve consumes `rows` twice (count pass +
  * posting build) and detector upstreams are expensive (minhash/simhash
  * signatures, phash decodes, hour profiles), so the rows are pinned
  * MEMORY_AND_DISK for the count pass and the returned plan. The pin is
  * SELF-RELEASING: a one-shot [[QueryExecutionListener]] unpersists it
  * after the next completed non-valve action THAT CONSUMES THE PIN
  * (its plan scans this pin's InMemoryRelation) — the caller's
  * consuming action (count / collect / write), so a long-lived library
  * session accumulates nothing (the discipline of Cluster/Bpe/Graph,
  * adapted to a lazily-consumed result). Unrelated actions on a shared
  * session — another thread's query, a failed probe elsewhere — do NOT
  * release it. If the pin is released before a second consumption, the
  * posting recomputes from lineage — the pin is a performance artifact,
  * never a correctness dependency. A posting that is built but never
  * consumed keeps its pin until `Tables.sweepOperatorCaches`, the
  * batch-boundary backstop sweep.
  *
  * Same sub-posting discipline as [[Dedup.simhashPairs]]'s in-task
  * split, lifted BEFORE the aggregation so the memory bound holds at
  * the buffer, not just at emission.
  */
object Posting {

  /** Alias prefix marking the valve's own eager count job so the
    * self-release listener can tell it apart from the caller's
    * consuming action (any bounded() call's probe, not just this
    * one's — composed detectors construct several valves before the
    * first real action). */
  private val ProbePrefix = "_graft_valve_probe"

  /** Unpersist `pinned` after the next completed action on `spark`
    * that (a) is not a valve-internal count probe and (b) actually
    * CONSUMES the pin — its optimized plan scans this pin's
    * InMemoryRelation. The scope check is what makes the valve safe on
    * a shared session: an unrelated concurrent query (another thread,
    * another operator) must not release a pin whose posting has not
    * been consumed yet — that would silently recompute the expensive
    * upstream (signatures/decodes) at consumption time. One-shot: fires
    * once, then unregisters itself. If the scope check itself throws on
    * some exotic plan, it fails OPEN (treats the action as consuming):
    * releasing early costs a recompute, never correctness; leaking
    * until `Tables.sweepOperatorCaches` is the worse failure mode. */
  private def releaseAtNextAction(spark: SparkSession, pinned: DataFrame): Unit = {
    val pinnedPlan = pinned.queryExecution.analyzed
    val listener = new QueryExecutionListener {
      private val done = new AtomicBoolean(false)
      private def isProbe(qe: QueryExecution): Boolean =
        qe.analyzed.exists(_.output.exists(_.name.startsWith(ProbePrefix)))
      private def consumesPin(qe: QueryExecution): Boolean =
        try qe.optimizedPlan.exists {
          case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
            r.cacheBuilder.logicalPlan.sameResult(pinnedPlan)
          case _ => false
        } catch { case scala.util.control.NonFatal(_) => true }
      private def fire(qe: QueryExecution): Unit =
        if (!isProbe(qe) && consumesPin(qe) && done.compareAndSet(false, true)) {
          pinned.unpersist(blocking = false)
          spark.listenerManager.unregister(this)
        }
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = fire(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = fire(qe)
    }
    spark.listenerManager.register(listener)
  }

  /** Collect `rows` (one row per block-member) into bounded posting
    * lists. Output: `blockCols ++ (_G, _g1, _g2, ms)` with `ms` a
    * sorted member array of size ≥ 2 and ≤ ~maxBucket. `memberCol`
    * must be a struct column; member structs must be unique within a
    * block (they carry the member key). `maxBucket = Int.MaxValue`
    * skips the count pass entirely — the plan is then the classic
    * single-aggregation posting build.
    *
    * `broadcastFatMax` gates the fat-list join strategy: a fat list of
    * ≤ this many entries gets the broadcast hint (~100 B/entry → the
    * default fits the 10 MB autoBroadcastJoinThreshold intent); a
    * bigger one joins unhinted, so Catalyst/AQE picks a shuffled join
    * and the driver never materializes a multi-GB fat list.
    *
    * SIDE EFFECT a library caller must know: with a finite `maxBucket`
    * this method launches one small Spark job (the fat-block count) at
    * PLAN-CONSTRUCTION time — the count is load-bearing for the join
    * strategy and the split short-circuit, so it cannot ride the
    * consuming action. Callers that only build/explain plans still pay
    * it (and should sweep via `Tables.sweepOperatorCaches` if they
    * never consume the result — see the cache-lifecycle contract in
    * the object scaladoc). */
  def bounded(rows: DataFrame, blockCols: Seq[String], memberCol: String,
      maxBucket: Int, broadcastFatMax: Long = 100000L): DataFrame = {
    require(maxBucket >= 4, s"maxBucket must be >= 4, got $maxBucket")
    val bc = blockCols.map(col)
    val m = col(memberCol)
    def classic(src: DataFrame): DataFrame =
      src.groupBy(bc: _*)
        .agg(sort_array(collect_list(m)).as("ms"))
        .filter(size(col("ms")) >= 2)
        .select(bc :+ lit(1).as("_G") :+ lit(-1).as("_g1") :+
          lit(-1).as("_g2") :+ col("ms"): _*)
    if (maxBucket == Int.MaxValue) classic(rows)
    else {
      val spark = rows.sparkSession
      val pinned = rows.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // registered BEFORE the probe count so no action can slip between
      // count and registration; the probe alias keeps the count itself
      // (and sibling valves' counts) from triggering the release
      releaseAtNextAction(spark, pinned)
      val fat = pinned.groupBy(bc: _*)
        .agg(count(lit(1)).as("_cnt"))
        .filter(col("_cnt") > maxBucket)
      val nFat = fat.select(col("_cnt").as(s"${ProbePrefix}_cnt")).count()
      if (nFat == 0L) classic(pinned)
      else {
        val fatSide = if (nFat <= broadcastFatMax) broadcast(fat) else fat
        // G per block, not a fixed factor: sub-postings stay ≤ maxBucket
        // members however hot the block is
        val g = pmod(hash(m), col("_G"))
        pinned.join(fatSide, blockCols, "left")
          .withColumn("_G",
            when(col("_cnt").isNull, lit(1L))
              .otherwise(expr(s"(_cnt * 2 + ${maxBucket - 1}) DIV $maxBucket"))
            .cast("int"))
          .withColumn("_x", explode(when(col("_cnt").isNull, array(lit(-1)))
            .otherwise(sequence(lit(0), col("_G") - 1))))
          .withColumn("_g1", when(col("_x") === -1, lit(-1))
            .otherwise(least(g, col("_x"))))
          .withColumn("_g2", when(col("_x") === -1, lit(-1))
            .otherwise(greatest(g, col("_x"))))
          .groupBy(bc ++ Seq(col("_g1"), col("_g2")): _*)
          .agg(first(col("_G")).as("_G"), sort_array(collect_list(m)).as("ms"))
          .filter(size(col("ms")) >= 2)
          .select(bc :+ col("_G") :+ col("_g1") :+ col("_g2") :+ col("ms"): _*)
      }
    }
  }

  /** Ownership predicate for a candidate pair (a, b) of one posting
    * row: true in exactly one sub-posting per block, so emission needs
    * no distinct. Evaluate it WHERE `_G`/`_g1`/`_g2` are in scope
    * (i.e. on the posting row, next to the distance filter). */
  def owns(a: Column, b: Column): Column =
    col("_g1") === -1 || col("_g1") === col("_g2") ||
      pmod(hash(a), col("_G")) =!= pmod(hash(b), col("_G"))

  /** STREAMED pair emission from a bounded posting: a lazy
    * `mapPartitions` iterator yields one (a, b) member pair at a time,
    * so peak task memory is O(|ms| · structSize) — one posting row's
    * member array — no matter how many pairs the row owns. Output:
    * every non-`ms` posting column (block keys, `_G`/`_g1`/`_g2` for
    * [[owns]]) plus member-struct columns `a` and `b` (a before b in
    * the sorted array, so emitted keys are already ordered); callers
    * apply their distance filter, [[owns]], and the output projection
    * as ordinary codegen Columns downstream.
    *
    * Why not Catalyst expressions: EVERY expression shape was measured
    * to materialize the quadratic pair set of one posting row at once
    * (SkewProbe, n=2·10⁴ identical docs at sf1, OOM at any heap):
    * `flatten(transform(...))` builds the full C(|ms|, 2) array as one
    * value, and chained explodes are worse in disguise — codegen
    * `GenerateExec` appends every joined output row to its
    * `BufferedRowIterator` as an `UnsafeRow.copy()` (each copy carrying
    * the whole `ms` array it joins in) with `shouldStop()` checked only
    * OUTSIDE the generate loop, so one input row's entire expansion
    * buffers before the consumer can drain — multi-GB per posting row
    * at the real default cap. A shuffle between anchor and pair explode
    * would bound the buffer but materializes pair-volume bytes with the
    * fat `ms` payload attached. The typed iterator is the one shape
    * whose laziness Spark guarantees (the SerializeFromObject consumer
    * pulls one pair at a time); its serde cost rides the inherently
    * quadratic emission loop, measured ~neutral at fixture scale. */
  def streamPairs(posting: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, StructField, StructType}
    val schema = posting.schema
    val msIdx = schema.fieldIndex("ms")
    val mtype = schema("ms").dataType.asInstanceOf[ArrayType].elementType
    val keepIdx = schema.fields.indices.filter(_ != msIdx)
    val outSchema = StructType(
      keepIdx.map(schema.fields) ++
        Seq(StructField("a", mtype), StructField("b", mtype)))
    posting.mapPartitions { rows =>
      rows.flatMap { r =>
        val ms = r.getSeq[Row](msIdx)
        val base = keepIdx.map(r.get)
        val n = ms.length
        (0 until n - 1).iterator.flatMap { i =>
          val a = ms(i)
          ((i + 1) until n).iterator.map { j =>
            Row.fromSeq(base :+ a :+ ms(j))
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
