package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.ext.TextOps

/** One emitted trending-terms counter (Update mode: the latest emission
  * per (shard, term) is the current sketch row; counts only grow, so
  * "latest" = max count). */
final case class TrendingTerm(shard: Int, term: String, count: Long, err: Long)

/** Streaming document curation: the incremental twin of
  * [[graft.ext.Curation]] for a continuously-arriving corpus — the shape
  * a crawl-ingest pipeline runs, where "the corpus" is an ever-growing
  * base plus a stream of new documents.
  *
  * Stage order mirrors the batch pipeline and its scale reasoning:
  *  1. quality gate ([[TextOps.qualityKeep]]) — stateless, scan-stage;
  *     drops junk before it can create any state;
  *  2. dedup vs the BASE corpus — a stream-static LEFT ANTI equi-join on
  *     the base's distinct-fingerprint index ([[TextOps.fingerprint]]).
  *     The index is exactly what [[graft.ext.Dedup.incrementalDedup]]
  *     uses in batch: one 128-bit key per historical doc, re-read per
  *     micro-batch, never the base text;
  *  3. dedup WITHIN the stream — `dropDuplicatesWithinWatermark` on the
  *     fingerprint, so state holds only fingerprints younger than the
  *     watermark horizon (bounded, unlike a plain dropDuplicates whose
  *     state grows with the corpus). First arrival wins — the streaming
  *     analogue of batch keep-min, equal to it whenever arrival order
  *     follows doc_id.
  */
object DocStreams {

  /** Curate a document stream with schema (doc_id, text, ts) against a
    * static `baseFp` frame of (fp) fingerprints. Emits surviving rows
    * with their fingerprint attached. */
  def curatedStream(docs: DataFrame, baseFp: DataFrame,
      watermark: String = "1 hour"): DataFrame =
    docs.withWatermark("ts", watermark)
      .filter(TextOps.qualityKeep(col("text")))
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .join(baseFp.select(col("fp")), Seq("fp"), "left_anti")
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming DECONTAMINATION gate: drop stream documents sharing any
    * word n-gram with the benchmark set — [[graft.ext.Dedup.decontaminate]]'s
    * streaming twin (equivalence spec-asserted in DocStreamsSpec).
    *
    * The benchmark reduces ONCE on the driver to its distinct shingle
    * set (eval suites are tiny) and rides the plan as a literal array
    * behind a scan-stage overlap predicate — STATELESS, so it composes
    * anywhere in a streaming chain: no join state, no watermark
    * interaction, and micro-batches never re-derive the eval side. At
    * eval sizes past literal-array comfort (~10⁶ shingles), swap the
    * confirm for the [[graft.functions.BloomMightContain]] prefilter +
    * stream-static semi-join — the batch bloom path's shape. */
  def decontaminatedStream(docs: DataFrame, benchmark: DataFrame,
      n: Int = 8): DataFrame = {
    import graft.ext.Dedup
    val shs: Array[String] = benchmark
      .select(explode_outer(Dedup.shingles(col("text"), n)).as("sh"))
      .filter(col("sh").isNotNull).distinct()
      .collect().map(_.getString(0))
    // null-compact the doc shingles: arrays_overlap is three-valued with
    // null elements and a null verdict must not drop the row
    val docShs = filter(Dedup.shingles(col("text"), n), x => x.isNotNull)
    docs.filter(!arrays_overlap(docShs, lit(shs)))
  }

  /** Streaming NEAR-dup gate against a static base corpus —
    * [[graft.ext.Dedup.minhashLshAgainst]]'s streaming twin (equivalence
    * spec-asserted): drop stream documents whose MinHash signature
    * agrees with any base signature on ≥ `threshold` of its 16
    * components, discovered through the banded LSH index.
    *
    * STATELESS reformulation, because the batch shape (band join →
    * candidate distinct → per-doc verdict) needs aggregations a
    * streaming append query cannot run: instead the stream row keeps its
    * one-row shape and LEFT-joins the four per-band static indexes
    * ((band-hash) → list of base signatures in that bucket); the verdict
    * is then a row-local `exists` over ≤ 4 candidate lists. No shuffle
    * of the stream beyond the four hash joins, no watermark interaction,
    * no state store. Fat band-buckets (boilerplate-heavy bases) inflate
    * the candidate lists — cap them upstream with the same df-discipline
    * as the batch detectors. */
  /** STREAMING heavy hitters — trending terms over an unbounded document
    * stream with BOUNDED state: the streaming twin of the batch
    * [[graft.functions.SpaceSaving]] aggregator (same eviction rule, so
    * the exact-regime equivalence is spec-asserted).
    *
    * Sharding makes it scale: terms hash-partition across `shards` keyed
    * states, and because a term lives in exactly ONE shard, the union of
    * the shard sketches IS the global sketch — no cross-shard merge, no
    * global state. Total state is ≤ shards × capacity counters forever,
    * independent of stream length or vocabulary size; per trigger each
    * shard first collapses its arriving terms to local counts (order-
    * independent), then applies them in sorted term order, so emissions
    * are deterministic for a given micro-batch slicing.
    *
    * Guarantees inherited from SpaceSaving, per shard over its substream:
    * true count ∈ [count − err, count]; any term with frequency >
    * substream/capacity is present. Update-mode output: each trigger
    * re-emits the current counters of shards that received data; the
    * live sketch at the sink is the latest row per (shard, term) —
    * counts are monotone, so `max(count)` group-wise reconstructs it.
    *
    * Input needs a `text` column; `docs` may carry anything else. */
  def trendingTerms(spark: SparkSession, docs: DataFrame,
      capacity: Int = 64, shards: Int = 8): Dataset[TrendingTerm] = {
    import spark.implicits._
    require(capacity > 0 && shards > 0)

    // same +k eviction rule as SpaceSaving.reduce applied k times: a
    // resident term adds k; a newcomer inherits the evicted minimum
    def addK(buf: Map[String, (Long, Long)], item: String,
        k: Long): Map[String, (Long, Long)] =
      buf.get(item) match {
        case Some((c, e)) => buf.updated(item, (c + k, e))
        case None if buf.size < capacity => buf.updated(item, (k, 0L))
        case None =>
          val (minItem, (minC, _)) = buf.minBy { case (i, (c, _)) => (c, i) }(
            Ordering.Tuple2(Ordering.Long, Ordering.String.reverse))
          (buf - minItem).updated(item, (minC + k, minC))
      }

    def update(shard: Int, rows: Iterator[(Int, String)],
        state: GroupState[Map[String, (Long, Long)]]): Iterator[TrendingTerm] = {
      // collapse the trigger's arrivals first (order-independent), then
      // apply in sorted term order -> deterministic within a trigger
      val batchCounts = rows.foldLeft(Map.empty[String, Long]) {
        case (m, (_, t)) => m.updated(t, m.getOrElse(t, 0L) + 1L)
      }
      val next = batchCounts.toSeq.sortBy(_._1)
        .foldLeft(state.getOption.getOrElse(Map.empty[String, (Long, Long)])) {
          case (buf, (t, k)) => addK(buf, t, k)
        }
      state.update(next)
      next.toSeq.sortBy { case (i, (c, _)) => (-c, i) }
        .map { case (i, (c, e)) => TrendingTerm(shard, i, c, e) }
        .iterator
    }

    docs.select(explode(TextOps.tokens(col("text"))).as("term"))
      .select(pmod(hash(col("term")), lit(shards)).cast("int").as("shard"),
        col("term"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(update)
  }

  def nearDupGatedStream(docs: DataFrame, base: DataFrame, n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    import graft.ext.Dedup
    val minMatch = math.ceil(threshold * 16).toInt
    // ONE (band, band-hash) → signature-list index, built from a single
    // signature pass over the base and PINNED: the four per-band joins
    // below filter this cached table, so micro-batches after the first
    // never re-scan the standing corpus (without the persist, each band
    // join would re-derive the index = 4 base passes per trigger).
    // Band hashing is Dedup.bandHash — shared with the batch detectors,
    // so the spec-asserted equivalence cannot drift.
    val idx = base
      .select(Dedup.minhashSigArray(col("text"), n).as("bsig"))
      .filter(element_at(col("bsig"), 1).isNotNull)
      .select(col("bsig"), explode(array((0 until 4).map(bnd =>
        struct(lit(bnd).as("band"),
          Dedup.bandHash(col("bsig"), bnd).as("bh"))): _*)).as("b"))
      .groupBy(col("b.band").as("band"), col("b.bh").as("bh"))
      .agg(collect_list(col("bsig")).as("cands"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val withSig = docs.withColumn("_sig",
      Dedup.minhashSigArray(col("text"), n))
    val joined = (0 until 4).foldLeft(withSig) { (df, bnd) =>
      val slice = idx.filter(col("band") === bnd)
        .select(col("bh").as(s"_bh$bnd"), col("cands").as(s"_cands$bnd"))
      df.withColumn(s"_bh$bnd",
          when(element_at(col("_sig"), 1).isNotNull,
            Dedup.bandHash(col("_sig"), bnd)))
        .join(slice, Seq(s"_bh$bnd"), "left")
    }
    val anyHit = (0 until 4).map { bnd =>
      coalesce(exists(col(s"_cands$bnd"), c =>
        size(filter(zip_with(col("_sig"), c, (x, y) => x === y),
          e => e)) >= minMatch), lit(false))
    }.reduce(_ || _)
    joined.filter(!anyHit).select(docs.columns.map(col): _*)
  }
}
