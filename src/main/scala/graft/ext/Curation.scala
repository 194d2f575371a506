package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the standard pre-training data pipeline
  * as ONE composed, declarative Catalyst plan.
  *
  *   quality gate → exact-fingerprint dedup → benchmark decontamination
  *   → sequence packing
  *
  * Stage order is the scale-ordering a 100 TB run wants: the gate is a
  * pure scan-stage filter and prunes before anything shuffles; dedup then
  * shuffles only fingerprints of survivors (keep-min semantics); the
  * decontamination join broadcasts the eval-set shingles so the corpus is
  * never shuffled for it; and the packer's distributed two-pass cumsum
  * ([[TextOps.packBins]]) sees only the final survivors. No stage
  * materializes an intermediate — Catalyst plans the whole chain
  * together, so column pruning reaches the parquet scan once.
  */
object Curation {

  /** Run the full curation chain over a (doc_id, text) corpus against a
    * (text) benchmark set. Returns the packed survivor frame
    * (doc_id, n_tokens, tokens_before, bin) in doc_id order semantics
    * (bin assignment is deterministic in doc_id). */
  def curate(docs: DataFrame, benchmark: DataFrame,
      tokensPerBin: Long = 2000L, ngram: Int = 8): DataFrame = {
    // the gate is the PREDICATE form of qualityFlags (spec-asserted
    // equivalent) — a pure scan-stage filter, not a self-join back onto
    // the flag table, so the corpus really is scanned once and nothing
    // shuffles before dedup
    // kept feeds the fingerprint-min detector AND the semi-join's left
    // side: pin it so the scan + quality predicate (token stats +
    // regexes over every text) run once (caller sweeps caches)
    val kept = docs.filter(TextOps.qualityKeep(col("text")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dedupKeep = kept
      .groupBy(TextOps.fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val deduped = kept.join(dedupKeep, Seq("doc_id"), "left_semi")
    val clean = Dedup.decontaminate(deduped, benchmark, n = ngram)
    // shard boundaries sample the RAW corpus, not the pipeline tail, so
    // the packer's tiny boundary job never re-runs gate+dedup+decontam
    TextOps.packBins(clean, tokensPerBin, boundarySource = docs)
  }

  /** Per-document curation audit: the FIRST gate of [[curate]] that
    * removed each doc — 'quality' (gate predicate fails), 'duplicate'
    * (quality passer but not the min-id member of its normalized
    * fingerprint group), 'contaminated' (dedup survivor sharing an
    * n-gram with the benchmark) — or 'kept'. The "why did my document
    * disappear" surface a production pipeline answers constantly;
    * mirrors [[curate]]'s gate ORDER exactly, so a doc dropped by two
    * gates reports the earlier one, same as the pipeline behaves.
    *
    * Shape: same pieces as the curate plan — scan-stage quality flag, a
    * skew-immune fingerprint-keyed MIN aggregation + equi-join for the
    * dup verdict, survivor shingles semi-joined against the broadcast
    * benchmark — plus doc_id-keyed left joins to assemble the verdicts.
    * Nothing new shuffles the corpus; the audit costs roughly what the
    * pipeline itself costs. */
  def explainCuration(docs: DataFrame, benchmark: DataFrame,
      ngram: Int = 8): DataFrame = {
    val q = docs.select(col("doc_id"), col("text"),
      TextOps.qualityKeep(col("text")).as("_q"))
    // dup rank via fingerprint-keyed MIN agg (map-side combinable, same
    // skew-immunity rationale as segmentDedup) instead of a row_number
    // window that would funnel a hyper-duplicated fingerprint's group
    // through one task's sort
    val passed = q.filter(col("_q"))
      .select(col("doc_id"), col("text"),
        TextOps.fingerprint(col("text")).as("_fp"))
    val minPerFp = passed.groupBy(col("_fp"))
      .agg(min(col("doc_id")).as("_min_id"))
    val ranked = passed.join(minPerFp, Seq("_fp"))
      .select(col("doc_id"), col("text"),
        (col("doc_id") =!= col("_min_id")).as("_dup"))
    val contam = Dedup.contaminatedIds(
        ranked.filter(!col("_dup")).select(col("doc_id"), col("text")),
        benchmark, ngram)
      .withColumn("_c", lit(true))
    q.select(col("doc_id"), col("_q"))
      .join(ranked.select(col("doc_id"), col("_dup")), Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(!col("_q"), "quality")
          .when(col("_dup"), "duplicate")
          .when(col("_c"), "contaminated")
          .otherwise("kept").as("reason"))
  }

  /** Snapshot DIFF between two corpus versions: per doc_id, compare the
    * content fingerprint ([[TextOps.fingerprint]] — robust to
    * whitespace/punctuation-only edits) and classify
    * added / removed / changed / unchanged. The "what actually moved
    * between crawls" report a pipeline runs before deciding whether to
    * re-curate, re-dedup, or re-train.
    *
    * Shape at 100 TB: both sides reduce to (doc_id, fingerprint) at scan
    * speed — 16 bytes of content per row cross the wire, never the text —
    * and the full-outer join shuffles only those slim rows on doc_id.
    * Returns (doc_id, status); aggregate downstream as needed. */
  def snapshotDiff(base: DataFrame, next: DataFrame): DataFrame = {
    val b = base.select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp_b"))
    val n = next.select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp_n"))
    b.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("fp_b").isNull, lit("added"))
          .when(col("fp_n").isNull, lit("removed"))
          .when(col("fp_b") === col("fp_n"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** 2-D Pareto frontier (skyline): keep the rows NOT dominated under
    * (minimize `minKey`, maximize `maxKey`) — the multi-criteria
    * selection step of curation ("cheapest docs at every quality level":
    * a row survives iff nothing is at-most-as-costly AND
    * at-least-as-good with one strict). Both keys must be non-null
    * integers (pre-scale decimals to cents/micros — exact longs keep
    * the dominance comparisons engine-portable).
    *
    * Shape at 100 TB: the textbook skyline is a quadratic self-join;
    * the sort-based one is a GLOBAL ordered scan — a single-task window.
    * Neither survives. This runs in three bounded steps:
    *   1. collapse to the per-`minKey` maximum of `maxKey` (one
    *      map-combinable agg — the grid is |distinct minKey| ≪ corpus);
    *   2. frontier test on the grid: a grid point survives iff its max
    *      beats every strictly-cheaper point's max — running prefix-max
    *      via [[graft.ops.Layout.orderedShard]] (monotone literal shard
    *      boundaries) + per-shard maxima prefix-combined on the driver
    *      (≤ shards longs of state) + a shard-LOCAL window. Same
    *      two-pass pattern as `packBins`/`globalRowNumber`; no
    *      unpartitioned WindowExec anywhere;
    *   3. semi-join the corpus back on (minKey, maxKey) — frontier
    *      duplicates (ties on both keys) all survive, matching the
    *      strict-dominance definition.
    */
  def paretoFrontier2d(df: DataFrame, minKey: Column, maxKey: Column,
      shards: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val n = if (shards > 0) shards
      else spark.sessionState.conf.numShufflePartitions
    val grid = df.groupBy(minKey.cast("long").as("_sk_min"))
      .agg(max(maxKey.cast("long")).as("_sk_max"))
    val sharded = grid.withColumn("_shard",
      graft.ops.Layout.orderedShard(grid, col("_sk_min"), n))
    // per-shard maxima -> driver prefix-max literal map (the max over
    // all EARLIER shards; NULL for the first — a Long.MinValue sentinel
    // would silently drop an undominated point whose maxKey IS
    // Long.MinValue, which is in-contract)
    val maxima = sharded.groupBy(col("_shard"))
      .agg(max(col("_sk_max")).as("m"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc: Option[Long] = None
    val prefix = maxima.map { case (pid, m) =>
      val o = acc; acc = Some(acc.fold(m)(math.max(_, m))); (pid, o)
    }
    val nullLong = lit(null).cast("long")
    val prevShardMax =
      if (prefix.forall(_._2.isEmpty)) nullLong
      else coalesce(element_at(
        map(prefix.collect { case (p, Some(o)) => Seq(lit(p), lit(o)) }
          .flatten: _*), col("_shard")), nullLong)
    val w = Window.partitionBy(col("_shard")).orderBy(col("_sk_min"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // greatest() ignores nulls, so _prev is null only when NO earlier
    // grid point exists anywhere — and such a point is always frontier
    val frontier = sharded
      .withColumn("_prev", greatest(
        max(col("_sk_max")).over(w), prevShardMax))
      .filter(col("_prev").isNull || col("_sk_max") > col("_prev"))
      .select(col("_sk_min"), col("_sk_max"))
    df.join(frontier,
      minKey.cast("long") === col("_sk_min") &&
        maxKey.cast("long") === col("_sk_max"), "left_semi")
  }
}
