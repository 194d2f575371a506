package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Text-analysis operators for LLM training-data pipelines: tokenization,
  * quality scoring, language ID, fingerprinting. All pure column
  * expressions (codegen'd, no UDFs) — at 100 TB these run at scan speed
  * and pipeline inside whole-stage codegen with the parquet reader.
  *
  * Every function here has an exact DuckDB-SQL twin (see
  * graft.queries.Extensions) so the whole module is oracle-checked.
  *
  * ==Cache contract==
  * Multi-consumer operators here (and in [[Curation]], [[Classifier]],
  * and the query-local pins in graft.queries) `persist` internal frames
  * that the RETURNED lazy plan still references — bm25TopK's tf frame,
  * bigramNll's count tables, knNll's shared big frame, the cumsum
  * shards above. They cannot be unpersisted before return without
  * un-caching the very frame the caller is about to execute, so the
  * contract is caller-side: consume the result, then sweep via
  * [[graft.Tables.sweepOperatorCaches]] (drops catalog caches AND raw
  * localCheckpoint RDD blocks), exactly as graft.Bench, graft.Verify,
  * and graft.BenchCensus do after every query. A long-lived service
  * embedding these operators without a sweep accumulates spillable
  * MEMORY_AND_DISK blocks across calls — bounded per call, but
  * unbounded across an unswept session. CacheContractSpec pins both
  * sides: zero growth across swept rounds, and identical results when
  * a swept plan recomputes (pins are performance, never values). */
object TextOps {

  /** Whitespace tokens of trimmed text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Evaluate `body(toks)` with the token array BOUND ONCE per row.
    * Referencing `tokens(c)` from several sub-expressions of one
    * projection re-runs the regex split per reference (higher-order
    * functions are interpreted, so no common-subexpression elimination
    * rescues it — measured 6x slowdown on text_stats). Wrapping the
    * array in a single-element `transform` makes it a lambda variable:
    * split runs once, every use is an O(1) attribute read. */
  private[ext] def withTokens(c: Column)(body: Column => Column): Column =
    element_at(transform(array(tokens(c)), body), 1)

  private def hitsIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** BPE-ish subword count: letter runs, digit runs, single punctuation. */
  def subtokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Fraction of characters that are sentence punctuation. */
  def punctRatio(c: Column): Column =
    length(regexp_replace(c, "[^.,!?;:]", "")).cast("double") / length(c)

  /** Fraction of tokens in a stopword list. */
  def stopRatio(c: Column, stopwords: Seq[String]): Column =
    withTokens(c)(toks =>
      hitsIn(toks, stopwords).cast("double") / size(toks))

  /** Language-marker stopword lists (tiny n-gram heuristic). */
  val enMarkers = Seq("the", "a", "of", "and", "is")
  val esMarkers = Seq("el", "la", "de", "los", "es")
  val deMarkers = Seq("der", "die", "das", "und", "ist")

  /** argmax of (en, es, de) hit counts with the fixed deterministic
    * tie-break order en > es > de, over a struct of bound counts. */
  private def langDecision(h: Column): Column = {
    val (en, es, de) =
      (h.getField("en"), h.getField("es"), h.getField("de"))
    when(en >= es && en >= de, "en").when(es >= de, "es").otherwise("de")
  }

  /** Heuristic language ID: argmax of marker-list hit counts with a fixed
    * deterministic tie-break order (en > es > de). Both the token array
    * and the three hit counts are bound once per row (the `when` chain
    * reads each count up to three times). */
  def langGuess(c: Column): Column =
    element_at(
      transform(
        array(withTokens(c)(toks => struct(
          hitsIn(toks, enMarkers).as("en"),
          hitsIn(toks, esMarkers).as("es"),
          hitsIn(toks, deMarkers).as("de")))),
        h => langDecision(h)),
      1)

  /** Content fingerprint: md5 of lowercased text with all non-alphanumerics
    * stripped — robust to whitespace/punctuation-only edits. */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(lower(c), "[^a-z0-9]", ""))

  val defaultStopwords = Seq("the", "a", "of", "and", "to", "in")

  /** TF-IDF over a (doc_id, text) corpus: smoothed idf = ln(1 + N/df),
    * tf = term count within the doc. Two grouped aggregations + one join
    * on term — no cross product; df table is corpus-vocabulary-sized and
    * broadcastable at most scales. Returns (doc_id, term, tf, df, tfidf). */
  def tfIdf(docs: DataFrame): DataFrame = {
    val terms = docs.select(col("doc_id"),
      explode(tokens(col("text"))).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = terms.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    // no hard broadcast hint on df: the vocabulary table is tiny here but
    // web-scale corpora have multi-GB vocabularies — let AQE pick
    // broadcast vs shuffle from the actual size
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(lit(1.0) + col("n_docs").cast("double") /
          col("df").cast("double")), 6))
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  /** Okapi BM25 retrieval (Robertson & Spärck Jones; k1=1.2, b=0.75):
    * score every document against a small (qid, term) query-term table
    * and return the top-k per query. The standard lexical-retrieval leg
    * of training-data curation — targeted decontamination, eval-set
    * neighbor pulls, retrieval-augmented filtering.
    *
    * Shape at 100 TB: ONE explode feeds the (doc, term) tf table; doc
    * length and document frequency are both derived FROM tf (sum / count
    * per key), so no second pass over the corpus. The query table is
    * explicitly broadcast — scoring is a map-side hash join against the
    * tf shuffle, and only docs containing a query term survive it. The
    * corpus-stats row (N, total length) is a broadcast scalar. Top-k
    * ranks inside each query's candidate set only. At real scale the tf
    * table would be materialized once (an inverted index) and reused
    * across query batches rather than recomputed per call.
    *
    * Determinism: each per-term score is one chain of IEEE ops from
    * exact longs, rounded to 6 dp and summed as DECIMAL(18,6) — the
    * same contract as [[bigramNll]] — then surfaced as double (lossless:
    * value*1e6 << 2^53). Ties rank by doc_id.
    *
    * Returns (qid, rn, doc_id, n_hit, score), rn = 1..k. */
  def bm25TopK(docs: DataFrame, queryTerms: DataFrame, k: Int = 10): DataFrame = {
    // tf is the inverted index this doc promises: it feeds dl, df AND
    // the scoring join below. Persist it, or each of the three
    // references re-tokenizes and re-shuffles the whole corpus
    // (measured 2x on the bench). The cache is the CALLER'S to clean —
    // Bench/Verify sweep `spark.catalog.clearCache()` per query, and a
    // real deployment would replace this with a materialized index.
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    // document frequency for the QUERY TERMS ONLY: the full-vocabulary
    // groupBy(term) aggregated (and shuffled) every distinct term in
    // the corpus to then use a handful of rows — restricting tf to the
    // query's distinct terms first computes the identical df values
    // (every doc containing the term still appears) over a frame the
    // size of the query's posting lists, and the result is small enough
    // to broadcast into the scoring join instead of shuffling on term
    // (r14; guide §2.3 "don't compute things you throw away")
    val df = tf
      .join(broadcast(queryTerms.select(col("term")).distinct()), Seq("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log(lit(1.0) +
      ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val num = col("tf").cast("double") * lit(2.2) // k1 + 1
    val den = col("tf").cast("double") +
      lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / avgdl))
    val scored = tf
      .join(broadcast(queryTerms), Seq("term"))
      .join(broadcast(df), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("s", round(idf * (num / den), 6).cast(DecimalType(18, 6)))
      .groupBy(col("qid"), col("doc_id"))
      .agg(count(lit(1)).as("n_hit"), sum(col("s")).cast("double").as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("qid"), col("rn"), col("doc_id"), col("n_hit"), col("score"))
  }

  /** Per-document n-gram novelty: the fraction of a doc's distinct
    * word shingles first seen in THAT doc, under the corpus's doc_id
    * order (crawl/ingest order in a real pipeline). The standard
    * corpus-redundancy readout — a falling novelty curve says new data
    * is mostly repeating what the corpus already holds, the signal for
    * when to stop crawling a source or tighten dedup.
    *
    * Shape at 100 TB: one explode → distinct (doc, shingle) pairs; the
    * first-occurrence index is a grouped MIN keyed by shingle (the same
    * posting shuffle every [[Dedup]] detector uses, partials map-side);
    * the join back is shingle-keyed and the per-doc counts combine
    * map-side. No self-join, no window, no driver state.
    *
    * Determinism: counts are exact longs; novelty is a single IEEE
    * division. Docs with fewer than n tokens have no shingles and are
    * absent, matching the oracle's empty range.
    *
    * Returns (doc_id, n_shingles, n_novel, novelty). */
  def ngramNovelty(docs: DataFrame, n: Int = 3): DataFrame = {
    val sh = docs
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), n)).as("sh"))
      .distinct()
    val first = sh.groupBy(col("sh")).agg(min(col("doc_id")).as("first_doc"))
    sh.join(first, Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_shingles"))
  }

  /** Corpus vocabulary: per token, total occurrences and document
    * frequency. One explode + one grouped aggregation (count-distinct on
    * doc_id plans as a two-phase expand-agg, all partials map-side).
    * Feeding a tokenizer-training step at 100 TB this is the whole job:
    * a single shuffle keyed by term. */
  def vocab(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n_occ"), countDistinct(col("doc_id")).as("n_docs"))

  // RE2-safe patterns (no backrefs/lookahead) so the SAME regex runs in
  // Spark (java.util.regex) and DuckDB (RE2) with identical matches
  val emailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val urlPattern = "https?://[^\\s]+"

  /** PII/boilerplate redaction: emails and URLs replaced by placeholder
    * tokens. A pure scan-speed column rewrite — the standard pre-training
    * scrub runs in the same codegen stage as the parquet read. */
  def redactPii(c: Column): Column =
    regexp_replace(regexp_replace(c, emailPattern, "<EMAIL>"),
      urlPattern, "<URL>")

  def countMatches(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))

  /** Gopher-style quality gate over a (doc_id, text) frame: per-doc
    * length / mean-token-length / stopword / punctuation signals and a
    * composite `keep` flag (0/1). Pure column expressions — the gate runs
    * at scan speed and, placed before expensive stages (dedup, embedding),
    * prunes the corpus where it is cheapest: at the source. */
  def qualityFlags(df: DataFrame,
      minTokens: Int = 10, maxTokens: Int = 5000,
      minMeanTokLen: Double = 2.0, maxMeanTokLen: Double = 12.0,
      minStopRatio: Double = 0.01, maxPunctRatio: Double = 0.2): DataFrame = {
    val txt = col("text")
    // token-derived signals bound once per row; the second select reads
    // them as O(1) struct fields. CollapseProject leaves the two projects
    // separate because `_ts` is non-cheap and referenced more than once.
    val ts = withTokens(txt)(toks => struct(
      size(toks).as("n_tokens"),
      hitsIn(toks, defaultStopwords).as("stop_hits")))
    val nTok = col("_ts.n_tokens")
    val meanLen = col("_nows").cast("double") / nTok
    val keep = nTok.between(minTokens, maxTokens) &&
      meanLen.between(minMeanTokLen, maxMeanTokLen) &&
      col("_ts.stop_hits").cast("double") / nTok >= minStopRatio &&
      punctRatio(col("text")) <= maxPunctRatio
    df.select(col("doc_id"), col("text"), ts.as("_ts"),
        length(regexp_replace(trim(txt), "\\s+", "")).as("_nows"))
      .select(col("doc_id"), nTok.as("n_tokens"),
        round(meanLen, 4).as("mean_tok_len"),
        when(keep, 1).otherwise(0).as("keep"))
  }

  /** The [[qualityFlags]] gate as a single Boolean predicate — for
    * streaming / filter-only paths that don't need the signal columns.
    * Stateless and scan-stage, so a stream pays nothing for it. Must stay
    * in lock-step with [[qualityFlags]] (spec-asserted equivalent). */
  def qualityKeep(txt: Column,
      minTokens: Int = 10, maxTokens: Int = 5000,
      minMeanTokLen: Double = 2.0, maxMeanTokLen: Double = 12.0,
      minStopRatio: Double = 0.01, maxPunctRatio: Double = 0.2): Column =
    withTokens(txt) { toks =>
      val nTok = size(toks)
      val meanLen = length(regexp_replace(trim(txt), "\\s+", "")).cast("double") / nTok
      nTok.between(minTokens, maxTokens) &&
        meanLen.between(minMeanTokLen, maxMeanTokLen) &&
        hitsIn(toks, defaultStopwords).cast("double") / nTok >= minStopRatio &&
        punctRatio(txt) <= maxPunctRatio
    }

  /** Per-source quantile calibration of a quality score: raw scores are
    * not comparable across sources (a web crawl's median differs from
    * books'), so gate each document on its percentile WITHIN its source
    * — `pctl` = percent_rank (ties share the min rank; 0 for singleton
    * sources) and `keep` = pctl ≥ `minPctl`, i.e. "drop each source's
    * worst `minPctl` tail" with one knob that means the same thing for
    * every source.
    *
    * Scale shape: NOT a per-source window over the documents (that
    * concentrates each source — possibly billions of rows — onto one
    * task). The empirical CDF is computed on the DISTINCT (source,
    * score) grid: one grouped count, one window over grid rows (bounded
    * by score cardinality, not corpus size), then an equi-join back.
    * Callers must therefore bound the score grid (round the score to a
    * fixed precision); pctl is exactly percent_rank of the rounded
    * score. Input: (source, score) + carry-through columns; appends
    * (pctl, keep). */
  def calibrateBySource(scored: DataFrame, minPctl: Double = 0.2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dist = scored.groupBy(col("source"), col("score"))
      .agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(col("source")).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cdf = dist
      .withColumn("_below", coalesce(sum(col("_c")).over(w), lit(0L)))
      .select(col("source"), col("score"), col("_below"))
    val nSrc = scored.groupBy(col("source")).agg(count(lit(1)).as("_n"))
    scored.join(cdf, Seq("source", "score"))
      .join(nSrc, Seq("source"))
      .withColumn("pctl", when(col("_n") === 1, lit(0.0))
        .otherwise(col("_below").cast("double") / (col("_n") - 1)))
      .withColumn("keep", when(col("pctl") >= minPctl, 1).otherwise(0))
      .drop("_below", "_n")
  }

  /** Greedy sequence packing: assign documents, in deterministic doc_id
    * order, to consecutive bins of ~`tokensPerBin` tokens — the layout
    * step that turns a curated corpus into fixed-budget training
    * sequences. A document starts a new bin when the running total would
    * exceed the budget (bin = floor(tokens-before-this-doc / budget)),
    * so every bin except possibly the last holds ≥ 1 doc and ≤ budget
    * tokens of lead-in.
    *
    * DISTRIBUTED global cumsum — the corpus never serializes through one
    * task. Two passes over a (doc_id, n_tokens) projection (two longs per
    * doc, not the text):
    *   1. assign each doc a deterministic ORDERED shard
    *      ([[graft.ops.Layout.orderedShard]] — boundary literals from a
    *      hash-chosen sample, identical in every job, unlike
    *      spark_partition_id over a per-execution-resampled range
    *      exchange); one grouped agg collects the per-shard token
    *      subtotals — exactly `shards` longs of driver state (same
    *      bounded-control-state budget as k-means centroids);
    *   2. prefix-sum those subtotals on the driver, compile them into a
    *      literal shard→offset map, and add each shard's offset to a
    *      PARTITIONED (by shard) window cumsum.
    * The shard function is monotonic in doc_id, so offset + local running
    * sum ≡ the global running sum and the output is bit-identical to the
    * single-window formulation at any parallelism.
    *
    * `boundarySource` (default: `docs` itself) is the frame the shard
    * boundaries are sampled from — pass a cheaper SUPERSET (e.g. the raw
    * corpus when `docs` is the tail of an expensive pipeline) to avoid
    * re-executing that pipeline for the tiny sample job; any superset
    * keeps the shard function monotonic, it only shifts the balance. */
  def packBins(docs: DataFrame, tokensPerBin: Long, numShards: Int = 0,
      boundarySource: DataFrame = null): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shards =
      if (numShards > 0) numShards
      else docs.sparkSession.sessionState.conf.numShufflePartitions
    val sampleFrom = Option(boundarySource).getOrElse(docs)
    // persist the 3-long-per-doc projection: pass 1 (offsets action) and
    // pass 2 (the window) would otherwise each re-execute the ENTIRE
    // upstream pipeline — for a curate() caller that is gate + dedup +
    // decontamination twice over. Spillable, and callers/harnesses clear
    // caches between queries; at 100 TB this is tens of bytes per doc,
    // the cheapest frame in the whole pipeline to pin.
    val counted = docs
      .select(col("doc_id"), tokenCount(col("text")).as("n_tokens"))
      .withColumn("_shard",
        graft.ops.Layout.orderedShard(
          sampleFrom.select(col("doc_id")), col("doc_id"), shards))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 1: per-shard subtotals -> driver prefix offsets (≤ `shards`
    // longs of state; shared helper with Layout.globalRowNumber)
    val offsetOf = graft.ops.Layout.prefixOffsets(counted, sum(col("n_tokens")))
    // pass 2: shard-local running sum + broadcast shard offset
    val w = Window.partitionBy(col("_shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    counted
      .withColumn("tokens_before",
        (coalesce(sum(col("n_tokens")).over(w), lit(0L)) + offsetOf).cast("long"))
      .withColumn("bin", (col("tokens_before") / tokensPerBin).cast("long"))
      .drop("_shard")
  }

  /** Greedy data selection under a global token budget: walk the corpus
    * in ascending `pr` (priority) order and keep every item whose
    * running token total STARTS below `budget` — "take the best
    * documents until the budget is spent", the selection step behind
    * quality-pruned training mixes (caller encodes quality-descending
    * order into an ascending unique long `pr`).
    *
    * Same two-pass distributed cumsum as [[packBins]] — ordered shards
    * from sampled boundaries, per-shard subtotals to driver prefix
    * offsets, shard-local window — so the corpus never serializes
    * through one task and the result is bit-identical to the
    * single-window formulation. Expects (…, pr: long unique, n_tokens);
    * appends `tokens_before` and filters to the selected prefix. */
  def budgetSelect(items: DataFrame, budget: Long,
      numShards: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shards =
      if (numShards > 0) numShards
      else items.sparkSession.sessionState.conf.numShufflePartitions
    // same two-pass persist rationale as packBins, on the same slim
    // discipline: the cumsum runs (and persists) a (pr, n_tokens, _shard)
    // projection — three longs per row, never the caller's payload
    // columns — and the survivors join back on the unique `pr`, so
    // column pruning reaches the caller's scan and the boundary-sample
    // job reads one pruned column
    val slim = items.select(col("pr"), col("n_tokens"))
    val sharded = slim.withColumn("_shard",
        graft.ops.Layout.orderedShard(slim.select(col("pr")), col("pr"), shards))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val offsetOf = graft.ops.Layout.prefixOffsets(sharded, sum(col("n_tokens")))
    val w = Window.partitionBy(col("_shard")).orderBy(col("pr"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val selected = sharded
      .withColumn("tokens_before",
        (coalesce(sum(col("n_tokens")).over(w), lit(0L)) + offsetOf).cast("long"))
      .filter(col("tokens_before") < budget)
      .select(col("pr").as("_sel_pr"), col("tokens_before"))
    items.join(selected, col("pr") === col("_sel_pr")).drop("_sel_pr")
  }

  /** Zipf slope of the corpus: ordinary-least-squares fit of
    * ln(frequency) against ln(rank) over the top `topN` terms — healthy
    * natural-language corpora sit near −1; templated/generated text
    * flattens the curve. The corpus-sized work is ONE token count
    * aggregation + a top-N (TakeOrderedAndProject); the regression then
    * runs over `topN` rows (the bounded-by-limit regime where a window
    * is fine), with each x/y/x²/xy term rounded to 9 dp and summed as
    * DECIMAL so slope and intercept are single IEEE expressions of
    * exact sums — oracle-hashable. Returns one row
    * (n_terms, slope, intercept). */
  def zipfSlope(docs: DataFrame, topN: Int = 100): DataFrame = {
    val top = docs
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(topN)
    val ranked = top
      // single-partition window over the topN-row limit result — bounded
      // by construction (see Bench/Verify's WindowExec note)
      .withColumn("rk", row_number().over(org.apache.spark.sql.expressions
        .Window.orderBy(col("c").desc, col("w"))))
      .select(log(col("rk").cast("double")).as("x"),
        log(col("c").cast("double")).as("y"))
    val terms = ranked.select(
      round(col("x"), 9).cast(DecimalType(20, 9)).as("xd"),
      round(col("y"), 9).cast(DecimalType(20, 9)).as("yd"),
      round(col("x") * col("x"), 9).cast(DecimalType(20, 9)).as("xxd"),
      round(col("x") * col("y"), 9).cast(DecimalType(20, 9)).as("xyd"))
    terms.agg(count(lit(1)).as("n_terms"),
        sum(col("xd")).cast("double").as("sx"),
        sum(col("yd")).cast("double").as("sy"),
        sum(col("xxd")).cast("double").as("sxx"),
        sum(col("xyd")).cast("double").as("sxy"))
      .select(col("n_terms"),
        round((col("n_terms") * col("sxy") - col("sx") * col("sy")) /
          (col("n_terms") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
        round((col("sy") - ((col("n_terms") * col("sxy") - col("sx") * col("sy")) /
          (col("n_terms") * col("sxx") - col("sx") * col("sx"))) * col("sx")) /
          col("n_terms"), 6).as("intercept"))
  }

  /** Per-document character-level Shannon entropy (bits/char) — the
    * classic gibberish/compression-junk signal: natural prose sits
    * ~4-4.5 bits, base64 blobs and repeated-char runs fall far outside.
    * One char explode → (doc, char) counts → per-doc totals join, all
    * keyed by doc_id (map-side combinable, no global state).
    * Determinism: each -p·log2(p) term is rounded to 9 dp and summed as
    * DECIMAL(20,9) — partition-order independent, oracle-hashable.
    * Returns (doc_id, n_chars, n_syms, entropy). */
  def charEntropy(docs: DataFrame): DataFrame = {
    // greatest(len, 1): sequence(1, 0) would count DOWN (same footgun
    // Dedup.shingles guards); the lone substr('',1,1)='' row an empty
    // doc then yields is dropped by the length filter, so empty docs
    // emit no output row — matching the oracle's empty range(1, 1)
    val chars = docs.select(col("doc_id"),
      explode(transform(sequence(lit(1), greatest(length(col("text")), lit(1))),
        i => col("text").substr(i, lit(1)))).as("ch"))
      .filter(length(col("ch")) === 1)
    val cnt = chars.groupBy(col("doc_id"), col("ch"))
      .agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy(col("doc_id")).agg(sum(col("c")).as("n"))
    cnt.join(tot, Seq("doc_id"))
      .withColumn("p", col("c").cast("double") / col("n"))
      .withColumn("term",
        round(-col("p") * log(2.0, col("p")), 9).cast(DecimalType(20, 9)))
      .groupBy(col("doc_id"), col("n"))
      .agg(count(lit(1)).as("n_syms"),
        sum(col("term")).cast("double").as("entropy"))
      .select(col("doc_id"), col("n").as("n_chars"), col("n_syms"),
        col("entropy"))
  }

  /** Corpus-internal boilerplate score: the fraction of each document's
    * distinct word n-grams that are "common" (appear in ≥ `minDocFreq`
    * distinct docs) — the header/footer/template signal used to strip
    * boilerplate before training. Same two-aggregation shape as TF-IDF:
    * shingle-keyed doc-frequency counts (the ≥-filter bounds the common
    * set), joined back on the shingle key and folded per doc. No
    * broadcast assumption — at web scale the common set is itself large,
    * so AQE picks the join strategy from actual sizes. Returns
    * (doc_id, n_shingles, n_common, frac) for docs with ≥ 1 shingle. */
  def boilerplateScore(docs: DataFrame, n: Int = 8,
      minDocFreq: Int = 2): DataFrame = {
    val sh = docs.select(col("doc_id"),
        explode_outer(array_distinct(Dedup.shingles(col("text"), n))).as("sh"))
      .filter(col("sh").isNotNull)
    val common = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocFreq)
      .select(col("sh"), lit(1).as("_common"))
    sh.join(common, Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"), count(col("_common")).as("n_common"))
      .select(col("doc_id"), col("n_shingles"), col("n_common"),
        round(col("n_common").cast("double") / col("n_shingles"), 6).as("frac"))
  }

  /** Per-domain URL accounting over a (doc_id, text) corpus: extract
    * every URL, parse its host, count occurrences and distinct source
    * docs — the base table for domain blocklists and per-domain crawl
    * quotas. One scan-stage explode + one grouped aggregation keyed by
    * domain; the count-distinct plans as a standard two-phase expand-agg
    * with map-side partials. */
  def urlDomains(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(regexp_extract_all(col("text"), lit(urlPattern), lit(0))).as("url"))
      .select(col("doc_id"),
        regexp_extract(col("url"), "https?://([^/\\s:]+)", 1).as("domain"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"), countDistinct(col("doc_id")).as("n_docs"))

  /** Domain-BLOCKLIST filter: drop every document containing a URL whose
    * host is in, or is a subdomain of, a blocked domain — the
    * opt-out / licensing / spam gate that runs right after crawl.
    *
    * Scale shape: each extracted host explodes into its ≤-label-depth
    * suffix chain ("a.b.example.net" → itself, "b.example.net",
    * "example.net") and EQUI-joins the broadcast blocklist — a hash
    * join keyed on the suffix string, never a per-(host × entry)
    * `endswith` scan, so a 10⁵-entry blocklist costs the same plan as a
    * 10-entry one. Single-label suffixes ("net") are excluded so a TLD
    * can never be blocked by accident. */
  def domainBlocklistFilter(docs: DataFrame, blocked: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bl = broadcast(blocked.toDF("suffix"))
    val labels = split(col("host"), "\\.")
    val suffixes = filter(
      transform(labels, (_, i) => array_join(slice(labels, i + 1, lit(1 << 20)), ".")),
      s => s.contains("."))
    val hit = docs
      .select(col("doc_id"),
        explode(regexp_extract_all(col("text"), lit(urlPattern), lit(0))).as("url"))
      .select(col("doc_id"),
        regexp_extract(col("url"), "https?://([^/\\s:]+)", 1).as("host"))
      .select(col("doc_id"), explode(suffixes).as("suffix"))
      .join(bl, Seq("suffix"), "left_semi")
      .select(col("doc_id")).distinct()
    docs.join(hit, Seq("doc_id"), "left_anti")
  }

  /** Canonical text normalization for matching: lowercase, every
    * non-alphanumeric character to a space, runs of spaces collapsed,
    * trimmed. The standard pre-step before contamination / dedup checks —
    * a verbatim eval leak survives reformatting (case changes, added
    * punctuation, re-wrapping), so matching must run on the normalized
    * form of BOTH sides. Pure scan-stage string ops; DuckDB computes the
    * identical function (fixture text is ASCII, where lower() agrees). */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  /** Fixed-token chunking with overlap: chunk i of a document covers
    * tokens [i·stride, i·stride + chunkTokens), for i·stride < n_tokens —
    * the context-window splitting step that turns curated documents into
    * model-sized pieces (stride < chunkTokens ⇒ consecutive chunks
    * overlap by chunkTokens − stride tokens). Entirely scan-local: the
    * token array binds once per row, chunks explode map-side, no shuffle
    * at any size. Returns (doc_id, chunk_id, n_tok, chunk_h) with the
    * md5 of each chunk's text standing in for the text itself. */
  def chunkDocs(docs: DataFrame, chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0, "chunkTokens and stride must be positive")
    docs.select(col("doc_id"), withTokens(col("text")) { toks =>
        transform(sequence(lit(0L), floor((size(toks) - 1) / stride)), i =>
          struct(i.cast("long").as("chunk_id"),
            size(slice(toks, i * stride + 1, lit(chunkTokens))).as("n_tok"),
            md5(concat_ws(" ", slice(toks, i * stride + 1, lit(chunkTokens))))
              .as("chunk_h")))
      }.as("chunks"))
      .select(col("doc_id"), explode(col("chunks")).as("c"))
      .select(col("doc_id"), col("c.chunk_id").as("chunk_id"),
        col("c.n_tok").as("n_tok"), col("c.chunk_h").as("chunk_h"))
  }

  /** Bigram language-model scoring: train add-one-smoothed bigram
    * probabilities on the corpus itself, then score every document by its
    * mean negative log-likelihood — the classic cheap perplexity proxy
    * for quality filtering (low avg_nll = predictable/common phrasing,
    * high = rare or garbled text). Two grouped counts + two joins keyed
    * by token — at 100 TB the count tables are vocabulary-sized (AQE
    * broadcasts them when small) and the bigram explode is scan-local
    * array slicing, no per-doc window shuffle.
    *
    * Determinism contract: each bigram's nll term is rounded to 6 dp and
    * summed as DECIMAL(18,6) — so the per-document total is independent
    * of partition/summation order, and DuckDB reproduces it exactly (one
    * ln() per term; both engines round the same value). The output is
    * the exact SUM (cast to double — value*1e6 stays far below 2^53, so
    * the cast is lossless), NOT the mean: a rounded mean sum/n can land
    * exactly on a rounding boundary (sum has 6 dp, n is small), where
    * Spark's BigDecimal HALF_UP and DuckDB's round() disagree by 1 ulp
    * of the last digit. Consumers derive mean = sum_nll / n_bigrams.
    *
    * Returns (doc_id, n_bigrams, sum_nll) for documents with >= 1 bigram.
    */
  def bigramNll(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("ws"))
    val bi = toks
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"),
        explode(arrays_zip(
          slice(col("ws"), lit(1), size(col("ws")) - 1),
          slice(col("ws"), lit(2), size(col("ws")) - 1))).as("b"))
      .select(col("doc_id"), col("b.0").as("w1"), col("b.1").as("w2"))
    // same restructure as dsirWeights: collapse to per-doc bigram counts
    // and pin them, so the corpus-sized explode runs once instead of
    // feeding the model-stats branch and the scoring join separately;
    // nll × count equals the per-occurrence decimal sum exactly.
    // uni likewise feeds two consumers (the unigram join + the vocab
    // count) — unpinned, the vocab row replays the token explode.
    val bc = bi.groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uni = toks.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val big = bc.groupBy(col("w1"), col("w2")).agg(sum(col("cnt")).as("c12"))
    // vocabulary size = the unigram table's row count — reuses `uni`
    // instead of a second explode over the corpus
    val v = uni.agg(count(lit(1)).as("vocab"))
    val scored = bc
      .join(big, Seq("w1", "w2"))
      .join(uni, col("w1") === col("w"))
      .crossJoin(broadcast(v))
      .withColumn("nll",
        round(-log((col("c12") + lit(1.0)) /
          (col("c1") + col("vocab")).cast("double")), 6)
          .cast(DecimalType(18, 6)))
    scored.groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_bigrams"),
        sum(col("nll") * col("cnt")).cast("double").as("sum_nll"))
  }

  /** DSIR-style importance weights (Xie et al., NeurIPS'23 "Data
    * Selection for Language Models via Importance Resampling"): per
    * document, the log-likelihood ratio between a TARGET-domain bigram
    * LM and the RAW-corpus bigram LM, both add-one smoothed over the
    * shared bigram vocabulary. Documents whose n-gram distribution
    * resembles the target subset score high; resampling the corpus by
    * these weights tilts the training mixture toward the target domain.
    *
    * Shape at 100 TB: the statistics for BOTH models come from ONE
    * aggregation over the exploded corpus — the target counts are a
    * conditional sum riding the same (w1, w2) shuffle as the raw counts,
    * so adding the second LM costs zero extra passes. Scoring re-joins
    * the stats table once, keyed by bigram (map-side combinable on both
    * legs); the totals row is a broadcast scalar. Driver state: none.
    *
    * Determinism: same contract as [[bigramNll]] — each occurrence's
    * log-ratio is rounded to 6 dp and summed as DECIMAL(18,6), so the
    * per-document total is partition-order independent and the exact sum
    * (not the mean) is surfaced.
    *
    * Returns (doc_id, n_bigrams, log_weight, is_target) for documents
    * with >= 1 bigram.
    */
  def dsirWeights(docs: DataFrame, targetLabel: Column): DataFrame = {
    val base = docs.select(col("doc_id"), tokens(col("text")).as("ws"),
      when(targetLabel, 1L).otherwise(0L).as("tgt"))
    val bi = base
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), col("tgt"),
        explode(arrays_zip(
          slice(col("ws"), lit(1), size(col("ws")) - 1),
          slice(col("ws"), lit(2), size(col("ws")) - 1))).as("b"))
      .select(col("doc_id"), col("tgt"), col("b.0").as("w1"), col("b.1").as("w2"))
    // collapse to per-doc bigram COUNTS first: the corpus-sized explode
    // then feeds exactly ONE shuffle, and the two consumers below (model
    // stats, scoring join) both hash the SAME aggregated table by
    // (w1, w2) — identical exchanges, so Spark's ReuseExchange runs the
    // explode once. Scoring multiplies the per-distinct-bigram rounded
    // log-ratio by the count, which equals summing it per occurrence
    // EXACTLY (decimal × integer), so the output is unchanged.
    val bc = bi.groupBy(col("doc_id"), col("tgt"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = bc.groupBy(col("w1"), col("w2"))
      .agg(sum(col("cnt")).as("c_raw"), sum(col("tgt") * col("cnt")).as("c_tgt"))
    // both totals and the shared vocabulary in one pass over `stats`
    val tot = stats.agg(sum(col("c_raw")).as("n_raw"),
      sum(col("c_tgt")).as("n_tgt"), count(lit(1)).as("vocab"))
    val scored = bc
      .join(stats, Seq("w1", "w2"))
      .crossJoin(broadcast(tot))
      .withColumn("lw", round(
        log((col("c_tgt") + lit(1.0)) / (col("n_tgt") + col("vocab")).cast("double")) -
          log((col("c_raw") + lit(1.0)) / (col("n_raw") + col("vocab")).cast("double")), 6)
        .cast(DecimalType(18, 6)))
    scored.groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_bigrams"),
        sum(col("lw") * col("cnt")).cast("double").as("log_weight"),
        max(col("tgt")).cast("int").as("is_target"))
  }

  /** Per-source unigram distribution DRIFT: KL(p_source ‖ p_corpus) with
    * add-one smoothing over the corpus vocabulary — the "did this slice's
    * language shift away from the mixture" check run per crawl snapshot /
    * per domain before a source's weight changes in the training mix.
    *
    * Shape at 100 TB: one (source, token) count aggregation over the
    * exploded corpus is the only corpus-sized pass; everything downstream
    * runs on the vocabulary-sized table. The per-source grid is vocab ×
    * |sources| (a broadcast explode of the tiny source-totals table, NOT
    * a shuffle), because KL needs a term for every vocab word the source
    * never uses — the smoothed zero-count terms.
    *
    * Determinism: per-(source, term) contribution p·ln(p/q) is a fixed
    * IEEE expression rounded to 9 dp and summed as DECIMAL(20,9)
    * (order-independent — the [[dsirWeights]] contract), surfaced as
    * DOUBLE. Returns (source, n_terms, kl), kl ≥ 0 up to rounding. */
  def unigramKl(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("source"), explode(tokens(col("text"))).as("tok"))
    val cnt = toks.groupBy(col("source"), col("tok")).agg(count(lit(1)).as("n"))
    val vocab = cnt.groupBy(col("tok")).agg(sum(col("n")).as("n_all"))
    val tot = cnt.groupBy(col("source")).agg(sum(col("n")).as("tot_s"))
    // vocabulary size + corpus total in one pass over the vocab table
    val gl = vocab.agg(count(lit(1)).as("v"), sum(col("n_all")).as("tot_all"))
    val grid = vocab.crossJoin(broadcast(tot))
      .join(cnt, Seq("source", "tok"), "left")
      .crossJoin(broadcast(gl))
      .withColumn("nz", coalesce(col("n"), lit(0L)))
    val p = (col("nz") + lit(1)).cast("double") / (col("tot_s") + col("v"))
    val q = (col("n_all") + lit(1)).cast("double") / (col("tot_all") + col("v"))
    grid
      .withColumn("term_kl", round(p * log(p / q), 9).cast(DecimalType(20, 9)))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("term_kl")).cast("double").as("kl"))
  }

  /** Kneser–Ney-smoothed bigram NLL (Kneser & Ney 1995; Chen & Goodman
    * 1999's fixed-discount "interpolated KN") — the stronger perplexity
    * signal for quality filtering: the backoff weight of a context is
    * its CONTINUATION diversity, not its raw frequency, so formulaic
    * boilerplate ("click here to …") scores as unsurprising while
    * genuinely novel text does not.
    *
    * All four model statistics come from the ONE global bigram count
    * table (itself one explode + one grouped agg over the corpus):
    * context totals and right-diversity are a groupBy(w1), left-
    * diversity a groupBy(w2), the bigram-type total one count — every
    * leg map-side combinable, none touching the corpus again. Scoring
    * re-joins them onto the per-doc bigram counts keyed by word.
    *
    * Determinism: the probability is one fixed chain of IEEE ops on
    * exact longs (casts written out so the SQL twin can mirror them
    * token-for-token — bare `0.75 * bigint` would go DECIMAL in
    * DuckDB); each occurrence's -ln p is rounded to 6 dp and summed as
    * DECIMAL(18,6), so per-doc totals are partition-order independent.
    *
    * Returns (doc_id, n_bigrams, kn_nll) for docs with >= 1 bigram.
    * Only corpus-attested bigrams are scored (c12 >= 1 > d), so the
    * max(c-d, 0) clamp never binds. */
  def knNll(docs: DataFrame, discount: Double = 0.75): DataFrame = {
    val d = lit(discount)
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("ws"))
    val bi = toks
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"),
        explode(arrays_zip(
          slice(col("ws"), lit(1), size(col("ws")) - 1),
          slice(col("ws"), lit(2), size(col("ws")) - 1))).as("b"))
      .select(col("doc_id"), col("b.0").as("w1"), col("b.1").as("w2"))
    val bc = bi.groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // big feeds FOUR consumers (ctx, bwd, btot, the scoring join) and
    // bc two (big + the join): pinned, or each consumer replays the
    // corpus explode + both aggregations upstream (ReuseExchange only
    // dedups identical exchanges, not the post-shuffle aggregation
    // work). Vocabulary-sized and per-doc-count-sized respectively;
    // caches are the caller's to sweep, as with bm25TopK's index.
    val big = bc.groupBy(col("w1"), col("w2")).agg(sum(col("cnt")).as("c12"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // context frequency + right continuation diversity in one pass
    val ctx = big.groupBy(col("w1"))
      .agg(sum(col("c12")).as("ctx"), count(lit(1)).as("fol"))
    val bwd = big.groupBy(col("w2")).agg(count(lit(1)).as("bwd"))
    val btot = big.agg(count(lit(1)).as("btot"))
    val p = (col("c12").cast("double") - d) / col("ctx") +
      d * col("fol") / col("ctx") * (col("bwd").cast("double") / col("btot"))
    bc.join(big, Seq("w1", "w2"))
      .join(ctx, Seq("w1"))
      .join(bwd, Seq("w2"))
      .crossJoin(broadcast(btot))
      .withColumn("nll", round(-log(p), 6).cast(DecimalType(18, 6)))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_bigrams"),
        sum(col("nll") * col("cnt")).cast("double").as("kn_nll"))
  }

  /** Population-stability-index drift between two epochs of a binned
    * score distribution — the standard "did my curation gate / corpus
    * mix shift" monitor: psi = Σ_bins (p - q)·ln(p/q) with add-one
    * smoothing over the union bin grid (so a bin present in only one
    * epoch contributes a finite term instead of ln 0).
    *
    * Shape at 100 TB: ONE grouped aggregation over (epoch, bin) — the
    * corpus collapses to at most 2×|bins| rows before anything joins;
    * the per-epoch totals and the psi reduction run on that tiny grid.
    * Each term is rounded to 9 dp and summed as DECIMAL(20,9) —
    * partition-order independent, like every float that reaches an
    * oracle hash here.
    *
    * `epoch` must be a 0/1 column; `bin` an integral bin id. Returns
    * one row (n_bins, n_a, n_b, psi). */
  def psiDrift(rows: DataFrame, epoch: Column, bin: Column): DataFrame = {
    val cnt = rows.select(epoch.as("e"), bin.as("bin"))
      .groupBy(col("bin"))
      .agg(sum(when(col("e") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("e") === 1, 1L).otherwise(0L)).as("nb"))
    // grand totals via an unpartitioned window OVER THE GRID (bounded
    // by bin cardinality, never the corpus — the grid-window contract
    // of exactMedian above), not a separate broadcast aggregate: the
    // crossJoin(broadcast(tot)) shape recomputed the grid aggregation
    // once for the broadcast build and once for the main chain — two
    // corpus scans and an extra job (census: 2 jobs/6 stages -> 1/4)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).rowsBetween(Long.MinValue, Long.MaxValue)
    val p = (col("na") + lit(1)).cast("double") / (col("ta") + col("nbins"))
    val q = (col("nb") + lit(1)).cast("double") / (col("tb") + col("nbins"))
    cnt
      .withColumn("ta", sum(col("na")).over(w))
      .withColumn("tb", sum(col("nb")).over(w))
      .withColumn("nbins", count(lit(1)).over(w))
      .withColumn("term",
        round((p - q) * log(p / q), 9).cast(DecimalType(20, 9)))
      .agg(max(col("nbins")).as("n_bins"),
        max(col("ta")).as("n_a"), max(col("tb")).as("n_b"),
        sum(col("term")).cast("double").as("psi"))
  }

  /** Robust (median/MAD) outlier gate over an integral per-document
    * score — the quality filter that survives heavy-tailed score
    * distributions where mean/σ gates move with the outliers they're
    * supposed to catch: flag docs with |score − median| > k·MAD
    * (k = 4.4478 ≈ 3σ under normality via the 1.4826 consistency
    * constant).
    *
    * EXACT median WITHOUT a global sort: the corpus collapses to its
    * DISTINCT score grid (one map-side-combinable agg), the grid gets a
    * cumulative count (a window over the grid — bounded by score
    * cardinality, not the corpus), and the median is the unique grid row
    * whose cumulative range covers index (n−1) div 2 — the same
    * lower-median order statistic DuckDB's quantile_disc(0.5) selects.
    * The MAD repeats the trick on |score − median| (grid no larger than
    * the first). Total: two grid aggregations + two one-row broadcasts;
    * nothing corpus-sized ever sorts or shuffles beyond the grid
    * collapse.
    *
    * Integral scores keep every deviation exact; the only float is the
    * final k·MAD threshold (one IEEE multiply, mirrored in SQL).
    *
    * Returns (doc_id, score, med, mad, is_outlier). */
  /** EXACT lower median of an integral column WITHOUT a global sort:
    * grid-CDF order-statistic selection — collapse to the distinct value
    * grid (one map-side-combinable agg), cumulative count over the grid
    * (window bounded by value cardinality, not row count), pick the grid
    * row covering index (n−1) div 2. Same order statistic as DuckDB's
    * quantile_disc(0.5). Returns a 1-row frame (`_med`).
    *
    * CARDINALITY CONTRACT: the unpartitioned cumulative window is safe
    * ONLY because it runs over the distinct-value GRID, not the corpus —
    * integral quality scores (char counts, ratios quantized to 1e4, …)
    * have grids of at most a few million values no matter how many
    * documents feed them. A near-continuous score (e.g. a raw double
    * scaled by 1e9 before the cast) would silently turn this into a
    * corpus-sized single-partition sort, so the grid size is CHECKED at
    * runtime: if it exceeds `maxGridCardinality` (default 2^22 ≈ 4.2M —
    * ~64 MB of (value, count) pairs on one task, comfortably in-memory)
    * the query fails with a clear message instead of degrading. The
    * check rides the existing 1-row total aggregate — zero extra jobs. */
  private[graft] def lowerMedian(vals: DataFrame,
      maxGridCardinality: Long = 1L << 22): DataFrame =
    lowerMedianOfGrid(
      vals.groupBy(col("_s")).agg(count(lit(1)).as("_c")),
      maxGridCardinality).select(col("_med"))

  /** [[lowerMedian]] over an ALREADY-BUILT (`_s`, `_c`) value grid —
    * callers that can derive a second order statistic from the same
    * grid (madOutliers' deviation grid, events_convert_median's
    * n_users total) call this directly so the corpus collapses to the
    * grid exactly once and ReuseExchange shares the one grid shuffle
    * across every consumer. Returns ONE row (`_med`, `_n` = total
    * weight) so a count rides along with the median for free. */
  private[graft] def lowerMedianOfGrid(grid: DataFrame,
      maxGridCardinality: Long = 1L << 22): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // single-partition cumulative window over the grid — safe by
    // construction because the grid cardinality is guarded below.
    // The total weight `_n` rides a FULL-FRAME window over the same
    // grid instead of a crossJoin(broadcast(agg)) — the medianMadOfGrid
    // fusion applied here too: one subplan, no broadcast-build job, and
    // no second evaluation of the grid for the 1-row total (measured
    // -1 job on events_convert_median).
    val w = Window.orderBy(col("_s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("_s"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // the guard is fused into `_n` (which `idx` consumes, and of which
    // exactly one row survives the median filter) so column pruning
    // can never drop it
    val cum = grid
      .withColumn("_below", coalesce(sum(col("_c")).over(w), lit(0L)))
      .withColumn("_n",
        when(count(lit(1)).over(wAll) > maxGridCardinality,
          raise_error(concat(
            lit("lowerMedian: score grid cardinality "),
            count(lit(1)).over(wAll).cast("string"),
            lit(s" exceeds $maxGridCardinality — quantize the score to a" +
              " bounded integral grid before calling madOutliers"))))
        .otherwise(sum(col("_c")).over(wAll)))
    // target index (n-1) div 2; floor keeps it integral after the
    // double division (exact below 2^53)
    val idx = floor((col("_n") - 1) / 2)
    cum.filter(col("_below") <= idx && idx < col("_below") + col("_c"))
      .select(col("_s").as("_med"), col("_n"))
  }

  /** Both weighted lower medians — the score median and the MAD — from
    * ONE single-partition pass over a bounded (`_s`, `_c`) value grid,
    * returned as a 1-row (`_med`, `_mad`) frame. The fusion that makes
    * this one subplan (and so ONE broadcast-build job, versus the four
    * jobs of chaining two lowerMedianOfGrid calls through intermediate
    * broadcasts):
    *   1. cumulative counts in `_s` order select the median row; the
    *      full-frame max(when(isMed, _s)) window turns it into a scalar
    *      column every grid row can read — no driver round-trip;
    *   2. the deviation distribution |s − med| needs NO regroup before
    *      its median: rows sharing a deviation value sit adjacent once
    *      sorted by (d, _s), their cumulative intervals are disjoint,
    *      and index (n−1) div 2 falls in exactly one of them — merging
    *      equal-d rows would only concatenate adjacent intervals of the
    *      same value, selecting the same d.
    * Same cardinality contract as [[lowerMedianOfGrid]] (the guard
    * rides `_n`, which the median index consumes, so pruning can't drop
    * it); all windows run on the repartition(1)'d GRID, never the
    * corpus. */
  private[graft] def medianMadOfGrid(grid: DataFrame,
      maxGridCardinality: Long = 1L << 22): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wCum = Window.orderBy(col("_s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("_s"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val guarded = grid.repartition(1)
      .withColumn("_n",
        when(count(lit(1)).over(wAll) > maxGridCardinality,
          raise_error(concat(
            lit("lowerMedian: score grid cardinality "),
            count(lit(1)).over(wAll).cast("string"),
            lit(s" exceeds $maxGridCardinality — quantize the score to a" +
              " bounded integral grid before calling madOutliers"))))
          .otherwise(sum(col("_c")).over(wAll)))
      .withColumn("_below", coalesce(sum(col("_c")).over(wCum), lit(0L)))
      .withColumn("_idx", floor((col("_n") - 1) / 2))
    val withMed = guarded.withColumn("_med",
      max(when(col("_below") <= col("_idx") &&
        col("_idx") < col("_below") + col("_c"), col("_s"))).over(wAll))
    val d = withMed.withColumn("_d", abs(col("_s") - col("_med")))
    val wdCum = Window.orderBy(col("_d"), col("_s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wdAll = Window.orderBy(col("_d"), col("_s"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    d.withColumn("_dbelow", coalesce(sum(col("_c")).over(wdCum), lit(0L)))
      .withColumn("_mad",
        max(when(col("_dbelow") <= col("_idx") &&
          col("_idx") < col("_dbelow") + col("_c"), col("_d"))).over(wdAll))
      .groupBy().agg(max(col("_med")).as("_med"), max(col("_mad")).as("_mad"))
      .filter(col("_med").isNotNull) // empty grid -> empty frame, not one null row
  }

  def madOutliers(rows: DataFrame, score: Column,
      k: Double = 4.4478): DataFrame = {
    val s = rows.withColumn("_s", score.cast("long"))
    // ONE corpus collapse into the value grid, ONE fused grid pass for
    // both order statistics ([[medianMadOfGrid]]), ONE broadcast of the
    // single (med, mad) row back onto the corpus: 2 jobs total
    // (broadcast build + output) — the chained-broadcast form spent 5.
    // The corpus is read exactly twice: once into the grid, once for
    // the output rows.
    val grid = s.select(col("_s")).groupBy(col("_s")).agg(count(lit(1)).as("_c"))
    val mm = medianMadOfGrid(grid)
    s.crossJoin(broadcast(mm))
      .select(col("doc_id"), col("_s").as("score"),
        col("_med").as("med"), col("_mad").as("mad"),
        (abs(col("_s") - col("_med")) >
          lit(k) * col("_mad").cast("double")).as("is_outlier"))
  }

  /** PMI collocation mining: adjacent word pairs scored by pointwise
    * mutual information against the corpus unigram model — the classic
    * association readout for multi-word expressions ("new york"-style
    * units a tokenizer or phrase table should keep together).
    *
    * Shape at 100 TB: bigram and unigram counts are two grouped
    * aggregations over the exploded corpus (both map-side combinable);
    * scoring joins the unigram table onto the bigram table KEYED BY WORD
    * twice (AQE broadcasts when the vocabulary is small; at a
    * 10⁸-term vocabulary both legs become ordinary shuffled equi-joins —
    * never a cross product). Corpus totals ride along as one broadcast
    * scalar row. `minCount` is the df-valve: hapax bigrams carry no
    * statistical signal and would dominate the output (PMI's known
    * low-frequency bias), so they're cut before the join.
    *
    * Determinism: PMI = ln of a quotient of IEEE divisions of exact
    * longs, computed in one fixed expression order and rounded to 6 dp —
    * identical bits in any engine, at any parallelism; (pmi DESC, w1,
    * w2) is a total order so the top-k slice is stable.
    *
    * Returns the top `k` (w1, w2, n, pmi) pairs with n >= minCount. */
  def pmiBigrams(docs: DataFrame, minCount: Long = 5L, k: Int = 50): DataFrame = {
    val toks = docs.select(tokens(col("text")).as("ws"))
    val bi = toks.filter(size(col("ws")) >= 2)
      .select(explode(arrays_zip(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1))).as("b"))
      .select(col("b.0").as("w1"), col("b.1").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n"))
    val uni = toks.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    // totals in one pass over each (already tiny) count table
    val tb = bi.agg(sum(col("n")).as("tot_b"))
    val tu = uni.agg(sum(col("c")).as("tot_u"))
    val u1 = uni.select(col("w").as("w1"), col("c").as("c1"))
    val u2 = uni.select(col("w").as("w2"), col("c").as("c2"))
    bi.filter(col("n") >= minCount)
      .join(u1, Seq("w1")).join(u2, Seq("w2"))
      .crossJoin(broadcast(tb)).crossJoin(broadcast(tu))
      // p(ab) / (p(a)·p(b)) as a fixed chain of IEEE divisions of exact
      // longs — the SQL twin mirrors this op-for-op
      .withColumn("pmi", round(log(
        (col("n").cast("double") / col("tot_b")) /
          ((col("c1").cast("double") / col("tot_u")) *
            (col("c2").cast("double") / col("tot_u")))), 6))
      .select(col("w1"), col("w2"), col("n"), col("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): per
    * LANGUAGE, documents split into head / middle / tail terciles of
    * their bigram-LM mean NLL — the standard "keep head+middle, drop
    * tail" curation signal, language-normalized so high-resource
    * languages don't swamp the threshold.
    *
    * Shape at 100 TB: the per-document score comes from [[bigramNll]]
    * (one corpus explode, decimal-exact sums); the tercile position is
    * computed like [[calibrateBySource]] — a cumulative count over the
    * DISTINCT (lang, score) grid (bounded by the score grid, not the
    * corpus) joined back, never a per-language window over all
    * documents. Ranks follow percent_rank semantics (ties share the
    * count of rows strictly below), so the SQL twin is a plain
    * percent_rank window.
    *
    * Returns (doc_id, lang, n_bigrams, ppl_score, pctl, bucket) for
    * documents with at least one bigram. */
  def ccnetBuckets(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // pinned: scored feeds the grid CDF, the per-language totals AND the
    // final join — unpinned, each consumer replays the full bigramNll
    // corpus explode (ReuseExchange only dedups the final exchange, not
    // the three differently-keyed consumers' upstream). Cache is the
    // caller's to sweep, as with bm25TopK's index.
    val scored = bigramNll(docs.select(col("doc_id"), col("text")))
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .withColumn("ppl_score",
        round(col("sum_nll") / col("n_bigrams"), 6))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dist = scored.groupBy(col("lang"), col("ppl_score"))
      .agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(col("lang")).orderBy(col("ppl_score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cdf = dist
      .withColumn("_below", coalesce(sum(col("_c")).over(w), lit(0L)))
      .select(col("lang"), col("ppl_score"), col("_below"))
    // per-language totals from the GRID, not a third corpus consumer:
    // sum of grid counts == row count per lang, the shuffle is
    // grid-sized instead of corpus-sized, and the dist subtree is
    // shared with cdf via ReuseExchange
    val nLang = dist.groupBy(col("lang")).agg(sum(col("_c")).as("_n"))
    scored.join(cdf, Seq("lang", "ppl_score"))
      .join(nLang, Seq("lang"))
      .withColumn("pctl", when(col("_n") === 1, lit(0.0))
        .otherwise(col("_below").cast("double") / (col("_n") - 1)))
      // tercile edges compared as pctl*3 vs integer literals — the same
      // single IEEE multiply in both engines (a `pctl < 1.0/3` literal
      // would be decimal division in DuckDB and bits could differ)
      .withColumn("bucket",
        when(col("pctl") * 3 < 1, "head")
          .when(col("pctl") * 3 < 2, "middle")
          .otherwise("tail"))
      .select(col("doc_id"), col("lang"), col("n_bigrams"),
        col("ppl_score"), col("pctl"), col("bucket"))
  }

  /** One-pass per-document stats table over a (doc_id, text) frame.
    * The token array and every token-derived count are computed exactly
    * once per row (bound into the `_ts` struct); only the single-use
    * regex signals stay in the final projection. */
  def textStats(df: DataFrame): DataFrame = {
    val txt = col("text")
    val ts = withTokens(txt)(toks => struct(
      size(toks).as("n_tokens"),
      hitsIn(toks, defaultStopwords).as("stop_hits"),
      hitsIn(toks, enMarkers).as("en"),
      hitsIn(toks, esMarkers).as("es"),
      hitsIn(toks, deMarkers).as("de")))
    df.select(col("doc_id"), col("text"), ts.as("_ts"))
      .select(
        col("doc_id"),
        col("_ts.n_tokens").as("n_tokens"),
        subtokenCount(txt).as("n_subtokens"),
        length(txt).as("n_chars_m"),
        punctRatio(txt).as("punct_ratio"),
        (col("_ts.stop_hits").cast("double") / col("_ts.n_tokens"))
          .as("stop_ratio"),
        langDecision(col("_ts")).as("lang_guess"),
        fingerprint(txt).as("fingerprint"))
  }

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1): per
    * document, the fraction of tokens accounted for by the single most
    * frequent token and the fraction of n-gram occurrences that are
    * repeats (1 − distinct/total). High values flag boilerplate and
    * degenerate ("lorem lorem lorem") text that length/stopword gates
    * miss.
    *
    * Shape at 100 TB: one explode per n, each aggregated BY doc_id — the
    * per-(doc, gram) counts combine map-side and every shuffle is keyed
    * by doc_id, so a document's state never exceeds its own vocabulary
    * and no global table is built (contrast a corpus-level vocab join).
    * Ratios are single IEEE divisions of exact longs — deterministic on
    * any engine, no rounding step needed (same discipline as
    * [[textStats]]'s stop_ratio).
    *
    * Returns (doc_id, n_tokens, top_token_frac, dup_bigram_frac,
    * dup_trigram_frac); documents shorter than n tokens get 0.0 for that
    * n-gram fraction (no occurrences → nothing repeated). */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("w"))
    val top = toks.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_c"), sum(col("c")).as("n_tokens"))
    def dupFrac(n: Int, out: String): DataFrame =
      docs.select(col("doc_id"),
          explode(Dedup.shingles(col("text"), n)).as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg((lit(1.0) - count(lit(1)).cast("double") / sum(col("c")))
          .as(out))
    top
      .join(dupFrac(2, "dup_bigram_frac"), Seq("doc_id"), "left")
      .join(dupFrac(3, "dup_trigram_frac"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("top_c").cast("double") / col("n_tokens")).as("top_token_frac"),
        coalesce(col("dup_bigram_frac"), lit(0.0)).as("dup_bigram_frac"),
        coalesce(col("dup_trigram_frac"), lit(0.0)).as("dup_trigram_frac"))
  }
}
