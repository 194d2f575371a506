package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for LLM training-data pipelines, each designed
  * for the 100 TB shape of the problem:
  *
  *  - exact: single hash-shuffle on a 128-bit content hash.
  *  - n-gram Jaccard: group-by-shingle posting lists — candidate pairs
  *    only ever materialize for documents sharing a shingle, never the
  *    O(n²) cross product.
  *  - MinHash + LSH: constant-size signature per doc computed AT SCAN
  *    (zero shuffle), banding posting lists so only same-bucket docs
  *    pair up; tune bands/rows for the target similarity threshold.
  *  - SimHash: 32-bit signature; candidate pairs via 8-bit chunk blocking
  *    (pigeonhole: hamming ≤ 3 ⇒ some chunk of 4 is equal).
  *
  * Hashing is the "portable hash" — the first 8 hex digits of md5 parsed
  * as an integer — chosen because BOTH Spark and DuckDB compute it with
  * identical results, making every operator here oracle-checkable. At
  * production scale swap [[portableHash32]] for `xxhash64` (one line;
  * faster, same distribution properties).
  *
  * Plan shape: every pair detector is a LINEAR pipeline — scan →
  * posting-list aggregation → in-list pair emission → pair aggregation —
  * with no self-join, no persist, and no plan branch that reads the same
  * intermediate twice. The earlier self-join formulation needed the
  * shingle index three times (sizes, join-left, join-right); AQE
  * materializes those branches concurrently, so the cache missed and the
  * explode ran 3× (measured: apply-pairs 8s → 3s from this rewrite).
  * Posting lists are also the shape that survives 100 TB: one shuffle
  * keyed by shingle, pairs emitted from each posting locally, partial
  * aggregation map-side.
  */
object Dedup {

  /** Deterministic 32-bit hash shared bit-for-bit with the DuckDB oracle:
    * Spark `conv(substr(md5(x),1,8),16,10)` == DuckDB `('0x'||substr(md5(x),1,8))::BIGINT`. */
  def portableHash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Word-level n-gram shingles (default 3) of whitespace-tokenized text.
    *
    * The tokenization is BOUND ONCE per row by wrapping it in a
    * single-element `transform` lambda: referencing `split(...)` directly
    * inside the inner lambda would re-run the regex split for every
    * `element_at` — O(tokens²) regex work per document (measured 8s vs
    * <1s on 5400 docs at sf0.1). */
  def shingles(text: Column, n: Int = 3): Column = {
    val bound = transform(
      array(split(trim(text), "\\s+")),
      toks =>
        // guard: size < n would make sequence(0, negative) count DOWN and
        // index out of bounds (ANSI error) — short docs get no shingles,
        // matching the oracle's range(1, len-1) which is empty there
        when(size(toks) >= n,
          transform(
            sequence(lit(0), size(toks) - n),
            i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*)))
          .otherwise(array().cast("array<string>")))
    element_at(bound, 1)
  }

  /** Exact dedup: group by full content hash. Returns one row per
    * duplicate GROUP (h, keep_id = min doc_id, n). */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** APPLY exact dedup: the corpus with one survivor (min doc_id) per
    * content-hash group. Hash-keyed MIN aggregation + semi-join, not a
    * row_number window: the 128-bit key distributes well across DISTINCT
    * contents, but real crawls concentrate millions of rows on single
    * contents (empty pages, error pages) — the min agg reduces those
    * map-side, where a window would sort the whole group on one task. */
  def dedupExact(docs: DataFrame): DataFrame = {
    // min_by over the whole row: ONE skew-immune shuffle AND exactly one
    // output row per content hash even when the input carries repeated
    // (doc_id, text) rows (re-ingested shards) — a semi-join against the
    // winning ids would return every copy of the winner
    val cols = docs.columns
    docs.groupBy(md5(col("text")).as("_h"))
      .agg(min_by(struct(cols.map(col): _*), col("doc_id")).as("_r"))
      .select(col("_r.*"))
  }

  /** INCREMENTAL dedup: dedupe a new `batch` of (doc_id, text) against an
    * existing `base` corpus using only the base's content FINGERPRINTS
    * ([[TextOps.fingerprint]] — whitespace/punctuation-robust), then
    * keep-min within the batch. Returns the surviving batch doc_ids.
    *
    * The shape a daily ingest needs at 100 TB: the base side reduces to
    * one distinct 128-bit fingerprint per historical doc (an index you'd
    * persist between runs, never rescanning base text), the anti-join
    * shuffles fingerprints only, and within-batch dedup is one grouped
    * min over the (much smaller) new batch. */
  def incrementalDedup(base: DataFrame, batch: DataFrame): DataFrame = {
    val baseFp = base.select(TextOps.fingerprint(col("text")).as("fp")).distinct()
    batch.select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .join(baseFp, Seq("fp"), "left_anti")
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
  }

  /** APPLY near-dedup from a pair set (i keeps, j drops): remove every
    * doc that appears as the `j` of a pair — a left-anti join against the
    * (deduplicated) drop-side ids. Pairs from any detector
    * ([[ngramJaccardPairs]], [[minhashLshPairs]], [[simhashPairs]]). */
  def applyPairDedup(docs: DataFrame, pairs: DataFrame): DataFrame =
    docs.join(pairs.select(col("j").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")

  /** Benchmark decontamination: drop every corpus document sharing at
    * least one word n-gram with any document of `benchmark` (the eval
    * sets that must not leak into training data).
    *
    * Plan shape for 100 TB: the benchmark shingle set is tiny (eval sets
    * are thousands of docs) and broadcast, so the corpus is one scan —
    * shingle-explode → broadcast LEFT SEMI to find contaminated ids →
    * left-anti against the corpus, with no shuffle of the corpus at all.
    * `broadcastBenchmark` is a HARD hint (Spark honors it regardless of
    * size); pass false for an unusually large eval suite and the same
    * plan becomes a shuffled semi join on the shingle key. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, n: Int = 8,
      broadcastBenchmark: Boolean = true): DataFrame =
    corpus.join(contaminatedIds(corpus, benchmark, n, broadcastBenchmark),
      Seq("doc_id"), "left_anti")

  /** The doc ids [[decontaminate]] removes — sharing at least one word
    * n-gram with the benchmark — exposed for audit surfaces that need
    * the FLAG rather than the filtered corpus. Same plan: benchmark
    * shingles broadcast, corpus ONE scan, semi join on the shingle. */
  def contaminatedIds(corpus: DataFrame, benchmark: DataFrame, n: Int = 8,
      broadcastBenchmark: Boolean = true): DataFrame = {
    // explode_outer + null filter: see ngramJaccardPairs — plain explode
    // would re-run the shingle expression twice per row in a scan filter
    val bench = benchmark
      .select(explode_outer(shingles(col("text"), n)).as("sh"))
      .filter(col("sh").isNotNull).distinct()
    val benchSide = if (broadcastBenchmark) broadcast(bench) else bench
    corpus
      .select(col("doc_id"), explode_outer(shingles(col("text"), n)).as("sh"))
      .filter(col("sh").isNotNull)
      .join(benchSide, Seq("sh"), "left_semi")
      .select(col("doc_id")).distinct()
  }

  /** [[decontaminate]] with a Bloom prefilter — same rows, different
    * 100 TB shape. The exact path broadcasts the benchmark shingle SET
    * (strings: hundreds of MB at 10⁷ shingles) and probes its hash table
    * with every corpus shingle. Here the driver builds a
    * [[graft.functions.BloomUtil]] filter over the benchmark shingles
    * (~10 bits/item — 12 MB where the string set is 500 MB) and the scan
    * stage drops ~(1−fpp) of corpus shingles via one codegen'd
    * [[graft.functions.BloomMightContain]] probe BEFORE any join
    * machinery runs. Only the surviving ~fpp sliver reaches the exact
    * confirm join, which removes the false positives — output is
    * row-identical to [[decontaminate]] (spec- and oracle-asserted).
    *
    * `broadcastConfirm = false` is the shape for an eval suite too big
    * to broadcast at all: the confirm join shuffles only the
    * bloom-surviving candidates, never the corpus — the prefilter is
    * what keeps that shuffle tiny. */
  def bloomDecontaminate(corpus: DataFrame, benchmark: DataFrame, n: Int = 8,
      fpp: Double = 0.01, broadcastConfirm: Boolean = true): DataFrame = {
    val bench = benchmark
      .select(explode_outer(shingles(col("text"), n)).as("sh"))
      .filter(col("sh").isNotNull).distinct()
    // bounded collect — eval suites are thousands of docs; the same rows
    // feed the filter build AND the confirm side so they cannot diverge
    val items = bench.collect().map(_.getString(0))
    val bloom = graft.functions.BloomUtil.build(items, items.length.toLong, fpp)
    val spark = corpus.sparkSession
    import spark.implicits._
    val confirm = items.toSeq.toDF("sh")
    val confirmSide = if (broadcastConfirm) broadcast(confirm) else confirm
    val contaminated = corpus
      .select(col("doc_id"), explode_outer(shingles(col("text"), n)).as("sh"))
      .filter(col("sh").isNotNull)
      .filter(bloom.mightContainCol(col("sh")))
      .join(confirmSide, Seq("sh"), "left_semi")
      .select(col("doc_id")).distinct()
    corpus.join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** Per-document contamination SCORE against a benchmark set: the
    * fraction of the document's distinct word n-grams that appear in any
    * benchmark document. [[decontaminate]]'s binary gate, graded — the
    * form used to set eval-leak thresholds instead of hard-dropping.
    *
    * Plan shape: benchmark shingle set broadcast (tiny), corpus scanned
    * once — shingle explode → broadcast LEFT join to mark hits → one
    * grouped count per doc. No corpus shuffle beyond the per-doc agg.
    * Returns (doc_id, n_shingles, n_shared, score) for docs with >= 1
    * shingle. */
  def contaminationScore(corpus: DataFrame, benchmark: DataFrame,
      n: Int = 8): DataFrame = {
    val bench = broadcast(benchmark
      .select(explode_outer(shingles(col("text"), n)).as("sh"))
      .filter(col("sh").isNotNull).distinct()
      .select(col("sh").as("bsh")))
    corpus
      .select(col("doc_id"),
        array_distinct(shingles(col("text"), n)).as("shs"))
      .select(col("doc_id"), size(col("shs")).as("sz"),
        explode_outer(col("shs")).as("sh"))
      .filter(col("sh").isNotNull)
      .join(bench, col("sh") === col("bsh"), "left")
      .groupBy(col("doc_id"), col("sz").as("n_shingles"))
      .agg(count(col("bsh")).as("n_shared"))
      .select(col("doc_id"), col("n_shingles"), col("n_shared"),
        round(col("n_shared").cast("double") / col("n_shingles"), 6).as("score"))
  }

  /** EXACT-substring contamination (Lee et al. 2022's exact check, next
    * to the n-gram gate above): which corpus documents contain any eval
    * snippet VERBATIM. Returns (doc_id, n_hits, hit_ids) for contaminated
    * docs; hit_ids is the sorted csv of matching eval ids.
    *
    * Plan shape for 100 TB: the snippet set broadcasts (eval suites are
    * tiny) and the corpus is ONE scan — no corpus shuffle before the
    * per-doc aggregation. Two interchangeable match kernels behind the
    * same API, switched on snippet count:
    *
    *  - below `automatonThreshold`: a broadcast nested-loop join whose
    *    `contains` predicate runs codegen'd in the scan stage — zero
    *    setup cost, O(|text| · snippets) per doc;
    *  - at/above it: one [[graft.functions.AhoCorasick]] automaton built
    *    on the driver and broadcast, one text pass per doc regardless of
    *    snippet count — the shape that survives 10⁵+ snippets, where
    *    per-pair `contains` work is quadratic pain.
    *
    * Both kernels produce identical rows (spec-asserted on a >10³-snippet
    * set), so the switch is a pure plan decision. */
  def substringContamination(corpus: DataFrame, snippets: DataFrame,
      automatonThreshold: Int = 1024): DataFrame = {
    // null/empty snippets are meaningless patterns and behave differently
    // per kernel (contains(NULL) filters the row; a null pattern would
    // NPE the automaton build) — normalize them away so the kernels stay
    // interchangeable on ANY input
    val cleaned = snippets
      .select(col("eval_id"), col("eval_text"))
      .filter(col("eval_text").isNotNull && length(col("eval_text")) > 0)
    // ONE bounded job decides the kernel: both branches need the snippet
    // rows anyway (broadcast join / driver automaton), so collect them
    // once instead of a count probe plus a second collect
    val snips = cleaned
      .select(col("eval_id").cast("string"), col("eval_text")).collect()
    if (snips.length < automatonThreshold) {
      corpus.select(col("doc_id"), col("text"))
        .crossJoin(broadcast(cleaned.select(col("eval_id"), col("eval_text"))))
        .filter(col("text").contains(col("eval_text")))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_hits"),
          concat_ws(",", array_sort(collect_list(col("eval_id").cast("string"))))
            .as("hit_ids"))
    } else {
      val ac = graft.functions.AhoCorasick.build(
        snips.map(_.getString(0)), snips.map(_.getString(1)))
      val bc = corpus.sparkSession.sparkContext.broadcast(ac)
      val matchIds = udf((text: String) => bc.value.matchedIds(text))
      corpus.select(col("doc_id"), explode(matchIds(col("text"))).as("eid"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_hits"),
          concat_ws(",", array_sort(collect_list(col("eid")))).as("hit_ids"))
    }
  }

  /** Per-EVAL-ITEM leak report — [[substringContamination]] transposed:
    * for each eval snippet, how many corpus docs contain it verbatim and
    * the hit id range. The view an eval OWNER reads ("which of my test
    * items leaked, how widely") where the doc-keyed form answers the
    * curator's "which docs do I drop". Same broadcast kernels and
    * threshold switch; zero-hit snippets are kept via a left join (a
    * leak report must show the clean rows too).
    * Returns (eval_id, n_docs, doc_min, doc_max). */
  def contaminationReport(corpus: DataFrame, snippets: DataFrame,
      automatonThreshold: Int = 1024): DataFrame = {
    val cleaned = snippets
      .select(col("eval_id"), col("eval_text"))
      .filter(col("eval_text").isNotNull && length(col("eval_text")) > 0)
    val snips = cleaned
      .select(col("eval_id").cast("string"), col("eval_text")).collect()
    val pairs = if (snips.length < automatonThreshold) {
      corpus.select(col("doc_id"), col("text"))
        .crossJoin(broadcast(cleaned))
        .filter(col("text").contains(col("eval_text")))
        .select(col("doc_id"), col("eval_id").cast("string").as("eid"))
    } else {
      val ac = graft.functions.AhoCorasick.build(
        snips.map(_.getString(0)), snips.map(_.getString(1)))
      val bc = corpus.sparkSession.sparkContext.broadcast(ac)
      val matchIds = udf((text: String) => bc.value.matchedIds(text))
      corpus.select(col("doc_id"), explode(matchIds(col("text"))).as("eid"))
    }
    val hits = pairs.groupBy(col("eid"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("doc_min"),
        max(col("doc_id")).as("doc_max"))
    cleaned.select(col("eval_id").cast("string").as("eid"))
      .join(hits, Seq("eid"), "left")
      .select(col("eid").as("eval_id"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        col("doc_min"), col("doc_max"))
  }

  /** MOSS-style near-dup candidate pairs via WINNOWING fingerprints
    * (Schleimer et al. 2003): docs sharing >= `minShared` winnow
    * fingerprints — the character-level complement of the word-shingle
    * detectors, robust to tokenization differences because the
    * fingerprints hash raw char 8-grams.
    *
    * Same linear posting-list pipeline as [[ngramJaccardPairs]] (scan →
    * fingerprint explode → posting agg → in-list pair emission → pair
    * count), and the same df-cap safety valve: `maxDocFreq` drops
    * fingerprints shared by too many docs (boilerplate substrings)
    * BEFORE pairing, which both bounds the pair blowup and is what makes
    * shared-count a near-dup signal rather than a common-phrase one.
    * Returns (i, j, n_shared), i < j. */
  def winnowPairs(docs: DataFrame, minShared: Int = 10,
      maxDocFreq: Int = 8): DataFrame = {
    val fps = docs.select(col("doc_id"),
      explode(graft.functions.Winnow.winnow(col("text"))).as("fp"))
    // df-cap BEFORE the posting buffer, not after: hot fingerprints
    // (df > maxDocFreq) are excluded by anti-join, and no collect_list
    // buffer can then exceed maxDocFreq members — the same two-phase
    // valve as Posting.bounded, result-identical to filtering the built
    // lists. The anti-join is deliberately UNHINTED: the hot set is
    // bounded only by |fps|/maxDocFreq (1/9 of distinct fingerprints at
    // the default cap on a heavily duplicated corpus), so a forced
    // broadcast would blow the driver at scale — Catalyst/AQE picks
    // broadcast when the measured hot set is actually small
    val hot = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDocFreq).select(col("fp"))
    val posting = fps.join(hot, Seq("fp"), "left_anti")
      .groupBy(col("fp"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) >= 2)
    posting
      .select(explode(orderedPairs(col("ds"))).as("p"))
      .groupBy(col("p.a").as("i"), col("p.b").as("j"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Source-level overlap matrix: Jaccard similarity between every pair
    * of sources over their distinct word-shingle sets — "how much does
    * source A repeat source B", the readout that drives mixture design
    * and cross-source dedup ordering (dedupe the smaller, lower-quality
    * source against the larger one, not vice versa).
    *
    * Shape at 100 TB: shingles collapse to (source, shingle) DISTINCT
    * pairs FIRST, so every posting list is bounded by the number of
    * sources (tens), never by document frequency — no df cap needed, no
    * fat buckets possible. Pair emission is in-task from each posting
    * (the same linear pipeline as every detector here), the per-source
    * set sizes are a tiny aggregate joined back at the end (broadcast at
    * any scale).
    *
    * Determinism: exact long counts; jaccard is a single IEEE division.
    *
    * Returns (src_a, src_b, n_shared, sz_a, sz_b, jaccard), a < b. */
  def sourceOverlap(docs: DataFrame, n: Int = 3): DataFrame = {
    val ss = docs
      .select(col("source"), explode(shingles(col("text"), n)).as("sh"))
      .distinct()
    val sizes = ss.groupBy(col("source")).agg(count(lit(1)).as("sz"))
    val posting = ss.groupBy(col("sh"))
      .agg(sort_array(collect_set(col("source"))).as("ss"))
      .filter(size(col("ss")) >= 2)
    posting
      .select(explode(orderedPairs(col("ss"))).as("p"))
      .groupBy(col("p.a").as("src_a"), col("p.b").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(sizes.select(col("source").as("src_a"), col("sz").as("sz_a")),
        Seq("src_a"))
      .join(sizes.select(col("source").as("src_b"), col("sz").as("sz_b")),
        Seq("src_b"))
      .withColumn("jaccard", col("n_shared").cast("double") /
        (col("sz_a") + col("sz_b") - col("n_shared")))
      .select(col("src_a"), col("src_b"), col("n_shared"),
        col("sz_a"), col("sz_b"), col("jaccard"))
  }

  /** Cross-document repeated text spans — the span-level view of exact
    * duplication (the "deduplicate repeated substrings, not whole
    * documents" discipline from the training-data dedup literature,
    * adapted from suffix arrays to the posting-list shape every detector
    * here uses): a word `n`-gram is DUPLICATED when it occurs in ≥ 2
    * distinct documents; per document, maximal runs of consecutive
    * duplicated n-gram positions merge into spans. Returns
    * (doc_id, start_tok, end_tok, n_dup_grams) — 1-based token
    * positions, end inclusive — the cut list a span-level deduper or a
    * contamination auditor consumes.
    *
    * Pipeline: positions ride the shingle explode (posexplode, so the
    * scan stays one pass); ONE shuffle builds per-gram posting lists
    * carrying (doc_id, pos); lists from ≥ 2 docs explode back to
    * duplicated positions; runs collapse via the pos−row_number trick
    * under a per-document window (bounded by document length, never
    * corpus size). `maxDocFreq` caps posting-list width before the
    * explode — the same fat-bucket valve as the pair detectors; capped
    * grams (boilerplate shared by everything) drop out of the span set,
    * which is the production behavior you want anyway. */
  /** (doc_id, pos, g): every word n-gram with its 1-based start token
    * position — the positional shingle stream [[repeatedSpans]] and
    * [[applySpanDedup]] share. */
  private def posGrams(docs: DataFrame, n: Int): DataFrame =
    docs
      .select(col("doc_id"), posexplode_outer(shingles(col("text"), n)))
      .filter(col("col").isNotNull)
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("g"))

  /** Gram-level qualification WITHOUT a posting buffer: the old
    * collect-then-explode shape materialized every gram's full
    * (doc_id, pos) list in one aggregation row before the nd/maxDocFreq
    * filter could see it — a boilerplate 5-gram shared by millions of
    * docs would OOM the buffer (the saxNeighbors hazard class). The
    * span operators only need per-gram AGGREGATES (distinct-doc count,
    * occurrence count, owner) plus the qualifying gram rows back — so
    * qualify on a two-level map-combinable aggregation (no list state
    * anywhere) and SEMI-JOIN the gram stream against the qualifying
    * grams. Costs one extra shuffle of the gram stream; bounds memory
    * at ANY duplication skew and ANY maxDocFreq setting. Returns
    * (g, cnt, nd, owner) for grams with nd ≥ 2 and cnt ≤ maxDocFreq. */
  private def spanQualGrams(grams: DataFrame, maxDocFreq: Int): DataFrame =
    grams.groupBy(col("g"), col("doc_id")).agg(count(lit(1)).as("_c"))
      .groupBy(col("g"))
      .agg(sum(col("_c")).as("cnt"), count(lit(1)).as("nd"),
        min(col("doc_id")).as("owner"))
      .filter(col("nd") >= 2 && col("cnt") <= maxDocFreq)

  def repeatedSpans(docs: DataFrame, n: Int = 5,
      maxDocFreq: Int = Int.MaxValue): DataFrame = {
    val grams = posGrams(docs, n)
    val dpos = grams
      .join(spanQualGrams(grams, maxDocFreq).select(col("g")), Seq("g"))
      .select(col("doc_id"), col("pos"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    dpos
      .withColumn("_grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("_grp"))
      .agg(min(col("pos")).as("start_tok"),
        (max(col("pos")) + lit(n - 1).cast("long")).as("end_tok"),
        count(lit(1)).as("n_dup_grams"))
      .select(col("doc_id"), col("start_tok"), col("end_tok"),
        col("n_dup_grams"))
  }

  /** APPLY span-level dedup: cut every duplicated n-gram span from every
    * document EXCEPT its owner (the min doc_id among documents containing
    * that gram — the owner keeps all of its own occurrences), then
    * reassemble the surviving tokens. This is the remove-all-but-one
    * substring-dedup policy, keyed per gram so overlapping spans resolve
    * token-by-token: a token is removed iff it is covered by at least one
    * duplicated gram occurrence whose owner is another document. Returns
    * (doc_id, n_tokens, n_removed, text_kept) for EVERY input document.
    *
    * Scale shape: gram qualification is BUFFERLESS ([[spanQualGrams]] —
    * map-combinable aggregates + a gram-keyed semi-join, no list state
    * at any skew), removal positions explode only from non-owner
    * occurrences of duplicated grams (bounded by the duplication volume,
    * not the corpus), and the final pass is a left join of the token
    * stream against the removal set on (doc_id, pos) — co-partitioned by
    * doc, no skew beyond document length. `maxDocFreq` is the same
    * boilerplate valve as [[repeatedSpans]]; capped grams are left
    * uncut. */
  def applySpanDedup(docs: DataFrame, n: Int = 5,
      maxDocFreq: Int = Int.MaxValue): DataFrame = {
    val grams = posGrams(docs, n)
    // same bufferless qualification as repeatedSpans (see spanQualGrams)
    val removals = grams
      .join(spanQualGrams(grams, maxDocFreq).select(col("g"), col("owner")),
        Seq("g"))
      .filter(col("doc_id") =!= col("owner"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("rpos"))
      .distinct()
    val toks = docs
      .select(col("doc_id"), posexplode_outer(split(trim(col("text")), "\\s+")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("tpos"),
        col("col").as("tok"))
    toks
      .join(removals,
        toks("doc_id") === removals("doc_id") && col("tpos") === col("rpos"),
        "left")
      .groupBy(toks("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("rpos").isNotNull, 1L).otherwise(0L)).as("n_removed"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("rpos").isNull,
            struct(col("tpos"), col("tok"))))),
          s => s.getField("tok"))).as("text_kept"))
  }

  /** All ordered pairs (a < b by list position) from a sorted posting
    * list of structs. Emitted IN the task holding the posting — the
    * standard MapReduce near-dup shape: pair blowup is local to each
    * shingle group and bounded by the df cap, never a join. The caller
    * must guarantee `size(lst) >= 2` (sequence() would count DOWN for an
    * empty upper bound). */
  private def orderedPairs(lst: Column): Column =
    flatten(transform(sequence(lit(1), size(lst) - 1), i =>
      transform(slice(lst, i + 1, size(lst) - i), e =>
        struct(element_at(lst, i).as("a"), e.as("b")))))

  /** n-gram Jaccard near-dup pairs above `threshold`.
    * Shuffle plan (linear, no self-join, no persist): shingle-set scan →
    * explode → posting-list agg keyed by shingle (1 shuffle) → local
    * pair emission → pair-count agg (1 shuffle). The per-doc distinct
    * shingle count rides along in each posting entry, so no separate
    * sizes branch and no join against it.
    *
    * `maxDocFreq` is the 100 TB safety valve: a shingle present in F
    * documents contributes F·(F-1)/2 candidate pairs, so one
    * boilerplate/stopword shingle shared by 10M docs would alone emit
    * 5·10^13 pair rows. Capping drops shingles with document frequency
    * > maxDocFreq BEFORE pairing (the standard df-filter every
    * production near-dup pipeline applies); jaccard is then computed
    * over the capped shingle universe consistently — both the
    * intersection counts and the per-doc sizes exclude capped shingles
    * (the sizes are recomputed from the hot-filtered shingle ARRAY at
    * scan), so the score stays a true Jaccard of the reduced sets. The
    * hot list is tiny by construction (≤ |index|/maxDocFreq entries) and
    * broadcast; the frequency count itself is a groupBy (map-side
    * partial agg), NOT a window over `sh` — a window would concentrate
    * each hot shingle's rows on one partition, exactly the skew being
    * defended against. Default Int.MaxValue = uncapped (the
    * oracle-checked semantics). */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.5,
      maxDocFreq: Int = Int.MaxValue): DataFrame =
    // explode_outer everywhere a shingle array unnests: plain explode
    // makes InferFiltersFromGenerate synthesize `size(shs) > 0` on the
    // generator input, and predicate pushdown substitutes the whole
    // shingle expression into a scan-stage filter — the expensive
    // higher-order function then runs 2 extra times per row INSIDE the
    // single-task scan (measured 1.2s/branch on sf0.1). The cheap
    // `sh IS NOT NULL` filter above the Generate is equivalent.
    ngramJaccardPairsOfShingles(
      docs.select(col("doc_id"),
        array_distinct(shingles(col("text"), n)).as("shs")),
      threshold, maxDocFreq)

  /** [[ngramJaccardPairs]] over a PRE-SHINGLED corpus: `shingled` is
    * (doc_id, shs) with shs the DISTINCT shingle array. The seam exists
    * so a query driving several detectors over one corpus (the
    * detector-agreement matrix) can pin the shingle computation once —
    * shingling is the dominant per-row CPU of both the Jaccard and the
    * MinHash detectors, and their shingle universes are identical
    * ([[minhashSigOfShingles]]: min over a multiset = min over its
    * set). */
  def ngramJaccardPairsOfShingles(shingled: DataFrame,
      threshold: Double = 0.5, maxDocFreq: Int = Int.MaxValue): DataFrame = {
    val base = shingled
    val capped = if (maxDocFreq == Int.MaxValue) base else {
      val hot = base.select(explode_outer(col("shs")).as("sh"))
        .filter(col("sh").isNotNull)
        .groupBy(col("sh")).agg(count(lit(1)).as("df"))
        .filter(col("df") > maxDocFreq)
        .agg(collect_list(col("sh")).as("hot"))
      base.crossJoin(broadcast(hot))
        .select(col("doc_id"),
          filter(col("shs"), s => !array_contains(col("hot"), s)).as("shs"))
    }
    val posting = capped
      .select(col("doc_id"), size(col("shs")).as("sz"),
        explode_outer(col("shs")).as("sh"))
      .filter(col("sh").isNotNull)
      .groupBy(col("sh"))
      .agg(array_sort(collect_list(struct(col("doc_id"), col("sz")))).as("ms"))
      .filter(size(col("ms")) >= 2)
      // pin the pair-emission width: the posting shuffle is tiny in BYTES,
      // so AQE's byte-based coalescing would run the compute-bound pair
      // explode on one task (measured 7s single-task on sf0.1)
      .transform(graft.Tables.fanout)
      // the shingle key is consumed — project it away so it doesn't ride
      // along every emitted pair row
      .select(col("ms"))
    // STREAMED pair emission (r15, guide §5): the previous
    // explode(orderedPairs(ms)) materialized the full C(|ms|, 2) struct
    // array as ONE value per posting row — the planted hot shingle's
    // posting (df grows with the corpus: 2000 docs at sf1, 6000 at sf3)
    // made that an ~80 MB/720 MB single allocation, an OOM at the next
    // decade. Posting.streamPairs yields one pair at a time, so peak
    // task memory is O(|ms|) per posting row; the emitted (a, b) stream
    // is the identical multiset (same sorted list, same i < j order), so
    // the intersection counts — and everything downstream — are unchanged.
    Posting.streamPairs(posting)
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        col("a.sz").as("si"), col("b.sz").as("sj"))
      .agg(count(lit(1)).as("c"))
      .withColumn("jaccard",
        col("c").cast("double") / (col("si") + col("sj") - col("c")))
      .filter(col("jaccard") >= threshold)
      .select(col("i"), col("j"), col("jaccard"))
  }

  /** Fixed MinHash permutation parameters (a, b) — mirrored verbatim in
    * the oracle SQL. sig_j = min over shingles of (a_j*h + b_j) mod P.
    * a_j < 2^20 keeps a_j*h < 2^52: no 64-bit overflow in either engine. */
  val MinhashP = 4294967311L // prime > 2^32
  val minhashParams: Seq[(Long, Long)] = Seq(
    (745207L, 2683L), (404089L, 21019L), (996163L, 48611L), (625469L, 90821L),
    (53087L, 11257L), (355069L, 2707L), (801955L, 84713L), (493127L, 30803L),
    (136897L, 4519L), (279847L, 73009L), (947431L, 12893L), (537527L, 59359L),
    (705667L, 31583L), (172933L, 92401L), (830587L, 70123L), (391939L, 66851L))

  /** Per-doc MinHash signature as a 16-element array column, computed
    * entirely AT SCAN from the shingle array — zero shuffle. The hash
    * array is bound once (outer `transform`); each component is an
    * `array_min` over the affine-permuted hashes. Documents with no
    * shingles (< n tokens) yield an all-null signature (array_min of
    * empty) — callers filter those out, matching the explode-based
    * formulation where such docs never produced index rows. */
  def minhashSigArray(text: Column, n: Int = 3): Column =
    minhashSigOfShingles(shingles(text, n))

  /** [[minhashSigArray]] over a pre-computed shingle array column.
    * Distinct and multiset shingle arrays give the SAME signature
    * (each component is an array_min — min over a multiset equals min
    * over its distinct set), so one `array_distinct`-shingled frame can
    * feed both this and the Jaccard detector. */
  def minhashSigOfShingles(shs: Column): Column =
    element_at(
      transform(
        array(transform(shs, sh => portableHash32(sh))),
        hs => array(minhashParams.map { case (a, b) =>
          array_min(transform(hs, h => (h * a + b) % MinhashP)) }: _*)),
      1)

  /** Per-doc MinHash signature columns s0..s{k-1} (compat view over
    * [[minhashSigArray]]). Constant output size per document, no shuffle. */
  def minhashSignatures(docs: DataFrame, n: Int = 3): DataFrame =
    docs.select(col("doc_id"), minhashSigArray(col("text"), n).as("sig"))
      .filter(element_at(col("sig"), 1).isNotNull)
      .select(col("doc_id") +:
        minhashParams.indices.map(j => element_at(col("sig"), j + 1).as(s"s$j")): _*)

  /** MinHash-LSH candidate pairs with estimated Jaccard ≥ `threshold`.
    * Banding: 4 bands × 4 rows over the 16-component signature; candidates
    * are pairs agreeing on ≥ 1 full band (standard S-curve selectivity).
    * est_jaccard = fraction of equal signature components.
    *
    * Plan: scan-side signatures → band explode (map-local) → posting
    * list per (band, bh) (1 shuffle) → local pair emission → distinct
    * (1 shuffle). Signatures ride along in the postings, so the estimate
    * needs no join back against a signature table. */
  /** md5 band hash of one 4-slot band of a 16-slot MinHash signature —
    * the ONE construction every banded consumer (intra-corpus pairs,
    * incremental batch-vs-base, streaming gate) must share, or their
    * spec-asserted equivalences silently break. */
  private[graft] def bandHash(sig: Column, bnd: Int): Column =
    md5(concat_ws("-",
      (0 until 4).map(r => element_at(sig, bnd * 4 + r + 1)): _*))

  def minhashLshPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.5,
      maxBucket: Int = 4096): DataFrame =
    minhashLshPairsOfShingles(
      docs.select(col("doc_id"), shingles(col("text"), n).as("shs")),
      threshold, maxBucket)

  /** [[minhashLshPairs]] over a PRE-SHINGLED corpus (doc_id, shs) —
    * distinct or multiset shingles, same signatures (see
    * [[minhashSigOfShingles]]). The detector-agreement seam. */
  def minhashLshPairsOfShingles(shingled: DataFrame, threshold: Double = 0.5,
      maxBucket: Int = 4096): DataFrame = {
    // No filter directly on `sig`: predicate pushdown would substitute
    // the whole signature expression into a scan-stage filter and
    // recompute it per row (see ngramJaccardPairs). Shingle-less docs get
    // a NULL band hash instead, filtered cheaply after the explode.
    val sigs = shingled
      .select(col("doc_id"), minhashSigOfShingles(col("shs")).as("sig"))
    val bandCols = (0 until 4).map { bnd =>
      struct(lit(bnd).as("band"),
        when(element_at(col("sig"), 1).isNotNull,
          bandHash(col("sig"), bnd)).as("bh"))
    }
    val rows = sigs.select(col("doc_id"), col("sig"),
        explode_outer(array(bandCols: _*)).as("b"))
      .filter(col("b.bh").isNotNull)
      .select(col("b.band").as("band"), col("b.bh").as("bh"),
        struct(col("doc_id"), col("sig")).as("m"))
    // `maxBucket` bounds every posting buffer via Posting.bounded's
    // two-phase split (never changes the pair set); ownership at
    // emission keeps split sub-postings from inflating the
    // pre-distinct candidate volume; streamPairs keeps the emission
    // itself O(|ms|·struct) per task (never the C(|ms|,2) pair array)
    Posting.streamPairs(
        Posting.bounded(rows, Seq("band", "bh"), "m", maxBucket)
          // pin the pair-emission width: the posting shuffle is tiny in
          // BYTES, so AQE's byte-based coalescing would run the
          // compute-bound pair explode on one task (measured 7s
          // single-task on sf0.1)
          .transform(graft.Tables.fanout))
      .filter(Posting.owns(col("a"), col("b")))
      // est_jaccard at EMISSION, threshold BEFORE ownership: the
      // CaseWhen band probes below then run only on qualifying pairs
      // (sub-threshold candidates are dropped by 16 cheap component
      // compares first — SkewProbe measured the sig-carrying distinct
      // as the dominant cost of a planted 2e4-identical-doc block).
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        (size(filter(zip_with(col("a.sig"), col("b.sig"), (x, y) => x === y),
          eq => eq)).cast("double") / 16.0).as("est_jaccard"),
        col("band"), col("a.sig").as("siga"), col("b.sig").as("sigb"))
      .filter(col("est_jaccard") >= threshold)
      // First-agreeing-band ownership (r15, guide §2.4 — distinct on
      // already-unique data): a pair collides once PER agreeing band
      // (≤ 4x for identical docs, the dominant kind in a near-dup
      // corpus); owning it to the LOWEST agreeing band makes emission
      // globally exactly-once, so the cross-band `.distinct()` — a
      // full shuffle + hash-agg of the qualifying pair set —
      // disappears. Agreement is the EXACT bucket predicate (md5
      // bandHash equality, same as the posting key), not component
      // equality, so ownership provably matches the bucketing even in
      // a hash-collision corner. CaseWhen short-circuits, so the
      // common identical-doc pair pays 2 md5s, worst case 6.
      .filter(col("band") === firstAgreeingBand(col("siga"), col("sigb")))
      .select(col("i"), col("j"), col("est_jaccard"))
  }

  /** Index of the FIRST band (0-3) whose md5 band hash agrees between
    * two 16-slot signatures — the global owner of a banded LSH pair.
    * Uses [[bandHash]] equality (the bucket predicate itself), so a
    * pair is owned by exactly one of the bands that bucketed it. */
  private def firstAgreeingBand(siga: Column, sigb: Column): Column = {
    def agrees(bnd: Int): Column = bandHash(siga, bnd) === bandHash(sigb, bnd)
    when(agrees(0), 0).when(agrees(1), 1).when(agrees(2), 2).otherwise(3)
  }

  /** Incremental MinHash-LSH dedup: which BATCH documents near-duplicate
    * any BASE document — the "dedup tonight's crawl against the standing
    * corpus" shape, where re-pairing the whole corpus ([[minhashLshPairs]])
    * would redo work that never changes. The base side reduces to its
    * (band, band-hash) posting index — in production that index is
    * precomputed once and reused per batch; here it derives inline from
    * `base`. One equi-join on the band key (hash-distributed, never a
    * cross product), candidate dedup, then the signature-agreement
    * estimate exactly as the intra-corpus detector computes it.
    * Returns (i = batch doc, j = base doc, est_jaccard ≥ threshold). */
  def minhashLshAgainst(base: DataFrame, batch: DataFrame, n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    def withBands(docs: DataFrame, idAs: String, sigAs: String) = {
      val bandCols = (0 until 4).map { bnd =>
        struct(lit(bnd).as("band"),
          when(element_at(col("sig"), 1).isNotNull,
            bandHash(col("sig"), bnd)).as("bh"))
      }
      docs.select(col("doc_id"), minhashSigArray(col("text"), n).as("sig"))
        .select(col("doc_id").as(idAs), col("sig").as(sigAs),
          explode_outer(array(bandCols: _*)).as("b"))
        .filter(col("b.bh").isNotNull)
        .select(col(idAs), col(sigAs), col("b.band").as("band"),
          col("b.bh").as("bh"))
    }
    withBands(batch, "i", "sigi")
      .join(withBands(base, "j", "sigj"), Seq("band", "bh"))
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sigi"), col("sigj"), (x, y) => x === y),
          eq => eq)).cast("double") / 16.0)
      .filter(col("est_jaccard") >= threshold)
      // first-agreeing-band ownership instead of the cross-band
      // `.distinct()` — same exactly-once argument as
      // [[minhashLshPairsOfShingles]]; threshold first so the md5
      // probes run only on qualifying pairs
      .filter(col("band") === firstAgreeingBand(col("sigi"), col("sigj")))
      .select(col("i"), col("j"), col("est_jaccard"))
  }

  /** Content-defined chunking of every document: cut positions from
    * [[graft.functions.CdcBoundaries]] (rolling-hash anchored, so edits
    * only reflow neighboring chunks), chunk text hashed for identity.
    * The whole chunk table derives AT SCAN with array functions — no
    * join, no shuffle before whatever aggregation the caller adds.
    * Returns (doc_id, chunk_idx, clen, chash). */
  def cdcChunks(docs: DataFrame, k: Int = 8, divisor: Int = 64): DataFrame = {
    val ends = array_distinct(concat(
      graft.functions.CdcBoundaries.cdcBoundaries(col("text"), k, divisor),
      array(length(col("text")))))
    docs
      // empty docs have no chunks (a zero-length 'chunk' would be
      // md5('') noise in the dedup groups; the oracle filters n >= 1)
      .filter(length(col("text")) >= 1)
      .select(col("doc_id"), col("text"), ends.as("ends"))
      .select(col("doc_id"), col("text"),
        explode(transform(sequence(lit(1), size(col("ends"))), j =>
          struct((j - 1).as("idx"),
            when(j === 1, 1).otherwise(element_at(col("ends"), j - 1) + 1)
              .as("s"),
            element_at(col("ends"), j).as("e")))).as("c"))
      .select(col("doc_id"), col("c.idx").as("chunk_idx"),
        (col("c.e") - col("c.s") + 1).cast("long").as("clen"),
        md5(expr("substring(text, c.s, c.e - c.s + 1)")).as("chash"))
  }

  /** 32-bit SimHash over whitespace tokens (multiset — frequency-weighted).
    * bit_i = 1 iff Σ_tokens (2·bit_i(hash(token)) − 1) > 0. Two grouped
    * aggregations; the bit-position explode multiplies rows ×32 but stays
    * map-local before the first shuffle. */
  def simhash32(docs: DataFrame): DataFrame = {
    val words = docs.select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("w"))
      .withColumn("h", portableHash32(col("w")))
    // 32 conditional-sum aggregates instead of a ×32 bit-position explode:
    // one shuffle of word rows WITH map-side partial aggregation, versus
    // shuffling rows×32 to a two-level groupBy.
    val bitSums = (0 until 32).map { i =>
      sum(when(expr(s"(shiftright(h, $i) & 1)") === 1, 1).otherwise(-1)).as(s"b$i")
    }
    val summed = words.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val hash = (0 until 32)
      .map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    summed.select(col("doc_id"), hash.as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance ≤ `maxHamming` (≤ 3).
    * Blocking: 4 chunks of 8 bits — pigeonhole guarantees every pair
    * within hamming 3 shares at least one chunk, so pairs only ever
    * materialize inside a (chunk-position, chunk-value) posting list.
    *
    * `maxBucket` rides the shared [[Posting.bounded]] valve: per-block
    * counts first, blocks over the cap split into group-pair
    * sub-postings BEFORE any collect_list — so the aggregation buffer
    * (not just the pair scan) is bounded even on a pathological
    * near-identical corpus where one (chunk, value) posting holds
    * essentially the whole corpus, and the quadratic scan of a split
    * block spreads over G·(G+1)/2 tasks. [[Posting.owns]] keeps the
    * pair set IDENTICAL to the uncapped run (spec-asserted on a
    * degenerate corpus); the default cap is real, not opt-in, because
    * the split never changes results. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = 4096): DataFrame = {
    // Candidate volume inside a chunk bucket is quadratic, and simhash
    // buckets are FAT (similar docs cluster on chunk values by design),
    // so pairs are filtered AT EMISSION instead of materialized-then-
    // distinct-then-filtered: a pair leaves its posting list only if
    // (a) hamming(shi, shj) <= maxHamming, and (b) this is the SMALLEST
    // chunk position on which the two hashes agree — which makes every
    // qualifying pair unique by construction (the chunk-level dedup) on
    // top of Posting.owns's sub-posting ownership (the split-level
    // dedup), so no distinct shuffle at all. Rejected candidates cost
    // one xor+popcount each and never allocate a row. (Measured:
    // 40M-candidate emission 3.7s -> 0.6s.)
    def chunk(h: Column, cc: Int): Column =
      shiftright(h, cc * 8).bitwiseAND(lit(255L))
    val rows = simhash32(docs)
      .select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("c"))
      .withColumn("chunk", expr("shiftright(simhash, 8 * c) & 255"))
      .select(col("c"), col("chunk"),
        struct(col("doc_id"), col("simhash")).as("m"))
    val ha = col("a.simhash")
    val hb = col("b.simhash")
    // the pigeonhole ownership test reads the chunk index `c`, carried
    // through the streamed emission with the other block columns
    val noEarlierChunk = (0 until 3).map(cc =>
      (lit(cc) >= col("c")) || (chunk(ha, cc) =!= chunk(hb, cc)))
      .reduce(_ && _)
    Posting.streamPairs(
        Posting.bounded(rows, Seq("c", "chunk"), "m", maxBucket)
          // pin the pair-emission width: the posting shuffle is tiny in
          // BYTES, so AQE's byte-based coalescing would run the
          // compute-bound pair scan on one task (measured 7s single-task
          // on sf0.1). Fanout also spreads a split fat block's
          // sub-postings across tasks instead of leaving them on one.
          .transform(graft.Tables.fanout))
      .filter(bit_count(ha.bitwiseXOR(hb)) <= maxHamming && noEarlierChunk &&
        Posting.owns(col("a"), col("b")))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        bit_count(ha.bitwiseXOR(hb)).cast("int").as("hd"))
  }

  /** Blocked fuzzy record linkage: candidate pairs must share a blocking
    * key, so the quadratic edit-distance comparison only runs within
    * blocks — never a cross product.
    *
    * Uses Spark's bounded `levenshtein(l, r, threshold)`, which abandons
    * a pair as soon as the running distance exceeds `maxDist` — per-pair
    * cost O(len·maxDist) instead of O(len²) — behind a LENGTH-BAND
    * prune: edit distance is at least the length difference, so
    * |len(a)−len(b)| > maxDist pairs are discarded by an integer compare
    * of PRE-COMPUTED per-row lengths before the DP ever runs (at sf1
    * this is most of each block's quadratic candidate set). At 100 TB
    * the blocking key IS the algorithm: a natural composite key here;
    * sorted-neighborhood windows or phonetic keys for free text.
    *
    * `maxBucket` rides the shared [[Posting.bounded]] valve like every
    * other pair detector: block members collect into bounded posting
    * lists, a degenerate hot blocking value (one brand/size holding a
    * 10⁵-member block) splits into G-group sub-postings BEFORE the
    * quadratic scan, so the scan spreads over G·(G+1)/2 tasks instead
    * of serializing onto the one join task that owns the hot key —
    * previously this was the ONLY detector a hot block could turn into
    * a single multi-hour straggler. [[Posting.owns]] keeps the pair set
    * IDENTICAL to the uncapped run (split, not drop; spec-asserted on a
    * degenerate block), and [[Posting.streamPairs]] keeps emission
    * memory O(|ms|), never the C(|ms|,2) pair array. The length band
    * and the bounded DP run as codegen Columns downstream of emission.
    *
    * Output: blockCols ++ (k1, k2, dist) with k1 < k2, dist <= maxDist.
    *
    * Null blocking values NEVER pair: rows with a null in any block
    * column are dropped up front — the equi-join contract (null
    * equi-joins nothing) this detector had before it moved onto the
    * posting valve, preserved explicitly because a groupBy would
    * otherwise treat null as a regular group and silently pair
    * null-keyed records with each other. */
  def editDistancePairs(df: DataFrame, keyCol: String, strCol: String,
      blockCols: Seq[String], maxDist: Int,
      maxBucket: Int = 4096): DataFrame = {
    require(blockCols.nonEmpty,
      "editDistancePairs requires at least one blocking column — without " +
        "blocks the pairing is an unbounded cross product")
    // key first in the member struct: sort_array orders postings by key,
    // so emitted (a, b) already satisfy a.k <= b.k
    val rows = df
      .filter(blockCols.map(col(_).isNotNull).reduce(_ && _))
      .select(blockCols.map(col) :+
      struct(col(keyCol).as("k"), length(col(strCol)).as("l"),
        col(strCol).as("s")).as("m"): _*)
    Posting.streamPairs(
        Posting.bounded(rows, blockCols, "m", maxBucket)
          // pin the pair-emission width (see minhashLshPairs): the
          // posting shuffle is tiny in bytes, and the DP scan is
          // compute-bound — AQE coalescing or a handful of fat blocks
          // must not serialize it onto one task
          .transform(graft.Tables.fanout))
      .filter(col("a.k") < col("b.k") &&
        abs(col("a.l") - col("b.l")) <= maxDist && // necessary for dist<=maxDist
        Posting.owns(col("a"), col("b")))
      .withColumn("dist", levenshtein(col("a.s"), col("b.s"), maxDist))
      .filter(col("dist") >= 0) // bounded levenshtein returns -1 past maxDist
      .select(blockCols.map(col) ++
        Seq(col("a.k").as("k1"), col("b.k").as("k2"), col("dist")): _*)
  }

  /** Segment-level (paragraph) dedup, CCNet-style: the corpus is cut into
    * fixed-width word segments, every segment that already occurred
    * earlier in the corpus (first occurrence = lowest (doc_id, seg_idx))
    * is dropped, and each document is reassembled from its surviving
    * segments. This removes boilerplate shared across documents without
    * discarding the documents themselves — the per-paragraph complement
    * of whole-doc [[dedupExact]]. (CCNet dedups on real paragraph breaks;
    * the fixture corpus has none, so width-`segWords` windows stand in —
    * the plan is identical either way.)
    *
    * Plan shape for 100 TB: segmentation happens AT SCAN with array
    * functions (no per-word explode); first-occurrence-wins is a
    * MIN-STRUCT AGGREGATION keyed by segment content — map-side
    * combinable, so even a degenerate corpus where ONE segment repeats
    * millions of times reduces to partial minima before the shuffle
    * (a row_number window over `seg` would funnel that segment's whole
    * group through one task's sort). The winners table IS the kept
    * segment set; reassembly is one doc-keyed agg left-joined to the
    * per-doc totals. Returns (doc_id, n_segs, n_kept, text) for every
    * input doc — text is '' when every segment was a repeat. */
  def segmentDedup(docs: DataFrame, segWords: Int = 10): DataFrame = {
    require(segWords >= 1, "segWords must be >= 1")
    val segs = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ws"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0),
            ((size(col("ws")) + (segWords - 1)) / segWords).cast("int") - 1),
          i => concat_ws(" ", slice(col("ws"), i * segWords + 1, lit(segWords)))))
          .as(Seq("seg_idx", "seg")))
    // (doc_id, seg_idx) struct-min = first occurrence; skew-immune
    val kept = segs.groupBy(col("seg"))
      .agg(min(struct(col("doc_id"), col("seg_idx"))).as("w"))
      .select(col("w.doc_id").as("doc_id"), col("w.seg_idx").as("seg_idx"),
        col("seg"))
    val reassembled = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
          x => x("seg"))).as("text"))
    segs.groupBy(col("doc_id")).agg(count(lit(1)).as("n_segs"))
      .join(reassembled, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_segs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text"), lit("")).as("text"))
  }

  /** Directed n-gram CONTAINMENT pairs: for documents i, j sharing
    * shingles, containment(i → j) = |S_i ∩ S_j| / |S_i| — the fraction
    * of i's shingle set that also appears in j. Jaccard misses the
    * doc-inside-doc case (a paragraph quoted into a much larger page
    * scores near zero on Jaccard but 1.0 on containment); this is the
    * detector for subset duplication, quote mining, and template
    * expansion (Broder's original resemblance/containment split).
    *
    * Same linear posting-list plan as [[ngramJaccardPairs]] — scan →
    * posting lists keyed by shingle → local pair emission → pair-count
    * agg — with both directions emitted from the single undirected
    * count, so the extra direction costs one array explode, not a second
    * pipeline. Returns (i, j, containment) with containment(i→j) ≥
    * `threshold`, i ≠ j. `maxDocFreq` caps hot shingles exactly as in
    * [[ngramJaccardPairs]]. */
  def containmentPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.8,
      maxDocFreq: Int = Int.MaxValue): DataFrame = {
    val base = docs.select(col("doc_id"),
      array_distinct(shingles(col("text"), n)).as("shs"))
    val capped = if (maxDocFreq == Int.MaxValue) base else {
      val hot = base.select(explode_outer(col("shs")).as("sh"))
        .filter(col("sh").isNotNull)
        .groupBy(col("sh")).agg(count(lit(1)).as("df"))
        .filter(col("df") > maxDocFreq)
        .agg(collect_list(col("sh")).as("hot"))
      base.crossJoin(broadcast(hot))
        .select(col("doc_id"),
          filter(col("shs"), s => !array_contains(col("hot"), s)).as("shs"))
    }
    val posting = capped
      .select(col("doc_id"), size(col("shs")).as("sz"),
        explode_outer(col("shs")).as("sh"))
      .filter(col("sh").isNotNull)
      .groupBy(col("sh"))
      .agg(array_sort(collect_list(struct(col("doc_id"), col("sz")))).as("ms"))
      .filter(size(col("ms")) >= 2)
      .transform(graft.Tables.fanout)
      .select(col("ms"))
    // streamed emission, same O(|ms|)-peak rationale (and measured
    // fixture-scale win) as [[ngramJaccardPairsOfShingles]]
    Posting.streamPairs(posting)
      .groupBy(col("a.doc_id").as("a"), col("b.doc_id").as("b"),
        col("a.sz").as("sa"), col("b.sz").as("sb"))
      .agg(count(lit(1)).as("c"))
      // one undirected count row → up to two directed containment rows
      .select(explode(array(
        struct(col("a").as("i"), col("b").as("j"),
          (col("c").cast("double") / col("sa")).as("containment")),
        struct(col("b").as("i"), col("a").as("j"),
          (col("c").cast("double") / col("sb")).as("containment")))).as("d"))
      .select(col("d.i").as("i"), col("d.j").as("j"), col("d.containment"))
      .filter(col("containment") >= threshold)
  }
}
