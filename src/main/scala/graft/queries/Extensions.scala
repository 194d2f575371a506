package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{t, tf}
import graft.ext.{Dedup, Graph, Multimodal, Quantize, Sampling, Similarity, TextOps}

/** LLM-pipeline extension queries (dedup / similarity / text / multimodal),
  * each oracle-checked against DuckDB.
  *
  * The fixtures contain no natural duplicates (500 unique docs; max
  * within-label cosine 0.47), so the dedup queries run over the fixture
  * PLUS deterministically planted duplicates — the same `doc_id`
  * arithmetic on both the Spark and SQL sides — so every operator
  * demonstrably finds planted structure and still hash-matches.
  */
object Extensions {

  /** The ONE k shared by the three approximate-ANN queries that use the
    * join-back oracle (ann_lsh_topk / ann_ivf_topk / ann_pq_topk) AND by
    * [[joinBackCosineSql]]'s `WHERE rk <= k` truncation. A single
    * constant on purpose: if a query's k drifted from its oracle's, the
    * oracle would keep truncating at the old k and the failure would
    * surface as a confusing row-count mismatch instead of pointing at
    * the drift. */
  private val JoinBackAnnK = 5

  /** The bulk-line co-purchase graph shared by graph_triangles and
    * graph_kcore: parts linked when they appear in the same order, bulk
    * lines only (quantity >= 30) — the unfiltered fixture graph is
    * near-complete at avg degree ~200 and measures the fixture's
    * combinatorics, not the operator. The quantity gate pushes to the
    * scan on both self-join sides. ONE definition so the two queries
    * (and their oracles, via [[bulkCoPurchaseEdgesSql]]) can never
    * drift onto different graphs. Output is DISTINCT with a < b — the
    * contract behind the consumers' inputCanonical attestation. */
  private[graft] def bulkCoPurchaseEdges(s: SparkSession, dir: String): DataFrame = {
    // isNotNull matches the self-join formulation this replaced: an
    // inner join on ok = ok never matches NULL keys, but groupBy would
    // collect every NULL-key row into ONE pair-producing group. The
    // fixture has no NULL orderkeys; the filter keeps the equivalence
    // unconditional (and ExtensionsSpec pins it against the join form).
    val li = graft.Tables.t(s, dir, "lineitem")
      .filter(col("l_quantity") >= 30 && col("l_orderkey").isNotNull)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    // posting-list shape, not a self-join: group the (few) bulk parts
    // of each order into a sorted distinct array and emit the ordered
    // pairs map-side — the same one-shuffle pattern as the dedup
    // detectors, replacing the self-join's second sorted leg and the
    // join itself. Per-order part counts are bounded (an order has ~4-7
    // lines), so the local pair blowup is trivially safe; identical
    // pair SET to the join formulation (a < b from a sorted distinct
    // array), so the DISTINCT below and the DuckDB twin are unchanged.
    li.groupBy(col("ok"))
      .agg(array_sort(collect_set(col("pk"))).as("ps"))
      .filter(size(col("ps")) >= 2)
      .select(explode(flatten(transform(
          sequence(lit(1), size(col("ps")) - 1),
          i => transform(slice(col("ps"), i + 1, size(col("ps")) - i),
            e => struct(element_at(col("ps"), i).as("a"), e.as("b"))))))
        .as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      // the DuckDB twin SELECTs DISTINCT; dedup here too so the two
      // definitions are equivalent on their own, not just after the
      // consumers (triangles/kCore) happen to re-dedup internally
      .distinct()
  }

  // DuckDB twin of [[bulkCoPurchaseEdges]] — a CTE yielding e(u, v)
  private val bulkCoPurchaseEdgesSql =
    """e AS (
      |  SELECT DISTINCT x.l_partkey AS u, y.l_partkey AS v
      |  FROM lineitem x JOIN lineitem y
      |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      |  WHERE x.l_quantity >= 30 AND y.l_quantity >= 30)""".stripMargin

  /** Planted-dup corpus: exact copies of doc_id % 25 == 0 (ids +200000)
    * and near-copies (3 appended tokens) of doc_id % 25 == 13 (+100000). */
  def plantedDocs(s: SparkSession, dir: String): DataFrame =
    // ONE scan, not a 3-branch union (see [[graft.Tables.plantedVariants]])
    graft.Tables.plantedVariants(
      tf(s, dir, "documents").select(col("doc_id"), col("text")),
      Seq("doc_id", "text"),
      struct(col("doc_id"), col("text")),
      when(col("doc_id") % 25 === 0,
        struct((col("doc_id") + 200000).as("doc_id"), col("text"))),
      when(col("doc_id") % 25 === 13,
        struct((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" extra token tail")).as("text"))))

  private[queries] val plantedSql =
    """docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 200000 AS doc_id, text FROM documents WHERE doc_id % 25 = 0
      |  UNION ALL SELECT doc_id + 100000 AS doc_id, text || ' extra token tail' AS text
      |    FROM documents WHERE doc_id % 25 = 13
      |)""".stripMargin

  // shared SQL fragments ----------------------------------------------------
  private val hSql = "CAST(concat('0x', substr(md5(%s), 1, 8)) AS BIGINT)"

  private[queries] val shinglesSql =
    """sh_idx AS (
      |  SELECT DISTINCT doc_id, sh FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, len(ws) - 1),
      |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
      |    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM docs))
      |)""".stripMargin
  private val minhashSigSql = {
    val mins = Dedup.minhashParams.zipWithIndex.map { case ((a, b), j) =>
      s"CAST(min((h * $a + $b) % ${Dedup.MinhashP}) AS BIGINT) AS s$j"
    }.mkString(",\n    ")
    s"""hashes AS (SELECT doc_id, ${hSql.format("sh")} AS h FROM sh_idx),
       |sigs AS (SELECT doc_id,
       |    $mins
       |  FROM hashes GROUP BY doc_id)""".stripMargin
  }

  /** Full CTE chain ending in `jp(i, j, jaccard)` — the DuckDB twin of
    * [[Dedup.ngramJaccardPairs]] over the planted corpus. Shared with the
    * clustering oracles in [[Corpus]] so the detector semantics can never
    * drift between the pair oracle and the cluster oracles. */
  private[queries] val jaccardPairsCtesSql: String =
    s"""$plantedSql,
       |$shinglesSql,
       |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh_idx GROUP BY doc_id),
       |cnt AS (
       |  SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS c
       |  FROM sh_idx a JOIN sh_idx b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id),
       |jp AS (
       |  SELECT i, j, CAST(c AS DOUBLE) / (si.sz + sj.sz - c) AS jaccard
       |  FROM cnt
       |  JOIN sizes si ON cnt.i = si.doc_id
       |  JOIN sizes sj ON cnt.j = sj.doc_id
       |  WHERE CAST(c AS DOUBLE) / (si.sz + sj.sz - c) >= 0.5)""".stripMargin
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_stats" -> ((s, dir) => {
      TextOps.textStats(tf(s, dir, "documents").select(col("doc_id"), col("text")))
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    // EXACT-substring contamination: eval snippets (deterministic slices
    // of every 50th doc) matched VERBATIM against the corpus — the exact
    // complement of the n-gram/winnow approximate paths
    "dedup_substring_contam" -> ((s, dir) => {
      val docs = tf(s, dir, "documents").select(col("doc_id"), col("text"))
      val snippets = docs
        .filter(col("doc_id") % 50 === 7 && length(col("text")) >= 80)
        .select(col("doc_id").as("eval_id"),
          substring(col("text"), 21, 40).as("eval_text"))
      Dedup.substringContamination(docs, snippets).transform(graft.Tables.ordered(col("doc_id")))
    }),

    // SAME contamination check with the Aho-Corasick kernel FORCED
    // (threshold 0): hash-grades the automaton directly against the
    // contains-join oracle instead of only spec-gating the equivalence
    "dedup_substring_contam_ac" -> ((s, dir) => {
      val docs = tf(s, dir, "documents").select(col("doc_id"), col("text"))
      val snippets = docs
        .filter(col("doc_id") % 50 === 7 && length(col("text")) >= 80)
        .select(col("doc_id").as("eval_id"),
          substring(col("text"), 21, 40).as("eval_text"))
      Dedup.substringContamination(docs, snippets, automatonThreshold = 0)
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    // the TRANSPOSED leak report: per eval snippet, how many corpus docs
    // contain it — zero-hit snippets kept (left join), the eval owner's
    // view of the same contamination relation
    "dedup_contam_report" -> ((s, dir) => {
      val docs = tf(s, dir, "documents").select(col("doc_id"), col("text"))
      val snippets = docs
        .filter(col("doc_id") % 50 === 7 && length(col("text")) >= 80)
        .select(col("doc_id").as("eval_id"),
          substring(col("text"), 21, 40).as("eval_text"))
      Dedup.contaminationReport(docs, snippets).transform(graft.Tables.ordered(col("eval_id")))
    }),

    // Gopher repetition gates: top-token fraction + duplicate-n-gram
    // fractions per document (ratios are single IEEE divisions of exact
    // longs — no rounding step, same discipline as text_stats.stop_ratio)
    "text_repetition" -> ((s, dir) => {
      TextOps.repetitionSignals(
        tf(s, dir, "documents").select(col("doc_id"), col("text")))
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    // bigram-LM perplexity proxy: add-one-smoothed bigram NLL, trained on
    // and scored over the corpus itself (see TextOps.bigramNll for the
    // order-independent decimal-sum determinism contract)
    "text_bigram_nll" -> ((s, dir) => {
      TextOps.bigramNll(tf(s, dir, "documents").select(col("doc_id"), col("text")))
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    // DSIR importance weights toward a designated target domain (sources
    // src0-3): bigram-LM log-likelihood ratio, both models from ONE
    // aggregation. Self-inclusion makes target docs score high on
    // average — asserted in TextOpsSpec; the hash checks every weight
    "sample_dsir_weights" -> ((s, dir) => {
      TextOps.dsirWeights(tf(s, dir, "documents"),
          col("source").isin("src0", "src1", "src2", "src3"))
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    // the DSIR SELECTION step: hash-derived Gumbel noise turns weighted
    // sampling-without-replacement into a deterministic top-k
    "sample_gumbel_topk" -> ((s, dir) => {
      val w = TextOps.dsirWeights(tf(s, dir, "documents"),
        col("source").isin("src0", "src1", "src2", "src3"))
      Sampling.gumbelTopK(w, col("doc_id"), col("log_weight"), k = 100)
        .select(col("doc_id"), col("log_weight"), col("gumbel_key"))
        .transform(graft.Tables.ordered(col("gumbel_key").desc, col("doc_id")))
    }),

    "dedup_exact" -> ((s, dir) => {
      Dedup.exactGroups(plantedDocs(s, dir)).transform(graft.Tables.ordered(col("h")))
    }),

    "dedup_apply_exact" -> ((s, dir) => {
      Dedup.dedupExact(plantedDocs(s, dir))
        .select(col("doc_id")).transform(graft.Tables.ordered(col("doc_id")))
    }),

    "dedup_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(plantedDocs(s, dir), n = 3, threshold = 0.5)
        .transform(graft.Tables.ordered(col("i"), col("j")))
    }),

    // paragraph-level dedup over the planted corpus: whole-doc duplicates
    // lose every segment to their originals; near-dups keep only the
    // trailing segment their extra tokens land in
    "dedup_paragraph" -> ((s, dir) => {
      Dedup.segmentDedup(plantedDocs(s, dir), segWords = 10)
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    // directed subset-duplication detector: the planted near-dups contain
    // their originals at ~1.0 even where symmetric Jaccard dips
    "dedup_containment" -> ((s, dir) => {
      Dedup.containmentPairs(plantedDocs(s, dir), n = 3, threshold = 0.8)
        .transform(graft.Tables.ordered(col("i"), col("j")))
    }),

    "dedup_minhash_lsh" -> ((s, dir) => {
      Dedup.minhashLshPairs(plantedDocs(s, dir), n = 3, threshold = 0.5)
        .transform(graft.Tables.ordered(col("i"), col("j")))
    }),

    "dedup_simhash" -> ((s, dir) => {
      Dedup.simhashPairs(plantedDocs(s, dir), maxHamming = 3)
        .transform(graft.Tables.ordered(col("i"), col("j")))
    }),

    // detector AGREEMENT matrix: exact n-gram Jaccard vs MinHash-LSH over
    // the same corpus/threshold — the recall-vs-cost evidence for
    // choosing the production detector (minhash_only = estimator false
    // positives; jaccard_only = banding misses). A full-outer join of two
    // EDGE SETS (both ≪ corpus), then one grouped count.
    "dedup_detector_agreement" -> ((s, dir) => {
      // both detectors consume the SAME distinct 3-shingle sets (minhash
      // sigs are per-component minima, so multiset vs set is identical —
      // Dedup.minhashSigOfShingles): pin the SHINGLED frame, not just
      // the planted docs, so the dominant per-row CPU (tokenize +
      // n-gram concat) runs once for the pair of detectors instead of
      // once each (caches swept by the caller)
      val shingled = plantedDocs(s, dir)
        .select(col("doc_id"),
          array_distinct(Dedup.shingles(col("text"), 3)).as("shs"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val jp = Dedup.ngramJaccardPairsOfShingles(shingled, threshold = 0.5)
        .select(col("i"), col("j"), lit(true).as("in_j"))
      val mh = Dedup.minhashLshPairsOfShingles(shingled, threshold = 0.5)
        .select(col("i").as("mi"), col("j").as("mj"), lit(true).as("in_m"))
      jp.join(mh, col("i") === col("mi") && col("j") === col("mj"), "full_outer")
        .select(coalesce(col("i"), col("mi")).as("pi"),
          coalesce(col("j"), col("mj")).as("pj"),
          coalesce(col("in_j"), lit(false)).as("in_j"),
          coalesce(col("in_m"), lit(false)).as("in_m"))
        .groupBy(when(col("in_j") && col("in_m"), "both")
          .when(col("in_j"), "jaccard_only")
          .otherwise("minhash_only").as("verdict"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("pi") + col("pj")).as("id_sum"))
        .transform(graft.Tables.ordered(col("verdict")))
    }),

    // sub-document storage dedup: content-defined chunks shared across
    // the planted corpus — exact copies share every chunk, near-dups all
    // but the edited tail region
    "dedup_cdc_chunks" -> ((s, dir) => {
      Dedup.cdcChunks(plantedDocs(s, dir), k = 8, divisor = 64)
        .groupBy(col("chash"))
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"),
          max(col("clen")).as("clen"))
        .filter(col("n") > 1)
        .transform(graft.Tables.ordered(col("chash")))
    }),

    // incremental crawl dedup: tonight's batch (exact + near copies)
    // against the standing corpus via the banded signature index — the
    // corpus is never re-paired against itself
    "dedup_minhash_incremental" -> ((s, dir) => {
      val base = tf(s, dir, "documents").select(col("doc_id"), col("text"))
      // the batch's two planted branches in one scan
      val batch = graft.Tables.plantedVariants(
        tf(s, dir, "documents"), Seq("doc_id", "text"),
        when(col("doc_id") % 25 === 0,
          struct((col("doc_id") + 200000).as("doc_id"), col("text"))),
        when(col("doc_id") % 25 === 13,
          struct((col("doc_id") + 100000).as("doc_id"),
            concat(col("text"), lit(" extra token tail")).as("text"))))
      Dedup.minhashLshAgainst(base, batch, n = 3, threshold = 0.5)
        .transform(graft.Tables.ordered(col("i"), col("j")))
    }),

    "ann_cosine_topk" -> ((s, dir) => {
      val emb = tf(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") % 100 === 0), k = JoinBackAnnK)
        .transform(graft.Tables.ordered(col("qid"), col("rk")))
    }),

    // ---- hybrid retrieval: reciprocal-rank fusion of the dense leg
    // (cosine top-20, the ann_cosine_topk kernel) and a lexical leg
    // (BM25 query-by-example: each query doc's distinct tokens as the
    // query). RRF needs only the two rank columns — no score
    // calibration across legs, which is exactly why production
    // retrieval stacks fuse this way. Both legs broadcast their query
    // side; the fusion is a (qid, doc) equi-join of two top-k tables
    // (tiny), never the corpora.
    "retrieval_hybrid_rrf" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = tf(s, dir, "documents").select(col("doc_id"), col("text"))
      val emb = tf(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") % 100 === 0)
      val dense = Similarity.bruteForceTopK(emb, qs, k = 20)
        .select(col("qid"), col("vec_id").as("doc_id"),
          col("rk").cast("long").as("r_dense"))
      val qt = docs
        .join(qs.select(col("vec_id").as("doc_id")), Seq("doc_id"))
        .select(col("doc_id").as("qid"),
          explode(TextOps.tokens(col("text"))).as("term"))
        .distinct()
      val lex = TextOps.bm25TopK(docs, qt, k = 20)
        .select(col("qid"), col("doc_id"), col("rn").as("r_lex"))
      dense.join(lex, Seq("qid", "doc_id"), "full_outer")
        .withColumn("rrf",
          coalesce(lit(1.0) / (lit(60.0) + col("r_dense").cast("double")),
            lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("r_lex").cast("double")),
            lit(0.0)))
        .withColumn("rk", row_number().over(
            Window.partitionBy(col("qid"))
              .orderBy(col("rrf").desc, col("doc_id"))).cast("long"))
        .filter(col("rk") <= 10)
        .select(col("qid"), col("rk"), col("doc_id"),
          col("r_dense"), col("r_lex"), col("rrf"))
        .transform(graft.Tables.ordered(col("qid"), col("rk")))
    }),

    // contrastive hard negatives: nearest CROSS-label neighbors per query
    "embed_hard_negatives" -> ((s, dir) => {
      val emb = tf(s, dir, "embeddings")
      Similarity.hardNegatives(emb, emb.filter(col("vec_id") % 100 === 0), k = JoinBackAnnK)
        .transform(graft.Tables.ordered(col("qid"), col("rk")))
    }),

    // ---- mean-pooling chunk embeddings into document vectors (the
    // aggregation step after chunk-level embedding): per-dimension
    // decimal-exact sums (order-free at any parallelism — the kmeans
    // M-step contract), ONE posexplode + one grouped agg, surfaced as
    // (grp, pos, pooled) rows; n rides along for weighted re-pooling
    "embed_pool_mean" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      tf(s, dir, "embeddings")
        .select((col("vec_id") % 50).as("grp"),
          posexplode(expr("transform(embedding, x -> cast(x as double))"))
            .as(Seq("pos", "x")))
        .groupBy(col("grp"), col("pos"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("x"), 7).cast(DecimalType(20, 7))).as("sx"))
        .select(col("grp"), col("pos").cast("long").as("pos"), col("n"),
          (col("sx").cast("double") / col("n").cast("double")).as("pooled"))
        .transform(graft.Tables.ordered(col("grp"), col("pos")))
    }),

    "embed_neardup" -> ((s, dir) => {
      Similarity.nearDupPairs(tf(s, dir, "embeddings"), topN = 20)
    }),

    // greedy MMR diverse selection (k scans, driver state = k vectors);
    // the oracle replays every greedy step as its own CTE
    "embed_mmr_select" -> ((s, dir) => {
      Similarity.mmrSelect(tf(s, dir, "embeddings"), anchorId = 0L,
        k = 5, lambdaPct = 70)
    }),

    // unnormalized retrieval: inner product replaces cosine — magnitude
    // carries signal; same broadcast-queries scan shape
    "ann_mips_topk" -> ((s, dir) => {
      val emb = tf(s, dir, "embeddings")
      Similarity.mipsTopK(emb, emb.filter(col("vec_id") % 100 === 0), k = JoinBackAnnK)
        .transform(graft.Tables.ordered(col("qid"), col("rk")))
    }),

    // int8-quantized brute-force top-k: exact integer dot products over
    // absmax-quantized vectors (4x smaller than float32 at rest and in
    // shuffle). Bit-for-bit oracle-checkable — see Quantize's determinism
    // contract; int_dot is exact integer arithmetic on both engines.
    "ann_int8_topk" -> ((s, dir) => {
      val emb = tf(s, dir, "embeddings")
      Quantize.quantizedTopK(emb, emb.filter(col("vec_id") % 100 === 0), k = JoinBackAnnK)
        .transform(graft.Tables.ordered(col("qid"), col("rk")))
    }),

    // Product-quantization ADC retrieve + EXACT re-rank: the trained-
    // codebook ADC join (32x-compressed scale path, recall-gated in
    // QuantizeSpec) selects the candidate set, then rescoreExact reports
    // exact cosines/ranks over it — the standard retrieve-then-rerank
    // production shape. Join-back oracle: DuckDB recomputes the scores
    // for exactly the returned (qid, vec_id) pairs, so the set stays
    // approximate but every emitted value is hash-checked.
    "ann_pq_topk" -> ((s, dir) => {
      val emb = tf(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") % 100 === 0)
      // retrieve 5k ADC candidates, keep the EXACT top-k of them — the
      // standard retrieve-then-rerank budget: the extra candidates cost
      // O(|queries|·2k) dot products and lift measured recall@k
      // (bench `recall` field) from 0.39 to ~0.8, the candidate-coverage
      // ceiling of the 5k ADC set
      Similarity.rescoreExact(
          Quantize.pqTopK(emb, qs, k = 5 * JoinBackAnnK), emb, qs)
        .filter(col("rk") <= JoinBackAnnK)
        .transform(graft.Tables.ordered(col("qid"), col("rk")))
    }),

    // PQ with the closed-form codebook (codeword j = subvector j of the
    // normalized vector vec_id == j): zero training arithmetic, so the
    // full encode + ADC machinery hash-checks against a DuckDB oracle —
    // the oracle-backed anchor for ann_pq_topk's shared pqAdc kernel,
    // same pattern as ann_ivf_exact / ann_lsh_exact
    "ann_pq_adc" -> ((s, dir) => {
      val emb = tf(s, dir, "embeddings")
      Quantize.pqTopKFixed(emb, emb.filter(col("vec_id") % 100 === 0), k = JoinBackAnnK)
        .transform(graft.Tables.ordered(col("qid"), col("rk")))
    }),

    // LSH retrieve with exact scoring: lshTopK already re-scores its
    // bucket candidates with the exact 4-dp cosine, so the join-back
    // oracle (DuckDB recomputes cos + rank for exactly the returned
    // pairs) hash-checks every emitted value; the candidate SET is the
    // approximate part and stays recall-gated in ExtensionsSpec.
    "ann_lsh_topk" -> ((s, dir) => {
      val emb = tf(s, dir, "embeddings")
      // 12 hash tables instead of the kernel-default 8: bucket-join
      // volume grows 1.5x on a sub-second query while measured recall@k
      // vs the brute-force twin (bench `recall` field) climbs
      // 0.76 -> 0.87 (sf0.1) — tables are LSH's probes-for-recall dial
      Similarity.lshTopK(emb, emb.filter(col("vec_id") % 100 === 0),
          k = JoinBackAnnK, nTables = 12)
        .transform(graft.Tables.ordered(col("qid"), col("rk")))
    }),

    // LSH at ZERO bits × one table: every vector lands in the single
    // bucket, every pair is a candidate, and the result is exact by
    // construction — so the full LSH machinery (bucket-key explode,
    // bucket join, candidate dedup, exact re-scoring, rank) hash-checks
    // against the same brute-force DuckDB oracle as ann_cosine_topk;
    // nBits/nTables are then pure recall/throughput knobs.
    "ann_lsh_exact" -> ((s, dir) => {
      val emb = tf(s, dir, "embeddings")
      Similarity.lshTopK(emb, emb.filter(col("vec_id") % 100 === 0), k = 5,
          nBits = 0, nTables = 1)
        .transform(graft.Tables.ordered(col("qid"), col("rk")))
    }),

    // IVF retrieve with exact scoring: same join-back oracle contract as
    // ann_lsh_topk (scores/ranks exact over the probed candidate set);
    // recall and exact-at-full-probe are gated in ExtensionsSpec.
    "ann_ivf_topk" -> ((s, dir) => {
      val emb = tf(s, dir, "embeddings")
      // probe 6/16 cells: candidate volume grows 1.5x over the default
      // 4-probe while measured recall@k vs the brute-force twin (bench
      // `recall` field) climbs 0.71 -> 0.82 (sf0.1 measured) — the standard
      // probes-for-recall dial, spent where the suite's cheapest
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") % 100 === 0),
          k = JoinBackAnnK, nProbe = 6)
        .transform(graft.Tables.ordered(col("qid"), col("rk")))
    }),

    // IVF at FULL probe (nProbe = nCells): every cell is scanned, so the
    // result is exact by construction and hash-checks against the same
    // brute-force DuckDB oracle as ann_cosine_topk — the oracle-backed
    // anchor for the IVF machinery (cell assignment, probe explode,
    // candidate join); lower nProbe is the recall/throughput knob.
    "ann_ivf_exact" -> ((s, dir) => {
      val emb = tf(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") % 100 === 0), k = 5,
          nCells = 16, nProbe = 16)
        .transform(graft.Tables.ordered(col("qid"), col("rk")))
    }),

    // Tolerance-gated oracle: HLL sketch VALUES are engine-specific
    // (DuckDB could never reproduce Spark's estimates bit-for-bit), but
    // the sketch is deterministic over fixed data — so the query emits
    // the EXACT distinct counts (oracle-verified against DuckDB) plus
    // booleans asserting each HLL++ estimate sits within 3*rsd of the
    // exact count. The oracle expects TRUE: a broken estimator flips the
    // flag and fails the hash gate, while the exact columns anchor the
    // data itself. Every aggregate here is map-side-combinable — the
    // percentile sketches are bounded separately in ApproxSpec because an
    // exact-percentile reference would be a single-reducer O(n) collect,
    // which this query must not model at 100 TB.
    "approx_distinct" -> ((s, dir) => {
      // ONE scan feeds both the exact distincts AND the HLL sketches.
      // No countDistinct anywhere: RewriteDistinctAggregates would key
      // the sketch aggregate by (gid, distinct value), giving every one
      // of the ~2M partial groups its own multi-KB HLL buffer (measured
      // 8-18s). Instead each row explodes map-side into (gid, key) for
      // the two audited columns and the partial hash aggregate on
      // (gid, key) dedups BEFORE the shuffle — only ~|parts|+|orders|
      // keys (with their multiplicities) cross the wire. The second,
      // per-gid pass then gets everything from the deduped stream:
      // exact distinct = group row count, n_rows = sum of the carried
      // multiplicities (for either gid), and the sketch fed from
      // distinct keys — HLL state is duplicate-insensitive, so the
      // estimate is bit-identical to sketching the raw scan. Sketch
      // buffers exist once per (partition, gid), never per key — the
      // 100 TB shape. DataSketches HLL (lgK=14, rse ~0.8% << the 6%
      // tol the oracle flags assert), not approx_count_distinct, whose
      // non-codegen per-row update measured 2.5x slower.
      //
      // The (gid, key) stream is a UNION of two single-column pruned
      // scans, not an explode of per-row structs: each union leg reads
      // ONE parquet column (columnar pruning keeps total bytes read
      // equal to the one-scan explode), the map-side dedup hashes a
      // plain long instead of allocating a struct per row, and the two
      // legs' partial aggregates run as separate parallel tasks
      // (measured: the explode form spent 0.42s of 0.65s in its scan
      // stage at sf0.1; the union form halves that stage).
      val li = t(s, dir, "lineitem")
      val keyed = li.select(lit(1).as("gid"), col("l_partkey").as("k"))
        .unionAll(li.select(lit(2).as("gid"), col("l_orderkey").as("k")))
      val dedup = keyed.groupBy(col("gid"), col("k"))
        .agg(count(lit(1)).as("c"))
      val per = dedup.groupBy(col("gid")).agg(
        count(lit(1)).as("exact"),
        sum(col("c")).as("nr"),
        hll_sketch_estimate(hll_sketch_agg(col("k"), lit(14))).as("est"))
      per.agg(
          max(when(col("gid") === 1, col("nr"))).as("n_rows"),
          max(when(col("gid") === 1, col("exact"))).as("exact_parts"),
          max(when(col("gid") === 2, col("exact"))).as("exact_orders"),
          max(when(col("gid") === 1, col("est"))).as("ap"),
          max(when(col("gid") === 2, col("est"))).as("ao"))
        .select(col("n_rows"), col("exact_parts"), col("exact_orders"),
          (abs(col("ap") - col("exact_parts")) <=
            col("exact_parts") * 0.06).as("parts_within_tol"),
          (abs(col("ao") - col("exact_orders")) <=
            col("exact_orders") * 0.06).as("orders_within_tol"))
    }),

    // Typed Aggregator: space-bounded top-5 customers per segment (the
    // buffer never exceeds k entries, so map-side partials ship <= k rows
    // per group — compare the window-rank plan that shuffles every row)
    "q41_topk_agg" -> ((s, dir) => {
      import s.implicits._
      val agg = new graft.functions.TopKByScore(5)
      t(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_acctbal").as("score"),
          col("c_custkey").as("id"))
        .as[(String, Double, Long)]
        .groupByKey(_._1)
        .mapValues(r => graft.functions.Scored(r._2, r._3))
        .agg(agg.toColumn.name("top_ids"))
        .toDF("c_mktsegment", "top_ids")
        .select(col("c_mktsegment"),
          concat_ws(",", transform(col("top_ids"), _.cast("string")))
            .as("top_ids_csv"))
        .transform(graft.Tables.ordered(col("c_mktsegment")))
    }),

    // TF-IDF: top term per document (deterministic tfidf-desc/term tiebreak)
    "text_tfidf_top" -> ((s, dir) => {
      val scored = TextOps.tfIdf(
        tf(s, dir, "documents").select(col("doc_id"), col("text")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    // MinHash calibration: estimated vs TRUE Jaccard for every pair the
    // LSH detector emits — the readout that justifies (or retunes) the
    // band/row parameters before trusting the estimate at scale. True
    // Jaccard is computed only for the candidate pairs (LSH's whole
    // point: that set is small), via two doc-keyed joins against the
    // shingle index.
    "dedup_minhash_calibration" -> ((s, dir) => {
      // ONE pinned distinct-shingle frame feeds everything (r15, the
      // detector-agreement seam): the LSH detector (sig of a multiset =
      // sig of its set — minhashSigOfShingles), both intersection legs
      // (cheap per-row explodes of the pinned compact arrays), and the
      // per-doc set sizes (size(shs) in-row — the previous shape
      // re-shingled the corpus a SECOND time, deduped it with a
      // full-shuffle distinct, and ran a groupBy(doc_id) count for
      // sizes). est stays pinned: the detector feeds the intersection
      // join AND the final projection. Caches swept by the caller.
      val shingled = plantedDocs(s, dir)
        .select(col("doc_id"),
          array_distinct(Dedup.shingles(col("text"), 3)).as("shs"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val est = Dedup.minhashLshPairsOfShingles(shingled, threshold = 0.5)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sh = shingled
        .select(col("doc_id"), explode(col("shs")).as("sh"))
      val sizes = shingled.select(col("doc_id"), size(col("shs")).as("sz"))
      val inter = est.select(col("i"), col("j"))
        .join(sh.select(col("doc_id").as("i"), col("sh")), Seq("i"))
        .join(sh.select(col("doc_id").as("j"), col("sh")), Seq("j", "sh"))
        .groupBy(col("i"), col("j")).agg(count(lit(1)).as("c"))
      est.join(inter, Seq("i", "j"), "left")
        .withColumn("c0", coalesce(col("c"), lit(0L)))
        .join(sizes.select(col("doc_id").as("i"), col("sz").as("szi")), Seq("i"))
        .join(sizes.select(col("doc_id").as("j"), col("sz").as("szj")), Seq("j"))
        .withColumn("true_jaccard", col("c0").cast("double") /
          (col("szi") + col("szj") - col("c0")))
        .withColumn("abs_err",
          round(abs(col("est_jaccard") - col("true_jaccard")), 6))
        .select(col("i"), col("j"), col("est_jaccard"),
          col("true_jaccard"), col("abs_err"))
        .transform(graft.Tables.ordered(col("i"), col("j")))
    }),

    // per-source token-length histogram (fixed 32-token bins, integer
    // div — no float log2 whose last-ulp differs across engines): the
    // sequence-length readout that sizes packBins bins and context
    // windows. One scan, map-side-combinable counts.
    "text_length_histogram" -> ((s, dir) => {
      tf(s, dir, "documents")
        .select(col("source"), TextOps.tokenCount(col("text")).as("n_tok"))
        .groupBy(col("source"), expr("n_tok div 32").as("bin"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_tok")).as("min_tok"), max(col("n_tok")).as("max_tok"))
        .transform(graft.Tables.ordered(col("source"), col("bin")))
    }),

    // source-overlap matrix: source-pair Jaccard over distinct shingle
    // sets — posting lists bounded by the source count, so no df cap.
    "corpus_source_overlap" -> ((s, dir) => {
      Dedup.sourceOverlap(
        tf(s, dir, "documents")
          .select(col("doc_id"), col("text"), col("source")))
        .transform(graft.Tables.ordered(col("src_a"), col("src_b")))
    }),

    // n-gram novelty curve: per-doc fraction of shingles first seen in
    // that doc under doc_id (ingest) order — the corpus-redundancy
    // readout that says when a source stops contributing new content.
    "text_ngram_novelty" -> ((s, dir) => {
      TextOps.ngramNovelty(
        tf(s, dir, "documents").select(col("doc_id"), col("text")))
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    // BM25 retrieval: top-10 docs per query for a deterministic query
    // set — the corpus's top-9 document-frequency terms, three per
    // query (fixture-independent, oracle-replayable). The query-term
    // table is broadcast; scoring touches only docs containing a term.
    "text_bm25_topk" -> ((s, dir) => {
      val docs = tf(s, dir, "documents").select(col("doc_id"), col("text"))
      val dfT = docs
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
        .distinct()
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
      // single-partition window over the 9-row limit result — bounded
      val w9 = org.apache.spark.sql.expressions.Window
        .orderBy(col("df").desc, col("term"))
      val qt = dfT.orderBy(col("df").desc, col("term")).limit(9)
        .withColumn("rn", row_number().over(w9))
        .select(when(col("rn") <= 3, 1L).when(col("rn") <= 6, 2L)
          .otherwise(3L).as("qid"), col("term"))
      TextOps.bm25TopK(docs, qt).transform(graft.Tables.ordered(col("qid"), col("rn")))
    }),

    // Winnowing fingerprints summarized to scalars. Oracle-checked: the
    // Rabin-Karp k-gram hash (base 257 mod 1e9+7 over char codes) and the
    // rightmost-min window selection are both replayed in DuckDB list
    // lambdas (fixture text is pure ASCII, so UTF-16 code units == ord()).
    // Algorithmic guarantees are additionally spec-gated (WinnowSpec).
    "text_winnow" -> ((s, dir) => {
      val fp = graft.functions.Winnow.winnow(col("text"))
      tf(s, dir, "documents")
        .select(col("doc_id"), size(fp).cast("long").as("n_fp"),
          element_at(fp, 1).as("min_fp"))
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    // MOSS-style near-dup pairs: planted copies (text || ' !!') share
    // nearly all char-8-gram winnow fingerprints with their source; the
    // df cap keeps common-substring fingerprints out of the pair pool
    "dedup_winnow_pairs" -> ((s, dir) => {
      // one scan: see plantedDocs — the union form decoded text twice
      val planted = graft.Tables.plantedVariants(
        tf(s, dir, "documents"), Seq("doc_id", "text"),
        struct(col("doc_id"), col("text")),
        when(col("doc_id") % 25 === 7,
          struct((col("doc_id") + 300000L).as("doc_id"),
            concat(col("text"), lit(" !!")).as("text"))))
      Dedup.winnowPairs(planted, minShared = 10, maxDocFreq = 8)
        .transform(graft.Tables.ordered(col("i"), col("j")))
    }),

    // REAL image decode, hash-graded: Spark parses P2 bytes with the
    // Scala netpbm codec; the oracle constructs identical payloads and
    // parses them with SQL string functions — two independent parsers of
    // a real image format must agree bit-for-bit
    // corpus-health check: OLS Zipf slope over the top-100 terms
    "text_zipf_slope" -> ((s, dir) => {
      TextOps.zipfSlope(tf(s, dir, "documents").select(col("text")), topN = 100)
    }),

    // gibberish/compression-junk gate: character-entropy per doc with
    // 9-dp decimal term sums (partition-order independent)
    "text_entropy" -> ((s, dir) => {
      TextOps.charEntropy(
          tf(s, dir, "documents").select(col("doc_id"), col("text")))
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    "multimodal_pgm_decode" -> ((s, dir) => {
      Multimodal.pgmFeatures(s,
        Multimodal.pgmMediaTable(
          tf(s, dir, "documents").select(col("doc_id"))))
        .transform(graft.Tables.ordered(col("media_id")))
    }),

    // REAL audio codec: deterministic PCM encoded as actual RIFF/WAVE
    // bytes, decoded by the chunk-walking parser, reduced to exact
    // integer stats + one sqrt. The oracle recomputes every statistic
    // from the sample FORMULA — codec round-trip and arithmetic check
    // each other (byte-layout conformance is golden-vector spec-gated).
    "multimodal_wav_decode" -> ((s, dir) => {
      Multimodal.wavFeatures(s,
        Multimodal.wavMediaTable(s,
          tf(s, dir, "documents").select(col("doc_id"))))
        .transform(graft.Tables.ordered(col("media_id")))
    }),

    // REAL video: deterministic frames encoded as actual YUV4MPEG2
    // bytes, decoded by the real container parser, reduced to exact
    // SAD-based scene cuts; the oracle recomputes everything from the
    // pixel formula (the construction guarantees within-scene SAD = 48
    // and cut SAD >= 4272, so the threshold can't flake)
    "multimodal_y4m_cuts" -> ((s, dir) => {
      Multimodal.y4mSceneCuts(s,
        Multimodal.y4mMediaTable(s,
          tf(s, dir, "documents").select(col("doc_id"))))
        .transform(graft.Tables.ordered(col("media_id")))
    }),

    // scene-aware frame sampling: first frame of every DETECTED scene
    // (detector runs on real decoded frames); per-frame exact luma stats
    "multimodal_y4m_scene_frames" -> ((s, dir) => {
      Multimodal.y4mSceneFrames(s,
        Multimodal.y4mMediaTable(s,
          tf(s, dir, "documents").select(col("doc_id"))))
        .toDF()
        .transform(graft.Tables.ordered(col("media_id"), col("scene_idx")))
    }),

    // cross-modal training-example MANIFEST: one row per example joining
    // the text, audio, and video legs by id — the assembly step before
    // packing multimodal training rows; every leg is a per-id equi-join
    "corpus_multimodal_manifest" -> ((s, dir) => {
      val docs = tf(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          graft.ext.TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
          when(graft.ext.TextOps.qualityKeep(col("text")), 1)
            .otherwise(0).as("keep"))
      val wav = Multimodal.wavFeatures(s, Multimodal.wavMediaTable(s,
          tf(s, dir, "documents").select(col("doc_id"))))
        .select(col("media_id").as("doc_id"),
          col("duration_ms").as("audio_ms"))
      val vid = Multimodal.y4mSceneCuts(s, Multimodal.y4mMediaTable(s,
          tf(s, dir, "documents").select(col("doc_id"))))
        .select(col("media_id").as("doc_id"),
          col("n_frames").as("video_frames"), col("n_cuts"))
      docs.join(wav, Seq("doc_id")).join(vid, Seq("doc_id"))
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    // acoustic fingerprints over the PLANTED wav corpus (exact audio
    // copies under new ids): per-clip integer energy-delta bits
    "multimodal_wav_fp" -> ((s, dir) => {
      Multimodal.wavFingerprints(s,
        Multimodal.plantedWavMediaTable(s,
          tf(s, dir, "documents").select(col("doc_id"))), frame = 16)
        .transform(graft.Tables.ordered(col("media_id")))
    }),

    // audio dedup CANDIDATE pairs: fingerprint equality over the planted
    // corpus — a bounded posting list on the (n_frames, fp) collision
    // key (hash-blocked, never a cartesian; decode runs ONCE, not once
    // per join side). Planted exact copies provably collide (spec-gated);
    // like any perceptual hash the collisions are candidates for an
    // exact confirm pass, not verdicts — same contract as LSH buckets.
    "multimodal_wav_fp_pairs" -> ((s, dir) => {
      Multimodal.wavFpPairs(s,
        Multimodal.plantedWavMediaTable(s,
          tf(s, dir, "documents").select(col("doc_id"))), frame = 16)
        .transform(graft.Tables.ordered(col("i"), col("j")))
    }),

    // the full audio kernel chain: decode → INTEGER-exact linear
    // resample (8 kHz → 5.5 kHz, no floats anywhere) → stats; the oracle
    // replays the interpolation as plain integer arithmetic over the
    // sample formula — both engines truncate toward zero
    "multimodal_wav_resample" -> ((s, dir) => {
      Multimodal.wavResampleStats(s,
        Multimodal.wavMediaTable(s,
          tf(s, dir, "documents").select(col("doc_id"))),
        targetRate = 5500)
        .transform(graft.Tables.ordered(col("media_id")))
    }),

    // the full real-pixel kernel chain (parse → NN resize → stats); the
    // oracle replays the resize as SQL index arithmetic over ITS parse
    "multimodal_pgm_resize" -> ((s, dir) => {
      Multimodal.pgmResizeStats(s,
        Multimodal.pgmMediaTable(
          tf(s, dir, "documents").select(col("doc_id"))), tw = 12, th = 9)
        .transform(graft.Tables.ordered(col("media_id")))
    }),

    // REAL perceptual hash (dHash-56 on decoded+resized pixels); oracle
    // rebuilds the identical 56-bit value from its own SQL-side parse
    "multimodal_phash" -> ((s, dir) => {
      Multimodal.pgmPhash(s,
        Multimodal.pgmMediaTable(
          tf(s, dir, "documents").select(col("doc_id"))))
        .transform(graft.Tables.ordered(col("media_id")))
    }),

    // image near-dup pairs at hamming <= 3 via 4x14-bit pigeonhole
    // blocking — exact, so the brute-force DuckDB pair scan is a true
    // oracle; Spark never materializes the quadratic comparison
    "multimodal_phash_pairs" -> ((s, dir) => {
      Multimodal.phashPairs(s,
        Multimodal.pgmMediaTable(
          tf(s, dir, "documents").select(col("doc_id"))), maxDist = 3)
        .transform(graft.Tables.ordered(col("i"), col("j")))
    }),

    // the full frame pipeline on REAL media: mixed-kind table →
    // frame-sample (every 2nd decoded luma plane / the image raster /
    // every 2nd 256-sample PCM window) → nearest-neighbor resize to
    // 4x3 on actual bytes → exact per-frame stats. The oracle replays
    // the sampling indices, the NN index arithmetic, AND the PCM16
    // little-endian low-byte view from the generator closed forms.
    "multimodal_frame_stats" -> ((s, dir) => {
      val media = Multimodal.mediaDataset(s, tf(s, dir, "documents"))
      Multimodal.frameStats(s,
          Multimodal.resizeFrames(s,
            Multimodal.sampleFrames(s, media, stride = 2),
            targetW = 4, targetH = 3))
        .transform(graft.Tables.ordered(col("media_id"), col("frame_idx")))
    }),

    // the GENERIC media decode: a mixed image/audio/video table of real
    // PGM/WAV/Y4M payloads, container sniffed by magic bytes, parsed by
    // the real codec, reduced to exact integer stats + 4-bin histogram
    // per object — all per-partition, payloads never reach the driver.
    // The oracle replays every statistic from the generators' closed
    // forms (never parsing binary), so codec round-trip and arithmetic
    // check each other — same discipline as multimodal_pgm_decode.
    "multimodal_features" -> ((s, dir) => {
      Multimodal.decodeFeatures(s,
          Multimodal.mediaDataset(s, tf(s, dir, "documents")))
        .toDF()
        .drop("feature") // normalized-histogram floats: h0..h3 certify it
        .transform(graft.Tables.ordered(col("media_id")))
    }),

    // span-level exact dedup: maximal cross-document repeated 5-gram
    // runs — the cut list a substring-level deduper consumes
    "dedup_repeated_spans" -> ((s, dir) => {
      Dedup.repeatedSpans(plantedDocs(s, dir), n = 5)
        .transform(graft.Tables.ordered(col("doc_id"), col("start_tok")))
    }),

    // APPLY the span cut list: duplicated 5-gram spans removed everywhere
    // but their min-doc owner, surviving tokens reassembled
    "dedup_apply_spans" -> ((s, dir) => {
      // the apply consumes docs twice (gram postings + token stream):
      // pin the planted frame so the 3-branch union runs once
      Dedup.applySpanDedup(plantedDocs(s, dir)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
          n = 5)
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    // ---- iterative graph analytics: 3 rounds of fixed-point PageRank
    // over the undirected customer-supplier trade graph; the oracle
    // replays the identical integer trajectory as unrolled CTEs
    "graph_pagerank" -> ((s, dir) => {
      val e = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("a"),
          (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
      // dedupSymmetric = false: customer ids are even, supplier ids odd
      // (bipartite), and e is already distinct — the reversed closure
      // cannot collide, so the re-dedup shuffle is provably redundant
      Graph.pageRank(e, iters = 3, dampingPct = 85,
        dedupSymmetric = false).transform(graft.Tables.ordered(col("node")))
    }),

    // degree distribution of the same trade graph — the first thing to
    // read before ANY iterative graph algorithm (hub detection sizes the
    // skew risk of every join-based propagation round). Undirected
    // degrees from ONE symmetric explode + two grouped counts.
    "graph_degrees" -> ((s, dir) => {
      val e = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("a"),
          (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
      // one-pass endpoint explode, not unionAll(a-leg, b-leg): each
      // union leg embeds the full edge build (join + distinct), so the
      // trade graph was computed twice (see Graph.symmetric)
      e.select(explode(array(col("a"), col("b"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
        .groupBy(col("deg").as("degree"))
        .agg(count(lit(1)).as("n_nodes"), sum(col("node")).as("id_sum"))
        .transform(graft.Tables.ordered(col("degree")))
    }),

    // ---- exact triangle counting over the part co-purchase graph
    // (parts linked when they appear in the same order). Degree-oriented
    // wedge join: O(m^1.5) total work regardless of hub skew — the naive
    // wedge join is d^2 per node and dies on 100 TB power-law hubs.
    "graph_triangles" -> ((s, dir) => {
      // harness mode (lazy plan): PlanQualitySpec must see the joins and
      // Bench times plan+execution; Bench/Verify sweep the two caches
      Graph.triangles(bulkCoPurchaseEdges(s, dir), materialize = false,
          inputCanonical = true)
        .transform(graft.Tables.ordered(col("node")))
    }),

    // ---- pre-join skew report for the conversion-funnel self-join:
    // which users would dominate the view x purchase join output — the
    // decide-salting-before-running diagnostic. Only (key, count) rows
    // shuffle; fact rows never cross the wire.
    "layout_join_skew" -> ((s, dir) => {
      val ev = graft.Tables.events(s, dir)
      graft.ops.Profile.joinSkew(
        ev.filter(col("event_type") === "view").select(col("user_id")),
        ev.filter(col("event_type") === "purchase").select(col("user_id")),
        "user_id", k = 20)
    }),

    // ---- WEIGHTED PageRank over the trade graph: edge weight = number
    // of lineitems linking the (customer, supplier) pair — rank flows
    // proportionally to trade volume; integer trajectory, same oracle
    // discipline as graph_pagerank
    "graph_pagerank_weighted" -> ((s, dir) => {
      val e = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy((col("o_custkey") * 2).as("a"),
          (col("l_suppkey") * 2 + 1).as("b"))
        .agg(count(lit(1)).as("w"))
      // same bipartite-distinct attestation as graph_pagerank: one row
      // per (a, b) from the groupBy, closure collision-free
      Graph.pageRankWeighted(e, iters = 3, dampingPct = 85,
        dedupSymmetric = false).transform(graft.Tables.ordered(col("node")))
    }),

    // ---- degree assortativity of the full trade graph: exact integer
    // moment sums; the correlation is the only float. The trade graph
    // is bipartite (customer-side keys even, supplier-side odd), so
    // this rides the specialized no-closure path; repartitioning the
    // raw pairs by `a` BEFORE the distinct lets the dedup, the degree
    // count, and the one degree join all satisfy their distributions
    // from that single exchange (HashPartitioning(a) clusters (a, b))
    // instead of paying a (a,b)-keyed dedup shuffle plus an a-keyed
    // join shuffle. Spec-asserted row-identical to the general
    // symmetric-closure path (GraphSpec).
    "graph_assortativity" -> ((s, dir) => {
      val e = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("a"),
          (col("l_suppkey") * 2 + 1).as("b"))
        .repartition(col("a"))
        .distinct()
        // pinned, not ReuseExchange: unpinned, the optimizer rewrites
        // the degree branch and the join branch into DIFFERENT
        // post-dedup plans (no common exchange subtree survives), and
        // the whole orders⋈lineitem dedup runs once per branch —
        // measured 5s steady / 38s cold vs ~1.1s pinned at sf0.1
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      Graph.assortativityBipartite(e)
    }),

    // ---- k-core peeling of the same bulk co-purchase graph: the dense
    // backbone that survives 5 rounds of "drop nodes with degree < 8".
    // Each round is one degree count + two semi-joins, O(1) lineage —
    // the oracle replays the identical rounds as unrolled CTEs.
    "graph_kcore" -> ((s, dir) => {
      Graph.kCore(bulkCoPurchaseEdges(s, dir), k = 8, rounds = 5,
          inputCanonical = true)
        .transform(graft.Tables.ordered(col("node")))
    }),

    // ---- blocked fuzzy record linkage: within-(brand,size) part-name
    // pairs at edit distance <= 8 — the equi-join on the blocking key
    // bounds the quadratic comparison to block-local pairs
    "dedup_fuzzy_pairs" -> ((s, dir) => {
      Dedup.editDistancePairs(t(s, dir, "part"),
          "p_partkey", "p_name", Seq("p_brand", "p_size"), maxDist = 8)
        .transform(graft.Tables.ordered(col("p_brand"), col("p_size"), col("k1"), col("k2")))
    })
  )

  // exact cosine top-5 for the vec_id%100 query set — the reference answer
  // for BOTH ann_cosine_topk and the full-probe IVF path
  // one oracle for BOTH substring-contamination kernels (contains join
  // and forced Aho-Corasick): the relation must be identical
  private val substringContamSql =
    """WITH snippets AS (
      |  SELECT doc_id AS eval_id, substr(text, 21, 40) AS eval_text
      |  FROM documents WHERE doc_id % 50 = 7 AND length(text) >= 80)
      |SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
      |  array_to_string(list_sort(list(CAST(eval_id AS VARCHAR))), ',') AS hit_ids
      |FROM documents d JOIN snippets s ON contains(d.text, s.eval_text)
      |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin

  private val bruteForceTopkSql =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
      |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id % 100 = 0),
      |p AS (SELECT qid, vec_id,
      |    round(list_sum(list_transform(list_zip(v, qv), x -> x[1] * x[2])) / (nrm * qn), 4) AS cos
      |  FROM n CROSS JOIN q WHERE vec_id <> qid),
      |r AS (SELECT qid, vec_id, cos,
      |    CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS INTEGER) AS rk FROM p)
      |SELECT qid, vec_id, cos, rk FROM r WHERE rk <= ${JoinBackAnnK} ORDER BY qid, rk""".stripMargin

  /** Standalone DuckDB twins for the three join-back ANN oracles — the
    * bench DENOMINATOR only, never a correctness gate (Verify keeps the
    * join-back SQL, which hash-checks the engine's actual emitted set).
    * A join-back oracle reads engine output, so `tools/bench_duckdb.py`
    * can't time it standalone and those three queries used to count in
    * the Spark numerator with no denominator credit. The fair twin is
    * the EXACT top-k search over the same query set (bruteForceTopkSql):
    * each of these queries answers "top-5 neighbors, exact scores" —
    * the approximate index is how this engine chooses to spend the
    * retrieve step, and an exact-rerank competitor (or DuckDB itself)
    * answers the same question with a brute-force scan. */
  val benchTwinSql: Map[String, String] = Map(
    "ann_lsh_topk" -> bruteForceTopkSql,
    "ann_ivf_topk" -> bruteForceTopkSql,
    "ann_pq_topk" -> bruteForceTopkSql)

  /** Join-back oracle for approximate-ANN queries: the candidate SET is
    * the retriever's (approximate, recall-spec-gated) output, but every
    * emitted value is exact — so DuckDB reads the engine's own verify
    * output for the (qid, vec_id) pairs and independently recomputes the
    * 4-dp cosine and the within-set rank. A wrong score, a wrong rank,
    * or a pair that isn't a real (query, corpus) id both fails the hash.
    * `__GRAFT_VERIFY_OUT__` is substituted by [[graft.Verify]] with the
    * absolute verify output dir at dump time.
    *
    * The final `WHERE rk <= k` matters even though ranks are recomputed
    * over the engine's own emitted set: without it, an engine that
    * dropped its k filter and emitted every candidate would still
    * hash-match (the oracle would happily re-rank the over-long set);
    * with it, any row past rank k exists on the Spark side only and
    * fails the row-count compare. */
  private def joinBackCosineSql(name: String, k: Int): String =
    s"""WITH got AS (SELECT qid, vec_id
       |  FROM read_parquet('__GRAFT_VERIFY_OUT__/$name/*.parquet')),
       |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
       |s AS (SELECT g.qid, g.vec_id,
       |    round(list_sum(list_transform(list_zip(d.v, q.v), x -> x[1] * x[2])) / (d.nrm * q.nrm), 4) AS cos
       |  FROM got g JOIN n d ON d.vec_id = g.vec_id JOIN n q ON q.vec_id = g.qid)
       |SELECT qid, vec_id, cos, rk FROM (
       |  SELECT qid, vec_id, cos,
       |    CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS INTEGER) AS rk
       |  FROM s) WHERE rk <= $k ORDER BY qid, rk""".stripMargin

  private val hardNegativesSql =
    s"""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |n AS (SELECT vec_id, label, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
      |q AS (SELECT vec_id AS qid, label AS qlabel, v AS qv, nrm AS qn FROM n WHERE vec_id % 100 = 0),
      |p AS (SELECT qid, qlabel, vec_id, label,
      |    round(list_sum(list_transform(list_zip(v, qv), x -> x[1] * x[2])) / (nrm * qn), 4) AS cos
      |  FROM n CROSS JOIN q WHERE vec_id <> qid AND label <> qlabel),
      |r AS (SELECT qid, qlabel, vec_id, label, cos,
      |    CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS INTEGER) AS rk FROM p)
      |SELECT qid, qlabel, vec_id, label, cos, rk FROM r WHERE rk <= ${JoinBackAnnK} ORDER BY qid, rk""".stripMargin

  // Mirrors retrieval_hybrid_rrf: the dense leg is bruteForceTopkSql at
  // k=20, the lexical leg the bm25 oracle with query-by-example terms,
  // fused with the identical two-term RRF expression
  private val hybridRrfSql =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
      |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id % 100 = 0),
      |p AS (SELECT qid, vec_id,
      |    round(list_sum(list_transform(list_zip(v, qv), x -> x[1] * x[2])) / (nrm * qn), 4) AS cos
      |  FROM n CROSS JOIN q WHERE vec_id <> qid),
      |dense AS (SELECT qid, vec_id AS doc_id, CAST(rk AS BIGINT) AS r_dense FROM (
      |    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk FROM p)
      |  WHERE rk <= 20),
      |terms AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
      |  FROM documents),
      |tfd AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
      |dl AS (SELECT doc_id, SUM(tf) AS dl FROM tfd GROUP BY 1),
      |df AS (SELECT term, COUNT(*) AS df FROM tfd GROUP BY 1),
      |stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
      |qt AS (SELECT DISTINCT q.qid, t.term FROM terms t JOIN q ON t.doc_id = q.qid),
      |scored AS (
      |  SELECT qt.qid, tfd.doc_id,
      |    round(ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
      |      * ((CAST(tf AS DOUBLE) * 2.2) /
      |         (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
      |           (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))),
      |      6)::DECIMAL(18,6) AS s
      |  FROM tfd JOIN qt USING (term) JOIN df USING (term)
      |       JOIN dl USING (doc_id) CROSS JOIN stats),
      |agg AS (SELECT qid, doc_id, CAST(SUM(s) AS DOUBLE) AS score FROM scored GROUP BY 1, 2),
      |lex AS (SELECT qid, doc_id, CAST(rn AS BIGINT) AS r_lex FROM (
      |    SELECT qid, doc_id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rn FROM agg)
      |  WHERE rn <= 20),
      |f AS (
      |  SELECT COALESCE(d.qid, l.qid) AS qid, COALESCE(d.doc_id, l.doc_id) AS doc_id,
      |    d.r_dense, l.r_lex,
      |    COALESCE(1.0 / (60.0 + CAST(d.r_dense AS DOUBLE)), 0.0)
      |      + COALESCE(1.0 / (60.0 + CAST(l.r_lex AS DOUBLE)), 0.0) AS rrf
      |  FROM dense d FULL OUTER JOIN lex l
      |    ON d.qid = l.qid AND d.doc_id = l.doc_id)
      |SELECT qid, rk, doc_id, r_dense, r_lex, rrf FROM (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id) AS BIGINT) AS rk
      |  FROM f)
      |WHERE rk <= 10 ORDER BY qid, rk""".stripMargin

  val oracle: Map[String, String] = Map(
    // Mirrors embed_pool_mean: per-dimension decimal sums, double divide
    "embed_pool_mean" ->
      """WITH e AS (SELECT vec_id % 50 AS grp, embedding FROM embeddings),
        |x AS (SELECT grp, unnest(range(1, len(embedding) + 1)) AS i,
        |             embedding FROM e),
        |v AS (SELECT grp, CAST(i - 1 AS BIGINT) AS pos,
        |        CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS x FROM x)
        |SELECT grp, pos, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(round(x, 7) AS DECIMAL(20,7))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS pooled
        |FROM v GROUP BY 1, 2 ORDER BY grp, pos""".stripMargin,

    "retrieval_hybrid_rrf" -> hybridRrfSql,

    "embed_hard_negatives" -> hardNegativesSql,

    "dedup_substring_contam" -> substringContamSql,
    // the automaton kernel must produce the identical relation
    "dedup_substring_contam_ac" -> substringContamSql,

    "dedup_contam_report" ->
      """WITH snippets AS (
        |  SELECT doc_id AS eval_id, substr(text, 21, 40) AS eval_text
        |  FROM documents WHERE doc_id % 50 = 7 AND length(text) >= 80),
        |hits AS (
        |  SELECT CAST(s.eval_id AS VARCHAR) AS eval_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(MIN(d.doc_id) AS BIGINT) AS doc_min,
        |    CAST(MAX(d.doc_id) AS BIGINT) AS doc_max
        |  FROM documents d JOIN snippets s ON contains(d.text, s.eval_text)
        |  GROUP BY 1)
        |SELECT CAST(s.eval_id AS VARCHAR) AS eval_id,
        |  COALESCE(h.n_docs, 0) AS n_docs, h.doc_min, h.doc_max
        |FROM snippets s LEFT JOIN hits h ON h.eval_id = CAST(s.eval_id AS VARCHAR)
        |ORDER BY 1""".stripMargin,

    // same ratio discipline as text_stats: single double divisions of
    // exact counts, no rounding — bit-identical across engines
    "text_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |  FROM documents),
        |tc AS (SELECT doc_id, w, COUNT(*) AS c FROM toks GROUP BY doc_id, w),
        |top AS (SELECT doc_id, MAX(c) AS top_c, CAST(SUM(c) AS BIGINT) AS n_tokens
        |  FROM tc GROUP BY doc_id),
        |ws AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a FROM documents),
        |g2 AS (SELECT doc_id, unnest(list_transform(range(1, len(a)),
        |    i -> a[i] || ' ' || a[i+1])) AS g FROM ws),
        |g3 AS (SELECT doc_id, unnest(list_transform(range(1, len(a) - 1),
        |    i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS g FROM ws),
        |c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY doc_id, g),
        |d2 AS (SELECT doc_id, 1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS BIGINT)
        |  AS dup_bigram_frac FROM c2 GROUP BY doc_id),
        |c3 AS (SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY doc_id, g),
        |d3 AS (SELECT doc_id, 1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS BIGINT)
        |  AS dup_trigram_frac FROM c3 GROUP BY doc_id)
        |SELECT top.doc_id, n_tokens,
        |  CAST(top_c AS DOUBLE) / n_tokens AS top_token_frac,
        |  COALESCE(dup_bigram_frac, 0.0) AS dup_bigram_frac,
        |  COALESCE(dup_trigram_frac, 0.0) AS dup_trigram_frac
        |FROM top LEFT JOIN d2 ON top.doc_id = d2.doc_id
        |LEFT JOIN d3 ON top.doc_id = d3.doc_id
        |ORDER BY top.doc_id""".stripMargin,

    "dedup_fuzzy_pairs" ->
      """SELECT a.p_brand, a.p_size, a.p_partkey AS k1, b.p_partkey AS k2,
        |CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
        |  AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= 8
        |ORDER BY a.p_brand, a.p_size, k1, k2""".stripMargin,
    "text_stats" ->
      """SELECT doc_id,
        |CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER) AS n_tokens,
        |CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INTEGER) AS n_subtokens,
        |CAST(length(text) AS INTEGER) AS n_chars_m,
        |CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
        |CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |  t -> t IN ('the','a','of','and','to','in'))) AS DOUBLE)
        |  / len(regexp_split_to_array(trim(text), '\s+')) AS stop_ratio,
        |CASE
        |  WHEN len(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t IN ('the','a','of','and','is')))
        |    >= len(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t IN ('el','la','de','los','es')))
        |   AND len(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t IN ('the','a','of','and','is')))
        |    >= len(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t IN ('der','die','das','und','ist')))
        |  THEN 'en'
        |  WHEN len(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t IN ('el','la','de','los','es')))
        |    >= len(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t IN ('der','die','das','und','ist')))
        |  THEN 'es' ELSE 'de' END AS lang_guess,
        |md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    "dedup_exact" ->
      s"""WITH $plantedSql
         |SELECT md5(text) AS h, min(doc_id) AS keep_id, COUNT(*) AS n
         |FROM docs GROUP BY md5(text) HAVING COUNT(*) > 1 ORDER BY h""".stripMargin,

    "dedup_apply_exact" ->
      s"""WITH $plantedSql
         |SELECT doc_id FROM (
         |  SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |  FROM docs)
         |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""WITH $jaccardPairsCtesSql
         |SELECT i, j, jaccard FROM jp ORDER BY i, j""".stripMargin,

    "dedup_paragraph" ->
      s"""WITH $plantedSql,
         |w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM docs),
         |segs AS (
         |  SELECT doc_id, unnest(list_transform(range(0, (len(ws) + 9) // 10),
         |    i -> struct_pack(seg_idx := i,
         |                     seg := array_to_string(ws[i*10+1:(i+1)*10], ' ')))) AS s
         |  FROM w),
         |flat AS (SELECT doc_id, s['seg_idx'] AS seg_idx, s['seg'] AS seg FROM segs),
         |ranked AS (
         |  SELECT doc_id, seg_idx, seg,
         |    row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
         |  FROM flat)
         |SELECT doc_id, COUNT(*) AS n_segs,
         |  COUNT(*) FILTER (WHERE rn = 1) AS n_kept,
         |  COALESCE(string_agg(seg, ' ' ORDER BY seg_idx) FILTER (WHERE rn = 1), '') AS text
         |FROM ranked GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "dedup_containment" ->
      s"""WITH $plantedSql,
         |$shinglesSql,
         |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh_idx GROUP BY doc_id),
         |cnt AS (
         |  SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS c
         |  FROM sh_idx a JOIN sh_idx b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |dirs AS (
         |  SELECT cnt.i AS i, cnt.j AS j, CAST(c AS DOUBLE) / si.sz AS containment
         |  FROM cnt JOIN sizes si ON cnt.i = si.doc_id
         |  UNION ALL
         |  SELECT cnt.j AS i, cnt.i AS j, CAST(c AS DOUBLE) / sj.sz AS containment
         |  FROM cnt JOIN sizes sj ON cnt.j = sj.doc_id)
         |SELECT i, j, containment FROM dirs
         |WHERE containment >= 0.8 ORDER BY i, j""".stripMargin,

    "dedup_minhash_lsh" -> {
      val bandSql = (0 until 4).map { bnd =>
        val cols = (0 until 4).map(r => s"s${bnd * 4 + r}").mkString(", ")
        s"SELECT doc_id, $bnd AS band, md5(concat_ws('-', $cols)) AS bh FROM sigs"
      }.mkString("\n  UNION ALL ")
      val eqSum = (0 until 16)
        .map(j => s"CASE WHEN sa.s$j = sb.s$j THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH $plantedSql,
         |$shinglesSql,
         |$minhashSigSql,
         |bands AS (
         |  $bandSql),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS i, y.doc_id AS j
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id)
         |SELECT i, j, CAST($eqSum AS DOUBLE) / 16.0 AS est_jaccard
         |FROM cand JOIN sigs sa ON cand.i = sa.doc_id
         |JOIN sigs sb ON cand.j = sb.doc_id
         |WHERE CAST($eqSum AS DOUBLE) / 16.0 >= 0.5
         |ORDER BY i, j""".stripMargin
    },

    // Shares jp verbatim with the jaccard/cluster oracles and rebuilds
    // the minhash leg on the SAME sh_idx, so the two detectors can never
    // drift apart between this oracle and their own
    "dedup_detector_agreement" -> {
      val bandSql = (0 until 4).map { bnd =>
        val cols = (0 until 4).map(r => s"s${bnd * 4 + r}").mkString(", ")
        s"SELECT doc_id, $bnd AS band, md5(concat_ws('-', $cols)) AS bh FROM sigs"
      }.mkString("\n  UNION ALL ")
      val eqSum = (0 until 16)
        .map(j => s"CASE WHEN sa.s$j = sb.s$j THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH $jaccardPairsCtesSql,
         |$minhashSigSql,
         |bands AS (
         |  $bandSql),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS i, y.doc_id AS j
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
         |mh AS (
         |  SELECT i, j FROM cand
         |  JOIN sigs sa ON cand.i = sa.doc_id
         |  JOIN sigs sb ON cand.j = sb.doc_id
         |  WHERE CAST($eqSum AS DOUBLE) / 16.0 >= 0.5),
         |merged AS (
         |  SELECT COALESCE(a.i, b.i) AS pi, COALESCE(a.j, b.j) AS pj,
         |    a.i IS NOT NULL AS in_j, b.i IS NOT NULL AS in_m
         |  FROM jp a FULL OUTER JOIN mh b ON a.i = b.i AND a.j = b.j)
         |SELECT CASE WHEN in_j AND in_m THEN 'both'
         |            WHEN in_j THEN 'jaccard_only'
         |            ELSE 'minhash_only' END AS verdict,
         |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(SUM(pi + pj) AS BIGINT) AS id_sum
         |FROM merged GROUP BY 1 ORDER BY verdict""".stripMargin
    },

    "dedup_cdc_chunks" -> {
      // the rolling k-gram hash h(i) replayed as plain arithmetic: the
      // same left fold (h*257 + char) % 1000000007 the CdcBoundaries
      // expression runs, unrolled for k = 8 (fixture text is ASCII, so
      // ascii() == the JVM char code)
      val hExpr = (1 until 8).foldLeft("CAST(ascii(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT)")(
        (acc, j) => s"(($acc * 257 + ascii(substr(text, CAST(i + $j AS INTEGER), 1))) % 1000000007)")
      s"""WITH $plantedSql,
         |pos AS (SELECT doc_id, text, len(text) AS n FROM docs),
         |bnds AS (
         |  SELECT doc_id, text,
         |    list_sort(list_distinct(list_concat(
         |      list_filter(list_transform(range(1, n - 8 + 2),
         |        i -> CASE WHEN ($hExpr) % 64 = 0 THEN i + 7 ELSE NULL END),
         |        x -> x IS NOT NULL),
         |      [n]))) AS ends
         |  FROM pos WHERE n >= 1),
         |ch AS (
         |  SELECT doc_id,
         |    md5(substr(text, CAST(c['s'] AS INTEGER), CAST(c['e'] - c['s'] + 1 AS INTEGER))) AS chash,
         |    c['e'] - c['s'] + 1 AS clen
         |  FROM (
         |    SELECT doc_id, text, unnest(list_transform(range(1, len(ends) + 1),
         |      j -> struct_pack(
         |        s := CASE WHEN j = 1 THEN CAST(1 AS BIGINT)
         |             ELSE ends[CAST(j - 1 AS INTEGER)] + 1 END,
         |        e := ends[CAST(j AS INTEGER)]))) AS c
         |    FROM bnds))
         |SELECT chash, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs,
         |  CAST(MAX(clen) AS BIGINT) AS clen
         |FROM ch GROUP BY chash HAVING COUNT(*) > 1 ORDER BY chash""".stripMargin
    },

    "dedup_minhash_incremental" -> {
      def sigChain(src: String, p: String) = {
        val mins = Dedup.minhashParams.zipWithIndex.map { case ((a, b), j) =>
          s"CAST(min((h * $a + $b) % ${Dedup.MinhashP}) AS BIGINT) AS s$j"
        }.mkString(",\n    ")
        s"""${p}sh AS (
           |  SELECT DISTINCT doc_id, sh FROM (
           |    SELECT doc_id, unnest(list_transform(range(1, len(ws) - 1),
           |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
           |    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM $src))),
           |${p}hashes AS (SELECT doc_id, ${hSql.format("sh")} AS h FROM ${p}sh),
           |${p}sigs AS (SELECT doc_id,
           |    $mins
           |  FROM ${p}hashes GROUP BY doc_id)""".stripMargin
      }
      def bandsFor(p: String) = (0 until 4).map { bnd =>
        val cols = (0 until 4).map(r => s"s${bnd * 4 + r}").mkString(", ")
        s"SELECT doc_id, $bnd AS band, md5(concat_ws('-', $cols)) AS bh FROM ${p}sigs"
      }.mkString("\n  UNION ALL ")
      val eqSum = (0 until 16)
        .map(j => s"CASE WHEN sa.s$j = sb.s$j THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH bse AS (SELECT doc_id, text FROM documents),
         |btc AS (
         |  SELECT doc_id + 200000 AS doc_id, text FROM documents WHERE doc_id % 25 = 0
         |  UNION ALL
         |  SELECT doc_id + 100000 AS doc_id, text || ' extra token tail' AS text
         |  FROM documents WHERE doc_id % 25 = 13),
         |${sigChain("bse", "b")},
         |${sigChain("btc", "t")},
         |bbands AS (
         |  ${bandsFor("b")}),
         |tbands AS (
         |  ${bandsFor("t")}),
         |cand AS (
         |  SELECT DISTINCT t.doc_id AS i, b.doc_id AS j
         |  FROM tbands t JOIN bbands b ON t.band = b.band AND t.bh = b.bh)
         |SELECT i, j, CAST($eqSum AS DOUBLE) / 16.0 AS est_jaccard
         |FROM cand JOIN tsigs sa ON cand.i = sa.doc_id
         |JOIN bsigs sb ON cand.j = sb.doc_id
         |WHERE CAST($eqSum AS DOUBLE) / 16.0 >= 0.5
         |ORDER BY i, j""".stripMargin
    },

    "dedup_minhash_calibration" -> {
      val bandSql = (0 until 4).map { bnd =>
        val cols = (0 until 4).map(r => s"s${bnd * 4 + r}").mkString(", ")
        s"SELECT doc_id, $bnd AS band, md5(concat_ws('-', $cols)) AS bh FROM sigs"
      }.mkString("\n  UNION ALL ")
      val eqSum = (0 until 16)
        .map(j => s"CASE WHEN sa.s$j = sb.s$j THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH $plantedSql,
         |$shinglesSql,
         |$minhashSigSql,
         |bands AS (
         |  $bandSql),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS i, y.doc_id AS j
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
         |est AS (
         |  SELECT i, j, CAST($eqSum AS DOUBLE) / 16.0 AS est_jaccard
         |  FROM cand JOIN sigs sa ON cand.i = sa.doc_id
         |  JOIN sigs sb ON cand.j = sb.doc_id
         |  WHERE CAST($eqSum AS DOUBLE) / 16.0 >= 0.5),
         |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh_idx GROUP BY 1),
         |inter AS (
         |  SELECT e.i, e.j, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM est e JOIN sh_idx a ON a.doc_id = e.i
         |  JOIN sh_idx b ON b.doc_id = e.j AND b.sh = a.sh
         |  GROUP BY e.i, e.j),
         |tj AS (
         |  SELECT e.i, e.j, e.est_jaccard,
         |    CAST(COALESCE(c, 0) AS DOUBLE) / (si.sz + sj.sz - COALESCE(c, 0)) AS true_jaccard
         |  FROM est e LEFT JOIN inter USING (i, j)
         |  JOIN sizes si ON e.i = si.doc_id JOIN sizes sj ON e.j = sj.doc_id)
         |SELECT i, j, est_jaccard, true_jaccard,
         |  round(abs(est_jaccard - true_jaccard), 6) AS abs_err
         |FROM tj ORDER BY i, j""".stripMargin
    },

    "dedup_simhash" ->
      s"""WITH $plantedSql,
         |words AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w FROM docs),
         |hw AS (SELECT doc_id, ${hSql.format("w")} AS h FROM words),
         |bits AS (
         |  SELECT doc_id, i,
         |    CASE WHEN SUM(CASE WHEN ((h >> i) & 1) = 1 THEN 1 ELSE -1 END) > 0
         |         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS bit
         |  FROM hw CROSS JOIN range(0, 32) r(i) GROUP BY doc_id, i),
         |sh AS (SELECT doc_id, CAST(SUM(bit * (CAST(1 AS BIGINT) << i)) AS BIGINT) AS simhash
         |       FROM bits GROUP BY doc_id)
         |SELECT a.doc_id AS i, b.doc_id AS j,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hd
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3 ORDER BY i, j""".stripMargin,

    "ann_cosine_topk" -> bruteForceTopkSql,

    // approximate retrievers: join-back oracles — set approximate,
    // every emitted score/rank independently recomputed by DuckDB
    "ann_lsh_topk" -> joinBackCosineSql("ann_lsh_topk", JoinBackAnnK),
    "ann_ivf_topk" -> joinBackCosineSql("ann_ivf_topk", JoinBackAnnK),
    "ann_pq_topk" -> joinBackCosineSql("ann_pq_topk", JoinBackAnnK),

    "embed_mmr_select" -> {
      // one CTE per greedy step: m_t = per-candidate max similarity to
      // the t-1 already-picked vectors, p_t = the argmax MMR pick
      val k = 5
      val steps = (2 to k).map { t =>
        val sel = (1 until t).map(i => s"SELECT vec_id FROM p$i")
          .mkString(" UNION ALL ")
        s"""sel${t - 1} AS ($sel),
           |m$t AS (SELECT c.vec_id,
           |    MAX(round(list_sum(list_transform(list_zip(c.v, s.v), x -> x[1] * x[2]))
           |      / (c.nrm * s.nrm), 4)) AS ms
           |  FROM rel c, rel s
           |  WHERE s.vec_id IN (SELECT vec_id FROM sel${t - 1})
           |    AND c.vec_id NOT IN (SELECT vec_id FROM sel${t - 1})
           |  GROUP BY c.vec_id),
           |p$t AS (SELECT c.vec_id, c.rel, c.v, c.nrm,
           |    CAST(0.7 AS DOUBLE) * c.rel - CAST(0.3 AS DOUBLE) * m$t.ms AS mmr
           |  FROM rel c JOIN m$t ON c.vec_id = m$t.vec_id
           |  ORDER BY mmr DESC, c.vec_id LIMIT 1)""".stripMargin
      }
      val out = (1 to k)
        .map(t => s"SELECT $t AS rk, vec_id, rel, mmr FROM p$t")
        .mkString("\n  UNION ALL ")
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |n AS (SELECT vec_id, v,
         |  sqrt(list_sum(list_transform(list_zip(v, v), x -> x[1] * x[2]))) AS nrm FROM e),
         |q AS (SELECT v AS qv, nrm AS qn FROM n WHERE vec_id = 0),
         |rel AS (SELECT n.vec_id, n.v, n.nrm,
         |  round(list_sum(list_transform(list_zip(n.v, q.qv), x -> x[1] * x[2]))
         |    / (n.nrm * q.qn), 4) AS rel
         |  FROM n CROSS JOIN q WHERE n.vec_id <> 0),
         |p1 AS (SELECT vec_id, rel, v, nrm, rel AS mmr FROM rel
         |  ORDER BY rel DESC, vec_id LIMIT 1),
         |${steps.mkString(",\n")}
         |SELECT CAST(rk AS INTEGER) AS rk, vec_id, rel, mmr FROM (
         |  $out)
         |ORDER BY rk""".stripMargin
    },

    "ann_mips_topk" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 100 = 0),
        |p AS (SELECT qid, vec_id,
        |    round(list_sum(list_transform(list_zip(v, qv), x -> x[1] * x[2])), 4) AS ip
        |  FROM e CROSS JOIN q WHERE vec_id <> qid),
        |r AS (SELECT qid, vec_id, ip,
        |    CAST(row_number() OVER (PARTITION BY qid ORDER BY ip DESC, vec_id) AS INTEGER) AS rk FROM p)
        |SELECT qid, vec_id, ip, rk FROM r WHERE rk <= ${JoinBackAnnK} ORDER BY qid, rk""".stripMargin,

    // Mirrors Quantize.pqTopKFixed / pqAdc: m=8 subspaces of 8 dims,
    // cbSize=16 codewords = subvectors of normalized vectors vec_id<16.
    // Encode picks argmin_j ||cw_j||^2 - 2 sv·cw_j (tie by code, as the
    // Spark min-struct does); ADC partials round to DECIMAL(12,9) before
    // the per-pair sum so the 4-dp surface is order-independent — the
    // exact discipline of the Spark side.
    "ann_pq_adc" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id,
        |        list_transform(v, x -> x / greatest(sqrt(list_sum(list_transform(v, y -> y * y))), 1e-12)) AS v
        |      FROM e),
        |cb AS (SELECT s.s AS sub, n.vec_id AS code,
        |         list_slice(n.v, s.s * 8 + 1, s.s * 8 + 8) AS cw
        |       FROM n, range(8) s(s) WHERE n.vec_id < 16),
        |cb2 AS (SELECT sub, code, cw,
        |          list_sum(list_transform(cw, x -> x * x)) AS cw2 FROM cb),
        |cs AS (SELECT n.vec_id, s.s AS sub,
        |         list_slice(n.v, s.s * 8 + 1, s.s * 8 + 8) AS sv
        |       FROM n, range(8) s(s)),
        |enc AS (SELECT vec_id, sub, code FROM (
        |          SELECT cs.vec_id, cs.sub, cb2.code,
        |            row_number() OVER (PARTITION BY cs.vec_id, cs.sub
        |              ORDER BY cb2.cw2 - 2 * list_sum(list_transform(list_zip(cs.sv, cb2.cw), x -> x[1] * x[2])),
        |                cb2.code) AS rn
        |          FROM cs JOIN cb2 USING (sub)) WHERE rn = 1),
        |qt AS (SELECT q.vec_id AS qid, cb2.sub, cb2.code,
        |         CAST(round(list_sum(list_transform(list_zip(list_slice(q.v, cb2.sub * 8 + 1, cb2.sub * 8 + 8), cb2.cw), x -> x[1] * x[2])), 9) AS DECIMAL(12,9)) AS pdot
        |       FROM n q CROSS JOIN cb2 WHERE q.vec_id % 100 = 0),
        |scored AS (SELECT qt.qid, enc.vec_id,
        |             round(CAST(sum(qt.pdot) AS DOUBLE), 4) AS qcos
        |           FROM enc JOIN qt ON enc.sub = qt.sub AND enc.code = qt.code
        |           WHERE enc.vec_id <> qt.qid
        |           GROUP BY qt.qid, enc.vec_id),
        |r AS (SELECT qid, vec_id, qcos,
        |        row_number() OVER (PARTITION BY qid ORDER BY qcos DESC, vec_id) AS rk
        |      FROM scored)
        |SELECT qid, vec_id, qcos, rk FROM r WHERE rk <= ${JoinBackAnnK} ORDER BY qid, rk""".stripMargin,

    // IVF at full probe is exact: the SAME brute-force reference answers
    // for it (see the ann_ivf_exact query comment)
    "ann_ivf_exact" -> bruteForceTopkSql,

    // LSH at zero bits is exact too (single bucket = all candidates)
    "ann_lsh_exact" -> bruteForceTopkSql,

    // Mirrors Quantize.int8 + IntDotProduct: absmax scaling, round-half-
    // away-from-zero to int8, exact BIGINT dot products. No float
    // tolerance anywhere — double mul/div and round are IEEE-identical
    // across engines, and the dot product is integer arithmetic.
    "ann_int8_topk" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |a AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS amax FROM e),
        |qt AS (SELECT vec_id,
        |    CASE WHEN amax = 0 THEN list_transform(v, x -> 0)
        |         ELSE list_transform(v, x -> CAST(round(x * 127.0 / amax) AS INTEGER)) END AS q
        |  FROM a),
        |n AS (SELECT vec_id, q,
        |    sqrt(CAST(list_sum(list_transform(q, x -> CAST(x AS BIGINT) * x)) AS DOUBLE)) AS nrm
        |  FROM qt),
        |qs AS (SELECT vec_id AS qid, q AS qq, nrm AS qn FROM n WHERE vec_id % 100 = 0),
        |p AS (SELECT qid, vec_id,
        |    CAST(list_sum(list_transform(list_zip(q, qq), x -> CAST(x[1] AS BIGINT) * x[2])) AS BIGINT) AS int_dot,
        |    nrm, qn
        |  FROM n CROSS JOIN qs WHERE vec_id <> qid),
        |r AS (SELECT qid, vec_id, int_dot,
        |    round(CAST(int_dot AS DOUBLE) / (nrm * qn), 4) AS qcos FROM p),
        |rk AS (SELECT qid, vec_id, int_dot, qcos,
        |    CAST(row_number() OVER (PARTITION BY qid ORDER BY qcos DESC, vec_id) AS INTEGER) AS rk FROM r)
        |SELECT qid, vec_id, int_dot, qcos, rk FROM rk WHERE rk <= ${JoinBackAnnK} ORDER BY qid, rk""".stripMargin,

    "embed_neardup" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e)
        |SELECT a.vec_id AS i, b.vec_id AS j,
        |  round(list_sum(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2])) / (a.nrm * b.nrm), 4) AS cos
        |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
        |ORDER BY cos DESC, i, j LIMIT 20""".stripMargin,

    "q41_topk_agg" ->
      """SELECT c_mktsegment,
        |array_to_string(list(c_custkey ORDER BY c_acctbal DESC, c_custkey DESC)[1:5], ',') AS top_ids_csv
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // Mirrors TextOps.bigramNll: same add-one smoothing, each nll term
    // rounded to 6 dp and summed as DECIMAL(18,6) so the mean is
    // summation-order-independent in both engines.
    "text_bigram_nll" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |bi AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
        |         unnest(list_transform(range(1, len(ws)), i -> ws[i+1])) AS w2
        |  FROM toks WHERE len(ws) >= 2),
        |uni AS (
        |  SELECT unnest(ws) AS w FROM toks),
        |c1t AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c1 FROM uni GROUP BY w),
        |bigt AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bi GROUP BY w1, w2),
        |v AS (SELECT CAST(COUNT(*) AS BIGINT) AS vocab FROM c1t),
        |scored AS (
        |  SELECT bi.doc_id,
        |    round(-ln((c12 + 1.0) / CAST(c1 + vocab AS DOUBLE)), 6)::DECIMAL(18,6) AS nll
        |  FROM bi JOIN bigt USING (w1, w2) JOIN c1t ON bi.w1 = c1t.w CROSS JOIN v)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(nll) AS DOUBLE) AS sum_nll
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Mirrors TextOps.dsirWeights: one stats table carries both models'
    // counts; per-occurrence log-ratio rounded to 6 dp, exact decimal sum
    "sample_dsir_weights" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws,
        |    CASE WHEN source IN ('src0','src1','src2','src3') THEN 1 ELSE 0 END AS tgt
        |  FROM documents),
        |bi AS (
        |  SELECT doc_id, tgt,
        |    unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
        |    unnest(list_transform(range(1, len(ws)), i -> ws[i+1])) AS w2
        |  FROM toks WHERE len(ws) >= 2),
        |stats AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_raw,
        |            CAST(SUM(tgt) AS BIGINT) AS c_tgt FROM bi GROUP BY w1, w2),
        |tot AS (SELECT CAST(SUM(c_raw) AS BIGINT) AS n_raw,
        |          CAST(SUM(c_tgt) AS BIGINT) AS n_tgt,
        |          CAST(COUNT(*) AS BIGINT) AS vocab FROM stats),
        |scored AS (
        |  SELECT bi.doc_id, bi.tgt,
        |    round(ln((c_tgt + 1.0) / CAST(n_tgt + vocab AS DOUBLE))
        |        - ln((c_raw + 1.0) / CAST(n_raw + vocab AS DOUBLE)), 6)::DECIMAL(18,6) AS lw
        |  FROM bi JOIN stats USING (w1, w2) CROSS JOIN tot)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(lw) AS DOUBLE) AS log_weight, CAST(MAX(tgt) AS INT) AS is_target
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "sample_gumbel_topk" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws,
        |    CASE WHEN source IN ('src0','src1','src2','src3') THEN 1 ELSE 0 END AS tgt
        |  FROM documents),
        |bi AS (
        |  SELECT doc_id, tgt,
        |    unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
        |    unnest(list_transform(range(1, len(ws)), i -> ws[i+1])) AS w2
        |  FROM toks WHERE len(ws) >= 2),
        |stats AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_raw,
        |            CAST(SUM(tgt) AS BIGINT) AS c_tgt FROM bi GROUP BY w1, w2),
        |tot AS (SELECT CAST(SUM(c_raw) AS BIGINT) AS n_raw,
        |          CAST(SUM(c_tgt) AS BIGINT) AS n_tgt,
        |          CAST(COUNT(*) AS BIGINT) AS vocab FROM stats),
        |scored AS (
        |  SELECT bi.doc_id,
        |    round(ln((c_tgt + 1.0) / CAST(n_tgt + vocab AS DOUBLE))
        |        - ln((c_raw + 1.0) / CAST(n_raw + vocab AS DOUBLE)), 6)::DECIMAL(18,6) AS lw
        |  FROM bi JOIN stats USING (w1, w2) CROSS JOIN tot),
        |dw AS (SELECT doc_id, CAST(SUM(lw) AS DOUBLE) AS log_weight
        |       FROM scored GROUP BY doc_id)
        |SELECT doc_id, log_weight,
        |  round(log_weight + -ln(-ln(
        |    (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
        |      / 4294967296.0)), 6) AS gumbel_key
        |FROM dw ORDER BY gumbel_key DESC, doc_id LIMIT 100""".stripMargin,

    // Exact columns verified against DuckDB; the within-tol flags are
    // Spark-side assertions the oracle expects to hold (see the query
    // comment — sketch estimates are deterministic, bounds published).
    "approx_distinct" ->
      """SELECT COUNT(*) AS n_rows,
        |COUNT(DISTINCT l_partkey) AS exact_parts,
        |COUNT(DISTINCT l_orderkey) AS exact_orders,
        |TRUE AS parts_within_tol, TRUE AS orders_within_tol
        |FROM lineitem""".stripMargin,

    // Replays Winnow's Rabin-Karp rolling hash (base 257 mod 1e9+7,
    // k=8 char-grams) and the per-window minimum selection in DuckDB
    // list lambdas. min_fp = global min of all k-gram hashes (the global
    // min is always a selected fingerprint); n_fp = distinct window
    // minima. Safe because fixture text is pure ASCII (ord == UTF-16
    // code unit) — see Winnow.scala for the Spark-side Expression.
    "text_winnow" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    CASE WHEN len(text) < 8 THEN [] ELSE
        |      list_transform(range(1, len(text)-8+2), i ->
        |        list_reduce(list_transform(range(i, i+8), j -> ord(text[j])::BIGINT),
        |                    (acc, c) -> (acc*257 + c) % 1000000007))
        |    END AS hs
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, hs,
        |    CASE WHEN len(hs) = 0 THEN []
        |         WHEN len(hs) <= 6 THEN [list_min(hs)]
        |         ELSE list_distinct(list_transform(range(1, len(hs)-6+2), w ->
        |                list_min(hs[w:w+5])))
        |    END AS minima
        |  FROM h)
        |SELECT doc_id, len(minima) AS n_fp, list_min(hs) AS min_fp
        |FROM m ORDER BY doc_id""".stripMargin,

    "dedup_winnow_pairs" ->
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 300000, text || ' !!' FROM documents WHERE doc_id % 25 = 7),
        |h AS (
        |  SELECT doc_id,
        |    CASE WHEN len(text) < 8 THEN [] ELSE
        |      list_transform(range(1, len(text)-8+2), i ->
        |        list_reduce(list_transform(range(i, i+8), j -> ord(text[j])::BIGINT),
        |                    (acc, c) -> (acc*257 + c) % 1000000007))
        |    END AS hs
        |  FROM docs),
        |m AS (
        |  SELECT doc_id, hs,
        |    CASE WHEN len(hs) = 0 THEN []
        |         WHEN len(hs) <= 6 THEN [list_min(hs)]
        |         ELSE list_distinct(list_transform(range(1, len(hs)-6+2), w ->
        |                list_min(hs[w:w+5])))
        |    END AS minima
        |  FROM h),
        |fps AS (SELECT doc_id, unnest(minima) AS fp FROM m),
        |posting AS (
        |  SELECT fp, list_sort(list(doc_id)) AS ds FROM fps GROUP BY fp
        |  HAVING COUNT(*) BETWEEN 2 AND 8),
        |cand AS (
        |  SELECT unnest(flatten(list_transform(range(1, len(ds)), x ->
        |    list_transform(ds[x+1:], y -> struct_pack(a := ds[x], b := y))))) AS p
        |  FROM posting)
        |SELECT p.a AS i, p.b AS j, CAST(COUNT(*) AS BIGINT) AS n_shared
        |FROM cand GROUP BY 1, 2 HAVING COUNT(*) >= 10 ORDER BY i, j""".stripMargin,

    "text_length_histogram" ->
      """SELECT source, CAST(n_tok // 32 AS BIGINT) AS bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  MIN(n_tok) AS min_tok, MAX(n_tok) AS max_tok
        |FROM (SELECT source,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER) AS n_tok
        |  FROM documents)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "corpus_source_overlap" ->
      """WITH sh_raw AS (
        |  SELECT DISTINCT source, sh FROM (
        |    SELECT source, unnest(list_transform(range(1, len(ws) - 1),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
        |    FROM (SELECT source, regexp_split_to_array(trim(text), '\s+') AS ws
        |          FROM documents))),
        |sizes AS (SELECT source, COUNT(*) AS sz FROM sh_raw GROUP BY 1),
        |posting AS (SELECT sh, list_sort(list(source)) AS ss
        |            FROM sh_raw GROUP BY sh HAVING COUNT(*) >= 2),
        |cand AS (SELECT unnest(flatten(list_transform(range(1, len(ss)), x ->
        |    list_transform(ss[x+1:], y -> struct_pack(a := ss[x], b := y))))) AS p
        |  FROM posting),
        |pairs AS (SELECT p.a AS src_a, p.b AS src_b, CAST(COUNT(*) AS BIGINT) AS n_shared
        |          FROM cand GROUP BY 1, 2)
        |SELECT src_a, src_b, n_shared, sa.sz AS sz_a, sb.sz AS sz_b,
        |  CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared) AS jaccard
        |FROM pairs JOIN sizes sa ON src_a = sa.source
        |           JOIN sizes sb ON src_b = sb.source
        |ORDER BY src_a, src_b""".stripMargin,

    "text_ngram_novelty" ->
      s"""WITH docs AS (SELECT doc_id, text FROM documents),
         |$shinglesSql,
         |fo AS (SELECT sh, MIN(doc_id) AS first_doc FROM sh_idx GROUP BY sh)
         |SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
         |  CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |  CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
         |    / COUNT(*) AS novelty
         |FROM sh_idx s JOIN fo f USING (sh)
         |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,

    // BM25: one ln + one IEEE op chain per (doc, query-term), rounded to
    // 6 dp and summed as DECIMAL(18,6) — the bigram-NLL determinism
    // contract. Expression association mirrors the Spark side exactly.
    "text_bm25_topk" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
        |dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
        |qt AS (SELECT CASE WHEN rn <= 3 THEN 1 WHEN rn <= 6 THEN 2 ELSE 3 END AS qid, term
        |       FROM (SELECT term, row_number() OVER (ORDER BY df DESC, term) AS rn FROM df)
        |       WHERE rn <= 9),
        |scored AS (
        |  SELECT qt.qid, tf.doc_id,
        |    round(ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
        |      * ((CAST(tf AS DOUBLE) * 2.2) /
        |         (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
        |           (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))),
        |      6)::DECIMAL(18,6) AS s
        |  FROM tf JOIN qt USING (term) JOIN df USING (term)
        |       JOIN dl USING (doc_id) CROSS JOIN stats),
        |agg AS (SELECT qid, doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit,
        |               CAST(SUM(s) AS DOUBLE) AS score
        |        FROM scored GROUP BY 1, 2)
        |SELECT CAST(qid AS BIGINT) AS qid, CAST(rn AS BIGINT) AS rn, doc_id, n_hit, score
        |FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rn
        |      FROM agg)
        |WHERE rn <= 10 ORDER BY qid, rn""".stripMargin,

    "text_tfidf_top" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term),
        |df AS (SELECT term, COUNT(*) AS df
        |       FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY term),
        |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, tf.term, tf, df,
        |    round(tf * ln(1 + CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS tfidf
        |  FROM tf JOIN df USING (term) CROSS JOIN n)
        |SELECT doc_id, term, tf, df, tfidf FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
        |  FROM scored)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "text_zipf_slope" ->
      """WITH cnt AS (
        |  SELECT w, COUNT(*) AS c FROM (
        |    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM documents)
        |  GROUP BY w),
        |topt AS (SELECT w, c FROM cnt ORDER BY c DESC, w LIMIT 100),
        |rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, w) AS r FROM topt),
        |t AS (SELECT
        |  CAST(round(ln(CAST(r AS DOUBLE)), 9) AS DECIMAL(20,9)) AS xd,
        |  CAST(round(ln(CAST(c AS DOUBLE)), 9) AS DECIMAL(20,9)) AS yd,
        |  CAST(round(ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE)), 9) AS DECIMAL(20,9)) AS xxd,
        |  CAST(round(ln(CAST(r AS DOUBLE)) * ln(CAST(c AS DOUBLE)), 9) AS DECIMAL(20,9)) AS xyd
        |  FROM rk),
        |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
        |  CAST(SUM(xd) AS DOUBLE) AS sx, CAST(SUM(yd) AS DOUBLE) AS sy,
        |  CAST(SUM(xxd) AS DOUBLE) AS sxx, CAST(SUM(xyd) AS DOUBLE) AS sxy FROM t)
        |SELECT n_terms,
        |  round((n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx), 6) AS slope,
        |  round((sy - ((n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx)) * sx) / n_terms, 6) AS intercept
        |FROM s""".stripMargin,

    "text_entropy" ->
      """WITH chars AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(text) + 1),
        |    i -> substr(text, CAST(i AS INTEGER), 1))) AS ch
        |  FROM documents),
        |cnt AS (SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY 1, 2),
        |tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY 1)
        |SELECT c2.doc_id, t.n AS n_chars, CAST(COUNT(*) AS BIGINT) AS n_syms,
        |  CAST(SUM(CAST(round(-(CAST(c AS DOUBLE) / n) * log2(CAST(c AS DOUBLE) / n), 9)
        |    AS DECIMAL(20,9))) AS DOUBLE) AS entropy
        |FROM cnt c2 JOIN tot t ON c2.doc_id = t.doc_id
        |GROUP BY c2.doc_id, t.n ORDER BY c2.doc_id""".stripMargin,

    "multimodal_pgm_decode" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, doc_id % 5 + 8 AS w, doc_id % 4 + 6 AS h
        |  FROM documents),
        |p AS (
        |  SELECT media_id,
        |    'P2' || chr(10) || w || ' ' || h || chr(10) || '255' || chr(10) ||
        |    array_to_string(list_transform(range(0, w * h),
        |      i -> (media_id * 37 + i * 101) % 256), ' ') AS payload
        |  FROM m),
        |parsed AS (SELECT media_id, regexp_split_to_array(payload, '\s+') AS t FROM p),
        |px AS (
        |  SELECT media_id,
        |    CAST(t[2] AS INTEGER) AS width, CAST(t[3] AS INTEGER) AS height,
        |    list_transform(t[5:], x -> CAST(x AS BIGINT)) AS pix
        |  FROM parsed)
        |SELECT media_id, width, height,
        |  CAST(len(pix) AS BIGINT) AS n_pixels,
        |  CAST(list_min(pix) AS INTEGER) AS p_min,
        |  CAST(list_max(pix) AS INTEGER) AS p_max,
        |  CAST(list_sum(pix) AS DOUBLE) / len(pix) AS p_mean,
        |  CAST(len(list_filter(pix, x -> x // 64 = 0)) AS BIGINT) AS h0,
        |  CAST(len(list_filter(pix, x -> x // 64 = 1)) AS BIGINT) AS h1,
        |  CAST(len(list_filter(pix, x -> x // 64 = 2)) AS BIGINT) AS h2,
        |  CAST(len(list_filter(pix, x -> x // 64 = 3)) AS BIGINT) AS h3
        |FROM px ORDER BY media_id""".stripMargin,

    // Mirrors multimodal_wav_decode from the sample FORMULA (never the
    // bytes): v(i) = ((id*31 + i*17) % 2048) - 1024 over n = 256 +
    // (id%7)*64 samples at 8 kHz; zero crossings via lag per clip
    "multimodal_wav_decode" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, 256 + (doc_id % 7) * 64 AS n FROM documents),
        |s AS (
        |  SELECT media_id, n, i,
        |    (media_id * 31 + i * 17) % 2048 - 1024 AS v
        |  FROM (SELECT media_id, n, unnest(range(0, n)) AS i FROM m)),
        |zc AS (
        |  SELECT media_id, CAST(SUM(CASE WHEN prev IS NOT NULL
        |      AND (prev < 0) != (v < 0) THEN 1 ELSE 0 END) AS BIGINT) AS zc
        |  FROM (SELECT media_id, v,
        |          lag(v) OVER (PARTITION BY media_id ORDER BY i) AS prev
        |        FROM s)
        |  GROUP BY media_id),
        |agg AS (
        |  SELECT media_id, CAST(MAX(n) AS BIGINT) AS n_samples,
        |    CAST(MAX(abs(v)) AS INTEGER) AS peak,
        |    CAST(SUM(abs(v)) AS BIGINT) AS sum_abs,
        |    CAST(SUM(v * v) AS BIGINT) AS sum_sq
        |  FROM s GROUP BY media_id)
        |SELECT a.media_id, n_samples, CAST(8000 AS INTEGER) AS sample_rate,
        |  n_samples * 1000 // 8000 AS duration_ms, peak, zc AS zero_crossings,
        |  sum_abs, sum_sq, sqrt(CAST(sum_sq AS DOUBLE) / n_samples) AS rms
        |FROM agg a JOIN zc USING (media_id) ORDER BY a.media_id""".stripMargin,

    // Mirrors multimodal_y4m_scene_frames: the construction pins cuts to
    // f = 3s, where the (f mod 3) term vanishes — kept-frame stats come
    // straight from the base formula
    "multimodal_y4m_scene_frames" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, 4 + doc_id % 4 AS nf FROM documents),
        |k AS (
        |  SELECT media_id, unnest(range(0, (nf + 2) // 3)) AS s FROM m),
        |px AS (
        |  SELECT media_id, s, (media_id * 37 + s * 911 + i * 101) % 200 AS y
        |  FROM k, (SELECT unnest(range(0, 48)) AS i))
        |SELECT media_id, CAST(s AS INTEGER) AS scene_idx,
        |  CAST(s * 3 AS INTEGER) AS frame_idx,
        |  CAST(SUM(y) AS BIGINT) AS y_sum,
        |  CAST(MIN(y) AS INTEGER) AS y_min, CAST(MAX(y) AS INTEGER) AS y_max
        |FROM px GROUP BY media_id, s ORDER BY media_id, scene_idx""".stripMargin,

    // Mirrors corpus_multimodal_manifest: text gate from the
    // quality_filter oracle, audio/video legs from their closed forms
    "corpus_multimodal_manifest" ->
      """SELECT doc_id, lang,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(CASE WHEN
        |    len(regexp_split_to_array(trim(text), '\s+')) BETWEEN 10 AND 5000
        |    AND CAST(length(regexp_replace(trim(text), '\s+', '', 'g')) AS DOUBLE)
        |      / len(regexp_split_to_array(trim(text), '\s+')) BETWEEN 2.0 AND 12.0
        |    AND CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      tk -> tk IN ('the','a','of','and','to','in'))) AS DOUBLE)
        |      / len(regexp_split_to_array(trim(text), '\s+')) >= 0.01
        |    AND CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
        |      / length(text) <= 0.2
        |  THEN 1 ELSE 0 END AS INTEGER) AS keep,
        |  (256 + (doc_id % 7) * 64) * 1000 // 8000 AS audio_ms,
        |  CAST(4 + doc_id % 4 AS INTEGER) AS video_frames,
        |  CAST((4 + doc_id % 4 - 1) // 3 AS BIGINT) AS n_cuts
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Mirrors multimodal_y4m_cuts from the pixel formula: SAD per
    // consecutive frame pair via an f/f+1 self-join on the pixel grid
    "multimodal_y4m_cuts" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, 4 + doc_id % 4 AS nf FROM documents),
        |px AS (
        |  SELECT media_id, nf, f, i,
        |    (media_id * 37 + (f // 3) * 911 + i * 101) % 200 + (f % 3) AS y
        |  FROM (SELECT media_id, nf, unnest(range(0, nf)) AS f FROM m),
        |       (SELECT unnest(range(0, 48)) AS i)),
        |sad AS (
        |  SELECT a.media_id, b.f,
        |    CAST(SUM(abs(b.y - a.y)) AS BIGINT) AS sad
        |  FROM px a JOIN px b
        |    ON a.media_id = b.media_id AND a.i = b.i AND b.f = a.f + 1
        |  GROUP BY a.media_id, b.f)
        |SELECT m.media_id, CAST(8 AS INTEGER) AS width, CAST(6 AS INTEGER) AS height,
        |  CAST(nf AS INTEGER) AS n_frames,
        |  CAST(COALESCE(SUM(CASE WHEN sad > 768 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_cuts,
        |  CAST(COALESCE(SUM(CASE WHEN sad > 768 THEN f ELSE 0 END), 0) AS BIGINT) AS cut_idx_sum,
        |  CAST(COALESCE(SUM(sad), 0) AS BIGINT) AS sad_total
        |FROM m LEFT JOIN sad USING (media_id)
        |GROUP BY m.media_id, nf ORDER BY m.media_id""".stripMargin,

    // Mirrors multimodal_wav_fp from the sample formula (base keys the
    // planted copies): exact frame energies, rising-energy bits
    "multimodal_wav_fp" ->
      """WITH ids AS (
        |  SELECT doc_id AS media_id FROM documents
        |  UNION ALL SELECT doc_id + 200000 FROM documents WHERE doc_id % 25 = 0),
        |m AS (
        |  SELECT media_id, media_id % 200000 AS base,
        |    256 + (media_id % 200000 % 7) * 64 AS n FROM ids),
        |s AS (
        |  SELECT media_id, i // 16 AS k,
        |    (base * 31 + i * 17) % 2048 - 1024 AS v
        |  FROM (SELECT media_id, base, n, unnest(range(0, n)) AS i FROM m)),
        |e AS (
        |  SELECT media_id, k, CAST(SUM(v * v) AS BIGINT) AS e
        |  FROM s GROUP BY media_id, k),
        |b AS (
        |  SELECT media_id, CASE WHEN
        |      lead(e) OVER (PARTITION BY media_id ORDER BY k) > e
        |    THEN (1::BIGINT << k) ELSE 0 END AS bit
        |  FROM e)
        |SELECT media_id, CAST(COUNT(*) AS INTEGER) AS n_frames,
        |  CAST(SUM(bit) AS BIGINT) AS fp
        |FROM b GROUP BY media_id ORDER BY media_id""".stripMargin,

    // Mirrors multimodal_wav_fp_pairs: self-join the fingerprint table
    "multimodal_wav_fp_pairs" ->
      """WITH ids AS (
        |  SELECT doc_id AS media_id FROM documents
        |  UNION ALL SELECT doc_id + 200000 FROM documents WHERE doc_id % 25 = 0),
        |m AS (
        |  SELECT media_id, media_id % 200000 AS base,
        |    256 + (media_id % 200000 % 7) * 64 AS n FROM ids),
        |s AS (
        |  SELECT media_id, i // 16 AS k,
        |    (base * 31 + i * 17) % 2048 - 1024 AS v
        |  FROM (SELECT media_id, base, n, unnest(range(0, n)) AS i FROM m)),
        |e AS (
        |  SELECT media_id, k, CAST(SUM(v * v) AS BIGINT) AS e
        |  FROM s GROUP BY media_id, k),
        |b AS (
        |  SELECT media_id, CASE WHEN
        |      lead(e) OVER (PARTITION BY media_id ORDER BY k) > e
        |    THEN (1::BIGINT << k) ELSE 0 END AS bit
        |  FROM e),
        |fpt AS (
        |  SELECT media_id, CAST(COUNT(*) AS INTEGER) AS n_frames,
        |    CAST(SUM(bit) AS BIGINT) AS fp
        |  FROM b GROUP BY media_id)
        |SELECT a.media_id AS i, b.media_id AS j, a.fp
        |FROM fpt a JOIN fpt b
        |  ON a.fp = b.fp AND a.n_frames = b.n_frames AND a.media_id < b.media_id
        |ORDER BY i, j""".stripMargin,

    // Mirrors multimodal_wav_resample: the integer interpolation
    // (a·(R−f) + b·f) // R replayed per output sample from the formula
    "multimodal_wav_resample" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, 256 + (doc_id % 7) * 64 AS n FROM documents),
        |o AS (
        |  SELECT media_id, n, mm, j,
        |    (j * 8000) // 5500 AS k, (j * 8000) % 5500 AS f
        |  FROM (SELECT media_id, n, n * 5500 // 8000 AS mm,
        |          unnest(range(0, n * 5500 // 8000)) AS j FROM m)),
        |sv AS (
        |  SELECT media_id, mm, j,
        |    (((media_id * 31 + k * 17) % 2048 - 1024) * (5500 - f)
        |     + ((media_id * 31 + LEAST(k + 1, n - 1) * 17) % 2048 - 1024) * f)
        |      // 5500 AS v
        |  FROM o),
        |zc AS (
        |  SELECT media_id, CAST(SUM(CASE WHEN prev IS NOT NULL
        |      AND (prev < 0) != (v < 0) THEN 1 ELSE 0 END) AS BIGINT) AS zc
        |  FROM (SELECT media_id, v,
        |          lag(v) OVER (PARTITION BY media_id ORDER BY j) AS prev
        |        FROM sv)
        |  GROUP BY media_id),
        |agg AS (
        |  SELECT media_id, CAST(MAX(mm) AS BIGINT) AS n_samples,
        |    CAST(MAX(abs(v)) AS INTEGER) AS peak,
        |    CAST(SUM(abs(v)) AS BIGINT) AS sum_abs,
        |    CAST(SUM(v * v) AS BIGINT) AS sum_sq
        |  FROM sv GROUP BY media_id)
        |SELECT a.media_id, n_samples, CAST(5500 AS INTEGER) AS sample_rate,
        |  n_samples * 1000 // 5500 AS duration_ms, peak, zc AS zero_crossings,
        |  sum_abs, sum_sq, sqrt(CAST(sum_sq AS DOUBLE) / n_samples) AS rms
        |FROM agg a JOIN zc USING (media_id) ORDER BY a.media_id""".stripMargin,

    "multimodal_pgm_resize" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, doc_id % 5 + 8 AS w, doc_id % 4 + 6 AS h
        |  FROM documents),
        |p AS (
        |  SELECT media_id,
        |    'P2' || chr(10) || w || ' ' || h || chr(10) || '255' || chr(10) ||
        |    array_to_string(list_transform(range(0, w * h),
        |      i -> (media_id * 37 + i * 101) % 256), ' ') AS payload
        |  FROM m),
        |parsed AS (SELECT media_id, regexp_split_to_array(payload, '\s+') AS t FROM p),
        |px AS (
        |  SELECT media_id,
        |    CAST(t[2] AS INTEGER) AS width, CAST(t[3] AS INTEGER) AS height,
        |    list_transform(t[5:], x -> CAST(x AS BIGINT)) AS pix
        |  FROM parsed),
        |rz AS (
        |  SELECT media_id, list_transform(range(0, 12 * 9),
        |    j -> pix[CAST((((j // 12) * height) // 9) * width
        |                  + (((j % 12) * width) // 12) + 1 AS INTEGER)]) AS rp
        |  FROM px)
        |SELECT media_id, CAST(12 AS INTEGER) AS width, CAST(9 AS INTEGER) AS height,
        |  CAST(len(rp) AS BIGINT) AS n_pixels,
        |  CAST(list_min(rp) AS INTEGER) AS p_min,
        |  CAST(list_max(rp) AS INTEGER) AS p_max,
        |  CAST(list_sum(rp) AS DOUBLE) / len(rp) AS p_mean,
        |  CAST(len(list_filter(rp, x -> x // 64 = 0)) AS BIGINT) AS h0,
        |  CAST(len(list_filter(rp, x -> x // 64 = 1)) AS BIGINT) AS h1,
        |  CAST(len(list_filter(rp, x -> x // 64 = 2)) AS BIGINT) AS h2,
        |  CAST(len(list_filter(rp, x -> x // 64 = 3)) AS BIGINT) AS h3
        |FROM rz ORDER BY media_id""".stripMargin,

    "dedup_repeated_spans" ->
      s"""WITH $plantedSql,
         |toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM docs),
         |grams AS (
         |  SELECT doc_id, unnest(range(1, len(ws) - 3)) AS pos,
         |    unnest(list_transform(range(1, len(ws) - 3),
         |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS g
         |  FROM toks),
         |dup AS (SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
         |dpos AS (SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dup)),
         |runs AS (SELECT doc_id, pos,
         |  pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM dpos)
         |SELECT doc_id, MIN(pos) AS start_tok, MAX(pos) + 4 AS end_tok,
         |  COUNT(*) AS n_dup_grams
         |FROM runs GROUP BY doc_id, grp ORDER BY doc_id, start_tok""".stripMargin,

    "dedup_apply_spans" ->
      s"""WITH $plantedSql,
         |tsrc AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM docs),
         |grams AS (
         |  SELECT doc_id, unnest(range(1, len(ws) - 3)) AS pos,
         |    unnest(list_transform(range(1, len(ws) - 3),
         |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS g
         |  FROM tsrc),
         |own AS (SELECT g, MIN(doc_id) AS owner FROM grams GROUP BY g
         |  HAVING COUNT(DISTINCT doc_id) >= 2),
         |rem AS (
         |  SELECT DISTINCT gr.doc_id, gr.pos + t.k AS rpos
         |  FROM grams gr JOIN own ON gr.g = own.g AND gr.doc_id <> own.owner,
         |    range(0, 5) AS t(k)),
         |toks AS (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS tpos,
         |  unnest(ws) AS tok FROM tsrc)
         |SELECT t.doc_id, COUNT(*) AS n_tokens,
         |  CAST(SUM(CASE WHEN r.rpos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         |  COALESCE(string_agg(tok, ' ' ORDER BY t.tpos)
         |    FILTER (WHERE r.rpos IS NULL), '') AS text_kept
         |FROM toks t LEFT JOIN rem r ON t.doc_id = r.doc_id AND t.tpos = r.rpos
         |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

    "graph_pagerank" -> {
      // one unrolled iteration: the EXACT fixed-point trajectory of
      // Graph.pageRank — integer micro-unit ranks, floor-div
      // contributions, integer damping; no floats until the final
      // presentation divide, so no rounding boundary can disagree
      def it(prev: String, cur: String): String =
        s"""$cur AS (
           |  SELECT ed.dst AS node,
           |    CAST(150000000 // nn.n
           |      + (85 * SUM(r.rank_u // d.deg)) // 100 AS BIGINT) AS rank_u
           |  FROM ed JOIN $prev r ON ed.src = r.node
           |  JOIN deg d ON ed.src = d.src CROSS JOIN nn
           |  GROUP BY ed.dst, nn.n)""".stripMargin
      s"""WITH e AS MATERIALIZED (
         |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |ed AS MATERIALIZED (SELECT a AS src, b AS dst FROM e UNION SELECT b, a FROM e),
         |deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM ed GROUP BY 1),
         |nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM deg),
         |r0 AS (SELECT src AS node, CAST(1000000000 // nn.n AS BIGINT) AS rank_u
         |  FROM deg CROSS JOIN nn),
         |${it("r0", "r1")},
         |${it("r1", "r2")},
         |${it("r2", "r3")}
         |SELECT node, CAST(rank_u AS DOUBLE) / 1000000000.0 AS rank
         |FROM r3 ORDER BY node""".stripMargin
    },

    // Mirrors layout_join_skew: per-side counts, full-outer on key,
    // exact out_rows product and share-of-total, deterministic tiebreak
    "layout_join_skew" ->
      """WITH l AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_left
        |  FROM events WHERE event_type = 'view' GROUP BY user_id),
        |r AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_right
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        |p AS (
        |  SELECT COALESCE(l.user_id, r.user_id) AS user_id,
        |    COALESCE(n_left, 0) AS n_left, COALESCE(n_right, 0) AS n_right,
        |    COALESCE(n_left, 0) * COALESCE(n_right, 0) AS out_rows
        |  FROM l FULL OUTER JOIN r ON l.user_id = r.user_id),
        |t AS (SELECT CAST(SUM(out_rows) AS BIGINT) AS total FROM p)
        |SELECT p.user_id, p.n_left, p.n_right, p.out_rows,
        |  CAST(p.out_rows AS DOUBLE) / CAST(t.total AS DOUBLE) AS out_share
        |FROM p CROSS JOIN t
        |ORDER BY p.out_rows DESC, p.user_id LIMIT 20""".stripMargin,

    // Mirrors graph_pagerank_weighted: the identical weighted integer
    // trajectory unrolled — (rank * w) // sw contributions
    "graph_pagerank_weighted" -> {
      def it(prev: String, cur: String): String =
        s"""$cur AS (
           |  SELECT ed.dst AS node,
           |    CAST(150000000 // nn.n
           |      + (85 * SUM((r.rank_u * ed.w) // s.sw)) // 100 AS BIGINT) AS rank_u
           |  FROM ed JOIN $prev r ON ed.src = r.node
           |  JOIN sw s ON ed.src = s.src CROSS JOIN nn
           |  GROUP BY ed.dst, nn.n)""".stripMargin
      s"""WITH e0 AS MATERIALIZED (
         |  SELECT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b,
         |    CAST(COUNT(*) AS BIGINT) AS w
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |  GROUP BY 1, 2),
         |eu AS (SELECT a AS src, b AS dst, w FROM e0
         |       UNION ALL SELECT b, a, w FROM e0),
         |ed AS MATERIALIZED (SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w
         |       FROM eu GROUP BY 1, 2),
         |sw AS MATERIALIZED (SELECT src, CAST(SUM(w) AS BIGINT) AS sw FROM ed GROUP BY 1),
         |nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM sw),
         |r0 AS (SELECT src AS node, CAST(1000000000 // nn.n AS BIGINT) AS rank_u
         |  FROM sw CROSS JOIN nn),
         |${it("r0", "r1")},
         |${it("r1", "r2")},
         |${it("r2", "r3")}
         |SELECT node, CAST(rank_u AS DOUBLE) / 1000000000.0 AS rank
         |FROM r3 ORDER BY node""".stripMargin
    },

    // Mirrors graph_assortativity: same integer moment sums, same
    // fixed-order closed form for r
    "graph_assortativity" ->
      """WITH e AS (
        |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |ed AS (SELECT a AS src, b AS dst FROM e UNION SELECT b, a FROM e),
        |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM ed GROUP BY src),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(dx.deg) AS BIGINT) AS sx,
        |    CAST(SUM(dy.deg) AS BIGINT) AS sy,
        |    CAST(SUM(dx.deg * dy.deg) AS BIGINT) AS sxy,
        |    CAST(SUM(dx.deg * dx.deg) AS BIGINT) AS sxx,
        |    CAST(SUM(dy.deg * dy.deg) AS BIGINT) AS syy
        |  FROM ed JOIN deg dx ON ed.src = dx.src
        |          JOIN deg dy ON ed.dst = dy.src)
        |SELECT n, sx, sy, sxy, sxx, syy,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |  / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |     * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r
        |FROM m""".stripMargin,

    // Mirrors graph_kcore: the same 5 peel rounds unrolled — each round
    // recomputes degrees over the surviving edge set and restricts to
    // nodes at degree >= 8
    "graph_kcore" -> {
      // AS MATERIALIZED: every round references its predecessor 2-3
      // times; DuckDB inlines plain CTEs per reference, which re-runs
      // the whole chain exponentially (measured 46s -> 0.7s at sf0.1)
      def peel(prev: String, cur: String): String =
        s"""n$cur AS MATERIALIZED (
           |  SELECT src FROM $prev GROUP BY src HAVING COUNT(*) >= 8),
           |$cur AS MATERIALIZED (
           |  SELECT e.src, e.dst FROM $prev e
           |  JOIN n$cur a ON e.src = a.src
           |  JOIN n$cur b ON e.dst = b.src)""".stripMargin
      s"""WITH ${bulkCoPurchaseEdgesSql.replaceFirst("e AS \\(", "e AS MATERIALIZED (")},
         |e0 AS MATERIALIZED (SELECT u AS src, v AS dst FROM e UNION SELECT v, u FROM e),
         |${peel("e0", "e1")},
         |${peel("e1", "e2")},
         |${peel("e2", "e3")},
         |${peel("e3", "e4")},
         |${peel("e4", "e5")}
         |SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS core_deg
         |FROM e5 GROUP BY src ORDER BY node""".stripMargin
    },

    // Mirrors graph_triangles: id-ordered triple listing (a<b<c with all
    // three edges present) counts each triangle exactly once — the same
    // relation the degree-oriented wedge join produces
    "graph_triangles" ->
      s"""WITH $bulkCoPurchaseEdgesSql,
        |deg AS (
        |  SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM
        |    (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        |  GROUP BY node),
        |tri AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1 JOIN e e2 ON e1.v = e2.u
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |pn AS (
        |  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM
        |    (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        |     UNION ALL SELECT c FROM tri) GROUP BY node)
        |SELECT d.node, d.degree, CAST(COALESCE(p.n_tri, 0) AS BIGINT) AS n_tri,
        |  CASE WHEN d.degree < 2 THEN 0.0
        |       ELSE 2.0 * COALESCE(p.n_tri, 0)
        |            / (CAST(d.degree AS DOUBLE) * (d.degree - 1)) END AS lcc
        |FROM deg d LEFT JOIN pn p ON d.node = p.node ORDER BY d.node""".stripMargin,

    "multimodal_phash" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, doc_id % 5 + 8 AS w, doc_id % 4 + 6 AS h
        |  FROM documents),
        |p AS (
        |  SELECT media_id,
        |    'P2' || chr(10) || w || ' ' || h || chr(10) || '255' || chr(10) ||
        |    array_to_string(list_transform(range(0, w * h),
        |      i -> (media_id * 37 + i * 101) % 256), ' ') AS payload
        |  FROM m),
        |parsed AS (SELECT media_id, regexp_split_to_array(payload, '\s+') AS t FROM p),
        |px AS (
        |  SELECT media_id,
        |    CAST(t[2] AS INTEGER) AS width, CAST(t[3] AS INTEGER) AS height,
        |    list_transform(t[5:], x -> CAST(x AS BIGINT)) AS pix
        |  FROM parsed),
        |rz AS (
        |  SELECT media_id, list_transform(range(0, 8 * 8),
        |    j -> pix[CAST((((j // 8) * height) // 8) * width
        |                  + (((j % 8) * width) // 8) + 1 AS INTEGER)]) AS rp
        |  FROM px)
        |SELECT media_id,
        |  CAST(list_sum(list_transform(range(0, 56), k ->
        |    CASE WHEN rp[CAST((k // 7) * 8 + (k % 7) + 1 AS INTEGER)]
        |            > rp[CAST((k // 7) * 8 + (k % 7) + 2 AS INTEGER)]
        |         THEN CAST(1 AS BIGINT) << CAST(k AS INTEGER)
        |         ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS phash
        |FROM rz ORDER BY media_id""".stripMargin,

    "multimodal_phash_pairs" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, doc_id % 5 + 8 AS w, doc_id % 4 + 6 AS h
        |  FROM documents),
        |p AS (
        |  SELECT media_id,
        |    'P2' || chr(10) || w || ' ' || h || chr(10) || '255' || chr(10) ||
        |    array_to_string(list_transform(range(0, w * h),
        |      i -> (media_id * 37 + i * 101) % 256), ' ') AS payload
        |  FROM m),
        |parsed AS (SELECT media_id, regexp_split_to_array(payload, '\s+') AS t FROM p),
        |px AS (
        |  SELECT media_id,
        |    CAST(t[2] AS INTEGER) AS width, CAST(t[3] AS INTEGER) AS height,
        |    list_transform(t[5:], x -> CAST(x AS BIGINT)) AS pix
        |  FROM parsed),
        |rz AS (
        |  SELECT media_id, list_transform(range(0, 8 * 8),
        |    j -> pix[CAST((((j // 8) * height) // 8) * width
        |                  + (((j % 8) * width) // 8) + 1 AS INTEGER)]) AS rp
        |  FROM px),
        |hsh AS (
        |  SELECT media_id,
        |    CAST(list_sum(list_transform(range(0, 56), k ->
        |      CASE WHEN rp[CAST((k // 7) * 8 + (k % 7) + 1 AS INTEGER)]
        |              > rp[CAST((k // 7) * 8 + (k % 7) + 2 AS INTEGER)]
        |           THEN CAST(1 AS BIGINT) << CAST(k AS INTEGER)
        |           ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS phash
        |  FROM rz)
        |SELECT a.media_id AS i, b.media_id AS j,
        |  CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS dist
        |FROM hsh a JOIN hsh b ON a.media_id < b.media_id
        |WHERE bit_count(xor(a.phash, b.phash)) <= 3
        |ORDER BY i, j""".stripMargin,

    // Mirrors multimodal_frame_stats: per kind, the SAMPLED frame list,
    // the NN-resize source-index arithmetic (min(h-1, (y*h)//3)*w +
    // min(w-1, (x*w)//4) on the raster; x*64 byte picks on the 256x1
    // PCM window, which land on LITTLE-ENDIAN LOW BYTES of samples
    // 32x; (y*2)*8 + x*2 on the 8x6 luma), and the generator value
    // formulas — all replayed in SQL over range(12).
    "multimodal_frame_stats" -> {
      val imgIdx = "(least(doc_id % 4 + 5, ((j // 4) * (doc_id % 4 + 6)) // 3)" +
        " * (doc_id % 5 + 8) + least(doc_id % 5 + 7, ((j % 4) * (doc_id % 5 + 8)) // 4))"
      s"""WITH imgf AS (
         |  SELECT doc_id AS media_id, CAST(0 AS INTEGER) AS frame_idx,
         |    list_transform(range(0, 12), j ->
         |      (doc_id * 37 + $imgIdx * 101) % 256) AS vals
         |  FROM documents WHERE doc_id % 3 = 0),
         |audf AS (
         |  SELECT doc_id AS media_id, CAST(0 AS INTEGER) AS frame_idx,
         |    list_transform(range(0, 12), j ->
         |      ((((doc_id * 31 + (32 * (j % 4)) * 17) % 2048 - 1024) % 256) + 256) % 256) AS vals
         |  FROM documents WHERE doc_id % 3 = 1),
         |vidf AS (
         |  SELECT doc_id AS media_id, CAST(u.f AS INTEGER) AS frame_idx,
         |    list_transform(range(0, 12), j ->
         |      (doc_id * 37 + (u.f // 3) * 911
         |        + ((j // 4) * 16 + (j % 4) * 2) * 101) % 200 + u.f % 3) AS vals
         |  FROM documents, unnest(range(0, CAST(4 + doc_id % 4 AS BIGINT), 2)) AS u(f)
         |  WHERE doc_id % 3 = 2),
         |uf AS (SELECT * FROM imgf UNION ALL SELECT * FROM audf
         |       UNION ALL SELECT * FROM vidf)
         |SELECT media_id, frame_idx,
         |  CAST(4 AS INTEGER) AS width, CAST(3 AS INTEGER) AS height,
         |  CAST(list_min(vals) AS INTEGER) AS b_min,
         |  CAST(list_max(vals) AS INTEGER) AS b_max,
         |  CAST(list_sum(vals) AS BIGINT) AS b_sum
         |FROM uf ORDER BY media_id, frame_idx""".stripMargin
    },

    // Mirrors multimodal_features: all three kinds replayed from their
    // generator closed forms — PGM P5 n_bytes = 9 header chars + digits
    // + w*h raster bytes, WAV = canonical 44-byte header + 2 bytes per
    // PCM16 sample, Y4M = 39-byte stream header + per-frame
    // (6 "FRAME\n" + 48 luma + 24 chroma). Histogram bins match the
    // engine's shifts: pixels/luma v>>6, PCM16 (v+32768)>>14 — both
    // floor divisions of non-negative numerators.
    "multimodal_features" ->
      """WITH img AS (
        |  SELECT doc_id AS media_id, 'image' AS kind, 'pgm' AS format,
        |    doc_id % 5 + 8 AS w, doc_id % 4 + 6 AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |imgv AS (
        |  SELECT media_id, kind, format,
        |    CAST(9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR))
        |      + w * h AS BIGINT) AS n_bytes,
        |    CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |    CAST(1 AS INTEGER) AS n_frames,
        |    list_transform(range(0, w * h),
        |      i -> (media_id * 37 + i * 101) % 256) AS vals,
        |    CAST(64 AS BIGINT) AS binw, CAST(0 AS BIGINT) AS binoff
        |  FROM img),
        |audv AS (
        |  SELECT doc_id AS media_id, 'audio' AS kind, 'wav' AS format,
        |    CAST(44 + 2 * (256 + (doc_id % 7) * 64) AS BIGINT) AS n_bytes,
        |    CAST(0 AS INTEGER) AS width, CAST(0 AS INTEGER) AS height,
        |    CAST(0 AS INTEGER) AS n_frames,
        |    list_transform(range(0, 256 + (doc_id % 7) * 64),
        |      i -> (doc_id * 31 + i * 17) % 2048 - 1024) AS vals,
        |    CAST(16384 AS BIGINT) AS binw, CAST(32768 AS BIGINT) AS binoff
        |  FROM documents WHERE doc_id % 3 = 1),
        |vidv AS (
        |  SELECT doc_id AS media_id, 'video' AS kind, 'y4m' AS format,
        |    CAST(39 + (4 + doc_id % 4) * 78 AS BIGINT) AS n_bytes,
        |    CAST(8 AS INTEGER) AS width, CAST(6 AS INTEGER) AS height,
        |    CAST(4 + doc_id % 4 AS INTEGER) AS n_frames,
        |    flatten(list_transform(range(0, 4 + doc_id % 4),
        |      f -> list_transform(range(0, 48),
        |        i -> (doc_id * 37 + (f // 3) * 911 + i * 101) % 200 + f % 3))) AS vals,
        |    CAST(64 AS BIGINT) AS binw, CAST(0 AS BIGINT) AS binoff
        |  FROM documents WHERE doc_id % 3 = 2),
        |u AS (SELECT * FROM imgv UNION ALL SELECT * FROM audv
        |      UNION ALL SELECT * FROM vidv)
        |SELECT media_id, kind, format, n_bytes, width, height, n_frames,
        |  CAST(len(vals) AS BIGINT) AS n_values,
        |  CAST(list_min(vals) AS INTEGER) AS v_min,
        |  CAST(list_max(vals) AS INTEGER) AS v_max,
        |  CAST(list_sum(vals) AS BIGINT) AS v_sum,
        |  CAST(list_sum(list_transform(vals, v -> v * v)) AS BIGINT) AS v_sumsq,
        |  CAST(len(list_filter(vals, v -> (v + binoff) // binw = 0)) AS BIGINT) AS h0,
        |  CAST(len(list_filter(vals, v -> (v + binoff) // binw = 1)) AS BIGINT) AS h1,
        |  CAST(len(list_filter(vals, v -> (v + binoff) // binw = 2)) AS BIGINT) AS h2,
        |  CAST(len(list_filter(vals, v -> (v + binoff) // binw = 3)) AS BIGINT) AS h3
        |FROM u ORDER BY media_id""".stripMargin
  )
}
