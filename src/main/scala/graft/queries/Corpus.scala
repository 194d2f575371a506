package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.functions._
import graft.Tables.{t, tf}
import graft.ext.{Classifier, Cluster, Curation, Dedup, Sampling, Similarity, TextOps}
import graft.ops.Layout

/** Corpus-preparation queries for the training-data pipeline surface:
  * vocabulary / n-gram statistics, deterministic sampling, transitive
  * (clustered) dedup application, quality filtering, and centroid
  * assignment over embeddings. Every entry is oracle-checked against
  * DuckDB (the connected-components oracle is a recursive CTE).
  */
object Corpus {

  /** Near-dup pair set feeding the clustering queries — the (already
    * oracle-checked) n-gram Jaccard detector over the planted corpus. */
  /** The detector edge set over a caller-supplied planted-docs frame —
    * takes the FRAME (not the session) so consumers that also read the
    * docs themselves can persist one copy and feed both uses. */
  private def plantedPairs(docs: DataFrame): DataFrame =
    Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5)

  /** Pinned planted corpus for queries that consume it at least twice
    * (detector input + apply/join side). Bench/Verify sweep caches
    * after every query, so the persist is query-local. */
  private def plantedPinned(s: SparkSession, dir: String): DataFrame =
    Extensions.plantedDocs(s, dir)
      .persist(StorageLevel.MEMORY_AND_DISK)

  // DuckDB twin of [[plantedPairs]] — the SAME CTE chain the detector's
  // own oracle checks, ending in jp(i, j, jaccard)
  private val pairsSql = Extensions.jaccardPairsCtesSql

  // transitive closure of jp: comps(id, comp = min reachable node)
  private val compsSql =
    """edges AS (SELECT i AS s, j AS d FROM jp UNION SELECT j, i FROM jp),
      |reach(id, comp) AS (
      |  SELECT s, s FROM edges
      |  UNION
      |  SELECT e.s, r.comp FROM edges e JOIN reach r ON e.d = r.id),
      |comps AS (SELECT id, MIN(comp) AS comp FROM reach GROUP BY id)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_vocab" -> ((s, dir) => {
      TextOps.vocab(tf(s, dir, "documents").select(col("doc_id"), col("text")))
        .filter(col("n_docs") >= 5)
        .transform(graft.Tables.ordered(col("term")))
    }),

    // ---- mergeable distinct sketches across sources (DataSketches HLL):
    // per-source sketch + register-max union — the "add a new source to
    // a 100 TB corpus without re-scanning the old ones" path. Sketch
    // state is a few KB per source; the union ESTIMATE wobbles
    // sub-percent with merge order (HIP estimator — ApproxSpec pins the
    // bound), so exact distincts anchor the oracle and the estimates
    // ride as within-tol flags (same contract as approx_distinct). The
    // union estimate costs ONE tiny agg over the per-source sketches,
    // where the exact union distinct re-shuffles every document text.
    "corpus_sketch_union" -> ((s, dir) => {
      // exact distincts count SHA-256 DIGESTS, not raw texts:
      // distinct-agg partials shuffle every candidate value, and
      // 32-byte digests cut that to ~3% of the text bytes with the
      // identical count — and unlike md5, a sha-256 collision is
      // infeasible even adversarially, which matters in a dedup/
      // curation framework whose inputs are untrusted corpora. ONE
      // (source, digest) dedup shuffle feeds everything downstream:
      // per-source exact = group row count, n_docs = sum of the
      // carried multiplicities, per-source sketch = HLL over the
      // deduped digests (HLL state is duplicate-insensitive, so the
      // estimate equals sketching the raw stream), union row = sketch
      // merge of the per-source sketches + one digest re-dedup. The
      // text column never crosses the wire. The digest frame is
      // PERSISTED, not left to ReuseExchange: the union-distinct
      // branch's dedup-over-dedup collapses under
      // RemoveRedundantAggregates into a (d)-keyed aggregate straight
      // over the base scan — a second full text scan + sha2 pass
      // (measured +0.4s at sf0.1) — and the cache boundary is what
      // stops the optimizer from seeing through it. Query-local pin,
      // swept by the caller (see TextOps' cache contract).
      val dd = tf(s, dir, "documents")
        .select(col("source"), sha2(col("text"), 256).as("d"))
        .groupBy(col("source"), col("d")).agg(count(lit(1)).as("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val per = dd.groupBy(col("source")).agg(
        count(lit(1)).as("exact_distinct"),
        sum(col("c")).as("n_docs"),
        hll_sketch_agg(col("d")).as("sk"))
      val allRow = per.agg(
          sum(col("n_docs")).as("n_docs"),
          hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        .crossJoin(dd.agg(countDistinct(col("d")).as("exact_distinct")))
        .select(lit("(all)").as("source"), col("n_docs"),
          col("exact_distinct"),
          (abs(col("est") - col("exact_distinct")) <=
            col("exact_distinct") * 0.06).as("within_tol"))
      per.select(col("source"), col("n_docs"), col("exact_distinct"),
          (abs(hll_sketch_estimate(col("sk")) - col("exact_distinct")) <=
            col("exact_distinct") * 0.06).as("within_tol"))
        .unionAll(allRow)
        .transform(graft.Tables.ordered(col("source")))
    }),

    // ---- incremental inverted-index maintenance: the document-frequency
    // table is refreshed with a delta batch (doc_id % 10 == 0) WITHOUT
    // rescanning the base corpus — per-term counts are self-maintainable
    // (the incrementalAgg contract). The ORACLE recomputes df from the
    // full corpus from scratch, so a pass proves maintained == rebuilt.
    "text_df_incremental" -> ((s, dir) => {
      val docs = tf(s, dir, "documents").select(col("doc_id"), col("text"))
      def df(d: org.apache.spark.sql.DataFrame) = d
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
        .distinct()
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
      val base = df(docs.filter(col("doc_id") % 10 =!= 0))
      val delta = df(docs.filter(col("doc_id") % 10 === 0))
      base.join(delta.select(col("term"), col("df").as("d_df")),
          Seq("term"), "full_outer")
        .select(col("term"),
          (coalesce(col("df"), lit(0L)) +
            coalesce(col("d_df"), lit(0L))).as("df"))
        .filter(col("df") >= 5)
        .transform(graft.Tables.ordered(col("term")))
    }),

    "text_bigrams" -> ((s, dir) => {
      tf(s, dir, "documents")
        .select(explode(Dedup.shingles(col("text"), 2)).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= 10)
        .transform(graft.Tables.ordered(col("bigram")))
    }),

    // gate EVALUATION: confusion matrix of the heuristic quality gate
    // against the length seed label the learned scorer distills — the
    // precision/recall readout a filter change ships with
    "quality_confusion" -> ((s, dir) => {
      tf(s, dir, "documents")
        .groupBy(
          when(TextOps.qualityKeep(col("text")), 1).otherwise(0).as("keep"),
          when(col("n_chars") >= 300, 1).otherwise(0).as("seed"))
        .agg(count(lit(1)).as("n"))
        .transform(graft.Tables.ordered(col("keep"), col("seed")))
    }),

    "quality_filter" -> ((s, dir) => {
      TextOps.qualityFlags(tf(s, dir, "documents").select(col("doc_id"), col("text")))
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    // cross-source score calibration: gate on the percentile WITHIN each
    // source (drop each source's worst 20%), computed on the distinct
    // (source, score) grid — never a per-source window over the corpus
    "quality_calibrated" -> ((s, dir) => {
      val d = tf(s, dir, "documents")
      val nTok = TextOps.tokenCount(col("text"))
      val scored = d.select(col("doc_id"), col("source"),
        round(length(regexp_replace(trim(col("text")), "\\s+", ""))
          .cast("double") / nTok, 4).as("score"))
      TextOps.calibrateBySource(scored, minPctl = 0.2)
        .select(col("doc_id"), col("source"), col("score"),
          col("pctl"), col("keep"))
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    // curriculum ordering: easy-to-hard buckets by fixed n_chars edges,
    // salted-hash shuffle within bucket, distributed global numbering —
    // no single-task sort anywhere in the plan
    "corpus_curriculum" -> ((s, dir) => {
      Sampling.curriculumOrder(
          t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
          col("doc_id"), col("n_chars").cast("double"),
          edges = Seq(200.0, 400.0, 800.0), salt = "cur0")
        .select(col("doc_id"), col("bucket"), col("rn"))
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    // learned quality scoring: logistic regression trained by full-batch
    // GD (8 iterations, exact decimal gradient sums) distilling a length
    // criterion (n_chars >= 300 — the one seed signal the synthetic
    // fixture's features can actually express; production callers pass
    // any boolean seed label) into a smooth linear scorer over the whole
    // corpus — the fastText-style model-based filter companion to
    // quality_filter's heuristic gates. The oracle unrolls the ENTIRE
    // training trajectory into CTEs (same pattern as embed_kmeans /
    // text_bpe_merges), so the hash checks the distributed gradient
    // aggregation itself, not just the scoring pass
    "quality_lr_score" -> ((s, dir) => {
      Classifier.lrTrainScore(tf(s, dir, "documents"), col("n_chars") >= 300)
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    "sample_hash" -> ((s, dir) => {
      Sampling.hashSample(tf(s, dir, "documents"), col("doc_id"), pct = 10)
        .select(col("doc_id")).transform(graft.Tables.ordered(col("doc_id")))
    }),

    "sample_stratified" -> ((s, dir) => {
      Sampling.stratifiedHashSample(t(s, dir, "customer"), col("c_custkey"),
          col("c_mktsegment"),
          Map("AUTOMOBILE" -> 60, "BUILDING" -> 25, "FURNITURE" -> 10))
        .select(col("c_custkey"), col("c_mktsegment"))
        .transform(graft.Tables.ordered(col("c_custkey")))
    }),

    "sample_n_per_stratum" -> ((s, dir) => {
      Sampling.hashSampleNPerStratum(t(s, dir, "customer"), col("c_custkey"),
          col("c_mktsegment"), n = 10)
        .select(col("c_custkey"), col("c_mktsegment"))
        .transform(graft.Tables.ordered(col("c_custkey")))
    }),

    // deterministic 90/5/5 train/val/test labeling — disjoint hash
    // ranges, rerun-stable, no shuffle (see Sampling.assignSplits)
    "sample_split" -> ((s, dir) => {
      Sampling.assignSplits(tf(s, dir, "documents"), col("doc_id"),
          Seq("train" -> 90, "val" -> 5, "test" -> 5))
        .select(col("doc_id"), col("split"))
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    "dedup_cluster" -> ((s, dir) => {
      Cluster.connectedComponents(plantedPairs(Extensions.plantedDocs(s, dir)))
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    "dedup_apply_cluster" -> ((s, dir) => {
      val docs = plantedPinned(s, dir)
      Cluster.applyClusterDedup(docs, plantedPairs(docs))
        .select(col("doc_id")).transform(graft.Tables.ordered(col("doc_id")))
    }),

    // duplicate-cluster SIZE histogram: how big do near-dup families get
    // — the readout that decides between pair-apply and cluster-apply
    // (and exposes boilerplate mega-clusters). Two grouped counts over
    // the (already tiny) component table.
    "dedup_cluster_sizes" -> ((s, dir) => {
      Cluster.connectedComponents(plantedPairs(Extensions.plantedDocs(s, dir)))
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("cluster_id")).as("id_sum"))
        .transform(graft.Tables.ordered(col("cluster_size")))
    }),

    // leakage-safe split assignment: hash the CLUSTER id, not the doc
    // id, so every near-duplicate cluster lands in ONE split — the
    // standard guard against train/test leakage through near-dups that
    // per-doc hashing cannot give. Singletons hash their own id (same
    // as sample_split); only clustered docs move.
    "sample_split_clustered" -> ((s, dir) => {
      val docs = plantedPinned(s, dir)
      val labeled = docs
        .join(Cluster.connectedComponents(plantedPairs(docs)),
          Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      Sampling.assignSplits(labeled, col("cluster_id"),
          Seq("train" -> 90, "val" -> 5, "test" -> 5))
        .select(col("doc_id"), col("cluster_id"), col("split"))
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    // quality-aware survivor policy: keep the LONGEST member of each
    // duplicate cluster (tiebreak doc_id) — here the planted "+ extra
    // token tail" near-dups beat their originals, demonstrating the
    // survivor really follows the score, not the id.
    "dedup_apply_best" -> ((s, dir) => {
      val docs = plantedPinned(s, dir)
      Cluster.applyClusterDedupBest(docs,
          plantedPairs(docs), length(col("text")))
        .select(col("doc_id"), col("cluster_id"),
          length(col("text")).cast("long").as("n_chars"))
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    // near-exact dedup on the NORMALIZED fingerprint: catches whitespace/
    // punctuation-only reformattings that raw-hash dedup misses. Planted:
    // doc_id%25==7 re-landed with doubled spaces and a trailing "!!"
    "dedup_fingerprint" -> ((s, dir) => {
      // one scan: each row explodes into itself plus (for %25==7) its
      // reformatted copy map-side (see [[graft.Tables.plantedVariants]])
      val docs = graft.Tables.plantedVariants(
        tf(s, dir, "documents"), Seq("doc_id", "text"),
        struct(col("doc_id"), col("text")),
        when(col("doc_id") % 25 === 7,
          struct((col("doc_id") + 300000).as("doc_id"),
            concat(regexp_replace(col("text"), " ", "  "), lit(" !!"))
              .as("text"))))
      docs.groupBy(TextOps.fingerprint(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .transform(graft.Tables.ordered(col("fp")))
    }),

    // benchmark decontamination: the "eval set" is a 20-token slice of
    // every 50th document, so the contaminated docs are exactly those
    // sources (and provably detected via shared 8-grams, not ids)
    "dedup_decontaminate" -> ((s, dir) => {
      val docs = tf(s, dir, "documents").select(col("doc_id"), col("text"))
      val bench = docs.filter(col("doc_id") % 50 === 7)
        .select(concat_ws(" ",
          slice(TextOps.tokens(col("text")), 5, 20)).as("text"))
      Dedup.decontaminate(docs, bench, n = 8)
        .select(col("doc_id")).transform(graft.Tables.ordered(col("doc_id")))
    }),

    // Bloom-prefiltered decontamination: row-identical to
    // dedup_decontaminate (the bloom only PREfilters; an exact join
    // confirms), so the oracle is the same exact-set SQL — what's graded
    // is that the fpp path loses nothing
    "dedup_bloom_contam" -> ((s, dir) => {
      val docs = tf(s, dir, "documents").select(col("doc_id"), col("text"))
      val bench = docs.filter(col("doc_id") % 50 === 7)
        .select(concat_ws(" ",
          slice(TextOps.tokens(col("text")), 5, 20)).as("text"))
      Dedup.bloomDecontaminate(docs, bench, n = 8)
        .select(col("doc_id")).transform(graft.Tables.ordered(col("doc_id")))
    }),

    // NORMALIZED decontamination: the eval slice is reformatted
    // (upper-cased, dash-joined) so raw 8-grams cannot match it —
    // normalizing BOTH sides (TextOps.normalizeText) restores the match
    // and the contaminated docs are exactly the planted sources. The
    // check a real pipeline runs: verbatim leaks survive reformatting.
    "dedup_contam_normalized" -> ((s, dir) => {
      val docs = tf(s, dir, "documents").select(col("doc_id"), col("text"))
      val bench = docs.filter(col("doc_id") % 50 === 7)
        .select(regexp_replace(upper(concat_ws(" ",
          slice(TextOps.tokens(col("text")), 5, 20))), " ", " - ").as("text"))
      Dedup.decontaminate(
          docs.select(col("doc_id"),
            TextOps.normalizeText(col("text")).as("text")),
          bench.select(TextOps.normalizeText(col("text")).as("text")), n = 8)
        .select(col("doc_id")).transform(graft.Tables.ordered(col("doc_id")))
    }),

    // context-window chunking: 64-token chunks at stride 48 (16-token
    // overlap), chunk content witnessed by its md5
    "corpus_chunk" -> ((s, dir) => {
      TextOps.chunkDocs(
          tf(s, dir, "documents").select(col("doc_id"), col("text")), 64, 48)
        .transform(graft.Tables.ordered(col("doc_id"), col("chunk_id")))
    }),

    // END-TO-END curation: the full pre-training pipeline in ONE
    // declarative plan — quality gate → exact-fingerprint dedup →
    // benchmark decontamination → sequence packing, summarized per bin.
    // Each stage is an already-graded operator; this query proves they
    // COMPOSE: the gate prunes at scan speed before dedup shuffles
    // (distinct fingerprints only), decontamination broadcasts the eval
    // shingles, and the packer's distributed cumsum sees only survivors.
    "corpus_curate" -> ((s, dir) => {
      val docs = tf(s, dir, "documents").select(col("doc_id"), col("text"))
      val bench = docs.filter(col("doc_id") % 50 === 7)
        .select(concat_ws(" ",
          slice(TextOps.tokens(col("text")), 5, 20)).as("text"))
      Curation.curate(docs, bench)
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .transform(graft.Tables.ordered(col("bin")))
    }),

    // per-doc curation audit: the first gate that dropped each doc
    // (quality → duplicate → contaminated) or 'kept' — same gate order
    // and benchmark slice as corpus_curate, over the PLANTED corpus so
    // the duplicate verdict is provably exercised (the +200000 exact
    // re-lands must all report 'duplicate').
    "corpus_curate_explain" -> ((s, dir) => {
      val base = tf(s, dir, "documents").select(col("doc_id"), col("text"))
      val bench = base.filter(col("doc_id") % 50 === 7)
        .select(concat_ws(" ",
          slice(TextOps.tokens(col("text")), 5, 20)).as("text"))
      Curation.explainCuration(Extensions.plantedDocs(s, dir), bench)
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    // the funnel everyone asks for: per-gate yields, as a rollup of the
    // per-document audit (so the two can never disagree)
    "corpus_curate_funnel" -> ((s, dir) => {
      val base = tf(s, dir, "documents").select(col("doc_id"), col("text"))
      val bench = base.filter(col("doc_id") % 50 === 7)
        .select(concat_ws(" ",
          slice(TextOps.tokens(col("text")), 5, 20)).as("text"))
      Curation.explainCuration(Extensions.plantedDocs(s, dir), bench)
        .groupBy(col("reason")).agg(count(lit(1)).as("n_docs"))
        .transform(graft.Tables.ordered(col("reason")))
    }),

    // INCREMENTAL dedup: a new batch (doc_id%3==0 stands in for today's
    // crawl) dedupes against the existing corpus via its fingerprint
    // index — an anti-join on distinct fingerprints, never a rescan of
    // the base text — then within-batch keep-min. How a daily 100 TB
    // ingest actually runs dedup: the base contributes one fingerprint
    // per doc, not its content.
    "dedup_incremental" -> ((s, dir) => {
      val docs = tf(s, dir, "documents").select(col("doc_id"), col("text"))
      Dedup.incrementalDedup(
          docs.filter(col("doc_id") % 3 =!= 0),
          docs.filter(col("doc_id") % 3 === 0))
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    // graded contamination: fraction of each doc's distinct 8-grams
    // shared with the eval set (same planted eval slice as decontaminate)
    "dedup_contamination_score" -> ((s, dir) => {
      val docs = tf(s, dir, "documents").select(col("doc_id"), col("text"))
      val bench = docs.filter(col("doc_id") % 50 === 7)
        .select(concat_ws(" ",
          slice(TextOps.tokens(col("text")), 5, 20)).as("text"))
      Dedup.contaminationScore(docs, bench, n = 8)
        .filter(col("n_shared") > 0)
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    // embedding-cosine dedup APPLY: planted exact-copy vectors
    // (vec_id%25==0, +100000) must all be dropped at threshold 0.999
    "embed_dedup_apply" -> ((s, dir) => {
      // one scan (the union form decoded the float-array column twice)
      val planted = graft.Tables.plantedVariants(
        tf(s, dir, "embeddings"), Seq("vec_id", "embedding", "label"),
        struct(col("vec_id"), col("embedding"), col("label")),
        when(col("vec_id") % 25 === 0,
          struct((col("vec_id") + 100000).as("vec_id"),
            col("embedding"), col("label"))))
      Similarity.embedDedupApply(planted, threshold = 0.999)
        .select(col("vec_id")).transform(graft.Tables.ordered(col("vec_id")))
    }),

    "dedup_apply_pairs" -> ((s, dir) => {
      val docs = plantedPinned(s, dir)
      Dedup.applyPairDedup(docs, plantedPairs(docs))
        .select(col("doc_id")).transform(graft.Tables.ordered(col("doc_id")))
    }),

    "embed_centroid_assign" -> ((s, dir) => {
      Similarity.centroidAssign(tf(s, dir, "embeddings"))
        .transform(graft.Tables.ordered(col("vec_id")))
    }),

    // fixture text has no PII, so emails/URLs are planted on doc_id%10==0
    // (same arithmetic in the oracle) to prove the scrub actually fires
    "text_redact" -> ((s, dir) => {
      val planted = tf(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(col("text"),
            lit(" contact bob@example.com see https://example.com/page")))
          .otherwise(col("text")).as("text"))
      planted.select(col("doc_id"),
          TextOps.countMatches(col("text"), TextOps.emailPattern).as("n_emails"),
          TextOps.countMatches(col("text"), TextOps.urlPattern).as("n_urls"),
          md5(TextOps.redactPii(col("text"))).as("red_h"))
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    // corpus-internal boilerplate: fraction of each doc's distinct
    // 8-grams appearing in >= 2 docs (duplicated/templated content —
    // the fixture's planted duplicate groups make this non-trivial)
    "text_boilerplate" -> ((s, dir) => {
      TextOps.boilerplateScore(
          tf(s, dir, "documents").select(col("doc_id"), col("text")),
          n = 8, minDocFreq = 2)
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    // per-domain URL accounting (blocklist/quota base). The fixture text
    // carries no URLs, so they are planted with doc_id-varying hosts to
    // produce a real distribution.
    "text_domains" -> ((s, dir) => {
      val planted = tf(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"),
            lit(" via https://site"), (col("doc_id") % 5).cast("string"),
            lit(".example.org/p/"), col("doc_id").cast("string"),
            lit(" and http://cdn"), (col("doc_id") % 3).cast("string"),
            lit(".example.net/a")))
          .otherwise(col("text")).as("text"))
      TextOps.urlDomains(planted).transform(graft.Tables.ordered(col("domain")))
    }),

    // domain-blocklist gate: parent-domain match (example.org blocks
    // every site*.example.org) AND exact-host match (cdn1.example.net)
    // exercised on disjoint planted doc sets
    "text_blocklist_filter" -> ((s, dir) => {
      val docs = tf(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = docs.withColumn("text",
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" via https://site"),
            (col("doc_id") % 5).cast("string"), lit(".example.org/x")))
          .when(col("doc_id") % 7 === 3,
            concat(col("text"), lit(" see http://cdn"),
              (col("doc_id") % 3).cast("string"), lit(".example.net/a")))
          .otherwise(col("text")))
      TextOps.domainBlocklistFilter(planted,
          Seq("example.org", "cdn1.example.net"))
        .select(col("doc_id")).transform(graft.Tables.ordered(col("doc_id")))
    }),

    // language-ID quality against the fixture's ground-truth lang column
    "text_lang_confusion" -> ((s, dir) => {
      tf(s, dir, "documents")
        .groupBy(col("lang"), TextOps.langGuess(col("text")).as("lang_guess"))
        .agg(count(lit(1)).as("n"))
        .transform(graft.Tables.ordered(col("lang"), col("lang_guess")))
    }),

    // Oracle-checked DESPITE being iterative model training: kMeans is
    // deterministic end-to-end (hash-ordered init, IEEE-ordered dots,
    // DECIMAL(20,10) M-step sums), so the fixed Lloyd loop UNROLLS into
    // chained DuckDB CTEs ([[kmeansOracleSql]]) and the cluster
    // assignment matches bit-for-bit. Quality/invariance additionally
    // spec-gated in CorpusSpec.
    // fanout: the Lloyd iterations pin their widened vectors ONCE
    // inside lloydCentroids, so the round-robin pre-balance is paid a
    // single time into the pin and every E-step scan then runs on all
    // cores instead of the fixture's few parquet splits (sf1 A/B:
    // 4.4s -> 2.0s; an older no-fanout measurement predated the
    // internal pin). kMeans is partitioning-invariant by construction
    // (decimal M-step, hash-ordered init; spec-gated).
    "embed_kmeans" -> ((s, dir) => {
      Similarity.kMeans(tf(s, dir, "embeddings"), k = 8, iters = 3)
        .transform(graft.Tables.ordered(col("vec_id")))
    }),

    // dominant-principal-direction projection: power iteration with
    // decimal-exact component sums; the oracle replays every iteration
    // (bit-identical direction vectors in both engines)
    "embed_pca_project" -> ((s, dir) => {
      // fanout: the iteration scans are CPU-bound (dim-wide decimal
      // sums per vector) and the pinned vectors otherwise inherit the
      // fixture's few parquet splits — census at sf1 showed 16 tasks
      // across 11 stages, i.e. ~2 cores busy per wave
      Similarity.powerIterationPC(tf(s, dir, "embeddings"), iters = 4)
        .transform(graft.Tables.ordered(col("vec_id")))
    }),

    // embedding-space anomaly gate: same trained centroids as
    // embed_kmeans, distances z-scored per cell from exact decimal
    // moments (oracle replays training AND the gate end-to-end)
    "embed_outliers" -> ((s, dir) => {
      Similarity.embedOutliers(tf(s, dir, "embeddings"), k = 8, iters = 3)
        .transform(graft.Tables.ordered(col("vec_id")))
    }),

    // SpaceSaving sketch in its exact regime (capacity >= distinct terms
    // at every tested SF, so err = 0 and counts are exact -> DuckDB-
    // checkable); the bounded regime's error guarantee is spec-gated
    "text_heavy_hitters" -> ((s, dir) => {
      import s.implicits._
      val agg = new graft.functions.SpaceSaving(1 << 20)
      val top = tf(s, dir, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("term"))
        .as[String]
        .groupByKey(_ => 0)
        .agg(agg.toColumn.name("hh"))
        .flatMap(_._2.take(20))
      top.toDF()
        .select(col("item").as("term"), col("count").as("n"))
        .transform(graft.Tables.ordered(col("n").desc, col("term")))
    }),

    // Count–Min point-frequency estimation: the sketch rides ONE
    // map-side-combined pass (8 KB of state — the shape that replaces a
    // full vocabulary shuffle at 100 TB); the exact counts here are the
    // graded comparison column. The oracle recomputes every probed
    // counter CELL exactly (bucket sums under the same md5 double
    // hashing), so the estimates — overcounts included — hash-match.
    "text_cms_freq" -> ((s, dir) => {
      import s.implicits._
      val depth = 4
      val width = 256
      // ONE tokenize scan: the exact term counts come first, and the
      // sketch builds FROM them — a Count-Min is additive, so inserting
      // (term, n) with weight n is bit-identical to inserting every raw
      // occurrence, the sketch aggregation runs over the vocabulary
      // instead of the corpus, and md5 is paid per term, not per token
      // (was: two independent tokenize+explode scans; sf1 2.7s -> one)
      val counts = tf(s, dir, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy(col("tok").as("term")).agg(count(lit(1)).as("n_exact"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cms = counts.select(col("term"), col("n_exact"))
        .as[(String, Long)].groupByKey(_ => 0)
        .agg(new graft.functions.CountMinWeighted(depth, width)
          .toColumn.name("cms"))
        .head()._2.toArray
      val h1 = conv(substring(md5(col("term")), 1, 8), 16, 10).cast("long")
      val h2 = conv(substring(md5(col("term")), 9, 8), 16, 10).cast("long")
      val probes = (0 until depth).map { r =>
        element_at(lit(cms.slice(r * width, (r + 1) * width)),
          ((h1 + lit(r.toLong) * h2) % width).cast("int") + 1)
      }
      counts.orderBy(col("n_exact").desc, col("term")).limit(20)
        .withColumn("n_est", least(probes: _*))
        .transform(graft.Tables.ordered(col("n_exact").desc, col("term")))
    }),

    // vocabulary coverage curve: what fraction of all token occurrences
    // the top-{3,10,30} terms account for (checkpoints sized to the
    // fixture's ~31-term vocabulary; a web corpus would use
    // {1k,10k,100k} — the shape is the point). NO global window: the
    // top slice arrives via top-k (TakeOrderedAndProject) and ranks are
    // assigned on those rows only; totals are one exact aggregation.
    // Ratios are single IEEE divisions of exact longs.
    "text_vocab_coverage" -> ((s, dir) => {
      // single-partition window over the 30-row limit result — bounded
      val wTop = org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("term"))
      val vocab = tf(s, dir, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("n"))
      val top = vocab.orderBy(col("n").desc, col("term")).limit(30)
        .withColumn("r", row_number().over(wTop))
      val tot = vocab.agg(sum(col("n")).as("total"),
        count(lit(1)).as("n_terms"))
      top.agg(
          sum(when(col("r") <= 3, col("n"))).as("top3"),
          sum(when(col("r") <= 10, col("n"))).as("top10"),
          sum(col("n")).as("top30"))
        .crossJoin(broadcast(tot))
        .select(col("n_terms"), col("total"), col("top3"), col("top10"),
          col("top30"),
          (col("top3").cast("double") / col("total")).as("cov3"),
          (col("top10").cast("double") / col("total")).as("cov10"),
          (col("top30").cast("double") / col("total")).as("cov30"))
    }),

    // per-source unigram KL drift against the corpus mixture
    "text_unigram_kl" -> ((s, dir) => {
      TextOps.unigramKl(
          tf(s, dir, "documents").select(col("source"), col("text")))
        .transform(graft.Tables.ordered(col("source")))
    }),

    // Oracle-checked DESPITE being iterative tokenizer training: like
    // kMeans, the 10 merge rounds UNROLL into chained DuckDB CTEs
    // ([[bpeOracleSql]]) — the two-space sentinel layout makes Spark's
    // and DuckDB's literal replace() scan identically, and the
    // (count desc, pair asc) argmax is the same total order in both
    // engines. Partitioning-invariance additionally spec-gated.
    "text_bpe_merges" -> ((s, dir) => {
      graft.ext.Bpe.trainTable(s,
          tf(s, dir, "documents").select(col("doc_id"), col("text")), nMerges = 10)
        .transform(graft.Tables.ordered(col("rank")))
    }),

    // tokenizer ENCODE under the trained merges ([[Bpe.segment]]): the
    // full train→encode trajectory is hash-checked — the oracle re-learns
    // the same 10 merges in CTEs, then applies them as one doc-level
    // replace chain (cross-word matches are impossible: word boundaries
    // carry 4 sentinel spaces, the merge pattern needs exactly 2)
    "text_bpe_encode" -> ((s, dir) => {
      val docs = tf(s, dir, "documents").select(col("doc_id"), col("text"))
      val merges = graft.ext.Bpe.train(docs, nMerges = 10)
      docs.select(col("doc_id"),
          graft.ext.Bpe.segment(col("text"), merges).as("encoded"))
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    // target-mixture resampling: rates from [[Sampling.mixtureRates]]
    // (driver math over one count aggregation) applied as a pure
    // hash-filter — the oracle replays the whole computation in SQL.
    // No fanout: both passes are a 2-column scan + map-combinable
    // count / integer hash filter, zero CPU-heavy per-row work — the
    // pre-balance repartition only added a full-table shuffle (with
    // text bodies) to each of the two jobs (census: 5 stages/43 tasks
    // -> 4 stages/11 tasks, 0.60s -> 0.45s)
    "sample_mixture" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"))
      val rates = Sampling.mixtureRates(docs, col("source"),
        mixtureTargets)
      Sampling.stratifiedHashSample(docs, col("doc_id"), col("source"), rates)
        .select(col("doc_id"), col("source")).transform(graft.Tables.ordered(col("doc_id")))
    }),

    // temperature-scaled mixture (T=2) over the skewed lang column — the
    // classic multilingual α-sampling: en downsamples, tail langs keep
    // everything. Rates from driver math over one count aggregation,
    // applied as the same pure hash filter; the oracle replays
    // pow/normalize/cap/round end-to-end
    "sample_temperature" -> ((s, dir) => {
      // 2-column scan, no fanout — same rationale as sample_mixture
      val docs = t(s, dir, "documents").select(col("doc_id"), col("lang"))
      val rates = Sampling.temperatureRates(docs, col("lang"),
        temperature = 2.0)
      Sampling.stratifiedHashSample(docs, col("doc_id"), col("lang"), rates)
        .select(col("doc_id"), col("lang")).transform(graft.Tables.ordered(col("doc_id")))
    }),

    // sequence packing: docs -> ~2000-token training bins in doc_id order
    "corpus_pack" -> ((s, dir) => {
      TextOps.packBins(
          tf(s, dir, "documents").select(col("doc_id"), col("text")), 2000L)
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .transform(graft.Tables.ordered(col("bin")))
    }),

    // deterministic epoch shuffle: every doc gets a reproducible
    // (shard, pos) address from a salted hash — replayable permutation,
    // unlike orderBy(rand())
    "corpus_shuffle_shard" -> ((s, dir) => {
      Layout.shuffleShard(
          t(s, dir, "documents").select(col("doc_id")), col("doc_id"),
          nShards = 8)
        .transform(graft.Tables.ordered(col("shard"), col("pos")))
    }),

    // budget-capped data selection: longest documents first (priority =
    // n_chars descending, doc_id tiebreak) until the 10k-token budget is
    // spent — the distributed-cumsum sibling of corpus_pack
    "corpus_budget_select" -> ((s, dir) => {
      val items = tf(s, dir, "documents").select(col("doc_id"),
        ((lit(10000000L) - col("n_chars")) * lit(1000000L) + col("doc_id"))
          .as("pr"),
        TextOps.tokenCount(col("text")).as("n_tokens"))
      TextOps.budgetSelect(items, budget = 10000L)
        .select(col("doc_id"), col("n_tokens"), col("tokens_before"))
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    // stable global example numbering WITHOUT a global sort: the
    // two-pass range-shard trick (per-shard counts -> driver prefix
    // offsets -> shard-local row_number), plan-guarded against a
    // single-task window; must equal row_number() OVER (ORDER BY doc_id)
    "corpus_rownum" -> ((s, dir) => {
      Layout.globalRowNumber(
          t(s, dir, "documents").select(col("doc_id")), col("doc_id"))
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    // Z-ORDER key: bit-interleave two dimensions so range-clustering on
    // one key yields compact rectangles in both — the layout key is
    // deterministic bit math, checked value-by-value here; the file
    // clustering property itself is spec-gated (LayoutSpec)
    "layout_zorder" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          Layout.zValue((col("doc_id") % 256).cast("int"),
            (col("n_chars") % 256).cast("int"), bits = 8).as("z"))
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    // next-action training-example construction: per user-ordered event
    // stream, (up-to-3-previous-events context, next event) pairs
    // aggregated into a transition-pattern frequency table — the SFT
    // example-shaping step over behavioral logs. One window pass on the
    // natural user_id partitioning, then a map-side-combinable count.
    "events_trajectories" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      graft.Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("ctx", concat_ws(">",
          lag(col("event_type"), 3).over(w),
          lag(col("event_type"), 2).over(w),
          lag(col("event_type"), 1).over(w)))
        .groupBy(col("ctx"), col("event_type").as("next_event"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("ctx"), col("next_event")).limit(100)
    }),

    // first-order Markov transition matrix over per-user event streams:
    // counts + row-normalized probabilities per (prev -> next) pair —
    // the behavioral-prior readout next to events_trajectories' pattern
    // table. One lag window on the natural user_id partitioning; the
    // probability normalizer is a window over the ALREADY-AGGREGATED
    // k×k transition table (bounded by event-type cardinality, not the
    // log), so the corpus shuffles exactly once.
    "events_transitions" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val trans = graft.Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("prev"), col("event_type").as("nxt"))
        .groupBy(col("prev"), col("nxt")).agg(count(lit(1)).as("n"))
      val wp = org.apache.spark.sql.expressions.Window.partitionBy(col("prev"))
      trans
        .withColumn("p", col("n").cast("double") / sum(col("n")).over(wp))
        .transform(graft.Tables.ordered(col("prev"), col("nxt")))
    }),

    // PMI collocation mining: adjacent-pair association strength against
    // the unigram model, df-capped (n >= 5) to kill PMI's hapax bias
    "text_pmi_bigrams" -> ((s, dir) => {
      TextOps.pmiBigrams(
        tf(s, dir, "documents").select(col("doc_id"), col("text")),
        minCount = 5L, k = 50)
    }),

    // CCNet-style per-LANGUAGE perplexity terciles (head/middle/tail) of
    // the bigram-LM mean NLL — the language-normalized "drop the tail"
    // curation signal; tercile position from the distinct score grid
    // (percent_rank semantics), never a per-language corpus window
    "quality_ccnet_buckets" -> ((s, dir) => {
      TextOps.ccnetBuckets(tf(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("text")))
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    // tokenizer fertility readout under the trained BPE merges: per
    // source, subword pieces per whitespace word and characters per
    // piece — the compression-rate evidence a tokenizer change ships
    // with. Encode is [[Bpe.segment]]'s scan-speed column fold; the
    // aggregation is three exact long sums per source; the oracle
    // re-learns the merges and replays the whole encode in CTEs.
    "text_fertility" -> ((s, dir) => {
      val docs = tf(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
      val merges = graft.ext.Bpe.train(
        docs.select(col("doc_id"), col("text")), nMerges = 10)
      docs.select(col("source"),
          TextOps.tokenCount(col("text")).cast("long").as("w"),
          size(split(graft.ext.Bpe.segment(col("text"), merges), " "))
            .cast("long").as("p"),
          length(regexp_replace(col("text"), "\\s+", "")).cast("long").as("ch"))
        .groupBy(col("source"))
        .agg(sum(col("w")).as("n_words"), sum(col("p")).as("n_pieces"),
          sum(col("ch")).as("n_chars"))
        .withColumn("fertility",
          col("n_pieces").cast("double") / col("n_words"))
        .withColumn("chars_per_piece",
          col("n_chars").cast("double") / col("n_pieces"))
        .transform(graft.Tables.ordered(col("source")))
    }),

    // Kneser–Ney-smoothed bigram NLL — the continuation-diversity
    // perplexity signal next to the add-one text_bigram_nll; all model
    // statistics derive from ONE global bigram count table
    "text_kn_nll" -> ((s, dir) => {
      TextOps.knNll(
          tf(s, dir, "documents").select(col("doc_id"), col("text")))
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    // PSI distribution drift between two corpus epochs (doc_id parity as
    // the stand-in) over 100-char length bins — the "did my corpus mix
    // shift" monitor; one grouped agg collapses the corpus to the bin
    // grid before any arithmetic
    "quality_psi" -> ((s, dir) => {
      TextOps.psiDrift(tf(s, dir, "documents"),
        (col("doc_id") % 2).cast("int"),
        expr("n_chars div 100"))
    }),

    // effective sample size of the DSIR importance weights — the "how
    // many docs is my reweighted corpus really worth" readout that
    // decides whether a resample is viable; weights are max-shifted
    // before exp so the estimator is overflow-safe at any corpus size,
    // and each exp term is rounded to 9 dp and summed as DECIMAL so the
    // two sums are partition-order independent
    "sample_ess" -> ((s, dir) => {
      // pinned: dsirWeights pins its internal bigram frame but the
      // scoring joins ABOVE that pin still re-run per consumer, and
      // this query consumes wts twice (max broadcast + the moment
      // sums) — census read 4 jobs / 2.1s one-shot, halved pinned
      val wts = TextOps.dsirWeights(
        tf(s, dir, "documents").select(col("doc_id"), col("text"), col("source")),
        col("source").isin("src0", "src1", "src2", "src3"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val m = wts.agg(max(col("log_weight")).as("mx"))
      wts.crossJoin(broadcast(m))
        .select(
          round(exp(col("log_weight") - col("mx")), 9)
            .cast(org.apache.spark.sql.types.DecimalType(28, 9)).as("e1"),
          round(exp((col("log_weight") - col("mx")) * 2), 9)
            .cast(org.apache.spark.sql.types.DecimalType(28, 9)).as("e2"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("e1")).cast("double").as("s1"),
          sum(col("e2")).cast("double").as("s2"))
        .select(col("n_docs"),
          (col("s1") * col("s1") / col("s2")).as("ess"),
          (col("s1") * col("s1") / col("s2") / col("n_docs")).as("ess_frac"))
    }),

    // CORPUS CARD: the one-stop dataset datasheet (docs/tokens/chars,
    // exact-dup rate via distinct fingerprints, quality yield, language
    // mix) — what a training-data release ships with. ONE pass computes
    // every per-doc signal; the fingerprint distinct is the only second
    // shuffle; ratios are single IEEE divisions of exact longs.
    "corpus_card" -> ((s, dir) => {
      val base = tf(s, dir, "documents").select(col("lang"),
        TextOps.tokenCount(col("text")).cast("long").as("tok"),
        col("n_chars"),
        TextOps.fingerprint(col("text")).as("fp"),
        when(TextOps.qualityKeep(col("text")), 1L).otherwise(0L).as("keep"))
      val g = base.agg(count(lit(1)).as("docs"), sum(col("tok")).as("toks"),
        sum(col("n_chars")).as("chars"),
        countDistinct(col("fp")).as("fps"), sum(col("keep")).as("keeps"))
      val global = g.selectExpr(
        """stack(5,
          |  'docs',   docs,  CAST(NULL AS DOUBLE),
          |  'tokens', toks,  CAST(NULL AS DOUBLE),
          |  'chars',  chars, CAST(NULL AS DOUBLE),
          |  'distinct_fingerprints', fps,   CAST(fps AS DOUBLE) / docs,
          |  'quality_keep',          keeps, CAST(keeps AS DOUBLE) / docs
          |) AS (metric, n, ratio)""".stripMargin)
      val langs = base.groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(g.select(col("docs"))))
        .select(concat(lit("lang_"), col("lang")).as("metric"), col("n"),
          (col("n").cast("double") / col("docs")).as("ratio"))
      global.unionByName(langs).transform(graft.Tables.ordered(col("metric")))
    }),

    // quality-gate ABLATION: per sub-rule, how many docs it rejects and
    // how many ONLY it rejects — the evidence for loosening/tightening
    // individual Gopher thresholds. One corpus pass computes all four
    // rule verdicts; the 4x2 readout unpivots via stack.
    "quality_gate_ablation" -> ((s, dir) => {
      val txt = col("text")
      val nTok = TextOps.tokenCount(txt)
      val meanLen =
        length(regexp_replace(trim(txt), "\\s+", "")).cast("double") / nTok
      val flags = tf(s, dir, "documents").select(
        nTok.between(10, 5000).as("r1"),
        meanLen.between(2.0, 12.0).as("r2"),
        (TextOps.stopRatio(txt, TextOps.defaultStopwords) >= 0.01).as("r3"),
        (TextOps.punctRatio(txt) <= 0.2).as("r4"))
      def fails(k: Int) = sum(when(!col(s"r$k"), 1L).otherwise(0L)).as(s"f$k")
      def unique(k: Int) = sum(when((1 to 4).map(i =>
          if (i == k) !col(s"r$i") else col(s"r$i")).reduce(_ && _), 1L)
        .otherwise(0L)).as(s"u$k")
      flags
        .agg(fails(1), fails(2), fails(3), fails(4),
          unique(1), unique(2), unique(3), unique(4))
        .select(expr(
          """stack(4,
            |  'token_range',  f1, u1,
            |  'mean_tok_len', f2, u2,
            |  'stop_ratio',   f3, u3,
            |  'punct_ratio',  f4, u4) AS (rule, n_fail, n_unique_fail)""".stripMargin))
        .transform(graft.Tables.ordered(col("rule")))
    }),

    // robust median/MAD outlier gate over document length — the
    // heavy-tail-safe quality filter; EXACT median via grid-CDF order
    // statistics (two tiny grid aggs), never a global sort
    "quality_mad_outliers" -> ((s, dir) => {
      // t, not tf: the per-row work is one long cast, so the fanout
      // repartition would add a full-table exchange to BOTH corpus
      // reads (grid build + output pass) for nothing — this query is
      // exchange-count-bound, not CPU-bound
      TextOps.madOutliers(
          t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
          col("n_chars"))
        .transform(graft.Tables.ordered(col("doc_id")))
    }),

    // snapshot diff between corpus versions: deletions (id%10=3),
    // content edits (id%5=1), additions (id%25=0 re-keyed) — classified
    // purely by fingerprint comparison over a slim full-outer join
    "corpus_diff" -> ((s, dir) => {
      // base feeds the diff AND both branches of the synthetic next
      // epoch: pin one scan (caches are swept by the caller)
      val base = tf(s, dir, "documents").select(col("doc_id"), col("text"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val next = base.filter(col("doc_id") % 10 =!= 3)
        .withColumn("text",
          when(col("doc_id") % 5 === 1, concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
        .unionByName(base.filter(col("doc_id") % 25 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      Curation.snapshotDiff(base, next)
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"),
          min(col("doc_id")).as("id_min"), max(col("doc_id")).as("id_max"))
        .transform(graft.Tables.ordered(col("status")))
    }),

    // change-log compaction: latest state per entity (MERGE INTO view)
    "cdc_latest" -> ((s, dir) => {
      graft.pipeline.Cdc.latestSnapshot(
          graft.Tables.events(s, dir), "user_id", "ts", "event_id")
        .select(col("user_id"), col("ts"), col("event_type"), col("value"))
        .transform(graft.Tables.ordered(col("user_id")))
    }),

    // TIME TRAVEL: per-user state as of Jan 15 (mid-history) — only
    // the history prefix is scanned (ts filter pushes to the scan);
    // spec-asserted equal to the scd2 version covering the cut
    "cdc_snapshot_at" -> ((s, dir) => {
      graft.pipeline.Cdc.snapshotAsOf(
          graft.Tables.events(s, dir), "user_id", "ts", "event_id",
          lit("2024-01-15 00:00:00").cast("timestamp"))
        .select(col("user_id"), col("ts"), col("event_type"), col("value"))
        .transform(graft.Tables.ordered(col("user_id")))
    }),

    // MERGE INTO: apply an I/U/D changeset (odd event_ids, op derived
    // deterministically) to the even-event_id base snapshot — final op
    // per key wins, D drops, I/U replace, untouched rows pass through
    "cdc_merge" -> ((s, dir) => {
      val ev = graft.Tables.events(s, dir)
      val base = graft.pipeline.Cdc.latestSnapshot(
          ev.filter(col("event_id") % 2 === 0), "user_id", "ts", "event_id")
        .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      val changes = ev.filter(col("event_id") % 2 === 1)
        .withColumn("op",
          when(col("user_id") % 7 === 0, "D")
            .when(col("event_id") % 3 === 0, "I").otherwise("U"))
      graft.pipeline.Cdc.applyChangeset(
          base, changes, "user_id", "ts", "event_id", "op")
        .transform(graft.Tables.ordered(col("user_id")))
    }),

    // SCD-2 history: every change versioned [valid_from, valid_to)
    "cdc_scd2" -> ((s, dir) => {
      graft.pipeline.Cdc.scd2(
          graft.Tables.events(s, dir), "user_id", "ts", "event_id")
        .select(col("user_id"), col("event_id"), col("valid_from"),
          col("valid_to"), col("is_current"), col("value"))
        .transform(graft.Tables.ordered(col("user_id"), col("valid_from"), col("event_id")))
    }),

    // incremental aggregate maintenance: the 80% "materialized" base is
    // merged with the 20% delta WITHOUT rescanning base history; the
    // oracle recomputes from scratch over the full log — incremental
    // refresh must be indistinguishable from recompute
    "cdc_incremental_agg" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val base = graft.pipeline.Cdc.aggShape(
        orders.filter(col("o_orderkey") % 5 =!= 0), "o_custkey", "o_totalprice")
      val delta = orders.filter(col("o_orderkey") % 5 === 0)
      graft.pipeline.Cdc.incrementalAgg(base, delta, "o_custkey", "o_totalprice")
        .select(col("o_custkey"), col("n"),
          col("total").cast("double").as("total_d"))
        .transform(graft.Tables.ordered(col("o_custkey")))
    }),

    // per-GROUP sketching: one bounded SpaceSaving buffer per source,
    // map-side combined — "top terms per domain" at corpus scale without
    // shuffling the raw term stream
    "text_topterms_by_source" -> ((s, dir) => {
      import s.implicits._
      val agg = new graft.functions.SpaceSaving(1 << 20)
      tf(s, dir, "documents")
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("term"))
        .as[(String, String)]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(agg.toColumn.name("hh"))
        .flatMap { case (src, hh) => hh.take(5).map(h => (src, h.item, h.count)) }
        .toDF("source", "term", "n")
        .transform(graft.Tables.ordered(col("source"), col("n").desc, col("term")))
    }),

    "docs_by_source" -> ((s, dir) => {
      // 2-column scan + map-combinable agg: fanout only added a
      // full-table shuffle (text bodies included) ahead of the
      // partial aggregation (census: 4 stages/42 tasks -> 3 stages/10
      // tasks, 0.46s -> 0.31s)
      t(s, dir, "documents")
        .select(col("source"), col("n_chars"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          round(sum(col("n_chars")).cast("double") / count(lit(1)), 4)
            .as("avg_chars"))
        .transform(graft.Tables.ordered(col("source")))
    })
  )

  /** DuckDB twin of [[Similarity.kMeans]](k, iters): the Lloyd loop
    * unrolled into chained CTEs. Every arithmetic step mirrors the Spark
    * side exactly — hash-ordered init (portable md5 hash), per-row
    * squared-L2 argmin `vv - 2 v·c + c·c` with lower-index tie-break
    * (row_number ORDER BY d, c == Spark's min-struct), DECIMAL(20,10)
    * per-dimension M-step sums cast to double over the count, empty
    * cells keeping their previous centroid (LEFT JOIN + COALESCE). All
    * float ops are IEEE doubles evaluated in the same order (list_sum and
    * the codegen DotProduct both fold left-to-right), so assignments are
    * bit-identical.
    */
  /** DuckDB twin of [[Similarity.powerIterationPC]]: replays every power
    * iteration with the same 8-dp-decimal dot rounding, exact decimal
    * component sums, exact decimal norm², and IEEE division — the
    * direction vector entering each iteration is bit-identical to the
    * Spark side's driver state. */
  private def pcaOracleSql(iters: Int, dim: Int = 64): String = {
    val ctes = scala.collection.mutable.ArrayBuffer(
      "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
      s"v0 AS (SELECT list_transform(range(1, $dim + 1), i -> 1.0 / sqrt(${dim}.0)) AS vv)")
    for (i <- 1 to iters) {
      ctes += s"""s$i AS (
         |  SELECT e.vec_id, e.v,
         |    CAST(round(list_sum(list_transform(list_zip(e.v, p.vv), z -> z[1]*z[2])), 8) AS DECIMAL(28,8)) AS s
         |  FROM e CROSS JOIN v${i - 1} p)""".stripMargin
      ctes += s"""w$i AS (
         |  SELECT pos, CAST(SUM(CAST(s * x AS DECIMAL(38,12))) AS DOUBLE) AS w
         |  FROM (SELECT s, i - 1 AS pos, v[i] AS x FROM s$i, UNNEST(range(1, len(v) + 1)) AS t(i))
         |  GROUP BY pos)""".stripMargin
      ctes += s"n$i AS (SELECT CAST(SUM(CAST(w*w AS DECIMAL(38,12))) AS DOUBLE) AS n2 FROM w$i)"
      ctes += s"v$i AS (SELECT (SELECT list(w / sqrt(n$i.n2) ORDER BY pos) FROM w$i, n$i) AS vv)"
    }
    "WITH " + ctes.mkString(",\n") +
      s"""
         |SELECT e.vec_id, round(list_sum(list_transform(list_zip(e.v, p.vv), z -> z[1]*z[2])), 6) AS proj
         |FROM e CROSS JOIN v$iters p ORDER BY vec_id""".stripMargin
  }

  private def kmeansOracleSql(k: Int, iters: Int): String = {
    def assign(name: String, cents: String) =
      s"""$name AS (
         |  SELECT vec_id, v, c AS cell FROM (
         |    SELECT ev.vec_id, ev.v, cb.c,
         |      row_number() OVER (PARTITION BY ev.vec_id ORDER BY
         |        ev.vv - 2.0*list_sum(list_transform(list_zip(ev.v, cb.cv), z -> z[1]*z[2])) + cb.cc,
         |        cb.c) AS rn
         |    FROM ev CROSS JOIN (
         |      SELECT c, cv, list_sum(list_transform(cv, x -> x*x)) AS cc FROM $cents) cb)
         |  WHERE rn = 1)""".stripMargin
    def mstep(name: String, a: String, prev: String) =
      s"""$name AS (
         |  SELECT p.c, COALESCE(m.cv, p.cv) AS cv
         |  FROM $prev p LEFT JOIN (
         |    SELECT cell AS c, list(mx ORDER BY pos) AS cv FROM (
         |      SELECT cell, pos, CAST(SUM(CAST(x AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*) AS mx
         |      FROM (SELECT cell, i - 1 AS pos, v[i] AS x
         |            FROM $a, UNNEST(range(1, len(v) + 1)) AS t(i))
         |      GROUP BY cell, pos) GROUP BY cell) m ON p.c = m.c)""".stripMargin
    val ctes = scala.collection.mutable.ArrayBuffer(
      "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
      "ev AS (SELECT vec_id, v, list_sum(list_transform(v, x -> x*x)) AS vv FROM e)",
      s"""c0 AS (SELECT CAST(row_number() OVER (ORDER BY h, vec_id) - 1 AS INTEGER) AS c, v AS cv
         |       FROM (SELECT vec_id, v, ('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,8))::BIGINT AS h
         |             FROM e ORDER BY h, vec_id LIMIT $k))""".stripMargin)
    var prev = "c0"
    for (i <- 1 to iters) {
      ctes += assign(s"a$i", prev)
      ctes += mstep(s"c$i", s"a$i", prev)
      prev = s"c$i"
    }
    ctes += assign("af", prev)
    "WITH " + ctes.mkString(",\n") +
      "\nSELECT vec_id, cell FROM af ORDER BY vec_id"
  }

  /** DuckDB twin of [[Similarity.embedOutliers]]: the same Lloyd CTE
    * chain as [[kmeansOracleSql]] (so centroids are the trained ones),
    * then the final-assignment distance re-derived with the identical
    * IEEE expression, 6-dp decimal rounding, exact per-cell moment sums,
    * and the mean + sigmas·σ gate token-for-token as the Spark side. */
  private def embedOutliersOracleSql(k: Int, iters: Int,
      sigmas: String): String = {
    val base = kmeansOracleSql(k, iters)
    val ctes = base.substring(0, base.lastIndexOf("\nSELECT"))
    // mean / msq as single IEEE expressions of the exact sums
    val mean = "(CAST(s.s1 AS DOUBLE) / s.n)"
    val msq = "(CAST(s.s2 AS DOUBLE) / s.n)"
    s"""$ctes,
       |cbf AS (SELECT c, cv, list_sum(list_transform(cv, x -> x*x)) AS cc FROM c$iters),
       |fin AS (
       |  SELECT a.vec_id, a.cell,
       |    CAST(round(greatest(
       |      list_sum(list_transform(a.v, x -> x*x))
       |        - 2.0*list_sum(list_transform(list_zip(a.v, cb.cv), z -> z[1]*z[2]))
       |        + cb.cc, 0.0), 6) AS DECIMAL(18,6)) AS rd
       |  FROM af a JOIN cbf cb ON cb.c = a.cell),
       |st AS (
       |  SELECT cell, SUM(rd) AS s1, SUM(CAST(rd*rd AS DECIMAL(38,12))) AS s2,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM fin GROUP BY 1)
       |SELECT f.vec_id, f.cell, CAST(f.rd AS DOUBLE) AS dist,
       |  CAST(f.rd AS DOUBLE) > $mean + $sigmas * sqrt(greatest($msq - $mean * $mean, 0.0)) AS is_outlier
       |FROM fin f JOIN st s ON s.cell = f.cell
       |ORDER BY f.vec_id""".stripMargin
  }

  /** Target mixture for [[Sampling.mixtureRates]]; shared between the
    * Spark query and its SQL oracle so they can never drift. */
  private val mixtureTargets =
    Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)

  /** DuckDB twin of [[graft.ext.Bpe.train]](nMerges): the merge loop
    * unrolled into chained CTEs, one (pair-count → argmax → replace)
    * round per merge. Exactness hinges on two shared contracts: the
    * two-space sentinel symbol layout makes the literal replace() scan
    * (left-to-right, non-overlapping — identical in both engines) see a
    * full boundary at every occurrence, and the argmax total order
    * (count DESC, pair ASC over ASCII strings) is engine-independent. */
  /** The merge-training CTE chain shared by [[bpeOracleSql]] and
    * [[bpeEncodeOracleSql]]: w0 (word-freq table in sentinel layout),
    * then per round k a one-row argmax t$k and the merged table w${k+1}. */
  private def bpeCtes(nMerges: Int): String = {
    // AS MATERIALIZED throughout: each round references its w$k TWICE
    // (pair-count + replace), so DuckDB's per-reference CTE inlining
    // re-runs the whole chain exponentially (measured 48s -> 0.2s for
    // the merges oracle at sf0.1); materialization changes nothing
    // semantically (verified identical results)
    val w0 =
      """w0 AS MATERIALIZED (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS n,
        |    '  ' || array_to_string(list_transform(range(1, len(w) + 1), i -> w[i]), '  ') || '  ' AS syms
        |  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM documents)
        |  GROUP BY w)""".stripMargin
    def round(k: Int) =
      s"""t$k AS MATERIALIZED (
         |  SELECT $k AS rank, pair, c FROM (
         |    SELECT pair, CAST(SUM(n) AS BIGINT) AS c FROM (
         |      SELECT n, unnest(list_transform(range(1, len(ss)), i -> ss[i] || ' ' || ss[i+1])) AS pair
         |      FROM (SELECT n, regexp_split_to_array(trim(syms), '\\s+') AS ss FROM w$k))
         |    GROUP BY pair)
         |  ORDER BY c DESC, pair LIMIT 1),
         |w${k + 1} AS MATERIALIZED (
         |  SELECT w, n,
         |    replace(syms,
         |      ' ' || split_part(pair, ' ', 1) || '  ' || split_part(pair, ' ', 2) || ' ',
         |      ' ' || split_part(pair, ' ', 1) || split_part(pair, ' ', 2) || ' ') AS syms
         |  FROM w$k CROSS JOIN t$k)""".stripMargin
    s"""$w0,
       |${(0 until nMerges).map(round).mkString(",\n")}""".stripMargin
  }

  private def bpeOracleSql(nMerges: Int): String = {
    val union = (0 until nMerges).map(k => s"SELECT * FROM t$k")
      .mkString("\n  UNION ALL ")
    s"""WITH ${bpeCtes(nMerges)}
       |SELECT rank, split_part(pair, ' ', 1) AS lhs,
       |  split_part(pair, ' ', 2) AS rhs, c AS n
       |FROM ($union) ORDER BY rank""".stripMargin
  }

  /** DuckDB twin of [[graft.ext.Bpe.segment]] under oracle-retrained
    * merges: each doc rendered word-by-word into the two-space sentinel
    * layout (word strings concatenated directly, leaving 4 spaces at
    * word boundaries so no merge pattern can match across words), then
    * the nMerges replaces applied in rank order as ONE nested scalar
    * chain, then whitespace collapsed exactly like the Spark side. */
  private def bpeEncodeOracleSql(nMerges: Int): String = {
    def find(a: String) =
      s"' ' || split_part($a.pair, ' ', 1) || '  ' || split_part($a.pair, ' ', 2) || ' '"
    def repl(a: String) =
      s"' ' || split_part($a.pair, ' ', 1) || split_part($a.pair, ' ', 2) || ' '"
    val chain = (0 until nMerges).foldLeft("d.syms") { (acc, k) =>
      s"replace($acc, ${find(s"m$k")}, ${repl(s"m$k")})"
    }
    val joins = (0 until nMerges).map(k => s"CROSS JOIN t$k m$k").mkString(" ")
    s"""WITH ${bpeCtes(nMerges)},
       |docenc AS MATERIALIZED (
       |  SELECT doc_id, array_to_string(list_transform(
       |      regexp_split_to_array(trim(text), '\\s+'),
       |      w -> '  ' || array_to_string(list_transform(range(1, len(w) + 1), i -> w[i]), '  ') || '  '),
       |    '') AS syms
       |  FROM documents)
       |SELECT d.doc_id, trim(regexp_replace($chain, ' +', ' ', 'g')) AS encoded
       |FROM docenc d $joins ORDER BY d.doc_id""".stripMargin
  }

  /** DuckDB twin of the text_fertility query: re-learns the merges via
    * [[bpeCtes]], replays [[graft.ext.Bpe.segment]]'s replace chain per
    * document (same sentinel layout as [[bpeEncodeOracleSql]]), then
    * aggregates exact long sums per source; the two ratios are single
    * IEEE divisions of those exact sums. */
  private def fertilityOracleSql(nMerges: Int): String = {
    def find(a: String) =
      s"' ' || split_part($a.pair, ' ', 1) || '  ' || split_part($a.pair, ' ', 2) || ' '"
    def repl(a: String) =
      s"' ' || split_part($a.pair, ' ', 1) || split_part($a.pair, ' ', 2) || ' '"
    val chain = (0 until nMerges).foldLeft("d.syms") { (acc, k) =>
      s"replace($acc, ${find(s"m$k")}, ${repl(s"m$k")})"
    }
    val joins = (0 until nMerges).map(k => s"CROSS JOIN t$k m$k").mkString(" ")
    s"""WITH ${bpeCtes(nMerges)},
       |docenc AS MATERIALIZED (
       |  SELECT source,
       |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS w,
       |    CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT) AS ch,
       |    array_to_string(list_transform(
       |      regexp_split_to_array(trim(text), '\\s+'),
       |      wd -> '  ' || array_to_string(list_transform(range(1, len(wd) + 1), i -> wd[i]), '  ') || '  '),
       |    '') AS syms
       |  FROM documents),
       |enc AS (
       |  SELECT source, w, ch,
       |    CAST(len(regexp_split_to_array(
       |      trim(regexp_replace($chain, ' +', ' ', 'g')), '\\s+')) AS BIGINT) AS p
       |  FROM docenc d $joins)
       |SELECT source,
       |  CAST(SUM(w) AS BIGINT) AS n_words,
       |  CAST(SUM(p) AS BIGINT) AS n_pieces,
       |  CAST(SUM(ch) AS BIGINT) AS n_chars,
       |  CAST(SUM(p) AS DOUBLE) / CAST(SUM(w) AS BIGINT) AS fertility,
       |  CAST(SUM(ch) AS DOUBLE) / CAST(SUM(p) AS BIGINT) AS chars_per_piece
       |FROM enc GROUP BY source ORDER BY source""".stripMargin
  }

  // DuckDB twin of [[Classifier.lrTrainScore]] (4 GD iterations,
  // lr = 1.0): the weight trajectory is unrolled into one CTE pair per
  // iteration — g<i> computes the exact DECIMAL(20,9) gradient sums under
  // weights w<i-1>, w<i> applies the IEEE-double update — ending in a
  // scoring pass under the final weights. Every expression (margin chain,
  // 9-dp sigmoid fence, per-term rounding) mirrors the Spark side
  // token-for-token, so the whole training run is hash-checked.
  private val lrScoreSql: String = {
    val iters = 8
    val lr = "5.0"
    val wNames = Seq("a", "b", "c", "d")
    def sigmoid = // margin chain left-associated exactly like the Spark side
      "round(1.0/(1.0+exp(-(w.a*f.x0 + w.b*f.x1 + w.c*f.x2 + w.d*f.x3))), 9)"
    val feats =
      """feats AS (SELECT doc_id,
        |  1.0 AS x0,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) / 100.0 AS x1,
        |  CAST(length(regexp_replace(trim(text), '\s+', '', 'g')) AS DOUBLE)
        |    / len(regexp_split_to_array(trim(text), '\s+')) / 10.0 AS x2,
        |  CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |    tk -> tk IN ('the','a','of','and','to','in'))) AS DOUBLE)
        |    / len(regexp_split_to_array(trim(text), '\s+')) AS x3,
        |  CASE WHEN n_chars >= 300 THEN 1.0 ELSE 0.0 END AS y
        |FROM documents)""".stripMargin
    val w0 = s"w0 AS (SELECT ${wNames.map(n => s"0.0 AS $n").mkString(", ")})"
    val steps = (1 to iters).map { i =>
      val grads = (0 until 4).map(j =>
        s"sum(CAST(round(($sigmoid - f.y) * f.x$j, 9) AS DECIMAL(20,9))) AS g$j").mkString(",\n  ")
      val upd = wNames.zipWithIndex.map { case (n, j) =>
        s"w.$n - $lr * CAST(g.g$j AS DOUBLE)/g.n AS $n" }.mkString(", ")
      s"""g$i AS (SELECT $grads,
         |  count(*) AS n FROM feats f CROSS JOIN w${i - 1} w),
         |w$i AS (SELECT $upd FROM w${i - 1} w CROSS JOIN g$i g)""".stripMargin
    }
    s"""WITH $feats,
       |$w0,
       |${steps.mkString(",\n")}
       |SELECT f.doc_id, round($sigmoid, 6) AS score,
       |  round($sigmoid, 6) >= 0.5 AS pred, CAST(f.y AS INT) AS label
       |FROM feats f CROSS JOIN w$iters w ORDER BY f.doc_id""".stripMargin
  }

  private lazy val curateExplainSql: String = {
      val g8 = (0 until 8).map(k => s"ws[i+$k]").mkString(" || ' ' || ")
      s"""WITH ${Extensions.plantedSql},
         |kept AS (
         |  SELECT doc_id, text FROM docs
         |  WHERE len(regexp_split_to_array(trim(text), '\\s+')) BETWEEN 10 AND 5000
         |    AND CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE)
         |      / len(regexp_split_to_array(trim(text), '\\s+')) BETWEEN 2.0 AND 12.0
         |    AND CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
         |      tk -> tk IN ('the','a','of','and','to','in'))) AS DOUBLE)
         |      / len(regexp_split_to_array(trim(text), '\\s+')) >= 0.01
         |    AND CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
         |      / length(text) <= 0.2),
         |fpk AS (
         |  SELECT MIN(doc_id) AS doc_id FROM (
         |    SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
         |    FROM kept)
         |  GROUP BY fp),
         |dd AS (SELECT k.doc_id, k.text FROM kept k JOIN fpk USING (doc_id)),
         |bench AS (
         |  SELECT array_to_string(regexp_split_to_array(trim(text), '\\s+')[5:24], ' ') AS text
         |  FROM documents WHERE doc_id % 50 = 7),
         |bsh AS (
         |  SELECT DISTINCT unnest(list_transform(range(1, len(ws) - 6), i -> $g8)) AS sh
         |  FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS ws FROM bench)),
         |csh AS (
         |  SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(ws) - 6), i -> $g8)) AS sh
         |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM dd)),
         |bad AS (SELECT DISTINCT doc_id FROM csh JOIN bsh USING (sh))
         |SELECT d.doc_id,
         |  CASE WHEN k.doc_id IS NULL THEN 'quality'
         |       WHEN f.doc_id IS NULL THEN 'duplicate'
         |       WHEN b.doc_id IS NOT NULL THEN 'contaminated'
         |       ELSE 'kept' END AS reason
         |FROM docs d
         |LEFT JOIN kept k ON d.doc_id = k.doc_id
         |LEFT JOIN fpk f ON d.doc_id = f.doc_id
         |LEFT JOIN bad b ON d.doc_id = b.doc_id
         |ORDER BY d.doc_id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    // Mirrors corpus_sketch_union: exact per-source and union distincts
    // hash-checked; the HLL estimates are Spark-side assertions expected
    // TRUE (estimates wobble sub-percent with merge order — ApproxSpec
    // pins the bound — far inside the 6% tolerance at lgConfigK=12)
    "corpus_sketch_union" ->
      """WITH per AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(COUNT(DISTINCT text) AS BIGINT) AS exact_distinct
        |  FROM documents GROUP BY source),
        |al AS (
        |  SELECT '(all)' AS source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(COUNT(DISTINCT text) AS BIGINT) AS exact_distinct
        |  FROM documents)
        |SELECT source, n_docs, exact_distinct, TRUE AS within_tol FROM per
        |UNION ALL
        |SELECT source, n_docs, exact_distinct, TRUE AS within_tol FROM al
        |ORDER BY source""".stripMargin,

    // Mirrors text_df_incremental — but from SCRATCH over the full
    // corpus: equality proves the incremental maintenance path
    "text_df_incremental" ->
      """WITH t AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents)
        |SELECT term, CAST(COUNT(*) AS BIGINT) AS df
        |FROM t GROUP BY term HAVING COUNT(*) >= 5 ORDER BY term""".stripMargin,

    "quality_lr_score" -> lrScoreSql,
    "embed_kmeans" -> kmeansOracleSql(k = 8, iters = 3),

    "embed_pca_project" -> pcaOracleSql(iters = 4),
    "embed_outliers" -> embedOutliersOracleSql(k = 8, iters = 3, sigmas = "2.0"),

    "text_bpe_merges" -> bpeOracleSql(nMerges = 10),
    "text_bpe_encode" -> bpeEncodeOracleSql(nMerges = 10),
    "text_fertility" -> fertilityOracleSql(nMerges = 10),

    // Mirrors the events_transitions window+agg chain; the probability is
    // one IEEE division of exact counts (the window SUM promotes to
    // HUGEINT in DuckDB but converts to binary64 exactly at these scales)
    "events_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (
        |  SELECT prev, event_type AS nxt, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM seq WHERE prev IS NOT NULL GROUP BY prev, event_type)
        |SELECT prev, nxt, n,
        |  CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev) AS p
        |FROM c ORDER BY prev, nxt""".stripMargin,

    // Mirrors TextOps.pmiBigrams: identical IEEE division chain inside
    // ln, rounded to 6 dp; (pmi DESC, w1, w2) is a total order
    "text_pmi_bigrams" ->
      """WITH toks AS (
        |  SELECT regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |bi AS (
        |  SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
        |         unnest(list_transform(range(1, len(ws)), i -> ws[i+1])) AS w2
        |  FROM toks WHERE len(ws) >= 2),
        |bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n FROM bi GROUP BY w1, w2),
        |uc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c
        |       FROM (SELECT unnest(ws) AS w FROM toks) GROUP BY w),
        |tb AS (SELECT CAST(SUM(n) AS BIGINT) AS tot_b FROM bc),
        |tu AS (SELECT CAST(SUM(c) AS BIGINT) AS tot_u FROM uc)
        |SELECT w1, w2, n,
        |  round(ln((CAST(n AS DOUBLE) / tot_b)
        |    / ((CAST(c1.c AS DOUBLE) / tot_u) * (CAST(c2.c AS DOUBLE) / tot_u))), 6) AS pmi
        |FROM bc JOIN uc c1 ON bc.w1 = c1.w JOIN uc c2 ON bc.w2 = c2.w
        |CROSS JOIN tb CROSS JOIN tu
        |WHERE n >= 5
        |ORDER BY pmi DESC, w1, w2 LIMIT 50""".stripMargin,

    // Mirrors TextOps.ccnetBuckets: the text_bigram_nll scoring chain,
    // then percent_rank per language (== the Spark side's grid CDF with
    // min-rank tie semantics); tercile edges compared as pctl*3 vs
    // integer literals so neither engine touches decimal division
    "quality_ccnet_buckets" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |bi AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
        |         unnest(list_transform(range(1, len(ws)), i -> ws[i+1])) AS w2
        |  FROM toks WHERE len(ws) >= 2),
        |c1t AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c1
        |        FROM (SELECT unnest(ws) AS w FROM toks) GROUP BY w),
        |bigt AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bi GROUP BY w1, w2),
        |v AS (SELECT CAST(COUNT(*) AS BIGINT) AS vocab FROM c1t),
        |scored AS (
        |  SELECT bi.doc_id,
        |    round(-ln((c12 + 1.0) / CAST(c1 + vocab AS DOUBLE)), 6)::DECIMAL(18,6) AS nll
        |  FROM bi JOIN bigt USING (w1, w2) JOIN c1t ON bi.w1 = c1t.w CROSS JOIN v),
        |doc AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |    CAST(SUM(nll) AS DOUBLE) AS sum_nll
        |  FROM scored GROUP BY doc_id),
        |sc AS (
        |  SELECT d.doc_id, lang, n_bigrams,
        |    round(sum_nll / n_bigrams, 6) AS ppl_score
        |  FROM doc d JOIN documents USING (doc_id)),
        |pr AS (
        |  SELECT doc_id, lang, n_bigrams, ppl_score,
        |    percent_rank() OVER (PARTITION BY lang ORDER BY ppl_score) AS pctl
        |  FROM sc)
        |SELECT doc_id, lang, n_bigrams, ppl_score, pctl,
        |  CASE WHEN pctl * 3 < 1 THEN 'head'
        |       WHEN pctl * 3 < 2 THEN 'middle' ELSE 'tail' END AS bucket
        |FROM pr ORDER BY doc_id""".stripMargin,

    // Mirrors TextOps.knNll: interpolated Kneser–Ney with d=0.75; the
    // probability chain's casts are written out so neither engine slips
    // into decimal arithmetic; per-occurrence -ln p rounded to 6 dp and
    // summed as DECIMAL(18,6) via cnt-weighting
    "text_kn_nll" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |bi AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
        |         unnest(list_transform(range(1, len(ws)), i -> ws[i+1])) AS w2
        |  FROM toks WHERE len(ws) >= 2),
        |bc AS (SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt
        |       FROM bi GROUP BY doc_id, w1, w2),
        |big AS (SELECT w1, w2, CAST(SUM(cnt) AS BIGINT) AS c12 FROM bc GROUP BY w1, w2),
        |ctx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS ctx,
        |          CAST(COUNT(*) AS BIGINT) AS fol FROM big GROUP BY w1),
        |bwd AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS bwd FROM big GROUP BY w2),
        |btot AS (SELECT CAST(COUNT(*) AS BIGINT) AS btot FROM big),
        |scored AS (
        |  SELECT bc.doc_id, bc.cnt,
        |    round(-ln((CAST(c12 AS DOUBLE) - 0.75) / ctx
        |      + 0.75 * CAST(fol AS DOUBLE) / ctx * (CAST(bwd AS DOUBLE) / btot)),
        |      6)::DECIMAL(18,6) AS nll
        |  FROM bc JOIN big USING (w1, w2) JOIN ctx USING (w1) JOIN bwd USING (w2)
        |  CROSS JOIN btot)
        |SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(nll * cnt) AS DOUBLE) AS kn_nll
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Mirrors TextOps.psiDrift over doc_id-parity epochs and 100-char
    // length bins: add-one smoothing on the union bin grid, 9-dp decimal
    // term sums
    "quality_psi" ->
      """WITH cnt AS (
        |  SELECT n_chars // 100 AS bin,
        |    CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
        |  FROM documents GROUP BY bin),
        |tot AS (SELECT CAST(SUM(na) AS BIGINT) AS ta, CAST(SUM(nb) AS BIGINT) AS tb,
        |          CAST(COUNT(*) AS BIGINT) AS nbins FROM cnt),
        |terms AS (
        |  SELECT nbins, ta, tb,
        |    round((CAST(na + 1 AS DOUBLE) / (ta + nbins) - CAST(nb + 1 AS DOUBLE) / (tb + nbins))
        |      * ln((CAST(na + 1 AS DOUBLE) / (ta + nbins)) / (CAST(nb + 1 AS DOUBLE) / (tb + nbins))),
        |      9)::DECIMAL(20,9) AS term
        |  FROM cnt CROSS JOIN tot)
        |SELECT MAX(nbins) AS n_bins, MAX(ta) AS n_a, MAX(tb) AS n_b,
        |  CAST(SUM(term) AS DOUBLE) AS psi
        |FROM terms""".stripMargin,

    // Mirrors corpus_card: same per-doc signals (quality_filter oracle's
    // gate expression, shared fingerprint definition), exact sums,
    // single-division ratios
    "corpus_card" ->
      """WITH base AS (
        |  SELECT lang,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS tok,
        |    n_chars,
        |    md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp,
        |    CASE WHEN
        |      len(regexp_split_to_array(trim(text), '\s+')) BETWEEN 10 AND 5000
        |      AND CAST(length(regexp_replace(trim(text), '\s+', '', 'g')) AS DOUBLE)
        |        / len(regexp_split_to_array(trim(text), '\s+')) BETWEEN 2.0 AND 12.0
        |      AND CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |        tk -> tk IN ('the','a','of','and','to','in'))) AS DOUBLE)
        |        / len(regexp_split_to_array(trim(text), '\s+')) >= 0.01
        |      AND CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
        |        / length(text) <= 0.2
        |    THEN 1 ELSE 0 END AS keep
        |  FROM documents),
        |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS docs,
        |        CAST(SUM(tok) AS BIGINT) AS toks,
        |        CAST(SUM(n_chars) AS BIGINT) AS chars,
        |        CAST(COUNT(DISTINCT fp) AS BIGINT) AS fps,
        |        CAST(SUM(keep) AS BIGINT) AS keeps FROM base)
        |SELECT metric, n, ratio FROM (
        |  SELECT 'docs' AS metric, docs AS n, CAST(NULL AS DOUBLE) AS ratio FROM g
        |  UNION ALL SELECT 'tokens', toks, CAST(NULL AS DOUBLE) FROM g
        |  UNION ALL SELECT 'chars', chars, CAST(NULL AS DOUBLE) FROM g
        |  UNION ALL SELECT 'distinct_fingerprints', fps,
        |    CAST(fps AS DOUBLE) / docs FROM g
        |  UNION ALL SELECT 'quality_keep', keeps,
        |    CAST(keeps AS DOUBLE) / docs FROM g
        |  UNION ALL
        |  SELECT 'lang_' || lang, CAST(COUNT(*) AS BIGINT),
        |    CAST(COUNT(*) AS DOUBLE) / MAX(docs)
        |  FROM base CROSS JOIN g GROUP BY lang)
        |ORDER BY metric""".stripMargin,

    // Mirrors graph_degrees over the pagerank oracle's edge derivation
    "graph_degrees" ->
      """WITH e AS (
        |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |d AS (
        |  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM
        |    (SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)
        |  GROUP BY node)
        |SELECT deg AS degree, CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |  CAST(SUM(node) AS BIGINT) AS id_sum
        |FROM d GROUP BY deg ORDER BY degree""".stripMargin,

    // Mirrors dedup_cluster_sizes over the shared recursive-CC oracle
    "dedup_cluster_sizes" ->
      s"""WITH RECURSIVE $pairsSql,
         |$compsSql,
         |csize AS (SELECT comp, CAST(COUNT(*) AS BIGINT) AS sz
         |          FROM comps GROUP BY comp)
         |SELECT sz AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
         |  CAST(SUM(comp) AS BIGINT) AS id_sum
         |FROM csize GROUP BY sz ORDER BY cluster_size""".stripMargin,

    // Mirrors quality_gate_ablation: the quality_filter oracle's four
    // sub-rule expressions, aggregated once and unpivoted
    "quality_gate_ablation" ->
      """WITH f AS (
        |  SELECT
        |    len(regexp_split_to_array(trim(text), '\s+')) BETWEEN 10 AND 5000 AS r1,
        |    CAST(length(regexp_replace(trim(text), '\s+', '', 'g')) AS DOUBLE)
        |      / len(regexp_split_to_array(trim(text), '\s+')) BETWEEN 2.0 AND 12.0 AS r2,
        |    CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      tk -> tk IN ('the','a','of','and','to','in'))) AS DOUBLE)
        |      / len(regexp_split_to_array(trim(text), '\s+')) >= 0.01 AS r3,
        |    CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
        |      / length(text) <= 0.2 AS r4
        |  FROM documents),
        |a AS (SELECT
        |  CAST(SUM(CASE WHEN NOT r1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        |  CAST(SUM(CASE WHEN NOT r2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
        |  CAST(SUM(CASE WHEN NOT r3 THEN 1 ELSE 0 END) AS BIGINT) AS f3,
        |  CAST(SUM(CASE WHEN NOT r4 THEN 1 ELSE 0 END) AS BIGINT) AS f4,
        |  CAST(SUM(CASE WHEN NOT r1 AND r2 AND r3 AND r4 THEN 1 ELSE 0 END) AS BIGINT) AS u1,
        |  CAST(SUM(CASE WHEN r1 AND NOT r2 AND r3 AND r4 THEN 1 ELSE 0 END) AS BIGINT) AS u2,
        |  CAST(SUM(CASE WHEN r1 AND r2 AND NOT r3 AND r4 THEN 1 ELSE 0 END) AS BIGINT) AS u3,
        |  CAST(SUM(CASE WHEN r1 AND r2 AND r3 AND NOT r4 THEN 1 ELSE 0 END) AS BIGINT) AS u4
        |  FROM f)
        |SELECT 'token_range' AS rule, f1 AS n_fail, u1 AS n_unique_fail FROM a
        |UNION ALL SELECT 'mean_tok_len', f2, u2 FROM a
        |UNION ALL SELECT 'stop_ratio', f3, u3 FROM a
        |UNION ALL SELECT 'punct_ratio', f4, u4 FROM a
        |ORDER BY rule""".stripMargin,

    // Mirrors TextOps.madOutliers: quantile_disc(0.5) IS the lower-median
    // order statistic the grid-CDF selects (index (n-1) div 2, verified);
    // the threshold multiply casts MAD to DOUBLE on both sides
    "quality_mad_outliers" ->
      """WITH s AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS sc FROM documents),
        |med AS (SELECT quantile_disc(sc, 0.5) AS med FROM s),
        |mad AS (SELECT quantile_disc(abs(sc - med), 0.5) AS mad
        |        FROM s CROSS JOIN med)
        |SELECT doc_id, sc AS score, med, mad,
        |  abs(sc - med) > 4.4478 * CAST(mad AS DOUBLE) AS is_outlier
        |FROM s CROSS JOIN med CROSS JOIN mad ORDER BY doc_id""".stripMargin,

    // Mirrors the sample_ess query: the sample_dsir_weights per-doc
    // log-weight chain, max-shifted exp terms rounded to 9 dp, decimal
    // sums, then the ESS ratio as one fixed IEEE chain
    "sample_ess" ->
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
        |docw AS (SELECT doc_id, CAST(SUM(lw) AS DOUBLE) AS log_weight
        |         FROM scored GROUP BY doc_id),
        |m AS (SELECT MAX(log_weight) AS mx FROM docw),
        |e AS (
        |  SELECT round(exp(log_weight - mx), 9)::DECIMAL(28,9) AS e1,
        |    round(exp((log_weight - mx) * 2), 9)::DECIMAL(28,9) AS e2
        |  FROM docw CROSS JOIN m),
        |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |        CAST(SUM(e1) AS DOUBLE) AS s1, CAST(SUM(e2) AS DOUBLE) AS s2 FROM e)
        |SELECT n_docs, s1 * s1 / s2 AS ess, s1 * s1 / s2 / n_docs AS ess_frac
        |FROM s""".stripMargin,

    // replays mixtureRates end-to-end: per-source counts, the largest
    // feasible downsample-only scale (min n_s/share_s), percent rates
    // (round half-up == DuckDB round for positive values), then the same
    // portable-hash filter as stratifiedHashSample
    "sample_mixture" -> {
      val tgt = mixtureTargets.toSeq.sortBy(_._1)
        .map { case (s, sh) => s"('$s', $sh)" }.mkString(", ")
      s"""WITH counts AS (
         |  SELECT source AS s, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM documents GROUP BY source),
         |tgt(s, share) AS (VALUES $tgt),
         |scale AS (SELECT MIN(n / share) AS sc FROM counts JOIN tgt USING (s)),
         |rates AS (
         |  SELECT s, LEAST(100, CAST(round(100.0 * share * sc / n) AS INTEGER)) AS rate
         |  FROM counts JOIN tgt USING (s) CROSS JOIN scale)
         |SELECT doc_id, source FROM documents JOIN rates ON source = rates.s
         |WHERE ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 100 < rate
         |ORDER BY doc_id""".stripMargin
    },

    "sample_temperature" ->
      """WITH counts AS (
        |  SELECT lang AS s, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM documents GROUP BY lang),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM counts),
        |p AS (SELECT s, n, pow(n / CAST(nn AS DOUBLE), 0.5) AS pw
        |      FROM counts CROSS JOIN tot),
        |z AS (SELECT list_sum(list(pw ORDER BY s)) AS z FROM p),
        |sh AS (SELECT s, n, pw / z.z AS share FROM p CROSS JOIN z),
        |scale AS (SELECT MIN(n / share) AS sc FROM sh),
        |rates AS (
        |  SELECT s, LEAST(100, CAST(round(100.0 * share * sc / n) AS INTEGER)) AS rate
        |  FROM sh CROSS JOIN scale)
        |SELECT doc_id, lang FROM documents JOIN rates ON lang = rates.s
        |WHERE ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 100 < rate
        |ORDER BY doc_id""".stripMargin,

    "text_vocab" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents)
        |SELECT term, CAST(COUNT(*) AS BIGINT) AS n_occ,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM terms GROUP BY term
        |HAVING COUNT(DISTINCT doc_id) >= 5 ORDER BY term""".stripMargin,

    "text_bigrams" ->
      """WITH bg AS (
        |  SELECT unnest(list_transform(range(1, len(ws)),
        |    i -> ws[i] || ' ' || ws[i+1])) AS bigram
        |  FROM (SELECT regexp_split_to_array(trim(text), '\s+') AS ws FROM documents))
        |SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
        |FROM bg GROUP BY bigram HAVING COUNT(*) >= 10 ORDER BY bigram""".stripMargin,

    "quality_confusion" ->
      """WITH f AS (
        |  SELECT CAST(CASE WHEN
        |    len(regexp_split_to_array(trim(text), '\s+')) BETWEEN 10 AND 5000
        |    AND CAST(length(regexp_replace(trim(text), '\s+', '', 'g')) AS DOUBLE)
        |      / len(regexp_split_to_array(trim(text), '\s+')) BETWEEN 2.0 AND 12.0
        |    AND CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      tk -> tk IN ('the','a','of','and','to','in'))) AS DOUBLE)
        |      / len(regexp_split_to_array(trim(text), '\s+')) >= 0.01
        |    AND CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
        |      / length(text) <= 0.2
        |  THEN 1 ELSE 0 END AS INTEGER) AS keep,
        |    CAST(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS INTEGER) AS seed
        |  FROM documents)
        |SELECT keep, seed, COUNT(*) AS n
        |FROM f GROUP BY keep, seed ORDER BY keep, seed""".stripMargin,

    "quality_filter" ->
      """SELECT doc_id,
        |CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER) AS n_tokens,
        |round(CAST(length(regexp_replace(trim(text), '\s+', '', 'g')) AS DOUBLE)
        |  / len(regexp_split_to_array(trim(text), '\s+')), 4) AS mean_tok_len,
        |CAST(CASE WHEN
        |  len(regexp_split_to_array(trim(text), '\s+')) BETWEEN 10 AND 5000
        |  AND CAST(length(regexp_replace(trim(text), '\s+', '', 'g')) AS DOUBLE)
        |    / len(regexp_split_to_array(trim(text), '\s+')) BETWEEN 2.0 AND 12.0
        |  AND CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |    tk -> tk IN ('the','a','of','and','to','in'))) AS DOUBLE)
        |    / len(regexp_split_to_array(trim(text), '\s+')) >= 0.01
        |  AND CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
        |    / length(text) <= 0.2
        |THEN 1 ELSE 0 END AS INTEGER) AS keep
        |FROM documents ORDER BY doc_id""".stripMargin,

    "quality_calibrated" ->
      """WITH s AS (
        |  SELECT doc_id, source,
        |    round(CAST(length(regexp_replace(trim(text), '\s+', '', 'g')) AS DOUBLE)
        |      / len(regexp_split_to_array(trim(text), '\s+')), 4) AS score
        |  FROM documents)
        |SELECT doc_id, source, score,
        |  percent_rank() OVER (PARTITION BY source ORDER BY score) AS pctl,
        |  CAST(CASE WHEN percent_rank() OVER (PARTITION BY source ORDER BY score)
        |    >= 0.2 THEN 1 ELSE 0 END AS INTEGER) AS keep
        |FROM s ORDER BY doc_id""".stripMargin,

    "corpus_curriculum" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CAST((CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END)
        |      + (CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END)
        |      + (CASE WHEN n_chars >= 800 THEN 1 ELSE 0 END) AS INTEGER) AS bucket,
        |    CAST(concat('0x', substr(md5('cur0:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
        |  FROM documents)
        |SELECT doc_id, bucket,
        |  CAST(row_number() OVER (ORDER BY (CAST(bucket AS BIGINT) << 32) | h, doc_id)
        |    AS BIGINT) AS rn
        |FROM s ORDER BY doc_id""".stripMargin,

    "sample_hash" ->
      """SELECT doc_id FROM documents
        |WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 10
        |ORDER BY doc_id""".stripMargin,

    "sample_stratified" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE CAST(concat('0x', substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT) % 100
        |  < CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 60 WHEN 'BUILDING' THEN 25
        |      WHEN 'FURNITURE' THEN 10 ELSE 0 END
        |ORDER BY c_custkey""".stripMargin,

    "sample_n_per_stratum" ->
      """SELECT c_custkey, c_mktsegment FROM (
        |  SELECT c_custkey, c_mktsegment, row_number() OVER (
        |    PARTITION BY c_mktsegment
        |    ORDER BY CAST(concat('0x', substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT),
        |      c_custkey) AS rn
        |  FROM customer)
        |WHERE rn <= 10 ORDER BY c_custkey""".stripMargin,

    "sample_split" ->
      """SELECT doc_id,
        |  CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS b
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "dedup_cluster" ->
      s"""WITH RECURSIVE $pairsSql,
         |$compsSql
         |SELECT id AS doc_id, comp AS cluster_id FROM comps ORDER BY doc_id""".stripMargin,

    "dedup_apply_cluster" ->
      s"""WITH RECURSIVE $pairsSql,
         |$compsSql
         |SELECT doc_id FROM docs
         |WHERE doc_id NOT IN (SELECT id FROM comps WHERE comp <> id)
         |ORDER BY doc_id""".stripMargin,

    "sample_split_clustered" ->
      s"""WITH RECURSIVE $pairsSql,
         |$compsSql,
         |lab AS (SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS cluster_id
         |        FROM docs d LEFT JOIN comps c ON d.doc_id = c.id)
         |SELECT doc_id, cluster_id,
         |  CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split
         |FROM (SELECT doc_id, cluster_id,
         |    CAST(concat('0x', substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS b
         |  FROM lab)
         |ORDER BY doc_id""".stripMargin,

    "dedup_apply_best" ->
      s"""WITH RECURSIVE $pairsSql,
         |$compsSql,
         |lab AS (
         |  SELECT d.doc_id, d.text, COALESCE(c.comp, d.doc_id) AS cluster_id
         |  FROM docs d LEFT JOIN comps c ON d.doc_id = c.id)
         |SELECT doc_id, cluster_id, CAST(length(text) AS BIGINT) AS n_chars FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY cluster_id ORDER BY length(text) DESC, doc_id) AS rn
         |  FROM lab)
         |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "dedup_apply_pairs" ->
      s"""WITH $pairsSql
         |SELECT doc_id FROM docs
         |WHERE doc_id NOT IN (SELECT j FROM jp)
         |ORDER BY doc_id""".stripMargin,

    "embed_centroid_assign" ->
      """WITH e AS (
        |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |cd AS (
        |  SELECT label, i,
        |    CAST(SUM(CAST(v[i] AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*) AS m
        |  FROM e CROSS JOIN range(1, 65) r(i) GROUP BY label, i),
        |c AS (SELECT label AS clabel, list(m ORDER BY i) AS cv FROM cd GROUP BY label),
        |cn AS (SELECT clabel, cv,
        |    sqrt(list_sum(list_transform(cv, x -> x * x))) AS cnrm FROM c),
        |n AS (SELECT vec_id, label, v,
        |    sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        |scored AS (
        |  SELECT vec_id, label, clabel,
        |    round(list_sum(list_transform(list_zip(v, cv), x -> x[1] * x[2]))
        |      / (nrm * cnrm), 4) AS cos
        |  FROM n CROSS JOIN cn)
        |SELECT vec_id, label, clabel AS assigned, cos FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY cos DESC, clabel DESC) AS rn
        |  FROM scored)
        |WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    "dedup_fingerprint" ->
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 300000 AS doc_id,
        |    regexp_replace(text, ' ', '  ', 'g') || ' !!' AS text
        |  FROM documents WHERE doc_id % 25 = 7)
        |SELECT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp,
        |  MIN(doc_id) AS keep_id, CAST(COUNT(*) AS BIGINT) AS n
        |FROM docs
        |GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY fp""".stripMargin,

    "dedup_contamination_score" -> {
      val g8 = (0 until 8).map(k => s"ws[i+$k]").mkString(" || ' ' || ")
      s"""WITH bench AS (
         |  SELECT array_to_string(regexp_split_to_array(trim(text), '\\s+')[5:24], ' ') AS text
         |  FROM documents WHERE doc_id % 50 = 7),
         |bsh AS (
         |  SELECT DISTINCT unnest(list_transform(range(1, len(ws) - 6), i -> $g8)) AS sh
         |  FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS ws FROM bench)),
         |csh AS (
         |  SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(ws) - 6), i -> $g8)) AS sh
         |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents)),
         |scored AS (
         |  SELECT c.doc_id, CAST(COUNT(*) AS INTEGER) AS n_shingles,
         |    CAST(COUNT(b.sh) AS BIGINT) AS n_shared
         |  FROM csh c LEFT JOIN bsh b USING (sh)
         |  GROUP BY c.doc_id)
         |SELECT doc_id, n_shingles, n_shared,
         |  round(CAST(n_shared AS DOUBLE) / n_shingles, 6) AS score
         |FROM scored WHERE n_shared > 0 ORDER BY doc_id""".stripMargin
    },

    "embed_dedup_apply" ->
      """WITH e0 AS (
        |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |e AS (
        |  SELECT * FROM e0
        |  UNION ALL SELECT vec_id + 100000, label, v FROM e0 WHERE vec_id % 25 = 0),
        |n AS (SELECT vec_id, label, v,
        |    sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        |dropped AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
        |  WHERE round(list_sum(list_transform(list_zip(a.v, b.v), z -> z[1] * z[2]))
        |          / (a.nrm * b.nrm), 4) >= 0.999)
        |SELECT vec_id FROM e WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
        |ORDER BY vec_id""".stripMargin,

    "dedup_bloom_contam" -> {
      // identical to dedup_decontaminate's oracle: the bloom path must
      // reproduce the exact-set answer bit-for-bit
      val g8 = (0 until 8).map(k => s"ws[i+$k]").mkString(" || ' ' || ")
      s"""WITH bench AS (
         |  SELECT array_to_string(regexp_split_to_array(trim(text), '\\s+')[5:24], ' ') AS text
         |  FROM documents WHERE doc_id % 50 = 7),
         |bsh AS (
         |  SELECT DISTINCT unnest(list_transform(range(1, len(ws) - 6), i -> $g8)) AS sh
         |  FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS ws FROM bench)),
         |csh AS (
         |  SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(ws) - 6), i -> $g8)) AS sh
         |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents)),
         |bad AS (SELECT DISTINCT doc_id FROM csh JOIN bsh USING (sh))
         |SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM bad)
         |ORDER BY doc_id""".stripMargin
    },

    "dedup_decontaminate" -> {
      val g8 = (0 until 8).map(k => s"ws[i+$k]").mkString(" || ' ' || ")
      s"""WITH bench AS (
         |  SELECT array_to_string(regexp_split_to_array(trim(text), '\\s+')[5:24], ' ') AS text
         |  FROM documents WHERE doc_id % 50 = 7),
         |bsh AS (
         |  SELECT DISTINCT unnest(list_transform(range(1, len(ws) - 6), i -> $g8)) AS sh
         |  FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS ws FROM bench)),
         |csh AS (
         |  SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(ws) - 6), i -> $g8)) AS sh
         |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents)),
         |bad AS (SELECT DISTINCT doc_id FROM csh JOIN bsh USING (sh))
         |SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM bad)
         |ORDER BY doc_id""".stripMargin
    },

    "corpus_curate" -> {
      val g8 = (0 until 8).map(k => s"ws[i+$k]").mkString(" || ' ' || ")
      s"""WITH kept AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE len(regexp_split_to_array(trim(text), '\\s+')) BETWEEN 10 AND 5000
         |    AND CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE)
         |      / len(regexp_split_to_array(trim(text), '\\s+')) BETWEEN 2.0 AND 12.0
         |    AND CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
         |      tk -> tk IN ('the','a','of','and','to','in'))) AS DOUBLE)
         |      / len(regexp_split_to_array(trim(text), '\\s+')) >= 0.01
         |    AND CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
         |      / length(text) <= 0.2),
         |fpk AS (
         |  SELECT MIN(doc_id) AS doc_id FROM (
         |    SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
         |    FROM kept)
         |  GROUP BY fp),
         |dd AS (SELECT k.doc_id, k.text FROM kept k JOIN fpk USING (doc_id)),
         |bench AS (
         |  SELECT array_to_string(regexp_split_to_array(trim(text), '\\s+')[5:24], ' ') AS text
         |  FROM documents WHERE doc_id % 50 = 7),
         |bsh AS (
         |  SELECT DISTINCT unnest(list_transform(range(1, len(ws) - 6), i -> $g8)) AS sh
         |  FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS ws FROM bench)),
         |csh AS (
         |  SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(ws) - 6), i -> $g8)) AS sh
         |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM dd)),
         |bad AS (SELECT DISTINCT doc_id FROM csh JOIN bsh USING (sh)),
         |clean AS (SELECT doc_id, text FROM dd
         |  WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
         |toks AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INTEGER) AS n_tokens
         |  FROM clean),
         |packed AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(COALESCE(SUM(n_tokens) OVER (
         |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS tokens_before
         |  FROM toks)
         |SELECT CAST(tokens_before // 2000 AS BIGINT) AS bin,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM packed GROUP BY 1 ORDER BY bin""".stripMargin
    },

    "corpus_curate_explain" -> curateExplainSql,

    "corpus_curate_funnel" ->
      s"""SELECT reason, CAST(COUNT(*) AS BIGINT) AS n_docs
         |FROM ($curateExplainSql)
         |GROUP BY reason ORDER BY reason""".stripMargin,

    "dedup_incremental" ->
      """WITH fps AS (
        |  SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
        |  FROM documents),
        |base AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 3 <> 0),
        |batch AS (SELECT doc_id, fp FROM fps WHERE doc_id % 3 = 0),
        |fresh AS (SELECT doc_id, fp FROM batch
        |  WHERE fp NOT IN (SELECT fp FROM base))
        |SELECT MIN(doc_id) AS doc_id FROM fresh GROUP BY fp
        |ORDER BY doc_id""".stripMargin,

    "dedup_contam_normalized" -> {
      val g8 = (0 until 8).map(k => s"ws[i+$k]").mkString(" || ' ' || ")
      val norm = (c: String) =>
        s"trim(regexp_replace(regexp_replace(lower($c), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
      s"""WITH norm_docs AS (
         |  SELECT doc_id, ${norm("text")} AS text FROM documents),
         |bench AS (
         |  SELECT replace(upper(array_to_string(
         |    regexp_split_to_array(trim(text), '\\s+')[5:24], ' ')), ' ', ' - ') AS text
         |  FROM documents WHERE doc_id % 50 = 7),
         |norm_bench AS (SELECT ${norm("text")} AS text FROM bench),
         |bsh AS (
         |  SELECT DISTINCT unnest(list_transform(range(1, len(ws) - 6), i -> $g8)) AS sh
         |  FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS ws FROM norm_bench)),
         |csh AS (
         |  SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(ws) - 6), i -> $g8)) AS sh
         |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM norm_docs)),
         |bad AS (SELECT DISTINCT doc_id FROM csh JOIN bsh USING (sh))
         |SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM bad)
         |ORDER BY doc_id""".stripMargin
    },

    "corpus_chunk" ->
      """WITH ws AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |ch AS (
        |  SELECT doc_id, unnest(list_transform(range(0, (len(ws) - 1) // 48 + 1), i ->
        |    struct_pack(chunk_id := i,
        |      n_tok := len(ws[i * 48 + 1 : i * 48 + 64]),
        |      chunk_h := md5(array_to_string(ws[i * 48 + 1 : i * 48 + 64], ' '))))) AS c
        |  FROM ws)
        |SELECT doc_id, CAST(c.chunk_id AS BIGINT) AS chunk_id,
        |  CAST(c.n_tok AS INTEGER) AS n_tok, c.chunk_h AS chunk_h
        |FROM ch ORDER BY doc_id, chunk_id""".stripMargin,

    "corpus_rownum" ->
      """SELECT doc_id, CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS rn
        |FROM documents ORDER BY doc_id""".stripMargin,

    "layout_zorder" -> {
      val terms = (0 until 8).map(i =>
        s"((((doc_id % 256) >> $i) & 1) << ${2 * i}) | " +
          s"((((n_chars % 256) >> $i) & 1) << ${2 * i + 1})")
      s"""SELECT doc_id, CAST(${terms.map(t => s"($t)").mkString(" | ")} AS BIGINT) AS z
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "text_boilerplate" -> {
      val g8 = (0 until 8).map(k => s"ws[i+$k]").mkString(" || ' ' || ")
      s"""WITH csh AS (
         |  SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(ws) - 6), i -> $g8)) AS sh
         |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents)),
         |common AS (SELECT sh FROM csh GROUP BY sh HAVING COUNT(*) >= 2)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
         |  CAST(COUNT(c.sh) AS BIGINT) AS n_common,
         |  round(CAST(COUNT(c.sh) AS DOUBLE) / COUNT(*), 6) AS frac
         |FROM csh LEFT JOIN common c USING (sh)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    "text_domains" ->
      """WITH planted AS (
        |  SELECT doc_id, CASE WHEN doc_id % 7 = 0
        |    THEN text || ' via https://site' || CAST(doc_id % 5 AS VARCHAR)
        |      || '.example.org/p/' || CAST(doc_id AS VARCHAR)
        |      || ' and http://cdn' || CAST(doc_id % 3 AS VARCHAR) || '.example.net/a'
        |    ELSE text END AS text
        |  FROM documents),
        |urls AS (
        |  SELECT doc_id, unnest(regexp_extract_all(text, 'https?://[^\s]+')) AS url
        |  FROM planted),
        |dom AS (
        |  SELECT doc_id, regexp_extract(url, 'https?://([^/\s:]+)', 1) AS domain
        |  FROM urls)
        |SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_urls,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM dom GROUP BY domain ORDER BY domain""".stripMargin,

    "text_redact" ->
      """WITH planted AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 0
        |      THEN text || ' contact bob@example.com see https://example.com/page'
        |      ELSE text END AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS INTEGER) AS n_emails,
        |  CAST(len(regexp_extract_all(text, 'https?://[^\s]+')) AS INTEGER) AS n_urls,
        |  md5(regexp_replace(regexp_replace(text,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |    'https?://[^\s]+', '<URL>', 'g')) AS red_h
        |FROM planted ORDER BY doc_id""".stripMargin,

    "text_lang_confusion" ->
      """SELECT lang,
        |CASE
        |  WHEN len(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t IN ('the','a','of','and','is')))
        |    >= len(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t IN ('el','la','de','los','es')))
        |   AND len(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t IN ('the','a','of','and','is')))
        |    >= len(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t IN ('der','die','das','und','ist')))
        |  THEN 'en'
        |  WHEN len(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t IN ('el','la','de','los','es')))
        |    >= len(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t IN ('der','die','das','und','ist')))
        |  THEN 'es' ELSE 'de' END AS lang_guess,
        |CAST(COUNT(*) AS BIGINT) AS n
        |FROM documents GROUP BY lang, lang_guess ORDER BY lang, lang_guess""".stripMargin,

    "text_blocklist_filter" ->
      """WITH planted AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' via https://site' || CAST(doc_id % 5 AS VARCHAR) || '.example.org/x'
        |         WHEN doc_id % 7 = 3 THEN text || ' see http://cdn' || CAST(doc_id % 3 AS VARCHAR) || '.example.net/a'
        |         ELSE text END AS text
        |  FROM documents),
        |hosts AS (
        |  SELECT doc_id, regexp_extract(url, 'https?://([^/\s:]+)', 1) AS host
        |  FROM (SELECT doc_id, unnest(regexp_extract_all(text, 'https?://[^\s]+')) AS url
        |        FROM planted)),
        |sufx AS (
        |  SELECT doc_id, unnest(list_filter(
        |      list_transform(range(1, len(string_split(host, '.')) + 1),
        |        i -> array_to_string(string_split(host, '.')[i:], '.')),
        |      s -> contains(s, '.'))) AS suffix
        |  FROM hosts),
        |bad AS (SELECT DISTINCT doc_id FROM sufx
        |        WHERE suffix IN ('example.org', 'cdn1.example.net'))
        |SELECT doc_id FROM planted
        |WHERE doc_id NOT IN (SELECT doc_id FROM bad) ORDER BY doc_id""".stripMargin,

    "events_trajectories" ->
      """WITH seq AS (
        |  SELECT user_id, event_id, event_type,
        |    lag(event_type, 3) OVER w AS p3,
        |    lag(event_type, 2) OVER w AS p2,
        |    lag(event_type, 1) OVER w AS p1
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT concat_ws('>', p3, p2, p1) AS ctx, event_type AS next_event,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM seq GROUP BY 1, 2
        |ORDER BY n DESC, ctx, next_event LIMIT 100""".stripMargin,

    "corpus_diff" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |nxt AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 1 THEN text || ' v2' ELSE text END AS text
        |  FROM base WHERE doc_id % 10 <> 3
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM base WHERE doc_id % 25 = 0),
        |b AS (SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp_b FROM base),
        |n AS (SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp_n FROM nxt),
        |d AS (
        |  SELECT COALESCE(b.doc_id, n.doc_id) AS doc_id,
        |    CASE WHEN fp_b IS NULL THEN 'added'
        |         WHEN fp_n IS NULL THEN 'removed'
        |         WHEN fp_b = fp_n THEN 'unchanged'
        |         ELSE 'changed' END AS status
        |  FROM b FULL OUTER JOIN n ON b.doc_id = n.doc_id)
        |SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_sum,
        |  CAST(MIN(doc_id) AS BIGINT) AS id_min,
        |  CAST(MAX(doc_id) AS BIGINT) AS id_max
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    // recomputes every probed CMS cell exactly: cell (r, b) holds the
    // total count of tokens whose md5 double-hash walk lands on b in
    // row r; the estimate is the min over the term's 4 probed cells
    "text_cms_freq" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents),
        |cnt AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_exact FROM toks GROUP BY tok),
        |h AS (SELECT tok, n_exact,
        |  ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h1,
        |  ('0x' || substr(md5(tok), 9, 8))::BIGINT AS h2 FROM cnt),
        |cells AS (
        |  SELECT r, (h1 + r * h2) % 256 AS b, CAST(SUM(n_exact) AS BIGINT) AS c
        |  FROM h CROSS JOIN (SELECT unnest(range(4)) AS r) GROUP BY 1, 2),
        |top AS (SELECT tok AS term, n_exact, h1, h2 FROM h
        |  ORDER BY n_exact DESC, tok LIMIT 20)
        |SELECT t.term, t.n_exact, CAST(MIN(c.c) AS BIGINT) AS n_est
        |FROM top t JOIN cells c ON c.b = (t.h1 + c.r * t.h2) % 256
        |GROUP BY 1, 2 ORDER BY t.n_exact DESC, t.term""".stripMargin,

    "text_vocab_coverage" ->
      """WITH vocab AS (
        |  SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |    FROM documents) GROUP BY term),
        |top AS (
        |  SELECT n, row_number() OVER (ORDER BY n DESC, term) AS r
        |  FROM vocab ORDER BY n DESC, term LIMIT 30),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
        |  CAST(COUNT(*) AS BIGINT) AS n_terms FROM vocab)
        |SELECT n_terms, total,
        |  CAST(SUM(CASE WHEN r <= 3 THEN n END) AS BIGINT) AS top3,
        |  CAST(SUM(CASE WHEN r <= 10 THEN n END) AS BIGINT) AS top10,
        |  CAST(SUM(n) AS BIGINT) AS top30,
        |  CAST(SUM(CASE WHEN r <= 3 THEN n END) AS BIGINT)::DOUBLE / total AS cov3,
        |  CAST(SUM(CASE WHEN r <= 10 THEN n END) AS BIGINT)::DOUBLE / total AS cov10,
        |  CAST(SUM(n) AS BIGINT)::DOUBLE / total AS cov30
        |FROM top CROSS JOIN tot GROUP BY n_terms, total""".stripMargin,

    "text_unigram_kl" ->
      """WITH toks AS (
        |  SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents),
        |cnt AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY 1, 2),
        |vocab AS (SELECT tok, CAST(SUM(n) AS BIGINT) AS n_all FROM cnt GROUP BY 1),
        |tot AS (SELECT source, CAST(SUM(n) AS BIGINT) AS tot_s FROM cnt GROUP BY 1),
        |gl AS (SELECT CAST(COUNT(*) AS BIGINT) AS v, CAST(SUM(n_all) AS BIGINT) AS tot_all FROM vocab)
        |SELECT g.source, CAST(COUNT(*) AS BIGINT) AS n_terms,
        |  CAST(SUM(CAST(round(
        |    ((g.n + 1)::DOUBLE / (g.tot_s + gl.v)) * ln(
        |      ((g.n + 1)::DOUBLE / (g.tot_s + gl.v)) /
        |      ((g.n_all + 1)::DOUBLE / (gl.tot_all + gl.v))), 9) AS DECIMAL(20,9))) AS DOUBLE) AS kl
        |FROM (SELECT t.source, w.tok, w.n_all, t.tot_s, COALESCE(c.n, 0) AS n
        |      FROM vocab w CROSS JOIN tot t
        |      LEFT JOIN cnt c ON c.source = t.source AND c.tok = w.tok) g
        |CROSS JOIN gl
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "text_heavy_hitters" ->
      """WITH terms AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents)
        |SELECT term, CAST(COUNT(*) AS BIGINT) AS n
        |FROM terms GROUP BY term ORDER BY n DESC, term LIMIT 20""".stripMargin,

    "corpus_pack" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER) AS n_tokens
        |  FROM documents),
        |packed AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (
        |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS tokens_before
        |  FROM toks)
        |SELECT CAST(tokens_before // 2000 AS BIGINT) AS bin,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM packed GROUP BY 1 ORDER BY bin""".stripMargin,

    "corpus_shuffle_shard" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    CAST(concat('0x', substr(md5('epoch0:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
        |  FROM documents)
        |SELECT doc_id, CAST(h % 8 AS INTEGER) AS shard,
        |  CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS BIGINT) AS pos
        |FROM h ORDER BY shard, pos""".stripMargin,

    "corpus_budget_select" ->
      """WITH items AS (
        |  SELECT doc_id,
        |    (10000000 - n_chars) * 1000000 + doc_id AS pr,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (
        |      ORDER BY pr ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
        |  FROM items)
        |SELECT doc_id, n_tokens, tokens_before FROM c
        |WHERE tokens_before < 10000 ORDER BY doc_id""".stripMargin,

    "cdc_latest" ->
      """SELECT user_id, ts, event_type, value FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id
        |    ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // Mirrors cdc_snapshot_at: cdc_latest restricted to the history
    // prefix at the cut
    "cdc_snapshot_at" ->
      """SELECT user_id, ts, event_type, value FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id
        |    ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST) AS rn
        |  FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // Mirrors cdc_merge: both legs compact to last-per-key, then one
    // full-outer settle — D drops, I/U replace, else base passes through
    "cdc_merge" ->
      """WITH base AS (
        |  SELECT user_id, ts, event_type, value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST) AS rn
        |    FROM events WHERE event_id % 2 = 0) WHERE rn = 1),
        |chg AS (
        |  SELECT user_id, ts, event_type, value, op FROM (
        |    SELECT *,
        |      CASE WHEN user_id % 7 = 0 THEN 'D'
        |           WHEN event_id % 3 = 0 THEN 'I' ELSE 'U' END AS op,
        |      row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST) AS rn
        |    FROM events WHERE event_id % 2 = 1) WHERE rn = 1)
        |SELECT COALESCE(b.user_id, c.user_id) AS user_id,
        |  CASE WHEN c.op IS NOT NULL THEN c.ts ELSE b.ts END AS ts,
        |  CASE WHEN c.op IS NOT NULL THEN c.event_type
        |       ELSE b.event_type END AS event_type,
        |  CASE WHEN c.op IS NOT NULL THEN c.value ELSE b.value END AS value
        |FROM base b FULL OUTER JOIN chg c ON b.user_id = c.user_id
        |WHERE COALESCE(c.op, '') <> 'D'
        |ORDER BY user_id""".stripMargin,

    "cdc_scd2" ->
      """SELECT user_id, event_id, ts AS valid_from,
        |  lead(ts, 1) OVER (PARTITION BY user_id
        |    ORDER BY ts ASC NULLS LAST, event_id ASC NULLS LAST) AS valid_to,
        |  CASE WHEN lead(1, 1) OVER (PARTITION BY user_id
        |    ORDER BY ts ASC NULLS LAST, event_id ASC NULLS LAST) IS NULL
        |       THEN 1 ELSE 0 END AS is_current,
        |  value
        |FROM events ORDER BY user_id, valid_from, event_id""".stripMargin,

    // from-scratch recompute over the WHOLE log: base ∪ delta = orders
    "cdc_incremental_agg" ->
      """SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_d
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "text_topterms_by_source" ->
      """WITH terms AS (
        |  SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents),
        |c AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM terms GROUP BY source, term),
        |r AS (SELECT *, row_number() OVER (
        |        PARTITION BY source ORDER BY n DESC, term) AS rk FROM c)
        |SELECT source, term, n FROM r WHERE rk <= 5
        |ORDER BY source, n DESC, term""".stripMargin,

    "docs_by_source" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |round(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 4) AS avg_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin
  )
}
