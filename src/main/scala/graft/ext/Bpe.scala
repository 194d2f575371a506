package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** One learned merge: rank-th most frequent adjacent symbol pair. */
final case class BpeMerge(rank: Int, lhs: String, rhs: String, n: Long)

/** Byte-pair-encoding tokenizer TRAINING over a corpus — the classic
  * "train the tokenizer on the data you curated" step of an LLM data
  * pipeline, shaped for scale:
  *
  *  - the corpus collapses once into a (word, n) frequency table — the
  *    only pass over 100 TB of text; everything after runs on the
  *    vocabulary-sized table (millions of rows, not trillions).
  *  - each merge round is ONE grouped aggregation (adjacent-pair counts
  *    weighted by word frequency, map-side combinable) + a driver argmax
  *    of one row; the driver only ever holds the merge list.
  *  - symbol sequences live as space-joined strings and merges apply via
  *    the literal (non-regex) `replace` — left-to-right non-overlapping,
  *    exactly BPE's merge semantics, safe for any punctuation symbol.
  *
  * Deterministic: pair argmax breaks ties on the pair string, so the
  * learned merge table is identical at any parallelism.
  *
  * Plan-depth bound: each round adds one `replace` to the symbol column's
  * lineage, so at real vocabulary sizes (30k+ merges) checkpoint the word
  * table every few hundred rounds to reset Catalyst analysis cost, and
  * encode with a per-partition loop (the merge list is a tiny broadcast)
  * rather than [[segment]]'s per-merge column fold — the fold is the
  * demonstration form, fine to ~hundreds of merges.
  */
object Bpe {

  /** (word, n) corpus frequency table — the ONE full pass over the
    * corpus; both training paths run on this vocabulary-sized result. */
  private def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))

  /** (word, n, syms) initial state: syms = "  c1  c2  ...  ck  " with
    * TWO-space separators (and edge sentinels). The merge pattern
    * " a  b " consumes one space from each boundary and the replacement
    * " ab " restores it, so consecutive occurrences (" a  b  a  b ")
    * each retain a full boundary for the scanner — a single literal
    * replace pass is then exactly BPE's greedy left-to-right merge
    * (single-space separators would share the boundary space and make
    * the scan skip every second occurrence of a repeated pair). */
  private def wordTable(docs: DataFrame): DataFrame =
    wordCounts(docs).withColumn("syms", symsColumn(col("w")))

  /** The load-bearing sentinel layout, shared by training and encode so
    * they can never diverge: `split(w, "")` keeps a trailing empty
    * element in Spark, which `array_remove` drops so the string is
    * EXACTLY "  c1  c2  ...  ck  " — two-space separators and two-space
    * edges. */
  private def symsColumn(w: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit("  "), concat_ws("  ", array_remove(split(w, ""), "")), lit("  "))

  /** Vocabulary bound for the driver fast path: a (word, n) table at or
    * under this row count collects to the driver and trains there —
    * same explicit-bound pattern as Cluster's ≤2M-edge union-find.
    * 2M (word, count) rows is low tens of MB of driver heap; real BPE
    * trainers (e.g. the HuggingFace tokenizer) train on exactly this
    * pre-aggregated frequency table single-node. Corpora whose token
    * vocabulary exceeds the bound fall back to the distributed
    * one-aggregation-per-merge loop. */
  private val MaxDriverVocab = 2000000

  /** Learn `nMerges` merges from a (doc_id, text) corpus. Returns the
    * ordered merge table; ties broken lexicographically.
    *
    * Two paths, IDENTICAL merge trajectory (spec-asserted on the
    * fixture corpus, and the oracle unrolls the trajectory so any
    * divergence hash-fails):
    *  - vocabulary ≤ [[MaxDriverVocab]]: ONE Spark job collapses the
    *    corpus to (word, n); the greedy argmax/merge loop then runs on
    *    the driver over the frequency table — nMerges merges cost zero
    *    further jobs instead of one grouped-aggregation job each.
    *  - larger vocabularies: the distributed loop (one map-combinable
    *    pair aggregation + one-row driver argmax per merge). */
  def train(docs: DataFrame, nMerges: Int): Seq[BpeMerge] = {
    val counts = wordCounts(docs)
    // CollectLimit caps what reaches the driver: an over-bound
    // vocabulary ships MaxDriverVocab+1 rows (the probe), never the
    // whole table
    val head = counts.limit(MaxDriverVocab + 1).collect()
    if (head.length <= MaxDriverVocab)
      trainLocal(head.map(r => (r.getString(0), r.getLong(1))), nMerges)
    else trainDistributed(docs, nMerges)
  }

  /** Driver-side greedy BPE over a collected (word, n) table. Replicates
    * the distributed loop's semantics exactly:
    *  - symbols = Unicode CODE POINTS of the word (Spark's
    *    `split(w, "")` advances per code point, never splitting
    *    surrogate pairs);
    *  - pair counts weighted by word frequency, every adjacent
    *    occurrence counted (= 2-shingles of the symbol sequence);
    *  - argmax on count desc, then the "a b" pair string ascending in
    *    UNSIGNED UTF-8 BYTE order — UTF8String's binary collation, NOT
    *    java.lang.String's UTF-16 code-unit order (they diverge on
    *    supplementary characters);
    *  - merge applied greedily left-to-right, non-overlapping — the
    *    array-walk twin of the two-space sentinel `replace` trick. */
  private[graft] def trainLocal(words: Array[(String, Long)],
      nMerges: Int): Seq[BpeMerge] = {
    val syms: Array[Array[String]] = words.map { case (w, _) => codePoints(w) }
    val freq: Array[Long] = words.map(_._2)
    val merges = Seq.newBuilder[BpeMerge]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      val counts = new scala.collection.mutable.HashMap[(String, String), Long]()
      var i = 0
      while (i < syms.length) {
        val s = syms(i)
        var j = 0
        while (j + 1 < s.length) {
          val key = (s(j), s(j + 1))
          counts.update(key, counts.getOrElse(key, 0L) + freq(i))
          j += 1
        }
        i += 1
      }
      if (counts.isEmpty) exhausted = true
      else {
        var bestPair: (String, String) = null
        var bestKey: String = null
        var bestN = Long.MinValue
        counts.foreach { case (p, c) =>
          val key = p._1 + " " + p._2
          if (c > bestN || (c == bestN && utf8Less(key, bestKey))) {
            bestPair = p; bestKey = key; bestN = c
          }
        }
        val (a, b) = bestPair
        merges += BpeMerge(rank, a, b, bestN)
        i = 0
        while (i < syms.length) { syms(i) = mergePair(syms(i), a, b); i += 1 }
        rank += 1
      }
    }
    merges.result()
  }

  /** Greedy left-to-right non-overlapping (a, b) -> ab over a symbol
    * sequence — exactly what one literal-`replace` pass does on the
    * two-space sentinel string. */
  private def mergePair(s: Array[String], a: String, b: String): Array[String] = {
    var i = 0
    var hit = false
    while (!hit && i + 1 < s.length) {
      if (s(i) == a && s(i + 1) == b) hit = true
      i += 1
    }
    if (!hit) s
    else {
      val out = Array.newBuilder[String]
      var j = 0
      while (j < s.length) {
        if (j + 1 < s.length && s(j) == a && s(j + 1) == b) {
          out += a + b; j += 2
        } else { out += s(j); j += 1 }
      }
      out.result()
    }
  }

  private def codePoints(w: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.result()
  }

  /** Unsigned UTF-8 byte-order strict-less-than — UTF8String's binary
    * collation, the order Spark's `orderBy(col("pair"))` tie-break uses. */
  private def utf8Less(x: String, y: String): Boolean = {
    val xb = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val yb = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(xb.length, yb.length)
    var i = 0
    while (i < n) {
      val c = (xb(i) & 0xff) - (yb(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    xb.length < yb.length
  }

  /** The distributed merge loop: one grouped pair aggregation + one-row
    * driver argmax per merge. `private[graft]` so the parity spec can
    * force this path on a small corpus and assert trajectory equality
    * with [[trainLocal]]. */
  private[graft] def trainDistributed(docs: DataFrame, nMerges: Int): Seq[BpeMerge] = {
    var words = wordTable(docs).persist(StorageLevel.MEMORY_AND_DISK)
    // one generation of lag before unpersisting: round k's collect is the
    // action that materializes generation k's cache, so generation k-1
    // (its parent in the lineage) may only be dropped AFTER that collect —
    // this way each round costs exactly ONE job and recompute never
    // cascades past a single cached parent
    var prev: DataFrame = null
    val merges = Seq.newBuilder[BpeMerge]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      // explode_outer + null filter (not plain explode): see
      // Dedup.ngramJaccardPairs — the inferred size()>0 filter would
      // re-run the pair-shingle expression twice more per word
      val top = words
        .select(col("n"),
          explode_outer(Dedup.shingles(trim(col("syms")), 2)).as("pair"))
        .filter(col("pair").isNotNull)
        .groupBy(col("pair")).agg(sum(col("n")).as("c"))
        .orderBy(col("c").desc, col("pair")).limit(1)
        .collect()
      if (prev != null) { prev.unpersist(); prev = null }
      if (top.isEmpty) exhausted = true
      else {
        val pair = top(0).getString(0)
        val c = top(0).getLong(1)
        val Array(a, b) = pair.split(" ", 2)
        merges += BpeMerge(rank, a, b, c)
        prev = words
        words = words.withColumn("syms",
            replaceLit(col("syms"), s" $a  $b ", s" $a$b "))
          .persist(StorageLevel.MEMORY_AND_DISK)
        rank += 1
      }
    }
    words.unpersist()
    if (prev != null) prev.unpersist()
    merges.result()
  }

  /** Learned merges as a DataFrame (rank, lhs, rhs, n). */
  def trainTable(spark: SparkSession, docs: DataFrame, nMerges: Int): DataFrame = {
    import spark.implicits._
    train(docs, nMerges).toDF()
  }

  /** Segment a text column with a learned merge list: apply the merges in
    * rank order to each word's symbol string — the tokenizer's ENCODE
    * step as a pure column expression chain (scan-speed, no state). The
    * result is one space-joined symbol string per input word sequence. */
  def segment(text: org.apache.spark.sql.Column,
      merges: Seq[BpeMerge]): org.apache.spark.sql.Column = {
    val words = transform(TextOps.tokens(text), w => symsColumn(w))
    val merged = merges.foldLeft(words) { case (acc, m) =>
      transform(acc, s => replaceLit(s, s" ${m.lhs}  ${m.rhs} ", s" ${m.lhs}${m.rhs} "))
    }
    concat_ws(" ",
      transform(merged, s => regexp_replace(trim(s), " +", " ")))
  }

  private def replaceLit(c: org.apache.spark.sql.Column, find: String,
      repl: String): org.apache.spark.sql.Column =
    call_function("replace", c, lit(find), lit(repl))
}
