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

  /** (word, n, syms) initial state: syms = "  c1  c2  ...  ck  " with
    * TWO-space separators (and edge sentinels). The merge pattern
    * " a  b " consumes one space from each boundary and the replacement
    * " ab " restores it, so consecutive occurrences (" a  b  a  b ")
    * each retain a full boundary for the scanner — a single literal
    * replace pass is then exactly BPE's greedy left-to-right merge
    * (single-space separators would share the boundary space and make
    * the scan skip every second occurrence of a repeated pair). */
  private def wordTable(docs: DataFrame): DataFrame =
    docs.select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .withColumn("syms", symsColumn(col("w")))

  /** The load-bearing sentinel layout, shared by training and encode so
    * they can never diverge: `split(w, "")` keeps a trailing empty
    * element in Spark, which `array_remove` drops so the string is
    * EXACTLY "  c1  c2  ...  ck  " — two-space separators and two-space
    * edges. */
  private def symsColumn(w: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit("  "), concat_ws("  ", array_remove(split(w, ""), "")), lit("  "))

  /** Learn `nMerges` merges from a (doc_id, text) corpus. Returns the
    * ordered merge table; ties broken lexicographically. */
  def train(docs: DataFrame, nMerges: Int): Seq[BpeMerge] = {
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
