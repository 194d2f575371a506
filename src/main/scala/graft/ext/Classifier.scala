package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Model-based quality scoring — the learned companion to the heuristic
  * gates in [[TextOps.qualityKeep]]. Large-corpus curation pipelines
  * routinely train a small linear classifier (fastText-style) on a
  * labeled seed set and score the whole corpus with it; this is that
  * pattern as pure DataFrame machinery.
  *
  * Shape at 100 TB: the featurized corpus is ONE narrow projection
  * (persisted, so training re-scans k doubles per row, not the text);
  * each gradient-descent iteration is a single map-side-combinable
  * aggregation to a k-vector on the driver (same bounded-driver-state
  * discipline as [[Similarity.kMeans]]'s centroids and
  * [[Bpe]]'s merge table); scoring is one embarrassingly-parallel
  * projection. Nothing driver-side ever exceeds O(k).
  *
  * Determinism contract (what makes full training oracle-checkable):
  * per-row sigmoids are rounded to 9 dp before entering the gradient,
  * and gradient terms are rounded to 9 dp and summed as DECIMAL(20,9) —
  * so each iteration's gradient is an EXACT sum, independent of
  * partition/summation order, and the weight trajectory is a pure
  * function of the data (the same discipline as
  * [[TextOps.bigramNll]]'s decimal NLL terms and the PQ ADC partials).
  */
object Classifier {

  /** Number of features including the bias term. */
  val NumFeatures = 4

  /** Featurize (doc_id, text, …) into the fixed quality-feature vector:
    * bias, token count / 100, mean token length / 10, English stopword
    * ratio — each an expression with an exact DuckDB twin (proven
    * cross-engine by `text_stats` / `quality_filter`). The token array
    * binds ONCE per row (withTokens). `label` is any boolean column over
    * the input (a curated-source flag, a heuristic gate, a length
    * criterion …); it becomes y in {0.0, 1.0}. */
  def featurize(docs: DataFrame, label: Column): DataFrame = {
    val txt = col("text")
    val ts = TextOps.withTokens(txt)(toks => struct(
      size(toks).as("n_tokens"),
      size(filter(toks, t => t.isInCollection(TextOps.defaultStopwords)))
        .as("stop_hits")))
    docs.select(col("doc_id"), txt, label.as("_lbl"), ts.as("_ts"))
      .select(col("doc_id"),
        lit(1.0).as("x0"),
        (col("_ts.n_tokens").cast("double") / lit(100.0)).as("x1"),
        (length(regexp_replace(trim(txt), "\\s+", "")).cast("double")
          / col("_ts.n_tokens") / lit(10.0)).as("x2"),
        (col("_ts.stop_hits").cast("double") / col("_ts.n_tokens")).as("x3"),
        when(col("_lbl"), 1.0).otherwise(0.0).as("y"))
  }

  /** Train logistic regression by full-batch gradient descent over the
    * featurized corpus and return per-document scores:
    * (doc_id, score, pred, label). `score` = sigmoid of the final
    * margin rounded to 6 dp, `pred` = score >= 0.5.
    *
    * One aggregation job per iteration; weights live on the driver
    * (k doubles). The final frame stays persisted for the caller's
    * action (Verify/Bench clear caches between queries).
    */
  def lrTrainScore(docs: DataFrame, label: Column,
      iters: Int = 8, lr: Double = 5.0): DataFrame = {
    val feats = featurize(docs, label).persist()

    // left-associated margin — the oracle writes the identical chain
    def margin(w: Array[Double]): Column =
      lit(w(0)) * col("x0") + lit(w(1)) * col("x1") +
        lit(w(2)) * col("x2") + lit(w(3)) * col("x3")
    // 9-dp sigmoid: the one libm call (exp) is fenced behind a decimal
    // rounding so a sub-ulp cross-engine difference cannot reach the sums
    def prob(w: Array[Double]): Column =
      round(lit(1.0) / (lit(1.0) + exp(-margin(w))), 9)

    var w = Array.fill(NumFeatures)(0.0)
    for (_ <- 0 until iters) {
      val err = prob(w) - col("y")
      val gradCols = (0 until NumFeatures).map(j =>
        sum(round(err * col(s"x$j"), 9).cast(DecimalType(20, 9))).as(s"g$j"))
      val r = feats.agg(gradCols.head,
        (gradCols.tail :+ count(lit(1)).as("n")): _*).head()
      val n = r.getLong(NumFeatures)
      require(n > 0, "lrTrainScore: empty corpus")
      w = Array.tabulate(NumFeatures)(j =>
        w(j) - lr * r.getDecimal(j).doubleValue() / n)
    }

    feats
      .select(col("doc_id"), round(prob(w), 6).as("score"),
        col("y").cast("int").as("label"))
      .select(col("doc_id"), col("score"),
        (col("score") >= 0.5).as("pred"), col("label"))
  }
}
