package graft

import org.apache.spark.sql.functions._

import graft.ext.Classifier

class ClassifierSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("lrTrainScore learns the seed criterion: high accuracy, separated means") {
    val scored = Classifier.lrTrainScore(docs, col("n_chars") >= 300).collect()
    assert(scored.length == docs.count())
    val (pos, neg) = scored.partition(_.getAs[Int]("label") == 1)
    assert(pos.nonEmpty && neg.nonEmpty, "fixture must have both classes")
    val acc = scored.count(r =>
      r.getAs[Boolean]("pred") == (r.getAs[Int]("label") == 1)).toDouble / scored.length
    assert(acc >= 0.9, s"train accuracy $acc — GD failed to fit a separable criterion")
    val meanPos = pos.map(_.getAs[Double]("score")).sum / pos.length
    val meanNeg = neg.map(_.getAs[Double]("score")).sum / neg.length
    assert(meanPos > meanNeg + 0.2,
      s"score separation too weak: pos=$meanPos neg=$meanNeg")
    // scores are probabilities
    assert(scored.forall { r =>
      val s = r.getAs[Double]("score"); s >= 0.0 && s <= 1.0
    })
  }

  test("lrTrainScore is deterministic across runs (exact decimal gradients)") {
    def run() = Classifier.lrTrainScore(docs, col("n_chars") >= 300)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toMap
    val a = run(); val b = run()
    assert(a == b, "weight trajectory differed between identical runs")
  }

  test("scoring pass is a pure projection: no join, no aggregate in the plan") {
    val plan = Classifier.lrTrainScore(docs, col("n_chars") >= 300)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in scoring plan:\n$plan")
    assert(!plan.contains("HashAggregate"), s"unexpected aggregate in scoring plan:\n$plan")
  }

  test("gradient aggregation combines map-side (partial_sum in the plan)") {
    val feats = Classifier.featurize(docs, col("n_chars") >= 300)
    val g = feats.agg(
      sum(round((lit(0.5) - col("y")) * col("x1"), 9)
        .cast(org.apache.spark.sql.types.DecimalType(20, 9))).as("g1"))
    val plan = g.queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum"), s"gradient sum must partial-aggregate:\n$plan")
  }
}
