package graft

import org.apache.spark.sql.functions._
import graft.ext.TextOps

/** Pins the library-wide cache contract (TextOps "Cache contract"
  * scaladoc + [[Tables.sweepOperatorCaches]]): operators persist
  * internal frames their returned plan references, the CALLER sweeps
  * at its batch boundary, and a swept session is provably clean — so a
  * long-lived embedding that follows the contract has ZERO cached-block
  * growth across calls, and per-call growth is bounded by the
  * operator's own pins (not by how many times it has been called). */
class CacheContractSpec extends SparkSpec {

  private def cachedRdds: Int =
    spark.sparkContext.getPersistentRDDs.size

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text"))

  private def queryTerms = {
    val s = spark
    import s.implicits._
    Seq((1L, "the"), (1L, "data"), (2L, "model")).toDF("qid", "term")
  }

  test("back-to-back operators with the sweep: zero cached-block growth") {
    Tables.sweepOperatorCaches(spark) // clean slate (shared session)
    assert(cachedRdds == 0)
    // three rounds of two persist-heavy operators back to back — the
    // long-lived-service usage pattern; block count must return to
    // zero at every batch boundary, i.e. growth across rounds is zero
    (1 to 3).foreach { round =>
      val hits = TextOps.bm25TopK(docs, queryTerms, k = 5).count()
      assert(hits > 0, "bm25 returned nothing — fixture drifted?")
      val nll = TextOps.bigramNll(docs).count()
      assert(nll > 0)
      val grew = cachedRdds
      Tables.sweepOperatorCaches(spark)
      assert(cachedRdds == 0,
        s"round $round: sweep left ${cachedRdds} cached RDDs (had $grew)")
    }
  }

  test("per-call pins are bounded and re-invocation after a sweep is correct") {
    Tables.sweepOperatorCaches(spark)
    val first = TextOps.bm25TopK(docs, queryTerms, k = 5)
      .orderBy(col("qid"), col("rn")).collect()
    val afterOne = cachedRdds
    assert(afterOne >= 1, "bm25's tf pin should be registered")
    // a second call adds ITS OWN pins only (bounded per call) — it must
    // not multiply against the first call's leftovers
    TextOps.bm25TopK(docs, queryTerms, k = 5).count()
    assert(cachedRdds <= 2 * afterOne,
      s"unbounded pin growth: $afterOne -> $cachedRdds for one extra call")
    Tables.sweepOperatorCaches(spark)
    // recompute-after-sweep yields identical results (the pin is a
    // performance artifact, never a correctness dependency)
    val again = TextOps.bm25TopK(docs, queryTerms, k = 5)
      .orderBy(col("qid"), col("rn")).collect()
    assert(first.sameElements(again),
      "results diverged after a cache sweep — a pin was load-bearing for values")
    Tables.sweepOperatorCaches(spark)
    assert(cachedRdds == 0)
  }
}
