package graft

import org.apache.spark.sql.functions._
import graft.functions.Winnow.winnow

/** Winnowing guarantees (Schleimer et al., SIGMOD'03): identical docs →
  * identical fingerprint sets; a shared substring of length ≥ w + k − 1 →
  * at least one shared fingerprint; short/empty input is total.
  */
class WinnowSpec extends SparkSpec {

  private def fps(rows: Seq[(Long, String)]): Map[Long, Set[Long]] = {
    val ss = spark
    import ss.implicits._
    rows.toDF("id", "text").select(col("id"), winnow(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
  }

  test("identical documents produce identical fingerprints") {
    val doc = "the quick brown fox jumps over the lazy dog repeatedly and often"
    val m = fps(Seq(1L -> doc, 2L -> doc))
    assert(m(1L) == m(2L) && m(1L).nonEmpty)
  }

  test("a document sharing a long substring shares fingerprints; disjoint text shares none") {
    val core = "spark catalyst optimizer rewrites logical plans into physical plans"
    val m = fps(Seq(
      1L -> core,
      2L -> (core + " with adaptive query execution at runtime"),
      3L -> "zzz yyy xxx www vvv uuu ttt sss rrr qqq ppp ooo"))
    assert((m(1L) & m(2L)).nonEmpty, "winnowing guarantee violated: long shared substring, no shared fingerprint")
    val overlap = (m(1L) & m(2L)).size.toDouble / m(1L).size
    assert(overlap > 0.5, f"expected high overlap for contained text, got $overlap%.2f")
    assert((m(1L) & m(3L)).isEmpty, "unrelated texts should share no fingerprints here")
  }

  test("total on short and empty inputs") {
    val m = fps(Seq(1L -> "", 2L -> "ab", 3L -> "abcdefgh"))
    assert(m(1L).isEmpty && m(2L).isEmpty)
    assert(m(3L).size == 1, "exactly-k-length input has one k-gram, one fingerprint")
  }

  test("fingerprint-based near-dup detection over the fixture finds planted dups") {
    val planted = graft.queries.Extensions.plantedDocs(spark, sf)
    val withFp = planted.select(col("doc_id"),
      explode(winnow(col("text"))).as("fp")).distinct()
    // near-dup criterion: pairs sharing >= 80% of the smaller doc's
    // fingerprints (a single shared hash is not a near-dup signal)
    val sizes = withFp.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val pairs = withFp.as("a").join(withFp.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("common"))
      .join(sizes.select(col("doc_id").as("i"), col("sz").as("si")), "i")
      .join(sizes.select(col("doc_id").as("j"), col("sz").as("sj")), "j")
      .filter(col("common") >= least(col("si"), col("sj")) * 0.8)
    val exactPairs = pairs.filter(col("j") - col("i") === 200000).count()
    val expected = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 25 === 0).count()
    assert(exactPairs == expected,
      s"winnow-based dedup missed planted exact dups: $exactPairs != $expected")
  }

  test("cdcBoundaries: cuts match a reference scan; prefix edits only shift, never reflow") {
    import graft.functions.CdcBoundaries.cdcBoundaries
    val ss = spark
    import ss.implicits._
    def refBounds(s: String, k: Int, d: Int): Seq[Int] =
      (0 to s.length - k).flatMap { i =>
        var h = 0L
        (i until i + k).foreach(j => h = (h * 257L + s.charAt(j)) % 1000000007L)
        if (h % d == 0) Some(i + k) else None
      }
    val text = "key agg row scan slow fast table value part hash merge batch " * 12
    def cuts(t: String): Seq[Int] = Seq((1L, t)).toDF("doc_id", "text")
      .select(cdcBoundaries(col("text"), 8, 32)).head.getSeq[Int](0)
    assert(cuts(text) == refBounds(text, 8, 32), "expression diverged from reference")
    // content anchoring: prepending a prefix shifts every cut that lies
    // wholly inside the old text by exactly the prefix length — the edit
    // never reflows downstream chunk boundaries (fixed-width windows do)
    val prefix = "inserted preamble text "
    val shifted = cuts(prefix + text)
      .filter(_ > prefix.length + 8 - 1).map(_ - prefix.length)
    assert(shifted == cuts(text).filter(_ > 7),
      "downstream boundaries reflowed after a prefix edit")
  }
}
