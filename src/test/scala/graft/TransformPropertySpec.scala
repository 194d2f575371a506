package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.model.SampleItem
import graft.ops.TransformOp

/** Property-based check (SURVEY.md §5.2.2): Transform is total on
  * arbitrary SampleItems including null/blank fields, and the P2
  * invariant holds — output Description/Name are never null or blank.
  */
class TransformPropertySpec extends SparkSpec {

  private val genStr: Gen[String] = Gen.oneOf(
    Gen.const(null: String), Gen.const(""), Gen.const("   "),
    Gen.alphaNumStr.map(_.take(20)), Gen.const("\ttab\n"))

  private val genItem: Gen[SampleItem] = for {
    id <- Gen.uuid.map(_.toString)
    date <- genStr; desc <- genStr; done <- genStr
    name <- genStr; pr <- genStr
    part <- Gen.oneOf("Partition_A", "Partition_B", "Partition_C")
  } yield SampleItem(id, date, desc, done, name, pr, part)

  test("P2 invariant over 300 arbitrary items incl. nulls/blanks") {
    val ss = spark
    import ss.implicits._
    val items = Gen.listOfN(300, genItem).sample.getOrElse(sys.error("gen failed"))
    val df = items.toDF().withColumn("seq", lit(1))
    val out = TransformOp.transform(df, lit("b0"), col("seq"), "Loc1,Loc2")
    assert(out.count() == 300)
    val bad = out.filter(
      col("Description").isNull || trim(col("Description")) === "" ||
        col("Name").isNull || trim(col("Name")) === "").count()
    assert(bad == 0, "Transform emitted a null/blank Description or Name")
    // pass-through fields preserved verbatim (nulls included)
    val src = df.select(col("id"), col("Done").as("srcDone"), col("Pr").as("srcPr"))
    val joined = out.join(src, "id")
    assert(joined.filter(!(col("Done") <=> col("srcDone")) ||
      !(col("Pr") <=> col("srcPr"))).count() == 0)
  }
}
