package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import scala.util.control.NonFatal

/** The reference's external JSON source (S1, EtlProcess.cs:133-161) as a
  * schema-on-read Spark reader with the same observable contract:
  *
  *  - writer-fixed, reader-tolerant schema (SURVEY.md §1.3): unknown JSON
  *    fields are silently dropped, missing fields become null — Spark's
  *    PERMISSIVE mode with an explicit schema reproduces the reference's
  *    Newtonsoft deserialization exactly (EtlProcess.cs:146).
  *  - error-as-null (SURVEY.md §7.4.6): a fetch whose failure is
  *    detectable up front (missing/unreadable path, no resolvable first
  *    row) yields None — the caller lands an empty-successful run with
  *    its distinct audit message (EtlProcess.cs:150-160). A source that
  *    degrades AFTER this probe (e.g. a file deleted mid-read) surfaces
  *    at execution time and takes the caller's failure-audit path — the
  *    lazy-read analogue of the reference's post-download failures.
  *
  * In production the HTTP GET would live in a DataSource V2 TableProvider
  * planning one InputPartition per page; in this zero-egress environment
  * the "endpoint" is a landing path.
  */
object JsonSource {

  /** Schema-on-read JSON read: explicit schema, PERMISSIVE, tolerant of
    * unknown/missing/corrupt fields (corrupt rows → all-null rows, like a
    * POCO deserializer yielding defaults). */
  def read(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .json(path)

  /** The reference contract: null (None) on any source failure, logged and
    * swallowed (EtlProcess.cs:150-160) — feeds ExtractLoadJob's
    * empty-successful branch. */
  def tryRead(spark: SparkSession, schema: StructType, path: String): Option[DataFrame] =
    try {
      val df = read(spark, schema, path)
      df.head(1) // force source resolution; AnalysisException on bad path
      Some(df)
    } catch {
      case NonFatal(e) =>
        System.err.println(s"[JsonSource] extract failed (returning none): ${e.getMessage}")
        None
    }

  /** LIVE-endpoint form of [[tryRead]] over the `http-json` DSv2 source
    * (graft.sources.v2.HttpJsonSource): an actual GET with
    * `Accept: application/json`, the reference's exact error contract —
    * non-2xx or any fetch/parse failure returns None (EtlProcess.cs:
    * 144-159), which the caller lands as the empty-successful run
    * (EtlProcess.cs:61-69); a 200 with `[]` returns Some(empty), the
    * distinct saved-0-documents branch. The probe `head(1)` performs
    * one GET; the caller's real action re-fetches — acceptable because
    * the extract sink is idempotent by run (and the reference likewise
    * re-enters its endpoint on every orchestration). */
  def tryReadUrl(spark: SparkSession, schema: StructType, url: String): Option[DataFrame] =
    try {
      val df = spark.read.format("http-json").schema(schema)
        .option("url", url).load()
      df.head(1) // force one fetch; IOException surfaces here
      Some(df)
    } catch {
      case NonFatal(e) =>
        System.err.println(s"[JsonSource] extract failed (returning none): ${e.getMessage}")
        None
    }
}
