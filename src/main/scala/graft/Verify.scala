package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Tables.silenceBoundedWindowWarn()
    // wipe any previous run's outputs FIRST: a failing query must leave a
    // missing dir (which the compare reports as FAIL), never a stale
    // parquet from an older build that would silently pass
    def rm(f: java.io.File): Unit =
      graft.sources.ParquetSlices.deleteRecursively(f)
    rm(new java.io.File(outDir))
    new java.io.File(outDir).mkdirs()
    // dev affordance: SPARK_GRAFT_ONLY=q1,q2 restricts the dump (the
    // driver never sets it, so the graded run is always the full suite)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // a partial write must not linger either
        rm(new java.io.File(s"$outDir/$name"))
      }
      // drop per-query persists (Dedup internals) AND raw localCheckpoint
      // RDD blocks (iterative graph/CC rounds) that clearCache can't see
      Tables.sweepOperatorCaches(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Join-back oracles (approximate ANN) reference the engine's own
    // verify output — substitute the placeholder with the ABSOLUTE out
    // dir so the driver's DuckDB run resolves it from any cwd.
    // escaped for splicing into a single-quoted DuckDB string literal —
    // a quote in the path must not break (or worse, alter) the oracle
    val outAbs = Paths.get(outDir).toAbsolutePath.toString
      .replace("'", "''")
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace("__GRAFT_VERIFY_OUT__", outAbs))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
