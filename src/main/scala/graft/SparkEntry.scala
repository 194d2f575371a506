package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-package query registries; every entry in [[queries]]
  * with a matching [[oracleSql]] entry is hash-checked against DuckDB by
  * the driver at sf0.01.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q5_multi_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.Parity.queries ++
      graft.queries.Extensions.queries ++ graft.queries.Corpus.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++ graft.queries.Parity.oracle ++
      graft.queries.Extensions.oracle ++ graft.queries.Corpus.oracle

  /** Bench-denominator-only standalone twins for the join-back ANN
    * oracles (exact top-k brute force — see the Extensions scaladoc).
    * [[Bench]] overlays these on [[oracleSql]] before invoking
    * tools/bench_duckdb.py so every timed query carries a DuckDB
    * denominator; [[Verify]] ignores them (correctness keeps the
    * stricter join-back hash check). */
  def benchTwinSql: Map[String, String] = graft.queries.Extensions.benchTwinSql
}
