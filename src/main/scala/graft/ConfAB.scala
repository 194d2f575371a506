package graft

import org.apache.spark.sql.SparkSession

/** In-session config A/B runner — the noise-immune companion to
  * [[Bench]]'s SPARK_GRAFT_EXTRA_CONF. Host-band drift on this sandbox
  * moves whole bench sessions ±40%, so two *sessions* cannot resolve a
  * 20% config effect; this main alternates the candidate conf ON/OFF
  * around every single query inside ONE session (A,B,A,B per query,
  * `SPARK_GRAFT_AB_PASSES` pairs, default 2) and publishes per-variant
  * MINIMA, so both variants sample the same contention windows.
  *
  * Only runtime-settable SQL confs can be A/B'd this way (e.g.
  * spark.sql.files.maxPartitionBytes); session-constructor confs still
  * need paired sessions.
  *
  * Usage:
  *   SPARK_GRAFT_AB_CONF="spark.sql.files.maxPartitionBytes=1048576" \
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   SPARK_GRAFT_BENCH_ONLY=q1_agg,q52_stats_moments \
  *   sbt "runMain graft.ConfAB"
  */
object ConfAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val passes = sys.env.getOrElse("SPARK_GRAFT_AB_PASSES", "2").toInt
    val abConf = sys.env.getOrElse("SPARK_GRAFT_AB_CONF", "")
      .split(";").map(_.trim).filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }.toSeq
    require(abConf.nonEmpty, "SPARK_GRAFT_AB_CONF required, e.g. k=v[;k=v]")
    val inputBytes = Bench.fixtureBytes(sfDir)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        Bench.shufflePartitionsFor(inputBytes, cpus.toInt).toString)
      .config("spark.default.parallelism",
        Bench.fanoutParallelismFor(cpus.toInt).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.silenceBoundedWindowWarn()

    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val qseq = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    // same warmup shape as Bench
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Seq("lineitem", "orders", "customer", "documents", "embeddings")
      .foreach(t => scala.util.Try(
        spark.read.parquet(s"$sfDir/$t.parquet").count()))
    scala.util.Try(spark.range(100L)
      .write.format("noop").mode("overwrite").save())

    // getOption: a conf with no session value and no default (e.g. one the
    // session never set) must not abort the tool before any run.
    val defaults = abConf.map { case (k, _) => k -> spark.conf.getOption(k) }
    def restoreDefaults(): Unit = defaults.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
    def withConf(on: Boolean)(body: => Double): Double = {
      if (on) abConf.foreach { case (k, v) => spark.conf.set(k, v) }
      else restoreDefaults()
      try body
      finally restoreDefaults()
    }
    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => Double.NaN }
      finally Tables.sweepOperatorCaches(spark)
    }

    // pass structure: per query, alternate OFF, ON within the same
    // contention window; repeat `passes` times; publish min per variant.
    // Failed runs (NaN) are skipped when folding minima — min(prev, NaN)
    // would permanently poison that query's minimum and the TOTAL line —
    // and counted separately.
    def foldMin(prev: Double, x: Double): Double =
      if (x.isNaN) prev else math.min(prev, x)
    val acc = scala.collection.mutable.Map[String, (Double, Double)]()
    val fails = scala.collection.mutable.Map[String, Int]()
    for (_ <- 1 to passes; (n, fn) <- qseq) {
      val off = withConf(on = false)(runOnce(fn))
      val on = withConf(on = true)(runOnce(fn))
      if (off.isNaN || on.isNaN)
        fails(n) = fails.getOrElse(n, 0) + Seq(off, on).count(_.isNaN)
      val (po, pn) = acc.getOrElse(n, (Double.MaxValue, Double.MaxValue))
      acc(n) = (foldMin(po, off), foldMin(pn, on))
    }
    println(f"${"query"}%-30s ${"off_s"}%8s ${"on_s"}%8s ${"delta"}%8s")
    var (to, tn) = (0.0, 0.0)
    acc.toSeq.sortBy(_._1).foreach { case (n, (o, v)) =>
      if (o == Double.MaxValue || v == Double.MaxValue) {
        println(f"$n%-30s ${"-"}%8s ${"-"}%8s    all-fail")
      } else {
        to += o; tn += v
        println(f"$n%-30s $o%8.3f $v%8.3f ${(v - o) / o * 100}%7.1f%%")
      }
    }
    println(f"TOTAL off=$to%8.3f on=$tn%8.3f ${(tn - to) / to * 100}%7.1f%%")
    if (fails.nonEmpty) println(s"FAILED runs (skipped in minima): " +
      fails.toSeq.sortBy(_._1).map { case (n, c) => s"$n=$c" }.mkString(", "))
    spark.stop()
  }
}
