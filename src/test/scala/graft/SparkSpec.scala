package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM, one session). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

trait SparkSpec extends AnyFunSuite {
  def spark: SparkSession = SparkSpec.spark
  def sf: String = SparkSpec.sf

  /** Drain the async listener bus so listener-dependent assertions
    * (pin release/retention, audit mirrors) are deterministic instead
    * of sleep-raced. LiveListenerBus.waitUntilEmpty is private[spark];
    * reach it via reflection (the BenchCensus pattern), falling back to
    * a fixed sleep if the internals ever move. */
  def drainListenerBus(): Unit = {
    val sc = spark.sparkContext
    try {
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethods
        .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
        match {
          case Some(wait0) => wait0.invoke(bus); ()
          case None =>
            bus.getClass.getMethod("waitUntilEmpty", classOf[Long])
              .invoke(bus, Long.box(5000L)); ()
        }
    } catch { case _: Throwable => Thread.sleep(500) }
  }
}
