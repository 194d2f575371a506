package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's data-sized shuffle-parallelism rule so a refactor
  * can't silently regress the floor (small fixtures must still keep the
  * big scans parallel), the cap (never more partitions than cores), or
  * the slope (one partition per 16 MB of input between them). */
class BenchConfigSpec extends AnyFunSuite {

  private val MB = 1L << 20

  test("floor: tiny inputs get 8 partitions regardless of core count") {
    assert(Bench.shufflePartitionsFor(0L, 32) == 8)
    assert(Bench.shufflePartitionsFor(18 * MB, 32) == 8) // the sf0.1 case
    assert(Bench.shufflePartitionsFor(127 * MB, 32) == 8)
  }

  test("slope: one partition per 16 MB between floor and cap") {
    assert(Bench.shufflePartitionsFor(160 * MB, 32) == 10)
    assert(Bench.shufflePartitionsFor(256 * MB, 32) == 16)
  }

  test("fixtureBytes recurses into table DIRECTORIES of part files") {
    val root = java.nio.file.Files.createTempDirectory("graft_fb")
    val tableDir = root.resolve("t.parquet")
    java.nio.file.Files.createDirectory(tableDir)
    java.nio.file.Files.write(tableDir.resolve("part-0.parquet"),
      new Array[Byte](1000))
    java.nio.file.Files.write(tableDir.resolve("part-1.parquet"),
      new Array[Byte](500))
    java.nio.file.Files.write(root.resolve("flat.parquet"),
      new Array[Byte](200))
    assert(Bench.fixtureBytes(root.toString) == 1700L,
      "part files inside a table directory must be counted")
    assert(Bench.fixtureBytes(root.resolve("missing").toString) == 0L)
  }

  test("cap: partitions never exceed the core count") {
    assert(Bench.shufflePartitionsFor(10L * 1024 * MB, 32) == 32)
    assert(Bench.shufflePartitionsFor(Long.MaxValue / 4, 32) == 32)
    // a smaller host caps lower but the floor still wins below it —
    // degenerate cpus < 8 keeps the floor (local test hosts)
    assert(Bench.shufflePartitionsFor(10L * 1024 * MB, 4) == 8)
  }

  test("fanout parallelism: half the cores, floor 8") {
    assert(Bench.fanoutParallelismFor(32) == 16) // the bench host case
    assert(Bench.fanoutParallelismFor(16) == 8)
    assert(Bench.fanoutParallelismFor(128) == 64) // production-width cores
    assert(Bench.fanoutParallelismFor(4) == 8) // floor wins on small hosts
  }
}
