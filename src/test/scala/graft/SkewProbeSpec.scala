package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate, MapPartitions}

/** CI-scale planted-skew probe (VERDICT r12 item 4): the full
  * graft.SkewProbe is a manual sf1 `runMain`; this spec runs the same
  * plant-and-drive at n=2000 on the fixture with the caps forced down
  * to 256 so the split valve ENGAGES even at spec scale, and pins the
  * two invariants the probe certifies:
  *
  *   1. exact pair output — every detector emits at least the planted
  *     block's C(n,2) pairs (the probe's own `require`; the valve may
  *     split, never drop);
  *   2. streamed emission — the pair expansion is the lazy
  *     `mapPartitions` iterator of [[graft.ext.Posting.streamPairs]],
  *     NEVER a Generate above the posting aggregation: codegen
  *     `GenerateExec` buffers one input row's entire expansion as
  *     UnsafeRow copies before the consumer can drain, which OOMed
  *     every detector on a degenerate 2·10⁴-member block (round 12).
  *     The plan assertion catches that regression deterministically —
  *     at spec scale the buffering would still FIT in heap (and
  *     peakExecutionMemory does not track Generate's untracked copies),
  *     so a memory measurement alone could not.
  */
class SkewProbeSpec extends SparkSpec {

  test("planted degenerate block: all five detectors split, stream, and emit exact pairs") {
    val n = 2000
    val c = SkewProbe.planted(spark, sf, n, bgImages = 2000)
    SkewProbe.detectors(c, n, maxBucket = Some(256)).foreach {
      case (name, _, mk) =>
        val plan = mk().queryExecution.optimizedPlan
        assert(plan.exists(_.isInstanceOf[MapPartitions]),
          s"$name: pair emission is no longer the streamed mapPartitions iterator")
        plan.foreach {
          case g: Generate =>
            val expandsPosting = g.child.exists {
              case a: Aggregate => a.aggregateExpressions.exists(_.name == "ms")
              case _ => false
            }
            assert(!expandsPosting,
              s"$name: a Generate expands the posting list — the " +
                "GenerateExec buffering regression (see Posting.streamPairs)")
          case _ => ()
        }
    }
    // drive to completion: probeAll's own `require` enforces the
    // C(n,2) pair floor per detector (split-don't-drop), mirroring the
    // sf1 probe recorded in BASELINE.md
    val rs = SkewProbe.probeAll(spark, sf, n, bgImages = 2000,
      maxBucket = Some(256))
    assert(rs.map(_.name).toSet ==
      Set("minhash", "simhash", "phash", "sax", "fuzzy"),
      s"probe did not cover every detector: ${rs.map(_.name)}")
  }
}
