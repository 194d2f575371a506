package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines.
  *
  * All samplers are HASH-based rather than RNG-based: membership is a
  * pure function of the row key, so samples are (a) reproducible across
  * runs/partitionings/cluster sizes, (b) consistent between tables (the
  * same key always lands in the sample — joinable samples), and (c)
  * embarrassingly parallel — a pushed-down filter, no shuffle, no state.
  * That is the only sampling discipline that survives a 100 TB rerun;
  * `rand()`-based `df.sample` changes membership under retries and AQE
  * re-planning.
  *
  * The hash is [[Dedup.portableHash32]] (md5-derived) so every sampler is
  * DuckDB-oracle-checkable bit-for-bit; at production scale substitute
  * xxhash64 for md5 — same plan shape, ~10× cheaper per row.
  */
object Sampling {

  /** Uniform `pct`% sample: keep rows whose key hashes into the first
    * `pct` of 100 buckets. */
  def hashSample(df: DataFrame, key: Column, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct must be in [0,100], got $pct")
    df.filter(pmod(Dedup.portableHash32(key.cast("string")), lit(100)) < pct)
  }

  /** Fixed-size per-stratum sample: the `n` rows of each stratum whose
    * keys hash lowest — a deterministic stand-in for per-group reservoir
    * sampling. One window pass partitioned by stratum; at scale each
    * stratum's rows shuffle once to its partition and the hash order makes
    * the pick independent of arrival order (rerun-stable, unlike a
    * reservoir fed by a nondeterministic scan order).
    *
    * Precondition: `key` is unique within each stratum — duplicate key
    * values tie on (hash, key) and the row_number tiebreak among them
    * falls back to arrival order, which is not rerun-stable. */
  def hashSampleNPerStratum(df: DataFrame, key: Column, stratum: Column,
      n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum)
      .orderBy(Dedup.portableHash32(key.cast("string")), key)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= n).drop("_rn")
  }

  /** Deterministic Gumbel-top-k importance resampling: draw the `k`
    * items of a weighted corpus as if sampling WITHOUT replacement with
    * probability ∝ exp(logWeight) — the selection step behind DSIR-style
    * importance resampling. The Gumbel-max trick makes it a plain top-k:
    * key = logWeight + Gumbel(0,1) noise; the noise is HASH-derived
    * (u = (h + ½)/2³², g = −ln(−ln u)) so the "random" draw is a pure
    * function of the row key — rerun-stable, partitioning-independent,
    * oracle-checkable, per the module's no-RNG discipline. Plans as
    * TakeOrderedAndProject: per-partition partial top-k, never a global
    * sort. Keys round to 6 dp with the row key as tiebreak, so the
    * selected set is stable against sub-ulp drift. */
  def gumbelTopK(df: DataFrame, key: Column, logWeight: Column,
      k: Int): DataFrame = {
    val u = (Dedup.portableHash32(key.cast("string")) + lit(0.5)) /
      lit(4294967296.0)
    val g = -log(-log(u))
    df.withColumn("gumbel_key", round(logWeight + g, 6))
      .orderBy(col("gumbel_key").desc, key)
      .limit(k)
  }

  /** Per-stratum percent rates that reshape the corpus toward a target
    * mixture (shares summing to ~1), downsampling-only: the largest
    * feasible output keeping every stratum at or below its target share
    * is found, then rate_s = that output's demand on stratum s. Strata
    * absent from `targetShares` get 0. Feed the result straight into
    * [[stratifiedHashSample]]. Driver-side math over one tiny count
    * aggregation — the data itself is never shuffled. */
  def mixtureRates(df: DataFrame, stratum: Column,
      targetShares: Map[String, Double]): Map[String, Int] = {
    val counts = df.groupBy(stratum.cast("string").as("s")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // scale = output total; capped so no stratum needs upsampling:
    // n_s >= share_s * scale  =>  scale <= n_s / share_s for all s
    val feasible = targetShares.collect {
      case (s, share) if share > 0 && counts.contains(s) => counts(s) / share
    }
    if (feasible.isEmpty) Map.empty
    else {
      val scale = feasible.min
      targetShares.collect {
        case (s, share) if counts.contains(s) =>
          val want = share * scale
          s -> math.min(100, math.round(100.0 * want / counts(s)).toInt)
      }
    }
  }

  /** Temperature-scaled mixture rates — the multilingual α-sampling of
    * mT5/XLM-R: target share_s ∝ p_s^(1/T) where p_s is stratum s's
    * natural share. T = 1 keeps the corpus mixture, T → ∞ approaches
    * uniform; 2–5 is the usual "boost the tail without drowning the
    * head" range. Downsampling-only like [[mixtureRates]] (the largest
    * feasible output is taken), and the same driver-math-over-one-count
    * contract: the data is never shuffled.
    *
    * Determinism: the share normalizer is a LEFT FOLD over strata in
    * sorted order, so the oracle's `list_sum(list(pw ORDER BY s))`
    * reproduces the identical IEEE sum. Feed the result straight into
    * [[stratifiedHashSample]]. */
  def temperatureRates(df: DataFrame, stratum: Column,
      temperature: Double): Map[String, Int] = {
    require(temperature > 0, "temperature must be positive")
    val counts = df.groupBy(stratum.cast("string").as("s")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) return Map.empty
    val n = counts.values.sum.toDouble
    val pw = counts.toSeq.sortBy(_._1)
      .map { case (s, c) => s -> math.pow(c / n, 1.0 / temperature) }
    val z = pw.map(_._2).sum
    val shares = pw.map { case (s, p) => s -> (p / z) }
    val scale = shares.map { case (s, share) => counts(s) / share }.min
    shares.map { case (s, share) =>
      s -> math.min(100, math.round(100.0 * share * scale / counts(s)).toInt)
    }.toMap
  }

  /** Deterministic train/val/test assignment: label every row with the
    * split its key hashes into, by cumulative percent ranges in the given
    * order (e.g. `Seq("train" -> 90, "val" -> 5, "test" -> 5)`). Splits
    * are disjoint and exhaustive (weights must sum to 100), stable across
    * reruns/partitionings, and consistent across tables sharing the key —
    * the properties a data split must have for a training run to be
    * reproducible and leak-free. Pure projection: no shuffle, no state. */
  def assignSplits(df: DataFrame, key: Column,
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "each split needs a positive weight")
    require(splits.map(_._2).sum == 100,
      s"split weights must sum to 100, got ${splits.map(_._2).sum}")
    val bucket = pmod(Dedup.portableHash32(key.cast("string")), lit(100))
    val uppers = splits.scanLeft(0)(_ + _._2).tail
    val assigned = splits.zip(uppers).drop(1).foldLeft(
      when(bucket < uppers.head, lit(splits.head._1))) {
      case (acc, ((name, _), hi)) => acc.when(bucket < hi, lit(name))
    }
    df.withColumn("split", assigned)
  }

  /** Curriculum ordering: assign every row a global training position
    * that presents easy examples first — rows are bucketed by fixed
    * `edges` thresholds on a difficulty score (bucket = number of edges
    * the score meets; fixed literals, NOT quantiles, so the bucketing is
    * a stateless scan-stage expression), deterministically shuffled
    * WITHIN each bucket by a salted hash (a fresh `salt` reshuffles each
    * epoch without reordering the curriculum itself), and numbered by
    * [[graft.ops.Layout.globalRowNumber]] — so no global single-task
    * sort ever happens: the composite (bucket << 32 | hash) key is
    * range-sharded, counted, prefix-offset, and shard-locally numbered,
    * with `key` as the uniqueness tiebreak under hash collisions.
    *
    * Requires ≤ 2^31 buckets (edges list is small by construction) and a
    * unique `key`. Appends (bucket, rn). */
  def curriculumOrder(df: DataFrame, key: Column, difficulty: Column,
      edges: Seq[Double], salt: String = "cur0"): DataFrame = {
    require(edges.nonEmpty && edges == edges.sorted,
      s"edges must be non-empty ascending, got $edges")
    val bucket = edges.foldLeft(lit(0)) { (acc, e) =>
      acc + when(difficulty >= lit(e), 1).otherwise(0)
    }
    val h = Dedup.portableHash32(concat(lit(salt), lit(":"), key.cast("string")))
    val keyed = df.withColumn("bucket", bucket)
      .withColumn("_ckey",
        shiftleft(col("bucket").cast("long"), 32).bitwiseOR(h))
    graft.ops.Layout.globalRowNumber(keyed, col("_ckey"), tiebreak = Seq(key))
      .drop("_ckey")
  }

  /** Stratified sample with a per-stratum rate (percent). Rows in strata
    * absent from `rates` are dropped. One case-expression filter — still
    * no shuffle; rebalancing skewed strata (e.g. downsampling the 90%
    * majority language to match minorities) costs the same as a WHERE. */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Int]): DataFrame = {
    rates.foreach { case (s, p) =>
      require(p >= 0 && p <= 100, s"rate for stratum '$s' must be in [0,100], got $p")
    }
    val rate = rates.foldLeft(lit(0)) { case (acc, (s, p)) =>
      when(stratum === s, lit(p)).otherwise(acc)
    }
    df.filter(pmod(Dedup.portableHash32(key.cast("string")), lit(100)) < rate)
  }
}
