package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import scala.util.Random

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, as a 100 TB design requires:
  *  - [[bruteForceTopK]]: exact cosine top-k. Corpus-side scan × broadcast
  *    query set — no shuffle of the corpus at all; per-partition partial
  *    top-k via the rank window. Right answer for ≤ thousands of queries.
  *  - [[lshTopK]]: random-hyperplane LSH. Each vector maps to a small
  *    bucket key (one cheap projection), the join keys on bucket — the
  *    corpus never cross-products. Approximate; recall measured in
  *    SimilaritySpec against the exact path.
  *
  * Dot products use the codegen'd [[graft.functions.DotProduct]]
  * expression — a sequential double fold, which matches the DuckDB
  * oracle's `list_sum(list_transform(list_zip(...)))` bit-for-bit (same
  * IEEE op order) while avoiding the per-element boxing of the
  * interpreted `zip_with`/`aggregate` route; cosines are rounded to 4 dp
  * for rank stability.
  */
object Similarity {

  /** embedding column cast to array<double> for deterministic arithmetic.
    * (Compute paths use [[graft.functions.DotProduct]], which widens
    * float→double element-wise itself — same values, no array rewrite.) */
  def vec(c: Column): Column = transform(c, x => x.cast("double"))

  /** Codegen'd sequential-fold dot product — bit-identical to the
    * interpreted `aggregate(zip_with(...))` route and to DuckDB's
    * `list_sum(list_transform(list_zip(...)))`, but allocation-free. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Shared exact-cosine scoring core: corpus scan × broadcast queries,
    * self-match guard + any extra predicate fused into one codegen'd
    * filter, 4-dp rounded cosine, per-partition partial top-k via the
    * rank window. ONE implementation so the exact-topk and
    * hard-negative paths cannot drift apart. */
  private def cosineTopK(c: DataFrame, q: DataFrame, k: Int,
      extraFilter: Column, outCols: Seq[Column]): DataFrame = {
    val scored = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid") && extraFilter)
      .withColumn("cos",
        round(dot(col("v"), col("qv")) / (col("nrm") * col("qn")), 4))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    scored.select(outCols :+ row_number().over(w).as("rk"): _*)
      .filter(col("rk") <= k)
  }

  /** Exact cosine top-k neighbors for each query vector.
    * `queries` must be small enough to broadcast (it is hint-broadcast). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    cosineTopK(
      corpus.select(col("vec_id"), col("embedding").as("v"))
        .withColumn("nrm", norm(col("v"))),
      queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
        .withColumn("qn", norm(col("qv"))),
      k, lit(true), Seq(col("qid"), col("vec_id"), col("cos")))

  /** HARD-NEGATIVE mining: for each query vector, the top-k most-similar
    * corpus vectors with a DIFFERENT label — the contrastive-training
    * companion of [[bruteForceTopK]] (positives come from the same
    * label; the hardest negatives are the cross-label near-misses).
    * Same [[cosineTopK]] core, label inequality fused into the filter. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    cosineTopK(
      corpus.select(col("vec_id"), col("label"), col("embedding").as("v"))
        .withColumn("nrm", norm(col("v"))),
      queries.select(col("vec_id").as("qid"), col("label").as("qlabel"),
          col("embedding").as("qv"))
        .withColumn("qn", norm(col("qv"))),
      k, col("label") =!= col("qlabel"),
      Seq(col("qid"), col("qlabel"), col("vec_id"), col("label"), col("cos")))

  /** Exact RE-RANK of an approximate retriever's candidates — the second
    * half of the standard retrieve-then-rerank pattern: `pairs` is any
    * (qid, vec_id) candidate set (from LSH / IVF / PQ-ADC), and the
    * output re-scores each pair with the exact 4-dp cosine and re-ranks
    * within each query's candidate set. The candidate SET stays
    * approximate (recall is the retriever's spec-gated property), but
    * every reported score and rank is exact — which also makes the
    * result oracle-checkable: DuckDB can recompute the scores for
    * exactly the returned pairs.
    *
    * 100 TB shape: cost is O(|pairs|) dot products — |queries|·k rows —
    * independent of corpus size; the pairs→corpus join is a narrow
    * equi-join on vec_id and the query side broadcasts. */
  def rescoreExact(pairs: DataFrame, corpus: DataFrame,
      queries: DataFrame): DataFrame = {
    val c = corpus.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", norm(col("v")))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .withColumn("qn", norm(col("qv")))
    val scored = pairs.select(col("qid"), col("vec_id"))
      .join(c, "vec_id")
      .join(broadcast(q), "qid")
      .withColumn("cos",
        round(dot(col("v"), col("qv")) / (col("nrm") * col("qn")), 4))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    scored.select(col("qid"), col("vec_id"), col("cos"),
      row_number().over(w).as("rk"))
  }

  /** Exact MAXIMUM-INNER-PRODUCT top-k — [[bruteForceTopK]] without the
    * normalization: the retrieval form for embeddings whose magnitude
    * carries signal (recommendation scores, unnormalized output heads).
    * Same plan shape: corpus scan × broadcast queries, per-partition
    * partial top-k via the rank window, no corpus shuffle. */
  def mipsTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id"), col("embedding").as("v"))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("ip", round(dot(col("v"), col("qv")), 4))
    val w = Window.partitionBy(col("qid")).orderBy(col("ip").desc, col("vec_id"))
    scored.select(col("qid"), col("vec_id"), col("ip"), row_number().over(w).as("rk"))
      .filter(col("rk") <= k)
  }

  /** Seeded random hyperplanes: `nBits` directions in `dim` dimensions. */
  def hyperplanes(dim: Int, nBits: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bucket key: bit b = 1 iff v · plane_b > 0. */
  def bucketKey(v: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.map { p =>
      // ONE array literal, not CreateArray(64 lits): a CreateArray
      // re-materializes the array per row and its 64 child nodes bloat
      // analysis + codegen of every derived plan
      when(dot(v, lit(p)) > 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** Approximate top-k via MULTI-TABLE random-hyperplane LSH: `nTables`
    * independent `nBits`-bit bucketings; a candidate is any corpus vector
    * sharing a bucket with the query in ANY table (recall ≈
    * 1 − (1 − p^nBits)^nTables, p = 1 − θ/π).
    *
    * 100 TB shape: the corpus explodes ×nTables into (table, bucket) keys
    * — one shuffle to hash-partition by bucket, reusable across query
    * batches; queries broadcast; candidates dedup before exact scoring,
    * so the expensive dot products run once per (query, candidate). The
    * corpus never cross-products. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nBits: Int = 4, nTables: Int = 8, seed: Long = 42L, dim: Int = -1): DataFrame = {
    // dim <= 0 → derive from the data; a mismatched explicit dim would
    // silently project against truncated/zero-padded hyperplanes and
    // quietly destroy recall (DotProduct folds to the shorter length)
    val actualDim =
      if (dim > 0) dim
      else corpus.select(size(col("embedding"))).first().getInt(0)
    val planes = hyperplanes(actualDim, nBits * nTables, seed)
    def tableKeys(v: Column): Column = array((0 until nTables).map { tbl =>
      val tp = planes.slice(tbl * nBits, (tbl + 1) * nBits)
      concat(lit(tbl.toString + ":"), bucketKey(v, tp))
    }: _*)

    val c = corpus.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", norm(col("v")))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .withColumn("qn", norm(col("qv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    // nTables == 1: cross-table duplicates are IMPOSSIBLE (one bucket row
    // per vector per side, so the bucket join emits each (qid, vec_id) at
    // most once) — the candidate `.distinct()` is pure waste and, with no
    // explode multiplication, the vector can ride its single bucket row
    // and score IN the task that found the candidate: no distinct
    // exchange, no corpus join-back. This is the ann_lsh_exact (nBits=0)
    // shape; r15 same-protocol sf1 subset A/B: 1.93 s → 1.16 s.
    if (nTables == 1) {
      val scored = c.withColumn("bucket", element_at(tableKeys(col("v")), 1))
        .join(broadcast(q.withColumn("bucket",
          element_at(tableKeys(col("qv")), 1))), "bucket")
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("cos",
          round(dot(col("v"), col("qv")) / (col("nrm") * col("qn")), 4))
      scored.select(col("qid"), col("vec_id"), col("cos"),
          row_number().over(w).as("rk"))
        .filter(col("rk") <= k)
    } else {
      // MULTI-TABLE stays distinct + join-back — the r15 A/B of two
      // ownership variants (first-agreeing-table key equality, which is
      // provably exactly-once) measured SLOWER at scale on the same
      // sf1 subset protocol: scan-local (vector + key array riding the
      // ×nTables explode) 5.68 → 7.96 s, ownership + join-back (only
      // the key arrays riding) 5.68 → 8.48 s
      // (bench_ab/r15_lsh_sf1_{orig,scanlocal,hybrid}.json) — at
      // candidate volume, the per-occurrence key-array row copies cost
      // more than the 16-byte-row distinct they replace, and only the
      // distinct keeps the join-back probe set minimal. Measured
      // negatives, kept as the record for why this shape survives.
      val cKeyed = c.select(col("vec_id"), explode(tableKeys(col("v"))).as("bucket"))
      val qKeyed = q.select(col("qid"), explode(tableKeys(col("qv"))).as("bucket"))
      val cand = cKeyed.join(broadcast(qKeyed), "bucket")
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id")).distinct()
      val scored = cand
        .join(c, "vec_id")
        .join(broadcast(q), "qid")
        .withColumn("cos",
          round(dot(col("v"), col("qv")) / (col("nrm") * col("qn")), 4))
      scored.select(col("qid"), col("vec_id"), col("cos"),
          row_number().over(w).as("rk"))
        .filter(col("rk") <= k)
    }
  }

  /** IVF (inverted-file) approximate top-k — the classic coarse-quantizer
    * ANN: assign every corpus vector to its nearest of `nCells` centroids
    * (one pass), probe only the `nProbe` cells nearest each query.
    *
    * Centroids are a deterministic seeded sample of the corpus refined by
    * a few Lloyd iterations ON THE DRIVER over a bounded sample — at
    * 100 TB you train the quantizer on a sample (standard practice), then
    * the expensive full-corpus pass is a single scan + narrow shuffle on
    * cell id; queries broadcast. Versus LSH: IVF adapts to the data
    * distribution, so recall per candidate examined is usually higher.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4, seed: Long = 42L,
      sampleSize: Int = 2000, lloydIters: Int = 5): DataFrame = {
    val centroids = trainQuantizer(corpus, nCells, seed, sampleSize, lloydIters)

    def cellOf(v: Column): Column = cellOfExpr(centroids)(v)
    def probeCells(v: Column): Column = probeCellsExpr(centroids, nProbe)(v)

    val c = corpus.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", norm(col("v")))
      .withColumn("cell", cellOf(col("v")))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .withColumn("qn", norm(col("qv")))
      .withColumn("cell", explode(probeCells(col("qv"))))

    val scored = c.join(broadcast(q), "cell")
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", round(dot(col("v"), col("qv")) / (col("nrm") * col("qn")), 4))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    scored.select(col("qid"), col("vec_id"), col("cos"), row_number().over(w).as("rk"))
      .filter(col("rk") <= k)
  }

  private def dotArr(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length && i < b.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def normArr(a: Array[Double]): Double = math.sqrt(dotArr(a, a))

  /** Train the IVF coarse quantizer on a DETERMINISTIC driver-side sample:
    * plain limit() takes whichever partitions answer first, so the
    * centroids (and every downstream cell/result) would change with
    * parallelism — hash-ordering the keys makes the sample a pure function
    * of the data. At 100 TB you train the quantizer on a sample (standard
    * practice); the driver only ever holds sampleSize×dim doubles. */
  private[ext] def trainQuantizer(corpus: DataFrame, nCells: Int, seed: Long,
      sampleSize: Int, lloydIters: Int): Array[Array[Double]] = {
    val sample = corpus
      .orderBy(Dedup.portableHash32(col("vec_id").cast("string")), col("vec_id"))
      .limit(sampleSize)
      .select(col("embedding"))
      .collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val rnd = new Random(seed)
    var centroids = rnd.shuffle(sample.indices.toList).take(nCells)
      .map(sample(_)).toArray
    for (_ <- 0 until lloydIters) {
      val assign = sample.map { v =>
        centroids.indices.maxBy(c => dotArr(v, centroids(c)) /
          (normArr(centroids(c)) max 1e-12))
      }
      centroids = centroids.indices.map { c =>
        val members = sample.indices.filter(assign(_) == c)
        if (members.isEmpty) centroids(c)
        else {
          val dim = sample(0).length
          val m = new Array[Double](dim)
          members.foreach(i => (0 until dim).foreach(d => m(d) += sample(i)(d)))
          m.map(_ / members.length)
        }
      }.toArray
    }
    centroids
  }

  /** Cell assignment as a column expression: argmax over centroid cosines.
    * Centroids are literals compiled into the plan — no broadcast, no
    * join; the corpus is scanned once. */
  private[ext] def cellOfExpr(centroids: Array[Array[Double]])(v: Column): Column = {
    val scores = centroids.zipWithIndex.map { case (cvec, i) =>
      // lit(cvec), not array(lit, ...): one constant per centroid keeps
      // the expression tree k nodes wide instead of k×dim
      struct((dot(v, lit(cvec)) /
        lit(normArr(cvec) max 1e-12)).as("s"), lit(i).as("c"))
    }
    array_max(array(scores: _*)).getField("c")
  }

  /** The `nProbe` nearest cells by centroid cosine, as an array column. */
  private[ext] def probeCellsExpr(centroids: Array[Array[Double]], nProbe: Int)(
      v: Column): Column = {
    val scores = centroids.zipWithIndex.map { case (cvec, i) =>
      struct((dot(v, lit(cvec)) /
        lit(normArr(cvec) max 1e-12)).as("s"), lit(i).as("c"))
    }
    slice(reverse(array_sort(array(scores: _*))), 1, nProbe)
      .getField("c")
  }

  /** Per-label mean centroids of an (vec_id, label, embedding) table:
    * (clabel, cv: array<double>, cnrm).
    *
    * The per-dimension mean goes through an exact DECIMAL(20,10) sum —
    * double sums are partition-order-dependent, decimal sums are
    * associative, so the centroid (and everything downstream) is
    * bit-reproducible at any parallelism and matches the DuckDB oracle.
    * Plan: one posexplode (×dim rows, map-local) → one grouped agg on
    * (label, pos) with map-side partials → one tiny agg to reassemble the
    * vector. Output is k rows — broadcastable at any corpus size. */
  def labelCentroids(emb: DataFrame): DataFrame = {
    val e = emb.select(col("label"), vec(col("embedding")).as("v"))
    // stays posexplode + groupBy(label, pos) + reassemble: the r14 A/B
    // of a dim-wide label-keyed aggregate (one agg, no collect_list,
    // one dim-probe job) measured SLOWER on embed_centroid_assign
    // (0.56s -> 0.79s same-protocol subset bench) — same grouped
    // wide-buffer penalty as the Lloyd M-step note above. Measured
    // negative result; keep the explode.
    val cd = e.select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg((sum(col("x").cast("decimal(20,10)")).cast("double") /
        count(lit(1))).as("m"))
    cd.groupBy(col("label").as("clabel"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("clabel"),
        transform(col("pm"), p => p.getField("m")).as("cv"))
      .withColumn("cnrm", norm(col("cv")))
  }

  /** k-means E-step against the label centroids: every vector is assigned
    * to its nearest centroid by cosine (deterministic tie-break on the
    * larger label). Centroids broadcast; the corpus is scanned once with
    * no shuffle of the vectors themselves — the 100 TB-shaped plan for
    * any fixed-codebook assignment (IVF cell assignment is this same op).
    * Returns (vec_id, label, assigned, cos). */
  def centroidAssign(emb: DataFrame): DataFrame = {
    val cent = labelCentroids(emb)
    val n = emb.select(col("vec_id"), col("label"), vec(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val scored = n.crossJoin(broadcast(cent))
      .withColumn("cos",
        round(dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")), 4))
    // per-vector argmax as a map-side-combinable max-struct aggregate,
    // not a window: the window form shuffled all k candidate rows per
    // vector and sorted them; the partial aggregation reduces each
    // vector to ONE row before the exchange (and no sort at all).
    // max(struct(cos, clabel)) is lexicographic — highest cos, ties to
    // the larger label — exactly the (cos DESC, clabel DESC) rn=1 row.
    scored.groupBy(col("vec_id"), col("label"))
      .agg(max(struct(col("cos"), col("clabel"))).as("_best"))
      .select(col("vec_id"), col("label"),
        col("_best.clabel").as("assigned"), col("_best.cos").as("cos"))
  }

  /** Distributed k-means (Lloyd) over the full corpus — unlike
    * [[ivfTopK]]'s sample-trained quantizer, every E-step scans all
    * vectors and every M-step aggregates all of them; the driver only
    * ever holds the k×dim centroid matrix.
    *
    * Deterministic at any parallelism: init picks the k vectors with the
    * lowest portable hash of vec_id (no RNG), the E-step breaks distance
    * ties toward the lower cell index, and the M-step sums coordinates in
    * exact DECIMAL — so reruns, repartitions, and cluster resizes all
    * produce the identical model. Per iteration: one broadcast-free scan
    * (centroids are literals compiled into the plan) + one grouped
    * aggregation of k×dim partial sums — the 100 TB cost is iters × one
    * pass over the data, with only k×dim rows ever collected. */
  def kMeans(emb: DataFrame, k: Int = 8, iters: Int = 5): DataFrame = {
    val e = emb.select(col("vec_id"), vec(col("embedding")).as("v"))
    assignCells(e, lloydCentroids(e, k, iters))
      .select(col("vec_id"), col("cell"))
  }

  /** Each vector's coordinate along the corpus's dominant (uncentered)
    * principal direction — the 1-D "embedding spectrum" used to sort,
    * bucket, or split a corpus by its strongest axis of variation
    * (center the embeddings first if mean-offset matters). The direction
    * is the top right-singular vector of the stacked embedding matrix,
    * found by power iteration: w ← Σᵢ (xᵢ·v) xᵢ, v ← w/‖w‖.
    *
    * Shape at 100 TB: one scan per iteration; driver state is `dim`
    * doubles (same bounded-control-state budget as k-means centroids).
    * Determinism, so the oracle can hash-match: per-row dot products use
    * the codegen sequential fold (bit-identical to DuckDB's list_sum
    * chain), are rounded to 8 dp and cast to DECIMAL before the
    * cross-row component sums (order-independent exact aggregation), and
    * the norm is an exact decimal sum of squares on the driver — every
    * iteration hands BOTH engines bit-identical direction vectors.
    * Returns (vec_id, proj) with proj rounded to 6 dp. */
  def powerIterationPC(emb: DataFrame, iters: Int = 4): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // every iteration is its own job over the same widened vectors;
    // pin them once (vec_id + dim doubles per row, spillable) instead
    // of re-reading and re-widening the source per iteration
    val e = emb.select(col("vec_id"), vec(col("embedding")).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dim = e.select(size(col("v")).as("d")).head.getInt(0)
    var dir = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    for (_ <- 0 until iters) {
      val vlit = array(dir.map(lit): _*)
      // dim-wide single-row aggregation instead of posexplode +
      // groupBy(pos): the explode multiplied the scan into |corpus|·dim
      // rows and shuffled them per iteration, where the wide agg keeps
      // one dim-slot decimal buffer per task and shuffles ONE partial
      // row per partition (decimal sums are exact, so the element-wise
      // totals are bit-identical to the grouped ones — same per-term
      // double multiply, same DECIMAL(38,12) cast, order-free sum)
      val aggs = (0 until dim).map(i =>
        sum((col("s") * element_at(col("v"), i + 1))
          .cast(DecimalType(38, 12))).cast("double"))
      val row = e
        .select(round(dot(col("v"), vlit), 8).cast(DecimalType(28, 8)).as("s"),
          col("v"))
        .agg(aggs.head, aggs.tail: _*).head()
      val w = Array.tabulate(dim)(row.getDouble)
      // exact decimal norm²: mirrors the oracle's SUM(CAST(w*w AS
      // DECIMAL(38,12))) — HALF_UP per-term rounding, order-free sum
      val n2 = w.map(x => BigDecimal(x * x)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      val nrm = math.sqrt(n2)
      dir = w.map(_ / nrm)
    }
    val vlit = array(dir.map(lit): _*)
    e.select(col("vec_id"), round(dot(col("v"), vlit), 6).as("proj"))
  }

  /** The Lloyd trainer behind [[kMeans]]/[[embedOutliers]]: hash-ordered
    * deterministic init, then per iteration one E-step scan + one
    * decimal-exact M-step aggregation (k×dim driver state). */
  private def lloydCentroids(e: DataFrame, k: Int,
      iters: Int): Array[Array[Double]] = {
    // each Lloyd round is its own job over the same widened vectors —
    // pin them (callers pass the same frame to the final assignment, so
    // it reuses the cache too; harnesses clear caches between queries)
    e.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var centroids = e
      .withColumn("h", Dedup.portableHash32(col("vec_id").cast("string")))
      .orderBy(col("h"), col("vec_id")).limit(k)
      .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
    require(centroids.length == k, s"corpus has fewer than $k vectors")
    // M-step stays posexplode + groupBy(cell, pos): the r14 A/B of the
    // dim-wide single-group-key form (64 decimal sum buffers per cell,
    // the r13 PCA rewrite's shape) measured SLOWER here — embed_kmeans
    // 0.86s -> 1.13s, embed_outliers 1.20s -> 1.28s same-protocol
    // subset bench — because unlike PCA's group-FREE flat-buffer agg,
    // a grouped hash aggregate with 65 wide buffers loses more to
    // per-group buffer width than the explode loses to row
    // multiplication (the explode's k*dim partials already combine
    // map-side, so the exchange is tiny either way). Measured negative
    // result; keep the explode.
    for (_ <- 0 until iters) {
      val sums = assignCells(e, centroids)
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("x").cast("decimal(20,10)")).cast("double").as("s"),
          count(lit(1)).as("n"))
        .collect()
      val next = Array.tabulate(k)(c => centroids(c).clone()) // empty cell keeps its centroid
      sums.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2) / r.getLong(3)
      }
      centroids = next
    }
    centroids
  }

  /** Centroid-distance OUTLIER flags: cluster with [[kMeans]]' centroids,
    * then flag vectors whose squared L2 distance to their centroid
    * exceeds mean + `sigmas`·σ of their cell — the embedding-space
    * anomaly gate (mislabeled, corrupted, or off-distribution examples)
    * run before embeddings feed retrieval or dedup.
    *
    * Shape at 100 TB: one extra scan over the assigned frame (map-side-
    * combinable decimal sums, k-row stats broadcast back). Determinism:
    * distances round to 6 dp and the cell moments come from EXACT
    * decimal sums — mean/σ are single IEEE expressions of those sums,
    * so the flag is partition-order independent and oracle-checkable.
    * Returns (vec_id, cell, dist, is_outlier). */
  def embedOutliers(emb: DataFrame, k: Int = 8, iters: Int = 3,
      sigmas: Double = 2.0): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val e = emb.select(col("vec_id"), vec(col("embedding")).as("v"))
    val assigned = assignCells(e, lloydCentroids(e, k, iters))
      .select(col("vec_id"), col("cell"),
        round(greatest(col("d"), lit(0.0)), 6)
          .cast(DecimalType(18, 6)).as("rd"))
    val stats = assigned.groupBy(col("cell"))
      .agg(sum(col("rd")).as("s1"),
        sum((col("rd") * col("rd")).cast(DecimalType(38, 12))).as("s2"),
        count(lit(1)).as("n"))
    assigned.join(broadcast(stats), Seq("cell"))
      .withColumn("mean", col("s1").cast("double") / col("n"))
      .withColumn("msq", col("s2").cast("double") / col("n"))
      .withColumn("std",
        sqrt(greatest(col("msq") - col("mean") * col("mean"), lit(0.0))))
      .select(col("vec_id"), col("cell"),
        col("rd").cast("double").as("dist"),
        (col("rd").cast("double") > col("mean") + lit(sigmas) * col("std"))
          .as("is_outlier"))
  }

  /** E-step: nearest centroid by squared L2 (ties to the lower index).
    * ||v-c||² = v·v − 2 v·c + c·c, with v·v computed once per row. */
  private def assignCells(e: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    val withVv = e.withColumn("_vv", dot(col("v"), col("v")))
    val scores = centroids.zipWithIndex.map { case (cvec, i) =>
      // one array literal per centroid (see cellOfExpr) — per-row
      // CreateArray allocation and k×dim-node plans were the dominant
      // cost of each Lloyd iteration, not the data
      struct((col("_vv") - lit(2.0) * dot(col("v"), lit(cvec)) +
        lit(dotArr(cvec, cvec))).as("d"), lit(i).as("c"))
    }
    withVv.withColumn("_best", array_min(array(scores: _*)))
      .withColumn("cell", col("_best").getField("c"))
      .withColumn("d", col("_best").getField("d"))
      .drop("_vv", "_best")
  }

  /** APPLY embedding-cosine near-dup dedup: within each block, drop every
    * vector whose cosine to some LOWER-id vector reaches `threshold` (the
    * lower id survives — same keep-min convention as
    * [[graft.ext.Dedup.applyPairDedup]]). The blocking key bounds the
    * pairwise comparison to block-local pairs:
    *
    *  - a `label` column, when present, is the natural key (the
    *    oracle-checked semantics — dedup within curated categories);
    *  - an UNLABELED corpus falls back to [[embedDedupApplyCells]]'s
    *    learned IVF-cell blocking — without it the whole corpus would be
    *    one block and the join a full cross product. */
  def embedDedupApply(emb: DataFrame, threshold: Double): DataFrame =
    if (emb.columns.contains("label")) {
      val e = emb.select(col("vec_id"), col("label"), col("embedding").as("v"))
        .withColumn("nrm", norm(col("v")))
      val drop = e.as("a").join(e.as("b"),
          col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
        .filter(round(dot(col("a.v"), col("b.v")) /
          (col("a.nrm") * col("b.nrm")), 4) >= threshold)
        .select(col("b.vec_id").as("vec_id")).distinct()
      emb.join(drop, Seq("vec_id"), "left_anti")
    } else embedDedupApplyCells(emb, threshold)

  /** Multi-probe IVF cell assignment of a (vec_id, embedding) corpus:
    * (vec_id, cell), one row per probed cell. The building block behind
    * [[embedDedupApplyCells]], exposed so blocking decisions are
    * inspectable (and spec-checkable) on their own. */
  def ivfCells(emb: DataFrame, nCells: Int = 16, nProbe: Int = 2,
      seed: Long = 42L, sampleSize: Int = 2000, lloydIters: Int = 5): DataFrame = {
    val centroids = trainQuantizer(emb, nCells, seed, sampleSize, lloydIters)
    emb.select(col("vec_id"),
      explode(probeCellsExpr(centroids, nProbe)(col("embedding"))).as("cell"))
  }

  /** [[embedDedupApply]] for corpora with no natural blocking key: block
    * by LEARNED IVF cells. Each vector joins its `nProbe` nearest
    * quantizer cells (multi-probe — a near-dup pair straddling one cell
    * boundary still shares a probe cell with high probability), and the
    * pairwise cosine check is an EQUI-join on the cell id — candidate
    * volume is bounded per cell, never the corpus cross product. The
    * quantizer trains on a bounded deterministic sample ([[trainQuantizer]]),
    * so results are reproducible at any parallelism. Approximate in the
    * same sense as every blocked near-dup detector: pairs sharing no
    * probe cell are not compared (recall measured in SimilaritySpec). */
  def embedDedupApplyCells(emb: DataFrame, threshold: Double,
      nCells: Int = 16, nProbe: Int = 2, seed: Long = 42L,
      sampleSize: Int = 2000, lloydIters: Int = 5): DataFrame = {
    val centroids = trainQuantizer(emb, nCells, seed, sampleSize, lloydIters)
    val e = emb.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", norm(col("v")))
      .withColumn("cell", explode(probeCellsExpr(centroids, nProbe)(col("v"))))
    val drop = e.as("a").join(e.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .filter(round(dot(col("a.v"), col("b.v")) /
        (col("a.nrm") * col("b.nrm")), 4) >= threshold)
      .select(col("b.vec_id").as("vec_id")).distinct()
    emb.join(drop, Seq("vec_id"), "left_anti")
  }

  /** Greedy maximal-marginal-relevance (MMR) selection: pick `k` vectors
    * that balance relevance to an anchor vector against redundancy with
    * what is already picked — the diverse-subset step an eval-set or
    * few-shot-pool builder runs after retrieval. Step t maximizes
    * `λ·rel(v) − (1−λ)·max_{s∈S} cos(v, s)` (ties → lower vec_id); the
    * first pick is pure argmax relevance.
    *
    * Scale shape: rel is ONE corpus scan (persisted projection of
    * (vec_id, v, nrm, rel)); each of the k−1 remaining steps is one more
    * scan with the selected set compiled into a `greatest(...)` of ≤ k
    * codegen'd dot products (selected vectors are k×dim driver state —
    * the same bounded-control-state budget as k-means centroids) and a
    * TakeOrdered(1). Nothing quadratic, nothing driver-side except the
    * k winners. `lambdaPct` is integer percent so both engines derive
    * the identical λ double. Determinism: dots are order-fixed folds,
    * cosines 4-dp rounded, the MMR combination itself left unrounded
    * (two scalar IEEE ops on identical inputs — re-rounding would only
    * add a cross-engine half-boundary to disagree on).
    *
    * Returns k rows (rk, vec_id, rel, mmr) in selection order. */
  def mmrSelect(corpus: DataFrame, anchorId: Long, k: Int,
      lambdaPct: Int = 70): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambdaPct >= 0 && lambdaPct <= 100,
      s"lambdaPct must be in [0,100], got $lambdaPct")
    val spark = corpus.sparkSession
    val lam = lambdaPct / 100.0
    val mu = (100 - lambdaPct) / 100.0
    val e = corpus.select(col("vec_id"), vec(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val q = e.filter(col("vec_id") === anchorId)
      .select(col("v"), col("nrm")).head()
    val (qv, qn) = (q.getSeq[Double](0), q.getDouble(1))
    val qvLit = array(qv.map(lit): _*)
    val scored = e.filter(col("vec_id") =!= anchorId)
      .withColumn("rel", round(dot(col("v"), qvLit) / (col("nrm") * lit(qn)), 4))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val picked = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Double, Double, Seq[Double], Double)]
    for (t <- 1 to k) {
      val cand =
        if (picked.isEmpty) scored
        else scored.filter(!col("vec_id").isin(picked.toSeq.map(_._2): _*))
      val withMmr =
        if (picked.isEmpty) cand.withColumn("mmr", col("rel"))
        else {
          val maxSim = picked.map { case (_, _, _, _, sv, sn) =>
            round(dot(col("v"), array(sv.map(lit): _*)) /
              (col("nrm") * lit(sn)), 4)
          }.reduce(greatest(_, _))
          cand.withColumn("mmr", lit(lam) * col("rel") - lit(mu) * maxSim)
        }
      val win = withMmr.orderBy(col("mmr").desc, col("vec_id"))
        .select(col("vec_id"), col("rel"), col("mmr"), col("v"), col("nrm"))
        .head()
      picked += ((t, win.getLong(0), win.getDouble(1), win.getDouble(2),
        win.getSeq[Double](3), win.getDouble(4)))
    }
    scored.unpersist()
    import spark.implicits._
    picked.toSeq.map { case (rk, id, rel, mmr, _, _) => (rk, id, rel, mmr) }
      .toDF("rk", "vec_id", "rel", "mmr")
  }

  /** Most-similar within-label pairs (embedding-cosine near-dup with label
    * blocking — the blocking key caps pair growth at scale). */
  def nearDupPairs(emb: DataFrame, topN: Int): DataFrame = {
    val e = emb.select(col("vec_id"), col("label"), col("embedding").as("v"))
      .withColumn("nrm", norm(col("v")))
    val pairs = e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        round(dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")), 4).as("cos"))
    pairs.orderBy(col("cos").desc, col("i"), col("j")).limit(topN)
  }
}
