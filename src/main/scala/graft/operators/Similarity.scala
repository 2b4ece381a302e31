package graft.operators

import graft.functions.VectorOps.{vector_dot, vector_norm}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * Scoring uses the native fused-loop `vector_dot` expression
  * (graft.functions.VectorDot — whole-stage codegen, no boxing), and every
  * pipeline precomputes per-row norms ONCE before the pair join, so each
  * candidate pair costs exactly one dot product. Three tiers:
  *  - `bruteForceTopK`: exact; broadcast the (small) query set against the
  *    corpus — the correctness baseline and the right plan whenever
  *    |queries| is small, at any corpus scale.
  *  - `lshTopK`: sign-random-projection buckets; corpus shuffles once by a
  *    compact bucket id; queries probe only their bucket.
  *  - `ivfTopK`: inverted-file index — k centroids (deterministic sample +
  *    one Lloyd refinement), corpus partitioned by nearest centroid,
  *    queries probe `nProbe` nearest centroids. The 100 TB path: scan cost
  *    drops by ~nProbe/k.
  */
object Similarity {

  /** dot(a, b) in double precision (native fused loop). */
  def dot(a: Column, b: Column): Column = vector_dot(a, b)

  def norm(a: Column): Column = vector_norm(a)

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random hyperplane matrix (planes × dim), built
    * once on the driver and shipped as a literal — each projection is then
    * one native dot product instead of per-element hashing. */
  def hyperplanes(planes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** `planes`-bit sign signature: packed sign bits of the hyperplane
    * projections. `dim` is the embedding width (planes × dim weight
    * literal; native vector_dot per plane). */
  def signSignature(vec: Column, planes: Int, dim: Int): Column = {
    val w = hyperplanes(planes, dim)
    val projections = (0 until planes).map { p =>
      vector_dot(vec, typedLit(w(p)))
    }
    projections.zipWithIndex.map { case (proj, p) =>
      when(proj >= 0, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)
  }

  /** Embedding width (reads one row). */
  def dimOf(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).first().getInt(0)

  /** (id, vec, norm) projection — norms computed once, before any join. */
  private def withNorm(df: DataFrame, idCol: String, vecCol: String,
      idAs: String, vecAs: String, normAs: String): DataFrame =
    df.select(col(idCol).as(idAs), col(vecCol).as(vecAs),
      vector_norm(col(vecCol)).as(normAs))

  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Exact top-k cosine neighbors for each query row.
    * `queries` must be small enough to broadcast (the common case: probe
    * set ≪ corpus). Excludes self-matches on id equality. */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = withNorm(queries, idCol, vecCol, "query_id", "__qv", "__qn")
    val c = withNorm(corpus, idCol, vecCol, "neighbor_id", "__cv", "__cn")
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (vector_dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn"))).as("cosine"))
    rankTopK(scored, k)
  }

  /** LSH-bucketed ANN: candidates from the query's sign bucket, then exact
    * rerank. `multiProbe` additionally probes every bucket at Hamming
    * distance 1 from the query's signature (planes extra buckets per
    * query) — the standard recall/compute knob: corpus cost is unchanged
    * (it is hashed once); only the broadcast probe set grows. */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      planes: Int = 12,
      multiProbe: Boolean = true): DataFrame = {
    val dim = dimOf(corpus, vecCol)
    val c = withNorm(corpus, idCol, vecCol, "neighbor_id", "__cv", "__cn")
      .withColumn("__bucket", signSignature(col("__cv"), planes, dim))
    val q0 = withNorm(queries, idCol, vecCol, "query_id", "__qv", "__qn")
      .withColumn("__sig", signSignature(col("__qv"), planes, dim))
    val q =
      if (!multiProbe) q0.withColumnRenamed("__sig", "__bucket")
      else q0.withColumn("__bucket",
          explode(array((col("__sig") +:
            (0 until planes).map(p => col("__sig").bitwiseXOR(lit(1L << p)))): _*)))
        .drop("__sig")
    val scored = c.join(broadcast(q), Seq("__bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (vector_dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn"))).as("cosine"))
      .distinct() // a pair can match via several probed buckets
    rankTopK(scored, k)
  }

  /** IVF index: deterministic centroid seeding + one Lloyd refinement
    * step, then corpus assignment. Returns (centroid_id, centroid) and the
    * assigned corpus.
    *
    * Seeding is FULLY deterministic and needs NO corpus count: the
    * `numCentroids` rows with the smallest `(seedHash(id), id)` — a
    * hash-order top-K is a uniform pseudo-random sample, and orderBy+limit
    * plans as TakeOrderedAndProject (K rows on the driver, never a global
    * sort). centroid_id = rank by id among the selected seeds. `seedHash`
    * defaults to xxhash64; pass Dedup.md5Hash60 when an external oracle
    * must reproduce the index.
    *
    * The corpus is touched by exactly 3 jobs: (1) the seed top-K scan,
    * (2) the refinement aggregate (seed-assignment is a shuffle-free
    * projection fused into the same scan), (3) the caller materializing
    * the returned final assignment. The vector dimension comes from the
    * collected seed vectors — no probe job — and the previous separate
    * count() pass is gone (PlanSpec asserts the job count). */
  def ivfIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      numCentroids: Int,
      seedHash: Column => Column = xxhash64(_)): (DataFrame, DataFrame) = {
    // top-K by hash order picks the sample (TakeOrderedAndProject — one
    // job, no global sort); the K survivors re-rank by id DRIVER-side so
    // centroid ids are stable without a second Spark sort job
    val picked = corpus
      .orderBy(seedHash(col(idCol)).asc, col(idCol).asc)
      .limit(numCentroids)
      .select(col(idCol), col(vecCol)).collect()
    require(picked.nonEmpty, "ivfIndex requires a non-empty corpus")
    val seedRows = picked.sortWith((a, b) =>
      a.get(0).asInstanceOf[Comparable[Any]].compareTo(b.get(0)) < 0)
    val seedCens: Seq[(Long, Seq[Float], Double)] = seedRows.toSeq.zipWithIndex.map {
      case (r, i) =>
        val vec = r.getSeq[Float](1)
        // identical to vector_norm: forward double accumulation of float²
        var acc = 0.0
        vec.foreach(f => acc += f.toDouble * f.toDouble)
        (i.toLong, vec, math.sqrt(acc))
    }
    // one refinement: assign to nearest seed, recompute means element-wise
    val assigned0 = assignSeq(corpus, seedCens, vecCol)
    val dim = seedCens.head._2.length
    // Centroids are driver-small by construction (numCentroids rows):
    // collect them ONCE and rebuild as a LocalRelation, so assign() and
    // callers like ivfTopK that collect them again hit a LocalTableScan —
    // no cached blocks pinned for the session (the previous .cache() here
    // leaked storage in long-lived multi-operator sessions), and the
    // seed→assign→groupBy chain runs exactly one job.
    val refinedDist = assigned0.groupBy("centroid_id")
      .agg(array((0 until dim).map(i =>
        avg(element_at(col(vecCol), i + 1).cast(DoubleType)).cast(FloatType)): _*)
        .as("centroid"))
    val spark = corpus.sparkSession
    val refined = spark.createDataFrame(
      java.util.Arrays.asList(refinedDist.collect(): _*), refinedDist.schema)
    (refined, assign(corpus, refined, idCol, vecCol))
  }

  /** Centroids materialized driver-side: (centroid_id, vector, norm),
    * sorted by centroid_id so argmin tie-breaking is deterministic
    * (lowest id wins, matching the old (distance, centroid_id) ordering). */
  private def collectCentroids(centroids: DataFrame): Seq[(Long, Seq[Float], Double)] =
    centroids.select(col("centroid_id").cast(LongType), col("centroid"),
        vector_norm(col("centroid")).as("__n"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getDouble(2)))
      .sortBy(_._1)
      .toSeq

  /** Literal array<struct<cid,cvec,cnorm>> shipped inside the plan. */
  private def centroidArrayLit(cens: Seq[(Long, Seq[Float], Double)]): Column =
    array(cens.map { case (id, vec, nrm) =>
      struct(lit(id).as("cid"), typedLit(vec).as("cvec"), lit(nrm).as("cnorm"))
    }: _*)

  /** Nearest-centroid assignment with NO shuffle: the centroid set is
    * driver-small by construction (numCentroids rows), so it ships as plan
    * literals and the argmax-cosine happens per row — no Exchange between
    * the corpus scan and the assignment. (The previous formulation
    * crossJoined corpus × centroids and took row_number() over a per-id
    * window, shuffling the corpus replicated ×numCentroids — fatal at
    * 100 TB.)
    *
    * For moderate centroid counts the argmax UNROLLS into one codegen'd
    * projection — k native vector_dot score columns (CSE'd), `greatest`,
    * and a first-match pick (ties → lowest centroid_id, matching the fold).
    * Beyond the unroll threshold it falls back to an `aggregate` fold over
    * a literal array, whose lambda is evaluated interpreted — correct at
    * any k but ~40% slower per row. */
  private val UnrollCentroids = 128

  private def assign(corpus: DataFrame, centroids: DataFrame, idCol: String, vecCol: String): DataFrame =
    assignSeq(corpus, collectCentroids(centroids), vecCol)

  private def assignSeq(corpus: DataFrame, cens: Seq[(Long, Seq[Float], Double)],
      vecCol: String): DataFrame = {
    val withVn = corpus.withColumn("__vn", vector_norm(col(vecCol)))
    // Zero-norm vectors make the cosine NaN (poisoning array_max / never
    // beating the fold accumulator) and NULL embeddings make it null
    // (null centroid_id, which NPEs the refinement's collect). Clamp both
    // to −Infinity: such rows assign deterministically to the first
    // centroid instead of disappearing, in BOTH argmax paths.
    def safeScore(s: Column): Column =
      coalesce(nanvl(s, lit(Double.NegativeInfinity)), lit(Double.NegativeInfinity))
    val assigned =
      if (cens.size == 1) withVn.withColumn("centroid_id", lit(cens.head._1))
      else if (cens.size <= UnrollCentroids) {
        // materialize the k scores as ONE array column first — every dot
        // evaluates exactly once per row; a when-chain over shared
        // subexpressions re-evaluates them per branch if codegen bails out
        val scores = cens.map { case (_, vec, nrm) =>
          safeScore(vector_dot(col(vecCol), typedLit(vec)) / (col("__vn") * lit(nrm)))
        }
        val cidArr = array(cens.map(c => lit(c._1)): _*)
        withVn.withColumn("__scores", array(scores: _*))
          // array_position returns the FIRST max's index → lowest
          // centroid_id wins ties, matching the fold's strict >
          .withColumn("centroid_id", element_at(cidArr,
            array_position(col("__scores"), array_max(col("__scores"))).cast("int")))
          .drop("__scores")
      } else {
        // seed the fold with the FIRST centroid's (cid, score) so an
        // all-−Inf row still gets a real assignment (never cid −1)
        val headScore = safeScore(
          vector_dot(col(vecCol), typedLit(cens.head._2)) / (col("__vn") * lit(cens.head._3)))
        val init = struct(lit(cens.head._1).as("cid"), headScore.as("score"))
        withVn.withColumn("__best", aggregate(centroidArrayLit(cens.tail), init, (acc, c) => {
          val score = safeScore(vector_dot(col(vecCol), c.getField("cvec")) /
            (col("__vn") * c.getField("cnorm")))
          // strict > : at equal score the earlier (lower-id) centroid wins
          when(score > acc.getField("score"),
            struct(c.getField("cid").as("cid"), score.as("score"))).otherwise(acc)
        })).withColumn("centroid_id", col("__best.cid")).drop("__best")
      }
    assigned.drop("__vn")
  }

  /** IVF ANN: probe the `nProbe` nearest centroids per query, exact rerank
    * inside the probed partitions. */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numCentroids: Int = 16,
      nProbe: Int = 2,
      seedHash: Column => Column = xxhash64(_)): DataFrame = {
    val (centroids, assigned) = ivfIndex(corpus, idCol, vecCol, numCentroids, seedHash)
    // nProbe nearest centroids per query — same literal-array trick as
    // assign(): score all centroids in one projection, array_sort by
    // (-cosine, centroid_id), slice the top nProbe, explode. No shuffle.
    val cens = collectCentroids(centroids)
    // nanvl: a zero-norm query or centroid sorts last instead of NaN
    // poisoning the struct sort
    val ranked = array_sort(transform(centroidArrayLit(cens), c =>
      struct(nanvl(-(vector_dot(col("__qv"), c.getField("cvec")) /
        (col("__qn") * c.getField("cnorm"))), lit(Double.PositiveInfinity)).as("negScore"),
        c.getField("cid").as("cid"))))
    val probes = withNorm(queries, idCol, vecCol, "query_id", "__qv", "__qn")
      .withColumn("centroid_id",
        explode(transform(slice(ranked, 1, nProbe), p => p.getField("cid"))))
      .select(col("query_id"), col("__qv"), col("__qn"), col("centroid_id"))
    val cand = assigned.select(col("centroid_id"), col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv"), vector_norm(col(vecCol)).as("__cn"))
    val scored = cand.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (vector_dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn"))).as("cosine"))
    rankTopK(scored, k)
  }
}
