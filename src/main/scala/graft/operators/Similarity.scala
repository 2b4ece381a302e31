package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * Three tiers, all pure `functions._` expressions (zip_with / aggregate
  * higher-order functions — codegen'd, no UDF):
  *  - `bruteForceTopK`: exact; broadcast the (small) query set against the
  *    corpus — the correctness baseline and the right plan whenever
  *    |queries| is small, at any corpus scale.
  *  - sign-random-projection LSH (`signBuckets`): corpus shuffles once by a
  *    compact bucket id; queries probe only their bucket.
  *  - `ivfTopK`: inverted-file index — k centroids (deterministic sample +
  *    one Lloyd refinement), corpus partitioned by nearest centroid,
  *    queries probe `nProbe` nearest centroid partitions. The 100 TB path:
  *    scan cost drops by ~nProbe/k.
  */
object Similarity {

  /** dot(a, b) in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** `planes`-bit sign signature under deterministic pseudo-random
    * hyperplanes: plane p's weight for dimension i is derived from
    * xxhash64(p, i) mapped into [-1, 1). Bucket = packed sign bits. */
  def signSignature(vec: Column, planes: Int): Column = {
    val projections = transform(sequence(lit(0), lit(planes - 1)), p => {
      // deterministic weight stream per (plane, dim)
      val weighted = zip_with(vec, sequence(lit(0), size(vec) - 1),
        (x, i) => x.cast(DoubleType) *
          (xxhash64(p * lit(1024) + i).cast(DoubleType) / lit(Long.MaxValue.toDouble)))
      aggregate(weighted, lit(0.0), (acc, x) => acc + x)
    })
    aggregate(
      zip_with(projections, sequence(lit(0), lit(planes - 1)),
        (proj, p) => when(proj >= 0, call_function("shiftleft", lit(1L), p.cast(IntegerType))).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
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
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** LSH-bucketed ANN: candidates only from the query's sign bucket, then
    * exact rerank. Recall is tunable via `planes` (fewer planes → bigger
    * buckets → higher recall, more compute). */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      planes: Int = 12): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      signSignature(col(vecCol), planes).as("__bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      signSignature(col(vecCol), planes).as("__bucket"))
    val scored = c.join(broadcast(q), Seq("__bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF index: deterministic centroid pick (every ⌈n/k⌉-th vector by id
    * order) + one Lloyd refinement step, then corpus assignment.
    * Returns (centroid_id, centroid) and the assigned corpus. */
  def ivfIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      numCentroids: Int): (DataFrame, DataFrame) = {
    val n = corpus.count()
    val stride = math.max(1L, n / numCentroids)
    val seeds = corpus
      .withColumn("__rn", row_number().over(Window.orderBy(col(idCol))))
      .filter((col("__rn") % stride) === 1).limit(numCentroids)
      .select(monotonically_increasing_id().as("centroid_id"), col(vecCol).as("centroid"))
    // one refinement: assign to nearest seed, recompute means element-wise
    val assigned0 = assign(corpus, seeds, idCol, vecCol)
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    val refined = assigned0.groupBy("centroid_id")
      .agg(array((0 until dim).map(i =>
        avg(element_at(col(vecCol), i + 1).cast(DoubleType)).cast(FloatType)): _*)
        .as("centroid"))
    (refined, assign(corpus, refined, idCol, vecCol))
  }

  private def assign(corpus: DataFrame, centroids: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val c = centroids.select(col("centroid_id"), col("centroid"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("__d"), col("centroid_id"))
    corpus.crossJoin(broadcast(c))
      .withColumn("__d", -dot(col(vecCol), col("centroid")) /
        (norm(col(vecCol)) * norm(col("centroid"))))
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .drop("__d", "__rn", "centroid")
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
      nProbe: Int = 2): DataFrame = {
    val (centroids, assigned) = ivfIndex(corpus, idCol, vecCol, numCentroids)
    val probeW = Window.partitionBy(col("query_id")).orderBy(col("__d"), col("centroid_id"))
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("__d", -cosine(col("__qv"), col("centroid")))
      .withColumn("__rn", row_number().over(probeW)).filter(col("__rn") <= nProbe)
      .select(col("query_id"), col("__qv"), col("centroid_id"))
    val cand = assigned.select(col("centroid_id"), col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = cand.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("__qv"), col("__cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
