package graft

import graft.operators.{Similarity, VectorIndex}
import org.apache.spark.sql.functions._

class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private def mkVecs(ids: Seq[Long]): org.apache.spark.sql.DataFrame =
    ids.map { i =>
      // three well-separated directions + per-id jitter
      val base = (i % 3) match {
        case 0 => Array(1.0f, 0.0f, 0.0f, 0.0f)
        case 1 => Array(0.0f, 1.0f, 0.0f, 0.0f)
        case _ => Array(0.0f, 0.0f, 1.0f, 0.0f)
      }
      (i, base.zipWithIndex.map { case (v, d) =>
        v + 0.01f * ((i + d) % 7)
      }.toSeq)
    }.toDF("vec_id", "embedding")

  test("probe at nProbe = all cells equals brute force, across two incremental adds") {
    val dir = java.nio.file.Files.createTempDirectory("vecidx").toString
    val all = mkVecs(1L to 60L)
    val idx = new VectorIndex(spark, dir, numBuckets = 8)
    val first = all.filter(col("vec_id") <= 30L)
    idx.initialize(first, "vec_id", "embedding", numCentroids = 3)
    idx.add(first, "vec_id", "embedding")
    idx.add(all.filter(col("vec_id") > 30L), "vec_id", "embedding")
    val queries = all.filter(col("vec_id") <= 5L)
    val got = idx.probe(queries, "vec_id", "embedding", k = 4, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val ref = Similarity.bruteForceTopK(all, queries, "vec_id", "embedding",
        k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(3)) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet === ref.keySet)
    got.foreach { case (k, (n, c)) =>
      assert(ref(k)._1 === n, s"at $k")
      assert(math.abs(ref(k)._2 - c) < 1e-12, s"at $k")
    }
  }

  test("index persists: a NEW instance over the same dir probes identically") {
    val dir = java.nio.file.Files.createTempDirectory("vecidx").toString
    val all = mkVecs(1L to 40L)
    val idx = new VectorIndex(spark, dir, numBuckets = 8)
    idx.initialize(all, "vec_id", "embedding", numCentroids = 3)
    idx.add(all, "vec_id", "embedding")
    val q = all.filter(col("vec_id") === 7L)
    val a = idx.probe(q, "vec_id", "embedding", k = 3, nProbe = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    val reopened = new VectorIndex(spark, dir, numBuckets = 8)
    assert(reopened.isInitialized)
    val b = reopened.probe(q, "vec_id", "embedding", k = 3, nProbe = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    assert(a === b && a.nonEmpty)
  }

  test("nProbe = 1 returns a subset of the exact ranking (bounded recall, never wrong scores)") {
    val dir = java.nio.file.Files.createTempDirectory("vecidx").toString
    val all = mkVecs(1L to 60L)
    val idx = new VectorIndex(spark, dir, numBuckets = 8)
    idx.initialize(all, "vec_id", "embedding", numCentroids = 3)
    idx.add(all, "vec_id", "embedding")
    val q = all.filter(col("vec_id") <= 3L)
    val narrow = idx.probe(q, "vec_id", "embedding", k = 4, nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
      .toMap
    val exact = Similarity.bruteForceTopK(all, q, "vec_id", "embedding",
        k = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(narrow.nonEmpty)
    narrow.foreach { case (k, c) =>
      assert(exact.contains(k) && math.abs(exact(k) - c) < 1e-12, s"at $k")
    }
  }

  test("cellStats reports per-cell posting counts summing to the corpus") {
    val dir = java.nio.file.Files.createTempDirectory("vecidx").toString
    val all = mkVecs(1L to 50L)
    val idx = new VectorIndex(spark, dir, numBuckets = 8)
    idx.initialize(all, "vec_id", "embedding", numCentroids = 3)
    idx.add(all, "vec_id", "embedding")
    val stats = idx.cellStats().collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(stats.map(_._2).sum === 50L)
    assert(stats.map(_._1).distinct.length === stats.length)
  }
}
