package graft

import graft.operators.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature-hashed embeddings: hash/sign arithmetic, unit norm,
  * determinism, ANN-tier compatibility, and portable-variant parity with
  * an independent DataFrame recompute. */
class HashEmbedSpec extends SparkSpec {
  import spark.implicits._

  private def docs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")

  test("single-token doc puts its whole mass at (hash>>>1) % dim with the sign bit") {
    val out = Seq((1L, "hello")).toDF("doc_id", "text")
      .select(TextAnalysis.hashEmbedding($"text", 32).as("e"))
      .collect()(0).getSeq[Float](0)
    val h = spark.range(1).select(xxhash64(lit("hello"))).first().getLong(0)
    val idx = ((h >>> 1) % 32).toInt
    val sign = if ((h & 1L) == 1L) 1.0f else -1.0f
    assert(out(idx) === sign)
    assert(out.zipWithIndex.forall { case (v, i) => i == idx || v == 0.0f })
  }

  test("non-empty docs embed to unit vectors; empty text embeds to a unit vector too") {
    val norms = docs.select(
        aggregate(TextAnalysis.hashEmbedding($"text", 64),
          lit(0.0), (a, x) => a + x * x).as("ss"))
      .agg(min("ss"), max("ss")).first()
    assert(math.abs(norms.getDouble(0) - 1.0) < 1e-5)
    assert(math.abs(norms.getDouble(1) - 1.0) < 1e-5)
    // empty text tokenizes to [""] (Spark split semantics) — one hashed
    // token, so still a unit vector, never NaN
    val e = Seq((1L, "")).toDF("doc_id", "text")
      .select(TextAnalysis.hashEmbedding($"text", 16).as("e"))
      .collect()(0).getSeq[Float](0)
    assert(math.abs(e.map(v => v * v).sum - 1.0f) < 1e-5)
  }

  test("hashed embeddings feed the ANN tier: a planted copy is the rank-1 neighbor at cosine 1") {
    val base = docs.filter($"doc_id" < 40)
    val copies = base.select(($"doc_id" + 1000).as("doc_id"), $"text")
    val emb = base.unionByName(copies)
      .select($"doc_id".as("vec_id"),
        TextAnalysis.hashEmbedding($"text", 64).as("embedding"))
    val top = Similarity.knnJoin(emb, "vec_id", "embedding", k = 1, numCentroids = 2)
      .filter($"rank" === 1)
      .select("query_id", "neighbor_id", "cosine")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    (0L until 40L).foreach { id =>
      val (nbr, cos) = top(id + 1000)
      assert(nbr === id, s"copy ${id + 1000} missed its source")
      assert(cos > 0.999999, s"copy cosine $cos < 1")
    }
  }

  test("hashedLinearScore: zero weights give sigmoid(bias); single-token doc gives sigmoid(±w_idx + bias)") {
    val d = Seq((1L, "hello")).toDF("doc_id", "text")
    val zero = d.select(TextAnalysis.hashedLinearScore($"text",
      Seq.fill(32)(0.0), bias = 0.7).as("s")).first().getDouble(0)
    assert(math.abs(zero - 1.0 / (1.0 + math.exp(-0.7))) < 1e-12)
    // single token → unit mass ±1 at (h>>>1)%dim; score = σ(±w_idx + b)
    val h = spark.range(1).select(xxhash64(lit("hello"))).first().getLong(0)
    val idx = ((h >>> 1) % 32).toInt
    val sign = if ((h & 1L) == 1L) 1.0 else -1.0
    val w = (0 until 32).map(i => (i + 1) / 10.0)
    val got = d.select(TextAnalysis.hashedLinearScore($"text", w, bias = 0.25)
      .as("s")).first().getDouble(0)
    val want = 1.0 / (1.0 + math.exp(-(sign * w(idx) + 0.25)))
    assert(math.abs(got - want) < 1e-12)
  }

  test("hashedLinearScore is a shuffle-free single-stage plan") {
    val plan = docs.select(TextAnalysis.hashedLinearScore($"text",
      (0 until 16).map(_ * 0.1), bias = 0.0).as("s"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"classifier scoring should not shuffle:\n$plan")
  }

  test("portable variant equals an independent md5Hash60 DataFrame recompute") {
    val d = docs.filter($"doc_id" < 50)
    val dim = 64
    val got = d.select($"doc_id",
        posexplode(TextAnalysis.hashEmbedding($"text", dim, portable = true)))
      .select($"doc_id", $"pos", $"col".cast("double").as("v"))
    // independent path: explode tokens, md5Hash60 each, signed-count per
    // dimension, normalize — all in DataFrame arithmetic
    val h = d.select($"doc_id",
        explode(Dedup.tokensCol($"text")).as("tok"))
      .select($"doc_id", Dedup.md5Hash60($"tok").as("h"))
      .select($"doc_id", (shiftrightunsigned($"h", 1) % dim).cast("int").as("idx"),
        when($"h" % 2 === 1, 1L).otherwise(-1L).as("s"))
      .groupBy("doc_id", "idx").agg(sum("s").as("v"))
    val dims = d.select("doc_id").distinct()
      .crossJoin(spark.range(dim).select($"id".cast("int").as("idx")))
    val full = dims.join(h, Seq("doc_id", "idx"), "left")
      .select($"doc_id", $"idx", coalesce($"v", lit(0L)).cast("double").as("v"))
    val norms = full.groupBy("doc_id").agg(sqrt(sum($"v" * $"v")).as("norm"))
    val want = full.join(norms, "doc_id")
      .select($"doc_id", $"idx".as("pos"),
        ($"v" / $"norm").cast("float").cast("double").as("v"))
    val diff = got.join(want, Seq("doc_id", "pos"))
      .filter(abs(got("v") - want("v")) > 1e-12)
    assert(diff.isEmpty, s"mismatching components: ${diff.count()}")
    assert(got.count() === 50L * dim)
  }
}
