package graft

import graft.operators.{Dedup, Importance, Sketches}
import org.apache.spark.sql.functions._

/** Round-8 curation extensions: Count-Min sketch, DSIR importance
  * weighting, and containment (overlap-coefficient) dedup. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // ── Count-Min sketch ───────────────────────────────────────────────────

  private val cmsDocs = Seq(
    (1L, "cat cat cat dog"),
    (2L, "cat dog mouse"),
    (3L, "cat mouse")).toDF("doc_id", "text")

  test("cms estimate never under-counts and is exact in a wide sketch") {
    val tf = Sketches.termCounts(cmsDocs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tf === Map("cat" -> 5L, "dog" -> 2L, "mouse" -> 2L))
    // width 4096 over 3 terms: collisions are (3 choose 2)·4/4096-unlikely,
    // and with depth 4 the MIN over rows is exact unless every row collides
    val est = Sketches.cmsHeavyHitters(cmsDocs, "text",
        depth = 4, width = 4096, minCount = 0L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    est.foreach { case (term, (cnt, e)) =>
      assert(cnt === tf(term)); assert(e === cnt, s"wide sketch inexact for $term")
    }
  }

  test("cms in a degenerate 1-cell sketch estimates the total for every term") {
    // width=1, depth=1: every term shares the one counter → est = Σ counts
    val out = Sketches.cmsHeavyHitters(cmsDocs, "text",
        depth = 1, width = 1, minCount = 0L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out.values.toSet === Set(9L))
    // …and est ≥ cnt holds by construction even here
  }

  test("cms unseen term estimates 0; heavy-hitter threshold filters") {
    val tf = Sketches.termCounts(cmsDocs, "text")
    val sketch = Sketches.cmsSketch(tf, "term", "cnt", depth = 4, width = 4096)
    val probe = Seq("cat", "zebra").toDF("term")
    val est = Sketches.cmsEstimate(sketch, probe, "term", depth = 4, width = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("cat") === 5L)
    assert(est("zebra") === 0L)
    val hh = Sketches.cmsHeavyHitters(cmsDocs, "text", 4, 4096, minCount = 3L)
      .collect().map(_.getString(0)).toSet
    assert(hh === Set("cat"))
  }

  // ── HyperLogLog ────────────────────────────────────────────────────────

  test("hll rho: leftmost-1 position over the field width") {
    val rows = Seq(0L, 1L, 2L, 1L << 51, (1L << 52) - 1).toDF("v")
      .select(Sketches.hllRho(col("v"), 52).as("rho"))
      .collect().map(_.getInt(0)).toList
    // v=0 → 53; v=1 → 52; v=2 → 51; top bit set → 1; all bits set → 1
    assert(rows === List(53, 52, 51, 1, 1))
  }

  test("hll registers merge by max: union == merge of halves") {
    val a = (1 to 500).map(i => ("g", s"val$i")).toDF("g", "v")
    val b = (300 to 900).map(i => ("g", s"val$i")).toDF("g", "v")
    val whole = Sketches.hllRegisters(a.union(b), Seq("g"), "v", 256)
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    val merged = Sketches.hllRegisters(a, Seq("g"), "v", 256)
      .union(Sketches.hllRegisters(b, Seq("g"), "v", 256))
      .groupBy("g", "bucket").agg(max("M").as("M"))
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    assert(whole === merged)
  }

  test("wide-register estimate is bit-identical to the row-form estimate") {
    import org.apache.spark.sql.DataFrame
    val m = 16
    // three groups with different fills: sparse (absent registers exercise
    // the small-range correction), medium, and saturated (rawE path)
    val df = ((1 to 5).map(i => ("sparse", s"a$i")) ++
      (1 to 40).map(i => ("mid", s"b$i")) ++
      (1 to 3000).map(i => ("full", s"c$i"))).toDF("g", "v")
    val rows = Sketches.hllRegisters(df, Seq("g"), "v", m)
    val estRow = Sketches.hllEstimateFromRegisters(rows, Seq("g"), m)
    // widen the same rows: one column per bucket, 0 = absent
    def widen(r: DataFrame): DataFrame =
      r.groupBy("g").pivot("bucket", (0 until m).map(_.toLong))
        .agg(first("M"))
        .select(col("g") +: (0 until m).map(j =>
          coalesce(col(s"$j"), lit(0)).as(s"__M$j")): _*)
    val estWide = Sketches.hllEstimateFromWideRegisters(
      widen(rows), Seq("g"), m, "__M")
    val joined = estRow.withColumnRenamed("est", "er")
      .join(estWide.withColumnRenamed("est", "ew"), Seq("g"), "full")
    // exact double equality — the fold-order argument, not a tolerance
    assert(joined.filter(col("er").isNull || col("ew").isNull ||
      col("er") =!= col("ew")).count() === 0L)
  }

  test("kmv: merge of shard bottom-ks == one-shot bottom-k, bit-exact") {
    val a = (1 to 4000).map(i => (i.toLong, (i % 97).toDouble)).toDF("id", "v")
    val b = (4001 to 9000).map(i => (i.toLong, (i % 89).toDouble)).toDF("id", "v")
    val k = 128
    val whole = Sketches.kmvSample(a.unionByName(b), "id", "v", k, seed = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val merged = Sketches.kmvMergeSamples(
        Seq(Sketches.kmvSample(a, "id", "v", k, seed = 5L),
          Sketches.kmvSample(b, "id", "v", k, seed = 5L)), "id", k)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(merged === whole)
    assert(whole.size === k)
    // overlapping shards (re-delivered rows) also merge clean
    val overlap = Sketches.kmvMergeSamples(
        Seq(Sketches.kmvSample(a, "id", "v", k, seed = 5L),
          Sketches.kmvSample(a.unionByName(b), "id", "v", k, seed = 5L)),
        "id", k)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(overlap === whole)
  }

  test("kmvSamplePerGroup: per-group bottom-k == per-group one-shot; estimates near-exact") {
    // two groups with different sizes and scales
    val df = ((1 to 3000).map(i => ("a", i.toLong, i.toDouble)) ++
      (1 to 1000).map(i => ("b", 100000L + i, 10.0 * i)))
      .toDF("g", "id", "v")
    val sample = Sketches.kmvSamplePerGroup(df, "g", "id", "v",
      k = 128, seed = 5L)
    // per group, the picked ids must equal the group's own global
    // bottom-k under the same (id, seed) hash
    for (g <- Seq("a", "b")) {
      val got = sample.filter(col("group") === g)
        .collect().map(_.getLong(1)).toSet
      val exp = Sketches.kmvSample(df.filter(col("g") === g)
          .select(col("id"), col("v")), "id", "v", 128, seed = 5L)
        .collect().map(_.getLong(0)).toSet
      assert(got === exp, s"group $g bottom-k mismatch")
    }
    // estimates land near the true per-group quantiles (1/sqrt(k) ranks)
    val est = Sketches.kmvQuantilesPerGroup(sample, Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(est("a") - 1500.0) < 300.0)
    assert(math.abs(est("b") - 5000.0) < 3000.0)
  }

  test("kmv quantile estimates: near-exact on uniform data; deterministic") {
    val df = (1 to 20000).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val sample = Sketches.kmvSample(df, "id", "v", k = 512, seed = 11L)
    val out = Sketches.kmvQuantiles(sample, "v", Seq(0.1, 0.5, 0.9))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // rank error ~ 1/sqrt(k) ≈ 4.4%; allow 3x
    for ((q, est) <- out)
      assert(math.abs(est / 20000.0 - q) < 0.14, s"q=$q est=$est")
    // pure function of (id, seed): re-run identical
    val again = Sketches.kmvQuantiles(
        Sketches.kmvSample(df.repartition(9), "id", "v", k = 512, seed = 11L),
        "v", Seq(0.1, 0.5, 0.9))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(again === out)
  }

  test("hll estimate: within 3 sigma at n=2000, small-range at n=10, dup-invariant") {
    val big = (1 to 2000).map(i => ("g", s"item$i")).toDF("g", "v")
    val est = Sketches.hllEstimate(big, Seq("g"), "v", 256)
      .collect()(0).getDouble(1)
    // m=256 → sigma ~= 1.04/sqrt(256) = 6.5%; 3 sigma = 19.5%
    assert(math.abs(est - 2000) / 2000 < 0.195, s"est $est too far from 2000")
    val small = (1 to 10).map(i => ("g", s"item$i")).toDF("g", "v")
    val estS = Sketches.hllEstimate(small, Seq("g"), "v", 256)
      .collect()(0).getDouble(1)
    // linear counting is register-granular at tiny n: one bucket collision
    // (expected ~n²/2m ≈ 0.2 here, realized 1 for this value set) moves
    // the estimate by ~1 — allow ±15%
    assert(math.abs(estS - 10) / 10 < 0.15, s"small-range est $estS too far from 10")
    // duplicates never move a register
    val dup = big.union(big).union(big)
    val estD = Sketches.hllEstimate(dup, Seq("g"), "v", 256)
      .collect()(0).getDouble(1)
    assert(estD === est)
  }

  test("hll estimate is bit-identical under repartitioning") {
    val df = (1 to 3000).map(i => (s"g${i % 5}", s"item$i")).toDF("g", "v")
    def run(p: Int) = Sketches.hllEstimate(df.repartition(p), Seq("g"), "v", 256)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(run(2) === run(13))
  }

  // ── DSIR importance weighting ──────────────────────────────────────────

  test("bigram features: n−1 bigrams, empty below 2 tokens") {
    val got = Seq("a b c d", "solo", "", "  x  y ").toDF("t")
      .select(Importance.bigramsCol(col("t")).as("b"))
      .collect().map(_.getSeq[String](0).toList)
    assert(got(0) === List("a b", "b c", "c d"))
    assert(got(1) === Nil)
    assert(got(2) === Nil)
    assert(got(3) === List("x y"))
  }

  test("importance weights match the closed form in the 1-bucket sketch") {
    // B=1: every feature lands in bucket 0, so t=T, r=R and
    // w = ln(T+α) − ln(T+α·1) − ln(R+α) + ln(R+α·1) = 0 exactly —
    // logw(doc) = cnt·0 = 0 for every doc with ≥1 bigram
    val raw = Seq((1L, "a b c"), (2L, "d e")).toDF("id", "text")
    val target = Seq(Tuple1("a b")).toDF("text")
    val out = Importance.importanceWeights(raw, target, "id", "text",
        buckets = 1, alpha = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet === Set(1L, 2L))
    out.values.foreach(v => assert(math.abs(v) < 1e-12))
  }

  test("importance weights pull target-like docs above off-target docs") {
    val raw = Seq(
      (1L, "cat purrs softly cat purrs softly"),
      (2L, "dog barks loudly dog barks loudly"),
      (3L, "cat purrs softly dog barks loudly")).toDF("id", "text")
    val target = Seq(Tuple1("cat purrs softly cat purrs")).toDF("text")
    val w = Importance.importanceWeights(raw, target, "id", "text",
        buckets = 1 << 13, alpha = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(1L) > w(3L) && w(3L) > w(2L),
      s"expected cat > mixed > dog, got $w")
  }

  test("fused feature vector ≡ hashing bigramsCol strings (both hash kinds, real data)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
      // add the edge shapes: 1-token, empty, and whitespace-only docs
      .unionByName(Seq((900001L, "solo"), (900002L, ""), (900003L, "  "))
        .toDF("doc_id", "text"))
    for (hk <- Seq("xxhash64", "md5_60")) {
      val fused = Importance.docBucketCounts(docs, "doc_id", "text", 512, hk)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val relational = docs
        .select(col("doc_id"), explode(Importance.bigramsCol(col("text"))).as("f"))
        .select(col("doc_id"),
          Importance.featureBucket(col("f"), 512, hk).as("bucket"))
        .groupBy("doc_id", "bucket").count()
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(fused === relational, s"hashKind $hk diverged")
    }
  }

  test("importance weights are invariant under repartitioning") {
    val raw = (1 to 300).map(i =>
      (i.toLong, s"alpha beta gamma t$i delta " * (i % 4 + 1))).toDF("id", "text")
    val target = raw.filter(col("id") % 5 === 0).select("text")
    def run(parts: Int) =
      Importance.importanceWeights(raw.repartition(parts), target, "id", "text",
          buckets = 64, alpha = 0.5)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val a = run(2); val b = run(7)
    assert(a.keySet === b.keySet)
    a.foreach { case (k, v) => assert(v === b(k), s"doc $k drifted") }
  }

  test("docs without bigrams are absent from the weight frame") {
    val raw = Seq((1L, "two tokens"), (2L, "one")).toDF("id", "text")
    val target = Seq(Tuple1("two tokens")).toDF("text")
    val ids = Importance.importanceWeights(raw, target, "id", "text",
      buckets = 16, alpha = 0.5).collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L))
  }

  // ── Corpus diff ────────────────────────────────────────────────────────

  test("corpusDiff statuses and per-source report with token drift") {
    import graft.operators.Diff
    val v1 = Seq(
      (1L, "a", "one two three"),
      (2L, "a", "keep me intact"),
      (3L, "b", "gone soon")).toDF("doc_id", "source", "text")
    val v2 = Seq(
      (1L, "a", "one two three four"), // changed: +1 token
      (2L, "a", "keep me intact"),     // unchanged
      (4L, "b", "fresh arrival")).toDF("doc_id", "source", "text") // added
    val rows = Diff.corpusDiff(v1, v2, "doc_id", "source", "text")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(rows === Map(1L -> "changed", 2L -> "unchanged",
      3L -> "removed", 4L -> "added"))
    val rep = Diff.corpusDiffReport(v1, v2, "doc_id", "source", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // a: 0 added, 0 removed, 1 changed, 1 unchanged, delta +1
    assert(rep("a") === (0L, 0L, 1L, 1L, 1L))
    // b: 1 added (+2 tok), 1 removed (−2 tok), delta 0
    assert(rep("b") === (1L, 1L, 0L, 0L, 0L))
  }

  // ── Logistic-regression training ───────────────────────────────────────

  test("trainLogistic: one GD round matches the closed form on a tiny corpus") {
    // two docs, two tokens each → one bigram each; B large → no collisions
    import graft.operators.Training
    val d = Seq(
      (1L, "good text", 1),
      (2L, "bad words", 0)).toDF("doc_id", "text", "label")
    val w = Training.trainLogistic(d, "doc_id", "text", "label",
        buckets = 1 << 16, rounds = 1, learningRate = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // round 1: all w=0 → z=0 → p=0.5 → r = 0.5−y = ∓0.5
    // per-bucket gradient: doc1's bigram bucket g = 1·(−0.5)/2 = −0.25 →
    // w = 0 − 0.5·(−0.25) = 0.125; doc2's bucket → −0.125;
    // bias: (−0.5 + 0.5)/2 = 0 → stays 0
    val nonBias = w.filterNot(_._1 == -1L).values.toList.sorted
    assert(nonBias === List(-0.125, 0.125))
    assert(w(-1L) === 0.0)
  }

  test("trainLogistic separates labels correlated with a marker token") {
    import graft.operators.Training
    val docs = (1 to 200).map { i =>
      val pos = i % 2 == 0
      val marker = if (pos) "excellent quality prose" else "spam junk garbage"
      (i.toLong, s"document number $i with $marker inside", if (pos) 1 else 0)
    }.toDF("doc_id", "text", "label")
    val w = Training.trainLogistic(docs, "doc_id", "text", "label",
      buckets = 4096, rounds = 10, learningRate = 1.0)
    val scores = Training.scoreLogistic(docs, "doc_id", "text", w, 4096)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pos = (2 to 200 by 2).map(i => scores(i.toLong))
    val neg = (1 to 199 by 2).map(i => scores(i.toLong))
    assert(pos.min > neg.max,
      s"positives ${pos.min} should outscore negatives ${neg.max}")
  }

  test("trainLogistic deterministic mode is bit-identical under repartitioning") {
    import graft.operators.Training
    val docs = (1 to 300).map(i =>
      (i.toLong, s"alpha beta t$i gamma delta " * (i % 3 + 1), i % 2)).toDF(
      "doc_id", "text", "label")
    def run(p: Int) = Training.trainLogistic(docs.repartition(p), "doc_id",
        "text", "label", buckets = 512, rounds = 3, deterministic = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val a = run(3); val b = run(11)
    assert(a.keySet === b.keySet)
    a.foreach { case (k, v) => assert(v === b(k), s"bucket $k drifted") }
  }

  test("trainLogistic plain-sum mode agrees with deterministic to 1e-9") {
    import graft.operators.Training
    val docs = (1 to 150).map(i =>
      (i.toLong, s"tok${i % 7} tok${i % 11} tok${i % 13}", i % 2)).toDF(
      "doc_id", "text", "label")
    val det = Training.trainLogistic(docs, "doc_id", "text", "label",
        buckets = 512, rounds = 3, deterministic = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fast = Training.trainLogistic(docs, "doc_id", "text", "label",
        buckets = 512, rounds = 3, deterministic = false)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(det.keySet === fast.keySet)
    det.foreach { case (k, v) => assert(math.abs(v - fast(k)) < 1e-9) }
  }

  // ── k-means training ───────────────────────────────────────────────────

  private def blob(ids: Range, base: Seq[Double], jitter: Double) =
    ids.map(i => (i.toLong, base.zipWithIndex.map { case (v, d) =>
      (v + jitter * ((i + d) % 3 - 1)).toFloat }))

  test("trainKMeans recovers separated blob means exactly after one round") {
    import graft.operators.Training
    // ids 0 and 1 land in different blobs → init centroids straddle them
    val a = blob(0 to 0, Seq(10.0, 0.0, 0.0), 0) ++ blob(2 to 20 by 2, Seq(10.0, 0.0, 0.0), 0.1)
    val b = blob(1 to 1, Seq(-10.0, 5.0, 0.0), 0) ++ blob(3 to 21 by 2, Seq(-10.0, 5.0, 0.0), 0.1)
    val df = (a ++ b).toDF("vec_id", "embedding")
    val out = Training.trainKMeans(df, "vec_id", "embedding", k = 2, rounds = 1,
        deterministic = true)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // cluster 0 = blob around (10,0,0): mean of dim 1 ≈ 10 within jitter
    assert(math.abs(out((0, 1)) - 10.0) < 0.2, s"got ${out((0, 1))}")
    assert(math.abs(out((1, 1)) + 10.0) < 0.2, s"got ${out((1, 1))}")
    assert(math.abs(out((1, 2)) - 5.0) < 0.2, s"got ${out((1, 2))}")
  }

  test("trainKMeans: empty cluster keeps its previous centroid") {
    import graft.operators.Training
    // three init centroids (ids 0,1,2) but all points sit on two blobs;
    // centroid 1 (id 1 at the far point) captures its blob, centroid 2's
    // init vector is strictly closer to centroid 0's for every point...
    val pts = Seq(
      (0L, Seq(0.0f, 0.0f)),
      (1L, Seq(100.0f, 0.0f)),
      (2L, Seq(0.1f, 0.0f)),   // init c2 very close to c0
      (3L, Seq(0.05f, 0.0f)), (4L, Seq(100.1f, 0.0f))).toDF("vec_id", "embedding")
    val out = Training.trainKMeans(pts, "vec_id", "embedding", k = 3, rounds = 2,
        deterministic = true)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // points 0.05/0.1 split between c0 and c2 by distance; the far blob
    // belongs to c1; no crash, 3×2 centroid rows
    assert(out.size === 6)
    // mean of 100.0f and 100.1f — float32 storage, so ±1e-4
    assert(math.abs(out((1, 1)) - 100.05) < 1e-4)
  }

  // ── top principal component ────────────────────────────────────────────

  test("topPrincipalComponent: recovers the dominant axis and eigenvalue exactly") {
    import graft.operators.Training
    // points on the line (t, 2t), t = -5..5: rank-1 covariance
    // C = [[11, 22], [22, 44]] -> eigenvector (1,2)/sqrt(5), lambda = 55
    val df = (-5 to 5).map(i => (i.toLong + 5L, Seq(i.toFloat, 2.0f * i)))
      .toDF("vec_id", "embedding")
    val out = Training.topPrincipalComponent(df, "vec_id", "embedding",
        rounds = 3, deterministic = true)
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(math.abs(out(1)._1 - 1.0 / math.sqrt(5.0)) < 1e-12)
    assert(math.abs(out(2)._1 - 2.0 / math.sqrt(5.0)) < 1e-12)
    assert(math.abs(out(1)._2 - 55.0) < 1e-9)
  }

  test("topPrincipalComponent: deterministic mode is partition-invariant and ≈ plain") {
    import graft.operators.Training
    val df = (1 to 100).map(i =>
      (i.toLong, Seq((i % 7).toFloat, (i % 3).toFloat, (i % 11).toFloat)))
      .toDF("vec_id", "embedding")
    def run(d: org.apache.spark.sql.DataFrame, det: Boolean) =
      Training.topPrincipalComponent(d, "vec_id", "embedding", rounds = 3,
          deterministic = det)
        .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val a = run(df, det = true)
    val b = run(df.repartition(7), det = true)
    assert(a === b, "deterministic PC must be bit-identical under repartitioning")
    val p = run(df, det = false)
    assert(a.forall { case (d, (v, l)) =>
      math.abs(v - p(d)._1) < 1e-9 && math.abs(l - p(d)._2) < 1e-9 })
  }

  test("trainKMeans deterministic mode is bit-identical under repartitioning and ≈ plain avg") {
    import graft.operators.Training
    val df = (1 to 200).map(i =>
      (i.toLong, Seq.tabulate(8)(d => ((i * 31 + d * 7) % 13 - 6).toFloat))).toDF(
      "vec_id", "embedding")
    def run(p: Int, det: Boolean) = Training.trainKMeans(df.repartition(p),
        "vec_id", "embedding", k = 3, rounds = 3, deterministic = det)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val d1 = run(2, det = true); val d2 = run(11, det = true)
    assert(d1 === d2)
    val plain = run(4, det = false)
    d1.foreach { case (k0, v) => assert(math.abs(v - plain(k0)) < 1e-9) }
  }

  // ── Containment (overlap-coefficient) dedup ────────────────────────────

  private val quoteDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight again"),
    (2L, "the quick brown fox jumps"),   // strict prefix of 1 → containment 1
    (3L, "completely different words entirely here now")).toDF("doc_id", "text")

  test("containment flags a verbatim quote its Jaccard would miss") {
    val out = Dedup.containmentPairs(quoteDocs, "doc_id", "text",
        shingleSize = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toList === List((2L, 1L, 1.0)), s"got ${out.toList}")
    // the same pair under Jaccard: 3 shared of 9∪3 → 1/3, below any
    // near-dup threshold — the case this operator exists for
    val j = Dedup.jaccardForPairs(quoteDocs,
        Seq((1L, 2L)).toDF("id_a", "id_b"), "doc_id", "text", shingleSize = 3)
      .collect()(0).getDouble(2)
    assert(math.abs(j - 3.0 / 9.0) < 1e-12)
  }

  test("containment respects the threshold and orients smaller-set first") {
    // doc 5 shares 2 of its 3 shingles with doc 4 → containment 2/3
    val docs = Seq(
      (4L, "a b c d e f"),
      (5L, "a b c d x")).toDF("doc_id", "text")
    val strict = Dedup.containmentPairs(docs, "doc_id", "text", 3, threshold = 0.9)
    assert(strict.count() === 0)
    val loose = Dedup.containmentPairs(docs, "doc_id", "text", 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(loose.toList === List((5L, 4L, 2.0 / 3.0)))
  }

  test("identical shingle sets orient by id; sub-shingle docs never pair") {
    val docs = Seq(
      (7L, "x y z w"),
      (6L, "x y z w"),      // same shingles as 7 → tie broken by id
      (8L, "too short")).toDF("doc_id", "text")  // < 3 tokens: no shingles
    val out = Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toList === List((6L, 7L, 1.0)))
  }

  // ── Corpus-level MinHash similarity ────────────────────────────────────

  test("sourceMinhashSimilarity: exact on identical/disjoint, close on overlap") {
    def doc(words: Seq[String]) = words.sliding(5).map(_.mkString(" ")).toSeq
    val vocabA = (1 to 120).map(i => s"wa$i")
    val vocabC = (1 to 120).map(i => s"wc$i")
    val mixed = vocabA.take(60) ++ vocabC.take(60)
    val rows =
      doc(vocabA).map(("s1", _)) ++ doc(vocabA).map(("s2", _)) ++ // identical
      doc(vocabC).map(("s3", _)) ++                               // disjoint
      doc(mixed).map(("s4", _))                                   // half-ish
    // both lane hashes (production xxhash64, oracle-replay md5_60) must
    // satisfy the sketch contract: exact on identical/disjoint vocabularies,
    // within the 64-lane error band on partial overlap
    for (kind <- Seq("xxhash64", "md5_60")) {
      val out = Dedup.sourceMinhashSimilarity(rows.toDF("source", "text"),
          "source", "text", shingleSize = 3, lanes = 64, hashKind = kind)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      assert(out(("s1", "s2")) === ((64L, 1.0)), kind)   // identical vocab
      assert(out(("s1", "s3"))._1 === 0L, kind)          // disjoint vocab
      // s1 vs s4 true shingle jaccard is roughly 1/3; the 64-lane estimate
      // must land within the sketch's error band
      val est = out(("s1", "s4"))._2
      assert(est > 0.05 && est < 0.6, s"kind=$kind est=$est")
    }
  }

  // ── Source keyness ─────────────────────────────────────────────────────

  test("sourceKeyness: hand-computed G2, overrepresented-only, rank order") {
    import graft.operators.Importance
    val df = Seq(("A", "x x y"), ("B", "y z")).toDF("source", "text")
    val out = Importance.sourceKeyness(df, "source", "text", topK = 5)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getLong(3)))
      .toMap
    // A: x -> a=2 cw=2 b=0 cc=3 N=5: G2 = 2*2*ln(2/1.2); y is UNDER its
    // expectation (1 < 1.2) and must be excluded
    assert(out.keySet === Set(("A", "x"), ("B", "y"), ("B", "z")))
    assert(math.abs(out(("A", "x"))._1 - 4.0 * math.log(2.0 / 1.2)) < 1e-12)
    // B: z (2*ln 2.5) outranks y (2*ln(1.25/1.2))
    assert(math.abs(out(("B", "z"))._1 - 2.0 * math.log(1.0 / 0.4)) < 1e-12)
    assert(out(("B", "z"))._2 === 1L && out(("B", "y"))._2 === 2L)
  }

  test("sourceKeyness: identical sources yield nothing (no term overrepresented)") {
    import graft.operators.Importance
    val df = Seq(("A", "x y z"), ("B", "x y z")).toDF("source", "text")
    assert(Importance.sourceKeyness(df, "source", "text").count() === 0L)
  }

  // ── Novelty scoring ────────────────────────────────────────────────────

  test("noveltyScore: exact overlap ratio against the reference shingle set") {
    val ref = Seq("the quick brown fox jumps").toDF("text")
    val docs = Seq(
      (1L, "the quick brown fox jumps"),      // all 3 shingles known → 0.0
      (2L, "the quick brown cat sleeps now"), // 1 of 4 known
      (3L, "entirely novel content here")).toDF("doc_id", "text")
    val out = Dedup.noveltyScore(docs, "doc_id", "text", ref, "text", 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(1L) === ((3L, 3L, 0.0)))
    assert(out(2L) === ((4L, 1L, 0.75)))
    assert(out(3L) === ((2L, 0L, 1.0))) // 4 tokens → two 3-shingles
  }

  // ── Rolling-window HLL ─────────────────────────────────────────────────

  test("hllRollingDistinct: each day's merged estimate equals the one-shot window sketch") {
    def ts(day: Int, i: Int) =
      new java.sql.Timestamp(1700000000000L + day * 86400000L + i * 1000L)
    // 12 days, varying distinct values per day, values recur across days
    val rows = for (d <- 0 until 12; i <- 0 until (20 + 13 * (d % 4)))
      yield (ts(d, i), s"user${(i * (d + 3)) % 150}")
    val df = rows.toDF("ts3", "v")
    val out = Sketches.hllRollingDistinct(df, "ts3", "v", m = 256, windowDays = 7)
      .collect().map(r => r.getDate(0).toString -> r.getDouble(1)).toMap
    assert(out.size === 12) // every event day reports
    // windowed one-shot sketch must match the merged registers BIT-FOR-BIT
    val byDay = rows.groupBy(t => new java.sql.Date(t._1.getTime).toString)
    val days = byDay.keys.toSeq.sorted
    for ((day, idx) <- days.zipWithIndex) {
      val windowDays = days.slice(math.max(0, idx - 6), idx + 1)
      val windowVals = windowDays.flatMap(byDay(_)).map(_._2)
      val oneShot = Sketches.hllEstimate(
          windowVals.toDF("v"), Seq.empty, "v", m = 256)
        .collect()(0).getDouble(0)
      assert(out(day) === oneShot, s"day $day")
      // sanity: estimate lands near the exact distinct count
      val exact = windowVals.distinct.size.toDouble
      assert(math.abs(out(day) - exact) / exact < 0.25, s"day $day accuracy")
    }
  }

  // ── Edit-distance pairs (PassJoin segment blocking) ────────────────────

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (j == 0) i else if (i == 0) j else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("editDistancePairs = brute force on an adversarial small-alphabet corpus") {
    // small alphabet + mixed lengths 0..8 → dense near-matches, empty and
    // sub-k strings, cross-length pairs: every blocking edge case at once
    val strs = (0 until 140).map { i =>
      val rnd = new scala.util.Random(i * 2654435761L)
      (i.toLong, (0 until rnd.nextInt(9)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    }
    val df = strs.toDF("id", "s")
    for (tau <- 1 to 3) {
      val got = Dedup.editDistancePairs(df, "id", "s", tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (for {
        (ia, sa) <- strs; (ib, sb) <- strs if ia < ib
        d = lev(sa, sb) if d <= tau
      } yield (ia, ib, d)).toSet
      assert(got === want, s"tau=$tau: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }

  test("editDistancePairs finds planted typos across length classes") {
    val df = Seq(
      (1L, "customer#000123"), (2L, "customer#000124"),  // substitution
      (3L, "customer#00123"),                             // deletion vs 1
      (4L, "blue widget"), (5L, "blue widgets"),          // insertion
      (6L, "entirely different")).toDF("id", "s")
    val got = Dedup.editDistancePairs(df, "id", "s", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === Set((1L, 2L, 1), (1L, 3L, 1), (4L, 5L, 1)))
  }

  // ── Source divergence (Jensen–Shannon) ─────────────────────────────────

  /** Scala reference with the operator's exact op order so doubles compare
    * bit-for-bit under the deterministic word-sorted fold. */
  private def refJs(corpora: Map[String, Seq[String]], alpha: Double)
      : Map[(String, String), Double] = {
    val counts = corpora.view.mapValues(
      _.flatMap(_.trim.toLowerCase.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap).toMap
    val vocab = counts.values.flatMap(_.keys).toSeq.distinct.sorted
    val av = alpha * vocab.size
    val srcs = corpora.keys.toSeq.sorted
    (for {
      i <- srcs.indices; j <- (i + 1) until srcs.size
      (sa, sb) = (srcs(i), srcs(j))
    } yield {
      val na = counts(sa).values.sum.toDouble
      val nb = counts(sb).values.sum.toDouble
      val js = vocab.foldLeft(0.0) { (acc, w) =>
        val p = (counts(sa).getOrElse(w, 0L) + alpha) / (na + av)
        val q = (counts(sb).getOrElse(w, 0L) + alpha) / (nb + av)
        val m = (p + q) / 2.0
        acc + (0.5 * (p * math.log(p / m)) + 0.5 * (q * math.log(q / m)))
      }
      (sa, sb) -> js
    }).toMap
  }

  test("sourceDivergence matches the hand reference bit-for-bit; identical sources = 0") {
    val corpora = Map(
      "s1" -> Seq("the cat sat", "the dog ran fast"),
      "s2" -> Seq("the cat sat", "the dog ran fast"),
      "s3" -> Seq("quantum flux entangles qubits", "flux gates entangle"))
    val df = corpora.toSeq.flatMap { case (s, ts) => ts.map(s -> _) }
      .toDF("source", "text")
    val got = Importance.sourceDivergence(df, "source", "text",
        deterministic = true)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val want = refJs(corpora, 0.5)
    assert(got.keySet === want.keySet)
    got.foreach { case (k, v) => assert(v === want(k), s"pair $k") }
    // identical distributions: every term is exactly 0
    assert(got(("s1", "s2")) === 0.0)
    // disjoint-vocab pair is large but below ln 2
    assert(got(("s1", "s3")) > 0.1 && got(("s1", "s3")) < math.log(2.0))
  }

  test("sourceDivergence: deterministic fold is partition-invariant, plain agrees 1e-12") {
    val rows = (1 to 300).map { i =>
      (s"src${i % 3}", s"tok${i % 17} tok${(i * 7) % 23} tok${(i * 11) % 29}")
    }
    def run(parts: Int, det: Boolean) = Importance.sourceDivergence(
        rows.toDF("source", "text").repartition(parts), "source", "text",
        deterministic = det)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val a = run(2, det = true)
    assert(run(13, det = true) === a)
    val plain = run(4, det = false)
    a.foreach { case (k, v) => assert(math.abs(v - plain(k)) < 1e-12, s"pair $k") }
  }

  test("clusteringQualityReport: separated blobs score near 1, hand distances, det ≈ prod") {
    import graft.operators.Training
    // two tight blobs; seeds (ids 1, 2) both sit in the left blob and the
    // rounds pull c1 to the right blob
    val df = Seq(
      (1L, Seq(0.0, 0.0)), (2L, Seq(0.2, 0.0)),
      (3L, Seq(10.0, 0.0)), (4L, Seq(10.2, 0.0)))
      .toDF("vec_id", "embedding")
    def run(det: Boolean) =
      Training.clusteringQualityReport(df, "vec_id", "embedding",
          k = 2, rounds = 3, deterministic = det)
        .collect().map(r => r.getInt(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val out = run(det = true)
    assert(out.keySet === Set(0, 1))
    assert(out.values.forall(_._1 === 2L))
    // converged centroids (0.1, 0) and (10.1, 0): every point is 0.1 away
    assert(out.values.forall(v => math.abs(v._2 - 0.1) < 1e-9))
    assert(out.values.forall(_._3 > 0.9))
    val prod = run(det = false)
    out.foreach { case (k, (n, d, s)) =>
      assert(prod(k)._1 === n)
      assert(math.abs(prod(k)._2 - d) < 1e-9 && math.abs(prod(k)._3 - s) < 1e-9)
    }
  }

  // ── Misra–Gries exact heavy hitters ────────────────────────────────────

  test("mgHeavyHitters == exact GROUP BY/HAVING under any partitioning") {
    // zipf-ish skew: item i appears ~ 600/i times
    val items = (1 to 30).flatMap(i => Seq.fill(600 / i)(s"w$i"))
    val df = items.toDF("item")
    def exact(k: Int): Map[String, Long] = {
      val n = items.size
      items.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
        .filter { case (_, c) => c * k > n }
    }
    for (parts <- Seq(1, 3, 13); k <- Seq(5, 20, 60)) {
      val got = Sketches.mgHeavyHitters(df.repartition(parts), "item", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === exact(k), s"parts=$parts k=$k")
    }
  }

  test("mgHeavyHitters: uniform data → empty; nulls dropped; counts exact") {
    val uniform = (1 to 100).map(i => s"u${i % 10}").toDF("item")
    assert(Sketches.mgHeavyHitters(uniform, "item", 5).count() === 0L)
    val withNulls = Seq("a", "a", "a", null, null, "b")
      .toDF("item")
    // n = 4 non-null; a (3) > 4/2 → only heavy hitter
    val got = Sketches.mgHeavyHitters(withNulls, "item", 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 3L))
  }

  // ── LSH recall audit ───────────────────────────────────────────────────

  test("lshRecallAudit: candidate bins == the production minhash path") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") < 40)
    val corpus = docs.unionByName(
      docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
    // corpus ≤ 48 docs < maxSample → the audit sees EVERY pair
    val out = Dedup.lshRecallAudit(corpus, "doc_id", "text",
        shingleSize = 3, bands = 16, rowsPerBand = 2,
        maxSample = 128, bins = 10)
      .orderBy("bin").collect()
    assert(out.length === 10)
    val n = corpus.count()
    assert(out.map(_.getLong(2)).sum === n * (n - 1) / 2) // all pairs binned
    out.foreach(r => assert(r.getLong(3) <= r.getLong(2))) // cand ⊆ pairs
    // theory column is exactly 1 − (1 − s²)¹⁶ at the bin midpoint
    out.foreach { r =>
      val s = (r.getLong(0) + 0.5) / 10.0
      assert(math.abs(r.getDouble(5) -
        (1.0 - math.pow(1.0 - s * s, 16))) < 1e-12)
    }
    // independent path: the production operator's verified pairs (tiny
    // threshold → every candidate pair with j > 0), binned the same way,
    // must reproduce the audit's candidate counts for bins ≥ 1
    val prod = Dedup.minhashNearDupPairs(corpus, "doc_id", "text",
        shingleSize = 3, bands = 16, rowsPerBand = 2, threshold = 1e-9)
      .collect().map(_.getDouble(2))
    val prodBins = prod.groupBy(j => math.min(math.floor(j * 10).toLong, 9L))
      .view.mapValues(_.length.toLong).toMap
    out.filter(_.getLong(0) >= 1L).foreach { r =>
      assert(r.getLong(3) === prodBins.getOrElse(r.getLong(0), 0L),
        s"bin ${r.getLong(0)}")
    }
    // planted exact dups land in the top bin and are ALWAYS candidates
    // (identical shingle sets → identical signatures → every band shared)
    assert(out.last.getLong(2) >= 8L)
    assert(!out.last.isNullAt(4) && out.last.getDouble(4) === 1.0)
    // deterministic: the md5-ranked sample makes reruns identical
    val again = Dedup.lshRecallAudit(corpus, "doc_id", "text",
        shingleSize = 3, bands = 16, rowsPerBand = 2,
        maxSample = 128, bins = 10).orderBy("bin").collect()
    assert(again.map(_.toSeq).toSeq === out.map(_.toSeq).toSeq)
  }

  test("lshRecallAudit: maxSample caps the quadratic surface") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val out = Dedup.lshRecallAudit(docs, "doc_id", "text",
        maxSample = 16, bins = 5).collect()
    assert(out.map(_.getLong(2)).sum === 16L * 15L / 2L)
    intercept[IllegalArgumentException](
      Dedup.lshRecallAudit(docs, "doc_id", "text", maxSample = 10000))
  }

  test("mgHeavyHitters: wide-cardinality near-uniform corpus finds nothing") {
    // 997 distinct values ≫ k counters/partition — the MG state stays
    // k-bounded and the exact recount correctly reports no heavy hitters
    val items = (1 to 5000).map(i => s"v${i % 997}").toDF("item")
      .repartition(7)
    assert(Sketches.mgHeavyHitters(items, "item", 11).count() === 0L)
  }

  // ── isotonicCalibration (PAV) ──────────────────────────────────────────

  test("isotonicCalibration: hand PAV golden pools the violating bins") {
    import graft.operators.Training
    // bins=4 on score*4: rates .25, 1.0, .5, 1.0 → PAV pools bins 1+2
    // into (2+1)/(2+2) = .75; bins 0 and 3 stand
    def rows(score: Double, pos: Int, neg: Int) =
      Seq.fill(pos)((score, true)) ++ Seq.fill(neg)((score, false))
    val df = (rows(0.1, 1, 3) ++ rows(0.3, 2, 0) ++
      rows(0.6, 1, 1) ++ rows(0.9, 2, 0)).toDF("score", "label")
    val out = Training.isotonicCalibration(df, "score", col("label"),
        bins = 4).orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq === Seq(
      (0L, 0.0, 4L, 1L, 0.25, 0.25),
      (1L, 0.25, 2L, 2L, 1.0, 0.75),
      (2L, 0.5, 2L, 1L, 0.5, 0.75),
      (3L, 0.75, 2L, 2L, 1.0, 1.0)))
  }

  test("isotonicCalibration invariants: monotone, mass-preserving, clamped") {
    import graft.operators.Training
    val df = (1 to 120).map { i =>
      // deliberately non-monotone label pattern + out-of-range scores
      val score = (i % 13).toDouble / 10.0 - 0.1 // in [-0.1, 1.1]
      (score, (i * 2654435761L) % 7 < (i % 13).toLong)
    }.toDF("score", "label")
    val out = Training.isotonicCalibration(df, "score", col("label"),
        bins = 8).orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getDouble(5)))
    // calibrated rates nondecreasing in bin
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._4 + 1e-12, s"monotonicity broke: $a then $b") }
    // PAV preserves total positive mass: Σ n·calibrated == Σ positives
    val mass = out.map(t => t._2.toDouble * t._4).sum
    assert(math.abs(mass - out.map(_._3).sum.toDouble) < 1e-9)
    // clamping: scores < 0 land in bin 0, > 1 in bin bins-1; all bins valid
    assert(out.forall(t => t._1 >= 0L && t._1 <= 7L))
    // row conservation: every input row is in exactly one bin
    assert(out.map(_._2).sum === 120L)
  }

  test("bradleyTerry: two-item fixed point matches the closed-form MLE") {
    import graft.operators.Training
    // A beats B 3×, B beats A 1× → MLE odds 3:1; with Σθ = 2 the MM
    // fixed point is θA = 1.5, θB = 0.5, reached exactly at round 1
    val duels = (Seq.fill(3)(("A", "B")) ++ Seq.fill(1)(("B", "A")))
      .toDF("w", "l")
    val out = Training.bradleyTerry(duels, "w", "l", rounds = 3,
        deterministic = true)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out("A")._1 === 3L && out("B")._1 === 1L)
    assert(math.abs(out("A")._2 - 1.5) < 1e-12)
    assert(math.abs(out("B")._2 - 0.5) < 1e-12)
    // implied win probability equals the empirical rate
    val p = out("A")._2 / (out("A")._2 + out("B")._2)
    assert(math.abs(p - 0.75) < 1e-12)
  }

  test("bradleyTerry: transitive duels rank correctly; self-matches dropped") {
    import graft.operators.Training
    val duels = (Seq.fill(2)(("A", "B")) ++ Seq.fill(2)(("B", "C")) ++
      Seq.fill(2)(("A", "C")) ++ Seq.fill(5)(("C", "C"))) // self-noise
      .toDF("w", "l")
    val out = Training.bradleyTerry(duels, "w", "l", rounds = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("A") > out("B") && out("B") > out("C"))
    // normalization: Σθ = n_items
    assert(math.abs(out.values.sum - 3.0) < 1e-9)
  }

  test("brierDecomposition: hand golden; Murphy identity holds in-output") {
    import graft.operators.Training
    // two bins (bins=2): bin0 = score 0.2 (3 rows, 1 pos),
    // bin1 = score 0.8 (2 rows, 2 pos)
    val df = Seq((0.2, true), (0.2, false), (0.2, false),
      (0.8, true), (0.8, true)).toDF("score", "label")
    val out = Training.brierDecomposition(df, "score", col("label"), bins = 2)
      .orderBy("bin").collect()
    assert(out.length === 2)
    val b0 = out(0); val b1 = out(1)
    assert(b0.getLong(1) === 3L && b0.getLong(2) === 1L)
    assert(math.abs(b0.getDouble(3) - 0.2) < 1e-9)         // conf
    assert(math.abs(b0.getDouble(4) - 1.0 / 3.0) < 1e-12)  // acc
    assert(b1.getLong(1) === 2L && b1.getLong(2) === 2L)
    assert(math.abs(b1.getDouble(3) - 0.8) < 1e-9)
    assert(b1.getDouble(4) === 1.0)
    // raw Brier = ((0.8)² + 2·(0.2)² + 2·(0.2)²) / 5 = (0.64+0.16)/5
    val brier = b0.getDouble(5)
    assert(math.abs(brier - (0.64 + 0.04 * 4) / 5.0) < 1e-9)
    // Murphy: brier == rel − res + unc + within_bin_var (identity column)
    val (rel, res, unc, wbv) = (b0.getDouble(6), b0.getDouble(7),
      b0.getDouble(8), b0.getDouble(9))
    assert(math.abs(brier - ((rel - res) + unc + wbv)) < 1e-12)
    val ybar = 3.0 / 5.0
    assert(math.abs(unc - ybar * (1.0 - ybar)) < 1e-12)
    // single score per bin → within-bin variance ~0
    assert(math.abs(wbv) < 1e-9)
  }

  test("brierDecomposition: constant perfect scorer → all components 0") {
    import graft.operators.Training
    val df = Seq((1.0, true), (1.0, true), (0.0, false))
      .toDF("score", "label")
    val r = Training.brierDecomposition(df, "score", col("label"), bins = 4)
      .collect()(0)
    assert(r.getDouble(5) === 0.0)                  // brier
    assert(math.abs(r.getDouble(6)) < 1e-12)        // reliability
    // resolution equals uncertainty for a perfect sharp scorer
    assert(math.abs(r.getDouble(7) - r.getDouble(8)) < 1e-12)
  }

  test("conformalInterval: rank-k order statistic + test coverage") {
    import graft.operators.Training
    // calibration residuals |actual−pred| = 1..10 (pred = 0)
    val cal = (1 to 10).map(i => (i.toLong, 0.0, i.toDouble))
      .toDF("id", "pred", "actual")
    // alpha=0.2 → k = ceil(11·0.8) = 9 → qhat = 9.0
    val test10 = (1 to 4).map(i => (100L + i, 0.0, i.toDouble * 3.0))
      .toDF("id", "pred", "actual") // residuals 3,6,9,12 → 3 covered
    val r = Training.conformalInterval(cal, test10, "id", "pred", "actual",
      alpha = 0.2).collect()(0)
    assert(r.getLong(0) === 10L && r.getLong(2) === 9L)
    assert(r.getDouble(3) === 9.0)
    assert(r.getLong(4) === 4L && r.getLong(5) === 3L)
    assert(math.abs(r.getDouble(6) - 0.75) < 1e-12)
    // alpha below 1/(n+1) saturates k at n → qhat = max residual
    val sat = Training.conformalInterval(cal, test10, "id", "pred", "actual",
      alpha = 0.01).collect()(0)
    assert(sat.getLong(2) === 10L && sat.getDouble(3) === 10.0)
  }

  test("conformalInterval: marginal coverage >= 1−α on an exchangeable split") {
    import graft.operators.Training
    // iid-ish residuals split deterministically; coverage must be near 0.9
    val all = (1 to 400).map { i =>
      (i.toLong, 0.0, ((i * 2654435761L) % 997).toDouble / 997.0)
    }.toDF("id", "pred", "actual")
    val cal = all.filter(col("id") % 2 === 0)
    val tst = all.filter(col("id") % 2 === 1)
    val r = Training.conformalInterval(cal, tst, "id", "pred", "actual",
      alpha = 0.1).collect()(0)
    assert(r.getDouble(6) >= 0.85,
      s"coverage ${r.getDouble(6)} below the conformal guarantee band")
  }

  test("isotonicCalibration: already-monotone rates pass through unpooled") {
    import graft.operators.Training
    def rows(score: Double, pos: Int, neg: Int) =
      Seq.fill(pos)((score, true)) ++ Seq.fill(neg)((score, false))
    val df = (rows(0.1, 0, 4) ++ rows(0.4, 1, 1) ++ rows(0.9, 3, 1))
      .toDF("score", "label")
    val out = Training.isotonicCalibration(df, "score", col("label"),
        bins = 4).orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getDouble(4), r.getDouble(5)))
    // empty bin 2 absent; raw == calibrated everywhere
    assert(out.map(_._1).toSeq === Seq(0L, 1L, 3L))
    out.foreach(t => assert(t._2 === t._3))
  }
}
