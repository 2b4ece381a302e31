package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def frame = (1 to 300).map { i =>
    val src = s"src${i % 3}"
    (src, i.toLong, ((i * 2654435761L) % 1013).toDouble)
  }.toDF("source", "id", "score")

  test("topFractionPerGroup keeps exactly ceil(frac*n_g) best rows per group") {
    val out = Sampling.topFractionPerGroup(frame, "source", "id", "score", 0.3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val byGroup = out.groupBy(_._1)
    assert(byGroup.keySet === Set("src0", "src1", "src2"))
    val want = frame.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).toSeq.flatMap { case (g, rows) =>
        val budget = math.ceil(rows.length * 0.3).toLong
        rows.sortBy(r => (-r._3, r._2)).take(budget.toInt)
          .zipWithIndex.map { case ((_, id, s), i) => (g, id, s, (i + 1).toLong) }
      }.toSet
    assert(out.toSet === want)
  }

  test("topFractionPerGroup ranks are contiguous from 1 within each group") {
    val out = Sampling.topFractionPerGroup(frame, "source", "id", "score", 0.2)
      .collect().map(r => (r.getString(0), r.getLong(3)))
    out.groupBy(_._1).foreach { case (g, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (1L to rs.length).toSeq, s"group $g")
    }
  }

  test("topFractionPerGroup kept set is invariant to partition count") {
    def run(p: Int) = Sampling.topFractionPerGroup(
        frame, "source", "id", "score", 0.25, partitions = p)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    val one = run(1)
    assert(run(3) === one)
    assert(run(17) === one)
  }

  test("topFractionPerGroup survives nondeterministic range boundaries") {
    val key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    val old = spark.conf.get(key, "100")
    spark.conf.set(key, "2")
    try {
      val big = (1 to 4000).map { i =>
        (s"s${i % 4}", i.toLong, ((i * 40503L) % 769).toDouble)
      }.toDF("source", "id", "score")
      def run(p: Int) = Sampling.topFractionPerGroup(
          big, "source", "id", "score", 0.4, partitions = p)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
      assert(run(13) === run(1))
    } finally spark.conf.set(key, old)
  }

  test("percentRankPerGroup: 0 for each group's best, 1 for its worst, id ties") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 5.0), ("a", 3L, 5.0), ("a", 4L, 1.0),
      ("b", 5L, 7.0), ("b", 6L, 3.0),
      ("c", 7L, 9.0)).toDF("source", "id", "score")
    val out = Sampling.percentRankPerGroup(df, "source", "id", "score")
      .collect().map(r => r.getLong(1) -> r.getDouble(4)).toMap
    assert(out(1L) === 0.0)
    assert(out(2L) === 1.0 / 3.0) // tie with id 3 broken by id asc
    assert(out(3L) === 2.0 / 3.0)
    assert(out(4L) === 1.0)
    assert(out(5L) === 0.0 && out(6L) === 1.0)
    assert(out(7L) === 0.0) // singleton group
  }

  test("globalRowNumber assigns exact 1..n positions under the sort order") {
    val df = (1 to 500).map(i => (i.toLong, ((i * 7919) % 503).toDouble))
      .toDF("id", "score")
    val out = Sampling.globalRowNumber(df, "pos", col("score").asc, col("id").asc)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(out.map(_._3).sorted.toSeq === (1L to 500L).toSeq)
    val want = out.sortBy(r => (r._2, r._1)).map(_._1)
    assert(out.sortBy(_._3).map(_._1).toSeq === want.toSeq)
  }

  test("deterministicShuffle: same seed reproduces, different seed permutes") {
    val df = (1 to 400).map(i => (i.toLong, s"doc$i")).toDF("id", "text")
    def run(seed: Long, parts: Int) = Sampling.deterministicShuffle(
        df.repartition(parts), "id", seed)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val a = run(42L, 4)
    assert(run(42L, 11) === a) // partition-invariant
    val b = run(43L, 4)
    assert(a !== b)
    assert(a.values.toSeq.sorted === (1L to 400L).toSeq)
    assert(b.values.toSeq.sorted === (1L to 400L).toSeq)
  }

  test("topFractionPerGroup frac edges: 0 keeps nothing, 1 keeps everything ranked") {
    val zero = Sampling.topFractionPerGroup(frame, "source", "id", "score", 0.0)
    assert(zero.count() === 0L)
    val all = Sampling.topFractionPerGroup(frame, "source", "id", "score", 1.0)
    assert(all.count() === 300L)
  }

  // the 60-bit md5-prefix hash, as Dedup.md5Hash60 computes it
  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  test("topKPerGroup keeps exactly min(k, n_g) best rows per group") {
    val out = Sampling.topKPerGroup(frame, "source", "id", "score", 30L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val want = frame.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).toSeq.flatMap { case (g, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(30)
          .zipWithIndex.map { case ((_, id, s), i) => (g, id, s, (i + 1).toLong) }
      }.toSet
    assert(out.toSet === want)
    // k beyond the group size keeps the whole group
    assert(Sampling.topKPerGroup(frame, "source", "id", "score", 1000L).count() === 300L)
  }

  test("sampleKPerGroup draws exactly k per group, reproducibly, hash-ranked") {
    val out = Sampling.sampleKPerGroup(frame, "source", "id", k = 10L, seed = 7L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = frame.collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).toSeq.flatMap { case (g, rows) =>
        rows.sortBy { case (_, id) => (h60(s"$id:7"), id) }.take(10)
          .zipWithIndex.map { case ((_, id), i) => (g, id, (i + 1).toLong) }
      }.toSet
    assert(out.toSet === want)
    assert(out.groupBy(_._1).values.forall(_.length === 10))
    // partition-invariant; different seed draws a different set
    val again = Sampling.sampleKPerGroup(
      frame.repartition(13), "source", "id", k = 10L, seed = 7L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(again === out.toSet)
    val other = Sampling.sampleKPerGroup(frame, "source", "id", k = 10L, seed = 8L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(other !== out.map(t => (t._1, t._2)).toSet)
  }

  test("prioritySampleK matches the brute-force priority ranking and estimator") {
    val df = (1 to 200).map(i => (i.toLong, (i % 17 + 1).toLong))
      .toDF("id", "ntok")
    val k = 25
    val out = Sampling.prioritySampleK(df, "id", "ntok", k, seed = 3L)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val pr = (1 to 200).map { i =>
      val w = (i % 17 + 1).toDouble
      val u = (h60(s"$i:3") + 1).toDouble / 1.152921504606846976e18
      (i.toLong, w, w / u)
    }.sortBy { case (id, _, p) => (-p, id) }
    val tau = pr(k)._3
    val want = pr.take(k).map { case (id, w, p) => (id, w, p, math.max(w, tau)) }.toSet
    assert(out.toSet === want)
    assert(out.length === k)
    // partition-invariant
    val again = Sampling.prioritySampleK(df.repartition(11), "id", "ntok", k, seed = 3L)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(again === out.toSet)
  }

  /** Reference weighted quantile: first row (score asc, id asc) whose
    * inclusive cumulative weight reaches q·W. */
  private def refWq(rows: Seq[(Long, Double, Long)], q: Double): (Double, Long) = {
    val sorted = rows.sortBy(r => (r._2, r._1))
    val total = rows.map(_._3).sum
    val t = q * total
    var cum = 0L
    for ((_, sc, w) <- sorted) {
      cum += w
      if (cum >= t && cum - w < t) return (sc, cum)
    }
    throw new IllegalStateException("no crossing")
  }

  test("weightedQuantiles picks the exact crossing row by cumulative weight") {
    val rows = (1 to 500).map(i =>
      (i.toLong, ((i * 7919) % 97).toDouble, (i % 13 + 1).toLong))
    val df = rows.toDF("id", "score", "w")
    val qs = Seq(0.01, 0.25, 0.5, 0.9, 1.0)
    val out = Sampling.weightedQuantiles(df, "id", "score", "w", qs)
      .collect().map(r => r.getDouble(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(out.keySet === qs.toSet)
    qs.foreach(q => assert(out(q) === refWq(rows, q), s"q=$q"))
    // zero-weight rows are never crossings; partition invariance
    val withZeros = rows ++ Seq((9001L, 3.0, 0L), (9002L, 50.0, 0L))
    val out2 = Sampling.weightedQuantiles(
      withZeros.toDF("id", "score", "w").repartition(13),
      "id", "score", "w", qs, partitions = 3)
      .collect().map(r => r.getDouble(0) -> (r.getDouble(1), r.getLong(2))).toMap
    qs.foreach(q => assert(out2(q) === refWq(rows, q), s"zeros q=$q"))
    // weighted median differs from the doc-count median when mass skews
    val skew = Seq((1L, 1.0, 1L), (2L, 2.0, 1L), (3L, 3.0, 100L))
    val m = Sampling.weightedQuantiles(skew.toDF("id", "score", "w"),
      "id", "score", "w", Seq(0.5)).collect()(0)
    assert(m.getDouble(1) === 3.0) // the heavy row carries the median
  }

  test("weightedQuantilesPerGroup matches the per-group reference; zero-weight group silent") {
    val rows = (1 to 400).map(i =>
      (s"g${i % 3}", i.toLong, ((i * 7919) % 83).toDouble, (i % 11 + 1).toLong)) ++
      Seq(("gz", 9001L, 1.0, 0L)) // zero-total group → no output rows
    val df = rows.toDF("g", "id", "score", "w")
    val qs = Seq(0.25, 0.5, 0.9, 1.0)
    val out = Sampling.weightedQuantilesPerGroup(df, "g", "id", "score", "w", qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(out.keySet === (for (g <- Seq("g0", "g1", "g2"); q <- qs) yield (g, q)).toSet)
    for (g <- Seq("g0", "g1", "g2"); q <- qs) {
      val grp = rows.filter(_._1 == g).map(r => (r._2, r._3, r._4))
      assert(out((g, q)) === refWq(grp, q), s"$g q=$q")
    }
    // partition-invariant
    val again = Sampling.weightedQuantilesPerGroup(
      df.repartition(13), "g", "id", "score", "w", qs, partitions = 3)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(again === out)
  }

  test("prioritySampleK: n <= k keeps everything with est_w = w; heavy row always wins") {
    val tiny = Seq((1L, 5L), (2L, 9L)).toDF("id", "w")
    val all = Sampling.prioritySampleK(tiny, "id", "w", k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(3)))
    assert(all.length === 2)
    all.foreach { case (_, w, est) => assert(est === w) }
    // a row whose weight dwarfs the rest is always sampled (w/u >= w)
    val skew = ((1 to 100).map(i => (i.toLong, 1L)) :+ (999L, 1000000000L))
      .toDF("id", "w")
    (0L to 4L).foreach { seed =>
      val ids = Sampling.prioritySampleK(skew, "id", "w", k = 5, seed = seed)
        .collect().map(_.getLong(0)).toSet
      assert(ids.contains(999L), s"seed $seed")
    }
  }

  // ── Lorenz / Gini ──────────────────────────────────────────────────────

  test("lorenzGini: uniform weights -> gini 0, linear curve") {
    val df = (1L to 10L).map(i => (i, 5L)).toDF("id", "w")
    val out = Sampling.lorenzGini(df, "id", "w")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(out.size === 10)
    (1 to 10).foreach { d =>
      assert(out(d)._1 === d.toLong)           // target rank = d of 10
      assert(out(d)._2 === d / 10.0)           // exact linear curve
      assert(out(d)._3 === 0.0)                // perfectly equal
    }
  }

  test("lorenzGini: all mass on one row -> gini 0.9, step curve") {
    val df = ((1L to 9L).map(i => (i, 0L)) :+ ((10L, 100L))).toDF("id", "w")
    val out = Sampling.lorenzGini(df, "id", "w")
      .collect().map(r => r.getInt(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    (1 to 9).foreach(d => assert(out(d)._1 === 0.0))
    assert(out(10)._1 === 1.0)
    assert(math.abs(out(10)._2 - 0.9) < 1e-12)
  }

  test("lorenzGini: partition-invariant") {
    val df = (1L to 97L).map(i => (i, (i % 13) + 1L)).toDF("id", "w")
    val a = Sampling.lorenzGini(df, "id", "w")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val b = Sampling.lorenzGini(df.repartition(11), "id", "w")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(a.toList === b.toList)
  }

  // ── quantile binning ───────────────────────────────────────────────────

  test("quantileBins: integer-exact bucket boundaries and edges") {
    val df = (1L to 10L).map(i => (i, i * 10.0)).toDF("id", "v")
    val out = Sampling.quantileBins(df, "id", "v", bins = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // ((rank-1)*3) div 10 -> sizes 4, 3, 3
    assert(out(0L) === ((4L, 10.0, 40.0)))
    assert(out(1L) === ((3L, 50.0, 70.0)))
    assert(out(2L) === ((3L, 80.0, 100.0)))
  }

  test("quantileBins: partition-invariant with heavy ties") {
    val df = (1L to 100L).map(i => (i, (i % 3).toDouble)).toDF("id", "v")
    val a = Sampling.quantileBins(df, "id", "v", bins = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val b = Sampling.quantileBins(df.repartition(13), "id", "v", bins = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(a.toList === b.toList)
    assert(a.map(_._2).sum === 100L)
    // equal-population: every bucket holds exactly 25
    assert(a.forall(_._2 === 25L))
  }

  // ── weighted draws ─────────────────────────────────────────────────────

  test("weightedDraws: k rows, crossing correctness, seed sensitivity") {
    val df = Seq((1L, 10L), (2L, 0L), (3L, 90L)).toDF("id", "w")
    val out = Sampling.weightedDraws(df, "id", "w", k = 50, seed = 42L)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(3)))
    assert(out.length === 50)                    // every draw resolves
    assert(out.forall(_._2 != 2L))               // zero weight never drawn
    // crossing correctness: u <= 0.1 -> id 1 (cum 10 of 100), else id 3
    assert(out.forall { case (_, id, u) =>
      if (u * 100.0 <= 10.0) id == 1L else id == 3L })
    // proportionality sanity on the 90/10 split
    val heavy = out.count(_._2 == 3L)
    assert(heavy > 30, s"90% mass drew only $heavy/50")
    // a different seed draws a different sequence
    val other = Sampling.weightedDraws(df, "id", "w", k = 50, seed = 43L)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(other.toSeq != out.map(t => (t._1, t._2)).toSeq)
  }

  test("weightedDraws: partition-invariant (pure function of seed and draw)") {
    val df = (1L to 100L).map(i => (i, i % 7 + 1L)).toDF("id", "w")
    val a = Sampling.weightedDraws(df, "id", "w", k = 10, seed = 5L)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toList
    val b = Sampling.weightedDraws(df.repartition(13), "id", "w", k = 10,
        seed = 5L)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toList
    assert(a === b)
  }

  // ── effective sample size ────────────────────────────────────────────

  test("effectiveSampleSize: equal weights -> ess = n, whale -> ess near 1") {
    val df = Seq.tabulate(10)(i => ("flat", i.toLong, 7L)) ++
      // one whale carries ~all the mass
      (("whale", 100L, 10000L) +: Seq.tabulate(9)(i => ("whale", 200L + i, 1L)))
    val out = Sampling.effectiveSampleSize(
        df.toDF("g", "id", "w").drop("id"), "g", "w")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    val (n, sw, sw2, ess, ratio) = out("flat")
    assert((n, sw, sw2) === ((10L, 70L, 490L)))
    assert(ess === 10.0 && ratio === 1.0)   // (70²)/490 exactly
    val (wn, _, _, wess, wratio) = out("whale")
    assert(wn === 10L && wess < 1.01 && wratio < 0.11,
      s"whale group should collapse to ~1 effective sample, got $wess")
  }

  test("effectiveSampleSize: all-zero weights -> NULL, not divide-by-zero") {
    val df = Seq(("z", 0L), ("z", 0L)).toDF("g", "w")
    val r = Sampling.effectiveSampleSize(df, "g", "w").first()
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  test("exactStratifiedSample: exactly k per stratum, short strata whole") {
    val df = ((1 to 10).map(i => ("a", i.toLong)) ++
      Seq(("b", 100L), ("b", 101L))).toDF("s", "id")
    val out = Sampling.exactStratifiedSample(df, "s", "id", 3L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byS = out.groupBy(_._1)
    assert(byS("a").length === 3 && byS("b").length === 2)
    assert(byS("a").map(_._3).sorted.toSeq === Seq(1L, 2L, 3L))
    assert(out.forall { case (_, id, _) => id <= 10L || id >= 100L })
    // deterministic permutation: same selection on rerun
    val again = Sampling.exactStratifiedSample(df, "s", "id", 3L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet === again.toSet)
  }

  test("matchDistribution: binding stratum keeps all, others downsample") {
    val df = ((1 to 100).map(i => (s"k$i", "a")) ++
      (101 to 150).map(i => (s"k$i", "b")) ++
      (151 to 160).map(i => (s"k$i", "junk"))).toDF("id", "s")
    val out = Sampling.matchDistribution(df, "s", "id",
      Map("a" -> 0.5, "b" -> 0.5))
    val kept = out.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // b is binding (50 vs target 75): rate 1.0 keeps all; a at rate 0.5
    assert(kept("b") === 50L)
    assert(kept("a") > 25L && kept("a") < 75L)
    // non-target stratum fully dropped
    assert(!kept.contains("junk"))
    // deterministic
    val again = Sampling.matchDistribution(df, "s", "id",
      Map("a" -> 0.5, "b" -> 0.5)).collect().map(_.getString(0)).sorted
    assert(again.toSeq === out.collect().map(_.getString(0)).sorted.toSeq)
    // absent target stratum fails loudly
    intercept[IllegalArgumentException] {
      Sampling.matchDistribution(df, "s", "id",
        Map("a" -> 0.5, "nope" -> 0.5))
    }
  }

  test("negativeSamples: k per query, exclusions honored, reproducible") {
    val corpus = (1L to 100L).map(Tuple1(_)).toDF("id")
    val positives = Seq((10L, 11L), (20L, 21L)).toDF("q", "p")
    val out = Sampling.negativeSamples(corpus, "id", positives, "q", "p",
      k = 5, overDraw = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet === Set(10L, 20L))
    for ((q, rows) <- byQ) {
      assert(rows.length === 5)
      assert(rows.map(_._4).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
      // never the query itself or its positive
      assert(!rows.exists(_._2 == q))
      assert(!rows.exists(r => r._2 == q + 1))
      // candidates are corpus members
      assert(rows.forall(r => r._2 >= 1L && r._2 <= 100L))
      // distinct negatives
      assert(rows.map(_._2).distinct.length === 5)
    }
    // bit-reproducible
    val again = Sampling.negativeSamples(corpus, "id", positives, "q", "p",
      k = 5, overDraw = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(out.toSet === again.toSet)
    // salt changes the draw
    val salted = Sampling.negativeSamples(corpus, "id", positives, "q", "p",
      k = 5, overDraw = 3, salt = "other").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted !== out.map(r => (r._1, r._2)).toSet)
  }

  test("weightedSamplePerGroup: hand replay, small-group exhaustive, partition-invariant") {
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val k = 2
    val seed = 3L
    // group a: 5 rows (τ from the 3rd priority); group b: 2 rows (exhaustive)
    val rows = Seq(
      ("a", 1L, 10.0), ("a", 2L, 1.0), ("a", 3L, 50.0), ("a", 4L, 5.0),
      ("a", 5L, 2.0), ("b", 6L, 7.0), ("b", 7L, 3.0)).toDF("g", "id", "w")
    def ref: Map[(String, Long), (Long, Double)] = {
      val pr = Seq(("a", 1L, 10.0), ("a", 2L, 1.0), ("a", 3L, 50.0),
        ("a", 4L, 5.0), ("a", 5L, 2.0), ("b", 6L, 7.0), ("b", 7L, 3.0))
        .map { case (g, id, w) =>
          val u = (h60(s"$id:$seed") + 1).toDouble / 1.152921504606846976e18
          (g, id, w, w / u)
        }
      pr.groupBy(_._1).flatMap { case (g, rs) =>
        val sorted = rs.sortBy(r => (-r._4, r._3))
        val tau = if (sorted.size > k) sorted(k)._4 else 0.0
        sorted.take(k).zipWithIndex.map { case ((_, id, w, _), i) =>
          (g, id) -> ((i + 1).toLong, math.max(w, tau))
        }
      }.toMap
    }
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.weightedSamplePerGroup(df, "g", "id", "w", k, seed)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(3), r.getDouble(4))).toMap
    val got = run(rows)
    assert(got === ref)
    // group b is exhaustive (2 rows, k=2): τ = 0, est_w = w
    assert(got(("b", 6L))._2 === 7.0 && got(("b", 7L))._2 === 3.0)
    assert(run(rows.repartition(5)) === got)
  }

  test("groupedSplitAssign: one fold per group, hashSplit-consistent, null to fold 0") {
    val rows = (1L to 200L).map(i => (s"g${i % 23}", i)).toDF("grp", "id")
    val out = Sampling.groupedSplitAssign(rows, "grp", Seq(0.8, 0.1, 0.1))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // leakage-free: every group maps to exactly one fold
    val perGroup = out.groupBy(_._1).view.mapValues(_.map(_._3).distinct).toMap
    assert(perGroup.values.forall(_.size === 1))
    // fold assignment agrees with the hashSplit filters on the group key
    val folds = Sampling.hashSplit(rows.select("grp").distinct(), "grp",
      Seq(0.8, 0.1, 0.1))
    val viaFilters = folds.zipWithIndex.flatMap { case (f, i) =>
      f.collect().map(_.getString(0) -> i)
    }.toMap
    assert(perGroup.map { case (g, fs) => g -> fs.head } === viaFilters)
    // null group key lands in fold 0 (the hashBucket null contract)
    val withNull = Seq((null: String, 1L)).toDF("grp", "id")
    assert(Sampling.groupedSplitAssign(withNull, "grp", Seq(0.5, 0.5))
      .first().getInt(2) === 0)
  }

  test("neymanAllocation: noisy strata get the budget, zero-variance strata get none") {
    // A: 4 rows of {0, 2, 0, 2} → σ² = 4/3; B: 4 identical rows → σ = 0;
    // C: single row → σ defined as 0 (no within-stratum evidence).
    // Neyman: all 100 samples go to A.
    val df = Seq(("A", 0.0), ("A", 2.0), ("A", 0.0), ("A", 2.0),
      ("B", 5.0), ("B", 5.0), ("B", 5.0), ("B", 5.0), ("C", 9.0))
      .toDF("src", "v")
    val out = Sampling.neymanAllocation(df, "src", "v", totalN = 100L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(4))).toMap
    assert(out("A")._1 === 4L)
    assert(math.abs(out("A")._2 - math.sqrt(4.0 / 3.0)) < 1e-9)
    assert(math.abs(out("A")._3 - 100.0) < 1e-9)
    assert(out("B")._2 === 0.0 && out("B")._3 === 0.0)
    assert(out("C")._2 === 0.0 && out("C")._3 === 0.0)
    // two noisy strata: allocation ∝ N_h·σ_h exactly
    val two = Seq(("A", 0.0), ("A", 2.0),                 // N=2, σ=√2
      ("B", 0.0), ("B", 2.0), ("B", 0.0), ("B", 2.0))     // N=4, σ=√(4/3)
      .toDF("src", "v")
    val t = Sampling.neymanAllocation(two, "src", "v", totalN = 90L)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    val (wa, wb) = (2.0 * math.sqrt(2.0), 4.0 * math.sqrt(4.0 / 3.0))
    assert(math.abs(t("A") - 90.0 * wa / (wa + wb)) < 1e-6)
    assert(math.abs(t("B") - 90.0 * wb / (wa + wb)) < 1e-6)
  }

  // ── postStratifiedMean ─────────────────────────────────────────────────

  test("postStratifiedMean: hand reweighting; SE from within-stratum vars") {
    // stratum a: values 1,3 (mean 2, var 2); stratum b: 10,14 (mean 12, var 8)
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 14.0))
      .toDF("h", "v")
    val r = Sampling.postStratifiedMean(df, "h", "v",
      Map("a" -> 0.75, "b" -> 0.25)).collect()(0)
    assert(r.getLong(0) === 4L && r.getLong(1) === 2L)
    assert(r.getLong(2) === 0L && r.getLong(3) === 0L)
    assert(math.abs(r.getDouble(4) - (0.75 * 2.0 + 0.25 * 12.0)) < 1e-9)
    val se = math.sqrt(0.75 * 0.75 * 2.0 / 2.0 + 0.25 * 0.25 * 8.0 / 2.0)
    assert(math.abs(r.getDouble(5) - se) < 1e-9)
  }

  test("postStratifiedMean: missing share → NULL; extras excluded; tiny → NULL se") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("x", 9.0)).toDF("h", "v")
    // share 'b' has no data → estimate undefined
    val m = Sampling.postStratifiedMean(df, "h", "v",
      Map("a" -> 0.5, "b" -> 0.5)).collect()(0)
    assert(m.getLong(2) === 1L && m.isNullAt(4) && m.isNullAt(5))
    assert(m.getLong(3) === 1L) // 'x' carried no weight
    // single-row stratum: mean real, se honestly NULL
    val tiny = Sampling.postStratifiedMean(
      Seq(("a", 2.0), ("b", 6.0), ("b", 6.0)).toDF("h", "v"), "h", "v",
      Map("a" -> 0.5, "b" -> 0.5)).collect()(0)
    assert(math.abs(tiny.getDouble(4) - (0.5 * 2.0 + 0.5 * 6.0)) < 1e-9)
    assert(tiny.isNullAt(5))
  }

  // ── chapmanEstimate ────────────────────────────────────────────────────

  test("chapmanEstimate: hand Chapman arithmetic; inputs deduped by id") {
    // A = {1..10} (with a duplicate row), B = {6..15} → m = 5
    val a = ((1 to 10).map(_.toLong) :+ 1L).toDF("user_id")
    val b = (6 to 15).map(_.toLong).toDF("user_id")
    val out = Sampling.chapmanEstimate(a, b, "user_id").collect()(0)
    assert(out.getLong(0) === 10L && out.getLong(1) === 10L &&
      out.getLong(2) === 5L)
    val nHat = ((11.0 * 11.0) / 6.0) - 1.0
    val v = ((11.0 * 11.0) * (5.0 * 5.0)) / ((6.0 * 6.0) * 7.0)
    assert(math.abs(out.getDouble(3) - nHat) < 1e-12)
    assert(math.abs(out.getDouble(4) - math.sqrt(v)) < 1e-12)
    assert(math.abs(out.getDouble(5) - (nHat - 1.96 * math.sqrt(v))) < 1e-9)
    assert(math.abs(out.getDouble(6) - (nHat + 1.96 * math.sqrt(v))) < 1e-9)
  }

  test("chapmanEstimate: disjoint captures stay finite (the +1 correction)") {
    val d = Sampling.chapmanEstimate(
      Seq(1L, 2L).toDF("user_id"), Seq(3L).toDF("user_id"), "user_id")
      .collect()(0)
    assert(d.getLong(2) === 0L)
    // N̂ = (3·2)/1 − 1 = 5; V = (3·2·2·1)/(1·2) = 6
    assert(math.abs(d.getDouble(3) - 5.0) < 1e-12)
    assert(math.abs(d.getDouble(4) - math.sqrt(6.0)) < 1e-12)
    assert(!d.getDouble(5).isNaN && !d.getDouble(6).isNaN)
  }
}
