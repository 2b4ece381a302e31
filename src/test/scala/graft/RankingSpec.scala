package graft

import graft.operators.Ranking
import org.apache.spark.sql.functions._

class RankingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat"),
    (3L, "a cat and a dog")).toDF("doc_id", "text")

  test("term frequencies count repeated tokens per doc") {
    val tf = Ranking.termFrequencies(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(tf((1L, "the")) === 2L)
    assert(tf((1L, "cat")) === 1L)
    assert(tf((3L, "a")) === 2L)
    assert(!tf.contains((2L, "cat")))
  }

  test("tfidf matches the smoothed sklearn formula by hand") {
    // N=3; df(the)=2 → idf = ln(4/3)+1; doc1 tf(the)=2
    val got = Ranking.tfidf(docs, "doc_id", "text")
      .filter(col("doc_id") === 1 && col("term") === "the")
      .collect()(0).getDouble(3)
    val want = 2.0 * (math.log(4.0 / 3.0) + 1.0)
    assert(math.abs(got - want) < 1e-12)
  }

  test("top keywords rank by tfidf desc then term asc, k rows max") {
    val top = Ranking.topKeywords(docs, "doc_id", "text", 2)
      .filter(col("doc_id") === 1).orderBy("rank").collect()
    assert(top.length === 2)
    // doc1: "the" tf=2·idf(ln(4/3)+1)≈2.575 beats every tf=1 term
    assert(top(0).getString(1) === "the")
    // remaining four terms (cat, mat, on, sat) tie: df-dependent idf —
    // cat df=2 < mat/on/sat df=1, so a df=1 term wins; tie on tfidf
    // breaks by term asc → "mat"
    assert(top(1).getString(1) === "mat")
  }

  test("bm25 matches a hand-computed score and only returns matching docs") {
    val out = Ranking.bm25(docs, "doc_id", "text", Seq("cat", "dog"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    // hand: N=3, avgdl=(6+3+5)/3=14/3; df(cat)=2, df(dog)=2 →
    // idf = ln(1 + (3-2+0.5)/(2+0.5)) = ln(1.6)
    val idf = math.log(1.6)
    def s(tf: Double, dl: Double) =
      idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / (14.0 / 3.0)))
    assert(math.abs(out(1L) - s(1, 6)) < 1e-12)          // cat only
    assert(math.abs(out(3L) - (s(1, 5) + s(1, 5))) < 1e-12) // cat + dog
  }

  test("bm25 per-doc sum is deterministic under repartitioning") {
    val base = (1 to 400).map(i =>
      (i.toLong, s"alpha beta gamma token$i " * (i % 5 + 1))).toDF("doc_id", "text")
    val q = Seq("alpha", "beta", "gamma")
    val a = Ranking.bm25(base, "doc_id", "text", q)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Ranking.bm25(base.repartition(17), "doc_id", "text", q)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a === b) // bit-identical, not approximately equal
  }

  test("rrfFuse sums reciprocal ranks, nulls contribute zero, id breaks ties") {
    val lex = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank_lex")
    val sem = Seq((20L, 1), (10L, 2), (40L, 3)).toDF("id", "rank_sem")
    val out = Ranking.rrfFuse(Seq(lex, sem), "id", k0 = 60, topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(3), r.getInt(4)))
    // 10 and 20 tie exactly (1/61 + 1/62 both ways) → id asc decides
    val s12 = 1.0 / 61 + 1.0 / 62
    assert(out(0) === ((10L, s12, 1)))
    assert(out(1) === ((20L, s12, 2)))
    // 30 and 40 appear in one list each: same 1/63 → id asc
    assert(out(2) === ((30L, 1.0 / 63, 3)))
    assert(out(3) === ((40L, 1.0 / 63, 4)))
  }

  test("hybridSearch fuses bm25 and cosine candidates") {
    val docs = Seq(
      (1L, "spark join optimizer"),
      (2L, "join join join"),
      (3L, "unrelated prose entirely")).toDF("doc_id", "text")
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(0.9f, 0.1f))).toDF("vec_id", "embedding")
    val out = Ranking.hybridSearch(docs, "doc_id", "text",
        emb, "vec_id", "embedding",
        queryTerms = Seq("join"), queryVec = Seq(1.0, 0.0),
        candidates = 3, k0 = 60, topK = 3)
      .collect().map(r => (r.getLong(0), r.getInt(4))).toList
    // lexical ranks: 2 (3×join) then 1; semantic ranks: 1 (cos 1) then 3
    // fused: doc1 = 1/62+1/61, doc2 = 1/61+0? no — doc2 has cos 0 → sem
    // rank 3 of 3 candidates; doc3 sem rank 2, no lex match
    // doc1: lex 2, sem 1 → 1/62 + 1/61 ≈ .03280
    // doc2: lex 1, sem 3 → 1/61 + 1/63 ≈ .03227
    // doc3: sem 2       → 1/62          ≈ .01613
    assert(out.map(_._1) === List(1L, 2L, 3L))
    assert(out.map(_._2) === List(1, 2, 3))
  }

  // ── MMR diverse selection ──────────────────────────────────────────────

  private def mmrFrame = Seq(
    // 1 and 2 are near-identical high-relevance vectors; 3 is orthogonal
    // with lower relevance; 4 is low-relevance near-aligned filler
    // (anti-aligned vectors would legitimately SCORE HIGH — the negative
    // max-sim penalty rewards them, canonical MMR behavior)
    (1L, Array(1.0f, 0.0f), 0.95),
    (2L, Array(0.999f, 0.001f), 0.94),
    (3L, Array(0.0f, 1.0f), 0.5),
    (4L, Array(0.9f, 0.4f), 0.1)).toDF("id", "vec", "rel")

  test("mmrSelect: skips the redundant near-duplicate of the top pick") {
    val out = Ranking.mmrSelect(mmrFrame, "id", "vec", "rel", k = 2,
        lambda = 0.5, candidates = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // rank 1 = id 1 (top relevance); rank 2 must be the ORTHOGONAL id 3
    // (score 0.25 - 0) over the near-dup id 2 (0.47 - 0.5*~1.0 < 0)
    assert(out.toList === List((1L, 1L), (2L, 3L)))
  }

  test("mmrSelect: lambda = 1 reduces to pure relevance ranking") {
    val out = Ranking.mmrSelect(mmrFrame, "id", "vec", "rel", k = 3,
        lambda = 1.0, candidates = 4)
      .collect().map(r => r.getLong(1))
    assert(out.toList === List(1L, 2L, 3L))
  }

  test("mmrSelect: exact score ties break to the smaller id") {
    val tied = Seq(
      (7L, Array(1.0f, 0.0f), 0.9),
      (3L, Array(0.0f, 1.0f), 0.9)).toDF("id", "vec", "rel")
    val out = Ranking.mmrSelect(tied, "id", "vec", "rel", k = 1,
        lambda = 1.0, candidates = 2)
      .collect().map(r => r.getLong(1))
    assert(out.toList === List(3L))
  }

  // ── ranking evaluation ─────────────────────────────────────────────────

  private def log2(x: Double) = math.log(x) / math.log(2.0)

  test("evalRanking: hand-computed recall and NDCG, zero-hit and perfect cases") {
    val ranked = Seq(
      // query 1: hits at ranks 1 and 3 of relevant {10, 11, 12}
      (1L, 10L, 1), (1L, 99L, 2), (1L, 11L, 3),
      // query 2: no hits
      (2L, 99L, 1), (2L, 98L, 2),
      // query 3: perfect two-element ranking of its full relevance set
      (3L, 20L, 1), (3L, 21L, 2)).toDF("query_id", "doc_id", "rank")
    val rel = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 50L),
      (3L, 20L), (3L, 21L)).toDF("query_id", "doc_id")
    val out = Ranking.evalRanking(ranked, rel, k = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val (n1, h1, r1, nd1) = out(1L)
    assert(n1 === 3L && h1 === 2L)
    assert(math.abs(r1 - 2.0 / 3.0) < 1e-15)
    val dcg1 = 1.0 / log2(2.0) + 1.0 / log2(4.0)
    val idcg1 = 1.0 / log2(2.0) + 1.0 / log2(3.0) + 1.0 / log2(4.0)
    assert(math.abs(nd1 - dcg1 / idcg1) < 1e-12)
    assert(out(2L) === ((1L, 0L, 0.0, 0.0)))
    val (_, _, r3, nd3) = out(3L)
    assert(r3 === 1.0)
    assert(math.abs(nd3 - 1.0) < 1e-12)  // ideal order of the full set
  }

  test("evalRanking: ranks beyond k are ignored") {
    val ranked = Seq((1L, 10L, 1), (1L, 11L, 4)).toDF("query_id", "doc_id", "rank")
    val rel = Seq((1L, 10L), (1L, 11L)).toDF("query_id", "doc_id")
    val out = Ranking.evalRanking(ranked, rel, k = 3).first()
    assert(out.getLong(2) === 1L)   // only the rank-1 hit counts at k=3
  }

  test("evalMrrMap: hand-computed RR and AP, zero-hit and late-hit cases") {
    val ranked = Seq(
      // query 1: hits at ranks 1 and 3 of relevant {10, 11, 12}
      (1L, 10L, 1), (1L, 99L, 2), (1L, 11L, 3),
      // query 2: no hits
      (2L, 99L, 1), (2L, 98L, 2),
      // query 3: first (and only) hit at rank 4
      (3L, 90L, 1), (3L, 91L, 2), (3L, 92L, 3), (3L, 20L, 4))
      .toDF("query_id", "doc_id", "rank")
    val rel = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 50L),
      (3L, 20L)).toDF("query_id", "doc_id")
    val out = Ranking.evalMrrMap(ranked, rel, k = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val (n1, h1, rr1, ap1) = out(1L)
    assert(n1 === 3L && h1 === 2L && rr1 === 1.0)
    assert(math.abs(ap1 - (1.0 / 1.0 + 2.0 / 3.0) / 3.0) < 1e-15)
    assert(out(2L) === ((1L, 0L, 0.0, 0.0)))
    val (_, _, rr3, ap3) = out(3L)
    assert(rr3 === 0.25)
    assert(math.abs(ap3 - (1.0 / 4.0) / 1.0) < 1e-15)
    // AP denominator clamps at k: n_rel > k never deflates a perfect run
    val perfect = Seq((9L, 1L, 1), (9L, 2L, 2)).toDF("query_id", "doc_id", "rank")
    val bigRel = (1L to 5L).map(d => (9L, d)).toDF("query_id", "doc_id")
    val p = Ranking.evalMrrMap(perfect, bigRel, k = 2).first()
    assert(math.abs(p.getDouble(4) - 1.0) < 1e-15)
  }

  /** Definition-form RBO_min: (1−p)·Σ_{d=1..k} p^{d−1}·|A_d ∩ B_d|/d. */
  private def refRbo(a: Seq[Long], b: Seq[Long], p: Double, k: Int): Double = {
    var s = 0.0
    var pw = 1.0
    for (d <- 1 to k) {
      val ov = a.take(d).toSet.intersect(b.take(d).toSet).size
      s += pw * ov / d
      pw *= p
    }
    (1.0 - p) * s
  }

  test("rankBiasedOverlap: identical lists hit 1−p^k, disjoint hit 0, hand case matches") {
    def ranked(ids: Seq[Long], name: String) =
      ids.zipWithIndex.map { case (id, i) => (id, i + 1) }.toDF("id", name)
    val k = 5
    val same = Ranking.rankBiasedOverlap(
      ranked(Seq(1L, 2L, 3L, 4L, 5L), "ra"), ranked(Seq(1L, 2L, 3L, 4L, 5L), "rb"),
      "id", "ra", "rb", p = 0.9, k = k).first()
    assert(same.getLong(0) === 5L)
    assert(math.abs(same.getDouble(1) - (1.0 - math.pow(0.9, k))) < 1e-12)
    val disj = Ranking.rankBiasedOverlap(
      ranked(Seq(1L, 2L, 3L), "ra"), ranked(Seq(7L, 8L, 9L), "rb"),
      "id", "ra", "rb", p = 0.9, k = 3).first()
    assert(disj.getLong(0) === 0L && disj.getDouble(1) === 0.0)
    val (la, lb) = (Seq(1L, 2L, 3L, 4L), Seq(3L, 1L, 9L, 2L))
    val hand = Ranking.rankBiasedOverlap(ranked(la, "ra"), ranked(lb, "rb"),
      "id", "ra", "rb", p = 0.8, k = 4).first()
    assert(math.abs(hand.getDouble(1) - refRbo(la, lb, 0.8, 4)) < 1e-12)
  }

  /** Hand tf-idf cosine over df-pruned unigram vectors (shingleSize=1
    * keeps the reference arithmetic readable). */
  private def refCosine(a: Map[String, Long], b: Map[String, Long],
      dfreq: Map[String, Long], n: Long, maxDf: Long): (Long, Double) = {
    def w(m: Map[String, Long]): Map[String, Double] = m.collect {
      case (t, tf) if dfreq(t) <= maxDf =>
        t -> tf.toDouble * math.log(n.toDouble / dfreq(t).toDouble)
    }
    val (wa, wb) = (w(a), w(b))
    def nrm(m: Map[String, Double]) =
      math.sqrt(m.toSeq.sortBy(_._1).foldLeft(0.0)((s, kv) => s + kv._2 * kv._2))
    val sharedTerms = wa.keySet.intersect(wb.keySet).toSeq.sorted
    val dot = sharedTerms.foldLeft(0.0)((s, t) => s + wa(t) * wb(t))
    (sharedTerms.size.toLong, dot / (nrm(wa) * nrm(wb)))
  }

  test("tfidfCosinePairs: hand reference on unigram vectors, df pruning") {
    // "common" appears in all 4 docs; maxDf=3 prunes it from every vector
    val d = Seq(
      (1L, "common alpha beta alpha"),
      (2L, "common alpha beta gamma"),
      (3L, "common delta epsilon"),
      (4L, "common zeta eta theta")).toDF("doc_id", "text")
    val counts = Map(
      1L -> Map("common" -> 1L, "alpha" -> 2L, "beta" -> 1L),
      2L -> Map("common" -> 1L, "alpha" -> 1L, "beta" -> 1L, "gamma" -> 1L),
      3L -> Map("common" -> 1L, "delta" -> 1L, "epsilon" -> 1L),
      4L -> Map("common" -> 1L, "zeta" -> 1L, "eta" -> 1L, "theta" -> 1L))
    val dfreq = counts.values.flatMap(_.keys).groupBy(identity)
      .map { case (t, g) => t -> g.size.toLong }
    val got = Ranking.tfidfCosinePairs(d, "doc_id", "text",
        shingleSize = 1, threshold = 0.01, maxDf = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // only (1,2) share a non-pruned term (alpha, beta)
    assert(got.keySet === Set((1L, 2L)))
    val (ns, cos) = refCosine(counts(1L), counts(2L), dfreq, 4L, 3L)
    assert(got((1L, 2L))._1 === ns)
    assert(math.abs(got((1L, 2L))._2 - cos) < 1e-12)
  }

  test("tfidfCosinePairs: deterministic fold is partition-invariant and ≈ production") {
    val d = (1L to 40L).map { i =>
      val shared = if (i % 2 == 0) "x y z w v" else "p q r s t"
      (i, s"$shared tok$i tok${i + 1} tok${i + 2} u${i % 5}")
    }.toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame, det: Boolean) =
      Ranking.tfidfCosinePairs(df, "doc_id", "text",
          shingleSize = 2, threshold = 0.05, maxDf = 30L, deterministic = det)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val a = run(d.repartition(1), det = true)
    val b = run(d.repartition(7), det = true)
    assert(a.nonEmpty && a === b)
    val prod = run(d, det = false)
    assert(prod.keySet === a.keySet)
    assert(a.forall { case (k, v) => math.abs(prod(k) - v) < 1e-9 })
  }
}
