package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sampling, TextAnalysis}

/** Bigram LM perplexity, vocabulary/Zipf coverage, and temperature
  * mixing — hand-computed goldens on tiny corpora plus the determinism
  * properties the oracles rely on. */
class LmVocabSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("trainBigramLm counts bigrams, contexts, vocab exactly") {
    val d = docs(1L -> "a b a b c", 2L -> "b c", 3L -> "a", 4L -> "   ")
    val lm = TextAnalysis.trainBigramLm(d, "text", "doc_id")
    val bg = lm.bigrams.as[(String, String, Long)].collect().toSet
    // doc1: (a,b) (b,a) (a,b) (b,c); doc2: (b,c); doc3/doc4: none
    assert(bg === Set(("a", "b", 2L), ("b", "a", 1L), ("b", "c", 2L)))
    val ctx = lm.contexts.as[(String, Long)].collect().toSet
    assert(ctx === Set(("a", 2L), ("b", 3L)))
    // vocab includes final tokens and the 1-token doc; whitespace doc drops
    assert(lm.vocab.as[String].collect().toSet === Set("a", "b", "c"))
  }

  test("perplexity matches hand-computed add-one-smoothed NLL") {
    val d = docs(1L -> "a b a b c", 2L -> "b c", 3L -> "a")
    val lm = TextAnalysis.trainBigramLm(d, "text", "doc_id")
    val out = TextAnalysis.perplexity(d, lm, "text", "doc_id")
      .select("doc_id", "n_bigrams", "avg_nll", "ppl")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    // V = 3; P(b|a) = (2+1)/(2+3) = 0.6; P(a|b) = (1+1)/(3+3) = 1/3;
    // P(c|b) = (2+1)/(3+3) = 0.5
    val lpAB = -math.log(0.6); val lpBA = -math.log(1.0 / 3.0)
    val lpBC = -math.log(0.5)
    val d1 = (lpAB + lpBA + lpAB + lpBC) / 4.0
    val d2 = lpBC
    assert(out.map(_._1).toSeq === Seq(1L, 2L)) // 1-token doc 3 emits no row
    assert(out(0)._2 === 4L)
    assert(math.abs(out(0)._3 - math.rint(d1 * 1e6) / 1e6) < 1e-9)
    assert(math.abs(out(1)._3 - math.rint(d2 * 1e6) / 1e6) < 1e-9)
    assert(math.abs(out(0)._4 - math.rint(math.exp(d1) * 1e4) / 1e4) < 1e-9)
  }

  test("perplexity scores unseen bigrams/contexts through the OOV path") {
    val train = docs(1L -> "a b a b c")
    val lm = TextAnalysis.trainBigramLm(train, "text", "doc_id")
    val out = TextAnalysis.perplexity(docs(9L -> "z q"), lm, "text", "doc_id")
      .select("doc_id", "avg_nll").as[(Long, Double)].collect()
    // V = 3; unseen context AND bigram: P = (0+1)/(0+3)
    assert(out.length === 1)
    assert(math.abs(out(0)._2 - math.rint(-math.log(1.0 / 3.0) * 1e6) / 1e6) < 1e-9)
  }

  test("perplexity doubles are partitioning-invariant (ordered fold)") {
    val base = (1L to 60L).map(i =>
      (i, (1 to (5 + (i % 17).toInt)).map(j => s"w${(i * j) % 23}").mkString(" ")))
    val d1 = docs(base: _*).repartition(1)
    val d13 = docs(base: _*).repartition(13, col("doc_id") % 7)
    val lm = TextAnalysis.trainBigramLm(d1, "text", "doc_id")
    val a = TextAnalysis.perplexity(d1, lm, "text", "doc_id")
      .select("doc_id", "avg_nll").as[(Long, Double)].collect().sortBy(_._1)
    val b = TextAnalysis.perplexity(d13, lm, "text", "doc_id")
      .select("doc_id", "avg_nll").as[(Long, Double)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq) // bit-identical, not just approximately equal
  }

  test("vocabulary ranks by count desc then token, with exact coverage") {
    val d = docs(1L -> "a b a b c", 2L -> "b c", 3L -> "a", 4L -> " ")
    // counts: a=3 b=3 c=2, total 8
    val out = TextAnalysis.vocabulary(d, "text")
      .select("token", "cnt", "rank", "cum_frac")
      .as[(String, Long, Int, Double)].collect().sortBy(_._3)
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ===
      Seq(("a", 3L, 1), ("b", 3L, 2), ("c", 2L, 3)))
    assert(out.map(_._4).toSeq === Seq(0.375, 0.75, 1.0))
  }

  test("vocabulary minCount truncates after ranking: prefix with full-corpus coverage") {
    val d = docs(1L -> "a a a b b c")
    val all = TextAnalysis.vocabulary(d, "text")
      .as[(String, Long, Int, Double)].collect().sortBy(_._3)
    val cut = TextAnalysis.vocabulary(d, "text", minCount = 2L)
      .as[(String, Long, Int, Double)].collect().sortBy(_._3)
    assert(cut.toSeq === all.take(2).toSeq) // same ranks, same cum_frac
    assert(cut.last._4 === math.rint(5.0 / 6.0 * 1e6) / 1e6)
  }

  test("temperatureMixRates: smallest source keeps maxRate; tau=1 is flat") {
    val d = (1L to 100L).map(i => (i, if (i <= 80) "big" else "small"))
      .toDF("doc_id", "source")
    val r = Sampling.temperatureMixRates(d, "source", tau = 0.5)
    assert(math.abs(r("small") - 1.0) < 1e-12)
    assert(math.abs(r("big") - math.pow(80.0 / 20.0, -0.5)) < 1e-12)
    val flat = Sampling.temperatureMixRates(d, "source", tau = 1.0, maxRate = 0.3)
    assert(flat.values.forall(v => math.abs(v - 0.3) < 1e-12))
  }

  test("temperatureMix is deterministic and respects per-source rates") {
    val d = (1L to 2000L).map(i => (i, if (i % 5 == 0) "small" else "big"))
      .toDF("doc_id", "source")
    val kept = Sampling.temperatureMix(d, "source", "doc_id", tau = 0.5)
      .as[(Long, String)].collect().toSet
    val kept2 = Sampling.temperatureMix(d.repartition(7), "source", "doc_id", tau = 0.5)
      .as[(Long, String)].collect().toSet
    assert(kept === kept2) // hash decisions, not RNG
    // smallest source rate = 1.0 → all small rows kept
    assert(kept.count(_._2 == "small") === 400)
    // big source keeps ≈ (1600/400)^-0.5 = 0.5 of its rows (hash-uniform)
    val bigKept = kept.count(_._2 == "big")
    assert(bigKept > 1600 * 0.4 && bigKept < 1600 * 0.6)
  }

  /** Scala reference for collocation lift with the operator's exact
    * parenthesization, so doubles compare bit-for-bit. */
  private def refCollocations(texts: Seq[String], minCount: Long)
      : Seq[(String, String, Long, Double)] = {
    val toks = texts.map(_.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty))
    val uni = toks.flatten.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val bi = toks.filter(_.size >= 2)
      .flatMap(t => t.sliding(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (g, gs) => g -> gs.size.toLong }
    val t = uni.values.sum.toDouble
    val p = bi.values.sum.toDouble
    bi.toSeq.filter(_._2 >= minCount).map { case ((a, b), cab) =>
      (a, b, cab, ((cab.toDouble * t) * t) / ((p * uni(a)) * uni(b)))
    }.sortBy { case (a, b, _, l) => (-l, a, b) }
  }

  test("collocations: lift matches the hand reference bit-for-bit") {
    val texts = Seq("new york is big", "new york times say", "big new day",
      "york is old", "new york new york", "the day is new")
    val out = TextAnalysis.collocations(texts.toDF("text"), "text",
        minCount = 2L, topN = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val want = refCollocations(texts, 2L).take(10)
    assert(out.toSeq === want)
    // "new york" (4 occurrences) must be the strongest frequent pair
    assert(out.head._1 === "new" && out.head._2 === "york")
  }

  test("collocations: minCount prunes, topN cuts deterministically, empty corpus is empty") {
    val texts = Seq("a b", "a b", "c d", "x y x y x y")
    val all = TextAnalysis.collocations(texts.toDF("text"), "text", 1L, 100)
      .collect()
    val cut = TextAnalysis.collocations(texts.toDF("text"), "text", 2L, 100)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(all.length > cut.size)
    assert(cut === Set(("a", "b"), ("x", "y"), ("y", "x")))
    val top1 = TextAnalysis.collocations(texts.toDF("text"), "text", 1L, 1).collect()
    assert(top1.length === 1)
    assert(TextAnalysis.collocations(Seq("   ").toDF("text"), "text").count() === 0L)
  }

  /** Brute-force windowed co-occurrence reference with the q102 lift
    * parenthesization. */
  private def refSkipgrams(texts: Seq[String], window: Int, minCount: Long)
      : Seq[(String, String, Long, Double)] = {
    val docs = texts.map(_.trim.toLowerCase.split("\\s+").toSeq)
    val uni = docs.flatten.filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val pairs = docs.flatMap { ts =>
      for {
        i <- ts.indices
        d <- 1 to window
        if i + d < ts.size
        if ts(i).nonEmpty && ts(i + d).nonEmpty
      } yield {
        val (a, b) = (ts(i), ts(i + d))
        if (a <= b) (a, b) else (b, a)
      }
    }
    val co = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = uni.values.sum.toDouble
    val p = pairs.size.toDouble
    co.toSeq.collect { case ((a, b), cab) if cab >= minCount =>
      (a, b, cab, ((cab.toDouble * t) * t) / ((p * uni(a)) * uni(b)))
    }.sortBy { case (a, b, _, l) => (-l, a, b) }
  }

  test("skipgramCollocations: window pairs match the brute-force reference") {
    val texts = Seq("neural deep network model", "neural network wins",
      "deep neural network", "a b c d e", "a c e b d")
    val out = TextAnalysis.skipgramCollocations(texts.toDF("text"), "text",
        window = 2, minCount = 2L, topN = 50)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === refSkipgrams(texts, 2, 2L).take(50))
    // "neural network" co-occurs 3x within window 2 (twice adjacent, once
    // skipping "deep") — adjacent-only q102 would count 2
    val nn = out.find(r => r._1 == "network" && r._2 == "neural")
    assert(nn.exists(_._3 === 3L))
  }

  test("skipgramCollocations: window 1 equals unordered adjacency; empty corpus empty") {
    val texts = Seq("x y x y", "y x", "solo")
    val got = TextAnalysis.skipgramCollocations(texts.toDF("text"), "text",
        window = 1, minCount = 1L, topN = 100)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === refSkipgrams(texts, 1, 1L).map(r => (r._1, r._2, r._3)))
    assert(TextAnalysis.skipgramCollocations(Seq("   ").toDF("text"), "text")
      .count() === 0L)
  }
}
