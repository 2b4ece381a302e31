package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  test("trainBpeMerges learns the hand-computed merges on a toy corpus") {
    // corpus: "low" x5, "lower" x2, "newest" x6, "widest" x3  (Sennrich's
    // classic example family). Pair counts round 1:
    //   (l,o) 7, (o,w) 7, (w,e) 2+... compute: low:5 lo ow; lower:2 lo ow we er;
    //   newest:6 ne ew we es st; widest:3 wi id de es st
    //   (e,s) 9, (s,t) 9, (l,o) 7, (o,w) 7, (w,e) 8 ...
    // round 1 argmax: count 9 tie between (e,s) and (s,t) → (e,s) lex.
    val docs = (
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    ).map(Tuple1(_)).toDF("text")
    val merges = TextAnalysis.trainBpeMerges(docs, "text", numMerges = 3)
    assert(merges.head === ("e", "s"))
    // round 2: "es"+"t" appears in newest(6)+widest(3) = 9 — new argmax
    assert(merges(1) === ("es", "t"))
    // round 3: (l,o)=7, (o,w)=7, (w,est)=6, (n,e)=6... tie 7 → (l,o)
    assert(merges(2) === ("l", "o"))
  }

  test("driver and distributed paths learn identical merge tables") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text")
    val driver = TextAnalysis.trainBpeMerges(docs, "text", numMerges = 12)
    val dist = TextAnalysis.trainBpeMerges(docs, "text", numMerges = 12,
      maxDriverVocab = 0L) // force the distributed path
    assert(driver.size === 12)
    assert(driver === dist)
  }

  test("learned merges compose with bpeTokenCount: counts shrink monotonically") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").limit(200)
    def total(k: Int): Long = {
      val m = TextAnalysis.trainBpeMerges(docs, "text", numMerges = k)
      if (k > 0) assert(m.size === k)
      docs.select(sum(TextAnalysis.bpeTokenCount(col("text"),
        m).cast("long"))).collect()(0).getLong(0)
    }
    val t0 = total(0); val t4 = total(4); val t12 = total(12)
    assert(t0 > t4 && t4 > t12)
  }

  test("training stops early when no pair reaches minPairCount") {
    val docs = Seq("ab", "cd", "ef").map(Tuple1(_)).toDF("text")
    val merges = TextAnalysis.trainBpeMerges(docs, "text", numMerges = 10,
      minPairCount = 2)
    assert(merges.isEmpty)
    val single = Seq("a", "b").map(Tuple1(_)).toDF("text")
    assert(TextAnalysis.trainBpeMerges(single, "text", 5).isEmpty)
  }

  test("overlapping runs merge greedily left-to-right (matches application)") {
    val docs = Seq.fill(4)("aaa").map(Tuple1(_)).toDF("text")
    val merges = TextAnalysis.trainBpeMerges(docs, "text", numMerges = 2)
    // round 1: (a,a) count 8 (two positions x 4 words... word-freq table
    // collapses to one word "aaa" freq 4 → pair (a,a) at 2 positions = 8)
    assert(merges.head === ("a", "a"))
    // after merge: "aaa" → [aa, a]; round 2: (aa, a) count 4
    assert(merges(1) === ("aa", "a"))
  }
}
