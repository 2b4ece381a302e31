package graft

import graft.operators.{Dedup, SpanIndex, TextAnalysis}
import org.apache.spark.sql.functions._

/** Persistent winnowing span index: probe ≡ the batch winnowing ground
  * truth, quote detection against history, the redelivery self-match,
  * the boilerplate postings cap, and the quote-gated ingest contract. */
class SpanIndexSpec extends SparkSpec {
  import spark.implicits._

  private def words(prefix: String, n: Int, from: Int = 0): String =
    (from until from + n).map(i => s"$prefix$i").mkString(" ")

  // history: two long distinct docs; the quote doc embeds a 20-token run
  // of doc 1 inside otherwise-novel text (k=5, window=4 → a shared run of
  // ≥ 8 tokens must yield at least one shared fingerprint; 20 yields many)
  private val hist = Seq(
    1L -> words("alpha", 60),
    3L -> words("beta", 60)).toDF("doc_id", "text")
  private val quote = words("pre", 15) + " " + words("alpha", 20, 20) + " " +
    words("post", 15)
  private val novelDoc = words("gamma", 40)

  private def fpSet(text: String, k: Int = 5, w: Int = 4): Set[Long] =
    Seq(0L -> text).toDF("doc_id", "text")
      .select(TextAnalysis.winnowedHashes(
        Dedup.tokensCol(col("text")), k, w, "xxhash64").as("f"))
      .as[Seq[Long]].collect().head.toSet

  test("probe finds the quoting doc with the exact shared-fp count") {
    val idx = new SpanIndex(spark, tmpDir("spanix_"), minShared = 3)
    idx.add(hist, "doc_id", "text")
    val out = idx.probe(
      Seq(10L -> quote, 11L -> novelDoc).toDF("doc_id", "text"),
      "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val expShared = (fpSet(quote) intersect fpSet(words("alpha", 60))).size
    assert(expShared >= 3, s"test corpus must share >= 3 fps, got $expShared")
    assert(out === Seq((10L, 1L, expShared.toLong,
      math.rint(expShared.toDouble / fpSet(quote).size * 1e6) / 1e6)))
  }

  test("probe on an empty index returns no rows; short docs never match") {
    val idx = new SpanIndex(spark, tmpDir("spanix_"))
    assert(idx.probe(hist, "doc_id", "text").count() === 0L)
    idx.add(hist, "doc_id", "text")
    // a 6-token quote (< k + window - 1 + enough for minShared) stays below
    // the minShared gate — the documented bounded-recall trade
    val tiny = Seq(20L -> words("alpha", 6, 30)).toDF("doc_id", "text")
    assert(idx.probe(tiny, "doc_id", "text").count() === 0L)
  }

  test("redelivered doc self-matches at containment 1.0") {
    val idx = new SpanIndex(spark, tmpDir("spanix_"), minShared = 3)
    idx.add(hist, "doc_id", "text")
    val again = idx.probe(hist.filter(col("doc_id") === 1L), "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(again.map(r => (r._1, r._2, r._4)) === Seq((1L, 1L, 1.0)))
  }

  test("boilerplate fingerprints beyond maxPostings are dropped") {
    // the same 12-token boilerplate in 6 history docs; cap at 5 postings
    val boiler = words("same", 12)
    val h = (1L to 6L).map(i => (i, boiler + " " + words(s"own$i", 30)))
      .toDF("doc_id", "text")
    val idx = new SpanIndex(spark, tmpDir("spanix_"), minShared = 1,
      maxPostings = 5)
    idx.add(h, "doc_id", "text")
    val probeDoc = Seq(99L -> (boiler + " " + words("fresh", 30)))
      .toDF("doc_id", "text")
    // every boilerplate fp has 6 > 5 postings → no candidates at all
    assert(idx.probe(probeDoc, "doc_id", "text").count() === 0L)
    val over = idx.oversizedFpStats().as[(Long, Long)].collect()
    assert(over.nonEmpty && over.forall(_._2 === 6L))
    // with a generous cap the same probe matches all six
    val idx2 = new SpanIndex(spark, tmpDir("spanix_"), minShared = 1,
      maxPostings = 500)
    idx2.add(h, "doc_id", "text")
    assert(idx2.probe(probeDoc, "doc_id", "text")
      .select("hist_id").as[Long].collect().toSet === (1L to 6L).toSet)
  }

  test("ingest gates quotes, admits novel, and is restart-idempotent") {
    val idx = new SpanIndex(spark, tmpDir("spanix_"), minShared = 3)
    idx.add(hist, "doc_id", "text")
    val batch = Seq(10L -> quote, 11L -> novelDoc).toDF("doc_id", "text")
    val novel = idx.ingest(batch, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq
    assert(novel === Seq(11L))
    // redelivery: 11 now matches its own copy; 10 still matches history
    val again = idx.ingest(batch, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq
    assert(again.isEmpty)
  }
}
