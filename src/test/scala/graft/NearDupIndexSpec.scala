package graft

import graft.operators.{Dedup, NearDupIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental near-dup index: probe ≡ brute force against history,
  * novel-only ingest + idempotence, persistence across reopen, and the
  * degenerate-band cap trade. */
class NearDupIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")

  /** Brute-force verified pairs between incoming and history at τ. */
  private def bruteMatches(inc: DataFrame, hist: DataFrame, tau: Double): Set[(Long, Long)] = {
    val sh = (d: DataFrame) => d.select(col("doc_id"),
      Dedup.shinglesOf(Dedup.tokensCol(col("text")), 3).as("sh"))
    val a = sh(inc).toDF("inc_id", "sha")
    val b = sh(hist).toDF("hist_id", "shb")
    val inter = size(array_intersect(col("sha"), col("shb")))
    a.crossJoin(b)
      .select(col("inc_id"), col("hist_id"),
        (inter / (size(col("sha")) + size(col("shb")) - inter)).as("j"))
      .filter(col("j") >= tau)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("probe equals brute-force history matches at the verify threshold") {
    val idx = new NearDupIndex(spark, tmpDir("ndix_"), shingleSize = 3,
      bands = 16, rowsPerBand = 2, threshold = 0.55, numBuckets = 16)
    val hist = docs.filter($"doc_id" % 2 === 0)
    val inc = docs.filter($"doc_id" % 10 === 0) // exact re-crawls, new ids
      .select(($"doc_id" + 100000).as("doc_id"), $"text")
      .unionByName(docs.filter($"doc_id" % 10 === 6) // near-dup mutations
        .select(($"doc_id" + 200000).as("doc_id"),
          concat($"text", lit(" extra token")).as("text")))
      .unionByName(docs.filter($"doc_id" % 2 === 1)) // novel
    idx.add(hist, "doc_id", "text")
    val got = idx.probe(inc, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteMatches(inc, hist, 0.55)
    assert(want.nonEmpty, "planted matches missing — testdata broken")
    assert(got === want)
  }

  test("ingest keeps only novel docs and is idempotent") {
    val idx = new NearDupIndex(spark, tmpDir("ndix_"), numBuckets = 16)
    val hist = docs.filter($"doc_id" < 20)
    idx.add(hist, "doc_id", "text")
    val batch = docs.filter($"doc_id" >= 20 && $"doc_id" < 30) // novel
      .unionByName(docs.filter($"doc_id" < 5) // exact dups of history
        .select(($"doc_id" + 500).as("doc_id"), $"text"))
    val novel = idx.ingest(batch, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(novel === (20L until 30L).toSet)
    // idempotence: everything in the batch now matches its indexed copy
    val again = idx.ingest(batch, "doc_id", "text")
    assert(again.isEmpty)
  }

  test("index persists: a reopened instance probes the same matches") {
    val dir = tmpDir("ndix_")
    val hist = docs.filter($"doc_id" < 50)
    val inc = docs.filter($"doc_id" < 10)
      .select(($"doc_id" + 900).as("doc_id"), $"text")
    new NearDupIndex(spark, dir, numBuckets = 16).add(hist, "doc_id", "text")
    val reopened = new NearDupIndex(spark, dir, numBuckets = 16)
    val got = reopened.probe(inc, "doc_id", "text")
      .filter($"jaccard" >= 0.9999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === (0L until 10L).map(i => (i + 900, i)).toSet)
  }

  test("probe on an empty index returns no rows with the right schema") {
    val idx = new NearDupIndex(spark, tmpDir("ndix_"), numBuckets = 16)
    val out = idx.probe(docs.limit(5), "doc_id", "text")
    assert(out.columns.toSeq === Seq("inc_id", "hist_id", "jaccard"))
    assert(out.isEmpty)
  }

  test("degenerate band keys above maxBucketSize are skipped (bounded recall trade)") {
    val idx = new NearDupIndex(spark, tmpDir("ndix_"), numBuckets = 16,
      maxBucketSize = 2)
    // 5 identical history docs — every band key has 5 postings > cap
    val hist = docs.filter($"doc_id" === 0).crossJoin(spark.range(5))
      .select(($"doc_id" + $"id").as("doc_id"), $"text")
    idx.add(hist, "doc_id", "text")
    val inc = docs.filter($"doc_id" === 0)
      .select(($"doc_id" + 700).as("doc_id"), $"text")
    assert(idx.probe(inc, "doc_id", "text").isEmpty,
      "capped keys should produce no candidates")
    assert(idx.oversizedBandStats().count() > 0,
      "the skipped keys must be observable")
  }

  test("re-adding a changed doc verifies against the CURRENT shingles") {
    val idx = new NearDupIndex(spark, tmpDir("ndix_"), numBuckets = 16)
    val orig = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val changed = Seq((1L, "one two three four five six seven eight nine ten")).toDF("doc_id", "text")
    idx.add(orig, "doc_id", "text")
    idx.add(changed, "doc_id", "text") // shingle row replaced; stale postings remain
    // a probe matching the OLD text hits the stale postings as candidates,
    // but verification runs against the stored (new) shingles → no match
    val probeOld = orig.select(($"doc_id" + 10).as("doc_id"), $"text")
    assert(idx.probe(probeOld, "doc_id", "text").isEmpty)
    // and the new text matches at 1.0
    val probeNew = changed.select(($"doc_id" + 20).as("doc_id"), $"text")
    val m = idx.probe(probeNew, "doc_id", "text").collect()
    assert(m.length == 1 && m(0).getDouble(2) > 0.9999)
  }
}
