package graft

import graft.operators.{ErIndex, Linkage}
import graft.operators.Linkage.FieldSpec
import org.apache.spark.sql.functions._

/** Persistent entity-resolution index: first-batch founding, fuzzy attach
  * to history clusters, threshold rejection, deterministic tie-break,
  * redelivery stability, and the hot-block cap. */
class ErIndexSpec extends SparkSpec {
  import spark.implicits._

  private val fields = Seq(
    FieldSpec("name", "name", Some(0.85), 4000000L, 2500000L, -3000000L),
    FieldSpec("city", "city", None, 2000000L, 0L, -1000000L))
  private def keys = Seq(substring(col("name"), 1, 3))
  private def mkIdx(thr: Long = 3000000L) =
    new ErIndex(spark, tmpDir("erix_"), fields, keys,
      scoreThresholdMicro = thr, numBuckets = 8)

  private val seed = Seq(
    (1L, "martha stone", "oslo"),
    (2L, "alan turing", "york"),
    (3L, "ada lovelace", "london")).toDF("id", "name", "city")

  test("first batch founds clusters; later batch attaches fuzzily") {
    val idx = mkIdx()
    val first = idx.ingest(seed, "id")
      .select("inc_id", "cluster", "matched")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(first === Set((1L, 1L, false), (2L, 2L, false), (3L, 3L, false)))
    // typo'd martha + same city → attaches to cluster 1; unrelated → new
    val batch2 = Seq((10L, "marhta stone", "oslo"), (11L, "grace hopper", "nyc"))
      .toDF("id", "name", "city")
    val got = idx.ingest(batch2, "id")
      .select("inc_id", "cluster", "matched")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got === Set((10L, 1L, true), (11L, 11L, false)))
    // transitive: a record matching 10's copy inherits cluster 1, not 10
    val batch3 = Seq((20L, "marhta stone", "oslo")).toDF("id", "name", "city")
    val third = idx.ingest(batch3, "id")
      .select("inc_id", "cluster").as[(Long, Long)].collect().toSeq
    assert(third === Seq((20L, 1L)))
  }

  test("threshold rejects weak candidates") {
    val idx = mkIdx(thr = 7000000L)
    idx.ingest(seed, "id")
    // shares the name block and fuzzy-matches the name, but city differs:
    // 2.5M - 1M = 1.5M < 7M → new cluster
    val got = idx.ingest(Seq((10L, "marhta stone", "lima"))
        .toDF("id", "name", "city"), "id")
      .select("inc_id", "cluster", "matched")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got === Seq((10L, 10L, false)))
  }

  test("best match is deterministic: max score, ties to smallest id") {
    val idx = mkIdx()
    idx.ingest(Seq((5L, "martha stone", "oslo"), (6L, "martha stone", "oslo"))
      .toDF("id", "name", "city"), "id")
    // exact match against BOTH history copies → tie → smallest hist id's
    // cluster (5 and 6 founded separate clusters in one batch — the
    // within-batch caveat — so the tie decides)
    val got = idx.ingest(Seq((30L, "martha stone", "oslo"))
        .toDF("id", "name", "city"), "id")
      .select("inc_id", "cluster").as[(Long, Long)].collect().toSeq
    assert(got === Seq((30L, 5L)))
  }

  test("redelivery is stable and idempotent") {
    val idx = mkIdx()
    idx.ingest(seed, "id")
    val b = Seq((10L, "marhta stone", "oslo")).toDF("id", "name", "city")
    assert(idx.ingest(b, "id").select("cluster").as[Long].collect().toSeq
      === Seq(1L))
    // redelivered: the all-exact self-match (4M + 2M) outranks the fuzzy
    // match to cluster 1's record (2.5M + 2M) → keeps its stored cluster 1
    val again = idx.ingest(b, "id")
      .select("inc_id", "cluster", "matched", "score_micro")
      .as[(Long, Long, Boolean, Option[Long])].collect().toSeq
    assert(again === Seq((10L, 1L, true, Some(6000000L))))
    assert(idx.entities().get.filter(col("id") === 10L)
      .select("cluster").as[Long].collect().toSeq === Seq(1L))
  }

  test("hot blocking keys beyond maxBlockSize are dropped") {
    val idx = new ErIndex(spark, tmpDir("erix_"), fields, keys,
      scoreThresholdMicro = 1000000L, numBuckets = 8, maxBlockSize = 3)
    val hot = (1L to 5L).map(i => (i, "aaa common", s"city$i"))
      .toDF("id", "name", "city")
    idx.ingest(hot, "id")
    // the "aaa" block has 5 > 3 history postings → no candidates → novel
    val got = idx.ingest(Seq((99L, "aaa common", "city1"))
        .toDF("id", "name", "city"), "id")
      .select("matched").as[Boolean].collect().toSeq
    assert(got === Seq(false))
  }

  test("a batch repeating an id keeps the store pk-unique (struct-min pick)") {
    val idx = mkIdx()
    // id 7 appears twice with different attrs: upsert runs with
    // assumeUniqueKeys = true, so without the ingest-side dedup this
    // would commit duplicate (pass, bkey, id) postings
    val dup = Seq((7L, "martha stone", "oslo"), (7L, "zz variant", "paris"),
      (8L, "alan turing", "york")).toDF("id", "name", "city")
    val got = idx.ingest(dup, "id")
    // one assignment row per unique id, deterministic struct-min attrs
    assert(got.select("inc_id").as[Long].collect().sorted.toSeq
      === Seq(7L, 8L))
    val ents = idx.entities().get
      .select("id", "name", "city").as[(Long, String, String)]
      .collect().toSet
    assert(ents === Set((7L, "martha stone", "oslo"),
      (8L, "alan turing", "york")))
    // store invariant: no duplicate (pass, bkey, id) postings committed
    val recs = idx.entities().get
    assert(recs.count() === recs.select("id").distinct().count())
  }
}
