package graft

import graft.operators.{BucketedSnapshotStore, ErIndex, HammingIndex, Linkage, NearDupIndex}
import org.apache.spark.sql.functions._

/** Targeted deletion (right-to-be-forgotten): the store-level `delete`
  * primitive — both bucket-pruned (keys ⊇ bucket columns) and
  * scan-discovery (delete by a non-bucketed column) paths, the commit
  * protocol under injected crashes, the emptied-bucket manifest rule,
  * and the bloom-sidecar rebuild that makes a forgotten key genuinely
  * never-seen — plus the per-index `forget` wrappers. */
class ForgetSpec extends SparkSpec {
  import spark.implicits._

  test("delete by pk prunes, removes exactly the keys, and is idempotent") {
    val store = new BucketedSnapshotStore(spark, tmpDir("fdel_"), numBuckets = 8)
    store.write("t", (1 to 500).map(i => (i, s"v$i")).toDF("id", "v"), Seq("id"))
    val n = store.delete("t", Seq(5, 300, 999).toDF("id"), Seq("id"), Seq("id"))
    assert(n === 2L) // 999 was never there
    val left = store.read("t").get
    assert(left.count() === 498)
    assert(left.filter(col("id").isin(5, 300)).count() === 0)
    assert(left.filter(col("id") === 6).first().getString(1) === "v6")
    // idempotent: a retry deletes nothing and commits nothing harmful
    assert(store.delete("t", Seq(5, 300).toDF("id"), Seq("id"), Seq("id")) === 0L)
    assert(store.read("t").get.count() === 498)
  }

  test("delete by a non-bucket column rewrites only affected buckets") {
    val store = new BucketedSnapshotStore(spark, tmpDir("fdel2_"),
      numBuckets = 8, bucketPrefixLen = 1)
    // pk (grp, id), bucketed on grp only — delete arrives by bare id
    val rows = for (g <- 1 to 4; i <- 1 to 50) yield (g, g * 1000 + i, s"d$g-$i")
    store.write("t", rows.toDF("grp", "id", "v"), Seq("grp", "id"))
    val victims = Seq(1001, 2001, 2002).toDF("id")
    assert(store.delete("t", victims, Seq("id"), Seq("grp", "id")) === 3L)
    val left = store.read("t").get
    assert(left.count() === 197)
    assert(left.filter(col("id").isin(1001, 2001, 2002)).count() === 0)
    // untouched group fully intact
    assert(left.filter(col("grp") === 3).count() === 50)
  }

  test("deleting every row of a bucket drops it from the manifest cleanly") {
    val store = new BucketedSnapshotStore(spark, tmpDir("fdel3_"), numBuckets = 4)
    store.write("t", (1 to 40).map(i => (i, i.toString)).toDF("id", "v"), Seq("id"))
    // wipe everything — all buckets emptied, manifest ends up entry-free
    val n = store.delete("t", (1 to 40).toDF("id"), Seq("id"), Seq("id"))
    assert(n === 40L)
    assert(!store.exists("t")) // zero-entry manifest ≡ fresh store
    assert(store.read("t").isEmpty)
    // and the store seeds again like new
    store.upsert("t", Seq((7, "x")).toDF("id", "v"), Seq("id"))
    assert(store.read("t").get.count() === 1)
  }

  test("crash before delete's manifest commit leaves the old rows readable") {
    val dir = tmpDir("fdel4_")
    val good = new BucketedSnapshotStore(spark, dir, numBuckets = 8)
    good.write("t", (1 to 100).map(i => (i, s"v$i")).toDF("id", "v"), Seq("id"))
    val crashing = new BucketedSnapshotStore(spark, dir, numBuckets = 8) {
      override protected def beforeCommitHook(): Unit =
        throw new RuntimeException("injected crash pre-commit")
    }
    intercept[RuntimeException](
      crashing.delete("t", Seq(5).toDF("id"), Seq("id"), Seq("id")))
    assert(good.read("t").get.count() === 100) // untouched
    // retry completes the deletion
    assert(good.delete("t", Seq(5).toDF("id"), Seq("id"), Seq("id")) === 1L)
    assert(good.read("t").get.count() === 99)
  }

  test("forgotten keys probe as never-seen (bloom sidecars rebuilt)") {
    val store = new BucketedSnapshotStore(spark, tmpDir("fdel5_"),
      numBuckets = 8, keyBloomFpp = 0.01)
    store.write("t", (1 to 200).map(i => (i, s"v$i")).toDF("id", "v"), Seq("id"))
    // before: key 42 is known → incrementalNew filters it
    val probe = Seq((42, "re"), (9999, "new")).toDF("id", "v")
    assert(store.incrementalNew("t", probe, Seq("id"))
      .collect().map(_.getInt(0)).toSet === Set(9999))
    store.delete("t", Seq(42).toDF("id"), Seq("id"), Seq("id"))
    // after: 42 must be NEW again — a stale bloom claiming "seen" would
    // silently drop a legitimately re-ingested record
    assert(store.incrementalNew("t", probe, Seq("id"))
      .collect().map(_.getInt(0)).toSet === Set(42, 9999))
  }

  test("NearDupIndex.forget: matches vanish, re-ingest treats doc as novel") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val idx = new NearDupIndex(spark, tmpDir("fnd_"), numBuckets = 16)
    val hist = docs.filter($"doc_id" < 100)
    idx.add(hist, "doc_id", "text")
    // an exact re-crawl of doc 10 under a new id matches doc 10
    val probe = docs.filter($"doc_id" === 10)
      .select(($"doc_id" + 100000).as("doc_id"), $"text")
    assert(idx.probe(probe, "doc_id", "text")
      .filter($"hist_id" === 10).count() >= 1)
    val deleted = idx.forget(Seq(10L).toDF("doc_id"), "doc_id")
    assert(deleted >= 2L) // ≥1 posting row + 1 shingle row
    assert(idx.probe(probe, "doc_id", "text")
      .filter($"hist_id" === 10).count() === 0)
    // ingest of the same content is novel again (index re-learns it)
    val re = docs.filter($"doc_id" === 10)
    assert(idx.ingest(re, "doc_id", "text").count() === 1)
    assert(idx.probe(probe, "doc_id", "text")
      .filter($"hist_id" === 10).count() >= 1)
  }

  test("HammingIndex.forget: signature and postings erased together") {
    val idx = new HammingIndex(spark, tmpDir("fhm_"), maxDist = 3)
    val sigs = Seq((1L, 0x1234L), (2L, 0x5678L), (3L, 0x1235L))
      .toDF("id", "sig")
    idx.add(sigs, "id", "sig")
    val probe = Seq((10L, 0x1234L)).toDF("id", "sig")
    assert(idx.probe(probe, "id", "sig").filter($"hist_id" === 1).count() === 1)
    assert(idx.forget(Seq(1L).toDF("id"), "id") >= 2L)
    assert(idx.probe(probe, "id", "sig").filter($"hist_id" === 1).count() === 0)
    // the near-neighbor 3 still matches (its rows were never touched)
    assert(idx.probe(probe, "id", "sig").filter($"hist_id" === 3).count() === 1)
  }

  test("ErIndex.forget removes every pass's denormalized copy of the id") {
    val fields = Seq(
      Linkage.FieldSpec("name", "name", Some(0.85), 4000000L, 2500000L,
        -3000000L),
      Linkage.FieldSpec("city", "city", None, 2000000L, 0L, -1000000L))
    // TWO blocking passes → two denormalized copies of every record
    val keys = Seq(substring(col("name"), 1, 3), col("city"))
    val idx = new ErIndex(spark, tmpDir("fer_"), fields, keys,
      scoreThresholdMicro = 3000000L, numBuckets = 8)
    val recs = Seq((1L, "alice", "rome"), (2L, "alicia", "rome"),
      (3L, "bob", "oslo")).toDF("id", "name", "city")
    idx.ingest(recs, "id")
    val all = idx.entities().get
    assert(all.filter($"id" === 1).count() === 1)
    assert(idx.forget(Seq(1L).toDF("id"), "id") === 2L) // one row per pass
    val left = idx.entities().get
    assert(left.filter($"id" === 1).count() === 0)
    assert(left.filter($"id".isin(2, 3)).count() === 2)
  }
}
