package graft

import java.io.ByteArrayInputStream

import graft.functions.{BloomAggregate, BloomBank, BloomBankMightContain, SerializableHadoopConf}
import graft.operators.BucketedSnapshotStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge
import org.apache.spark.util.sketch.BloomFilter

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def bloomOf(df: DataFrame, cap: Long = 20000L, fpp: Double = 0.01): BloomFilter = {
    val bytes = df.select(bridge.column(
        BloomAggregate(bridge.expression(col("h")), cap, fpp).toAggregateExpression())
        .as("b"))
      .first().getAs[Array[Byte]](0)
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  test("bloom aggregate: no false negatives, bounded false positives") {
    val in = spark.range(10000).select(xxhash64(col("id")).as("h"))
    val f = bloomOf(in)
    val misses = spark.range(10000).select(xxhash64(col("id")).as("h"))
      .collect().count(r => !f.mightContainLong(r.getLong(0)))
    assert(misses === 0, "a Bloom filter can never have false negatives")
    val fps = spark.range(10000, 20000).select(xxhash64(col("id")).as("h"))
      .collect().count(r => f.mightContainLong(r.getLong(0)))
    assert(fps < 300, s"fp rate ${fps / 10000.0} far above the 0.01 target")
  }

  test("filter cache keys on full content: same-length filters never collide") {
    import graft.functions.BloomSingleCache
    BloomSingleCache.clear()
    // two filters with identical (expectedItems, fpp) → identical byte
    // LENGTH but different contents; a hash-keyed cache could collide and
    // silently probe the wrong filter (false negatives = dropped rows)
    val fa = spark.range(0, 1000).select(xxhash64(col("id")).as("h"))
    val fb = spark.range(50000, 51000).select(xxhash64(col("id")).as("h"))
    def bytesOf(df: DataFrame): Array[Byte] =
      df.select(bridge.column(BloomAggregate(bridge.expression(col("h")),
          2000L, 0.01).toAggregateExpression()).as("b"))
        .first().getAs[Array[Byte]](0)
    val (ba, bb) = (bytesOf(fa), bytesOf(fb))
    assert(ba.length === bb.length && !java.util.Arrays.equals(ba, bb))
    val ga = BloomSingleCache.get(ba)
    val gb = BloomSingleCache.get(bb)
    assert(!(ga eq gb), "distinct contents must map to distinct filters")
    val h = spark.range(50000, 51000).select(xxhash64(col("id")).as("h"))
      .collect().map(_.getLong(0))
    assert(h.forall(gb.mightContainLong), "no false negatives on b's keys")
  }

  test("bloom aggregate bytes are partitioning- and order-invariant") {
    val base = spark.range(5000).select(xxhash64(col("id")).as("h"))
    val one = base.repartition(1)
    val many = base.repartition(16)
    val shuffled = base.orderBy(col("h").desc)
    def bytes(df: DataFrame) = df.select(bridge.column(
        BloomAggregate(bridge.expression(col("h")), 10000L, 0.01)
          .toAggregateExpression()).as("b"))
      .first().getAs[Array[Byte]](0)
    val a = bytes(one); val b = bytes(many); val c = bytes(shuffled)
    assert(java.util.Arrays.equals(a, b),
      "merge order across partitions changed the bitmap")
    assert(java.util.Arrays.equals(a, c),
      "insertion order changed the bitmap")
  }

  private def docs(n: Int): DataFrame =
    (1 to n).map(i => (i.toLong, s"text body $i", i * 10)).toDF("doc_id", "text", "meta")

  /** Plain exact anti-join reference for incrementalNew. */
  private def refNew(incoming: DataFrame, store: BucketedSnapshotStore,
      name: String, pk: Seq[String]): Seq[Long] =
    store.read(name) match {
      case None => incoming.select("doc_id").as[Long].collect().toSeq.sorted
      case Some(hist) =>
        incoming.join(hist.select(pk.map(col): _*), pk, "left_anti")
          .select("doc_id").as[Long].collect().toSeq.sorted
    }

  test("incrementalNew == exact anti-join across multiple generations") {
    val store = new BucketedSnapshotStore(spark, tmpDir("bloom_"),
      numBuckets = 8, keyBloomFpp = 0.01)
    store.write("d", docs(1000), Seq("doc_id"))
    // two upserts → manifest maps buckets to three distinct generations
    store.upsert("d", docs(1200).filter(col("doc_id") > 1000), Seq("doc_id"))
    store.upsert("d",
      Seq((1201L, "x", 1), (1202L, "y", 2)).toDF("doc_id", "text", "meta"),
      Seq("doc_id"))
    assert(store.compactionFanout("d") >= 2, "need a multi-generation store")
    val incoming = docs(1500).filter(col("doc_id") % 3 === 0) // dups + new
    val got = store.incrementalNew("d", incoming, Seq("doc_id"))
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(got === refNew(incoming, store, "d", Seq("doc_id")))
    assert(got.nonEmpty && got.forall(_ > 1202))
  }

  test("incrementalNew: bloomless store falls back to the exact path, same answer") {
    val store = new BucketedSnapshotStore(spark, tmpDir("bloomless_"),
      numBuckets = 8) // keyBloomFpp = 0 → no sidecars anywhere
    store.write("d", docs(500), Seq("doc_id"))
    val incoming = docs(700).filter(col("doc_id") % 2 === 0)
    val got = store.incrementalNew("d", incoming, Seq("doc_id"))
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(got === refNew(incoming, store, "d", Seq("doc_id")))
  }

  test("pk-less compact drops the fast path but not correctness; pk-ed compact restores it") {
    val dir = tmpDir("bloomc_")
    val store = new BucketedSnapshotStore(spark, dir,
      numBuckets = 8, keyBloomFpp = 0.01)
    store.write("d", docs(400), Seq("doc_id"))
    store.upsert("d", docs(500).filter(col("doc_id") > 400), Seq("doc_id"))
    store.compact("d") // pk-less → folded generation has no sidecars
    val incoming = docs(600).filter(col("doc_id") % 5 === 0)
    val expect = refNew(incoming, store, "d", Seq("doc_id"))
    assert(store.incrementalNew("d", incoming, Seq("doc_id"))
      .select("doc_id").as[Long].collect().toSeq.sorted === expect)
    store.compact("d", Seq("doc_id")) // rebuilds sidecars with the fold
    assert(store.incrementalNew("d", incoming, Seq("doc_id"))
      .select("doc_id").as[Long].collect().toSeq.sorted === expect)
  }

  test("incrementalNew handles multi-column and null pks") {
    val store = new BucketedSnapshotStore(spark, tmpDir("bloomn_"),
      numBuckets = 4, keyBloomFpp = 0.01)
    val hist = Seq((Some(1L), "a", 1), (Some(2L), "b", 2), (None, "c", 3))
      .toDF("k1", "k2", "v")
    store.write("t", hist, Seq("k1", "k2"))
    val incoming = Seq(
      (Some(1L), "a", 10),  // dup
      (None, "c", 30),      // dup with null in the key
      (Some(9L), "z", 90),  // new
      (None, "d", 40))      // new, null key component
      .toDF("k1", "k2", "v")
    val got = store.incrementalNew("t", incoming, Seq("k1", "k2"))
      .select("v").as[Int].collect().toSeq.sorted
    assert(got === Seq(40, 90))
  }

  test("probe expression: mostly-new batch rarely consults the exact path") {
    val store = new BucketedSnapshotStore(spark, tmpDir("bloomp_"),
      numBuckets = 8, keyBloomFpp = 0.01)
    store.write("d", docs(5000), Seq("doc_id"))
    // brand-new keys: the bloom must clear ≈ (1 - fpp) of them with no join
    val fresh = spark.range(100000, 110000).select(col("id").as("doc_id"))
    val bank = store.probeBankForTest("d")
    val maybeCol = bridge.column(BloomBankMightContain(
      bridge.expression(xxhash64(col("doc_id"))),
      bridge.expression(pmod(hash(col("doc_id")), lit(8))),
      bank))
    val maybe = fresh.filter(maybeCol).count()
    assert(maybe < 500, s"$maybe of 10000 definitely-new keys flagged maybe-dup " +
      "(expected ≈ fpp = 1%) — the prefilter is not doing its job")
  }

  test("ingestNew commits only first-seen rows and is idempotent") {
    val store = new BucketedSnapshotStore(spark, tmpDir("bloomi_"),
      numBuckets = 8, keyBloomFpp = 0.01)
    store.write("d", docs(100), Seq("doc_id"))
    val batch = docs(140).filter(col("doc_id") > 80) // 81..140: 20 dup, 40 new
    val landed = store.ingestNew("d", batch, Seq("doc_id"))
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(landed === (101L to 140L))
    assert(store.read("d").get.count() === 140)
    // keep-first: re-ingesting the same batch (even with changed payloads)
    // lands nothing and mutates nothing
    val again = store.ingestNew("d",
      batch.withColumn("meta", col("meta") * 100), Seq("doc_id"))
    assert(again.count() === 0)
    assert(store.read("d").get.filter(col("doc_id") === 120).first().getInt(2) === 1200)
  }

  test("bloomPrunedJoin: result-identical to the plain join, and it prunes") {
    val big = (1L to 2000L).map(i => (i, s"v$i")).toDF("k", "v")
    val small = Seq((10L, "a"), (500L, "b"), (1999L, "c"), (777L, "d"))
      .toDF("k", "w")
    val plain = big.join(small, Seq("k"), "inner")
      .collect().map(_.toSeq).toSet
    val pruned = graft.operators.Ops.bloomPrunedJoin(big, small, Seq("k"))
    assert(pruned.collect().map(_.toSeq).toSet === plain)
    // the pre-filter actually removes rows before the join (fpp 1% on 4
    // keys over 2000 rows: expect ~4 + a handful of FPs surviving)
    val h = xxhash64(col("k"))
    val bytes = small.select(graft.functions.Bloom.bloom_agg(h, 4L, 0.01))
      .head.getAs[Array[Byte]](0)
    val survivors = big
      .filter(graft.functions.Bloom.might_contain(h, bytes)).count()
    assert(survivors >= 4L && survivors < 200L)
    // semi form
    val semi = graft.operators.Ops.bloomPrunedJoin(big, small.select("k"),
      Seq("k"), joinType = "left_semi")
    assert(semi.select("k").as[Long].collect().toSet ===
      Set(10L, 500L, 1999L, 777L))
  }

  test("bloomPrunedJoin: empty build side and illegal join types") {
    val big = (1L to 50L).toDF("k")
    val empty = Seq.empty[(Long, String)].toDF("k", "w")
    assert(graft.operators.Ops.bloomPrunedJoin(big, empty, Seq("k"))
      .count() === 0L)
    intercept[IllegalArgumentException] {
      graft.operators.Ops.bloomPrunedJoin(big, empty, Seq("k"),
        joinType = "left_outer")
    }
  }
}
