package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent Hamming-distance index over 64-bit signature HISTORY,
  * probed at ingest time: "is this signature within `maxDist` bits of
  * anything we have ever seen?" — without rescanning the history. The
  * signature-source-agnostic cell of the incremental-similarity matrix
  * (exact rows → Bloom sidecars, token near-dup → [[NearDupIndex]],
  * character fuzzy → [[FuzzyIndex]], vectors → [[VectorIndex]]): text
  * SimHash ([[Dedup.simhash]]), image dHash ([[Multimodal]]), and audio
  * fingerprints all route here, so this is also the multimodal crawl
  * dedup front door.
  *
  * Blocking is the [[Dedup.hammingNearDupPairs]] pigeonhole: the 64-bit
  * signature splits into four 16-bit chunks, and any pair within
  * Hamming distance ≤ 3 must agree on at least one chunk — COMPLETE
  * recall at the default `maxDist = 3` (degenerate chunk values with
  * more than `maxBucketSize` history postings are dropped from candidate
  * generation, the standard bounded-recall cap).
  *
  * Layout (one [[BucketedSnapshotStore]]):
  *  - `sigs`: (id, sig) — what exact verification reads, key-pruned to
  *    candidate ids only.
  *  - `chunks`: (chunk, chunk_val, id) postings bucketed on
  *    (chunk, chunk_val), so a probe reads ONLY the buckets the incoming
  *    batch's chunk keys hash into: probe I/O ∝ batch + collisions,
  *    never the history.
  *
  * `sigs` commits before `chunks` (a crash between leaves orphan sig
  * rows — never probed, harmless — rather than postings whose
  * verification sigs don't exist). A probe of an already-indexed id
  * reports itself at hamming 0 — exactly what [[ingest]]'s restart
  * contract relies on. */
class HammingIndex(
    spark: SparkSession,
    dir: String,
    maxDist: Int = 3,
    numBuckets: Int = 64,
    maxBucketSize: Int = 1000) {
  require(maxDist >= 0 && maxDist <= 3,
    s"4-chunk pigeonhole blocking is complete only for maxDist <= 3, got $maxDist")

  private val Sigs = "sigs"
  private val Chunks = "chunks"
  private val store = new BucketedSnapshotStore(spark, dir,
    numBuckets = numBuckets, bucketPrefixLen = 2)

  private def norm(df: DataFrame, idCol: String, sigCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(sigCol).cast("long").as("sig"))

  private def chunked(sigs: DataFrame): DataFrame =
    sigs.select(col("id"), posexplode(
        transform(sequence(lit(0), lit(3)),
          c => call_function("shiftright", col("sig"), c * lit(16))
            .bitwiseAND(0xFFFFL)))
        .as(Seq("chunk", "chunk_val")))
      .select(col("chunk"), col("chunk_val"), col("id"))

  /** Index signatures (ids new to the index, or unchanged re-adds —
    * the [[ingest]] contract). Two delta-proportional upserts; only the
    * touched chunk/id buckets rewrite. */
  def add(sigs0: DataFrame, idCol: String, sigCol: String): Unit = {
    val s = norm(sigs0, idCol, sigCol).localCheckpoint(true)
    store.upsert(Sigs, s, Seq("id"), assumeUniqueKeys = true)
    store.upsert(Chunks, chunked(s), Seq("chunk", "chunk_val", "id"),
      assumeUniqueKeys = true)
  }

  /** History matches of the incoming signatures:
    * (inc_id, hist_id, hamming) with hamming ≤ `maxDist`. An id probed
    * under its indexed signature reports itself at 0. */
  def probe(in0: DataFrame, idCol: String, sigCol: String): DataFrame = {
    val empty = in0.select(col(idCol).as("inc_id"), col(idCol).as("hist_id"),
      lit(0).as("hamming")).limit(0)
    if (!store.exists(Chunks)) return empty
    val inc = norm(in0, idCol, sigCol).localCheckpoint(true)
    val incChunks = chunked(inc)
    val postings = store.readForKeys(Chunks,
      incChunks.select("chunk", "chunk_val"), Seq("chunk", "chunk_val"))
    // degenerate-key cap on the HISTORY side (window, not groupBy+join:
    // one shuffle of the pruned postings)
    val ok = postings.withColumn("__m", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("chunk", "chunk_val")))
      .filter(col("__m") <= maxBucketSize)
      .select(col("chunk"), col("chunk_val"), col("id").as("hist_id"))
    val cand = incChunks.join(ok, Seq("chunk", "chunk_val"))
      .select(col("id").as("inc_id"), col("hist_id")).distinct()
      .localCheckpoint(true)
    val histSigs = store.readForKeys(Sigs,
        cand.select(col("hist_id").as("id")), Seq("id"))
      .select(col("id").as("hist_id"), col("sig").as("__hs"))
    cand
      .join(inc.select(col("id").as("inc_id"), col("sig").as("__is")),
        Seq("inc_id"))
      .join(histSigs, Seq("hist_id"))
      .select(col("inc_id"), col("hist_id"),
        bit_count(col("__is").bitwiseXOR(col("__hs"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .localCheckpoint(true)
  }

  /** Hamming-gated ingest: index only signatures with NO history match
    * within `maxDist`; returns the novel rows. Restart-safe: a
    * redelivered id matches its own indexed copy at hamming 0. */
  def ingest(batch: DataFrame, idCol: String, sigCol: String): DataFrame = {
    val b = batch.localCheckpoint(true)
    val hits = probe(b, idCol, sigCol).select(col("inc_id").as("__hit"))
      .distinct()
    val novel = b.join(hits, col(idCol) === col("__hit"), "left_anti")
      .localCheckpoint(true)
    add(novel, idCol, sigCol)
    novel
  }

  /** Right-to-be-forgotten: erase `ids` — chunk postings first (the
    * discoverable trace; crash-retry removes any orphan signatures),
    * then the stored signatures. Returns rows deleted across both
    * tables. */
  def forget(ids: DataFrame, idCol: String): Long = {
    val k = ids.select(col(idCol).as("id")).distinct()
    store.delete(Chunks, k, Seq("id"), Seq("chunk", "chunk_val", "id")) +
      store.delete(Sigs, k, Seq("id"), Seq("id"))
  }
}
