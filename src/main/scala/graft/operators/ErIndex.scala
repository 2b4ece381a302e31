package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent entity-resolution index: incoming records probe a
  * golden-record HISTORY through blocking keys, score against their
  * candidates with the Fellegi–Sunter comparator ([[Linkage]]), and
  * attach to the best match's cluster — or found a new cluster — without
  * ever rescanning the history. The streaming master-data upsert.
  *
  * The seventh cell of the incremental-similarity matrix (exact → Bloom,
  * token → LSH, char → FastSS, vector → IVF, signature → Hamming, span →
  * winnowing, ENTITY → this): the others answer "have we seen this
  * content?", this answers "which real-world entity is this record?" and
  * hands back a stable cluster id.
  *
  * Two tables in one prefix-bucketed [[BucketedSnapshotStore]]:
  *  - `keys`: one row per (pass, bkey, id) — blocking-key postings,
  *    bucketed on (pass, bkey): a probe reads ONLY the buckets the
  *    batch's keys hash into (I/O ∝ batch + collisions).
  *  - `ents`: one row per id with the comparison attributes + assigned
  *    cluster, bucketed on id: candidate attributes are read key-pruned.
  *
  * Assignment semantics, by design:
  *  - batch-vs-history only: two NEW records of the same entity arriving
  *    in ONE batch found separate clusters (the NearDupIndex within-batch
  *    caveat); run batch linkage ([[Linkage.blockedPairs]]) first when
  *    intra-batch duplicates matter.
  *  - best match = max score, ties to the smallest history id —
  *    deterministic and SQL-replayable.
  *  - redelivery is stable: an unchanged record's all-exact self-match
  *    outranks every other candidate, so it re-receives its own stored
  *    cluster and the same-pk upserts are no-ops.
  *  - hot blocking keys beyond `maxBlockSize` history postings are
  *    dropped from candidate generation (the capBuckets bounded-recall
  *    convention).
  *
  * `blockKeys` are expressions over the attribute columns (evaluated on
  * both the batch and the stored history), `scoreThresholdMicro` is the
  * accept bar in [[Linkage.fsWeightMicro]] micro-log2 units. */
class ErIndex(
    spark: SparkSession,
    dir: String,
    fields: Seq[Linkage.FieldSpec],
    blockKeys: Seq[Column],
    scoreThresholdMicro: Long,
    numBuckets: Int = 64,
    maxBlockSize: Int = 4096) {
  require(fields.nonEmpty && blockKeys.nonEmpty,
    "fields and blockKeys must be non-empty")

  private val Keys = "keys"
  private val Ents = "ents"
  private val attrCols: Seq[String] = fields.map(_.column).distinct
  private val store = new BucketedSnapshotStore(spark, dir,
    numBuckets = numBuckets, bucketPrefixLen = 2)

  private def keyed(df: DataFrame, idCol: String): DataFrame =
    blockKeys.zipWithIndex.map { case (k, i) =>
      df.select(lit(i).as("pass"), k.cast("string").as("bkey"),
        col(idCol).cast("long").as("id"))
        .filter(col("bkey").isNotNull)
    }.reduce(_ unionAll _)

  /** (inc_id, cluster, matched, score_micro): the assignment each batch
    * record WOULD receive against the current history (no writes).
    * Unmatched records report their own id as cluster, matched = false,
    * score NULL. */
  def resolve(batch: DataFrame, idCol: String): DataFrame = {
    val own = batch.select(col(idCol).cast("long").as("inc_id"))
      .select(col("inc_id"), col("inc_id").as("cluster"),
        lit(false).as("matched"), lit(null).cast("long").as("score_micro"))
    if (!store.exists(Keys)) return own.localCheckpoint(true)
    val bk = keyed(batch, idCol).localCheckpoint(true)
    val hist = store.readForKeys(Keys, bk.select("pass", "bkey"),
      Seq("pass", "bkey"))
    val okHist = hist
      .withColumn("__m", count(lit(1)).over(Window.partitionBy("pass", "bkey")))
      .filter(col("__m") <= maxBlockSize)
      .select(col("pass"), col("bkey"), col("id").as("hist_id"))
    val cand = bk.join(okHist, Seq("pass", "bkey"))
      .select(col("id").as("id_a"), col("hist_id").as("id_b")).distinct()
      .localCheckpoint(true)
    val histEnts = store.readForKeys(Ents,
      cand.select(col("id_b").as("id")), Seq("id"))
    val scored = Linkage.matchScoresAcross(
      batch.select((col(idCol).cast("long").as("id") +: attrCols.map(col)): _*),
      histEnts, "id", cand, fields, carryRight = Seq("cluster"))
    val best = scored.filter(col("score_micro") >= scoreThresholdMicro)
      .withColumn("__rn", row_number().over(Window.partitionBy("id_a")
        .orderBy(col("score_micro").desc, col("id_b").asc)))
      .filter(col("__rn") === 1)
      .select(col("id_a").as("inc_id"), col("b_cluster").as("cluster"),
        col("score_micro"))
    own.select("inc_id")
      .join(best, Seq("inc_id"), "left")
      .select(col("inc_id"),
        coalesce(col("cluster"), col("inc_id")).as("cluster"),
        col("cluster").isNotNull.as("matched"), col("score_micro"))
      .localCheckpoint(true)
  }

  /** Resolve the batch, persist every record with its assigned cluster,
    * and return the assignment. Ents commit FIRST: a crash between the
    * upserts leaves attributes without postings (those records are
    * temporarily un-probe-able — bounded recall until redelivery) rather
    * than postings whose attributes and clusters don't exist. */
  def ingest(batch: DataFrame, idCol: String): DataFrame = {
    val assign = resolve(batch, idCol)
    val ents = batch
      .select((col(idCol).cast("long").as("id") +: attrCols.map(col)): _*)
      .join(assign.select(col("inc_id").as("id"), col("cluster")), "id")
    store.upsert(Ents, ents, Seq("id"), assumeUniqueKeys = true)
    store.upsert(Keys, keyed(batch, idCol), Seq("pass", "bkey", "id"),
      assumeUniqueKeys = true)
    assign
  }

  /** Current golden-record table: (id, attrs…, cluster). */
  def entities(): Option[DataFrame] = store.read(Ents)

  /** Fold generations (bounds read fan-out after deep ingest history). */
  def compact(): Unit = {
    store.compact(Ents, Seq("id"))
    store.compact(Keys, Seq("pass", "bkey", "id"))
  }
}
