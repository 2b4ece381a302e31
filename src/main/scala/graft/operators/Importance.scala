package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting for targeted data selection (extension;
  * after Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling"): score every raw document by how much more
  * likely its hashed n-gram features are under a TARGET distribution (a
  * trusted in-domain sample) than under the RAW distribution, then select
  * by weight (resampling composes with [[Sampling.topFractionByScore]] /
  * [[Sampling.hashSample]]).
  *
  * log w(doc) = Σ_b cnt(doc, b) · [ ln p̂_t(b) − ln p̂_r(b) ]  with
  * additive-α smoothing over B hashed feature buckets.
  *
  * Spark shape: both distributions are B-bounded (bucket, count)
  * aggregates — map-side combined, broadcast back — so the only
  * corpus-sized work is one explode → (doc, bucket) count per scan, and
  * the per-doc score joins a broadcast B-row weight table. No UDFs; the
  * md5-prefix bucket hash keeps every weight replayable in an external
  * SQL engine. Per-doc summation folds a bucket-sorted array (the q66/q84
  * idiom) so the double result is invariant under repartitioning. */
object Importance {

  /** Hashed feature bucket in [0, B). `hashKind` as in the dedup family:
    * `xxhash64` is the production default (codegen'd; md5+conv was ~a
    * third of the 20×-stress feature-scan cost); `md5_60` exists so an
    * external SQL oracle can replay every bucket bit-for-bit (the
    * verification artifact, not the shipped default — same convention as
    * the minhash/simhash signatures). */
  def featureBucket(feature: Column, buckets: Int,
      hashKind: String = "xxhash64"): Column = {
    val h = if (hashKind == "md5_60") Dedup.md5Hash60(feature) else xxhash64(feature)
    pmod(h, lit(buckets.toLong))
  }

  /** Word-bigram features of a text column: "w1 w2" strings over the
    * shared whitespace tokenizer (DSIR's hashed-ngram convention; bigrams
    * carry word-order signal unigram bags miss). Empty/1-token docs have
    * no features and receive no weight row.
    *
    * Bigrams are 2-shingles, so this rides the compiled one-pass
    * [[graft.functions.Shingles.word_shingles]] loop (an equivalent
    * zip_with/slice/filter HOF chain evaluates interpreted per element —
    * the feature scan measured 13.5 → 6.9 s at 20× stress from this plus
    * the hash swap). The sub-2-token pseudo-shingle the shingle family
    * emits has no space, so the space filter restores exact bigram
    * semantics. */
  def bigramsCol(text: Column): Column =
    filter(Dedup.shinglesOfAll(Dedup.tokensCol(text), 2), p => p.contains(" "))

  /** Exploded (…, __f) bigram rows — the space filter runs codegen'd on
    * the exploded string column, not as a per-element array lambda. */
  private def bigramRows(df: DataFrame, keep: Seq[Column], textCol: String): DataFrame =
    df.select(keep :+
      explode(Dedup.shinglesOfAll(Dedup.tokensCol(col(textCol)), 2)).as("__f"): _*)
      .filter(col("__f").contains(" "))

  /** (doc, bucket, cnt) hashed-bigram counts — the per-document feature
    * vector in sparse form. */
  def docBucketCounts(df: DataFrame, idCol: String, textCol: String,
      buckets: Int, hashKind: String = "xxhash64"): DataFrame =
    bigramRows(df, Seq(col(idCol)), textCol)
      .select(col(idCol), featureBucket(col("__f"), buckets, hashKind).as("bucket"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("cnt"))

  /** (bucket, cnt) corpus feature counts — B-bounded output. */
  def bucketCounts(df: DataFrame, textCol: String, buckets: Int,
      hashKind: String = "xxhash64"): DataFrame =
    bigramRows(df, Seq.empty, textCol)
      .select(featureBucket(col("__f"), buckets, hashKind).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Per-bucket log-likelihood ratios ln p̂_target(b) − ln p̂_raw(b) with
    * additive-α smoothing: (bucket, w), ≤ B rows. Written in the exact
    * operation order the SQL oracle replays:
    * ln(t+α) − ln(T+αB) − ln(r+α) + ln(R+αB). */
  def bucketLogRatios(raw: DataFrame, target: DataFrame, textCol: String,
      buckets: Int, alpha: Double, hashKind: String = "xxhash64"): DataFrame =
    logRatiosFromCounts(bucketCounts(raw, textCol, buckets, hashKind),
      bucketCounts(target, textCol, buckets, hashKind), buckets, alpha)

  /** Core of [[bucketLogRatios]] over pre-aggregated (bucket, cnt)
    * frames — lets callers that already hold a finer-grained count frame
    * (e.g. [[importanceWeights]]'s per-doc counts) derive the raw side by
    * re-aggregation instead of a second corpus scan. */
  private[graft] def logRatiosFromCounts(rawCounts: DataFrame,
      targetCounts: DataFrame, buckets: Int, alpha: Double): DataFrame = {
    require(alpha > 0.0, s"alpha must be > 0 (unsmoothed ratios diverge), got $alpha")
    val r = rawCounts.withColumnRenamed("cnt", "__r")
    val t = targetCounts.withColumnRenamed("cnt", "__t")
    val joined = r.join(t, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("__r"), lit(0L)).as("__r"),
        coalesce(col("__t"), lit(0L)).as("__t"))
    // totals (T, R) as an unpartitioned window over the ≤ B-row frame —
    // single-pass (no self-join / recomputed corpus scan), and the
    // one-task window is bounded at B rows by construction
    val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val aB = lit(alpha * buckets)
    // totals named distinctly from __t/__r — Spark resolution is
    // case-insensitive, so "__T" would silently REPLACE "__t"
    joined
      .withColumn("__tsum", sum("__t").over(w))
      .withColumn("__rsum", sum("__r").over(w))
      .select(col("bucket"),
        (log(col("__t") + lit(alpha)) - log(col("__tsum") + aB)
          - (log(col("__r") + lit(alpha))) + log(col("__rsum") + aB)).as("w"))
  }

  /** Per-document importance log-weight of every raw document against the
    * target sample: (id, logw). Docs with no bigram features (≤ 1 token)
    * are absent — they carry no evidence either way.
    *
    * Scale: the weight table is ≤ B rows (size-gated broadcast); the doc
    * side shuffles (id, bucket) pairs once. The per-doc sum folds
    * bucket-sorted (cnt·w) contributions so the result is deterministic
    * under any partitioning. */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 1 << 13, alpha: Double = 0.5,
      hashKind: String = "xxhash64"): DataFrame = {
    // Two corpus scans, deliberately: the raw-distribution scan aggregates
    // straight to B buckets — partial aggregation collapses it to ≤ B rows
    // PER TASK map-side, so its shuffle is ~free — while the per-doc scan
    // shuffles (doc, bucket) pairs (unavoidable: that frame IS the score
    // input). Deriving the raw side from a materialized per-doc frame was
    // measured SLOWER at both scales (checkpoint write/read of the
    // corpus-sized frame > the cheap second scan): 13.4 vs 9.3 s at 20×.
    val db = docBucketCounts(raw, idCol, textCol, buckets, hashKind)
    val w = bucketLogRatios(raw, target, textCol, buckets, alpha, hashKind)
    db.join(Ops.broadcastIfSmall(w), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(
        struct(col("bucket"), (col("cnt") * col("w")).as("c")))).as("__cs"))
      .select(col(idCol),
        aggregate(col("__cs"), lit(0.0), (acc, x) => acc + x.getField("c"))
          .as("logw"))
  }
}
