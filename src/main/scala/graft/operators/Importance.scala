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

  /** Hashed feature bucket in [0, B). */
  def featureBucket(feature: Column, buckets: Int): Column =
    pmod(Dedup.md5Hash60(feature), lit(buckets.toLong))

  /** Word-bigram features of a text column: "w1 w2" strings over the
    * shared whitespace tokenizer (DSIR's hashed-ngram convention; bigrams
    * carry word-order signal unigram bags miss). Empty/1-token docs have
    * no features and receive no weight row. */
  def bigramsCol(text: Column): Column = {
    val toks = Dedup.tokensCol(text)
    // zip_with pads the shorter side with null → the dangling last element
    // is a lone token (concat_ws skips nulls); tokens never contain spaces,
    // so "has a space" keeps exactly the n−1 true bigrams. (slice length
    // must stay within Int range of start — start+length overflows on
    // MaxValue — so pass the array size.)
    filter(
      zip_with(toks, slice(toks, lit(2), size(toks)),
        (a, b) => concat_ws(" ", a, b)),
      p => p.contains(" "))
  }

  /** (doc, bucket, cnt) hashed-bigram counts — the per-document feature
    * vector in sparse form. */
  def docBucketCounts(df: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame =
    df.select(col(idCol), explode(bigramsCol(col(textCol))).as("__f"))
      .select(col(idCol), featureBucket(col("__f"), buckets).as("bucket"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("cnt"))

  /** (bucket, cnt) corpus feature counts — B-bounded output. */
  def bucketCounts(df: DataFrame, textCol: String, buckets: Int): DataFrame =
    df.select(explode(bigramsCol(col(textCol))).as("__f"))
      .select(featureBucket(col("__f"), buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Per-bucket log-likelihood ratios ln p̂_target(b) − ln p̂_raw(b) with
    * additive-α smoothing: (bucket, w), ≤ B rows. Written in the exact
    * operation order the SQL oracle replays:
    * ln(t+α) − ln(T+αB) − ln(r+α) + ln(R+αB). */
  def bucketLogRatios(raw: DataFrame, target: DataFrame, textCol: String,
      buckets: Int, alpha: Double): DataFrame = {
    require(alpha > 0.0, s"alpha must be > 0 (unsmoothed ratios diverge), got $alpha")
    val r = bucketCounts(raw, textCol, buckets).withColumnRenamed("cnt", "__r")
    val t = bucketCounts(target, textCol, buckets).withColumnRenamed("cnt", "__t")
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
      textCol: String, buckets: Int = 1 << 13, alpha: Double = 0.5): DataFrame = {
    val w = bucketLogRatios(raw, target, textCol, buckets, alpha)
    docBucketCounts(raw, idCol, textCol, buckets)
      .join(Ops.broadcastIfSmall(w), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(
        struct(col("bucket"), (col("cnt") * col("w")).as("c")))).as("__cs"))
      .select(col(idCol),
        aggregate(col("__cs"), lit(0.0), (acc, x) => acc + x.getField("c"))
          .as("logw"))
  }
}
