package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * Production pipelines sample by KEY HASH, not RNG: the decision for a row
  * depends only on its key, so samples are reproducible across runs,
  * engines, retries, and repartitioning, and the same key always lands in
  * (or out of) the sample — critical for train/eval splits that must not
  * leak. Spark's `sample()`/`sampleBy()` are seeded-RNG per partition and
  * change under repartitioning; these operators never do.
  *
  * Keep/drop is one codegen'd projection over the scan — no shuffle, no
  * state — and the md5-prefix hash (Dedup.md5Hash60) makes every decision
  * replayable in SQL engines for auditing.
  */
object Sampling {

  private val Buckets = 1000000L

  /** The row's sampling bucket in [0, 1e6): uniform in the key hash.
    * Null keys deterministically land in bucket 0 (kept by any non-zero
    * rate, always in the first fold) — a null hash would otherwise filter
    * such rows out of EVERY fold, silently breaking the disjoint-and-
    * exhaustive split contract. */
  def hashBucket(key: Column): Column =
    pmod(coalesce(Dedup.md5Hash60(key), lit(0L)), lit(Buckets))

  /** Keep ~`rate` of rows, decided by key hash (deterministic). */
  def hashSample(df: DataFrame, keyCol: String, rate: Double): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    df.filter(hashBucket(col(keyCol)) < lit((rate * Buckets).toLong))
  }

  /** Per-stratum rates (Spark sampleBy semantics, deterministically):
    * strata present in `rates` sample at their rate, others at
    * `defaultRate` (0.0 = drop, reference sampleBy behavior). */
  def stratifiedHashSample(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      "all rates must be in [0,1]")
    val threshold = rates.foldLeft(lit((defaultRate * Buckets).toLong): Column) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === lit(stratum), lit((rate * Buckets).toLong)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol)) < threshold)
  }

  /** Temperature-flattened source-mixing rates (the multilingual-LM
    * sampling convention): sampling a source s with probability ∝ n_s^τ
    * means each ROW of s is kept with rate ∝ n_s^(τ-1); τ = 1 is
    * natural proportions, τ → 0 uniform across sources. Rates are
    * normalized so the smallest source keeps `maxRate` (the per-row
    * rate is largest there) — everything else keeps less, so the mix is
    * achieved purely by downsampling. Driver action: ONE tiny
    * per-source count aggregate; the counts fold in sorted source
    * order, so the returned doubles are reproducible. */
  def temperatureMixRates(
      df: DataFrame,
      sourceCol: String,
      tau: Double,
      maxRate: Double = 1.0): Map[String, Double] = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0,1], got $tau")
    require(maxRate > 0.0 && maxRate <= 1.0, s"maxRate must be in (0,1], got $maxRate")
    val counts = df.groupBy(sourceCol).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.get(0).toString, r.getLong(1))).sortBy(_._1)
    require(counts.nonEmpty, "no sources to mix")
    val nMin = counts.map(_._2).min.toDouble
    counts.map { case (s, n) =>
      s -> maxRate * math.pow(n / nMin, tau - 1.0)
    }.toMap
  }

  /** Deterministic temperature mix: computes [[temperatureMixRates]] and
    * applies them via [[stratifiedHashSample]] — reproducible,
    * partition-invariant, no RNG; sources absent from the rate map (none,
    * by construction) would drop. */
  def temperatureMix(
      df: DataFrame,
      sourceCol: String,
      keyCol: String,
      tau: Double,
      maxRate: Double = 1.0): DataFrame =
    stratifiedHashSample(df, sourceCol, keyCol,
      temperatureMixRates(df, sourceCol, tau, maxRate), defaultRate = 0.0)

  /** Quality-ranked token-budget selection: keep the best-scoring
    * documents (score desc, ties to the smaller id) whose cumulative
    * token count stays ≤ `budget` — "give me the top-quality 10B tokens"
    * of a curation pipeline. Returns (id, score, ntok, cum_tok), ordered
    * semantics only (no physical order guarantee).
    *
    * Scale shape — a budget selection IS a global sort plus a running
    * sum, done in the distributed idiom rather than a one-partition
    * window:
    *  1. range-repartition by (score desc, id) — the same exchange a
    *     global orderBy pays, and the only corpus-wide shuffle here;
    *  2. per-range token sums collect to the driver (one row per
    *     partition) and prefix-sum into per-range offsets;
    *  3. ranges whose offset already exceeds the budget are PRUNED —
    *     the second pass shuffles only budget-proportional rows, never
    *     the corpus tail;
    *  4. surviving ranges cumsum locally (window partitioned per range)
    *     and add their offset.
    * The kept set is invariant to the number/placement of range
    * boundaries (each row's global prefix sum is partition-independent),
    * spec-proven by re-running under different partition counts. */
  def selectByTokenBudget(df: DataFrame, idCol: String, ntokCol: String,
      scoreCol: String, budget: Long, partitions: Int = 0): DataFrame = {
    require(budget >= 0L, s"budget must be >= 0, got $budget")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    // LAZY localCheckpoint freezes the range partitioning: the range
    // exchange picks boundaries from an rdd.id-seeded reservoir sample, so
    // re-executing the shuffle (sums pass vs. main pass) can land rows in
    // DIFFERENT ranges once partitions exceed the sample size — the
    // per-range offsets would then be wrong. The sums collect below
    // materializes the checkpoint once; every later pass reads the frozen
    // partitions. Spec-pinned with a tiny rangeExchange sample size.
    val ranked = df
      .select(col(idCol), col(scoreCol), col(ntokCol).cast("long").as(ntokCol))
      .repartitionByRange(p, col(scoreCol).desc, col(idCol).asc)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    val sums = ranked.groupBy("__pid").agg(sum(col(ntokCol)).as("__s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    if (sums.isEmpty) return ranked.drop("__pid")
      .withColumn("cum_tok", lit(0L)).limit(0)
    val offsets: Map[Int, Long] = sums.map(_._1)
      .zip(sums.scanLeft(0L)(_ + _._2).dropRight(1)).toMap
    val keepPids = offsets.collect { case (pid, off) if off <= budget => pid }.toSeq
    ranked.filter(col("__pid").isInCollection(keepPids))
      .withColumn("cum_tok",
        sum(col(ntokCol)).over(
          Window.partitionBy("__pid").orderBy(col(scoreCol).desc, col(idCol).asc)) +
        element_at(typedLit(offsets), col("__pid")))
      .filter(col("cum_tok") <= budget)
      .select(col(idCol), col(scoreCol), col(ntokCol), col("cum_tok"))
  }

  /** Keep the top `frac` of rows by score (exact, deterministic): rank by
    * (score desc, id asc) and keep the first ⌈frac·n⌉ — the percentile
    * filter of a curation pipeline ("drop the bottom 10% by quality"),
    * exact where `percentile_approx` is not. Implemented as
    * [[selectByTokenBudget]] with unit weights: the kept COUNT is a
    * cumulative sum of ones, so the same range-repartition + pruned
    * second pass applies — cost is one global-sort exchange plus a
    * keep-proportional pass, at any corpus size. */
  def topFractionByScore(df: DataFrame, idCol: String, scoreCol: String,
      frac: Double, partitions: Int = 0): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, s"frac must be in [0,1], got $frac")
    val k = math.ceil(df.count() * frac).toLong
    selectByTokenBudget(df.withColumn("__one", lit(1L)), idCol, "__one",
        scoreCol, budget = k, partitions = partitions)
      .select(col(idCol), col(scoreCol), col("cum_tok").as("rank"))
  }

  /** Deterministic equal-token sharding: assign each document a
    * `shard_id` so every shard holds ~`targetTokens` tokens of
    * consecutive (by `idCol`) documents — the training-shard packing
    * step before writing a corpus out for dataloaders.
    * `shard_id = exclusive-prefix-sum(ntok) ÷ targetTokens`, so shard
    * boundaries are a pure function of the data: stable across runs,
    * engines, and partitioning. Returns (id, ntok, shard_id).
    *
    * Same distributed-cumsum idiom as [[selectByTokenBudget]] (range
    * repartition = the one corpus-wide exchange; per-range sums drive
    * driver-side prefix offsets; local window cumsum) — but with no
    * budget there is nothing to prune: every range computes its local
    * cumsum, which is the irreducible full-corpus pass. */
  def assignTokenShards(df: DataFrame, idCol: String, ntokCol: String,
      targetTokens: Long, partitions: Int = 0): DataFrame = {
    require(targetTokens > 0L, s"targetTokens must be > 0, got $targetTokens")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    // lazy checkpoint for the same range-boundary determinism reasons as
    // [[selectByTokenBudget]] (rdd.id-seeded sampling — see there)
    val ranked = df
      .select(col(idCol), col(ntokCol).cast("long").as(ntokCol))
      .repartitionByRange(p, col(idCol).asc)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    val sums = ranked.groupBy("__pid").agg(sum(col(ntokCol)).as("__s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    if (sums.isEmpty) return ranked.drop("__pid")
      .withColumn("shard_id", lit(0L)).limit(0)
    val offsets: Map[Int, Long] = sums.map(_._1)
      .zip(sums.scanLeft(0L)(_ + _._2).dropRight(1)).toMap
    ranked
      .withColumn("__excl",
        sum(col(ntokCol)).over(Window.partitionBy("__pid").orderBy(col(idCol).asc)) -
        col(ntokCol) + element_at(typedLit(offsets), col("__pid")))
      .select(col(idCol), col(ntokCol),
        expr(s"__excl DIV ${targetTokens}L").as("shard_id"))
  }

  /** Per-group percentile filter: keep the top ⌈frac·n_g⌉ rows of EACH
    * group by (score desc, id asc) — "keep the best 30% of every source"
    * (per-domain quality filtering; a single global cut would let a
    * high-quality source crowd the others out entirely). Returns
    * (group, id, score, rank) where rank is 1-based within the group.
    *
    * Scale shape — the naive formulation is a rank window partitioned by
    * group, which serializes each group through ONE task (a 100 TB corpus
    * with 20 sources → 20 tasks); instead, the [[selectByTokenBudget]]
    * distributed-cumsum idiom generalized per group:
    *  1. ONE range exchange by (group, score desc, id) — frozen via lazy
    *     localCheckpoint for the same boundary-determinism reasons;
    *  2. per-(range, group) counts collect to the driver — ranges ×
    *     groups rows, driver-small while group cardinality is
    *     source/domain-like (the operator's contract; it REQUIREs
    *     ≤ 100k groups rather than silently collecting more);
    *  3. per-group prefix offsets over ranges; ranges where every
    *     present group is already past its budget are PRUNED;
    *  4. surviving ranges rank locally (window per (range, group)) and
    *     add the offset — the group budget check is a broadcast join of
    *     the tiny (group, offset-per-range, budget) frame.
    * Kept set is partition-invariant (spec-proven under 1/3/17
    * partitions). */
  def topFractionPerGroup(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, frac: Double, partitions: Int = 0): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, s"frac must be in [0,1], got $frac")
    rankPerGroupCore(df, groupCol, idCol, scoreCol,
      total => math.ceil(total * frac).toLong, partitions)
  }

  /** Keep the top `k` rows of EACH group by (score desc, id asc) — the
    * count form of [[topFractionPerGroup]] ("keep the 1M best docs of
    * every source"), same distributed per-(range, group) cumsum shape,
    * same ≤100k-group contract. Returns (group, id, score, rank). */
  def topKPerGroup(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, k: Long, partitions: Int = 0): DataFrame = {
    require(k >= 0L, s"k must be >= 0, got $k")
    rankPerGroupCore(df, groupCol, idCol, scoreCol, _ => k, partitions)
  }

  private def rankPerGroupCore(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, budgetOf: Long => Long, partitions: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val ranked = df
      .select(col(groupCol), col(idCol), col(scoreCol))
      .repartitionByRange(p, col(groupCol).asc, col(scoreCol).desc, col(idCol).asc)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    val counts = ranked.groupBy("__pid", groupCol).agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getInt(0), r.get(1), r.getLong(2)))
    require(counts.map(_._2).distinct.size <= 100000,
      s"rankPerGroup saw ${counts.map(_._2).distinct.size} groups — " +
        "group cardinality must be source/domain-like (<= 100k); " +
        "use topFractionByScore or a pre-aggregation for high-cardinality keys")
    if (counts.isEmpty) return ranked.drop("__pid")
      .withColumn("rank", lit(0L)).limit(0)
    // per-group: budget = ceil(frac · n_g); offset per pid = rows of the
    // group in EARLIER pids (ranges are ordered by pid within a group)
    val byGroup = counts.groupBy(_._2)
    val rows = byGroup.iterator.flatMap { case (g, cs) =>
      val sorted = cs.sortBy(_._1)
      val total = sorted.map(_._3).sum
      val budget = budgetOf(total)
      sorted.map(_._1).zip(sorted.scanLeft(0L)(_ + _._3).dropRight(1))
        .map { case (pid, off) => (pid, g, off, budget) }
    }.toSeq
    val keepPids = rows.collect { case (pid, _, off, budget) if off < budget => pid }.toSet
    val offsets = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2, r._3, r._4)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__opid",
          org.apache.spark.sql.types.IntegerType),
        ranked.schema(groupCol).copy(name = "__g"),
        org.apache.spark.sql.types.StructField("__off",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("__budget",
          org.apache.spark.sql.types.LongType))))
    ranked.filter(col("__pid").isInCollection(keepPids))
      .join(broadcast(offsets),
        col("__pid") === col("__opid") && col(groupCol) === col("__g"))
      .drop("__opid", "__g")
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("__pid"), col(groupCol))
          .orderBy(col(scoreCol).desc, col(idCol).asc)).cast("long") + col("__off"))
      .filter(col("rank") <= col("__budget"))
      .select(col(groupCol), col(idCol), col(scoreCol), col("rank"))
  }

  /** Per-group percentile-rank normalization: every row's score becomes
    * its percentile within its own group — `pct = (pos − 1) / (n_g − 1)`
    * in [0, 1], 0 = the group's best under (score desc, id asc) — the
    * calibration step before cross-source thresholding ("drop below the
    * 80th percentile OF EACH SOURCE"; raw score cuts would judge every
    * source on the dominant source's scale). Positions are row_number
    * semantics with ties broken by id (deterministic and replayable),
    * not rank-with-gaps. Singleton groups get pct 0. Same scale shape as
    * [[topFractionPerGroup]] (it IS that machinery at frac = 1 plus a
    * group-size join — group sizes are group-cardinality-small and
    * broadcast size-gated). */
  def percentRankPerGroup(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, partitions: Int = 0): DataFrame = {
    val ranked = topFractionPerGroup(df, groupCol, idCol, scoreCol,
      frac = 1.0, partitions = partitions)
    val sizes = ranked.groupBy(groupCol).agg(count(lit(1)).as("__n"))
    ranked.join(Ops.broadcastIfSmall(sizes), Seq(groupCol))
      .withColumn("pct",
        when(col("__n") === 1, lit(0.0))
          .otherwise((col("rank") - 1).cast("double") / (col("__n") - 1)))
      .drop("__n")
  }

  /** Exact-k deterministic uniform sample of EACH group: rank the group's
    * rows by a keyed hash and keep the first `k` — "1000 random docs from
    * every source" for eval sets and manual audits, where a RATE sample
    * ([[stratifiedHashSample]]) cannot promise an exact count and
    * Spark's RNG `sampleBy` changes under repartitioning. The picked set
    * is a pure function of (id, seed): reproducible across runs/engines,
    * re-seedable for a fresh draw. Returns (group, id, pick) with pick
    * the 1-based draw order within the group.
    *
    * Scale shape: [[topKPerGroup]]'s distributed per-(range, group)
    * rank machinery with hash-ascending order — one range exchange,
    * ranges past every group's k PRUNED before the second pass (for
    * k ≪ n_g that prunes almost everything); never a one-task-per-group
    * window. Same ≤100k-group contract. */
  def sampleKPerGroup(df: DataFrame, groupCol: String, idCol: String,
      k: Long, seed: Long = 0L, partitions: Int = 0): DataFrame = {
    // rankPerGroupCore orders (score DESC, id ASC); negate the hash so
    // descending negated-hash = ascending hash (h < 2^60, negation-safe)
    val withH = df.withColumn("__negh",
      -Dedup.md5Hash60(concat(col(idCol).cast("string"), lit(":"), lit(seed))))
    topKPerGroup(withH, groupCol, idCol, "__negh", k, partitions)
      .select(col(groupCol), col(idCol), col("rank").as("pick"))
  }

  /** Weighted sample of `k` rows without replacement by PRIORITY SAMPLING
    * (Duffield–Lund–Thorup, JACM 2007): each row draws a deterministic
    * uniform u = (h60(id:seed)+1)/2^60 ∈ (0, 1], gets priority w/u, and
    * the k largest priorities win — inclusion probability ≈ min(1, w/τ),
    * so heavy rows (long docs, hot domains) are overrepresented exactly
    * as importance sampling wants, and the (k+1)-th priority τ yields the
    * unbiased total-weight estimator ŵ = max(w, τ) (Σŵ over the sample
    * estimates Σw over the corpus — the subsample carries its own
    * calibration). No RNG: the sample is a pure function of (ids, seed),
    * stable across runs/engines/partitioning, and every arithmetic step
    * (long→double round, one division per row) is IEEE-correctly-rounded
    * identically in external SQL engines, so the gate replays it exactly.
    *
    * Scale shape: priorities are a pure projection over the scan; the
    * top-(k+1) is `orderBy.limit` = TakeOrderedAndProject (per-partition
    * heaps of k+1, driver merge — no global sort); τ and ranks then
    * compute on a ≤(k+1)-row frame. Returns (id, w, priority, est_w). */
  def prioritySampleK(df: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: Long = 0L): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    import org.apache.spark.sql.expressions.Window
    val u = (Dedup.md5Hash60(concat(col(idCol).cast("string"), lit(":"), lit(seed))) + 1)
      .cast("double") / lit(1.152921504606846976e18) // 2^60: exact double
    val pr = df
      .select(col(idCol), col(weightCol).cast("double").as("w"))
      .withColumn("priority", col("w") / u)
      .orderBy(col("priority").desc, col(idCol).asc)
      .limit(k + 1)
    // τ = the (k+1)-th priority if the corpus has more than k rows, else 0
    // (sample is exhaustive → ŵ = w). The frame here is ≤ k+1 rows, so the
    // unpartitioned windows are driver-bounded by construction.
    val all = Window.partitionBy(lit(1))
    val ord = Window.partitionBy(lit(1))
      .orderBy(col("priority").desc, col(idCol).asc)
    pr.withColumn("__rn", row_number().over(ord))
      .withColumn("__tau",
        when(count(lit(1)).over(all) === k + 1,
          min(col("priority")).over(all)).otherwise(lit(0.0)))
      .filter(col("__rn") <= k)
      .withColumn("est_w", greatest(col("w"), col("__tau")))
      .drop("__rn", "__tau")
  }

  /** Weighted sample of `k` rows per GROUP without replacement —
    * [[prioritySampleK]]'s per-group form, filling the last cell of the
    * sampling matrix (uniform global = hashSample, uniform per group =
    * sampleKPerGroup, weighted global = prioritySampleK): "1000 docs per
    * source ∝ token mass" with the same Duffield–Lund–Thorup unbiased
    * ŵ = max(w, τ_g) estimator, τ_g the group's (k+1)-th priority.
    *
    * Shape: the priority projection is pure; ranking rides
    * [[topKPerGroup]]'s range-pruned per-(range, group) machinery asked
    * for k+1 rows (never a one-task-per-group window); τ and the
    * estimator then compute on the (groups·(k+1))-bounded kept frame.
    * Same ≤100k-group contract and (id, seed) determinism as the rest of
    * the family. Returns (group, id, w, pick, est_w). */
  def weightedSamplePerGroup(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, k: Int, seed: Long = 0L,
      partitions: Int = 0): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    import org.apache.spark.sql.expressions.Window
    val u = (Dedup.md5Hash60(concat(col(idCol).cast("string"), lit(":"),
      lit(seed))) + 1).cast("double") / lit(1.152921504606846976e18)
    val pr = df
      .select(col(groupCol), col(idCol), col(weightCol).cast("double").as("__w"))
      .withColumn("__priority", col("__w") / u)
    val kept = topKPerGroup(
      pr.select(col(groupCol), col(idCol), col("__priority")),
      groupCol, idCol, "__priority", k + 1L, partitions)
    val wG = Window.partitionBy(groupCol)
    kept
      .join(pr.select(col(groupCol), col(idCol), col("__w")),
        Seq(groupCol, idCol))
      .withColumn("__gcnt", count(lit(1)).over(wG))
      .withColumn("__tau",
        when(col("__gcnt") === k + 1, min(col("__priority")).over(wG))
          .otherwise(lit(0.0)))
      .filter(col("rank") <= k)
      .select(col(groupCol), col(idCol), col("__w").as("w"),
        col("rank").as("pick"),
        greatest(col("__w"), col("__tau")).as("est_w"))
  }

  /** EXACT weighted quantiles: the q-quantile is the score of the FIRST
    * row (score asc, id asc) whose inclusive cumulative WEIGHT reaches
    * q·W — "the median quality BY TOKEN MASS", which is what a corpus
    * budget actually experiences (doc-count quantiles over-weight short
    * docs). The crossing row is selected exactly: cum ≥ t AND
    * cum − w < t (weights ≥ 0; zero-weight rows are never crossings).
    * t = q·W is one double product and the comparisons promote exact
    * integers, so external engines replay every pick. Returns
    * (q, value, cum_weight).
    *
    * Scale shape — the [[selectByTokenBudget]] idiom: ONE range exchange
    * by (score asc, id asc) with frozen boundaries, per-range weight
    * sums to the driver, and only the ranges containing a crossing
    * survive to the local-cumsum pass — ≤ |qs| ranges however large the
    * corpus. */
  def weightedQuantiles(df: DataFrame, idCol: String, scoreCol: String,
      weightCol: String, qs: Seq[Double], partitions: Int = 0): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "qs must be non-empty quantiles in (0,1] (q=0 has no crossing row)")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val ranked = df
      .select(col(idCol), col(scoreCol), col(weightCol).cast("long").as("__w"))
      .repartitionByRange(p, col(scoreCol).asc, col(idCol).asc)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    val sums = ranked.groupBy("__pid").agg(sum(col("__w")).as("__s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    if (sums.isEmpty) return ranked
      .select(lit(0.0).as("q"), col(scoreCol).as("value"),
        lit(0L).as("cum_weight")).limit(0)
    val total = sums.map(_._2).sum
    require(total > 0L, "weightedQuantiles needs positive total weight")
    val offsets = sums.map(_._1).zip(sums.scanLeft(0L)(_ + _._2).dropRight(1))
    // each q's crossing lies in exactly ONE range: the first whose
    // exclusive prefix is below t and whose inclusive prefix reaches it
    // (a zero-weight range can never satisfy o < t <= o+s)
    val targetRows = qs.map { q =>
      val t = q * total
      val (pid, off) = offsets.zip(sums.map(_._2))
        .collectFirst { case ((pd, o), s) if o < t && o + s >= t => (pd, o) }.get
      (pid, q, t, off)
    }
    val keepPids = targetRows.map(_._1).toSet
    val targets = spark.createDataFrame(
      spark.sparkContext.parallelize(targetRows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2, r._3, r._4)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__tpid",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("q",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("__t",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("__off",
          org.apache.spark.sql.types.LongType))))
    ranked.filter(col("__pid").isInCollection(keepPids))
      .withColumn("__cum",
        sum(col("__w")).over(Window.partitionBy("__pid")
          .orderBy(col(scoreCol).asc, col(idCol).asc)) )
      .join(broadcast(targets), col("__pid") === col("__tpid"))
      .filter((col("__cum") + col("__off")) >= col("__t") &&
        (col("__cum") + col("__off") - col("__w")) < col("__t"))
      .select(col("q"), col(scoreCol).as("value"),
        (col("__cum") + col("__off")).as("cum_weight"))
  }

  /** [[weightedQuantiles]] per group: the crossing row of each group's
    * own cumulative weight — "median length by token mass PER SOURCE".
    * Same crossing semantics and replayability; the per-(range, group)
    * machinery of the rank family, with only crossing ranges surviving
    * (≤ groups×qs) and the same ≤100k-group contract. Groups with zero
    * total weight emit no rows. Returns (group, q, value, cum_weight). */
  def weightedQuantilesPerGroup(df: DataFrame, groupCol: String,
      idCol: String, scoreCol: String, weightCol: String, qs: Seq[Double],
      partitions: Int = 0): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "qs must be non-empty quantiles in (0,1]")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val ranked = df
      .select(col(groupCol), col(idCol), col(scoreCol),
        col(weightCol).cast("long").as("__w"))
      .repartitionByRange(p, col(groupCol).asc, col(scoreCol).asc, col(idCol).asc)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    val sums = ranked.groupBy("__pid", groupCol).agg(sum(col("__w")).as("__s"))
      .collect().map(r => (r.getInt(0), r.get(1), r.getLong(2)))
    require(sums.map(_._2).distinct.size <= 100000,
      "weightedQuantilesPerGroup requires source/domain-like group " +
        "cardinality (<= 100k groups)")
    if (sums.isEmpty) return ranked
      .select(col(groupCol), lit(0.0).as("q"), col(scoreCol).as("value"),
        lit(0L).as("cum_weight")).limit(0)
    val targetRows = sums.groupBy(_._2).iterator.flatMap { case (g, cs) =>
      val sorted = cs.sortBy(_._1)
      val total = sorted.map(_._3).sum
      if (total <= 0L) Seq.empty
      else {
        val offsets = sorted.map(_._1).zip(sorted.scanLeft(0L)(_ + _._3).dropRight(1))
        qs.map { q =>
          val t = q * total
          val (pid, off) = offsets.zip(sorted.map(_._3))
            .collectFirst { case ((pd, o), s) if o < t && o + s >= t => (pd, o) }.get
          (pid, g, q, t, off)
        }
      }
    }.toSeq
    val keepPids = targetRows.map(_._1).toSet
    val targets = spark.createDataFrame(
      spark.sparkContext.parallelize(targetRows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2, r._3, r._4, r._5)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__tpid",
          org.apache.spark.sql.types.IntegerType),
        ranked.schema(groupCol).copy(name = "__g"),
        org.apache.spark.sql.types.StructField("q",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("__t",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("__off",
          org.apache.spark.sql.types.LongType))))
    ranked.filter(col("__pid").isInCollection(keepPids))
      .withColumn("__cum",
        sum(col("__w")).over(Window.partitionBy(col("__pid"), col(groupCol))
          .orderBy(col(scoreCol).asc, col(idCol).asc)))
      .join(broadcast(targets),
        col("__pid") === col("__tpid") && col(groupCol) === col("__g"))
      .filter((col("__cum") + col("__off")) >= col("__t") &&
        (col("__cum") + col("__off") - col("__w")) < col("__t"))
      .select(col(groupCol), col("q"), col(scoreCol).as("value"),
        (col("__cum") + col("__off")).as("cum_weight"))
  }

  /** Distributed global row-number: 1-based position of every row under
    * `sortCols` — the scalable form of `row_number() OVER (ORDER BY …)`,
    * which Spark executes as a ONE-partition window. Same idiom as
    * [[selectByTokenBudget]]: one range exchange (what any global sort
    * pays), per-range counts → driver prefix offsets, local window +
    * offset. Ties must be broken by the caller's sortCols (include a
    * unique id last) or positions are nondeterministic. */
  /** Dataset-mixture plan: given target mixture WEIGHTS and a total
    * token BUDGET, how many tokens each source must contribute and how
    * many epochs (repeats) of it that means — the planning table behind
    * every "books 30% / web 60% / code 10%" run, and the place where
    * over-asked sources get caught BEFORE training (a source whose
    * allocation needs more than `maxRepeat` epochs caps there and the
    * shortfall is reported, the Chinchilla-style repeat-budget
    * discipline). One token-count scan per the shared tokenizer; the
    * plan arithmetic is source-frame-sized exact rationals with fixed
    * parenthesization. Returns one row per target source:
    * (source, tokens_have, weight, tokens_target, repeats, capped,
    * tokens_planned). */
  def mixturePlan(df: DataFrame, sourceCol: String, textCol: String,
      weights: Map[String, Double], budgetTokens: Long,
      maxRepeat: Double = 4.0): DataFrame = {
    require(weights.nonEmpty, "empty mixture")
    require(weights.values.forall(_ > 0.0), "weights must be > 0")
    require(math.abs(weights.values.sum - 1.0) < 1e-9,
      s"weights must sum to 1, got ${weights.values.sum}")
    require(budgetTokens > 0L && maxRepeat > 0.0,
      "budget and maxRepeat must be positive")
    val have = df
      .filter(col(sourceCol).cast("string")
        .isin(weights.keys.toSeq: _*) &&
        length(trim(col(textCol))) > 0)
      .select(col(sourceCol).cast("string").as("source"),
        size(graft.operators.Dedup.tokensCol(col(textCol))).cast("long")
          .as("__n"))
      .groupBy("source").agg(sum("__n").as("tokens_have"))
    val weightCol = weights.toSeq.sortBy(_._1)
      .foldLeft(lit(Double.NaN): Column) { case (acc, (s, w)) =>
        when(col("source") === s, lit(w)).otherwise(acc)
      }
    val target = col("weight") * lit(budgetTokens.toDouble)
    val rawRepeat = target / col("tokens_have").cast("double")
    have.withColumn("weight", weightCol)
      .withColumn("tokens_target", target)
      .withColumn("capped", rawRepeat > lit(maxRepeat))
      .withColumn("repeats",
        when(col("capped"), lit(maxRepeat)).otherwise(rawRepeat))
      .withColumn("tokens_planned",
        col("repeats") * col("tokens_have").cast("double"))
      .select("source", "tokens_have", "weight", "tokens_target",
        "repeats", "capped", "tokens_planned")
  }

  /** EXACT-count stratified sample: exactly k rows per stratum (not a
    * rate — an eval set wants "100 eval docs per language", and a hash
    * RATE delivers 100 ± binomial noise). Rows rank by their md5-60 key
    * hash within the stratum (a deterministic uniform permutation — no
    * RNG state, engines replay it) and the top k survive, via the pruned
    * per-(range, group) rank core — never a corpus-wide per-group
    * window. Strata with < k rows keep everything. ≤ 100k strata (the
    * rank-core contract). Ties: the hash is collision-free per key for
    * practical purposes, and the rank orders (hash desc, id asc) so even
    * a collision resolves deterministically. Returns the selected rows'
    * (stratum, id, rank). */
  def exactStratifiedSample(df: DataFrame, strataCol: String,
      keyCol: String, k: Long): DataFrame = {
    require(k >= 1L, s"k must be >= 1, got $k")
    topKPerGroup(
      df.select(col(strataCol), col(keyCol))
        .withColumn("__h", hashBucket(col(keyCol))),
      strataCol, keyCol, "__h", k)
      .select(col(strataCol), col(keyCol), col("rank"))
  }

  /** Distribution-matching downsample: the LARGEST deterministic subset
    * whose strata follow the target proportions — "make the corpus 40% en
    * / 20% de / 20% fr / 20% es" without hand-deriving per-language
    * rates. From one stratum-count scan the driver solves the LP in
    * closed form: the binding stratum is the one scarcest relative to
    * its target (c = min_s n_s/(t_s·N)), it keeps (almost) everything,
    * and every other stratum downsamples to rate_s = c·t_s·N/n_s —
    * any larger output would violate some proportion. Acceptance is the
    * [[hashBucket]] coin (pure function of the key), so the sample is
    * reproducible and engines replay it exactly: thresholds are
    * floor(rate·1e6) longs computed with a FIXED parenthesization that
    * the oracle mirrors. Strata outside the target drop entirely; every
    * target stratum must be present (an absent stratum makes the target
    * unsatisfiable — fail loudly rather than return empty). Proportions
    * are exact in expectation; realized counts wobble within binomial
    * noise like every hash sample. */
  def matchDistribution(df: DataFrame, strataCol: String, keyCol: String,
      target: Map[String, Double]): DataFrame = {
    require(target.nonEmpty, "empty target")
    require(target.values.forall(t => t > 0.0), "target proportions must be > 0")
    require(math.abs(target.values.sum - 1.0) < 1e-9,
      s"target proportions must sum to 1, got ${target.values.sum}")
    val counts = df
      .filter(col(strataCol).cast("string").isin(target.keys.toSeq: _*))
      .groupBy(col(strataCol).cast("string").as("__s"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = target.keys.filter(s => counts.getOrElse(s, 0L) == 0L)
    require(missing.isEmpty,
      s"target strata absent from the data: ${missing.mkString(", ")}")
    val ntD = counts.values.sum.toDouble
    val c = target.map { case (s, t) => counts(s).toDouble / (t * ntD) }.min
    val thr: Map[String, Long] = target.map { case (s, t) =>
      s -> math.floor(((c * t) * ntD) / counts(s).toDouble * 1000000.0).toLong
    }
    val thrCol = target.keys.toSeq.sorted.foldLeft(lit(0L): Column) {
      (acc, s) => when(col(strataCol).cast("string") === s, lit(thr(s)))
        .otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol)) < thrCol)
  }

  /** Deterministic in-corpus negative sampling for contrastive training:
    * for every query, k corpus items that are NOT the query and NOT one
    * of its positives — the data a bi-encoder/embedding trainer consumes
    * by the billion, reproducible across reruns and engines because every
    * draw is a pure function of (query, slot, salt). Draw slot s maps to
    * corpus position md5-60(q:s:salt) mod n over the [[globalRowNumber]]
    * dense index (uniform over the corpus, no RNG state); k·overDraw
    * slots are drawn so that collision/self/positive rejections still
    * leave ≥ k survivors with overwhelming probability (shortfall is
    * possible only when positives+draws approach the corpus size — the
    * caller sees fewer rows, never wrong rows). Survivors dedup to the
    * smallest slot per (q, candidate), then rank by (slot, id) and keep
    * k. Scale shape: draws are queries×(k·overDraw) rows joined to the
    * key-only (position, id) index — one equi-join, no per-query corpus
    * work; the final rank window partitions by query over ≤ k·overDraw
    * rows each. Queries and corpus ids must share an id space (the
    * exclusion list is (q, positive) ∪ (q, q)). Returns
    * (q, neg_id, slot, rank). */
  def negativeSamples(corpus: DataFrame, idCol: String,
      positives: DataFrame, qCol: String, posCol: String, k: Int,
      overDraw: Int = 3, salt: String = "neg"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(overDraw >= 1, s"overDraw must be >= 1, got $overDraw")
    import org.apache.spark.sql.expressions.Window
    val idx = globalRowNumber(
        corpus.select(col(idCol).as("__cid")).distinct(),
        "__rn", col("__cid").asc)
      .localCheckpoint(false)
    val nFrame = idx.agg(count(lit(1)).as("__n"))
    val draws = positives.select(col(qCol).as("__q")).distinct()
      .crossJoin(broadcast(nFrame))
      .select(col("__q"), col("__n"),
        explode(sequence(lit(0), lit(k * overDraw - 1))).as("slot"))
      .withColumn("__pos", pmod(Dedup.md5Hash60(
        concat(col("__q").cast("string"), lit(":"),
          col("slot").cast("string"), lit(":" + salt))), col("__n")))
    val excl = positives
      .select(col(qCol).as("__q"), col(posCol).as("neg_id"))
      .unionByName(positives.select(col(qCol).as("__q"),
        col(qCol).as("neg_id")))
      .distinct()
    draws.join(idx, draws("__pos") === idx("__rn") - lit(1L))
      .groupBy(col("__q"), col("__cid").as("neg_id"))
      .agg(min("slot").as("slot"))
      .join(excl, Seq("__q", "neg_id"), "left_anti")
      .withColumn("rank", row_number().over(
        Window.partitionBy("__q")
          .orderBy(col("slot").asc, col("neg_id").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select(col("__q").as("q"), col("neg_id"), col("slot"), col("rank"))
  }

  /** Neyman allocation: how many samples to draw from EACH stratum for a
    * fixed total budget — n_h ∝ N_h·σ_h (big and noisy strata get more;
    * uniform-rate sampling over-samples homogeneous sources and starves
    * variable ones). The sampling-DESIGN report that q100/q250's
    * per-group samplers consume.
    *
    * Scale shape: one scan aggregates per-stratum exact sufficient
    * statistics — count and Σv as plain longs on micro-scaled integers,
    * Σv² as DECIMAL(38,0) (per-row v² fits a long; the corpus sum does
    * not — decimal sums are exact and order-independent, the q229
    * HUGEINT convention). σ and the allocation are then doubles computed
    * from exact integers with fixed parenthesization over the
    * strata-cardinality frame (no det/prod split — nothing folds).
    * Single-row strata get σ = 0 (no within-stratum evidence), zero
    * weight. `alloc` is the real-valued Neyman share (round/ceil is the
    * caller's integerization policy). Returns
    * (stratum, n_rows, std, weight, alloc). */
  def neymanAllocation(df: DataFrame, strataCol: String, valueCol: String,
      totalN: Long, microScale: Long = 1000000L): DataFrame = {
    require(totalN >= 0L, s"totalN must be >= 0, got $totalN")
    require(microScale >= 1L, s"microScale must be >= 1, got $microScale")
    val v = round(col(valueCol) * lit(microScale.toDouble)).cast("long")
    val stats = df.select(col(strataCol).as("stratum"), v.as("__v"))
      .groupBy("stratum")
      .agg(count(lit(1)).as("n_rows"), sum("__v").as("__sv"),
        sum((col("__v").cast("decimal(19,0)") *
          col("__v").cast("decimal(19,0)")).cast("decimal(38,0)"))
          .as("__ss"))
    val nD = col("n_rows").cast("double")
    val svD = col("__sv").cast("double")
    val ssD = col("__ss").cast("double")
    val varMicro = when(col("n_rows") > 1,
      ((nD * ssD) - (svD * svD)) / (nD * (col("n_rows") - 1).cast("double")))
      .otherwise(lit(0.0))
    val withStd = stats
      .withColumn("std", sqrt(varMicro) / lit(microScale.toDouble))
      .withColumn("weight", nD * col("std"))
      .localCheckpoint(true)
    val wsum = withStd.agg(sum("weight")).first().getDouble(0)
    withStd.select(col("stratum"), col("n_rows"), col("std"),
      col("weight"),
      (when(lit(wsum) > 0.0, (lit(totalN.toDouble) * col("weight")) / lit(wsum))
        .otherwise(lit(0.0))).as("alloc"))
  }

  def globalRowNumber(df: DataFrame, outCol: String, sortCols: Column*): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    // lazy checkpoint freezes range boundaries (rdd.id-seeded sampling —
    // see selectByTokenBudget)
    val ranked = df
      .repartitionByRange(p, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    val counts = ranked.groupBy("__pid").agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    if (counts.isEmpty)
      return df.withColumn(outCol, lit(0L)).limit(0)
    val offsets: Map[Int, Long] = counts.map(_._1)
      .zip(counts.scanLeft(0L)(_ + _._2).dropRight(1)).toMap
    ranked
      .withColumn(outCol,
        row_number().over(Window.partitionBy("__pid").orderBy(sortCols: _*)).cast("long") +
          element_at(typedLit(offsets), col("__pid")))
      .drop("__pid")
  }

  /** Equal-frequency (quantile) binning: every row gets the bucket
    * `((rank − 1) · bins) div n` of its global (value, id) rank —
    * equal-POPULATION buckets where [[Profiling.histogram]]'s
    * equal-WIDTH bins leave skewed columns with a handful of hot bins.
    * The feature-discretization primitive (decile features, balanced
    * stratification keys). Returns the per-bucket summary
    * (bucket, cnt, lo, hi); integer arithmetic end-to-end — no
    * double-boundary parity risk anywhere.
    *
    * Shape: [[globalRowNumber]]'s one range exchange + driver offsets,
    * then a bins-sized aggregate. */
  def quantileBins(df: DataFrame, idCol: String, valueCol: String,
      bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val ranked = globalRowNumber(
      df.select(col(idCol).as("__id"), col(valueCol).cast("double").as("__v")),
      "__rank", col("__v").asc, col("__id").asc)
      .localCheckpoint(false)
    val n = ranked.count()
    require(n > 0, "no rows to bin")
    ranked
      // integer `div`, never double `/`: a quotient one ulp below an
      // integer would round up and misplace the boundary row
      .withColumn("bucket", expr(s"((__rank - 1L) * ${bins}L) div ${n}L"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"), min("__v").as("lo"), max("__v").as("hi"))
      .orderBy("bucket")
  }

  /** Lorenz curve + Gini coefficient of a non-negative integer weight
    * ("how concentrated is the token mass?"): for each decile d, the
    * share of total weight held by the bottom d/10 of rows when sorted
    * by (weight asc, id asc), plus the exact-sufficient-statistic Gini
    * G = (2·Σᵢ rankᵢ·wᵢ)/(n·W) − (n+1)/n. The corpus-concentration
    * diagnostic behind source-mixing decisions (a Gini near 1 means a
    * handful of documents carry the corpus).
    *
    * Scale shape: ONE range exchange (what any global order pays);
    * per-range count+weight partials to the driver (the
    * globalRowNumber/selectByTokenBudget idiom); rank and cumulative
    * weight are local windows + broadcast offsets; Σ rank·w is a plain
    * LONG aggregate (exact, order-free). Long-overflow contract:
    * rank·w per row and its corpus sum must fit a signed long — scale
    * weight units down for extreme corpora. Returns `deciles` rows
    * (decile, target_rank, cum_share) with the constant `gini`. */
  def lorenzGini(df: DataFrame, idCol: String, weightCol: String,
      deciles: Int = 10): DataFrame = {
    require(deciles >= 1, s"deciles must be >= 1, got $deciles")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val parted = df
      .select(col(idCol).as("__id"), col(weightCol).cast("long").as("__w"))
      .repartitionByRange(p, col("__w").asc, col("__id").asc)
      .sortWithinPartitions("__w", "__id")
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    val partials = parted.groupBy("__pid")
      .agg(count(lit(1)).as("__c"), sum("__w").as("__s"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val n = partials.map(_._2).sum
    val wTot = partials.map(_._3).sum
    require(n > 0 && wTot > 0, s"need rows with positive total weight")
    val offR = partials.map(_._1)
      .zip(partials.scanLeft(0L)(_ + _._2).dropRight(1)).toMap
    val offW = partials.map(_._1)
      .zip(partials.scanLeft(0L)(_ + _._3).dropRight(1)).toMap
    val win = Window.partitionBy("__pid").orderBy(col("__w").asc, col("__id").asc)
    val ranked = parted.select(col("__w"),
      (row_number().over(win).cast("long") +
        element_at(typedLit(offR), col("__pid"))).as("__rank"),
      (sum("__w").over(win.rowsBetween(Long.MinValue, 0)) +
        element_at(typedLit(offW), col("__pid"))).as("__cumw"))
      .localCheckpoint(false)
    val s = ranked.agg(sum(col("__rank") * col("__w"))).first().getLong(0)
    val nD = n.toDouble; val wD = wTot.toDouble
    val gini = ((2.0 * s.toDouble) / (nD * wD)) - ((nD + 1.0) / nD)
    import spark.implicits._
    val targets = (1 to deciles)
      .map(d => (d, (n * d) / deciles)).toDF("decile", "target_rank")
    ranked.join(broadcast(targets), col("__rank") === col("target_rank"))
      .select(col("decile"), col("target_rank"),
        (col("__cumw").cast("double") / lit(wD)).as("cum_share"),
        lit(gini).as("gini"))
      .orderBy("decile")
  }

  /** Deterministic corpus shuffle for training-order randomization:
    * every row gets `shuffle_idx` — its position when the corpus is
    * ordered by a keyed hash — so the "random" order is a pure function
    * of (key, seed): reproducible across runs/engines/partitioning, and
    * re-seedable per epoch. Hash is the SQL-replayable md5-60 form
    * ([[Dedup.md5Hash60]] of key·":"·seed), ties (hash collisions)
    * broken by key. One range exchange via [[globalRowNumber]] — no
    * global-window bottleneck, no RNG. */
  def deterministicShuffle(df: DataFrame, keyCol: String, seed: Long): DataFrame =
    globalRowNumber(
      df.withColumn("__h",
        Dedup.md5Hash60(concat(col(keyCol).cast("string"), lit(":"), lit(seed)))),
      "shuffle_idx",
      col("__h").asc, col(keyCol).asc)
      .drop("__h")

  /** Deterministic train/eval/test split: assigns each key to one fold by
    * hash range; folds are disjoint and exhaustive, and a key keeps its
    * fold forever (no leakage across reruns or growing data). `weights`
    * need not be normalized. */
  def hashSplit(df: DataFrame, keyCol: String, weights: Seq[Double]): Seq[DataFrame] = {
    require(weights.nonEmpty && weights.forall(_ > 0), "weights must be positive")
    val total = weights.sum
    val bounds = weights.scanLeft(0.0)(_ + _).map(w => (w / total * Buckets).toLong)
    val bucket = hashBucket(col(keyCol))
    bounds.sliding(2).map { case Seq(lo, hi) =>
      df.filter(bucket >= lit(lo) && bucket < lit(hi))
    }.toSeq
  }

  /** Leakage-free grouped split: every row of a GROUP (source, domain,
    * dedup cluster, user…) lands in the SAME fold, assigned by the
    * group-key hash — the eval-integrity split ([[hashSplit]] keyed per
    * row can put two near-identical docs from one crawl domain on both
    * sides of a train/test boundary; splitting by the group key makes
    * that structurally impossible). Same hash, bounds, and
    * null-to-fold-0 contract as [[hashSplit]]; a group keeps its fold
    * forever (no leakage across reruns or growing data).
    *
    * One pass: fold is a CASE over the hash bucket — a pure projection,
    * no join, no per-fold scans. Returns the input + `fold` (int). */
  def groupedSplitAssign(df: DataFrame, groupCol: String,
      weights: Seq[Double]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_ > 0), "weights must be positive")
    val total = weights.sum
    val bounds = weights.scanLeft(0.0)(_ + _).map(w => (w / total * Buckets).toLong)
    val bucket = hashBucket(col(groupCol))
    val fold = bounds.tail.init.zipWithIndex.foldRight(
      lit(weights.size - 1): Column) { case ((hi, i), rest) =>
      when(bucket < lit(hi), lit(i)).otherwise(rest)
    }
    df.withColumn("fold", fold)
  }

  /** Weighted sampling WITH replacement: `k` independent draws, each
    * selecting a row with probability ∝ weight — multinomial corpus
    * mixing ("draw 100k docs proportional to token mass"), where
    * [[prioritySampleK]] is the without-replacement form. Draw `d` maps
    * to the uniform u_d = (h60(seed:d)+1)/2⁶⁰ and selects the CROSSING
    * row of the id-ordered cumulative weight (cum ≥ u·W ∧ cum−w < u·W)
    * — a pure function of (seed, d), replayable anywhere.
    *
    * Shape: the id-ordered cumulative weight is the lorenzGini
    * range-exchange + driver-offset pass; the k-row draws frame
    * broadcasts against it with the crossing predicate (k is bounded —
    * the nested-loop is k·rows predicate evaluations, linear in the
    * corpus). Zero-weight rows can never cross. Returns
    * (draw, id, w, u). */
  def weightedDraws(df: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val parted = df
      .select(col(idCol).as("__id"), col(weightCol).cast("long").as("__w"))
      .repartitionByRange(p, col("__id").asc)
      .sortWithinPartitions("__id")
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    val partials = parted.groupBy("__pid").agg(sum("__w").as("__s"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val wTot = partials.map(_._2).sum
    require(wTot > 0, "total weight must be positive")
    val offW = partials.map(_._1)
      .zip(partials.scanLeft(0L)(_ + _._2).dropRight(1)).toMap
    val win = Window.partitionBy("__pid").orderBy(col("__id").asc)
      .rowsBetween(Long.MinValue, 0)
    val cum = parted.select(col("__id"), col("__w"),
      (sum("__w").over(win) + element_at(typedLit(offW), col("__pid")))
        .as("__cum"))
    val draws = spark.range(1, k + 1).select(col("id").cast("int").as("draw"))
      .withColumn("u",
        (Dedup.md5Hash60(concat(lit(seed.toString), lit(":"),
          col("draw").cast("string"))) + lit(1L)).cast("double") /
          lit(math.pow(2.0, 60)))
      .withColumn("__t", col("u") * lit(wTot.toDouble))
    cum.join(broadcast(draws),
        col("__cum").cast("double") >= col("__t") &&
          (col("__cum") - col("__w")).cast("double") < col("__t"))
      .select(col("draw"), col("__id").as("id"), col("__w").as("w"), col("u"))
      .orderBy("draw")
  }

  /** Kish effective sample size per group: ESS = (Σw)²/Σw² — how many
    * EQUAL-weight samples a weighted group is actually worth (ESS ≪ n
    * means a few whales dominate; upsampling a source 10× adds rows but
    * not information). The curation readout for weighted mixes: report
    * it next to every `temperatureMix`/`weightedDraws` decision.
    * Contract: LONG weights (token counts, byte sizes) so both
    * sufficient statistics are exact order-free long sums — one
    * map-side-combined aggregate, group-cardinality output; the ONLY
    * doubles are the final fixed-paren divisions ((Σw)² as a double —
    * the long square would overflow first at corpus scale). All-zero
    * groups report NULL (the q141 degenerate-design convention).
    * Returns (group, n, sum_w, sum_w2, ess, ess_ratio). */
  def effectiveSampleSize(df: DataFrame, groupCol: String,
      weightCol: String): DataFrame = {
    val w = col(weightCol).cast("long")
    val ess = when(col("sum_w2") === 0L, lit(null).cast("double"))
      .otherwise((col("sum_w").cast("double") * col("sum_w").cast("double")) /
        col("sum_w2").cast("double"))
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(w).as("sum_w"),
        sum(w * w).as("sum_w2"))
      .select(col(groupCol), col("n"), col("sum_w"), col("sum_w2"),
        ess.as("ess"), (ess / col("n").cast("double")).as("ess_ratio"))
  }

  /** Chapman capture–recapture estimate: how big is a population you can
    * only SAMPLE? Two independent captures by id (two crawl seeds' doc
    * sets, two days' active users, two scanners' PII hits) estimate the
    * total, including what neither saw:
    * N̂ = (n₁+1)(n₂+1)/(m+1) − 1 (Chapman's bias-corrected Lincoln–
    * Petersen), with the standard variance
    * V = (n₁+1)(n₂+1)(n₁−m)(n₂−m) / ((m+1)²(m+2)).
    * The q304/q305 sketches estimate |A∪B| of what WAS seen; this
    * estimates what WASN'T. Assumes independent captures with equal
    * catchability — the caveat travels with the number.
    *
    * Exact long counts (two distincts + one key-width semi-join — the
    * raw sets never join wide); doubles only in the closed form, fixed
    * parenthesization. m=0 (disjoint captures) reports the estimate with
    * NULL-free arithmetic (the +1 correction keeps it finite) — but a
    * zero overlap at any real scale means the independence assumption is
    * broken, which the huge CI makes visible.
    * Returns one row: (n1, n2, m, n_hat, se, ci_lo, ci_hi). */
  /** Post-stratified mean: reweight per-stratum sample means to KNOWN
    * population shares — the one-line fix for "our sample over-represents
    * stratum X" (a crawl that over-samples English, an event stream that
    * over-samples power users): mean_ps = Σ_h W_h·x̄_h,
    * SE = √(Σ_h W_h²·s_h²/n_h). The survey-statistics companion to
    * [[neymanAllocation]] (that plans the sample; this corrects one you
    * already have).
    *
    * One exact micro-integer sufficient-statistics aggregate (Σv long,
    * Σv² DECIMAL(38,0) — the q229 convention); the weighted fold runs
    * stratum-sorted on the DRIVER over the ≤|popShares| frame. Strata
    * in the data but NOT in `popShares` are excluded (they have no
    * population weight — counted in `n_excluded`); shares with NO data
    * rows make the estimate undefined → NULL mean/se +
    * `missing_strata` > 0. Any stratum with n < 2 reports NULL se (no
    * within-stratum variance evidence) but a real mean. Returns one row
    * (n, n_strata, missing_strata, n_excluded, mean_ps, se). */
  def postStratifiedMean(df: DataFrame, strataCol: String,
      valueCol: String, popShares: Map[String, Double],
      microScale: Long = 1000000L): DataFrame = {
    require(popShares.nonEmpty, "popShares must be non-empty")
    require(popShares.values.forall(_ > 0.0), "shares must be > 0")
    require(math.abs(popShares.values.sum - 1.0) < 1e-9,
      s"shares must sum to 1, got ${popShares.values.sum}")
    require(microScale >= 1L, s"microScale must be >= 1, got $microScale")
    val md = microScale.toDouble
    val v = round(col(valueCol).cast("double") * lit(md)).cast("long")
    val stats = df
      .select(col(strataCol).cast("string").as("__h"), v.as("__v"))
      .groupBy("__h")
      .agg(count(lit(1)).as("n"), sum("__v").as("sv"),
        sum((col("__v").cast("decimal(19,0)") *
          col("__v").cast("decimal(19,0)")).cast("decimal(38,0)"))
          .as("ss"))
      .collect()
      .map(r => Option(r.getString(0)).getOrElse("NULL") ->
        (r.getLong(1), r.getLong(2), BigDecimal(r.getDecimal(3)))).toMap
    val nExcluded = stats.collect {
      case (h, (n, _, _)) if !popShares.contains(h) => n }.sum
    val missing = popShares.keys.count(!stats.contains(_))
    val present = popShares.toSeq.sortBy(_._1)
      .flatMap { case (h, w) => stats.get(h).map(s => (h, w, s)) }
    val nTot = present.map(_._3._1).sum
    val spark = df.sparkSession
    import spark.implicits._
    if (missing > 0)
      return Seq((nTot, present.size.toLong, missing.toLong, nExcluded))
        .toDF("n", "n_strata", "missing_strata", "n_excluded")
        .select(col("*"), lit(null).cast("double").as("mean_ps"),
          lit(null).cast("double").as("se"))
    var mean = 0.0; var varSum = 0.0; var anyTiny = false
    present.foreach { case (_, w, (n, sv, ss)) =>
      val nD = n.toDouble
      mean += w * ((sv.toDouble / nD) / md)
      if (n < 2) anyTiny = true
      else {
        val varU = (((BigDecimal(n) * ss) -
          (BigDecimal(sv) * BigDecimal(sv))).toDouble /
          (nD * (nD - 1.0))) / (md * md)
        varSum += ((w * w) * varU) / nD
      }
    }
    Seq((nTot, present.size.toLong, 0L, nExcluded))
      .toDF("n", "n_strata", "missing_strata", "n_excluded")
      .select(col("*"), lit(mean).as("mean_ps"),
        (if (anyTiny) lit(null).cast("double")
         else lit(math.sqrt(varSum))).as("se"))
  }

  def chapmanEstimate(a: DataFrame, b: DataFrame, idCol: String): DataFrame = {
    val av = a.select(col(idCol)).distinct().localCheckpoint(false)
    val bv = b.select(col(idCol)).distinct().localCheckpoint(false)
    val n1 = av.count()
    val n2 = bv.count()
    val m = av.join(bv, Seq(idCol), "left_semi").count()
    val n1D = (n1 + 1L).toDouble; val n2D = (n2 + 1L).toDouble
    val mD = (m + 1L).toDouble
    val nHat = ((n1D * n2D) / mD) - 1.0
    val variance = ((n1D * n2D) * ((n1 - m).toDouble * (n2 - m).toDouble)) /
      ((mD * mD) * (m + 2L).toDouble)
    val spark = a.sparkSession
    import spark.implicits._
    Seq((n1, n2, m)).toDF("n1", "n2", "m")
      .select(col("n1"), col("n2"), col("m"), lit(nHat).as("n_hat"),
        sqrt(lit(variance)).as("se"),
        (lit(nHat) - (lit(1.96) * sqrt(lit(variance)))).as("ci_lo"),
        (lit(nHat) + (lit(1.96) * sqrt(lit(variance)))).as("ci_hi"))
  }
}
