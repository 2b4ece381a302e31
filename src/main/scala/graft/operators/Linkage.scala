package graft.operators

import graft.functions.StringSim
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution: multi-pass blocking + Fellegi–Sunter
  * match scoring over the candidate pairs.
  *
  * The reference has no linkage surface; this is a scale extension in the
  * same spirit as the dedup tier — near-dup finds *redundant text*, linkage
  * finds *records describing the same real-world entity* across two dirty
  * feeds (the classic warehouse problem behind `merge_id_from_snapshot`-style
  * id reconciliation once the ids themselves are unreliable).
  *
  * Scale shape:
  *   - Blocking is the recall lever: each pass keys every record by a cheap
  *     deterministic expression (name suffix, phone prefix, …) and only
  *     within-block pairs are ever generated — the full n² space is never
  *     touched. Pair generation reuses the fused LSH machinery
  *     ([[graft.functions.BucketPairs]] via `Dedup.bucketCandidatePairs`):
  *     ONE exchange per pass frame, singleton blocks dropped before any
  *     pair work, hot blocks capped in-expression (bounded recall on
  *     degenerate keys — the capBuckets convention; gates size the cap
  *     above every real block so the oracle replays uncapped).
  *   - Scoring is a pure projection over the pair frame: per field, an
  *     agreement LEVEL (2 exact, 1 fuzzy-above-threshold via the codegen'd
  *     [[graft.functions.JaroWinkler]], 0 disagree, NULL missing) and the
  *     corresponding log-likelihood weight — log2(m/u) for agreement,
  *     log2((1−m)/(1−u)) for disagreement — as MICRO-scaled integer
  *     literals, so the total score is an exact long sum (cross-engine
  *     replayable; the q139/q211 shared-literal convention).
  *   - The two attribute joins (pairs → a-side, pairs → b-side) shuffle on
  *     the entity id — key-partitioned equi-joins, no broadcast of the
  *     corpus-sized entity frame.
  */
object Linkage {

  /** One field comparison of the Fellegi–Sunter score.
    * `fuzzyThreshold = None` → exact-only (levels 2/0/NULL, `wFuzzyMicro`
    * unused). Weights are micro-scaled log2-likelihood-ratio integers —
    * see [[fsWeightMicro]]. */
  final case class FieldSpec(
      name: String,
      column: String,
      fuzzyThreshold: Option[Double],
      wExactMicro: Long,
      wFuzzyMicro: Long,
      wDisagreeMicro: Long)

  /** log2(m/u) in micro-units: the agreement weight of a field whose
    * probability of agreeing is `m` among true matches and `u` among
    * non-matches. Disagreement weight = fsWeightMicro(1−m, 1−u). */
  def fsWeightMicro(m: Double, u: Double): Long =
    math.round(math.log(m / u) / math.log(2.0) * 1e6)

  /** Candidate pairs (id_a < id_b) from the union of blocking passes.
    * Each pass contributes within-block pairs; the union is deduplicated
    * (a pair found by two passes emits once). NULL block keys never
    * block (a missing attribute should not create a giant NULL block). */
  def blockedPairs(
      entities: DataFrame,
      idCol: String,
      blockKeys: Seq[Column],
      maxBlockSize: Int = 4096): DataFrame = {
    val passes = blockKeys.zipWithIndex.map { case (k, i) =>
      entities
        .select(lit(i).as("__pass"), k.cast("string").as("__bk"),
          col(idCol).cast("long").as("__id"))
        .filter(col("__bk").isNotNull)
    }
    Dedup.bucketCandidatePairs(
      passes.reduce(_ unionAll _), Seq("__pass", "__bk"), "__id", maxBlockSize)
  }

  /** Agreement level of one field over `a_<col>` / `b_<col>`:
    * NULL if either side is missing, 2 on exact equality, 1 when
    * Jaro–Winkler ≥ the field threshold (fuzzy fields only), else 0. */
  private def levelCol(f: FieldSpec): Column = {
    val a = col("a_" + f.column)
    val b = col("b_" + f.column)
    val base = f.fuzzyThreshold match {
      case Some(t) =>
        when(a === b, lit(2))
          .when(StringSim.jaro_winkler(a, b) >= lit(t), lit(1))
          .otherwise(lit(0))
      case None => when(a === b, lit(2)).otherwise(lit(0))
    }
    when(a.isNull || b.isNull, lit(null)).otherwise(base)
  }

  private def weightCol(f: FieldSpec): Column = {
    val lvl = col("lvl_" + f.name)
    when(lvl.isNull, lit(0L))
      .when(lvl === 2, lit(f.wExactMicro))
      .when(lvl === 1, lit(f.wFuzzyMicro))
      .otherwise(lit(f.wDisagreeMicro))
  }

  /** Score every candidate pair: joins the entity attributes to both sides
    * (prefixed `a_` / `b_`), adds one `lvl_<field>` column per field and
    * the exact integer `score_micro` sum. `carry` columns ride along
    * prefixed (e.g. a ground-truth key for evaluation). */
  def matchScores(
      entities: DataFrame,
      idCol: String,
      pairs: DataFrame,
      fields: Seq[FieldSpec],
      carry: Seq[String] = Nil): DataFrame =
    matchScoresAcross(entities, entities, idCol, pairs, fields, carry, carry)

  /** [[matchScores]] with the two pair sides drawn from DIFFERENT frames
    * (`id_a` resolves in `left`, `id_b` in `right`) — what an incremental
    * probe needs, where the incoming batch and the indexed history are
    * separate frames whose id spaces may overlap (redelivery). */
  def matchScoresAcross(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      pairs: DataFrame,
      fields: Seq[FieldSpec],
      carryLeft: Seq[String] = Nil,
      carryRight: Seq[String] = Nil): DataFrame = {
    def side(df: DataFrame, prefix: String, joinKey: String,
        carry: Seq[String]): DataFrame = {
      val attrs = (fields.map(_.column) ++ carry).distinct
      df.select((col(idCol).cast("long").as(joinKey) +:
        attrs.map(c => col(c).as(prefix + c))): _*)
    }
    val joined = pairs
      .join(side(left, "a_", "__ida", carryLeft), col("id_a") === col("__ida"))
      .join(side(right, "b_", "__idb", carryRight), col("id_b") === col("__idb"))
      .drop("__ida", "__idb")
    val withLevels = fields.foldLeft(joined)((d, f) =>
      d.withColumn("lvl_" + f.name, levelCol(f)))
    withLevels.withColumn("score_micro",
      fields.map(weightCol).reduce(_ + _))
  }

  /** Score-distribution report: bucket the micro score by `bucketMicro`
    * (floor division via exact-double floor — negative scores bucket
    * correctly on both engines) with pair counts and true-match counts. */
  def scoreHistogram(scored: DataFrame, truth: Column, bucketMicro: Long): DataFrame =
    scored
      .withColumn("bucket",
        floor(col("score_micro").cast("double") / lit(bucketMicro.toDouble))
          .cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(truth, 1L).otherwise(0L)).as("n_true"))
      .orderBy("bucket")

  /** Sorted-neighborhood blocking: candidate pairs = records within
    * `window` positions of each other in the global (sortKey, id) order —
    * the classic complement to key blocking (a hot key floods a block;
    * sorted neighborhood bounds EVERY record's candidates at `window`,
    * trading recall for records whose dirty sort keys land them far
    * apart). Output (id_a, id_b, dist) with 1 ≤ dist ≤ window, id order =
    * rank order.
    *
    * Scale shape: one range exchange for the global rank
    * ([[Sampling.globalRowNumber]]'s distributed-cumsum idiom — no
    * single-partition window), then a rank-band self-join: the probe side
    * replicates into its own and the previous band (2× key-width rows),
    * pairs filter to the exact distance — never an all-pairs product. */
  def sortedNeighborhoodPairs(
      entities: DataFrame,
      idCol: String,
      sortKey: Column,
      window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val ranked = Sampling.globalRowNumber(
      entities.select(col(idCol).cast("long").as("__id"), sortKey.as("__k")),
      "__rn", col("__k"), col("__id"))
    val a = ranked.select(col("__id").as("id_a"), col("__rn").as("__ra"),
      (col("__rn") / window).cast("long").as("__blk"))
    val b0 = ranked.select(col("__id").as("id_b"), col("__rn").as("__rb"))
    val b = b0.withColumn("__blk", (col("__rb") / window).cast("long"))
      .unionAll(b0.withColumn("__blk",
        (col("__rb") / window).cast("long") - 1))
    a.join(b, "__blk")
      .filter(col("__rb") - col("__ra") >= 1 &&
        col("__rb") - col("__ra") <= window)
      .select(col("id_a"), col("id_b"),
        (col("__rb") - col("__ra")).as("dist"))
  }

  /** Threshold-operating curve over scored pairs: per score bucket
    * (descending), the cumulative pair/true-match counts and precision of
    * "accept everything at or above this bucket" — the table an ER
    * threshold is actually chosen from (q269's histogram says where the
    * mass sits; this says what each cut costs). Suffix sums run over the
    * BUCKETS-sized frame (tens of rows — the unpartitioned window is an
    * aggregate over an already-reduced frame, not a corpus window). */
  def scoreCurve(scored: DataFrame, truth: Column, bucketMicro: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    scoreHistogram(scored, truth, bucketMicro)
      .select(col("bucket"), col("n_pairs"), col("n_true"),
        sum("n_pairs").over(w).as("cum_pairs"),
        sum("n_true").over(w).as("cum_true"))
      .withColumn("precision",
        round(col("cum_true").cast("double") / col("cum_pairs").cast("double"), 6))
      .orderBy(col("bucket").desc)
  }

  /** Reciprocal best match: the one-to-one assignment between two record
    * sets (catalog reconciliation — each left record may match at most one
    * right record and vice versa; the greedy standard that beats a global
    * assignment solver at corpus scale). A pair (a, b) survives iff b is
    * a's best-scoring candidate AND a is b's best — mutual argmax, with
    * deterministic tie-breaks (max score, ties to the smallest partner
    * id), evaluated over the candidates AT OR ABOVE `minScoreMicro`
    * (filter first: a below-threshold best must not block a reciprocal
    * second-best — the threshold defines the candidate universe).
    *
    * Input is a scored candidate frame (id_a, id_b, score_micro) — the
    * [[blockedPairs]] → [[matchScores]] output with id_a from the left
    * system and id_b from the right. Scale shape: one filter + two
    * row_number windows partitioned by the high-cardinality id keys +
    * one key-width semi-join — no self-joins, nothing corpus-quadratic.
    * Returns (id_a, id_b, score_micro), one row per matched pair; records
    * with no reciprocal partner are simply absent (anti-join the ids to
    * get the unmatched report). */
  def reciprocalBestMatch(scored: DataFrame,
      minScoreMicro: Long = 0L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val f = scored.filter(col("score_micro") >= minScoreMicro)
      .localCheckpoint(false)
    val bestForA = f.withColumn("__ra", row_number().over(
        Window.partitionBy("id_a")
          .orderBy(col("score_micro").desc, col("id_b").asc)))
      .filter(col("__ra") === 1).drop("__ra")
    val bestForB = f.withColumn("__rb", row_number().over(
        Window.partitionBy("id_b")
          .orderBy(col("score_micro").desc, col("id_a").asc)))
      .filter(col("__rb") === 1)
      .select("id_a", "id_b")
    bestForA.join(bestForB, Seq("id_a", "id_b"), "left_semi")
      .select("id_a", "id_b", "score_micro")
  }

  /** Match-disposition report: WHY each left record did or didn't match —
    * the operational answer after a [[reciprocalBestMatch]] run
    * ("matched" / "lost_tie": had an accepted candidate but reciprocity
    * went elsewhere / "below_threshold": candidates exist, all under the
    * floor / "no_candidate": blocking never produced a pair). The
    * unmatched tail is where blocking keys get fixed and thresholds get
    * re-argued; a single match RATE can't localize which.
    *
    * Scale shape: three key-only distinct frames + three left joins on
    * the id — key-width end to end. Returns (id_a, disposition), one row
    * per left id. */
  def matchDisposition(leftIds: DataFrame, idCol: String, scored: DataFrame,
      matches: DataFrame, minScoreMicro: Long): DataFrame = {
    val ids = leftIds.select(col(idCol).cast("long").as("id_a")).distinct()
    val matched = matches.select(col("id_a")).distinct()
      .withColumn("__m", lit(1))
    val accepted = scored.filter(col("score_micro") >= minScoreMicro)
      .select("id_a").distinct().withColumn("__k", lit(1))
    val any = scored.select("id_a").distinct().withColumn("__c", lit(1))
    ids
      .join(matched, Seq("id_a"), "left")
      .join(accepted, Seq("id_a"), "left")
      .join(any, Seq("id_a"), "left")
      .select(col("id_a"),
        when(col("__m") === 1, lit("matched"))
          .when(col("__k") === 1, lit("lost_tie"))
          .when(col("__c") === 1, lit("below_threshold"))
          .otherwise(lit("no_candidate")).as("disposition"))
  }

  /** Blocking-quality report: per pass (and for the deduplicated union of
    * all passes, labeled `union`) the candidate-pair count, how many true
    * pairs (same `truthCol`) it found, pair completeness against the exact
    * total of true pairs (Σ C(g,2) over truth groups — computable without
    * any pair enumeration), and the reduction ratio against the full
    * C(n,2) comparison space. The measured input to the "which blocking
    * keys, how many passes" decision — the linkage twin of the q126
    * key-skew report. */
  def blockingQualityReport(
      entities: DataFrame,
      idCol: String,
      truthCol: String,
      blockKeys: Seq[Column],
      maxBlockSize: Int = 4096): DataFrame = {
    val truth = entities.select(col(idCol).cast("long").as("__tid"),
      col(truthCol).as("__truth"))
    def tagged(label: String, pairs: DataFrame): DataFrame =
      pairs.select(lit(label).as("pass"), col("id_a"), col("id_b"))
    val perPass = blockKeys.zipWithIndex.map { case (k, i) =>
      tagged(s"block_$i", blockedPairs(entities, idCol, Seq(k), maxBlockSize))
    }
    val all = tagged("union", blockedPairs(entities, idCol, blockKeys, maxBlockSize))
    val pairs = (perPass :+ all).reduce(_ unionAll _)
      .join(truth.withColumnRenamed("__tid", "id_a")
        .withColumnRenamed("__truth", "__ta"), Seq("id_a"))
      .join(truth.withColumnRenamed("__tid", "id_b")
        .withColumnRenamed("__truth", "__tb"), Seq("id_b"))
    val counts = pairs.groupBy("pass")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("__ta") === col("__tb"), 1L).otherwise(0L)).as("n_true"))
    // exact totals without pair enumeration: n rows → C(n,2) space;
    // Σ C(g,2) over truth groups → total true pairs
    val totals = truth
      .groupBy("__truth").agg(count(lit(1)).as("__g"))
      .agg(sum(col("__g")).as("__n"),
        sum(col("__g") * (col("__g") - 1) / 2).cast("long").as("total_true"))
      .select(col("__n"), (col("__n") * (col("__n") - 1) / 2).cast("long")
        .as("total_space"), col("total_true"))
    counts.crossJoin(broadcast(totals))
      .select(col("pass"), col("n_pairs"), col("n_true"), col("total_true"),
        round(col("n_true").cast("double") / col("total_true").cast("double"), 6)
          .as("completeness"),
        round(lit(1.0) - col("n_pairs").cast("double") /
          col("total_space").cast("double"), 6).as("reduction"))
      .orderBy("pass")
  }
}
