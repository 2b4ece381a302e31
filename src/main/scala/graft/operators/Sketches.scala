package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-memory frequency sketches for corpus-scale term statistics
  * (extension — the reference has no sketch surface; this is the standard
  * companion to the heavy-hitter / vocabulary tier of a training-data
  * pipeline, where an exact (term, count) aggregate over n-gram keys is
  * itself a multi-TB shuffle).
  *
  * Count-Min sketch (Cormode & Muthukrishnan 2005): a depth×width grid of
  * counters; every occurrence of a term increments one counter per hash
  * row; a point estimate is the MIN over the term's cells — always an
  * over-estimate (collisions only add), with ε ≈ e/width of the total
  * mass at δ ≈ exp(−depth) failure probability.
  *
  * Spark shape: the grid IS a `groupBy(row, bucket).sum` — partial
  * aggregation bounds per-task state at depth·width counters (the sketch's
  * bounded-memory property falls out of map-side combine), and the final
  * sketch is a ≤ depth·width-row frame that BROADCASTS to any probe join.
  * The md5-prefix bucket hash keeps every cell value replayable in an
  * external SQL engine (same idiom as [[Dedup.md5Hash60]] elsewhere).
  */
object Sketches {

  /** Bucket of `term` under hash row `row`: md5-60 of "row:term" mod
    * `width` — deterministic, SQL-replayable, independent across rows. */
  def cmsBucket(term: Column, row: Int, width: Int): Column =
    pmod(Dedup.md5Hash60(concat_ws(":", lit(row), term)), lit(width.toLong))

  private def cellsFor(term: Column, depth: Int, width: Int): Column =
    explode(array((0 until depth).map(i =>
      struct(lit(i).as("row"), cmsBucket(term, i, width).as("bucket"))): _*))

  /** Build the sketch from a pre-aggregated (term, count) frame — the
    * depth-fold expansion then runs over the vocabulary-sized frame, not
    * the raw token stream. Output: (row, bucket, cnt), ≤ depth·width rows
    * (cells no term hashed into are absent ⇒ implicitly zero). */
  def cmsSketch(tf: DataFrame, termCol: String, cntCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, s"depth/width must be positive, got $depth x $width")
    tf.select(col(cntCol).as("__c"), cellsFor(col(termCol), depth, width).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(sum("__c").as("cnt"))
  }

  /** Point estimates for probe terms: min over the term's `depth` cells;
    * absent cells read 0 (a term the sketch never saw estimates 0, not
    * null). The sketch side is explicitly broadcast — it is ≤ depth·width
    * rows by construction, so the probe side never shuffles. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, termCol: String,
      depth: Int, width: Int): DataFrame =
    probes.select(col(termCol), cellsFor(col(termCol), depth, width).as("rb"))
      .select(col(termCol), col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(col(termCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Whitespace-token frequencies of a text column — the shared tokenizer
    * of the dedup/ranking family; (term, cnt), vocabulary-sized. */
  def termCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(Dedup.tokensCol(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("cnt"))

  /** Heavy-hitter candidates over a text column: every term whose sketch
    * estimate reaches `minCount`, with its exact count alongside.
    * Guarantees: est ≥ cnt always (CMS never under-counts), so the output
    * is a SUPERSET of the true heavy hitters — the standard
    * sketch-then-verify contract (the exact column here is the verify).
    * Output: (term, cnt, est), est ≥ minCount.
    *
    * The term-count frame feeds three plan branches (sketch build, probe
    * set, exact-count join) — it is vocabulary-sized, so one eager
    * localCheckpoint pins it and the corpus is scanned exactly ONCE. */
  def cmsHeavyHitters(df: DataFrame, textCol: String,
      depth: Int, width: Int, minCount: Long): DataFrame =
    hhFromCounts(termCounts(df, textCol).localCheckpoint(true),
      depth, width, minCount)

  /** [[cmsHeavyHitters]] with the threshold as a fraction of total token
    * mass: minCount = total / divisor (integer division — replayable).
    * The total reads off the checkpointed term counts, not a second
    * corpus scan. */
  def cmsHeavyHittersByTotalFraction(df: DataFrame, textCol: String,
      depth: Int, width: Int, divisor: Long): DataFrame = {
    require(divisor > 0, s"divisor must be positive, got $divisor")
    val tf = termCounts(df, textCol).localCheckpoint(true)
    val totRow = tf.agg(sum("cnt")).first()
    val total = if (totRow.isNullAt(0)) 0L else totRow.getLong(0)
    hhFromCounts(tf, depth, width, total / divisor)
  }

  private def hhFromCounts(tf: DataFrame, depth: Int, width: Int,
      minCount: Long): DataFrame = {
    val sketch = cmsSketch(tf, "term", "cnt", depth, width)
    tf.join(cmsEstimate(sketch, tf, "term", depth, width), Seq("term"))
      .filter(col("est") >= minCount)
      .select(col("term"), col("cnt"), col("est"))
  }
}
