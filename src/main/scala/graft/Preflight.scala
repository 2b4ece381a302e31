package graft

import org.apache.spark.sql.SparkSession

/** Analysis-only preflight over every declared query: constructs each
  * `SparkEntry.queries` thunk against a sf dir and forces schema resolution
  * (Catalyst analysis, no execution). Turns the round-7 failure class —
  * environment/testdata drift producing an AnalysisException that Verify
  * swallowed into a silently-missing gate row — into a sub-minute red.
  *
  * Usage: runMain graft.Preflight <sfDir>    (exit 1 on any failure)
  */
object Preflight {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var failed = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).schema // forces analysis; no job runs
        println(s"[preflight] OK   $name")
      } catch { case e: Throwable =>
        failed += 1
        println(s"[preflight] FAIL $name: ${e.getClass.getSimpleName}: " +
          s"${Option(e.getMessage).getOrElse("").linesIterator.take(3).mkString(" | ")}")
      }
    }
    println(s"[preflight] ${SparkEntry.queries.size - failed}/${SparkEntry.queries.size} analyzed clean")
    // Combined-entry contract: spanDedupReport's three outputs must stay
    // ≡ the individually-gated operators (q58/q59/q63) — asserted here on
    // real testdata (cheap at sf0.001) so refactors of the shared flagged
    // -gram path (like round 7's spansFromFlagged factoring) can't drift
    // the combined entry without turning the local gate red.
    try {
      import graft.operators.Dedup
      import org.apache.spark.sql.functions.col
      // deterministic subset (LIMIT order is not a contract)
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text").filter(col("doc_id") % 4 === 0)
      val rep = Dedup.spanDedupReport(docs, "doc_id", "text", minSpanTokens = 10)
      def key(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.collect().map(_.mkString("")).sorted.toSeq
      val singles = Seq(
        ("spans", rep.spans, Dedup.duplicateSpans(docs, "doc_id", "text", 10)),
        ("stats", rep.stats, Dedup.duplicateSpanStats(docs, "doc_id", "text", 10)),
        ("stripped", rep.stripped, Dedup.stripDuplicateSpans(docs, "doc_id", "text", 10)))
      singles.foreach { case (n, a, b) =>
        if (key(a) != key(b)) {
          failed += 1
          println(s"[preflight] FAIL spanDedupReport.$n drifted from its single-op twin")
        } else println(s"[preflight] OK   spanDedupReport.$n ≡ single-op")
      }
    } catch { case e: Throwable =>
      failed += 1
      println(s"[preflight] FAIL spanDedupReport equivalence: ${e.getMessage}")
    }
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
