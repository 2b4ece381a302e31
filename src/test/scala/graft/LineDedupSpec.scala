package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Cross-document line-level dedup (Dolma-style): hand goldens for the
  * stats and strip operators, eligibility rules, and the affected-only
  * output contract. */
class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  // doc 1 and 2 share "shared header"; doc 3 is clean; doc 4 repeats a
  // line WITHIN itself only (must not flag); blank lines everywhere.
  private val corpus = docs(
    1L -> "shared header\nunique one\n\nlast line a",
    2L -> "shared header\nunique two",
    3L -> "all original\ncontent here",
    4L -> "self repeat\nself repeat\nown text")

  test("duplicateLineStats flags cross-doc lines only, counts all lines") {
    val out = Dedup.duplicateLineStats(corpus, "doc_id", "text")
      .select("doc_id", "n_lines", "dup_lines", "dup_line_frac")
      .as[(Long, Int, Long, Double)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ===
      Seq((1L, 4, 1L), (2L, 2, 1L), (3L, 2, 0L), (4L, 3, 0L)))
    assert(out(0)._4 === 0.25) // 1 of 4 lines (blank line counts in total)
    assert(out(1)._4 === 0.5)
  }

  test("trimmed-content matching: leading/trailing spaces do not defeat the flag") {
    val d = docs(1L -> "  padded line  \nx", 2L -> "padded line\ny")
    val out = Dedup.duplicateLineStats(d, "doc_id", "text")
      .select("doc_id", "dup_lines").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L))
  }

  test("blank lines and sub-minLineChars lines never flag") {
    val d = docs(1L -> "\nab\nzz top", 2L -> "\nab\nother")
    // minLineChars = 3: the shared "ab" and the shared blank are ineligible
    val out = Dedup.duplicateLineStats(d, "doc_id", "text", minLineChars = 3)
      .select("doc_id", "dup_lines").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 0L, 2L -> 0L))
  }

  test("stripDuplicateLines returns ONLY affected docs, rebuilt in order") {
    val out = Dedup.stripDuplicateLines(corpus, "doc_id", "text")
      .select("doc_id", "clean_text", "removed_lines")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    // docs 3 and 4 are untouched → absent
    assert(out.map(_._1).toSeq === Seq(1L, 2L))
    assert(out(0)._2 === "unique one\n\nlast line a") // original content, blank kept
    assert(out(0)._3 === 1L)
    assert(out(1)._2 === "unique two")
    assert(out(1)._3 === 1L)
  }

  test("fully-flagged doc comes back as empty clean_text") {
    val d = docs(1L -> "only line", 2L -> "only line", 3L -> "only line\nplus")
    val out = Dedup.stripDuplicateLines(d, "doc_id", "text")
      .select("doc_id", "clean_text", "removed_lines")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(out(0)._2 === "" && out(0)._3 === 1L)
    assert(out(1)._2 === "" && out(1)._3 === 1L)
    assert(out(2)._2 === "plus" && out(2)._3 === 1L)
  }

  test("strip removes ALL occurrences (no canonical keeper) and md5_60 agrees") {
    val d = docs(1L -> "dup\na", 2L -> "dup\nb", 3L -> "dup\nc")
    for (hk <- Seq("xxhash64", "md5_60")) {
      val out = Dedup.stripDuplicateLines(d, "doc_id", "text", hashKind = hk)
        .select("doc_id", "clean_text").as[(Long, String)].collect().sortBy(_._1)
      assert(out.toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c")), s"hashKind=$hk")
    }
  }

  test("within-doc repetition alone does not strip") {
    val d = docs(1L -> "echo\necho\nkeep", 2L -> "other\nstuff")
    assert(Dedup.stripDuplicateLines(d, "doc_id", "text").count() === 0L)
  }
}
