package graft

import graft.operators.FuzzyIndex
import org.apache.spark.sql.functions._

class FuzzyIndexSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (j == 0) i else if (i == 0) j else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private val history = Seq(
    (1L, "customer#0001"), (2L, "blue widget"), (3L, "acme corp"),
    (4L, "item-0042"), (5L, "zzz"))

  test("probe equals brute-force history matches at maxDist") {
    val dir = tmpDir("fuzzyidx_")
    val ix = new FuzzyIndex(spark, dir, maxDist = 1)
    ix.add(history.toDF("id", "s"), "id", "s")
    val batch = Seq(
      (101L, "customer#0002"), // 1 sub of 1
      (102L, "blue widgets"),  // 1 ins of 2
      (103L, "acme corp"),     // exact copy of 3
      (104L, "wholly novel name"),
      (105L, "zz"))            // 1 del of 5
    val got = ix.probe(batch.toDF("id", "s"), "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = (for {
      (ib, sb) <- batch; (ih, sh) <- history
      d = lev(sb, sh) if d <= 1
    } yield (ib, ih, d)).toSet
    assert(got === want)
    assert(want.nonEmpty && want.contains((101L, 1L, 1)))
  }

  test("ingest admits only novel strings and a redelivered batch is a no-op") {
    val dir = tmpDir("fuzzyidx_")
    val ix = new FuzzyIndex(spark, dir, maxDist = 1)
    ix.add(history.toDF("id", "s"), "id", "s")
    val batch = Seq((201L, "customer#0011"), (202L, "entirely new thing"))
      .toDF("id", "s")
    val kept = ix.ingest(batch, "id", "s").collect().map(_.getLong(0)).toSet
    assert(kept === Set(202L)) // 201 is 1 edit from customer#0001
    // redelivery: 202 now matches its own indexed copy at dist 0
    val again = ix.ingest(batch, "id", "s").collect().map(_.getLong(0)).toSet
    assert(again === Set.empty)
    // a reopened instance sees the same state
    val ix2 = new FuzzyIndex(spark, dir, maxDist = 1)
    val m = ix2.probe(Seq((301L, "entirely new thing")).toDF("id", "s"), "id", "s")
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSet
    assert(m === Set((202L, 0)))
  }

  test("probe on an empty index returns no rows with the right schema") {
    val ix = new FuzzyIndex(spark, tmpDir("fuzzyidx_"), maxDist = 2)
    val out = ix.probe(Seq((1L, "x")).toDF("id", "s"), "id", "s")
    assert(out.columns.toSeq === Seq("inc_id", "hist_id", "dist"))
    assert(out.count() === 0L)
  }

  test("degenerate variant keys above maxBucketSize are skipped (bounded recall)") {
    val dir = tmpDir("fuzzyidx_")
    // 30 exact copies of one string: every variant key has 30 postings
    val ix = new FuzzyIndex(spark, dir, maxDist = 1, maxBucketSize = 10)
    ix.add((1 to 30).map(i => (i.toLong, "dup dup dup")).toDF("id", "s"), "id", "s")
    val hit = ix.probe(Seq((99L, "dup dup dup")).toDF("id", "s"), "id", "s")
    assert(hit.count() === 0L) // capped away — the documented trade
    // an uncapped index finds all 30
    val ix2 = new FuzzyIndex(spark, tmpDir("fuzzyidx_"), maxDist = 1)
    ix2.add((1 to 30).map(i => (i.toLong, "dup dup dup")).toDF("id", "s"), "id", "s")
    assert(ix2.probe(Seq((99L, "dup dup dup")).toDF("id", "s"), "id", "s")
      .count() === 30L)
  }
}
