package graft

import graft.operators.Intervals
import org.apache.spark.sql.functions._

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  test("mergedIslands: overlap and touch merge, gaps split, invalid dropped") {
    val rows = Seq(
      ("a", 0L, 10L), ("a", 5L, 20L),   // overlap → one island [0,20]
      ("a", 20L, 30L),                  // touches (start == prev end) → merges
      ("a", 40L, 50L),                  // gap → new island
      ("b", 100L, 110L),
      ("b", 300L, 200L))                // invalid (e < s) → dropped
    val out = Intervals.mergedIslands(rows.toDF("k", "s", "e"), "k", "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(out === Set(
      ("a", 0L, 30L, 3L), ("a", 40L, 50L, 1L), ("b", 100L, 110L, 1L)))
  }

  test("mergedIslands: contained interval does not reopen (running max, not lag)") {
    // [0,100] then [10,20]: naive lag(e) would see prev end 20 at [30,40]
    // and wrongly split; running max keeps 100
    val rows = Seq(("k", 0L, 100L), ("k", 10L, 20L), ("k", 30L, 40L),
      ("k", 150L, 160L))
    val out = Intervals.mergedIslands(rows.toDF("k", "s", "e"), "k", "s", "e")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out === Set((0L, 100L, 3L), (150L, 160L, 1L)))
  }

  test("coverageReport: integer coverage; partition-invariant") {
    val rows = Seq(
      ("a", 0L, 10L), ("a", 5L, 20L), ("a", 40L, 50L),
      ("b", 1L, 2L), ("b", 2L, 3L), ("b", 10L, 11L), ("b", 20L, 21L))
    val df = rows.toDF("k", "s", "e")
    val rep = Intervals.coverageReport(df, "k", "s", "e")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(rep("a") === ((3L, 2L, 30L, 20L))) // [0,20]+[40,50] = 20+10
    assert(rep("b") === ((4L, 3L, 4L, 2L)))   // [1,3]+[10,11]+[20,21]
    // partition invariance: force many tiny ranges vs one
    val many = Intervals.coverageReport(df.repartition(7), "k", "s", "e",
      partitions = 5).collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val one = Intervals.coverageReport(df, "k", "s", "e", partitions = 1)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(many === one)
    // duplicate identical intervals stay deterministic
    val dup = df.union(df)
    val d2 = Intervals.coverageReport(dup, "k", "s", "e", partitions = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(d2("a") === ((6L, 2L)))
  }
}
