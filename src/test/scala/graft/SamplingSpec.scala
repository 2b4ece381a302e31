package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def frame = (1 to 300).map { i =>
    val src = s"src${i % 3}"
    (src, i.toLong, ((i * 2654435761L) % 1013).toDouble)
  }.toDF("source", "id", "score")

  test("topFractionPerGroup keeps exactly ceil(frac*n_g) best rows per group") {
    val out = Sampling.topFractionPerGroup(frame, "source", "id", "score", 0.3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val byGroup = out.groupBy(_._1)
    assert(byGroup.keySet === Set("src0", "src1", "src2"))
    val want = frame.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).toSeq.flatMap { case (g, rows) =>
        val budget = math.ceil(rows.length * 0.3).toLong
        rows.sortBy(r => (-r._3, r._2)).take(budget.toInt)
          .zipWithIndex.map { case ((_, id, s), i) => (g, id, s, (i + 1).toLong) }
      }.toSet
    assert(out.toSet === want)
  }

  test("topFractionPerGroup ranks are contiguous from 1 within each group") {
    val out = Sampling.topFractionPerGroup(frame, "source", "id", "score", 0.2)
      .collect().map(r => (r.getString(0), r.getLong(3)))
    out.groupBy(_._1).foreach { case (g, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (1L to rs.length).toSeq, s"group $g")
    }
  }

  test("topFractionPerGroup kept set is invariant to partition count") {
    def run(p: Int) = Sampling.topFractionPerGroup(
        frame, "source", "id", "score", 0.25, partitions = p)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    val one = run(1)
    assert(run(3) === one)
    assert(run(17) === one)
  }

  test("topFractionPerGroup survives nondeterministic range boundaries") {
    val key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    val old = spark.conf.get(key, "100")
    spark.conf.set(key, "2")
    try {
      val big = (1 to 4000).map { i =>
        (s"s${i % 4}", i.toLong, ((i * 40503L) % 769).toDouble)
      }.toDF("source", "id", "score")
      def run(p: Int) = Sampling.topFractionPerGroup(
          big, "source", "id", "score", 0.4, partitions = p)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
      assert(run(13) === run(1))
    } finally spark.conf.set(key, old)
  }

  test("percentRankPerGroup: 0 for each group's best, 1 for its worst, id ties") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 5.0), ("a", 3L, 5.0), ("a", 4L, 1.0),
      ("b", 5L, 7.0), ("b", 6L, 3.0),
      ("c", 7L, 9.0)).toDF("source", "id", "score")
    val out = Sampling.percentRankPerGroup(df, "source", "id", "score")
      .collect().map(r => r.getLong(1) -> r.getDouble(4)).toMap
    assert(out(1L) === 0.0)
    assert(out(2L) === 1.0 / 3.0) // tie with id 3 broken by id asc
    assert(out(3L) === 2.0 / 3.0)
    assert(out(4L) === 1.0)
    assert(out(5L) === 0.0 && out(6L) === 1.0)
    assert(out(7L) === 0.0) // singleton group
  }

  test("globalRowNumber assigns exact 1..n positions under the sort order") {
    val df = (1 to 500).map(i => (i.toLong, ((i * 7919) % 503).toDouble))
      .toDF("id", "score")
    val out = Sampling.globalRowNumber(df, "pos", col("score").asc, col("id").asc)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(out.map(_._3).sorted.toSeq === (1L to 500L).toSeq)
    val want = out.sortBy(r => (r._2, r._1)).map(_._1)
    assert(out.sortBy(_._3).map(_._1).toSeq === want.toSeq)
  }

  test("deterministicShuffle: same seed reproduces, different seed permutes") {
    val df = (1 to 400).map(i => (i.toLong, s"doc$i")).toDF("id", "text")
    def run(seed: Long, parts: Int) = Sampling.deterministicShuffle(
        df.repartition(parts), "id", seed)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val a = run(42L, 4)
    assert(run(42L, 11) === a) // partition-invariant
    val b = run(43L, 4)
    assert(a !== b)
    assert(a.values.toSeq.sorted === (1L to 400L).toSeq)
    assert(b.values.toSeq.sorted === (1L to 400L).toSeq)
  }

  test("topFractionPerGroup frac edges: 0 keeps nothing, 1 keeps everything ranked") {
    val zero = Sampling.topFractionPerGroup(frame, "source", "id", "score", 0.0)
    assert(zero.count() === 0L)
    val all = Sampling.topFractionPerGroup(frame, "source", "id", "score", 1.0)
    assert(all.count() === 300L)
  }
}
