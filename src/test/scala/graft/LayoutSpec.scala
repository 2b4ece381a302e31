package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorderKey: canonical 2-bit Morton curve") {
    // 4x4 grid, min 0 max 3 at bits=2 -> bucket == value; the Morton
    // order of (x, y) with x on even bits is the textbook z-curve
    val grid = (for (x <- 0 to 3; y <- 0 to 3) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val out = Layout.zorderKey(grid, Seq("x", "y"), "z", bits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((0L, 0L)) === 0L)
    assert(out((1L, 0L)) === 1L)
    assert(out((0L, 1L)) === 2L)
    assert(out((1L, 1L)) === 3L)
    assert(out((2L, 0L)) === 4L)
    assert(out((3L, 3L)) === 15L)
    // bijective on the grid: 16 distinct keys covering [0, 16)
    assert(out.values.toSet === (0L until 16L).toSet)
  }

  test("zorderKey: range-shifted values bucket by offset, not raw value") {
    val df = Seq((100L, -8L), (103L, -5L)).toDF("a", "b")
    val out = Layout.zorderKey(df, Seq("a", "b"), "z", bits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // a in [100,103] -> buckets 0 and 3; b in [-8,-5] -> buckets 0 and 3
    assert(out((100L, -8L)) === 0L)
    assert(out((103L, -5L)) === 15L)  // interleave(3, 3) at 2 bits
  }

  test("zorderKey: three columns round-robin the bit positions") {
    val df = Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L)).toDF("a", "b", "c")
    val out = Layout.zorderKey(df, Seq("a", "b", "c"), "z", bits = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(out((1L, 0L, 0L)) === 1L)   // col 0 -> bit 0
    assert(out((0L, 1L, 0L)) === 2L)   // col 1 -> bit 1
    assert(out((0L, 0L, 1L)) === 4L)   // col 2 -> bit 2
  }

  test("layoutByZorder: partitions by z-range, preserves rows, tightens per-file spans") {
    val grid = (for (x <- 0L to 15L; y <- 0L to 15L) yield (x, y)).toDF("x", "y")
    val laid = Layout.layoutByZorder(grid, Seq("x", "y"), partitions = 4, bits = 4)
    assert(laid.rdd.getNumPartitions === 4)
    assert(laid.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      (for (x <- 0L to 15L; y <- 0L to 15L) yield (x, y)).toSet)
    // the data-skipping property: every z-partition of the 16x16 grid is
    // one quadrant — per-partition min-max span of EACH column is half
    // the domain (an x-sorted layout would leave y's span at 15 in every
    // file)
    val spans = laid
      .groupBy(spark_partition_id().as("p"))
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(spans.length === 4)
    assert(spans.forall { case (sx, sy) => sx <= 7L && sy <= 7L },
      s"spans not quadrant-tight: ${spans.mkString(",")}")
  }

  test("pruningReport: zorder prunes both dims, linear only its sort column") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 32×32 grid: x = id % 32, y = id div 32; 16 equal partitions of 64
    // rows. Linear (sorted by x) partitions each own exactly 2 x-values
    // and ALL y-values; zorder keeps both dims compact.
    val grid = spark.range(1024).select(col("id"),
      pmod(col("id"), lit(32L)).as("x"), (col("id") / 32).cast("long").as("y"))
    val probes = Seq(
      (0L, "x", 0L, 1L),   // linear: only partition 0 holds x∈[0,1]
      (1L, "y", 0L, 1L))   // linear: every partition holds y∈[0,1]
      .toDF("probe_id", "col_name", "lo", "hi")
    val rep = graft.operators.Layout.pruningReport(grid, "id", Seq("x", "y"),
        partitions = 16, probes = probes)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(5), r.getLong(6))).toMap
    assert(rep.values.forall(_._1 === 16L), "16 partitions everywhere")
    assert(rep(("linear", 0L))._2 === 15L) // x∈[0,1] lives in partition 0
    assert(rep(("linear", 1L))._2 === 0L)  // y spans every linear partition
    // zorder: y∈[0,1] is 1/16 of the curve → most partitions skippable
    assert(rep(("zorder", 1L))._2 >= 8L,
      s"zorder should prune off-column probes, got ${rep(("zorder", 1L))._2}")
    assert(rep(("zorder", 0L))._2 >= 8L)
  }

  test("compactionPlan: equals the scanLeft reference plan, partitioning-invariant") {
    val rnd = new scala.util.Random(3)
    val files = (1L to 300L).map(f => (f, (rnd.nextInt(5000) + 1).toLong))
    val target = 20000L
    // driver reference: bin = exclusive prefix sum div target
    val excl = files.map(_._2).scanLeft(0L)(_ + _).dropRight(1)
    val ref = files.zip(excl)
      .groupBy { case (_, e) => e / target }
      .map { case (bin, fs) =>
        bin -> ((fs.size.toLong, fs.map(_._1._2).sum,
          fs.map(_._1._1).min, fs.map(_._1._1).max))
      }
    for (parts <- Seq(1, 7)) {
      val out = Layout.compactionPlan(
          files.toDF("f", "bytes").repartition(parts), "f", "bytes", target)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))))
        .toMap
      assert(out === ref, s"parts=$parts")
    }
    // bins cover consecutive files: every bin's first follows the prior last
    val byBin = ref.toSeq.sortBy(_._1).map(_._2)
    byBin.sliding(2).foreach {
      case Seq((_, _, _, la), (_, _, fb, _)) => assert(fb === la + 1)
      case _ =>
    }
  }
}
