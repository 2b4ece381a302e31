package graft

import graft.operators.HammingIndex
import org.apache.spark.sql.functions._

class HammingIndexSpec extends SparkSpec {
  import spark.implicits._

  private def sigs(rows: (Long, Long)*): org.apache.spark.sql.DataFrame =
    rows.toDF("id", "sig")

  test("probe equals brute force across two incremental adds; self at 0") {
    val dir = java.nio.file.Files.createTempDirectory("hamix").toString
    val idx = new HammingIndex(spark, dir, maxDist = 3, numBuckets = 8)
    val hist = (1L to 40L).map(i => i -> (i * 0x9E3779B97F4A7C15L))
    idx.add(sigs(hist.take(20): _*), "id", "sig")
    idx.add(sigs(hist.drop(20): _*), "id", "sig")
    // incoming: one exact copy (dist 0), one 2-bit variant (dist 2),
    // one 5-bit variant (too far), one already-indexed id re-probed
    val base = hist.head._2
    val inc = sigs(
      101L -> base,
      102L -> (base ^ 0x3L),
      103L -> (base ^ 0x1FL),
      1L -> base)
    val got = idx.probe(inc, "id", "sig")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // brute force over the full history
    val ref = (for {
      (iid, isig) <- Seq(101L -> base, 102L -> (base ^ 0x3L),
        103L -> (base ^ 0x1FL), 1L -> base)
      (hid, hsig) <- hist
      d = java.lang.Long.bitCount(isig ^ hsig)
      if d <= 3
    } yield (iid, hid) -> d).toMap
    assert(got === ref)
    assert(got((1L, 1L)) === 0) // re-probed id reports itself
    assert(got.contains((102L, 1L)) && got((102L, 1L)) === 2)
    assert(!got.keySet.exists(_._1 == 103L))
  }

  test("ingest admits only novel signatures; redelivery suppressed; persistence") {
    val dir = java.nio.file.Files.createTempDirectory("hamix").toString
    val idx = new HammingIndex(spark, dir, maxDist = 1, numBuckets = 8)
    val n1 = idx.ingest(sigs(1L -> 0x1111L, 2L -> 0xFFFF00000000L), "id", "sig")
      .collect().map(_.getLong(0)).sorted
    assert(n1.toSeq === Seq(1L, 2L))
    // 1-bit variant rejected, far value admitted
    val n2 = idx.ingest(sigs(3L -> 0x1110L, 4L -> 0xABCDEF123456L), "id", "sig")
      .collect().map(_.getLong(0)).sorted
    assert(n2.toSeq === Seq(4L))
    // redelivered batch: both match their own indexed copies at 0
    val reopened = new HammingIndex(spark, dir, maxDist = 1, numBuckets = 8)
    val n3 = reopened.ingest(sigs(4L -> 0xABCDEF123456L), "id", "sig").count()
    assert(n3 === 0L)
  }
}
