package graft

import graft.operators.Analytics
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sessionize splits on inactivity gaps per key") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 00:05:00")),
      (1L, ts("2024-01-01 01:00:00")), // > 600s gap → new session
      (2L, ts("2024-01-01 00:00:00"))).toDF("user_id", "ts")
    val stats = Analytics.sessionStats(
        Analytics.sessionize(df, "user_id", "ts", 600L), "user_id", "ts")
      .orderBy("user_id", "session_seq").collect()
    assert(stats.length === 3)
    assert(stats(0).getLong(4) === 2L) // first session of user 1 has 2 events
    assert(stats(1).getLong(4) === 1L)
  }

  test("sessionize works on a TIMESTAMP_NTZ column") {
    // Regression: the round-7 testdata regeneration made events.ts read as
    // TIMESTAMP_NTZ (isAdjustedToUTC=0 micros), and NTZ → BIGINT is an
    // illegal direct cast in Spark 4 — sessionize must cast via timestamp.
    import org.apache.spark.sql.types.TimestampNTZType
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 00:05:00")),
      (1L, ts("2024-01-01 01:00:00")),
      (2L, ts("2024-01-01 00:00:00"))).toDF("user_id", "ts")
      .withColumn("ts", col("ts").cast(TimestampNTZType))
    assert(df.schema("ts").dataType === TimestampNTZType)
    val stats = Analytics.sessionStats(
        Analytics.sessionize(df, "user_id", "ts", 600L), "user_id", "ts")
      .orderBy("user_id", "session_seq").collect()
    assert(stats.length === 3)
    assert(stats(0).getLong(4) === 2L)
  }

  test("windowed counts align to tumbling boundaries") {
    val df = Seq(
      (ts("2024-01-01 00:10:00"), "a"), (ts("2024-01-01 00:50:00"), "a"),
      (ts("2024-01-01 01:10:00"), "a")).toDF("ts", "k")
    val out = Analytics.windowedCounts(df, "ts", "1 hour", Seq("k"))
      .orderBy("window_start").collect()
    assert(out.map(_.getLong(3)).toSeq === Seq(2L, 1L))
  }

  test("salted aggregation equals plain aggregation") {
    val df = (1 to 10000).map(i => (s"k${i % 3}", i.toDouble)).toDF("k", "v")
    val salted = Analytics.saltedCountSum(df, Seq("k"), "v", saltBuckets = 8)
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val plain = df.groupBy("k").agg(count(lit(1)), sum("v"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted.toSeq === plain.toSeq)
  }

  test("salted join equals plain join") {
    val big = (1 to 5000).map(i => (i % 7, i)).toDF("k", "v")
    val small = Seq((0, "z"), (1, "a"), (3, "c")).toDF("k", "name")
    val saltedRows = Analytics.saltedJoin(big, small, Seq("k"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).sortBy(t => (t._1, t._2))
    val plainRows = big.join(small, Seq("k"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).sortBy(t => (t._1, t._2))
    assert(saltedRows.toSeq === plainRows.toSeq)
  }

  test("topKPerGroup is deterministic with tiebreakers") {
    val df = Seq((1, 10, "a"), (1, 10, "b"), (1, 5, "c"), (2, 7, "d")).toDF("g", "score", "id")
    val out = Analytics.topKPerGroup(df, Seq("g"),
        Seq(col("score").desc, col("id")), 2)
      .orderBy("g", "rn").collect().map(_.getString(2))
    assert(out.toSeq === Seq("a", "b", "d"))
  }

  test("coPartition makes later joins shuffle-free") {
    val a = (1 to 1000).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i, s"b$i")).toDF("k", "vb")
    val (ca, cb) = Analytics.coPartition(a, b, Seq("k"), 8)
    val joined = ca.join(cb, Seq("k"))
    val plan = joined.queryExecution.executedPlan.toString
    // SortMergeJoin over pre-partitioned children must not re-exchange
    // beyond the two explicit repartitions
    assert(joined.count() === 1000)
    // only the two explicit repartitions may shuffle (a BroadcastExchange
    // is not a hash shuffle and is fine)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 2, s"unexpected extra shuffles:\n$plan")
  }

  test("asofJoin picks the latest right row at-or-before each left ts") {
    val probes = Seq(
      (1L, ts("2024-01-01 00:00:05")), // after u1 → 10.0
      (1L, ts("2024-01-01 00:00:10")), // tie with u2 → 20.0 (ties match)
      (1L, ts("2024-01-01 00:00:03")), // before any update → null
      (2L, ts("2024-01-01 00:00:30"))  // other key, no updates → null
    ).toDF("user_id", "ts")
    val updates = Seq(
      (1L, ts("2024-01-01 00:00:04"), 10.0),
      (1L, ts("2024-01-01 00:00:10"), 20.0)
    ).toDF("user_id", "upd_ts", "v")
    val out = Analytics.asofJoin(probes, updates, Seq("user_id"), "ts", "upd_ts", Seq("v"))
      .orderBy("user_id", "ts").collect()
      .map(r => if (r.isNullAt(2)) null else r.getDouble(2))
    assert(out.toSeq === Seq(null, 10.0, 20.0, null))
  }

  test("asofJoin returns NULL from a matched right row whose value is null") {
    val probes = Seq((1L, ts("2024-01-01 00:00:05"))).toDF("user_id", "ts")
    val updates = Seq(
      (1L, ts("2024-01-01 00:00:01"), Some(5.0)),
      (1L, ts("2024-01-01 00:00:03"), None: Option[Double])).toDF("user_id", "upd_ts", "v")
    val out = Analytics.asofJoin(probes, updates, Seq("user_id"), "ts", "upd_ts", Seq("v")).collect()
    assert(out(0).isNullAt(2), "latest matched row has v=null; must not fall back to an older row")
  }

  test("saltedJoin rejects outer shapes that would duplicate the small side") {
    val a = Seq((1, "x")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Analytics.saltedJoin(a, a, Seq("k"), joinType = "full")
    }
  }

  test("binned range join equals the naive inequality join") {
    val points = (0 until 500).map(i => (i, i * 7.3 % 400)).toDF("id", "x")
    val intervals = Seq(("a", 0.0, 100.0), ("b", 50.0, 260.0), ("c", 399.0, 400.0))
      .toDF("tag", "lo", "hi")
    val binned = Analytics.rangeJoinBinned(points, intervals, "x", "lo", "hi", 64.0)
      .select("id", "tag").collect().map(r => (r.getInt(0), r.getString(1))).sorted
    val naive = points.join(intervals, $"x" >= $"lo" && $"x" < $"hi")
      .select("id", "tag").collect().map(r => (r.getInt(0), r.getString(1))).sorted
    assert(binned.toSeq === naive.toSeq)
    assert(naive.nonEmpty)
  }

  test("packSequences assigns contiguous offsets and context-window pack ids per stratum") {
    val docs = Seq(
      (1L, 1000L, 0L), (2L, 1500L, 0L), (3L, 700L, 0L), (4L, 100L, 0L),
      (5L, 2048L, 1L), (6L, 1L, 1L)).toDF("doc_id", "tok_len", "stratum")
    val out = Analytics.packSequences(docs, "doc_id", "tok_len", capacity = 2048L,
        strataCol = "stratum")
      .select("doc_id", "offset", "pack_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // stratum 0 stream: offsets 0, 1000, 2500, 3200 → packs 0, 0, 1, 1
    assert(out(1L) === (0L, 0L) && out(2L) === (1000L, 0L))
    assert(out(3L) === (2500L, 1L) && out(4L) === (3200L, 1L))
    // stratum 1 is an independent stream; an exact-capacity doc fills pack 0
    assert(out(5L) === (0L, 0L) && out(6L) === (2048L, 1L))
  }

  private def ts(h: Int, m: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("resampleFfill: last-in-bucket, gap forward-fill, per-key grids") {
    val events = Seq(
      (1L, ts(0, 10), 1.0, 100L),
      (1L, ts(0, 50), 2.0, 101L),   // later in bucket 0 → wins
      (1L, ts(6, 30), 3.0, 102L),
      (1L, ts(18, 20), 4.0, 103L),  // bucket 12:00 empty → ffill 3.0
      (2L, ts(6, 0), 9.0, 104L)     // key 2: single-bucket grid
    ).toDF("user_id", "ts", "value", "event_id")
    val out = Analytics.resampleFfill(events, Seq("user_id"), "ts", "value",
        stepMicros = 6L * 3600 * 1000000, orderCol = "event_id")
      .orderBy("user_id", "bucket_ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString.substring(11, 16),
        r.getDouble(2), r.getBoolean(3)))
    assert(out.toList === List(
      (1L, "00:00", 2.0, true),
      (1L, "06:00", 3.0, true),
      (1L, "12:00", 3.0, false),
      (1L, "18:00", 4.0, true),
      (2L, "06:00", 9.0, true)))
  }

  test("resampleFfill breaks exact-ts ties by the order column") {
    val events = Seq(
      (1L, ts(0, 0), 1.0, 100L),
      (1L, ts(0, 0), 7.0, 105L)).toDF("user_id", "ts", "value", "event_id")
    val out = Analytics.resampleFfill(events, Seq("user_id"), "ts", "value",
      stepMicros = 3600000000L, orderCol = "event_id").collect()
    assert(out.length === 1 && out(0).getDouble(2) === 7.0)
  }

  test("cohortRetention builds the week-offset matrix from first-touch cohorts") {
    // week0 = Mon 2024-01-01, week1 = 2024-01-08, week3 = 2024-01-22
    val rows = Seq(
      (1L, ts("2024-01-02 10:00:00")), (1L, ts("2024-01-09 10:00:00")),
      (2L, ts("2024-01-03 10:00:00")),
      (3L, ts("2024-01-10 10:00:00")), (3L, ts("2024-01-24 10:00:00")),
      (3L, ts("2024-01-10 18:00:00"))) // same user+week dup collapses
      .toDF("user_id", "ts2")
    val out = Analytics.cohortRetention(rows, "user_id", "ts2")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    assert(out === Set(
      ("2024-01-01", 0L, 2L, 2L, 1.0),
      ("2024-01-01", 1L, 1L, 2L, 0.5),
      ("2024-01-08", 0L, 1L, 1L, 1.0),
      ("2024-01-08", 2L, 1L, 1L, 1.0)))
  }

  test("volumeAnomalies flags spikes and drops against the trailing discrete median") {
    def day(d: Int, i: Int) = ts(f"2024-01-${d}%02d 00:00:${i % 60}%02d")
    // type "a": 10/day for 6 days, then a 30-event spike, then a 3-event drop
    val a = (1 to 6).flatMap(d => (1 to 10).map(i => (day(d, i), "a"))) ++
      (1 to 30).map(i => (day(7, i), "a")) ++
      (1 to 3).map(i => (day(8, i), "a"))
    // type "b": steady 5/day — never flagged
    val b = (1 to 8).flatMap(d => (1 to 5).map(i => (day(d, i), "b")))
    val out = Analytics.volumeAnomalies((a ++ b).toDF("ts2", "t"),
        "ts2", "t", windowDays = 7)
      .collect().map(r => ((r.getDate(0).toString, r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getBoolean(5)))).toMap
    assert(out(("2024-01-07", "a")) === ((30L, 10L, true)))  // spike: 30 > 2*10
    assert(out(("2024-01-08", "a")) === ((3L, 10L, true)))   // drop: 3 < 0.5*10
    assert(out(("2024-01-06", "a"))._3 === false)
    assert(out.filter(_._1._2 == "b").values.forall(!_._3))
    assert(out.size === 16)
  }

  test("transitionMatrix counts consecutive pairs per user with normalized rows") {
    val rows = Seq(
      (1L, ts("2024-01-01 00:00:01"), "a", 1L),
      (1L, ts("2024-01-01 00:00:02"), "b", 2L),
      (1L, ts("2024-01-01 00:00:03"), "a", 3L),
      (2L, ts("2024-01-01 00:00:01"), "a", 4L),
      (2L, ts("2024-01-01 00:00:02"), "b", 5L),
      // same-ts tie broken by the order column: c before d
      (3L, ts("2024-01-01 00:00:01"), "c", 6L),
      (3L, ts("2024-01-01 00:00:01"), "d", 7L))
      .toDF("user_id", "ts2", "t", "eid")
    val out = Analytics.transitionMatrix(rows, "user_id", "ts2", "t", "eid")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(out === Set(
      ("a", "b", 2L, 1.0),   // a→b twice, only outgoing from a... a→b 2 of 2
      ("b", "a", 1L, 1.0),
      ("c", "d", 1L, 1.0)))
  }

  test("robustTrendPerGroup: outlier-proof slope; deterministic and exact on a planted line") {
    import spark.implicits._
    // 21 points on y = 2x + 3 plus ONE wild outlier: every md5-pairing of
    // two on-line points gives slope exactly 2; at most one pair touches
    // the outlier, so the median of ~10 slopes is exactly 2 and the
    // median residual is exactly 3 — OLS on the same data reads ~2.9
    val clean = (0 until 21).map(i => ("m", i.toLong, i.toDouble, 2.0 * i + 3.0))
    val rows = (clean :+ (("m", 99L, 10.0, 500.0))).toDF("g", "id", "x", "y")
    val out = Analytics.robustTrendPerGroup(rows, "g", "id", "x", "y")
      .collect().head
    assert(out.getLong(1) >= 9L)              // ~11 pairs, few skipped
    assert(out.getDouble(2) === 2.0)          // exact: median pair slope
    assert(out.getDouble(3) === 3.0)          // exact: median residual
    // re-seedable: a different salt re-pairs but the planted line holds
    val out2 = Analytics.robustTrendPerGroup(rows, "g", "id", "x", "y",
      salt = "other").collect().head
    assert(out2.getDouble(2) === 2.0 && out2.getDouble(3) === 3.0)
  }

  test("stationaryDistribution: absorbing chain drains mass; totals stay 1") {
    // one user walks a → b → c → c → c …: transitions a→b, b→c, c→c.
    // P is a→b 1.0, b→c 1.0, c→c 1.0: c absorbs everything it receives;
    // after 3 rounds from uniform (1/3 each): π(a)=0 (nothing flows in),
    // π(b)=0 (a drained after round 1... round2 b gets a's 0), π(c)=1.
    val rows = Seq(
      (1L, ts("2024-01-01 00:00:01"), "a", 1L),
      (1L, ts("2024-01-01 00:00:02"), "b", 2L),
      (1L, ts("2024-01-01 00:00:03"), "c", 3L),
      (1L, ts("2024-01-01 00:00:04"), "c", 4L))
      .toDF("user_id", "ts2", "t", "eid")
    val out = Analytics.stationaryDistribution(rows, "user_id", "ts2",
        "t", "eid", rounds = 3, deterministic = true)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(math.abs(out("a")) < 1e-12)
    assert(math.abs(out("b")) < 1e-12)
    assert(math.abs(out("c") - 1.0) < 1e-12)
    assert(math.abs(out.values.sum - 1.0) < 1e-12, "mass conserved")
    // dangling type keeps its own mass (self-loop convention): a → b only;
    // b has NO outgoing row, so b accumulates and holds everything
    val dang = Seq(
      (1L, ts("2024-01-01 00:00:01"), "a", 1L),
      (1L, ts("2024-01-01 00:00:02"), "b", 2L))
      .toDF("user_id", "ts2", "t", "eid")
    val d2 = Analytics.stationaryDistribution(dang, "user_id", "ts2",
        "t", "eid", rounds = 4)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(math.abs(d2("a")) < 1e-12 && math.abs(d2("b") - 1.0) < 1e-12)
    assert(math.abs(d2.values.sum - 1.0) < 1e-12)
  }

  test("funnel counts users completing steps strictly in order") {
    val rows = Seq(
      (1L, "view", ts("2024-01-01 00:00:01")),
      (1L, "click", ts("2024-01-01 00:00:02")),
      (1L, "purchase", ts("2024-01-01 00:00:03")),
      (2L, "view", ts("2024-01-01 00:00:01")),
      (2L, "click", ts("2024-01-01 00:00:01")), // not strictly after → out
      (3L, "click", ts("2024-01-01 00:00:01")), // no view → never enters
      (4L, "view", ts("2024-01-01 00:00:05")),
      (4L, "click", ts("2024-01-01 00:00:04"))) // click before view → out
      .toDF("user_id", "event_type", "ts2")
    val out = Analytics.funnel(rows, "user_id", "ts2", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList
    assert(out === List((0L, "view", 3L), (1L, "click", 1L), (2L, "purchase", 1L)))
  }

  private def refQuantile(vals: Seq[Double], q: Double): Double = {
    val sorted = vals.sorted
    sorted((math.max(1L, math.ceil(q * vals.size).toLong) - 1).toInt)
  }

  test("discreteQuantilesPerGroup picks exact order statistics, ties and all") {
    val rows = (1 to 100).map(i => ("a", i.toLong, (i % 10).toDouble)) ++
      (1 to 7).map(i => ("b", (100 + i).toLong, i * 10.0))
    val df = rows.toDF("g", "id", "score")
    val qs = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    val out = Analytics.discreteQuantilesPerGroup(df, "g", "id", "score", qs)
      .collect().map(r => ((r.getString(0), r.getDouble(1)), r.getDouble(2))).toMap
    for (q <- qs) {
      assert(out(("a", q)) === refQuantile(rows.filter(_._1 == "a").map(_._3), q), s"a q=$q")
      assert(out(("b", q)) === refQuantile(rows.filter(_._1 == "b").map(_._3), q), s"b q=$q")
    }
    assert(out.size === qs.size * 2)
    // partition-invariant
    val again = Analytics.discreteQuantilesPerGroup(
      df.repartition(13), "g", "id", "score", qs, partitions = 3)
      .collect().map(r => ((r.getString(0), r.getDouble(1)), r.getDouble(2))).toMap
    assert(again === out)
  }

  test("winsorizePerGroup clamps to exact per-group order-statistic bounds") {
    val rows = (1 to 100).map(i => ("a", i.toLong, i.toDouble)) ++
      (1 to 7).map(i => ("b", (100 + i).toLong, i * 10.0))
    val out = Analytics.winsorizePerGroup(rows.toDF("g", "id", "score"),
        "g", "id", "score", lo = 0.05, hi = 0.95)
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getDouble(2), r.getDouble(3)))).toMap
    assert(out.size === rows.size) // every row kept
    for ((g, vals) <- rows.groupBy(_._1)) {
      val loB = refQuantile(vals.map(_._3), 0.05)
      val hiB = refQuantile(vals.map(_._3), 0.95)
      for ((_, id, v) <- vals) {
        val (orig, w) = out((g, id))
        assert(orig === v)
        assert(w === math.max(loB, math.min(hiB, v)), s"$g/$id")
      }
    }
    // group a [1..100]: p05=5, p95=95 → tails clamp, middle untouched
    assert(out(("a", 1L))._2 === 5.0)
    assert(out(("a", 100L))._2 === 95.0)
    assert(out(("a", 50L))._2 === 50.0)
  }

  test("dayOfWeekIndex: ISO weekday from epoch days; index vs grand mean") {
    import java.sql.Timestamp
    // 1970-01-01 = Thursday (4); 1970-01-05 = Monday (1)
    def ts(day: Int, h: Int) = new Timestamp(
      (day.toLong * 86400L + h * 3600L) * 1000L)
    val rows = Seq(
      (ts(0, 1), 1L, 10.0), (ts(0, 23), 2L, 20.0), // Thu mean 15
      (ts(4, 0), 3L, 30.0),                        // Mon mean 30
      (ts(11, 5), 4L, 20.0))                       // next Mon
    val out = Analytics.dayOfWeekIndex(rows.toDF("t", "id", "v"), "t", "id",
        "v", deterministic = true)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(out.keySet === Set(4, 1))
    val (n4, m4, i4) = out(4)
    val (n1, m1, _) = out(1)
    assert(n4 === 2L && m4 === 15.0)
    assert(n1 === 2L && m1 === 25.0)
    assert(math.abs(i4 - 15.0 / 20.0) < 1e-12) // grand mean 80/4 = 20
    // deterministic ≈ production
    val big = (1 to 300).map(i => (ts(i % 14, i % 24), i.toLong,
      math.cos(i.toDouble) * 5 + 10)).toDF("t", "id", "v")
    val a = Analytics.dayOfWeekIndex(big, "t", "id", "v",
      deterministic = true).collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    val b = Analytics.dayOfWeekIndex(big, "t", "id", "v")
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    for ((k, v) <- a) assert(math.abs(v - b(k)) < 1e-9)
  }

  test("poissonBootstrapMeans: deterministic weights, sane replicates, CI") {
    val df = (1 to 2000).map(i => (i.toLong, 10.0 + (i % 7).toDouble))
      .toDF("id", "v")
    val out = Analytics.poissonBootstrapMeans(df, "id", "v", reps = 8,
      deterministic = true).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.size === 8)
    // reproducible: second run bit-identical
    val again = Analytics.poissonBootstrapMeans(df, "id", "v", reps = 8,
      deterministic = true).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out === again)
    // Poisson(1) weights: n_eff within 4·sqrt(n) of n; means near truth
    val truth = (1 to 2000).map(i => 10.0 + (i % 7).toDouble).sum / 2000.0
    for ((_, (nEff, m)) <- out) {
      assert(math.abs(nEff - 2000L) < 4 * math.sqrt(2000.0))
      assert(math.abs(m - truth) < 0.2)
    }
    // deterministic fold ≈ production sums
    val prod = Analytics.poissonBootstrapMeans(df, "id", "v", reps = 8)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    for ((k, (_, m)) <- out) assert(math.abs(m - prod(k)) < 1e-9)
    // CI helper: nearest-rank golden
    val (lo, hi) = Analytics.bootstrapCI(Seq(5.0, 1.0, 3.0, 2.0, 4.0), 0.2)
    assert(lo === 1.0 && hi === 5.0) // ceil(.1*5)=1st, ceil(.9*5)=5th
    val means = out.values.map(_._2).toSeq
    val (l2, h2) = Analytics.bootstrapCI(means)
    assert(l2 <= h2 && l2 >= means.min && h2 <= means.max)
  }

  test("seasonalNaiveBacktest: week-over-week errors on a known series") {
    import java.sql.Timestamp
    def ts(day: Int, h: Int) = new Timestamp(
      (day.toLong * 86400L + h * 3600L) * 1000L)
    // day i (0..9) has i+1 events → scored days 7,8,9: a=8,9,10 f=1,2,3
    val rows = (0 to 9).flatMap(i => (0 to i).map(h => ts(i, h)))
    val r = Analytics.seasonalNaiveBacktest(rows.map(Tuple1(_)).toDF("t"),
      "t", 7).first()
    assert(r.getLong(0) === 3L)
    assert(r.getDouble(1) === 7.0)   // mae
    assert(r.getDouble(2) === 7.0)   // bias
    val mape = (7.0 / 8.0 + 7.0 / 9.0 + 7.0 / 10.0) / 3.0
    assert(math.abs(r.getDouble(3) - mape) < 1e-12)
    val smape = (14.0 / 9.0 + 14.0 / 11.0 + 14.0 / 13.0) / 3.0
    assert(math.abs(r.getDouble(4) - smape) < 1e-12)
    // unobserved lag days are excluded, not scored as zero
    val gappy = Seq(ts(0, 1), ts(7, 1), ts(8, 2)).map(Tuple1(_)).toDF("t")
    assert(Analytics.seasonalNaiveBacktest(gappy, "t", 7)
      .first().getLong(0) === 1L)
  }

  test("mannWhitneyU: textbook ranks with ties; degenerate NULL z") {
    // A=[1,2,3] B=[2,4]: ranks 1, 2.5(avg tie), 2.5, 4, 5 → RA=7.5,
    // UA=1.5, UB=4.5, tie term 6, z = -1.5/sqrt(0.5*(6-6/20))
    val rows = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0), ("b", 4.0))
    val r = Analytics.mannWhitneyU(rows.toDF("g", "v"), "g", "v", "a", "b",
      deterministic = true).first()
    assert(r.getLong(0) === 3L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === 1.5 && r.getDouble(3) === 4.5)
    assert(math.abs(r.getDouble(4) - (-1.5 / math.sqrt(2.85))) < 1e-12)
    // all-tied values → zero variance → NULL z, U still defined
    val flat = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0)).toDF("g", "v")
    val rf = Analytics.mannWhitneyU(flat, "g", "v", "a", "b").first()
    assert(rf.getDouble(2) === 1.0 && rf.isNullAt(4)) // = nA·nB/2: no info
    // missing group → NULLs
    val only = Analytics.mannWhitneyU(flat, "g", "v", "a", "zzz").first()
    assert(only.getLong(1) === 0L && only.isNullAt(2) && only.isNullAt(4))
    // deterministic fold ≈ production over a larger tied sample
    val big = (1 to 4000).map(i =>
      (if (i % 2 == 0) "a" else "b", (i % 97).toDouble)).toDF("g", "v")
    val d = Analytics.mannWhitneyU(big, "g", "v", "a", "b",
      deterministic = true).first()
    val pr = Analytics.mannWhitneyU(big, "g", "v", "a", "b").first()
    assert(math.abs(d.getDouble(4) - pr.getDouble(4)) < 1e-9)
  }

  test("conversionLatency: first-from → first-to-AFTER, exact crossings") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val rows = Seq(
      ("A", ts(10), "signup"), ("A", ts(5), "purchase"),  // pre-signup buy ignored
      ("A", ts(30), "purchase"), ("A", ts(40), "purchase"), // first AFTER wins
      ("B", ts(100), "signup"), ("B", ts(110), "purchase"),
      ("C", ts(50), "signup"),                             // never converts
      ("D", ts(60), "purchase"))                           // never starts
    val out = Analytics.conversionLatency(rows.toDF("u", "t", "e"),
      "u", "t", "e", "signup", "purchase", Seq(0.5, 1.0))
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(0.5) === ((10000000L, 3L, 2L)))  // 10 s in µs; lower of {10,20}
    assert(out(1.0) === ((20000000L, 3L, 2L)))
  }

  test("interArrivalStats: heartbeat -1, bursty positive, singletons drop") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val rows =
      Seq(0L, 10L, 20L, 30L).zipWithIndex.map { case (t, i) =>
        ("steady", ts(t), i.toLong) } ++
      Seq(0L, 1L, 2L, 3L, 100L).zipWithIndex.map { case (t, i) =>
        ("bursty", ts(t), (10 + i).toLong) } ++
      Seq(("single", ts(5L), 99L))
    val out = Analytics.interArrivalStats(rows.toDF("k", "t", "id"),
      "k", "t", "id", deterministic = true)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), if (r.isNullAt(3)) Double.NaN
          else r.getDouble(3))).toMap
    assert(!out.contains("single"))
    // steady: equal gaps → sigma 0 → B = -1
    assert(out("steady")._1 === 3L && out("steady")._2 === 1e7)
    assert(out("steady")._3 === -1.0)
    // bursty gaps (s): 1,1,1,97 → positive B
    val gaps = Seq(1.0, 1.0, 1.0, 97.0).map(_ * 1e6)
    val mu = gaps.sum / 4.0
    val sd = math.sqrt(gaps.map(g => g * g).sum / 4.0 - mu * mu)
    assert(math.abs(out("bursty")._3 - (sd - mu) / (sd + mu)) < 1e-9)
    assert(out("bursty")._3 > 0.2)
  }

  test("groupTrends: exact line, degenerate groups, det ≈ prod") {
    val rows =
      (1 to 10).map(i => ("line", i.toLong, i.toDouble, 2.0 * i + 1.0)) ++
      (1 to 5).map(i => ("flaty", 100L + i, i.toDouble, 7.0)) ++
      (1 to 5).map(i => ("flatx", 200L + i, 3.0, i.toDouble))
    val out = Analytics.groupTrends(rows.toDF("g", "id", "x", "y"),
      "g", "id", "x", "y", deterministic = true)
      .collect().map(r => r.getString(0) -> r).toMap
    val line = out("line")
    assert(math.abs(line.getDouble(2) - 2.0) < 1e-9)
    assert(math.abs(line.getDouble(3) - 1.0) < 1e-9)
    assert(math.abs(line.getDouble(4) - 1.0) < 1e-9)
    val fy = out("flaty")
    assert(fy.getDouble(2) === 0.0 && fy.getDouble(3) === 7.0 &&
      fy.isNullAt(4))
    val fx = out("flatx")
    assert(fx.isNullAt(2) && fx.isNullAt(3) && fx.isNullAt(4))
    val big = (1 to 3000).map(i =>
      ("g" + i % 3, i.toLong, (i % 41).toDouble,
        math.sin(i.toDouble) + (i % 41) * 0.5))
    val d = Analytics.groupTrends(big.toDF("g", "id", "x", "y"), "g", "id",
      "x", "y", deterministic = true)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val p = Analytics.groupTrends(big.toDF("g", "id", "x", "y"), "g", "id",
      "x", "y").collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    for ((k, v) <- d) assert(math.abs(v - p(k)) < 1e-9)
  }

  test("activityStreaks: islands from days, multi-events collapse") {
    import java.sql.Timestamp
    def ts(day: Int, h: Int) = new Timestamp(
      (day.toLong * 86400L + h * 3600L) * 1000L)
    val rows = Seq(
      ("u", ts(0, 1)), ("u", ts(0, 9)), ("u", ts(1, 2)), ("u", ts(2, 5)),
      ("u", ts(5, 0)),
      ("u", ts(7, 3)), ("u", ts(8, 4)),
      ("v", ts(3, 3)))
    val out = Analytics.activityStreaks(rows.toDF("k", "t"), "k", "t")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("u") === ((6L, 3L, 3L)))
    assert(out("v") === ((1L, 1L, 1L)))
  }

  test("concentrationIndex: HHI shares, single-cat = 1, det ≈ prod") {
    val rows = Seq(("g", "a"), ("g", "a"), ("g", "a"), ("g", "b"),
      ("solo", "x"), ("solo", "x"))
    val out = Analytics.concentrationIndex(rows.toDF("g", "c"), "g", "c",
      deterministic = true).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(out("g") === ((4L, 2L, 0.75, 0.625)))
    assert(out("solo") === ((2L, 1L, 1.0, 1.0)))
    val big = (1 to 2000).map(i => ("g" + i % 7, "c" + i % 13)).toDF("g", "c")
    val d = Analytics.concentrationIndex(big, "g", "c", deterministic = true)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    val p = Analytics.concentrationIndex(big, "g", "c")
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    for ((k, v) <- d) assert(math.abs(v - p(k)) < 1e-12)
  }

  test("conversionRates: horizon cuts over the latency frame") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val rows = Seq(
      ("A", ts(10), "signup"), ("A", ts(30), "purchase"),   // lat 20 s
      ("B", ts(100), "signup"), ("B", ts(110), "purchase"), // lat 10 s
      ("C", ts(50), "signup"))
    val out = Analytics.conversionRates(rows.toDF("u", "t", "e"),
      "u", "t", "e", "signup", "purchase", Seq(15000000L, 60000000L))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(15000000L) === ((1L, 3L, 1.0 / 3.0)))
    assert(out(60000000L) === ((2L, 3L, 2.0 / 3.0)))
  }

  test("peakRate: sliding RANGE count, boundary inclusive, ts ties") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val rows = Seq(("u", ts(0)), ("u", ts(30)), ("u", ts(61)),
      ("u", ts(200)), ("v", ts(5)), ("v", ts(5)))
    val out = Analytics.peakRate(rows.toDF("k", "t"), "k", "t", 60000000L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // windows at 30 ([0,30]→2) and 61 ([1,61]→2) both peak at 2
    assert(out("u") === ((4L, 2L)))
    // identical timestamps share one RANGE frame → both counted
    assert(out("v") === ((2L, 2L)))
  }

  test("topSessionPaths: ordered paths per session, maxLen truncation") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val rows = Seq(
      ("u", ts(0), 1L, "click"), ("u", ts(10), 2L, "view"),
      ("u", ts(20), 3L, "purchase"),
      ("u", ts(5000), 4L, "view"), // new session after the gap
      ("v", ts(0), 5L, "click"), ("v", ts(1), 6L, "view"),
      ("v", ts(2), 7L, "purchase"),
      ("w", ts(0), 8L, "a"), ("w", ts(1), 9L, "b"), ("w", ts(2), 10L, "c"),
      ("w", ts(3), 11L, "d"), ("w", ts(4), 12L, "e")) // truncates to 4
    val out = Analytics.topSessionPaths(rows.toDF("k", "t", "id", "e"),
      "k", "t", "id", "e", 600L, 4, 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("click>view>purchase") === 2L)
    assert(out("view") === 1L)
    assert(out("a>b>c>d") === 1L) // 5th event truncated
    assert(out.size === 3)
  }

  test("changepointSplit: max cumsum deviation, level shift recovered") {
    import java.sql.Timestamp
    def ts(day: Int, j: Int) = new Timestamp(
      (day.toLong * 86400L + j * 60L) * 1000L)
    // counts per day: 1,1,1,5,5,5 → split after day 2 (dev 6), means 1 → 5
    val rows = (0 to 2).map(d => ("k", ts(d, 0))) ++
      (3 to 5).flatMap(d => (0 until 5).map(j => ("k", ts(d, j)))) ++
      Seq(("single", ts(0, 0))) // one day → no interior split
    val out = Analytics.changepointSplit(rows.toDF("k", "t"), "k", "t")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(!out.contains("single"))
    val (day, dev, mb, ma) = out("k")
    assert(day === 2L && dev === 6.0 && mb === 1.0 && ma === 5.0)
  }

  test("simpsonCheck: within-group trends oppose the pooled trend") {
    val rows = Seq(
      ("g1", 1L, 0.0, 10.0), ("g1", 2L, 1.0, 9.0),
      ("g2", 3L, 10.0, 30.0), ("g2", 4L, 11.0, 29.0))
    val r = Analytics.simpsonCheck(rows.toDF("g", "id", "x", "y"),
      "g", "id", "x", "y", deterministic = true).first()
    assert(r.getLong(0) === 2L)
    assert(r.getDouble(1) > 0.0)       // pooled trend up
    assert(r.getLong(2) === 2L)        // both groups trend down
    assert(r.getDouble(3) === 1.0 && r.getBoolean(4))
    // aligned data: no paradox
    val ok = (1 to 40).map(i => ("g" + i % 2, i.toLong, i.toDouble,
      2.0 * i)).toDF("g", "id", "x", "y")
    val r2 = Analytics.simpsonCheck(ok, "g", "id", "x", "y").first()
    assert(r2.getLong(2) === 0L && !r2.getBoolean(4))
  }

  test("seasonalAnomalies: spike flagged, flat series emits nothing") {
    import java.sql.Timestamp
    def ts(day: Int, j: Int) = new Timestamp(
      (day.toLong * 86400L + j * 60L) * 1000L)
    // 21 days × 10 events, day 10 has 30 → only that day should flag
    val rows = (0 to 20).flatMap { d =>
      val c = if (d == 10) 30 else 10
      (0 until c).map(j => Tuple1(ts(d, j)))
    }
    val out = Analytics.seasonalAnomalies(rows.toDF("t"), "t", 2.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(out.keySet === Set(10L))
    assert(out(10L) > 2.0)
    // perfectly flat → zero residual variance → guard yields no rows
    val flat = (0 to 13).flatMap(d =>
      (0 until 5).map(j => Tuple1(ts(d, j)))).toDF("t")
    assert(Analytics.seasonalAnomalies(flat, "t", 2.0).count() === 0L)
  }

  test("sessionAssociationRules: support, confidence, lift over baskets") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val rows = Seq( // u: {a,b} then (after gap) {a}; v: {a,b,c}
      ("u", ts(0), "a"), ("u", ts(10), "b"),
      ("u", ts(5000), "a"),
      ("v", ts(0), "a"), ("v", ts(1), "b"), ("v", ts(2), "c"))
    val out = Analytics.sessionAssociationRules(rows.toDF("k", "t", "e"),
      "k", "t", "e", 600L).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    // singles: a=3 sessions, b=2, c=1; N=3
    assert(out(("a", "b")) === ((3L, 2L, 2.0 / 3.0, 1.0)))
    assert(out(("b", "a")) === ((3L, 2L, 1.0, 1.0)))
    assert(out(("b", "c"))._4 === 1.5) // 1·3/(2·1)
    assert(!out.contains(("a", "a")))
  }

  test("markovSelfEval: argmax next-state table and its hit rate") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val rows = Seq(
      ("u", ts(0), 1L, "a"), ("u", ts(1), 2L, "b"), ("u", ts(2), 3L, "a"),
      ("u", ts(3), 4L, "b"), ("u", ts(4), 5L, "a"),
      ("v", ts(0), 6L, "a"), ("v", ts(1), 7L, "c"))
    val out = Analytics.markovSelfEval(rows.toDF("k", "t", "id", "e"),
      "k", "t", "id", "e").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2),
        r.getLong(3), r.getDouble(4))).toMap
    assert(out("a") === ((3L, "b", 2L, 2.0 / 3.0)))
    assert(out("b") === ((2L, "a", 2L, 1.0)))
    assert(!out.contains("c")) // terminal state: no outgoing transitions
  }

  test("anovaOneWay matches the textbook decomposition; degenerates NULL") {
    // three groups with clearly separated means
    val rows = Seq(1.0, 2.0, 3.0).zipWithIndex.map { case (v, i) => ("a", i.toLong, v) } ++
      Seq(2.0, 3.0, 4.0).zipWithIndex.map { case (v, i) => ("b", (10 + i).toLong, v) } ++
      Seq(10.0, 11.0, 12.0).zipWithIndex.map { case (v, i) => ("c", (20 + i).toLong, v) }
    val r = Analytics.anovaOneWay(rows.toDF("g", "id", "v"), "g", "id", "v",
      deterministic = true).first()
    // reference: means 2/3/11, grand 16/3; SSW = 2+2+2 = 6
    val grand = rows.map(_._3).sum / 9.0
    val ssbRef = Seq(2.0, 3.0, 11.0).map(m => 3.0 * (m - grand) * (m - grand)).sum
    assert(r.getLong(0) === 3L && r.getLong(1) === 9L)
    assert(math.abs(r.getDouble(3) - 6.0) < 1e-9)       // ssw
    assert(math.abs(r.getDouble(2) - ssbRef) < 1e-9)    // ssb
    assert(math.abs(r.getDouble(6) -
      (ssbRef / 2.0) / (6.0 / 6.0)) < 1e-9)             // f
    // single group -> NULL f
    val one = Analytics.anovaOneWay(
      (1 to 5).map(i => ("only", i.toLong, i.toDouble)).toDF("g", "id", "v"),
      "g", "id", "v").first()
    assert(one.isNullAt(6))
    // zero within-group variance -> NULL f (constant groups)
    val const = Analytics.anovaOneWay(
      Seq(("a", 1L, 5.0), ("a", 2L, 5.0), ("b", 3L, 9.0), ("b", 4L, 9.0))
        .toDF("g", "id", "v"), "g", "id", "v").first()
    assert(const.isNullAt(6))
    // deterministic ≈ production on noisy data
    val noisy = (1 to 400).map(i =>
      (s"g${i % 5}", i.toLong, math.sin(i.toDouble) * 10 + (i % 5))).toDF("g", "id", "v")
    val a = Analytics.anovaOneWay(noisy, "g", "id", "v", deterministic = true).first()
    val b = Analytics.anovaOneWay(noisy, "g", "id", "v").first()
    assert(math.abs(a.getDouble(6) - b.getDouble(6)) < 1e-9)
  }

  test("robustOutliers flags modified-z outliers; MAD-0 groups flag nothing") {
    // group a: tight cluster around 10 with one extreme point
    val a = (1 to 20).map(i => ("a", i.toLong, 10.0 + (i % 5) * 0.1)) :+ (("a", 99L, 1000.0))
    // group b: over half the mass on one value → MAD 0 → no flags even
    // with an extreme point present
    val b = (1 to 10).map(i => ("b", (200 + i).toLong, 5.0)) :+ (("b", 299L, 999.0))
    val out = Analytics.robustOutliers((a ++ b).toDF("g", "id", "score"),
        "g", "id", "score", cutoff = 3.5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(5)))
    assert(out.map(t => (t._1, t._2)).toSet === Set(("a", 99L)))
    // z replays the fixed parenthesization against the hand stats
    val med = refQuantile(a.map(_._3), 0.5)
    val mad = refQuantile(a.map(v => math.abs(v._3 - med)), 0.5)
    assert(out.head._3 === ((1000.0 - med) * 0.6745) / mad)
  }

  // ── co-occurrence mining ───────────────────────────────────────────────

  test("coOccurrencePairs: hand golden with support and lift") {
    val df = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "a"), (2L, "b"),
      (3L, "a"), (1L, "b")).toDF("bk", "it")  // dup (1,b) must collapse
    val out = Analytics.coOccurrencePairs(df, "bk", "it", topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    val (cab, sab, lab) = out(("a", "b"))
    assert(cab === 2L)
    assert(sab === 2.0 / 3.0)
    assert(lab === (2.0 * 3.0) / (3.0 * 2.0))  // ca=3, cb=2, n=3
    assert(out(("a", "c"))._1 === 1L && out(("b", "c"))._1 === 1L)
  }

  test("coOccurrencePairs: in-row generation equals the relational self-join") {
    val df = (1 to 300).map(i => ((i % 40).toLong, s"it${(i * 7) % 23}"))
      .toDF("bk", "it")
    val inRow = Analytics.coOccurrencePairs(df, "bk", "it", topK = 1000)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val b = df.distinct()
    val joined = b.as("x").join(b.as("y"),
        col("x.bk") === col("y.bk") && col("x.it") < col("y.it"))
      .groupBy(col("x.it").as("a"), col("y.it").as("b"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(inRow === joined)
  }

  // ── two-proportion z-test ──────────────────────────────────────────────

  test("proportionZTest: hand-computed z, degenerate designs -> NULL") {
    // A: 3 of 4 convert; B: 1 of 4
    val df = Seq((1L, true, true), (2L, true, true), (3L, true, true),
      (4L, true, false), (5L, false, true), (6L, false, false),
      (7L, false, false), (8L, false, false)).toDF("id", "a", "s")
    val r = Analytics.proportionZTest(df, col("a"), col("s")).first()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((4L, 3L, 4L, 1L)))
    val p1 = 0.75; val p2 = 0.25; val pp = 0.5
    val want = (p1 - p2) / math.sqrt((pp * (1.0 - pp)) * (0.25 + 0.25))
    assert(math.abs(r.getDouble(6) - want) < 1e-12)
    // all units converted -> zero pooled variance -> NULL z, not an error
    val allConv = Seq((1L, true, true), (2L, false, true)).toDF("id", "a", "s")
    assert(Analytics.proportionZTest(allConv, col("a"), col("s"))
      .first().isNullAt(6))
    // empty arm -> NULL z and NULL p for that arm
    val oneArm = Seq((1L, true, true), (2L, true, false)).toDF("id", "a", "s")
    val oa = Analytics.proportionZTest(oneArm, col("a"), col("s")).first()
    assert(oa.isNullAt(5) && oa.isNullAt(6))
  }

  // ── trimmed mean ───────────────────────────────────────────────────────

  test("trimmedMeanPerGroup: drops both tails, exact cents mean") {
    // group g: cents 1..10 -> frac 0.2 cuts floor(10*0.2)=2 from each
    // tail -> keep 3..8, mean 5.5
    val df = (1L to 10L).map(i => ("g", i, i)).toDF("grp", "id", "cents")
    val out = Analytics.trimmedMeanPerGroup(df, "grp", "id", col("cents"),
        frac = 0.2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toList === List(("g", 10L, 6L, 5.5)))
  }

  test("trimmedMeanPerGroup: outlier immunity vs the plain mean") {
    val df = ((1L to 99L).map(i => ("g", i, 100L)) :+ (("g", 100L, 1000000L)))
      .toDF("grp", "id", "cents")
    val tm = Analytics.trimmedMeanPerGroup(df, "grp", "id", col("cents"),
        frac = 0.05).first().getDouble(3)
    assert(tm === 100.0)   // the single whale is gone
  }

  // ── time-weighted average ──────────────────────────────────────────────

  test("timeWeightedAverage: duration weighting beats the plain mean") {
    import java.sql.Timestamp
    def t(sec: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$sec%02d")
    // value 10 held 9s, value 100 held 1s, final value excluded
    val df = Seq((1L, t(0), 1L, 10.0), (1L, t(9), 2L, 100.0),
      (1L, t(10), 3L, 7.0)).toDF("k", "ts", "id", "v")
    val r = Analytics.timeWeightedAverage(df, "k", "ts", "id", "v",
        deterministic = true).first()
    assert(r.getLong(1) === 2L)                       // two intervals
    assert(r.getLong(2) === 10000000L)                // 10s in micros
    assert(math.abs(r.getDouble(3) - 19.0) < 1e-12)   // (10*9 + 100*1)/10
  }

  test("timeWeightedAverage: single-observation keys are excluded") {
    import java.sql.Timestamp
    val df = Seq((1L, Timestamp.valueOf("2024-01-01 00:00:00"), 1L, 5.0))
      .toDF("k", "ts", "id", "v")
    assert(Analytics.timeWeightedAverage(df, "k", "ts", "id", "v")
      .count() === 0L)
  }

  // ── Kaplan–Meier ───────────────────────────────────────────────────────

  test("kaplanMeier: textbook curve with censoring") {
    // durations: events at t=2 (1), t=5 (1); censored at t=3 and t=6
    // n_risk(2)=4 -> S=3/4; n_risk(5)=2 -> S = 3/4 * 1/2 = 3/8
    val df = Seq((2L, true), (3L, false), (5L, true), (6L, false))
      .toDF("t", "e")
    val out = Analytics.kaplanMeier(df, "t", "e")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet === Set(2L, 5L))          // curve points at events only
    assert(out(2L) === ((4L, 1L, 0.75)))
    assert(out(5L) === ((2L, 1L, 0.375)))
  }

  test("kaplanMeier: ties at one time and no-censoring sanity") {
    // all observed: S steps to 0 at the last event
    val df = Seq((1L, true), (1L, true), (2L, true)).toDF("t", "e")
    val out = Analytics.kaplanMeier(df, "t", "e")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(out(1L)._1 === 3L)
    assert(math.abs(out(1L)._2 - 1.0 / 3.0) < 1e-15)   // 1 - 2/3
    assert(out(2L)._2 === 0.0)
  }

  // ── linear attribution ─────────────────────────────────────────────────

  test("linearAttribution: equal split, direct fallback, credit conservation") {
    import java.sql.Timestamp
    def t(sec: Int) = Timestamp.valueOf(
      "2024-01-01 00:%02d:%02d".format(sec / 60, sec % 60))
    val df = Seq(
      // user 1: click + view inside the window, then purchase
      (1L, t(10), 1L, "click"), (1L, t(20), 2L, "view"),
      (1L, t(30), 3L, "purchase"),
      // user 1: second purchase with only a view in window (click aged out)
      (1L, t(700), 4L, "view"), (1L, t(750), 5L, "purchase"),
      // user 2: purchase with NO touch in window (touch far earlier)
      (2L, t(10), 6L, "click"), (2L, t(900), 7L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Analytics.linearAttribution(df, "user_id", "ts", "event_id",
        "event_type", "purchase", windowSeconds = 120L, deterministic = true)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out("click") === ((1L, 0.5)))
    assert(out("view") === ((2L, 1.5)))         // 0.5 + 1.0
    assert(out("(direct)") === ((1L, 1.0)))
    // conservation: total credit equals the number of conversions
    assert(math.abs(out.values.map(_._2).sum - 3.0) < 1e-12)
  }

  // ── quantile normalization ─────────────────────────────────────────────

  test("quantileNormalize: shifted sources map to identical pooled values") {
    val df = Seq(("A", 1L, 1.0), ("A", 2L, 2.0), ("A", 3L, 3.0),
      ("B", 4L, 101.0), ("B", 5L, 102.0), ("B", 6L, 103.0))
      .toDF("g", "id", "v")
    val out = Analytics.quantileNormalize(df, "g", "id", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    // both sources land on the same pooled order statistics
    val a = Seq(out(("A", 1L)), out(("A", 2L)), out(("A", 3L))).sorted
    val b = Seq(out(("B", 4L)), out(("B", 5L)), out(("B", 6L))).sorted
    assert(a === b)
    assert(out(("A", 1L)) === 1.0 && out(("B", 4L)) === 1.0)  // both minima
  }

  test("quantileNormalize: a single source maps every value to itself") {
    val df = (1L to 20L).map(i => ("only", i, (i * 3 % 17).toDouble))
      .toDF("g", "id", "v")
    val out = Analytics.quantileNormalize(df, "g", "id", "v")
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val orig = df.collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(out === orig)
  }

  test("minMaxScalePerGroup: per-group [0,1] range, constant group -> 0") {
    val df = Seq(("A", 1L, 10.0), ("A", 2L, 20.0), ("A", 3L, 15.0),
      ("C", 4L, 7.0), ("C", 5L, 7.0)).toDF("g", "id", "v")
    val out = Analytics.minMaxScalePerGroup(df, "g", "id", "v")
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(out(1L) === 0.0 && out(2L) === 1.0 && out(3L) === 0.5)
    assert(out(4L) === 0.0 && out(5L) === 0.0)
  }

  // ── stickiness ─────────────────────────────────────────────────────────

  test("stickiness: hand DAU/WAU with a trailing window") {
    import java.sql.Timestamp
    def t(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    // day 1: users {a, b}; day 2: {a}; day 8: {c} (outside day 1-2 window)
    val df = Seq(("a", t(1)), ("b", t(1)), ("a", t(2)), ("a", t(2)),
      ("c", t(8))).toDF("u", "ts")
    val out = Analytics.stickiness(df, "u", "ts", windowDays = 7)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val byDay = out.map { case (d, v) => (d - out.head._1) -> v }.toMap
    assert(byDay(0L) === ((2L, 2L, 1.0)))      // day 1: dau 2, wau {a,b}
    assert(byDay(1L) === ((1L, 2L, 0.5)))      // day 2: dau 1, wau {a,b}
    assert(byDay(7L) === ((1L, 2L, 0.5)))      // day 8: {c} + a's day-2 visit
  }

  // ── ewmaPerKey ─────────────────────────────────────────────────────────

  test("ewmaPerKey: bit-identical to the driver-side recursion, every step") {
    val rnd = new scala.util.Random(7)
    val rows = for (k <- Seq("a", "b"); t <- 1L to 40L)
      yield (k, t, rnd.nextInt(1000).toDouble)
    val out = Analytics.ewmaPerKey(rows.toDF("k", "t", "v"), "k", "t", "v",
        alpha = 0.3)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3))
      .toMap
    val alpha = 0.3; val beta = 1.0 - alpha
    for (k <- Seq("a", "b")) {
      val xs = rows.filter(_._1 == k).sortBy(_._2)
      var s = 0.0
      xs.zipWithIndex.foreach { case ((_, t, x), i) =>
        s = if (i == 0) x else alpha * x + beta * s
        assert(out((k, t)) === s, s"step ($k, $t)")   // exact, not approx
      }
    }
    assert(out.size === 80)
  }

  test("ewmaPerKey: alpha=1 is the identity") {
    val df = Seq(("k", 1L, 5.0), ("k", 2L, 9.0), ("k", 3L, 2.0))
      .toDF("k", "t", "v")
    val out = Analytics.ewmaPerKey(df, "k", "t", "v", alpha = 1.0)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(out === Map(1L -> 5.0, 2L -> 9.0, 3L -> 2.0))
  }

  // ── cusum ──────────────────────────────────────────────────────────────

  test("cusum: closed form equals the max(0, s + y) recursion, flags drift") {
    val rnd = new scala.util.Random(11)
    // in-control around 50 for 30 steps, then a +15 drift
    val rows = for (k <- Seq("x", "y"); t <- 1L to 60L) yield {
      val base = if (t <= 30) 50 else 65
      (k, t, (base + rnd.nextInt(11) - 5).toLong)
    }
    val out = Analytics.cusum(rows.toDF("k", "t", "v"), "k", "t", "v",
        k = 52L, h = 40L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(3), r.getBoolean(4)))
      .toMap
    for (k <- Seq("x", "y")) {
      var s = 0L
      rows.filter(_._1 == k).sortBy(_._2).foreach { case (_, t, v) =>
        s = math.max(0L, s + v - 52L)
        assert(out((k, t)) === ((s, s > 40L)), s"step ($k, $t)")
      }
    }
    // the drifted tail must alarm; the in-control head must not
    assert(Seq("x", "y").forall(k => out((k, 60L))._2))
    assert(Seq("x", "y").forall(k => !out((k, 20L))._2))
  }

  // ── paretoFrontier2D ───────────────────────────────────────────────────

  test("paretoFrontier2D: equals brute-force dominance, partition-invariant") {
    val rnd = new scala.util.Random(19)
    val pts = (1L to 400L).map(i =>
      (i, rnd.nextInt(100).toDouble, rnd.nextInt(100).toDouble))
    // brute force: p survives iff no q dominates it (>= both, > one);
    // exact (x, y) duplicates keep the lowest-id representative
    val ref = pts.filter { case (i, x, y) =>
      !pts.exists { case (j, qx, qy) => j != i &&
        ((qx >= x && qy >= y && (qx > x || qy > y)) ||
          (qx == x && qy == y && j < i))
      }
    }.map(_._1).toSet
    for (parts <- Seq(1, 11)) {
      val out = Analytics.paretoFrontier2D(
          pts.toDF("id", "x", "y").repartition(parts), "id", "x", "y")
        .collect().map(_.getLong(0)).toSet
      assert(out === ref, s"parts=$parts")
    }
  }

  // ── aucRoc ─────────────────────────────────────────────────────────────

  test("aucRoc: perfect 1.0, reversed 0.0, all-ties 0.5, degenerate NULL") {
    def auc(rows: Seq[(Double, Boolean)]): Row =
      Analytics.aucRoc(rows.toDF("s", "y"), "s", "y").first()
    val perfect = (1 to 10).map(i => (i.toDouble, i > 5))
    assert(auc(perfect).getDouble(3) === 1.0)
    assert(auc(perfect.map { case (s, y) => (-s, y) }).getDouble(3) === 0.0)
    assert(auc(Seq((1.0, true), (1.0, false), (1.0, true), (1.0, false)))
      .getDouble(3) === 0.5)
    assert(auc(Seq((1.0, true), (2.0, true))).isNullAt(3))
  }

  test("aucRoc: equals brute-force pair counting with ties, partition-invariant") {
    val rnd = new scala.util.Random(23)
    // coarse scores force ties across classes
    val rows = (1 to 300).map { _ =>
      val y = rnd.nextBoolean()
      val s = (rnd.nextInt(12) + (if (y) rnd.nextInt(4) else 0)).toDouble
      (s, y)
    }
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val expected = wins / (pos.size.toDouble * neg.size.toDouble)
    for (parts <- Seq(1, 9)) {
      val got = Analytics.aucRoc(rows.toDF("s", "y").repartition(parts),
        "s", "y").first().getDouble(3)
      assert(math.abs(got - expected) < 1e-12, s"parts=$parts got=$got")
    }
  }

  // ── calibrationCurve ───────────────────────────────────────────────────

  test("calibrationCurve: hand bins, gap, and ECE; top score lands in last bin") {
    // bin 9: scores {0.9, 1.0}, one positive -> conf 0.95, acc 0.5
    // bin 0: scores {0.0, 0.05}, none positive -> conf 0.025, acc 0.0
    val df = Seq((1L, 0.9, true), (2L, 1.0, false),
      (3L, 0.0, false), (4L, 0.05, false)).toDF("id", "s", "y")
    val out = Analytics.calibrationCurve(df, "id", "s", "y", bins = 10,
        deterministic = true)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    assert(out.keySet === Set(0L, 9L))
    val (n9, p9, c9, a9, g9, ece) = out(9L)
    assert((n9, p9) === ((2L, 1L)) && c9 === 0.95 && a9 === 0.5)
    assert(math.abs(g9 - 0.45) < 1e-12)
    val (n0, p0, c0, a0, g0, _) = out(0L)
    assert((n0, p0) === ((2L, 0L)) && c0 === 0.025 && a0 === 0.0)
    assert(math.abs(g0 - 0.025) < 1e-12)
    assert(math.abs(ece - (0.5 * 0.45 + 0.5 * 0.025)) < 1e-12)
  }

  test("calibrationCurve: deterministic ≡ production within 1e-9") {
    val rnd = new scala.util.Random(31)
    val df = (1L to 500L).map { i =>
      val s = rnd.nextDouble()
      (i, s, rnd.nextDouble() < s)   // perfectly calibrated generator
    }.toDF("id", "s", "y")
    val det = Analytics.calibrationCurve(df, "id", "s", "y", 10,
      deterministic = true).collect().map(r => r.getLong(0) ->
        ((r.getDouble(3), r.getDouble(6)))).toMap
    val prod = Analytics.calibrationCurve(df, "id", "s", "y", 10,
      deterministic = false).collect().map(r => r.getLong(0) ->
        ((r.getDouble(3), r.getDouble(6)))).toMap
    assert(det.keySet === prod.keySet)
    det.foreach { case (b, (c, e)) =>
      assert(math.abs(c - prod(b)._1) < 1e-9)
      assert(math.abs(e - prod(b)._2) < 1e-9)
    }
    // a well-calibrated scorer has small ECE
    assert(det.values.head._2 < 0.15)
  }

  test("paretoFrontier2D: staircase golden with an equal-x tie") {
    val df = Seq((1L, 5.0, 1.0), (2L, 3.0, 3.0), (3L, 1.0, 5.0),
      (4L, 3.0, 2.0),   // dominated by id 2 at equal x
      (5L, 2.0, 4.0)).toDF("id", "x", "y")
    val out = Analytics.paretoFrontier2D(df, "id", "x", "y")
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(1L, 2L, 3L, 5L))
  }

  test("collapseBursts: islands split on gap, first flagged, keys isolated") {
    // user 1 type a: events at 0s, 5s, 30s with gap 10s → bursts {0,5}, {30}
    // user 1 type b: 6s — its own burst (key isolation from type a)
    val rows = Seq(
      (1L, "a", 10L, 0L), (1L, "a", 11L, 5000000L), (1L, "a", 12L, 30000000L),
      (1L, "b", 13L, 6000000L), (2L, "a", 14L, 1000000L))
      .toDF("user_id", "event_type", "event_id", "tsu")
      .withColumn("ts", timestamp_micros(col("tsu")))
    val out = Analytics.collapseBursts(rows, Seq("user_id", "event_type"),
        "ts", "event_id", gapUs = 10000000L)
      .collect().map(r => r.getLong(2) ->
        (r.getBoolean(5), r.getLong(6))).toMap
    assert(out(10L) === ((true, 1L)))
    assert(out(11L) === ((false, 1L))) // 5s after previous: same burst
    assert(out(12L) === ((true, 2L)))  // 25s gap: new burst
    assert(out(13L) === ((true, 1L)))
    assert(out(14L) === ((true, 1L)))
  }

  test("userGrowthCurve: actives, news, and cumulative on a hand timeline") {
    val day = 86400000000L
    val rows = Seq(
      (1L, 0L), (2L, 1L),               // day 0: users 1, 2 (both new)
      (1L, day), (3L, day + 5L),        // day 1: 1 returns, 3 new
      (2L, 3 * day))                    // day 3: 2 returns, none new
      .toDF("user_id", "tsu")
      .withColumn("ts", timestamp_micros(col("tsu")))
    val out = Analytics.userGrowthCurve(rows, "ts", "user_id")
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("1970-01-01") === ((2L, 2L, 2L)))
    assert(out("1970-01-02") === ((2L, 1L, 3L)))
    assert(out("1970-01-04") === ((1L, 0L, 3L)))
    assert(out.size === 3)
  }

  test("dwellMatrix: hand gaps, per-user isolation, first event dropped") {
    // user 1: a@0 → b@10s → a@40s; user 2: a@5s → b@11s
    val rows = Seq(
      (1L, 10L, "a", 0L), (1L, 11L, "b", 10000000L),
      (1L, 12L, "a", 40000000L),
      (2L, 13L, "a", 5000000L), (2L, 14L, "b", 11000000L))
      .toDF("user_id", "event_id", "event_type", "tsu")
      .withColumn("ts", timestamp_micros(col("tsu")))
    val out = Analytics.dwellMatrix(rows, "user_id", "ts", "event_id",
        "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    // a→b: user1 10s, user2 6s → n=2, mean 8s, min 6, max 10
    assert(out(("a", "b")) === ((2L, 8.0, 6.0, 10.0)))
    // b→a: user1 30s
    assert(out(("b", "a")) === ((1L, 30.0, 30.0, 30.0)))
    assert(out.size === 2)
  }

  test("liftCurve: perfect separation gives top-bin lift = 1/base-rate, counts exact") {
    // 20 rows, top 5 scores are the only positives; 4 bins of 5
    val rows = (1L to 20L).map(i => (i, 100.0 - i, i <= 5))
      .toDF("id", "score", "label")
    val out = Analytics.liftCurve(rows, "id", "score", "label", bins = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.keySet === Set(0L, 1L, 2L, 3L))
    assert(out.values.forall(_._1 === 5L))
    // base rate 5/20 = 0.25 → top-bin lift = 1.0/0.25 = 4
    assert(out(0L) === ((5L, 5L, 1.0, 4.0)))
    assert(out(1L)._2 === 0L && out(1L)._4 === 0.0)
  }

  test("watermarkAudit: hand lateness, delay thresholds, partition-invariant") {
    // (event time µs, arrival µs): e3 arrives 100µs late behind e2's max,
    // e5 arrives 20µs behind e4's
    val rows = Seq(
      (1L, 100L, 100L), (2L, 300L, 400L), (3L, 200L, 450L),
      (4L, 500L, 460L), (5L, 480L, 470L))
      .toDF("id", "tsu", "arr")
      .withColumn("ts", timestamp_micros(col("tsu")))
    def run(df: org.apache.spark.sql.DataFrame) =
      Analytics.watermarkAudit(df, "ts", "arr", "id", Seq(0L, 50L, 1000L))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
    val got = run(rows)
    assert(got(0L) === ((2L, 0.4)))    // lateness 100 and 20 both > 0
    assert(got(50L) === ((1L, 0.2)))   // only the 100µs event drops
    assert(got(1000L) === ((0L, 0.0)))
    assert(run(rows.repartition(7)) === got)
  }

  test("bhAdjust: hand q-values, monotone suffix-min step, reject set") {
    // raw_i = p_(i)·n/i = .05, .05, .05, .625(←1.125 suffix-min'd), .99
    // (raw_4 = .9·5/4 = 1.125 collapses to the later .99 — the BH step)
    val df = Seq(("a", 0.01), ("b", 0.02), ("c", 0.03), ("d", 0.9),
      ("e", 0.99)).toDF("id", "p")
    val got = Analytics.bhAdjust(df, "id", "p", alpha = 0.05)
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(got.map(_._1).toSeq === Seq("a", "b", "c", "d", "e"))
    assert(got.map(_._3).forall(q => q <= 1.0))
    assert(math.abs(got(0)._3 - 0.05) < 1e-12)
    assert(math.abs(got(2)._3 - 0.05) < 1e-12)
    assert(math.abs(got(3)._3 - 0.99) < 1e-12) // 1.125 suffix-min'd to .99
    assert(math.abs(got(4)._3 - 0.99) < 1e-12)
    assert(got.map(_._4).toSeq === Seq(true, true, true, false, false))
  }

  test("bhAdjust: partition-invariant and tie-stable") {
    val ps = (1 to 200).map(i => (s"t$i", ((i * 37) % 101).toDouble / 101.0))
    val df = ps.toDF("id", "p")
    def run(d: org.apache.spark.sql.DataFrame) =
      Analytics.bhAdjust(d, "id", "p", alpha = 0.1).orderBy("rank")
        .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
        .toSeq
    val base = run(df)
    assert(run(df.repartition(13)) === base)
    assert(run(df.coalesce(1)) === base)
    // q-values are monotone nondecreasing in rank (the BH step function)
    assert(base.map(_._3).sliding(2).forall(w => w(0) <= w(1)))
    // empty input returns an empty, correctly-shaped frame
    assert(Analytics.bhAdjust(df.limit(0), "id", "p").count() === 0L)
  }

  test("cupedAdjust: perfect pre-predictor drives adjusted variance to ~0") {
    // y = 2x exactly plus a constant lift on variant b; the SAME x set in
    // both arms (balanced), so cov(x, lift) = 0 and θ = 2 EXACTLY
    val rows = (1 to 20).flatMap { i =>
      val x = (i * 13 % 17) * 100L
      Seq((i.toLong * 2, "a", x, 2L * x),
        (i.toLong * 2 + 1, "b", x, 2L * x + 500L))
    }
    val df = rows.toDF("unit", "variant", "x", "y")
    val got = Analytics.cupedAdjust(df, "unit", "variant", "x", "y")
      .orderBy("variant").collect()
    val theta = got(0).getDouble(7)
    assert(math.abs(theta - 2.0) < 1e-9)
    assert(got.forall(r => math.abs(r.getDouble(6)) < 1e-6)) // var_post_adj
    // the lift survives adjustment: mean_post_adj(b) − mean_post_adj(a) ≈ 500
    val adj = got.map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(math.abs((adj("b") - adj("a")) - 500.0) < 1e-6)
  }

  test("cupedAdjust: constant pre-metric degenerates to θ=0 (no-op)") {
    val df = (1 to 10).map(i => (i.toLong, (i % 2).toString, 7L, i * 10L))
      .toDF("unit", "variant", "x", "y")
    val got = Analytics.cupedAdjust(df, "unit", "variant", "x", "y")
      .orderBy("variant").collect()
    assert(got.forall(_.getDouble(7) === 0.0))
    got.foreach { r =>
      assert(r.getDouble(3) === r.getDouble(4)) // mean_post == mean_post_adj
      assert(r.getDouble(5) === r.getDouble(6)) // var unchanged
    }
  }

  // ── jackknifeRatio ─────────────────────────────────────────────────────

  test("jackknifeRatio matches a driver leave-one-bucket-out reference") {
    import graft.operators.Dedup
    val df = (1 to 200).map { i =>
      (s"u${i % 37}", ((i * 7) % 50 + 1).toLong, 1L)
    }.toDF("user_id", "cents", "one")
    val out = Analytics.jackknifeRatio(df, "user_id", "cents", "one",
      buckets = 8).collect()(0)
    // driver reference with the operator's own md5 bucketing, folded in
    // the same ascending-bucket order
    val per = df.select(
        pmod(Dedup.md5Hash60(col("user_id")), lit(8L)).as("b"),
        col("cents"), col("one"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).toSeq
      .map { case (b, rs) => (b, rs.map(_._2).sum, rs.map(_._3).sum) }
      .sortBy(_._1)
    val sy = per.map(_._2).sum; val sx = per.map(_._3).sum
    val ratio = sy.toDouble / sx.toDouble
    val loo = per.map { case (_, y, x) =>
      (sy - y).toDouble / (sx - x).toDouble }
    val h = loo.length
    val rbar = loo.sum / h.toDouble
    val se = math.sqrt(((h - 1).toDouble / h.toDouble) *
      loo.map(r => (r - rbar) * (r - rbar)).sum)
    assert(out.getLong(0) === 200L && out.getLong(1) === h.toLong)
    assert(math.abs(out.getDouble(2) - ratio) < 1e-12)
    assert(math.abs(out.getDouble(3) - se) < 1e-12)
    assert(math.abs(out.getDouble(4) - (ratio - 1.96 * se)) < 1e-9)
    assert(math.abs(out.getDouble(5) - (ratio + 1.96 * se)) < 1e-9)
  }

  test("jackknifeRatio degenerate designs report NULL, never garbage") {
    // one unit → one bucket → h = 1 → ratio present, se NULL
    val one = Seq(("u1", 5L, 1L), ("u1", 7L, 1L))
      .toDF("user_id", "cents", "one")
    val r1 = Analytics.jackknifeRatio(one, "user_id", "cents", "one", 4)
      .collect()(0)
    assert(r1.getLong(1) === 1L)
    assert(math.abs(r1.getDouble(2) - 6.0) < 1e-12)
    assert(r1.isNullAt(3) && r1.isNullAt(4) && r1.isNullAt(5))
    // zero total denominator → NULL ratio
    val zx = Seq(("u1", 5L, 0L), ("u2", 7L, 0L))
      .toDF("user_id", "cents", "one")
    val r2 = Analytics.jackknifeRatio(zx, "user_id", "cents", "one", 4)
      .collect()(0)
    assert(r2.isNullAt(2) && r2.isNullAt(3))
    // a bucket holding ALL denominator mass → its replicate undefined →
    // honest NULL se (ratio still reported)
    val lop = Seq(("u1", 10L, 2L), ("u2", 3L, 0L))
      .toDF("user_id", "cents", "one")
    val r3 = Analytics.jackknifeRatio(lop, "user_id", "cents", "one", 4)
      .collect()(0)
    assert(math.abs(r3.getDouble(2) - 6.5) < 1e-12)
    assert(r3.isNullAt(3))
  }

  // ── prCurve ────────────────────────────────────────────────────────────

  test("prCurve: hand golden with ties; AP matches step integral") {
    // scores desc: 0.9 (2 rows, 2 pos), 0.7 (2 rows, 1 pos), 0.5 (1 row, 0 pos)
    val df = Seq((0.9, true), (0.9, true), (0.7, true), (0.7, false),
      (0.5, false)).toDF("s", "y")
    val out = Analytics.prCurve(df, "s", "y", deterministic = true)
      .orderBy(col("threshold").desc).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // P = 3: t=0.9 → tp=2 fp=0 prec=1 rec=2/3; t=0.7 → tp=3 fp=1
    // prec=.75 rec=1; t=0.5 → tp=3 fp=2 prec=.6 rec=1
    assert(out.length === 3)
    assert(out(0) === ((0.9, 2L, 0L, 1.0, 2.0 / 3.0, out(0)._6)))
    assert(out(1)._2 === 3L && out(1)._3 === 1L && out(1)._4 === 0.75 &&
      out(1)._5 === 1.0)
    assert(out(2)._2 === 3L && out(2)._3 === 2L && out(2)._4 === 0.6)
    // AP = Σ pos_i·prec_i / P = (2·1.0 + 1·0.75 + 0·0.6) / 3
    assert(math.abs(out(0)._6 - (2.0 * 1.0 + 1.0 * 0.75) / 3.0) < 1e-12)
    assert(out.map(_._6).distinct.length === 1) // ap constant
  }

  test("prCurve: partition-invariant; rejects all-negative labels") {
    val rows = (1 to 300).map(i =>
      (((i * 7) % 50).toDouble / 50.0, i % 3 == 0))
    def run(parts: Int) = Analytics.prCurve(
        rows.toDF("s", "y").repartition(parts), "s", "y",
        deterministic = true)
      .orderBy(col("threshold").desc).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        math.rint(r.getDouble(5) * 1e10))).toSeq
    assert(run(1) === run(13))
    intercept[IllegalArgumentException] {
      Analytics.prCurve(Seq((0.5, false)).toDF("s", "y"), "s", "y")
    }
  }

  // ── welchTTest ─────────────────────────────────────────────────────────

  test("welchTTest: textbook closed form on hand data") {
    // A: 1,2,3,4 (mean 2.5, var 5/3); B: 2,4,6 (mean 4, var 4)
    val df = (Seq(1.0, 2.0, 3.0, 4.0).map(("A", _)) ++
      Seq(2.0, 4.0, 6.0).map(("B", _))).toDF("g", "v")
    val r = Analytics.welchTTest(df, "g", "v", "A", "B").collect()(0)
    assert(r.getLong(0) === 4L && r.getLong(1) === 3L)
    assert(math.abs(r.getDouble(2) - 2.5) < 1e-9)
    assert(math.abs(r.getDouble(3) - 4.0) < 1e-9)
    val va = 5.0 / 3.0; val vb = 4.0
    assert(math.abs(r.getDouble(4) - va) < 1e-9)
    assert(math.abs(r.getDouble(5) - vb) < 1e-9)
    val (sa, sb) = (va / 4.0, vb / 3.0)
    val t = (2.5 - 4.0) / math.sqrt(sa + sb)
    val dfW = ((sa + sb) * (sa + sb)) /
      ((sa * sa) / 3.0 + (sb * sb) / 2.0)
    assert(math.abs(r.getDouble(6) - t) < 1e-9)
    assert(math.abs(r.getDouble(7) - dfW) < 1e-9)
  }

  // ── srmCheck ───────────────────────────────────────────────────────────

  test("srmCheck: chi-square GOF hand golden; unexpected arms flagged") {
    // designed 50/50, observed 60/40 → chi2 = (60-50)²/50 + (40-50)²/50 = 4
    val df = (Seq.fill(60)("a") ++ Seq.fill(40)("b") ++ Seq.fill(3)("junk"))
      .toDF("arm")
    val out = Analytics.srmCheck(df, "arm", Map("a" -> 0.5, "b" -> 0.5))
      .orderBy("arm").collect()
    assert(out.length === 2)
    assert(out(0).getString(0) === "a" && out(0).getLong(1) === 60L)
    assert(out(0).getDouble(2) === 50.0)
    assert(math.abs(out(0).getDouble(3) - 2.0) < 1e-12)
    assert(out(0).getLong(4) === 100L)      // n excludes junk
    assert(out(0).getLong(5) === 3L)        // n_unexpected
    assert(math.abs(out(0).getDouble(6) - 4.0) < 1e-12)
    assert(out(0).getLong(7) === 1L)        // dof
    // a designed arm with zero observations still contributes
    val miss = Seq.fill(10)("a").toDF("arm")
    val m = Analytics.srmCheck(miss, "arm", Map("a" -> 0.5, "b" -> 0.5))
      .orderBy("arm").collect()
    // E = 5 each: chi2 = (10-5)²/5 + (0-5)²/5 = 10
    assert(math.abs(m(0).getDouble(6) - 10.0) < 1e-12)
    assert(m(1).getLong(1) === 0L)
  }

  test("srmCheck: rejects ratios that do not sum to 1") {
    intercept[IllegalArgumentException] {
      Analytics.srmCheck(Seq("a").toDF("arm"), "arm", Map("a" -> 0.7))
    }
  }

  // ── logRankTest ────────────────────────────────────────────────────────

  test("logRankTest: textbook hand computation with censoring") {
    // A: events at t=1,2; B: event at t=2, censored at t=3
    val df = Seq(("A", 1L, true), ("A", 2L, true),
      ("B", 2L, true), ("B", 3L, false)).toDF("g", "t", "e")
    val r = Analytics.logRankTest(df, "t", "e", "g", "A", "B").collect()(0)
    // t=1: n1=2 n2=2 d1=1 d2=0 → e1=1·2/4=.5, v=1·2·2·3/(16·3)=.25
    // t=2: n1=1 n2=2 d1=1 d2=1 → e1=2·1/3, v=2·1·2·1/(9·2)=2/9
    assert(r.getLong(0) === 2L)                  // n_times
    assert(r.getLong(1) === 2L)                  // o1
    assert(math.abs(r.getDouble(2) - (0.5 + 2.0 / 3.0)) < 1e-12)
    assert(math.abs(r.getDouble(3) - (0.25 + 2.0 / 9.0)) < 1e-12)
    val chi2 = (2.0 - (0.5 + 2.0 / 3.0)) * (2.0 - (0.5 + 2.0 / 3.0)) /
      (0.25 + 2.0 / 9.0)
    assert(math.abs(r.getDouble(4) - chi2) < 1e-12)
  }

  test("logRankTest: identical groups → O=E; V=0 → NULL chi2") {
    // mirror-image groups: expectations match observations exactly
    val same = Seq(("A", 1L, true), ("A", 2L, true),
      ("B", 1L, true), ("B", 2L, true)).toDF("g", "t", "e")
    val r = Analytics.logRankTest(same, "t", "e", "g", "A", "B").collect()(0)
    assert(math.abs(r.getLong(1).toDouble - r.getDouble(2)) < 1e-12)
    // single subject per group at one time → n=2, but a lone event time
    // with d=n makes v>0; a V=0 design: both die at the only time with
    // n(t)=d(t) and n(t)-d(t)=0 → v=0 → NULL
    val v0 = Seq(("A", 5L, true), ("B", 5L, true)).toDF("g", "t", "e")
    val z = Analytics.logRankTest(v0, "t", "e", "g", "A", "B").collect()(0)
    assert(z.isNullAt(4))
  }

  // ── markovAttribution ──────────────────────────────────────────────────

  test("markovAttribution: hand absorption chain and removal effects") {
    def t(sec: Int) = new java.sql.Timestamp(sec.toLong * 1000L)
    // u1: A → conv; u2: A → B (no conv); u3: B → conv
    val ev = Seq(
      (1L, t(1), "A"), (1L, t(2), "buy"),
      (2L, t(1), "A"), (2L, t(2), "B"),
      (3L, t(1), "B"), (3L, t(2), "buy"))
      .toDF("u", "ts", "et").withColumn("oid", monotonically_increasing_id())
    val out = Analytics.markovAttribution(ev, "u", "ts", "et", "oid",
        convType = "buy", rounds = 6)
      .orderBy("channel").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // P(conv) = 2/3·(1/2 + 1/2·1/2) + 1/3·1/2 = 2/3
    // remove A: 1/3·1/2 = 1/6 → effect 1/2; remove B: 2/3·1/2 = 1/3 →
    // effect 1/3; shares 3/5 and 2/5; touches A=2, B=2
    assert(out.map(_._1).toSeq === Seq("A", "B"))
    assert(out(0)._2 === 2L && out(1)._2 === 2L)
    out.foreach(o => assert(math.abs(o._3 - 2.0 / 3.0) < 1e-12))
    assert(math.abs(out(0)._4 - 1.0 / 6.0) < 1e-12)
    assert(math.abs(out(0)._5 - 0.5) < 1e-12)
    assert(math.abs(out(1)._4 - 1.0 / 3.0) < 1e-12)
    assert(math.abs(out(1)._5 - 1.0 / 3.0) < 1e-12)
    assert(math.abs(out(0)._6 - 0.6) < 1e-12)
    assert(math.abs(out(1)._6 - 0.4) < 1e-12)
  }

  test("markovAttribution: events after first conversion are ignored") {
    def t(sec: Int) = new java.sql.Timestamp(sec.toLong * 1000L)
    // post-conversion touches must not earn credit
    val ev = Seq(
      (1L, t(1), "A"), (1L, t(2), "buy"), (1L, t(3), "C"), (1L, t(4), "C"))
      .toDF("u", "ts", "et").withColumn("oid", monotonically_increasing_id())
    val out = Analytics.markovAttribution(ev, "u", "ts", "et", "oid",
        convType = "buy", rounds = 4)
      .collect().map(r => r.getString(0))
    assert(out.toSeq === Seq("A")) // C never appears as a channel
  }

  // ── confidenceSequence ─────────────────────────────────────────────────

  test("confidenceSequence: hand boundary; constant values covered always") {
    def t(day: Int, i: Int) = new java.sql.Timestamp(
      day.toLong * 86400000L + i.toLong * 1000L)
    // constant value 0.5 in [0,1]: mean exact at every look, and the CS
    // must contain it at every day (the anytime guarantee, trivially)
    val rows = (0 until 4).flatMap(d =>
      (1 to 25).map(i => ("a", t(d, i), 0.5)))
    val out = Analytics.confidenceSequence(rows.toDF("arm", "ts", "v"),
        "arm", "ts", "v", lo = 0.0, hi = 1.0, alpha = 0.05)
      .orderBy("day").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(out.length === 4)
    assert(out.map(_._2).toSeq === Seq(25L, 50L, 75L, 100L))
    out.foreach { case (_, n, mean, half, lo2, hi2) =>
      assert(mean === 0.5)
      assert(lo2 <= 0.5 && hi2 >= 0.5)
      // hand boundary: (hi-lo)·sqrt(ln(2π²t²/(6α)) / 2t)
      val tD = n.toDouble
      val want = math.sqrt(math.log(
        2.0 * math.Pi * math.Pi * tD * tD / (6.0 * 0.05)) / (2.0 * tD))
      assert(math.abs(half - want) < 1e-12)
    }
    // the boundary SHRINKS with more data
    out.sliding(2).foreach { case Array(a, b) => assert(b._4 < a._4) }
    // out-of-range data voids the guarantee → reject, don't lie
    intercept[IllegalArgumentException] {
      Analytics.confidenceSequence(
        Seq(("a", t(0, 1), 2.0)).toDF("arm", "ts", "v"),
        "arm", "ts", "v", lo = 0.0, hi = 1.0)
    }
  }

  // ── exactMatchedATT ────────────────────────────────────────────────────

  test("exactMatchedATT: hand strata; unmatched treated counted not used") {
    val df = Seq(
      // stratum A: treated mean 10, control mean 4 → diff 6, nt=2
      ("A", true, 8.0), ("A", true, 12.0), ("A", false, 4.0),
      // stratum B: treated mean 3, control mean 1 → diff 2, nt=1
      ("B", true, 3.0), ("B", false, 0.0), ("B", false, 2.0),
      // stratum C: treated only → unmatched (2 rows dropped)
      ("C", true, 99.0), ("C", true, 99.0),
      // stratum D: control only → contributes nothing
      ("D", false, 7.0)).toDF("k", "treat", "v")
    val r = Analytics.exactMatchedATT(df, Seq("k"), "treat", "v",
      deterministic = true).collect()(0)
    assert(r.getLong(0) === 2L)        // A, B matched
    assert(r.getLong(1) === 3L)        // nt = 2 + 1
    assert(r.getLong(2) === 2L)        // C's treated rows
    // ATT = (2·6 + 1·2) / 3
    assert(math.abs(r.getDouble(3) - 14.0 / 3.0) < 1e-9)
    // no matched treated → NULL att
    val none = Seq(("A", false, 1.0), ("B", true, 2.0)).toDF("k", "treat", "v")
    assert(Analytics.exactMatchedATT(none, Seq("k"), "treat", "v")
      .collect()(0).isNullAt(3))
  }

  // ── funnelTimings ──────────────────────────────────────────────────────

  test("funnelTimings: hand delays under min-time funnel semantics") {
    def t(sec: Int) = new java.sql.Timestamp(sec.toLong * 1000L)
    val ev = Seq(
      // u1: view@0 → click@10 → purchase@40 (delays 10s, 30s)
      (1L, t(0), "view"), (1L, t(10), "click"), (1L, t(40), "purchase"),
      // u2: view@0 → click@20; a click BEFORE the view must not count
      (2L, t(5), "view"), (2L, t(2), "click"), (2L, t(25), "click"),
      // u3: click only → reaches nothing (no view first)
      (3L, t(0), "click")).toDF("u", "ts", "et")
    val out = Analytics.funnelTimings(ev, "u", "ts", "et",
        Seq("view", "click", "purchase"), qs = Seq(0.5, 1.0))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    // step 1 (click): u1 delay 10s, u2 delay 20s → n=2,
    //   p50 = rank ceil(.5·2)=1 → 10s; p100 = 20s
    val s1 = out.filter(_._1 === 1L)
    assert(s1.forall(x => x._2 === "click" && x._3 === 2L))
    assert(s1.find(_._4 === 0.5).get._5 === 10000000L)
    assert(s1.find(_._4 === 1.0).get._5 === 20000000L)
    // step 2 (purchase): only u1, delay 30s
    val s2 = out.filter(_._1 === 2L)
    assert(s2.forall(x => x._3 === 1L && x._5 === 30000000L))
  }

  test("funnelTimings: step counts match funnel's exactly") {
    val rows = (1 to 200).flatMap { i =>
      def t(sec: Int) = new java.sql.Timestamp(sec.toLong * 1000L)
      Seq((i.toLong, t(i), "view")) ++
        (if (i % 2 == 0) Seq((i.toLong, t(i + 5), "click")) else Nil) ++
        (if (i % 6 == 0) Seq((i.toLong, t(i + 9), "purchase")) else Nil)
    }
    val df = rows.toDF("u", "ts", "et")
    val steps = Seq("view", "click", "purchase")
    val fn = Analytics.funnel(df, "u", "ts", "et", steps)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val ft = Analytics.funnelTimings(df, "u", "ts", "et", steps,
        qs = Seq(0.5))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ft(1L) === fn(1L) && ft(2L) === fn(2L))
  }

  // ── poissonSpikeBound ──────────────────────────────────────────────────

  test("poissonSpikeBound: Chernoff closed form; spike flagged, baseline not") {
    def ts(day: Int, i: Int) = new java.sql.Timestamp(
      day.toLong * 86400000L + i.toLong * 1000L)
    // key k1: 10 events on day 0, 10 on day 1, 100 on day 2 (spike);
    // key k2: one day only → NULL lambda
    val rows = (1 to 10).map(i => ("k1", ts(0, i))) ++
      (1 to 10).map(i => ("k1", ts(1, i))) ++
      (1 to 100).map(i => ("k1", ts(2, i))) ++
      (1 to 5).map(i => ("k2", ts(0, i)))
    val out = Analytics.poissonSpikeBound(rows.toDF("k", "ts"), "k", "ts",
        alpha = 0.001)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) Double.NaN else r.getDouble(3),
          if (r.isNullAt(4)) Double.NaN else r.getDouble(4),
          if (r.isNullAt(5)) None else Some(r.getBoolean(5)))).toMap
    // day 2: λ = (120-100)/2 = 10, x = 100 → bound = exp(90 + 100·ln(0.1))
    val spike = out(("k1", 2L))
    assert(spike._1 === 100L && spike._2 === 10.0)
    val want = math.exp((100.0 - 10.0) + 100.0 * math.log(10.0 / 100.0))
    assert(math.abs(spike._3 - want) < 1e-15)
    assert(spike._4 === Some(true))
    // day 0: λ = (120-10)/2 = 55 > x=10 → bound 1.0, not flagged
    val base = out(("k1", 0L))
    assert(base._2 === 55.0 && base._3 === 1.0 && base._4 === Some(false))
    // single-day key: NULL lambda/bound/flag
    val k2 = out(("k2", 0L))
    assert(k2._2.isNaN && k2._3.isNaN && k2._4.isEmpty)
  }

  test("welchTTest: degenerate designs report NULL t/df") {
    // missing side
    val solo = Seq(("A", 1.0), ("A", 2.0)).toDF("g", "v")
    assert(Analytics.welchTTest(solo, "g", "v", "A", "B").collect()(0)
      .isNullAt(6))
    // n < 2 on one side
    val tiny = Seq(("A", 1.0), ("A", 2.0), ("B", 5.0)).toDF("g", "v")
    assert(Analytics.welchTTest(tiny, "g", "v", "A", "B").collect()(0)
      .isNullAt(6))
    // both variances zero
    val flat = Seq(("A", 1.0), ("A", 1.0), ("B", 2.0), ("B", 2.0))
      .toDF("g", "v")
    assert(Analytics.welchTTest(flat, "g", "v", "A", "B").collect()(0)
      .isNullAt(6))
  }
}
