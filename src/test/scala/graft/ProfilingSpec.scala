package graft

import graft.operators.Profiling
import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  // ── profileTable ─────────────────────────────────────────────────────

  private lazy val mixed = Seq(
    (1L, Some("aa"), Some(1.5)),
    (2L, Some("bbbb"), Some(-2.0)),
    (3L, None, Some(1.5)),
    (4L, Some("aa"), None)).toDF("id", "s", "x")

  test("profileTable: exact stats per column kind") {
    val out = Profiling.profileTable(mixed, Seq("id", "s", "x"))
      .collect().map(r => r.getString(0) -> r).toMap
    val id = out("id")
    assert(id.getLong(1) === 4L)            // n_rows
    assert(id.getLong(2) === 0L)            // n_nulls
    assert(id.getLong(3) === 4L)            // n_distinct
    assert(id.getDouble(4) === 1.0 && id.getDouble(5) === 4.0)
    assert(id.isNullAt(6) && id.isNullAt(7) && id.isNullAt(8))
    val s = out("s")
    assert(s.getLong(2) === 1L)             // one null
    assert(s.getLong(3) === 2L)             // aa, bbbb
    assert(s.isNullAt(4) && s.isNullAt(5))
    assert(s.getString(6) === "aa" && s.getString(7) === "bbbb")
    assert(s.getDouble(8) === 2.666667)  // round(mean non-null len, 6)
    val x = out("x")
    assert(x.getLong(2) === 1L && x.getLong(3) === 2L)
    assert(x.getDouble(4) === -2.0 && x.getDouble(5) === 1.5)
  }

  test("profileTable: production path (approx distinct) plans NO Expand") {
    val exact = Profiling.profileTable(mixed, Seq("id", "s", "x"),
      exactDistinct = true)
    val approx = Profiling.profileTable(mixed, Seq("id", "s", "x"),
      exactDistinct = false)
    // the exact path pays the multi-count-distinct Expand (oracle only);
    // the production profile must stay a single un-expanded pass
    assert(planOf(exact).contains("Expand"))
    assert(!planOf(approx).contains("Expand"),
      s"approx profile should not Expand:\n${planOf(approx)}")
    // approx distinct is still exact at these tiny cardinalities
    val a = approx.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(a === Map("id" -> 4L, "s" -> 2L, "x" -> 2L))
  }

  test("profileDiff: added/removed/changed/unchanged classification") {
    val a = Seq((1L, "x", 1.5), (2L, "y", 2.5)).toDF("id", "s", "v")
    val b = Seq((1L, "p", 1.5), (2L, "q", 9.0)).toDF("id", "t", "v")
    val out = Profiling.profileDiff(a, Seq("id", "s", "v"),
        b, Seq("id", "t", "v"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out === Map("id" -> "unchanged", "s" -> "removed",
      "t" -> "added", "v" -> "changed"))
  }

  // ── constraint suite ─────────────────────────────────────────────────

  test("checkConstraints: pk duplicates, fk orphans, and predicate nulls count") {
    val child = Seq((1L, 10L), (1L, 10L), (2L, 99L), (3L, 0L))
      .toDF("id", "fk")
      .withColumn("fk", when(col("fk") === 0L, lit(null)).otherwise(col("fk")))
    val parent = Seq(10L, 11L).toDF("pk")
    val out = Profiling.checkConstraints(Seq(
        Profiling.pkUniqueCheck("pk", child, Seq("id")),
        Profiling.fkCoveredCheck("fk", child, "fk", parent, "pk")) ++
        Profiling.predicateChecks(child, Seq(
          "id_pos" -> (col("id") > 0L),
          "fk_range" -> (col("fk") < 50L))))  // NULL fk -> violation
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(out("pk") === ((1L, false)))       // one surplus duplicate row
    assert(out("fk") === ((1L, false)))       // fk=99 orphan; NULL fk exempt
    assert(out("id_pos") === ((0L, true)))
    // fk=99 fails the range AND the NULL fk counts (conservative audit)
    assert(out("fk_range") === ((2L, false)))
  }

  test("pkUniqueCheck: composite keys") {
    val df = Seq((1L, 1), (1L, 2), (1L, 2)).toDF("a", "b")
    val out = Profiling.checkConstraints(
      Seq(Profiling.pkUniqueCheck("c", df, Seq("a", "b")))).collect()
    assert(out.head.getLong(1) === 1L)
  }

  // ── key-skew report ──────────────────────────────────────────────────

  test("keySkewReport: ranks, shares, and max/mean skew ratio") {
    // key 7 -> 6 rows, key 1 -> 2, keys 2..4 -> 1 each; 10 rows, 5 keys
    val df = (Seq.fill(6)(7) ++ Seq(1, 1, 2, 3, 4)).toDF("k")
    val out = Profiling.keySkewReport(df.withColumn("k", col("k").cast("long")),
        "k", k = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5)))
    assert(out.length === 3)
    assert(out(0)._1 === 1 && out(0)._2 === 7L && out(0)._3 === 6L)
    assert(out(0)._4 === 0.545455)   // round(6/11, 6)
    assert(out(0)._5 === 5L)
    assert(out(0)._6 === 2.727273)   // round(6 * (5/11), 6)
    assert(out(1)._2 === 1L && out(1)._3 === 2L)  // next heaviest
    assert(out(2)._3 === 1L)                      // ties broken by key asc
    assert(out(2)._2 === 2L)
  }

  // ── KS drift ─────────────────────────────────────────────────────────

  test("ksDrift: identical samples -> 0, disjoint -> 1, hand golden with tie-break") {
    def f(xs: Seq[Double]) = xs.toDF("x")
    val same = Profiling.ksDrift(f(Seq(1, 2, 3)), f(Seq(1, 2, 3)), "x").first()
    assert(same.getDouble(0) === 0.0)
    val disj = Profiling.ksDrift(f(Seq(1, 2)), f(Seq(5, 6)), "x").first()
    assert(disj.getDouble(0) === 1.0 && disj.getDouble(1) === 2.0)
    // a={1,2}, b={2,3}: |F1-F2| = 0.5 at v=1 and v=2 -> tie breaks to v=1
    val g = Profiling.ksDrift(f(Seq(1, 2)), f(Seq(2, 3)), "x").first()
    assert(g.getDouble(0) === 0.5 && g.getDouble(1) === 1.0)
    assert(g.getLong(2) === 2L && g.getLong(3) === 2L)
  }

  test("ksDrift: partition-invariant (distributed cumsum exactness)") {
    val a = (1 to 500).map(i => (i % 37).toDouble).toDF("x")
    val b = (1 to 400).map(i => (i % 23).toDouble).toDF("x")
    val r1 = Profiling.ksDrift(a, b, "x").first()
    val r2 = Profiling.ksDrift(a.repartition(13), b.repartition(7), "x").first()
    assert(r1.getDouble(0) === r2.getDouble(0))
    assert(r1.getDouble(1) === r2.getDouble(1))
  }

  // ── histogram ────────────────────────────────────────────────────────

  test("histogram: exact bin assignment, empty bins, max lands in last bin") {
    val df = Seq(0.0, 1.0, 2.5, 9.99, 10.0).toDF("v")
    val out = Profiling.histogram(df, "v", bins = 4)
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toMap
    assert(out.keySet === Set(0, 1, 2, 3))            // full spine
    assert(out(0) === ((0.0, 2.5, 2L)))               // 0.0, 1.0
    assert(out(1) === ((2.5, 5.0, 1L)))               // 2.5
    assert(out(2)._3 === 0L)                          // empty bin kept
    assert(out(3) === ((7.5, 10.0, 2L)))              // 9.99 and max=10.0 clamped
  }

  test("histogram: constant column lands entirely in bin 0") {
    val df = Seq(5.0, 5.0, 5.0).toDF("v")
    val out = Profiling.histogram(df, "v", bins = 3)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(out === Map(0 -> 3L, 1 -> 0L, 2 -> 0L))
  }

  // ── Benford audit ────────────────────────────────────────────────────

  test("benfordCheck: exact digit counts, spine completeness, chi2 golden") {
    // 19 -> 1, 2.5 -> 2, 200 -> 2, 0.5 filtered (< 1), 9.99 -> 9
    val df = Seq(19.0, 2.5, 200.0, 0.5, 9.99).toDF("v")
    val out = Profiling.benfordCheck(df, "v")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.keySet === (1 to 9).toSet)          // full spine
    assert(out(1)._1 === 1L && out(2)._1 === 2L && out(9)._1 === 1L)
    assert(out(3)._1 === 0L)                       // absent digit present as 0
    assert(out(1)._2 === 0.25)                     // 1 of 4 kept values
    assert(math.abs(out(1)._3 - math.log10(2.0)) < 1e-15)
    // chi2 equals the hand fold over the nine digit cells
    val n = 4.0
    val expChi = (1 to 9).map { d =>
      val e = math.log10(1.0 + 1.0 / d)
      val c = out(d)._1.toDouble
      ((c - n * e) * (c - n * e)) / (n * e)
    }.sum
    assert(math.abs(out(5)._4 - expChi) < 1e-9)
  }

  test("benfordCheck: chi2 separates Benford data from single-digit data") {
    // 2^k leading digits follow Benford (chi2 well inside the 8-dof band);
    // a same-magnitude block (all leading digit 1) must score far higher
    val benford = (0 until 64).map(k => math.pow(2.0, k)).toDF("v")
    val chiB = Profiling.benfordCheck(benford, "v").first().getDouble(4)
    assert(chiB < 8.0, s"chi2 too high for Benford data: $chiB")
    val block = (1000 until 1064).map(_.toDouble).toDF("v")
    val chiU = Profiling.benfordCheck(block, "v").first().getDouble(4)
    assert(chiU > 100.0, s"single-digit data should blow up chi2: $chiU")
  }

  // ── exact correlation matrix ─────────────────────────────────────────

  test("integerCorrelationMatrix: perfect, inverse, and hand-computed r") {
    val df = Seq((1L, 2L, 5L), (2L, 4L, 4L), (3L, 6L, 3L), (4L, 8L, 1L))
      .toDF("x", "y", "z")
    val out = Profiling.integerCorrelationMatrix(df, Seq(
        "x" -> col("x"), "y" -> col("y"), "z" -> col("z")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    // y = 2x exactly; sqrt rounding leaves r one ulp shy of 1.0
    assert(math.abs(out(("x", "y")) - 1.0) < 1e-15)
    assert(math.abs(out(("x", "z")) + 0.9827076298239908) < 1e-12)
    assert(out(("y", "z")) === out(("x", "z")))  // scaling invariance
  }

  test("keySkewReport: top-k is a heap (TakeOrderedAndProject), never a global sort") {
    // needs more keys than k: a LocalRelation with maxRows <= k lets
    // Catalyst eliminate the limit entirely (and with it the TakeOrdered)
    val df = spark.range(1000).selectExpr("id % 100 AS k")
    val plan = planOf(Profiling.keySkewReport(df.toDF(), "k", k = 5))
    assert(plan.contains("TakeOrderedAndProject"), s"no heap top-k:\n$plan")
  }

  // ── join-cardinality forecast ────────────────────────────────────────

  test("joinCardinality: exact product-sum and hot key") {
    val a = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")     // counts 3,1,1
    val b = Seq(1L, 1L, 2L, 9L).toDF("j")         // counts 2,1 (9 uncommon)
    val r = Profiling.joinCardinality(a, "k", b, "j").first()
    // common keys 1,2: 3*2 + 1*1 = 7; hot key 1 with 6
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 7L, 1L, 6L)))
    // the forecast must equal the actual join size
    assert(a.join(b, col("k") === col("j")).count() === 7L)
  }

  // ── mutual information ───────────────────────────────────────────────

  test("mutualInformation: identical -> NMI 1, independent -> MI exactly 0") {
    val ident = (1 to 60).map(i => (s"v${i % 3}", s"v${i % 3}")).toDF("x", "y")
    val r1 = Profiling.mutualInformation(ident, "x", "y",
      deterministic = true).first()
    assert(math.abs(r1.getDouble(1) - math.log(3.0)) < 1e-12)  // MI = H
    assert(math.abs(r1.getDouble(4) - 1.0) < 1e-12)            // NMI = 1
    // balanced product distribution: every cell p(x,y) = p(x)p(y) exactly
    val indep = (0 until 60).map(i => (s"a${i % 2}", s"b${i % 3}")).toDF("x", "y")
    val r2 = Profiling.mutualInformation(indep, "x", "y",
      deterministic = true).first()
    assert(math.abs(r2.getDouble(1)) < 1e-15)
    assert(math.abs(r2.getDouble(2) - math.log(2.0)) < 1e-12)
    assert(math.abs(r2.getDouble(3) - math.log(3.0)) < 1e-12)
  }

  test("mutualInformation: deterministic ≈ production") {
    val df = (1 to 500).map(i => (s"x${i % 7}", s"y${(i * i) % 5}"))
      .toDF("x", "y")
    val a = Profiling.mutualInformation(df, "x", "y", deterministic = true)
      .first()
    val b = Profiling.mutualInformation(df, "x", "y").first()
    assert(math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-9)
    assert(math.abs(a.getDouble(4) - b.getDouble(4)) < 1e-9)
  }

  // ── id gaps ──────────────────────────────────────────────────────────

  test("idGapReport: maximal interior holes per group; dups and density clean") {
    val rows = Seq("a" -> 1L, "a" -> 2L, "a" -> 3L, "a" -> 7L, "a" -> 8L,
      "a" -> 10L, "a" -> 10L, // duplicate id must not corrupt islands
      "b" -> 5L, "b" -> 6L, "b" -> 7L) // dense group: no gaps
    val out = Profiling.idGapReport(rows.toDF("g", "id"), "g", "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(out === Set(("a", 4L, 6L, 3L), ("a", 9L, 9L, 1L)))
    // partition-invariant
    val again = Profiling.idGapReport(
        rows.toDF("g", "id").repartition(7), "g", "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(again === out)
  }

  // ── chi-square independence ──────────────────────────────────────────

  test("chiSquareIndependence: product distribution -> chi2 exactly 0") {
    // counts 10/20/30/60: every observed cell equals its expected count
    val rows = Seq.fill(10)(("a", "u")) ++ Seq.fill(20)(("a", "v")) ++
      Seq.fill(30)(("b", "u")) ++ Seq.fill(60)(("b", "v"))
    val r = Profiling.chiSquareIndependence(rows.toDF("x", "y"), "x", "y",
      deterministic = true).first()
    assert(r.getLong(0) === 120L)
    assert(r.getLong(3) === 1L)              // dof (2-1)(2-1)
    assert(math.abs(r.getDouble(4)) < 1e-12) // chi2 = 0
    assert(math.abs(r.getDouble(5)) < 1e-12) // V = 0
  }

  test("chiSquareIndependence: perfect 2x2 association -> chi2 = n, V = 1") {
    // diagonal-only cells exercise the closed-form zero-cell correction
    val rows = Seq.fill(50)(("a", "u")) ++ Seq.fill(50)(("b", "v"))
    val r = Profiling.chiSquareIndependence(rows.toDF("x", "y"), "x", "y",
      deterministic = true).first()
    assert(math.abs(r.getDouble(4) - 100.0) < 1e-9)
    assert(math.abs(r.getDouble(5) - 1.0) < 1e-12)
  }

  test("chiSquareIndependence: single-category axis -> NULL V; det ≈ prod") {
    val degen = (1 to 30).map(i => (s"x${i % 3}", "only")).toDF("x", "y")
    val r = Profiling.chiSquareIndependence(degen, "x", "y").first()
    assert(r.getLong(3) === 0L)   // dof
    assert(r.isNullAt(5))         // V undefined
    val df = (1 to 500).map(i => (s"x${i % 7}", s"y${(i * i) % 5}"))
      .toDF("x", "y")
    val a = Profiling.chiSquareIndependence(df, "x", "y",
      deterministic = true).first()
    val b = Profiling.chiSquareIndependence(df, "x", "y").first()
    assert(math.abs(a.getDouble(4) - b.getDouble(4)) < 1e-9)
    assert(math.abs(a.getDouble(5) - b.getDouble(5)) < 1e-9)
  }

  // ── table fingerprint ────────────────────────────────────────────────

  test("tableFingerprint: order/partition-invariant; multiplicity-exact") {
    val base = Seq(("g", 1L, "r"), ("g", 1L, "r"), ("g", 2L, "s"))
    val fp = Profiling.tableFingerprint(base.toDF("grp", "id", "v"),
        Seq("grp"), Seq("id", "v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).head
    assert(fp._2 === 3L && fp._3 === 2L)
    // same multiset, reversed order, different partitioning → identical
    val fp2 = Profiling.tableFingerprint(
        base.reverse.toDF("grp", "id", "v").repartition(7),
        Seq("grp"), Seq("id", "v"))
      .collect().map(r => r.getLong(3)).head
    assert(fp2 === fp._4)
    // the XOR-cancellation trap: {R,R,S} must differ from {S} AND from
    // {T,T,S} (same counts, different duplicated row)
    val justS = Profiling.tableFingerprint(
        Seq(("g", 2L, "s")).toDF("grp", "id", "v"), Seq("grp"), Seq("id", "v"))
      .collect().head.getLong(3)
    val ttS = Profiling.tableFingerprint(
        Seq(("g", 9L, "t"), ("g", 9L, "t"), ("g", 2L, "s"))
          .toDF("grp", "id", "v"), Seq("grp"), Seq("id", "v"))
      .collect().head.getLong(3)
    assert(justS !== fp._4)
    assert(ttS !== fp._4)
    // null and empty string must not collide (concat_ws skips nulls —
    // the pre-coalesce sentinel is what keeps them apart)
    val withNull = Profiling.tableFingerprint(
        Seq(("g", Option.empty[String])).toDF("grp", "v"), Seq("grp"), Seq("v"))
      .collect().head.getLong(3)
    val withEmpty = Profiling.tableFingerprint(
        Seq(("g", Option(""))).toDF("grp", "v"), Seq("grp"), Seq("v"))
      .collect().head.getLong(3)
    assert(withNull !== withEmpty)
  }

  // ── PSI ──────────────────────────────────────────────────────────────

  test("psi: identical distributions score ~0, shifted distribution alarms") {
    val ref = (1 to 1000).map(_.toDouble).toDF("v")
    val sameOut = Profiling.psi(ref, ref, "v", bins = 10).collect()
    assert(sameOut.length === 10)
    assert(sameOut.forall(_.getDouble(5) < 1e-9))   // psi ~ 0
    // equal-population reference bins: 100 per bin
    assert(sameOut.forall(_.getLong(1) === 100L))
    // hard shift: current entirely above the reference range
    val cur = (2000 to 2500).map(_.toDouble).toDF("v")
    val shifted = Profiling.psi(ref, cur, "v", bins = 10).first().getDouble(5)
    assert(shifted > 0.25, s"hard shift must alarm, psi=$shifted")
  }

  test("psi: empty current bins survive via smoothing (finite psi)") {
    val ref = (1 to 100).map(_.toDouble).toDF("v")
    val cur = Seq(50.0, 51.0, 52.0).toDF("v")   // most bins empty
    val out = Profiling.psi(ref, cur, "v", bins = 10).collect()
    assert(out.forall(r => !r.getDouble(5).isInfinite && !r.getDouble(5).isNaN))
  }

  // ── totals reconciliation ────────────────────────────────────────────

  test("reconcileTotals: matches, orphans, mismatches, exact cents") {
    val parents = Seq((1L, 10.00), (2L, 5.50), (3L, 9.99))
      .toDF("pk", "total")
    val children = Seq((1L, 4.00), (1L, 6.00),  // matches exactly
      (2L, 5.00))                               // 50 cents short
    .toDF("fk", "amt")                          // pk 3 has no children
    val r = Profiling.reconcileTotals(parents, "pk", "total",
      children, "fk", col("amt")).first()
    assert((r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4)) === ((3L, 1L, 1L, 50L, 50L)))
  }

  // ── Cohen's kappa ────────────────────────────────────────────────────

  test("cohensKappa: textbook 2x2 golden") {
    // classic example: 20 yes-yes, 5 yes-no, 10 no-yes, 15 no-no
    val rows = Seq.fill(20)(("yes", "yes")) ++ Seq.fill(5)(("yes", "no")) ++
      Seq.fill(10)(("no", "yes")) ++ Seq.fill(15)(("no", "no"))
    val r = Profiling.cohensKappa(rows.toDF("a", "b"), "a", "b").first()
    val po = 35.0 / 50.0
    val pe = (25.0 * 30.0 + 25.0 * 20.0) / 2500.0
    assert(r.getLong(0) === 50L)
    assert(r.getDouble(1) === po)
    assert(math.abs(r.getDouble(2) - pe) < 1e-12)
    assert(math.abs(r.getDouble(3) - (po - pe) / (1.0 - pe)) < 1e-12)
  }

  test("cohensKappa: perfect agreement -> 1, constant raters -> NULL") {
    val perfect = Seq(("x", "x"), ("y", "y"), ("z", "z"), ("x", "x"))
      .toDF("a", "b")
    assert(Profiling.cohensKappa(perfect, "a", "b").first().getDouble(3)
      === 1.0)
    // both raters constant: pe = 1, kappa undefined -> NULL (not a
    // divide-by-zero error under ANSI)
    val constant = Seq(("k", "k"), ("k", "k")).toDF("a", "b")
    assert(Profiling.cohensKappa(constant, "a", "b").first().isNullAt(3))
  }

  // ── confusion matrix ─────────────────────────────────────────────────

  test("confusionMatrix: hand 3-class golden incl. never-predicted class") {
    // truth: 3 a, 2 b, 1 c; model never predicts c, invents d
    val rows = Seq(("a", "a"), ("a", "a"), ("a", "b"),
      ("b", "b"), ("b", "d"), ("c", "a"))
    val out = Profiling.confusionMatrix(rows.toDF("y", "p"), "y", "p")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("a") === ((2L, 1L, 1L, 3L)))   // tp=2, fp=c->a, fn=a->b
    assert(out("b") === ((1L, 1L, 1L, 2L)))
    assert(out("c") === ((0L, 0L, 1L, 1L)))   // never predicted
    assert(out("d") === ((0L, 1L, 0L, 0L)))   // invented class
  }

  test("confusionMatrix: ratio semantics (exact values, NULL conventions)") {
    val rows = Seq(("a", "a"), ("a", "a"), ("a", "b"),
      ("b", "b"), ("b", "d"), ("c", "a"))
    val out = Profiling.confusionMatrix(rows.toDF("y", "p"), "y", "p")
      .collect().map(r => r.getString(0) -> r).toMap
    // a: p = 2/3, r = 2/3, f1 = 2*(2/3)*(2/3)/(4/3) = 2/3
    assert(math.abs(out("a").getDouble(5) - 2.0 / 3.0) < 1e-12)
    assert(math.abs(out("a").getDouble(7) - 2.0 / 3.0) < 1e-12)
    // c is never predicted: precision NULL, recall 0
    assert(out("c").isNullAt(5) && out("c").getDouble(6) === 0.0)
    assert(out("c").isNullAt(7))   // p NULL -> f1 NULL
    // d never occurs in truth: recall NULL
    assert(out("d").getDouble(5) === 0.0 && out("d").isNullAt(6))
  }

  test("cohensKappa: independent raters land near zero") {
    // a-label from i mod 2, b-label from i mod 3 parity: independent by
    // construction over a full cycle of 6
    val rows = (0 until 600).map(i => (i % 2 == 0, i % 3 == 0))
    val r = Profiling.cohensKappa(rows.toDF("a", "b"), "a", "b").first()
    assert(math.abs(r.getDouble(3)) < 1e-9, s"kappa=${r.getDouble(3)}")
  }

  test("numericMI: perfect dependence saturates, noise stays low") {
    val dep = (1 to 64).map(i => (i.toLong, i.toDouble, i.toDouble * 2.0))
      .toDF("id", "x", "y")
    val r = Profiling.numericMI(dep, "id", "x", "y", bins = 4,
      deterministic = true).first()
    // monotone map → identical bins → MI = H = ln 4, NMI = 1
    assert(math.abs(r.getDouble(1) - math.log(4.0)) < 1e-9)
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-9)
    // decorrelated pattern → NMI well below 1
    val mix = (1 to 64).map(i => (i.toLong, i.toDouble,
      ((i * 29) % 64).toDouble)).toDF("id", "x", "y")
    val r2 = Profiling.numericMI(mix, "id", "x", "y", bins = 4)
    assert(r2.first().getDouble(4) < 0.5)
  }

  test("freshnessReport: frontier ages and horizon counts") {
    import java.sql.Timestamp
    def ts(day: Int) = new Timestamp(day.toLong * 86400000L)
    val rows = Seq(("live", ts(100)), ("live", ts(99)), ("live", ts(80)),
      ("stale", ts(90)), ("stale", ts(60)))
    val r = Profiling.freshnessReport(rows.toDF("g", "t"), "g", "t",
      Seq(7, 30)).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(3),
        x.getLong(4), x.getLong(5))).toMap
    val day = 86400000000L
    // frontier = day 100
    assert(r("live") === ((3L, 0L, 2L, 3L)))        // ages 0; 7d: 100,99
    assert(r("stale") === ((2L, 10L * day, 0L, 1L))) // 7d: none; 30d: 90
  }

  test("dpNoisyCounts: deterministic Laplace, centered, epsilon-scaled") {
    val df = (1 to 5000).map(i => (s"g${i % 500}", i)).toDF("g", "x")
    def run(eps: Double) = Profiling.dpNoisyCounts(df, Seq("g"), eps)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val a = run(1.0)
    assert(a.size === 500)
    assert(a === run(1.0)) // bit-reproducible
    val noise = a.map { case (_, v) => v - 10.0 } // every group has 10 rows
    // centered and bounded: Laplace(1) over 500 draws
    assert(math.abs(noise.sum / noise.size) < 0.5)
    assert(noise.forall(n => math.abs(n) < 45.0))
    assert(noise.count(n => math.abs(n) > 0.001) > 450) // actually noisy
    // epsilon ↓ → noise ∝ 1/ε (same uniforms, scaled inverse CDF)
    val loose = run(0.1)
    val ratio = a.map { case (k, v) => (loose(k) - 10.0) / (v - 10.0) }
    assert(ratio.forall(r => math.abs(r - 10.0) < 1e-6))
  }

  test("kAnonymityReport: risky groups, l-diversity, nulls group together") {
    // (qi1, qi2) groups: (x,1)×3 rows 2 sensitive vals; (y,1)×1 row;
    // (null,2)×2 rows 1 sensitive val
    val rows = Seq(
      (Some("x"), 1, "s1"), (Some("x"), 1, "s1"), (Some("x"), 1, "s2"),
      (Some("y"), 1, "s9"),
      (None, 2, "s5"), (None, 2, "s5"))
    val r = Profiling.kAnonymityReport(rows.toDF("a", "b", "sv"),
      Seq("a", "b"), "sv", k = 2L, l = 2L).first()
    assert(r.getLong(0) === 6L)  // n_rows
    assert(r.getLong(1) === 3L)  // n_groups (null group counted once)
    assert(r.getLong(2) === 1L)  // risky_groups: (y,1) of size 1
    assert(r.getLong(3) === 1L)  // risky_rows
    assert(math.abs(r.getDouble(4) - 1.0 / 6.0) < 1e-12)
    assert(r.getLong(5) === 1L)  // min l-diversity
    assert(r.getLong(6) === 2L)  // groups with < 2 sensitive values
  }

  test("fkCandidates: containment, orphans, parent uniqueness, null child") {
    val child = Seq(Some(1L), Some(2L), Some(3L), Some(2L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 2L).toDF("pk")
    val r = Profiling.fkCandidates(Seq(
      ("c.fk", child, "fk", "p.pk", parent, "pk"))).first()
    assert(r.getString(0) === "c.fk" && r.getString(1) === "p.pk")
    assert(r.getLong(2) === 3L)  // child_distinct (null excluded)
    assert(r.getLong(3) === 2L)  // parent_distinct
    assert(r.getLong(4) === 1L)  // parent_dup_rows
    assert(r.getLong(5) === 2L)  // matched
    assert(r.getLong(6) === 1L)  // orphans
    assert(r.getDouble(7) === 0.666667)
    // a clean FK: containment 1.0, unique parent
    val r2 = Profiling.fkCandidates(Seq(
      ("c.fk", child, "fk", "u.pk", Seq(1L, 2L, 3L, 4L).toDF("pk"), "pk"),
      ("c.fk", child, "fk", "p.pk", parent, "pk")))
      .orderBy("parent").collect()
    assert(r2.length === 2)
    assert(r2(1).getDouble(7) === 1.0 && r2(1).getLong(4) === 0L)
  }

  /** Tie-aware reference: Pearson over doubled midranks. */
  private def refSpearman(x: Seq[Double], y: Seq[Double]): Double = {
    def ranks(v: Seq[Double]): Seq[Double] = v.map { a =>
      2.0 * v.count(_ < a) + v.count(_ == a) + 1.0
    }
    val (rx, ry) = (ranks(x), ranks(y))
    val n = x.size.toDouble
    val (sx, sy) = (rx.sum, ry.sum)
    val sxx = rx.map(a => a * a).sum
    val syy = ry.map(a => a * a).sum
    val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum
    ((n * sxy) - (sx * sy)) /
      (math.sqrt((n * sxx) - (sx * sx)) * math.sqrt((n * syy) - (sy * sy)))
  }

  test("spearmanMatrix: monotone transform gives 1, reversal gives -1") {
    val xs = Seq(1.0, 3.0, 7.0, 12.0, 30.0, 55.0)
    val df = xs.map(v => (v, v * v * v + 2.0, -v)).toDF("x", "y", "z")
    val out = Profiling.spearmanMatrix(df, Seq("x", "y", "z")).collect()
    val m = out.map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3))
      .toMap
    assert(math.abs(m(("x", "y")) - 1.0) < 1e-12)
    assert(math.abs(m(("x", "z")) + 1.0) < 1e-12)
    assert(math.abs(m(("y", "z")) + 1.0) < 1e-12)
    assert(out.forall(_.getLong(2) === 6L))
  }

  test("spearmanMatrix: midrank ties match the hand reference") {
    val x = Seq(1.0, 2.0, 2.0, 3.0, 3.0, 3.0, 9.0)
    val y = Seq(5.0, 1.0, 4.0, 4.0, 2.0, 8.0, 3.0)
    val df = x.zip(y).toDF("x", "y")
    val got = Profiling.spearmanMatrix(df, Seq("x", "y"))
      .collect().head.getDouble(3)
    assert(math.abs(got - refSpearman(x, y)) < 1e-12)
  }

  test("fdAudit: holding and violating FDs, NULL dependent is a value") {
    val df = Seq(
      (1L, "a", "x"), (1L, "a", "x"),   // key 1: one dep value — fine
      (2L, "b", "x"), (2L, "c", "x"),   // key 2: two deps — violates k->d2
      (3L, "d", null), (3L, "d", "x"))  // key 3: {x, NULL} — violates k->d3
      .toDF("k", "d2", "d3")
    val out = Profiling.fdAudit(df, Seq("k" -> "d2", "k" -> "d3", "d2" -> "k"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(5))).toMap
    assert(out(("k", "d2")) === ((3L, 1L, false)))
    assert(out(("k", "d3")) === ((3L, 1L, false)))
    // every d2 value maps to exactly one k — holds
    assert(out(("d2", "k")) === ((4L, 0L, true)))
  }

  test("periodGrowth: weekly counts, hand growth, first period NULL") {
    val us = 604800000000L // one week
    val rows = Seq(
      ("a", 0L), ("a", 1L),             // week 0: 2
      ("a", us), ("a", us + 5L), ("a", us + 9L), // week 1: 3
      ("a", 2 * us),                    // week 2: 1
      ("b", 0L))                        // b week 0: 1
      .toDF("grp", "tsu")
      .withColumn("ts", timestamp_micros(col("tsu")))
    val out = Profiling.periodGrowth(rows, "ts", "grp", us)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) Double.NaN else r.getDouble(4))).toMap
    assert(out(("a", 0L))._1 === 2L && out(("a", 0L))._2 === -1L)
    assert(out(("a", 0L))._3.isNaN)
    assert(out(("a", us)) === ((3L, 2L, 0.5)))
    assert(out(("a", 2 * us)) === ((1L, 3L, (1.0 - 3.0) / 3.0)))
    assert(out(("b", 0L))._1 === 1L)
  }

  test("sliceAccuracy: hand Wilson interval, null pred counts incorrect") {
    /** Textbook Wilson (z = 1.96). */
    def wilson(c: Long, n: Long): (Double, Double) = {
      val (z, z2) = (1.96, 1.96 * 1.96)
      val nd = n.toDouble
      val ph = c.toDouble / nd
      val denom = 1.0 + (z2 / nd)
      val center = (ph + (z2 / (2.0 * nd))) / denom
      val half = (z * math.sqrt(((ph * (1.0 - ph)) / nd) +
        (z2 / ((4.0 * nd) * nd)))) / denom
      (center - half, center + half)
    }
    val df = Seq(
      ("s1", "en", "en"), ("s1", "en", "de"), ("s1", "de", "de"),
      ("s1", "fr", "fr"), ("s2", "en", null))
      .toDF("src", "label", "pred")
    val out = Profiling.sliceAccuracy(df, "src", "label", "pred")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5))).toMap
    val (lo1, hi1) = wilson(3, 4)
    assert(out("s1")._1 === 4L && out("s1")._2 === 3L)
    assert(out("s1")._3 === 0.75)
    assert(math.abs(out("s1")._4 - lo1) < 1e-12)
    assert(math.abs(out("s1")._5 - hi1) < 1e-12)
    // null pred is incorrect; interval stays within [0, 1]
    assert(out("s2")._2 === 0L && out("s2")._4 >= 0.0)
  }

  test("datasetCard: hand metrics on a tiny corpus") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "alpha beta gamma", "s1"),
      (2L, "alpha beta gamma", "s1"), // exact duplicate of doc 1
      (3L, "one two", "s2"),
      (4L, "a b c d e f", "s2")).toDF("doc_id", "text", "source")
    val out = Profiling.datasetCard(docs, "doc_id", "text", "source")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("n_docs") === 4.0)
    assert(out("n_tokens") === 14.0)
    assert(out("n_sources") === 2.0)
    assert(out("exact_dup_frac") === 0.25)
    assert(out("token_p50") === 3.0) // ranks of [2,3,3,6]: ceil(0.5·4)=2 → 3
    assert(out("token_p90") === 6.0)
    val meanQ = docs.select(TextAnalysis.qualityScore(col("text")))
      .collect().map(_.getDouble(0)).sum / 4.0
    assert(math.abs(out("mean_quality") - meanQ) < 1e-12)
  }

  test("spearmanMatrix: complete-case drops any-null rows before ranking") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 2.0), (2.0, 3.0), (null, 9.0), (3.0, null), (4.0, 5.0))
      .toDF("x", "y")
    val r = Profiling.spearmanMatrix(df, Seq("x", "y")).collect().head
    assert(r.getLong(2) === 3L)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-12)
  }

  test("nullCoMissingness: perfect co-missingness, independence, degenerate margins") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a and b go missing on EXACTLY the same rows (phi = 1); c never null
    // (degenerate margin -> NULL phi, not a divide-by-zero)
    val df = spark.range(100).select(
      when(col("id") % 4 === 0, lit(null).cast("string"))
        .otherwise(lit("x")).as("a"),
      when(col("id") % 4 === 0, lit(null).cast("double"))
        .otherwise(lit(1.0)).as("b"),
      lit("always").as("c"))
    val out = graft.operators.Profiling
      .nullCoMissingness(df, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(3), r.getLong(6), if (r.isNullAt(7)) None else Some(r.getDouble(7)))).toMap
    assert(out(("a", "b")) === ((25L, 75L, Some(1.0))))
    assert(out(("a", "c"))._3 === None) // c never null -> zero margin
    assert(out(("b", "c"))._3 === None)
    // independence: disjoint planted patterns give small |phi|
    val ind = spark.range(1000).select(
      when(col("id") % 10 === 0, lit(null).cast("string"))
        .otherwise(lit("x")).as("a"),
      when(col("id") % 7 === 3, lit(null).cast("string"))
        .otherwise(lit("y")).as("b"))
    val phi = graft.operators.Profiling.nullCoMissingness(ind, Seq("a", "b"))
      .collect().head.getDouble(7)
    assert(math.abs(phi) < 0.2, s"independent patterns should read ~0, got $phi")
  }

  // ── wilsonIntervals ────────────────────────────────────────────────────

  test("wilsonIntervals: textbook closed form; extremes stay in [0,1]") {
    /** Textbook Wilson (z = 1.96), same parenthesization as the oracle. */
    def wilson(c: Long, n: Long): (Double, Double) = {
      val (z, z2) = (1.96, 1.96 * 1.96)
      val nd = n.toDouble
      val ph = c.toDouble / nd
      val denom = 1.0 + (z2 / nd)
      val center = (ph + (z2 / (2.0 * nd))) / denom
      val half = (z * math.sqrt(((ph * (1.0 - ph)) / nd) +
        (z2 / ((4.0 * nd) * nd)))) / denom
      (center - half, center + half)
    }
    val df = Seq(("a", 500L), ("a", 300L), ("a", 450L), ("a", 100L),
      ("b", 500L), ("b", 600L), ("c", 10L))
      .toDF("source", "n_chars")
    val out = Profiling.wilsonIntervals(df, "source", col("n_chars") > 400)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5))).toMap
    val (lo, hi) = wilson(2, 4)
    assert(out("a")._1 === 4L && out("a")._2 === 2L && out("a")._3 === 0.5)
    assert(math.abs(out("a")._4 - lo) < 1e-12)
    assert(math.abs(out("a")._5 - hi) < 1e-12)
    // p̂ = 1 at n = 2: interval hugs 1 from below, never exceeds it
    assert(out("b")._3 === 1.0)
    assert(out("b")._4 > 0.0 && out("b")._4 < 1.0)
    assert(out("b")._5 <= 1.0 + 1e-12)
    // p̂ = 0 at n = 1: lo pinned at 0, hi well inside (0, 1) — the
    // honest "we know almost nothing" interval a normal approx collapses
    assert(out("c")._3 === 0.0)
    assert(out("c")._4 >= -1e-12 && out("c")._5 < 1.0)
    assert(out("c")._5 > 0.5) // n=1: the interval must be wide
  }

  // ── qqPairs ────────────────────────────────────────────────────────────

  test("qqPairs: exact rank-target values per slice; location shift reads flat") {
    // slice a: 1..10; slice b: 101..110 (a +100 shift) + an ignored slice
    val rows = (1 to 10).flatMap(i => Seq(
      ("a", i.toLong, i.toDouble), ("b", 100L + i, 100.0 + i),
      ("zz", 200L + i, 9999.0)))
    val df = rows.toDF("slice", "id", "v")
    val out = Profiling.qqPairs(df, "slice", "id", "v", "a", "b", k = 5)
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    // probes .2/.4/.6/.8/1.0 over n=10 → ranks 2,4,6,8,10
    assert(out.length === 5)
    assert(out.map(_._1).toSeq === Seq(0.2, 0.4, 0.6, 0.8, 1.0))
    assert(out.map(_._2).toSeq === Seq(2.0, 4.0, 6.0, 8.0, 10.0))
    assert(out.map(_._3).toSeq === Seq(102.0, 104.0, 106.0, 108.0, 110.0))
    // pure location shift: diff constant at +100
    assert(out.forall(t => t._4 === 100.0))
  }

  test("fleissKappa: hand goldens — perfect 1, chance-level 0, constant NULL") {
    // perfect agreement: every item's raters unanimous
    val perfect = Seq((1L, "x"), (1L, "x"), (2L, "y"), (2L, "y"))
      .toDF("item", "r")
    val p = Profiling.fleissKappa(perfect, "item", "r").collect()(0)
    assert(p.getLong(0) === 2L && p.getLong(1) === 2L)
    assert(p.getDouble(2) === 1.0 && math.abs(p.getDouble(4) - 1.0) < 1e-12)
    // engineered chance-level: P̄ == P̄e == 5/9 → kappa exactly 0
    val mixed = Seq(
      (1L, "x"), (1L, "x"), (1L, "y"),
      (2L, "x"), (2L, "y"), (2L, "y"),
      (3L, "x"), (3L, "x"), (3L, "x")).toDF("item", "r")
    val m = Profiling.fleissKappa(mixed, "item", "r").collect()(0)
    assert(math.abs(m.getDouble(2) - 5.0 / 9.0) < 1e-12)
    assert(math.abs(m.getDouble(3) - 5.0 / 9.0) < 1e-12)
    assert(math.abs(m.getDouble(4)) < 1e-12)
    // every rating identical → P̄e = 1 → NULL kappa
    val const = Seq((1L, "x"), (1L, "x"), (2L, "x"), (2L, "x"))
      .toDF("item", "r")
    assert(Profiling.fleissKappa(const, "item", "r").collect()(0).isNullAt(4))
  }

  test("fleissKappa: rejects unequal rating counts per item") {
    val bad = Seq((1L, "x"), (1L, "y"), (2L, "x")).toDF("item", "r")
    intercept[IllegalArgumentException] {
      Profiling.fleissKappa(bad, "item", "r").collect()
    }
  }

  test("categoryDrift: shared/new/vanished statuses and exact shares") {
    val ref = Seq("en", "en", "en", "de", "fr").toDF("lang")
    val cur = Seq("en", "en", "de", "de", "zz", "zz").toDF("lang")
    val out = Profiling.categoryDrift(ref, cur, "lang")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          if (r.isNullAt(5)) Double.NaN else r.getDouble(5),
          r.getString(6))).toMap
    assert(out.keySet === Set("en", "de", "fr", "zz"))
    val en = out("en")
    assert(en._1 === 3L && en._2 === 2L && en._6 === "shared")
    assert(en._3 === 3.0 / 5.0 && en._4 === 2.0 / 6.0)
    assert(math.abs(en._5 - math.log((2.0 / 6.0) / (3.0 / 5.0))) < 1e-12)
    assert(out("fr")._6 === "vanished" && out("fr")._2 === 0L &&
      out("fr")._5.isNaN)
    assert(out("zz")._6 === "new" && out("zz")._1 === 0L &&
      out("zz")._5.isNaN)
    assert(out("de")._6 === "shared")
  }

  test("qqPairs: uneven slice sizes use each slice's own n") {
    val rows = (1 to 100).map(i => ("a", i.toLong, i.toDouble)) ++
      (1 to 4).map(i => ("b", 1000L + i, i.toDouble * 10.0))
    val out = Profiling.qqPairs(rows.toDF("slice", "id", "v"),
        "slice", "id", "v", "a", "b", k = 4)
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    // a: ranks 25,50,75,100 → 25,50,75,100; b: ranks 1,2,3,4 → 10,20,30,40
    assert(out.map(_._2).toSeq === Seq(25.0, 50.0, 75.0, 100.0))
    assert(out.map(_._3).toSeq === Seq(10.0, 20.0, 30.0, 40.0))
  }
}
