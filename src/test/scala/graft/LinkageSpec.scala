package graft

import graft.functions.StringSim
import graft.operators.Linkage
import graft.operators.Linkage.FieldSpec
import org.apache.spark.sql.functions._

/** Record-linkage tier: Jaro–Winkler parity goldens (values verified
  * bit-for-bit against DuckDB's jaro_winkler_similarity during
  * development), blocking, Fellegi–Sunter scoring, and the
  * blocking-quality report. */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    StringSim.jaroWinklerBytes(
      a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  test("jaroWinkler matches the DuckDB-verified goldens") {
    assert(jw("martha", "marhta") === 0.9611111111111111)
    assert(jw("dixon", "dicksonx") === 0.8133333333333332)
    assert(jw("duane", "dwayne") === 0.8400000000000001)
    assert(jw("crate", "trace") === 0.7333333333333334)
    // boost threshold: jaro = 0.611… ≤ 0.7 → NO prefix boost (DuckDB reads
    // 0.611…, a boost-always implementation would read 0.65)
    val jaro611 = (1.0 / 3 + 1.0 / 2 + 1.0) / 3.0
    assert(jw("6bd", "6d") === jaro611)
    assert(jw("6bd", "6d") !== jaro611 + 0.1 * (1.0 - jaro611))
    // empty sides: 0.0 even for '' vs '' (m = 0 → 0, the DuckDB convention)
    assert(jw("", "") === 0.0)
    assert(jw("abc", "") === 0.0)
    assert(jw("a", "a") === 1.0)
    assert(jw("ab", "ba") === 0.0) // window 0 at these lengths: no matches
  }

  test("JaroWinkler expression: codegen path equals the static helper") {
    val df = Seq(("martha", "marhta"), ("dixon", "dicksonx"), ("", ""),
      ("Customer#000000001", "Customer#000000010"))
      .toDF("a", "b")
    val out = df.select(StringSim.jaro_winkler(col("a"), col("b")).as("s"))
      .as[Double].collect()
    val exp = Seq("martha" -> "marhta", "dixon" -> "dicksonx", "" -> "",
      "Customer#000000001" -> "Customer#000000010")
      .map { case (a, b) => jw(a, b) }
    assert(out.toSeq === exp)
    // null propagates
    val n = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(StringSim.jaro_winkler(col("a"), col("b"))).collect()
    assert(n.head.isNullAt(0))
  }

  private val entities = Seq(
    // (id, name, phone, truth): 1/2 same person (fuzzy name, same phone),
    // 3 unrelated sharing 1's phone prefix, 4/5 exact-name pair, 6 loner
    (1L, "martha stone", "25-989-741", 100L),
    (2L, "marhta stone", "25-989-741", 100L),
    (3L, "zelda quartz", "25-989-999", 101L),
    (4L, "alan turing", "11-111-111", 102L),
    (5L, "alan turing", "11-111-112", 102L),
    (6L, "ada lovelace", "99-000-000", 103L))
    .toDF("id", "name", "phone", "ckey")

  test("blockedPairs: union of passes, deduplicated, null keys dropped") {
    val pairs = Linkage.blockedPairs(entities, "id",
      Seq(substring(col("name"), 1, 4), substring(col("phone"), 1, 6)))
      .as[(Long, Long)].collect().toSet
    // name-prefix pass: (1,2) via "mart"? no — "mart" vs "marh" differ;
    // (4,5) via "alan". phone pass: (1,2), (1,3), (2,3) via "25-989".
    assert(pairs === Set((4L, 5L), (1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("matchScores levels and exact integer score") {
    val fields = Seq(
      FieldSpec("name", "name", Some(0.85), 4000000L, 2500000L, -3000000L),
      FieldSpec("phone", "phone", Some(0.90), 5000000L, 3000000L, -4000000L))
    val pairs = Seq((1L, 2L), (1L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val out = Linkage.matchScores(entities, "id", pairs, fields, carry = Seq("ckey"))
      .select("id_a", "id_b", "lvl_name", "lvl_phone", "score_micro")
      .as[(Long, Long, Option[Int], Option[Int], Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    // (1,2): name fuzzy (jw(martha stone, marhta stone) ≥ .85), phone exact
    def phoneLvl(a: String, b: String): (Int, Long) =
      if (a == b) (2, 5000000L)
      else if (jw(a, b) >= 0.90) (1, 3000000L)
      else (0, -4000000L)
    val (p13, w13) = phoneLvl("25-989-741", "25-989-999")
    val (p45, w45) = phoneLvl("11-111-111", "11-111-112")
    assert(out === Seq(
      (1L, 2L, Some(1), Some(2), 2500000L + 5000000L),
      (1L, 3L, Some(0), Some(p13), -3000000L + w13),
      (4L, 5L, Some(2), Some(p45), 4000000L + w45)))
  }

  test("matchScores: missing attribute → NULL level, zero weight") {
    val ents = Seq((1L, Some("abc"), 7L), (2L, None: Option[String], 7L))
      .toDF("id", "name", "ckey")
    val fields = Seq(FieldSpec("name", "name", Some(0.9), 10L, 5L, -5L))
    val out = Linkage.matchScores(ents, "id", Seq((1L, 2L)).toDF("id_a", "id_b"), fields)
      .select("lvl_name", "score_micro").as[(Option[Int], Long)].collect()
    assert(out.toSeq === Seq((None, 0L)))
  }

  test("scoreHistogram buckets negatives correctly (floor, not truncate)") {
    val scored = Seq((1L, 2L, -2500000L, 100L, 100L), (3L, 4L, 2500000L, 1L, 2L))
      .toDF("id_a", "id_b", "score_micro", "a_ckey", "b_ckey")
    val out = Linkage.scoreHistogram(scored, col("a_ckey") === col("b_ckey"),
        bucketMicro = 2000000L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((-2L, 1L, 1L), (1L, 1L, 0L)))
  }

  test("sortedNeighborhoodPairs: exact window pairs in global key order") {
    val ents = Seq((10L, "aa"), (20L, "ab"), (30L, "ac"), (40L, "zz"),
      (50L, "ad")).toDF("id", "k")
    val pairs = Linkage.sortedNeighborhoodPairs(ents, "id", col("k"), window = 2)
      .as[(Long, Long, Long)].collect().toSet
    // sort order: aa(10) ab(20) ac(30) ad(50) zz(40)
    assert(pairs === Set(
      (10L, 20L, 1L), (10L, 30L, 2L), (20L, 30L, 1L), (20L, 50L, 2L),
      (30L, 50L, 1L), (30L, 40L, 2L), (50L, 40L, 1L)))
    // the dirty-key trade: "zz" sits far from everything — a true match
    // whose sort key is corrupted beyond the window is honestly missed
    val w1 = Linkage.sortedNeighborhoodPairs(ents, "id", col("k"), window = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(w1 === Set((10L, 20L, 1L), (20L, 30L, 1L), (30L, 50L, 1L),
      (50L, 40L, 1L)))
  }

  test("scoreCurve: descending cumulative precision") {
    val scored = Seq(
      (1L, 2L, 5000000L, 7L, 7L), (3L, 4L, 4500000L, 8L, 9L),
      (5L, 6L, 1000000L, 1L, 1L), (7L, 8L, -3000000L, 2L, 3L))
      .toDF("id_a", "id_b", "score_micro", "a_ckey", "b_ckey")
    val out = Linkage.scoreCurve(scored, col("a_ckey") === col("b_ckey"),
        bucketMicro = 2000000L)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    // buckets: 2 (two pairs: one true one false), 0 (one true), -2 (false)
    assert(out === Seq(
      (2L, 2L, 1L, 2L, 1L, 0.5),
      (0L, 1L, 1L, 3L, 2L, math.rint(2.0 / 3.0 * 1e6) / 1e6),
      (-2L, 1L, 0L, 4L, 2L, 0.5)))
  }

  test("blockingQualityReport: per-pass and union completeness/reduction") {
    val rep = Linkage.blockingQualityReport(entities, "id", "ckey",
        Seq(substring(col("name"), 1, 4), substring(col("phone"), 1, 6)))
      .select("pass", "n_pairs", "n_true", "total_true", "completeness", "reduction")
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // truth groups: {1,2}, {4,5} → total_true = 2; space = C(6,2) = 15
    assert(rep("block_0")._2 === 1L) // (4,5)
    assert(rep("block_0")._3 === 1L)
    assert(rep("block_1")._2 === 4L) // (1,2)(1,3)(2,3) via "25-989", (4,5) via "11-111"
    assert(rep("block_1")._3 === 2L)
    assert(rep("union")._2 === 4L)
    assert(rep("union")._3 === 2L)
    assert(rep("union")._4 === 2L)
    assert(rep("union")._5 === 1.0)
    assert(rep("union")._6 === math.rint((1.0 - 4.0 / 15.0) * 1e6) / 1e6)
  }

  test("reciprocalBestMatch: mutual argmax only, deterministic ties, threshold-first") {
    // a=1: best is b=2 (10 > 8); b=2: best is a=1 (10 > 9) → (1,2) matches.
    // a=3's best is b=2, but 2 prefers 1 → 3 unmatched; b=4's best is a=1,
    // but 1 prefers 2 → 4 unmatched. One-to-one by construction.
    val scored = Seq(
      (1L, 2L, 10000000L), (1L, 4L, 8000000L),
      (3L, 2L, 9000000L), (3L, 4L, 2000000L))
      .toDF("id_a", "id_b", "score_micro")
    val out = Linkage.reciprocalBestMatch(scored)
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 2L, 10000000L)))
    // threshold-first: dropping (1,2) below the floor frees 2 for a=3 AND
    // 4 for a=1 — the argmax runs over the accepted universe, so a
    // below-threshold best must not block a reciprocal second-best
    val out2 = Linkage.reciprocalBestMatch(scored, minScoreMicro = 9500000L)
      .as[(Long, Long, Long)].collect().toSet
    assert(out2 === Set((1L, 2L, 10000000L)))
    val out3 = Linkage.reciprocalBestMatch(
        scored.filter(!(col("id_a") === 1L && col("id_b") === 2L)))
      .as[(Long, Long, Long)].collect().toSet
    assert(out3 === Set((3L, 2L, 9000000L), (1L, 4L, 8000000L)))
    // tie on score: partner with the smallest id wins on BOTH sides
    val tied = Seq(
      (1L, 2L, 5000000L), (1L, 4L, 5000000L),
      (3L, 2L, 5000000L))
      .toDF("id_a", "id_b", "score_micro")
    val t = Linkage.reciprocalBestMatch(tied)
      .as[(Long, Long, Long)].collect().toSet
    // a=1 ties 2/4 → picks 2; b=2 ties 1/3 → picks 1 → (1,2); 3 and 4 out
    assert(t === Set((1L, 2L, 5000000L)))
  }

  test("matchDisposition: all four dispositions, one each") {
    // left ids 1, 3, 5, 7:
    //  1 matches 2 reciprocally                       → matched
    //  3 has an accepted candidate (2) but loses it   → lost_tie
    //  5 has only a below-floor candidate             → below_threshold
    //  7 never blocked into any pair                  → no_candidate
    val scored = Seq(
      (1L, 2L, 10000000L), (3L, 2L, 9000000L), (5L, 4L, 1000000L))
      .toDF("id_a", "id_b", "score_micro")
    val matches = Linkage.reciprocalBestMatch(scored,
      minScoreMicro = 3000000L)
    val left = Seq(1L, 3L, 5L, 7L).toDF("id")
    val out = Linkage.matchDisposition(left, "id", scored, matches,
        minScoreMicro = 3000000L)
      .as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "matched", 3L -> "lost_tie",
      5L -> "below_threshold", 7L -> "no_candidate"))
  }
}
