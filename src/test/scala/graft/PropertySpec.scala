package graft

import graft.functions.PyLiteral
import graft.operators.{Dedup, Explode, Snapshot}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests — invariants the reference never checked (SURVEY §5).
  * (Raw ScalaCheck generators with fixed seeds; the scalatest-scalacheck
  * bridge artifact isn't available offline.) */
class PropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private val jackson = new com.fasterxml.jackson.databind.ObjectMapper()

  private val scalarGen: Gen[Any] = Gen.oneOf(
    Gen.alphaNumStr.map(s => s.take(8)),
    Gen.choose(-1000000, 1000000),
    Gen.choose(-1e6, 1e6).map(d => math.rint(d * 100) / 100),
    Gen.oneOf(true, false),
    Gen.const(null))

  private def pyRepr(v: Any): String = v match {
    case null       => "None"
    case true       => "True"
    case false      => "False"
    case s: String  => "'" + s + "'"
    case d: Double  => if (d == math.rint(d)) s"${d.toLong}.0" else d.toString
    case other      => other.toString
  }

  test("pyliteral → JSON parses for arbitrary flat dicts") {
    forAll(Gen.mapOf(Gen.zip(Gen.identifier.map(_.take(6)).suchThat(_.nonEmpty), scalarGen))) {
      (m: Map[String, Any]) =>
        val literal = m.map { case (k, v) => s"'$k': ${pyRepr(v)}" }.mkString("{", ", ", "}")
        val json = PyLiteral.toJson(literal)
        val node = jackson.readTree(json) // must be valid JSON
        assert(node.isObject)
        assert(node.size() === m.size)
    }
  }

  test("pyliteral: valid JSON round-trips to semantically equal JSON") {
    forAll(Gen.mapOf(Gen.zip(Gen.identifier.map(_.take(6)).suchThat(_.nonEmpty),
        Gen.choose(-1000, 1000)))) { (m: Map[String, Int]) =>
      val json = jackson.writeValueAsString(
        m.foldLeft(jackson.createObjectNode()) { case (o, (k, v)) => o.put(k, v) })
      assert(jackson.readTree(PyLiteral.toJson(json)) === jackson.readTree(json))
    }
  }
}

/** Spark-backed property-style invariants (fixed seeds, multiple shapes). */
class RoundTripSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("fused text scans are value-identical to the regex formulations") {
    import graft.operators.TextAnalysis
    // adversarial alphabet: ASCII \s members and non-members (U+00A0,
    // U+2028 are NOT java-regex \s), word chars incl. '_', marker words,
    // unicode letters, an astral emoji (one codepoint, two UTF-16 chars)
    val pieces = Array(
      "the", "The", "AND", "of", "der", "la", "que", "wo3", "de5", "it",
      "a", "b", "xyz", "42", "3x", "_", "a_b", "x9_", ".", ",", "!", "?",
      ";", ":", " ", "  ", "\t", "\n", "\u000B", "\f", "\r", "\u00A0",
      "\u2028", "é", "Ü", "漢字", "🙂", "'", "\"", "-", "@", "#")
    val rnd = new scala.util.Random(13)
    val docs = (1 to 300).map { i =>
      val n = rnd.nextInt(30)
      (i.toLong, (0 until n).map(_ => pieces(rnd.nextInt(pieces.length))).mkString)
    } ++ Seq(
      (1001L, ""), (1002L, " "), (1003L, "\t"), (1004L, "   x   "),
      (1005L, "\tthe cat\t"), (1006L, "the the the und und la la"),
      (1007L, "🙂🙂 a🙂b"), (1008L, " the "))
    val df = docs.toDF("id", "t")
    val out = df.select(
      TextAnalysis.tokenCount($"t").as("f_tok"),
      TextAnalysis.tokenCountRegex($"t").as("r_tok"),
      TextAnalysis.bpeishTokenCount($"t").as("f_bpe"),
      TextAnalysis.bpeishTokenCountRegex($"t").as("r_bpe"),
      TextAnalysis.qualityScore($"t").as("f_q"),
      TextAnalysis.qualityScoreRegex($"t").as("r_q"),
      TextAnalysis.langId($"t").as("f_lang"),
      TextAnalysis.langIdRegex($"t").as("r_lang"),
      TextAnalysis.fingerprint($"t").as("f_fp"),
      TextAnalysis.fingerprintRegex($"t").as("r_fp"),
      $"t",
      TextAnalysis.repetitionStats($"t").as("f_rep"),
      TextAnalysis.repetitionStatsBuiltin($"t").as("r_rep"))
    out.collect().foreach { r =>
      val t = r.getString(10)
      assert(r.getInt(0) === r.getInt(1), s"tokenCount mismatch on ${t.map(_.toInt)}")
      assert(r.getInt(2) === r.getInt(3), s"bpeish mismatch on ${t.map(_.toInt)}")
      assert(r.getDouble(4) === r.getDouble(5), s"quality mismatch on ${t.map(_.toInt)}")
      assert(r.getString(6) === r.getString(7), s"langId mismatch on ${t.map(_.toInt)}")
      assert(r.getString(8) === r.getString(9), s"fingerprint mismatch on ${t.map(_.toInt)}")
      assert(r.getStruct(11) === r.getStruct(12), s"repetition mismatch on ${t.map(_.toInt)}")
    }
  }

  test("fused winnowing equals the HOF chain for both hash kinds") {
    import graft.operators.{Dedup, TextAnalysis}
    val rnd = new scala.util.Random(29)
    val words = Array("alpha", "beta", "gamma", "delta", "x", "42", "z9")
    val docs = (1 to 120).map { i =>
      val n = rnd.nextInt(25) // includes < k-token short docs and empties
      (i.toLong, (0 until n).map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    } ++ Seq((201L, ""), (202L, "one"), (203L, "a a a a a a a a"))
    val df = docs.toDF("doc_id", "text")
      .select($"doc_id", Dedup.tokensCol($"text").as("toks"))
    def collectMap(c: org.apache.spark.sql.Column) =
      df.select($"doc_id", c.as("fp")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val hofXx = collectMap(TextAnalysis.winnowFromHashes(
      TextAnalysis.kgramHashes($"toks", 5), 4))
    val fusedXx = collectMap(TextAnalysis.winnowedHashes($"toks", 5, 4))
    assert(fusedXx === hofXx)
    val hofMd5 = collectMap(TextAnalysis.winnowFromHashes(
      TextAnalysis.kgramHashes($"toks", 5, Dedup.md5Hash60), 4))
    val fusedMd5 = collectMap(TextAnalysis.winnowedHashes($"toks", 5, 4, "md5_60"))
    assert(fusedMd5 === hofMd5)
  }

  test("fused PII redact+counts equals the separate regex chains") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "mail a.b+c@ex-ample.org or x@y.io, host 192.168.0.1, call +1 (555) 123-4567"),
      (2L, "clean text without identifiers"),
      (3L, "edge 999.999.999.999 and 1.2.3.4.5 and user@@double.at"),
      (4L, "Â phone 0123456789 twice 0123456789 email a@b.co ip 10.0.0.255"),
      (5L, "")).toDF("id", "t")
    val out = docs.select($"id",
        TextAnalysis.redactPii($"t").as("r_red"),
        TextAnalysis.piiCounts($"t").as("r_cnt"),
        TextAnalysis.piiRedactWithCounts($"t").as("f"))
      .collect()
    out.foreach { r =>
      val f = r.getStruct(3)
      assert(f.getString(0) === r.getString(1), s"redacted mismatch id=${r.getLong(0)}")
      val rc = r.getStruct(2)
      assert(f.getInt(1) === rc.getInt(0) && f.getInt(2) === rc.getInt(1) &&
        f.getInt(3) === rc.getInt(2), s"counts mismatch id=${r.getLong(0)}")
    }
  }

  test("explode ∘ compress round-trips (pk-grouped content preserved)") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map { i =>
      (i % 37, rnd.nextInt(100), s"d${rnd.nextInt(10)}")
    }
    val df = rows.toDF("pk", "line.x", "line.d")
    val compressed = Explode.compressRowsToCol(df, "line", Seq("pk"))
    val reexploded = compressed
      .select(col("pk"), explode(col("line")).as("e"))
      .select(col("pk"), col("e.x").as("line.x"), col("e.d").as("line.d"))
    val norm = (d: org.apache.spark.sql.DataFrame) =>
      d.collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).sortBy(t => (t._1, t._2, t._3)).toSeq
    assert(norm(reexploded) === norm(df))
  }

  test("upsert is idempotent: applying the same batch twice changes nothing") {
    val snap = (1 to 100).map(i => (i, s"v$i")).toDF("id", "v")
    val batch = (50 to 150).map(i => (i, s"n$i")).toDF("id", "v")
    val once = Snapshot.upsert(Some(snap), batch, Seq("id"))
    val twice = Snapshot.upsert(Some(once), batch, Seq("id"))
    val norm = (d: org.apache.spark.sql.DataFrame) =>
      d.collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq
    assert(norm(once) === norm(twice))
    assert(once.count() === 150)
  }

  test("row hash is stable across partitionings and column order") {
    val df = (1 to 500).map(i => (i, s"s$i", i % 2 == 0, i * 1.5)).toDF("id", "s", "b", "d")
    val h1 = df.select(col("id"), Snapshot.rowHash(df, Seq("s", "b", "d")).as("h"))
    val shuffled = df.repartition(13).select("d", "b", "s", "id")
    val h2 = shuffled.select(col("id"), Snapshot.rowHash(shuffled, Seq("b", "d", "s")).as("h"))
    val m1 = h1.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val m2 = h2.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(m1 === m2)
  }

  test("minhash jaccard estimate tracks exact jaccard on planted overlaps") {
    // doc pairs with controlled overlap fraction
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val half = ((1 to 30).map(i => s"tok$i") ++ (100 to 129).map(i => s"tok$i")).mkString(" ")
    val df = Seq((1L, base), (2L, base), (3L, half)).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val j = graft.operators.Dedup.jaccardForPairs(df, pairs, "doc_id", "text", shingleSize = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 2L)) === 1.0)
    assert(math.abs(j((1L, 3L)) - 30.0 / 90.0) < 0.01)
  }

  test("invariant: capped candidate pairs are a subset of uncapped pairs") {
    import org.apache.spark.sql.functions._
    // three seeds x varying cluster shapes
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val docs = (0 until 120).map { i =>
        val cluster = rnd.nextInt(4)
        (i.toLong, s"cluster $cluster shared boilerplate prefix tokens here doc ${i % 7}")
      }.toDF("doc_id", "text")
      val bands = Dedup.minhashBands(docs, "doc_id", "text", 2, 8, 2)
      def pairs(cap: Int) = Dedup.minhashCandidates(bands, "doc_id", cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val capped = pairs(10)
      val uncapped = pairs(1000000)
      assert(capped.subsetOf(uncapped), s"seed=$seed: cap invented pairs")
    }
  }

  test("invariant: fused candidate pairs ≡ relational plan, capped and uncapped") {
    import org.apache.spark.sql.functions._
    // clusters big enough that cap=10 forces sub-bucket splits: the fused
    // in-expression pmod(xxhash64(id), k) must reproduce the relational
    // capBuckets assignment bit-for-bit, not just approximately
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val docs = (0 until 150).map { i =>
        val cluster = rnd.nextInt(3)
        (i.toLong, s"cluster $cluster shared boilerplate prefix tokens here doc ${i % 5}")
      }.toDF("doc_id", "text")
      val bands = Dedup.minhashBands(docs, "doc_id", "text", 2, 8, 2)
      for (cap <- Seq(10, 1000000)) {
        val fused = Dedup.minhashCandidates(bands, "doc_id", cap)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val relational = Dedup.relationalCandidatePairs(
            bands, Seq("band", "band_hash"), "doc_id", cap)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(fused === relational, s"seed=$seed cap=$cap")
      }
    }
  }

  test("invariant: fused hamming pairs ≡ relational fallback (uncapped, both id types)") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    val docs = (0 until 120).map { i =>
      val cluster = rnd.nextInt(3)
      (i.toLong,
        s"cluster $cluster boilerplate body tokens repeated across docs variant ${i % 4}")
    }.toDF("doc_id", "text")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id_a").cast("long"), col("id_b").cast("long"), col("hamming").cast("int"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val fused = norm(Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxDist = 8))
    // string ids route through the pre-round-8 relational plan; uncapped,
    // the candidate set is id-hash-independent so outputs must coincide
    val relational = norm(Dedup.simhashNearDupPairs(
      docs.withColumn("doc_id", format_string("%05d", col("doc_id"))),
      "doc_id", "text", maxDist = 8))
    assert(fused.nonEmpty && fused === relational)
  }

  test("invariant: HammingBucketPairs cap replays capBuckets sub-assignment exactly") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import spark.implicits._
    // one bucket of 40 members with fixed sigs, cap=7 → k=6 sub-buckets:
    // reference computes pmod(xxhash64(id, 42), k) in plain Scala
    val members = (0L until 40L).map(id => (id, id * 1103515245L + 12345L))
    val cap = 7
    val k = math.ceil(members.size.toDouble / cap).toLong
    val ref = (for {
      (ia, sa) <- members; (ib, sb) <- members
      if ia < ib
      subA = ((XXH64.hashLong(ia, 42L) % k) + k) % k
      subB = ((XXH64.hashLong(ib, 42L) % k) + k) % k
      if subA == subB
      d = java.lang.Long.bitCount(sa ^ sb)
      if d <= 64
    } yield (ia, ib, d)).toSet
    val got = Seq(members).toDF("m")
      .select(graft.functions.BucketPairs.hamming_bucket_pairs(
        col("m").cast("array<struct<id:long,sig:long>>"), cap, 64)
        .as(Seq("id_a", "id_b", "hamming")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === ref)
    assert(got.nonEmpty && got.size < members.size * (members.size - 1) / 2) // cap dropped cross-sub pairs
  }

  test("invariant: exactDedup is idempotent and content-distinct") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val docs = (0 until 200).map(i => (i.toLong, s"text ${rnd.nextInt(40)}"))
      .toDF("doc_id", "text")
    val once = Dedup.exactDedup(docs, Seq("text"), "doc_id")
    val twice = Dedup.exactDedup(once, Seq("text"), "doc_id")
    assert(once.count() === twice.count())
    assert(once.select("text").distinct().count() === once.count())
    // survivor per content = the minimum id
    val winners = once.collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    val mins = docs.groupBy("text").agg(min("doc_id").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(winners === mins)
  }

  test("invariant: connectedComponents labels are cluster minima and stable under pair order") {
    val pairs1 = Seq((3L, 4L), (1L, 2L), (2L, 3L), (9L, 8L)).toDF("id_a", "id_b")
    val pairs2 = Seq((2L, 3L), (9L, 8L), (1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    def comps(p: org.apache.spark.sql.DataFrame) =
      Dedup.connectedComponents(p).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c1 = comps(pairs1)
    assert(c1 === comps(pairs2)) // order-independent
    assert(c1.values.toSet === Set(1L, 8L)) // labels are the cluster minima
    assert(c1.forall { case (id, comp) => comp <= id })
  }

  test("invariant: duplicateSpans equals a brute-force reference on random corpora") {
    val rnd = new scala.util.Random(41)
    val vocab = Array("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta") // small vocab → cross-doc k-grams actually happen
    val k = 3
    (1 to 5).foreach { round =>
      val docs = (1L to 8L).map { id =>
        val n = 3 + rnd.nextInt(25)
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      // brute-force reference over the same tokenization (texts are
      // pre-canonical: lowercase, single spaces)
      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
      val grams = toks.view.mapValues(ts =>
        if (ts.length < k) Seq.empty
        else ts.sliding(k).map(_.mkString(" ")).toSeq).toMap
      val owners = grams.toSeq.flatMap { case (id, gs) => gs.map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
      val expected = docs.flatMap { case (id, _) =>
        val flagged = grams(id).zipWithIndex.collect {
          case (g, p) if owners(g).exists(_ != id) => p
        }
        // merge overlapping-or-adjacent [p, p+k-1] intervals
        val spans = flagged.foldLeft(List.empty[(Int, Int)]) {
          case (Nil, p)                               => List((p, p + k - 1))
          case ((s, e) :: rest, p) if p <= e + 1      => (s, math.max(e, p + k - 1)) :: rest
          case (acc, p)                               => (p, p + k - 1) :: acc
        }.reverse
        spans.map { case (s, e) => (id, s, e, e - s + 1) }
      }.toSet
      val got = Dedup.duplicateSpans(docs.toDF("doc_id", "text"), "doc_id", "text",
          minSpanTokens = k)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
      assert(got === expected, s"round $round corpus: ${docs.mkString("; ")}")
    }
  }

  /** Independent greedy min-rank BPE (list-based, O(n²) per word) — the
    * reference both bpeTokenCount invariant tests compare against. */
  private def naiveBpeCount(text: String, merges: Seq[(String, String)]): Int = {
      val rank = merges.zipWithIndex
        .groupBy(_._1).view.mapValues(_.head._2).toMap // first rank wins, like putIfAbsent
      def word(w: String): Int = {
        var syms = {
          val b = collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < w.length) {
            val n = Character.charCount(w.codePointAt(i)); b += w.substring(i, i + n); i += n
          }
          b.toList
        }
        var done = syms.length < 2
        while (!done) {
          val ranked = syms.zip(syms.tail).flatMap(rank.get)
          if (ranked.isEmpty) done = true
          else {
            val (a, b) = merges(ranked.min)
            val out = collection.mutable.ArrayBuffer.empty[String]
            var rest = syms
            while (rest.nonEmpty) rest match {
              case `a` :: `b` :: t => out += (a + b); rest = t
              case h :: t          => out += h; rest = t
              case Nil             =>
            }
            syms = out.toList
            done = syms.length < 2
          }
        }
        if (w.isEmpty) 0 else syms.length
      }
      var lo = 0; var hi = text.length
      while (lo < hi && text.charAt(lo) == ' ') lo += 1
      while (hi > lo && text.charAt(hi - 1) == ' ') hi -= 1
      text.substring(lo, hi).toLowerCase.split("\\s+").map(word).sum
  }

  test("invariant: bpeTokenCount equals an independent naive reference on random inputs") {
    import graft.operators.TextAnalysis
    val x = new String(Character.toChars(0x1D54F)) // astral codepoint
    val symbols = Array("a", "b", "c", x)
    val rnd = new scala.util.Random(97)
    (1 to 6).foreach { round =>
      // random merge lists incl. multi-symbol lefts and left = right
      val merges = Seq.fill(5)((
        Seq.fill(1 + rnd.nextInt(2))(symbols(rnd.nextInt(symbols.length))).mkString,
        symbols(rnd.nextInt(symbols.length))))
      val texts = (1L to 40L).map { id =>
        val words = Seq.fill(1 + rnd.nextInt(5))(
          Seq.fill(rnd.nextInt(7))(symbols(rnd.nextInt(symbols.length))).mkString)
        (id, words.mkString(" "))
      }
      val got = texts.toDF("doc_id", "text")
        .select($"doc_id", TextAnalysis.bpeTokenCount($"text", merges).as("n"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      texts.foreach { case (id, t) =>
        assert(got(id) === naiveBpeCount(t, merges),
          s"round $round text='$t' merges=$merges")
      }
    }
  }

  test("invariant: bpeTokenCount matches the naive reference at a 1k-merge vocab") {
    import graft.operators.TextAnalysis
    // same BPE-shaped generator as the Stress 50k row, truncated to 1000
    // rules and loaded through the real merges.txt parse path: full 2-char
    // pair coverage (676) + the first 324 three-char chains
    val letters = 'a' to 'z'
    val two = for (a <- letters; b <- letters) yield s"$a $b"
    val three = for (a <- letters; b <- letters; c <- letters) yield s"$a$b $c"
    val merges = TextAnalysis.parseMerges(
      ("#version: 0.2" +: (two ++ three)).take(1001))
    assert(merges.size === 1000)
    val rnd = new scala.util.Random(53)
    val texts = (1L to 60L).map { id =>
      val words = Seq.fill(1 + rnd.nextInt(6))(
        Seq.fill(1 + rnd.nextInt(10))(('a' + rnd.nextInt(26)).toChar).mkString)
      (id, words.mkString(" "))
    } :+ (1000L, "The ABBey ABBA abab   midnight   train ")
    val got = texts.toDF("doc_id", "text")
      .select($"doc_id", TextAnalysis.bpeTokenCount($"text", merges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    texts.foreach { case (id, t) =>
      assert(got(id) === naiveBpeCount(t, merges), s"text='$t'")
    }
  }

  // ── deletion-neighborhood completeness (the FastSS theorem behind
  //    Dedup.editDistancePairs / FuzzyIndex candidate generation) ────────

  private def delVariants(s: String, tau: Int): Set[String] = {
    var cur = Set(s)
    var all = Set(s)
    for (_ <- 1 to tau) {
      cur = cur.flatMap(x => x.indices.map(i => x.take(i) + x.drop(i + 1)))
      all ++= cur
    }
    all
  }

  test("any pair within tau edits shares a <=tau-deletion variant (tau=1..3)") {
    val strGen = for {
      n <- Gen.choose(0, 12)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd'))
    } yield cs.mkString
    val editGen = Gen.oneOf(0, 1, 2) // 0=sub, 1=ins, 2=del
    for (tau <- 1 to 3) {
      val opGen: Gen[(Int, Int, Char)] = for {
        op <- editGen
        p <- Gen.choose(0, 127)
        ch <- Gen.oneOf('a', 'b', 'x')
      } yield (op, p, ch)
      val caseGen: Gen[(String, List[(Int, Int, Char)])] = for {
        s <- strGen
        k <- Gen.choose(0, tau)
        ops <- Gen.listOfN(k, opGen)
      } yield (s, ops)
      (0 until 300).foreach { i =>
        val (s, ops) = caseGen.apply(Gen.Parameters.default, Seed(i.toLong)).get
        val t = ops.foldLeft(s) { case (cur, (op, pRaw, ch)) =>
          op match {
            case 0 if cur.nonEmpty =>
              val p = pRaw % cur.length
              cur.updated(p, ch)
            case 1 =>
              val p = pRaw % (cur.length + 1)
              cur.take(p) + ch + cur.drop(p)
            case 2 if cur.nonEmpty =>
              val p = pRaw % cur.length
              cur.take(p) + cur.drop(p + 1)
            case _ => cur
          }
        }
        assert(delVariants(s, tau).intersect(delVariants(t, tau)).nonEmpty,
          s"tau=$tau s='$s' t='$t'")
      }
    }
  }

  test("reciprocalBestMatch output is one-to-one and mutually optimal, for random scored graphs") {
    import graft.operators.Linkage
    def forAll[A](gen: Gen[A], n: Int)(f: A => Unit): Unit =
      (0 until n).foreach { i =>
        gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
      }
    val pairGen = Gen.listOfN(60, Gen.zip(
      Gen.choose(0L, 19L), Gen.choose(100L, 119L), Gen.choose(1L, 50L)))
    forAll(pairGen, n = 20) { triples =>
      val scored = triples.map { case (a, b, s) => (a, b, s * 100000L) }
        .toDF("id_a", "id_b", "score_micro")
        // keep-max per pair: duplicates in the random gen would make the
        // "mutually optimal" reference ambiguous
        .groupBy("id_a", "id_b")
        .agg(max("score_micro").as("score_micro"))
      val out = Linkage.reciprocalBestMatch(scored)
        .as[(Long, Long, Long)].collect()
      // 1:1 — no id appears twice on either side
      assert(out.map(_._1).distinct.length === out.length, "id_a reused")
      assert(out.map(_._2).distinct.length === out.length, "id_b reused")
      // mutual optimality vs a driver-side reference on the same frame
      val sc = scored.as[(Long, Long, Long)].collect()
      val bestB = sc.groupBy(_._1).map { case (a, g) =>
        a -> g.minBy(t => (-t._3, t._2))._2 }
      val bestA = sc.groupBy(_._2).map { case (b, g) =>
        b -> g.minBy(t => (-t._3, t._1))._1 }
      val ref = sc.filter(t => bestB(t._1) == t._2 && bestA(t._2) == t._1)
        .map(t => (t._1, t._2)).toSet
      assert(out.map(t => (t._1, t._2)).toSet === ref)
    }
  }
}
