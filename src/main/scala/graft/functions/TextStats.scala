package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass text statistics.
  *
  * The TextAnalysis operators were built from `org.apache.spark.sql.
  * functions` regex primitives — correct, but a quality + langid + token
  * pass re-scans every document ~10 times through java.util.regex
  * machinery (still the honest bottleneck of the text family: 15.5 s for
  * 100k docs at stress scale, all of it projection CPU). These expressions
  * compute the same numbers in one compiled character scan per document.
  *
  * VALUE PARITY IS A CONTRACT, not an aspiration: the DuckDB oracles
  * (q21-q24) replay the original regex formulations, and the ScalaTest
  * property spec asserts fused == regex on randomized inputs including the
  * nasty edges. The scan therefore replicates Java-regex semantics
  * EXACTLY:
  *  - `\s` is the ASCII set [ \t\n\x0B\f\r] — NOT Character.isWhitespace
  *    (U+00A0 etc. are not `\s` and must count as ordinary chars);
  *  - `\w` (for `\b` word boundaries) is ASCII [A-Za-z0-9_];
  *  - char classes match per CODEPOINT (an emoji is ONE `[^A-Za-z0-9\s]`
  *    match even though it is two UTF-16 chars);
  *  - Spark's `trim` strips SPACES only (a leading tab survives);
  *  - Spark's `split(str, re)` keeps trailing empty fields (limit -1), so
  *    "a b " tokenizes to 3 fields, and a whitespace-only non-empty string
  *    to 2;
  *  - `(?i)` without UNICODE_CASE folds ASCII only — marker/stopword hits
  *    are ASCII word runs compared case-folded.
  *
  * CodegenFallback is deliberate (same reasoning as [[MinHashSignature]]):
  * one boxed call per document does the whole fused scan, and the
  * expression can never blow up generated-method size.
  */
object TextScan {

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  @inline private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  @inline private def isWord(c: Char): Boolean =
    isAlpha(c) || isDigit(c) || c == '_'
  @inline private def isPunct(c: Char): Boolean =
    c == '.' || c == ',' || c == ';' || c == ':' || c == '!' || c == '?'

  /** `size(split(trim(s), "\\s+"))` with Spark semantics (space-only trim,
    * kept trailing empties), 0 for space-only strings. */
  def tokenCount(s: String): Int = {
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    if (lo == hi) return 0
    var n = 1
    var i = lo
    while (i < hi) {
      if (isWs(s.charAt(i))) {
        n += 1
        while (i < hi && isWs(s.charAt(i))) i += 1
      } else i += 1
    }
    n
  }

  /** `size(regexp_extract_all(s, "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))`:
    * alpha runs + digit runs + single non-ws other codepoints. */
  def bpeishCount(s: String): Int = {
    var n = 0
    var i = 0
    val len = s.length
    while (i < len) {
      val c = s.charAt(i)
      if (isAlpha(c)) {
        n += 1
        while (i < len && isAlpha(s.charAt(i))) i += 1
      } else if (isDigit(c)) {
        n += 1
        while (i < len && isDigit(s.charAt(i))) i += 1
      } else if (isWs(c)) {
        i += 1
      } else {
        n += 1
        i += Character.charCount(s.codePointAt(i)) // one match per codepoint
      }
    }
    n
  }

  /** Java-`\b` word character. QUIRK REPLICATED ON PURPOSE: without
    * UNICODE_CHARACTER_CLASS, Java's `\w` is ASCII [A-Za-z0-9_] but `\b`
    * boundaries are computed from `ch == '_' || Character.isLetterOrDigit`
    * — UNICODE letters/digits (OpenJDK Pattern.Bound). So "aé" is ONE word
    * run ('é' is a letter) and `(?i)\ba\b` does NOT match it; an ASCII-only
    * scanner would over-count. Verified by the parity property spec. */
  @inline private def isBoundWord(cp: Int): Boolean =
    cp == '_' || Character.isLetterOrDigit(cp)

  /** Count of `\b`-delimited word runs whose ASCII-case-folded form is in
    * `words` — exactly `regexp_count(s, "(?i)\\b(w1|w2|…)\\b")` for
    * ASCII-lowercase alternatives (the `\b` anchors make each whole run the
    * only candidate match; runs containing non-ASCII word chars can never
    * equal an ASCII marker, matching the regex's failed-boundary behavior). */
  def wordHits(s: String, words: java.util.HashSet[String]): Int = {
    var n = 0
    var i = 0
    val len = s.length
    val sb = new java.lang.StringBuilder(16)
    while (i < len) {
      if (isBoundWord(s.codePointAt(i))) {
        sb.setLength(0)
        var cp = s.codePointAt(i)
        while (i < len && isBoundWord(cp)) {
          if (cp >= 'A' && cp <= 'Z') sb.append((cp + 32).toChar)
          else sb.appendCodePoint(cp)
          i += Character.charCount(cp)
          if (i < len) cp = s.codePointAt(i)
        }
        if (words.contains(sb.toString)) n += 1
      } else i += Character.charCount(s.codePointAt(i))
    }
    n
  }

  /** Per-language word hits in one scan (shared tokenization; same
    * Java-`\b` run semantics as [[wordHits]]). */
  def multiWordHits(s: String, lexicons: Array[java.util.HashSet[String]]): Array[Int] = {
    val out = new Array[Int](lexicons.length)
    var i = 0
    val len = s.length
    val sb = new java.lang.StringBuilder(16)
    while (i < len) {
      if (isBoundWord(s.codePointAt(i))) {
        sb.setLength(0)
        var cp = s.codePointAt(i)
        while (i < len && isBoundWord(cp)) {
          if (cp >= 'A' && cp <= 'Z') sb.append((cp + 32).toChar)
          else sb.appendCodePoint(cp)
          i += Character.charCount(cp)
          if (i < len) cp = s.codePointAt(i)
        }
        val w = sb.toString
        var l = 0
        while (l < lexicons.length) {
          if (lexicons(l).contains(w)) out(l) += 1
          l += 1
        }
      } else i += Character.charCount(s.codePointAt(i))
    }
    out
  }

  /** Codepoint count of chars in [A-Za-z] (== length of
    * `regexp_replace(s, "[^A-Za-z]", "")`). */
  def alphaCount(s: String): Int = {
    var n = 0; var i = 0
    while (i < s.length) { if (isAlpha(s.charAt(i))) n += 1; i += 1 }
    n
  }

  /** Codepoint count of chars in [.,;:!?]. */
  def punctCount(s: String): Int = {
    var n = 0; var i = 0
    while (i < s.length) { if (isPunct(s.charAt(i))) n += 1; i += 1 }
    n
  }

  /** The fingerprint canonicalization pipeline on an ALREADY-lowercased
    * string: `regexp_replace(trim(regexp_replace(lc, "[^a-z0-9\\s]", " ")),
    * "\\s+", " ")` — each non-[a-z0-9\s] CODEPOINT becomes one space, then
    * space-only trim, then \s-runs collapse to single spaces. */
  def canonicalize(lc: String): String = {
    val len = lc.length
    // step 1: substitute — build into a char array (1 space per codepoint)
    val sub = new java.lang.StringBuilder(len)
    var i = 0
    while (i < len) {
      val c = lc.charAt(i)
      if ((c >= 'a' && c <= 'z') || isDigit(c) || isWs(c)) { sub.append(c); i += 1 }
      else { sub.append(' '); i += Character.charCount(lc.codePointAt(i)) }
    }
    // step 2: trim SPACES only
    var lo = 0
    var hi = sub.length
    while (lo < hi && sub.charAt(lo) == ' ') lo += 1
    while (hi > lo && sub.charAt(hi - 1) == ' ') hi -= 1
    // step 3: collapse \s runs
    val out = new java.lang.StringBuilder(hi - lo)
    i = lo
    while (i < hi) {
      val c = sub.charAt(i)
      if (isWs(c)) {
        out.append(' ')
        while (i < hi && isWs(sub.charAt(i))) i += 1
      } else { out.append(c); i += 1 }
    }
    out.toString
  }
}

/** All scalar text stats in one scan:
  * struct(chars, tokens, bpeish, alpha, punct, stop). `chars` counts
  * codepoints like Spark's `length()`; `stop` is the quality-score
  * stopword hit count. */
case class TextCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("chars", IntegerType, nullable = false),
    StructField("tokens", IntegerType, nullable = false),
    StructField("bpeish", IntegerType, nullable = false),
    StructField("alpha", IntegerType, nullable = false),
    StructField("punct", IntegerType, nullable = false),
    StructField("stop", IntegerType, nullable = false)))

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      s.codePointCount(0, s.length),
      TextScan.tokenCount(s),
      TextScan.bpeishCount(s),
      TextScan.alphaCount(s),
      TextScan.punctCount(s),
      TextScan.wordHits(s, TextCounts.StopWords)))
  }
  override protected def withNewChildInternal(c: Expression): TextCounts =
    copy(child = c)
  override def prettyName: String = "text_counts"
}

object TextCounts {
  /** The quality-score stopword list (same as the regex alternation). */
  private[functions] val StopWords: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("the", "and", "of", "to", "a", "in", "is", "it").foreach(s.add)
    s
  }
}

/** Marker-lexicon hit counts per language as array<int> (lexicon order =
  * constructor order), one shared tokenization scan. */
case class LangScores(child: Expression, langs: Seq[String],
    lexicons: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    lexicons.map { ws =>
      val s = new java.util.HashSet[String]()
      ws.foreach(s.add)
      s
    }.toArray

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    new GenericArrayData(TextScan.multiWordHits(s, sets))
  }
  override protected def withNewChildInternal(c: Expression): LangScores =
    copy(child = c)
  override def prettyName: String = "lang_scores"
}

/** Gopher/MassiveText-style repetition quality signals in one pass:
  * struct(dup_line_frac, dup_2gram_frac, adj_repeat_frac), each rounded
  * to 6 places —
  *  - dup_line_frac: 1 − distinct/total over `split(text, '\n')` lines;
  *  - dup_2gram_frac: 1 − distinct/total over POSITIONAL 2-token shingles
  *    of `split(trim(lower(text)), "\\s+")` tokens (WordShingles
  *    semantics: < 2 tokens → one all-token shingle → fraction 0);
  *  - adj_repeat_frac: fraction of adjacent token pairs that are equal
  *    (elongation detector); 0 for single-token docs.
  * Token semantics replicate Spark exactly: UTF8String.toLowerCase,
  * space-only trim, ASCII-\s runs with kept leading/trailing empty
  * fields. Value parity with the built-in-function twin is spec-asserted
  * (the q55 DuckDB oracle replays the built-in formulation). */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("dup_line_frac", DoubleType, nullable = false),
    StructField("dup_2gram_frac", DoubleType, nullable = false),
    StructField("adj_repeat_frac", DoubleType, nullable = false)))

  private def round6(d: Double): Double =
    java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  override def nullSafeEval(v: Any): Any = {
    val raw = v.asInstanceOf[UTF8String]
    // ── lines ──
    val s = raw.toString
    var total = 1
    var i = 0
    while (i < s.length) { if (s.charAt(i) == '\n') total += 1; i += 1 }
    val seen = new java.util.HashSet[String](total * 2)
    var start = 0
    i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == '\n') {
        seen.add(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    val dupLine = (total - seen.size).toDouble / total
    // ── tokens (split(trim(lower(text)), "\s+") semantics) ──
    val lc = raw.toLowerCase.toString
    var lo = 0
    var hi = lc.length
    while (lo < hi && lc.charAt(lo) == ' ') lo += 1
    while (hi > lo && lc.charAt(hi - 1) == ' ') hi -= 1
    val toks = new scala.collection.mutable.ArrayBuffer[String](16)
    def isWs(c: Char) =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    if (lo == hi) toks += ""
    else {
      var p = lo
      i = lo
      while (i < hi) {
        if (isWs(lc.charAt(i))) {
          toks += lc.substring(p, i)
          while (i < hi && isWs(lc.charAt(i))) i += 1
          p = i
        } else i += 1
      }
      toks += lc.substring(p, hi)
    }
    val m = toks.length
    // ── positional 2-gram dup fraction + adjacent repeats ──
    var dup2: Double = 0.0
    var adj: Double = 0.0
    if (m >= 2) {
      val n2 = m - 1
      val g = new java.util.HashSet[String](n2 * 2)
      var eq = 0
      i = 0
      while (i < n2) {
        g.add(toks(i) + " " + toks(i + 1))
        if (toks(i) == toks(i + 1)) eq += 1
        i += 1
      }
      dup2 = (n2 - g.size).toDouble / n2
      adj = eq.toDouble / n2
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](round6(dupLine), round6(dup2), round6(adj)))
  }
  override protected def withNewChildInternal(c: Expression): RepetitionStats =
    copy(child = c)
  override def prettyName: String = "repetition_stats"
}

/** argmax language directly (one scan, one eval): the language (constructor
  * order = sorted language codes) with the most marker-word hits, ties
  * broken by the earlier code — identical to sorting (score desc, lang asc)
  * and taking the head. */
case class LangIdBest(child: Expression, langs: Seq[String],
    lexicons: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    lexicons.map { ws =>
      val s = new java.util.HashSet[String]()
      ws.foreach(s.add)
      s
    }.toArray
  @transient private lazy val langUtf8: Array[UTF8String] =
    langs.map(UTF8String.fromString).toArray

  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = {
    val hits = TextScan.multiWordHits(v.asInstanceOf[UTF8String].toString, sets)
    var best = 0
    var i = 1
    while (i < hits.length) {
      if (hits(i) > hits(best)) best = i
      i += 1
    }
    langUtf8(best)
  }
  override protected def withNewChildInternal(c: Expression): LangIdBest =
    copy(child = c)
  override def prettyName: String = "lang_id_best"
}

/** Fingerprint canonical text: Spark `lower()` (UTF8String.toLowerCase —
  * the exact same call) followed by the substitute/trim/collapse pipeline.
  * md5 stays an ordinary builtin on top. */
case class CanonicalText(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      TextScan.canonicalize(v.asInstanceOf[UTF8String].toLowerCase.toString))
  override protected def withNewChildInternal(c: Expression): CanonicalText =
    copy(child = c)
  override def prettyName: String = "canonical_text"
}

/** Winnowing fingerprints fused into one pass: positional k-gram shingles
  * (WordShingles semantics incl. the short-doc single-shingle fallback and
  * null-array → [""]), per-shingle hash, per-window minima, first-occurrence
  * dedup — value-identical to the HOF chain
  * `array_distinct(transform(seq, i => array_min(slice(kgramHashes, i+1, w))))`
  * which evaluated its lambdas INTERPRETED per window position.
  *
  * `hashKind`:
  *  - `"xxhash64"` — Spark's `xxhash64(shingle)` (seed 42), the production
  *    path;
  *  - `"md5_60"` — the portable `Dedup.md5Hash60` (decimal value of the
  *    first 15 md5 hex chars), so the DuckDB oracle can replay the exact
  *    fingerprints. */
/** Shared positional k-gram hashing (the shingle+hash front half of
  * winnowing): WordShingles semantics incl. the short-doc single-shingle
  * fallback and null-array → [""]. Factored out so [[WinnowedHashes]]
  * (window minima) and [[KgramHashes]] (every position, for
  * substring-level dedup) are value-identical on the shared prefix. */
private[functions] object KgramHash {
  private val space = UTF8String.fromString(" ")
  private val md5 =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  def hash(hashKind: String, s: UTF8String): Long =
    if (hashKind == "xxhash64")
      org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
    else {
      val d = md5.get().digest(s.getBytes)
      // first 15 hex chars = first 7 bytes + high nibble of the 8th
      var v = 0L
      var i = 0
      while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      (v << 4) | ((d(7) & 0xf0L) >> 4)
    }

  /** hashes(i) = hash of the k-gram starting at token i; a doc shorter
    * than k yields ONE whole-doc hash. */
  def hashArray(v: Any, k: Int, hashKind: String): Array[Long] =
    if (v == null) Array(hash(hashKind, UTF8String.fromString("")))
    else {
      val arr = v.asInstanceOf[ArrayData]
      val m = arr.numElements()
      def tok(i: Int): UTF8String =
        if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      if (m < k) {
        val all = new Array[UTF8String](m)
        var i = 0
        while (i < m) { all(i) = tok(i); i += 1 }
        Array(hash(hashKind, UTF8String.concatWs(space, all: _*)))
      } else {
        val out = new Array[Long](m - k + 1)
        var i = 0
        while (i < out.length) {
          val parts = new Array[UTF8String](k)
          var j = 0
          while (j < k) { parts(j) = tok(i + j); j += 1 }
          out(i) = hash(hashKind, UTF8String.concatWs(space, parts: _*))
          i += 1
        }
        out
      }
    }
}

/** Every positional k-gram hash (index = token position) in one fused
  * pass — the [[WinnowedHashes]] front half WITHOUT window minima or
  * dedup. Substring-level dedup needs all positions: every token offset
  * is probed for cross-document duplication. */
case class KgramHashes(child: Expression, k: Int, hashKind: String)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, s"k must be >= 1, got $k")
  require(hashKind == "xxhash64" || hashKind == "md5_60",
    s"hashKind must be xxhash64 or md5_60, got $hashKind")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      KgramHash.hashArray(child.eval(input), k, hashKind))

  override protected def withNewChildInternal(c: Expression): KgramHashes =
    copy(child = c)
  override def prettyName: String = "kgram_hashes"
}

/** Content-defined chunking over a token array, fused into one pass:
  * a token ENDS a chunk when `hash(token) % avgChunkTokens == 0` —
  * boundaries depend only on LOCAL content, so an insertion re-chunks
  * its neighborhood and nothing else (fixed-stride chunk boundaries
  * shift for the whole rest of the document). Returns
  * `array<struct<hash: long, n_tokens: int>>` — chunk hash = hash of
  * the space-joined chunk tokens, the trailing partial chunk included.
  *
  * This is the SCALE path for substring-level dedup: ~1 emitted row per
  * `avgChunkTokens` instead of [[KgramHashes]]' row per position, at
  * the cost of a weaker guarantee (a duplicated span is detected when
  * it wholly contains a chunk — spans ≥ ~2× the average chunk size in
  * expectation). `hashKind` as elsewhere: xxhash64 production, md5_60
  * for SQL-oracle replay (boundary tests use floorMod, which matches
  * SQL `%` on md5_60's nonnegative values). */
case class CdcChunkHashes(child: Expression, avgChunkTokens: Int, hashKind: String)
    extends UnaryExpression with CodegenFallback {
  require(avgChunkTokens >= 2, s"avgChunkTokens must be >= 2, got $avgChunkTokens")
  require(hashKind == "xxhash64" || hashKind == "md5_60",
    s"hashKind must be xxhash64 or md5_60, got $hashKind")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("hash", LongType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  private val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val out = new java.util.ArrayList[Any]()
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val m = arr.numElements()
      val buf = new java.util.ArrayList[UTF8String](avgChunkTokens * 2)
      def close(): Unit = if (!buf.isEmpty) {
        val joined = UTF8String.concatWs(space, buf.toArray(new Array[UTF8String](buf.size)): _*)
        out.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](KgramHash.hash(hashKind, joined), buf.size)))
        buf.clear()
      }
      var i = 0
      while (i < m) {
        val tok = if (arr.isNullAt(i)) UTF8String.fromString("") else arr.getUTF8String(i)
        buf.add(tok)
        if (java.lang.Math.floorMod(KgramHash.hash(hashKind, tok), avgChunkTokens.toLong) == 0L)
          close()
        i += 1
      }
      close() // trailing partial chunk
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): CdcChunkHashes =
    copy(child = c)
  override def prettyName: String = "cdc_chunk_hashes"
}

case class WinnowedHashes(child: Expression, k: Int, window: Int, hashKind: String)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && window >= 1, s"k and window must be >= 1, got $k/$window")
  require(hashKind == "xxhash64" || hashKind == "md5_60",
    s"hashKind must be xxhash64 or md5_60, got $hashKind")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val hashes: Array[Long] = KgramHash.hashArray(child.eval(input), k, hashKind)
    val n = hashes.length
    val nWin = math.max(n - (window - 1), 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long](nWin * 2)
    var i = 0
    while (i < nWin) {
      var mn = hashes(i)
      var j = i + 1
      val end = math.min(i + window, n)
      while (j < end) { if (hashes(j) < mn) mn = hashes(j); j += 1 }
      seen.add(mn)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): WinnowedHashes =
    copy(child = c)
  override def prettyName: String = "winnowed_hashes"
}

/** REAL byte-pair-encoding token count in one fused pass — greedy
  * min-rank merge loop (the GPT-2 `bpe()` algorithm): per word, start
  * from codepoint symbols, repeatedly find the LOWEST-RANK adjacent pair
  * present and merge ALL its occurrences left-to-right non-overlapping,
  * until no ranked pair remains; the count is the surviving symbol count
  * summed over words. This replaces heuristic counts (`bpeishCount`)
  * whose drift vs a real tokenizer is unbounded — packing (q56) and
  * token budgeting want merge-true numbers.
  *
  * Words come from the family tokenization convention (trim spaces,
  * lowercase, split `\s+`); empty words contribute 0 symbols, so the
  * Java-vs-RE2 trailing-empty-token difference cannot surface in counts.
  * Symbols are CODEPOINTS (a surrogate pair is one symbol), matching SQL
  * engines' per-character string slicing for oracle replay.
  *
  * `merges` is the learned merge list in rank order (a real
  * `merges.txt`: one "left right" pair per line — see
  * `TextAnalysis.parseMerges`). The list serializes with the expression;
  * at production vocab sizes (~50k merges ≈ 1 MB) that ships once per
  * task closure like any literal — acceptable; move to a broadcast only
  * if profiling says otherwise. */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType

  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(a + "\u0000" + b, Int.box(i))
    }
    m
  }

  // merges may arrive as a List (parseMerges): index an Array in the
  // merge loop, not the Seq — merges(best) on a 50k-entry List walks
  // ~25k cons cells per lookup
  @transient private lazy val mergeArr: Array[(String, String)] = merges.toArray

  /** Seed pairs: merges whose BOTH sides are single codepoints, packed
    * (left << 32 | right) and sorted for allocation-free binary search.
    * Every merge chain starts from one of these (a multi-codepoint symbol
    * can only exist after an earlier merge fired), so a word containing
    * no seed pair can never merge — countable without building a single
    * symbol object: the common case, and what dominated the scan profile. */
  @transient private lazy val seedPairs: Array[Long] =
    merges.collect {
      case (a, b) if a.codePointCount(0, a.length) == 1 &&
          b.codePointCount(0, b.length) == 1 =>
        (a.codePointAt(0).toLong << 32) | b.codePointAt(0).toLong
    }.toArray.sorted

  /** One allocation-free scan: (codepoint count, any-seed-pair-present). */
  private def scanWord(w: String): (Int, Boolean) = {
    var cps = 0
    var seed = false
    var prev = -1
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      cps += 1
      if (!seed && prev >= 0 && seedPairs.length > 0 &&
          java.util.Arrays.binarySearch(seedPairs, (prev.toLong << 32) | cp.toLong) >= 0)
        seed = true
      prev = cp
      i += Character.charCount(cp)
    }
    (cps, seed)
  }

  private def countWord(w: String): Int = {
    if (w.isEmpty) return 0
    val (cps, seed) = scanWord(w)
    if (!seed) return cps // no seed pair => no merge can ever fire
    val syms = new Array[String](cps)
    var i = 0
    var n = 0
    while (i < w.length) {
      val c = Character.charCount(w.codePointAt(i))
      syms(n) = w.substring(i, i + c)
      n += 1
      i += c
    }
    while (n >= 2) {
      var best = Int.MaxValue
      var j = 0
      while (j < n - 1) {
        val r = rank.get(syms(j) + "\u0000" + syms(j + 1))
        if (r != null && r < best) best = r
        j += 1
      }
      if (best == Int.MaxValue) return n
      val (a, b) = mergeArr(best)
      // merge all left-to-right non-overlapping occurrences IN PLACE
      var w2 = 0
      j = 0
      while (j < n) {
        if (j < n - 1 && syms(j) == a && syms(j + 1) == b) {
          syms(w2) = a + b; j += 2
        } else { syms(w2) = syms(j); j += 1 }
        w2 += 1
      }
      n = w2
    }
    n
  }

  override def nullSafeEval(v: Any): Any = {
    // trim strips SPACES only (Spark trim parity); lowercase via
    // UTF8String for Spark lower() parity (locale-insensitive — plain
    // String.toLowerCase diverges under tr/az default locales); \s+ split.
    // String.split drops trailing empties vs Spark's limit=-1, but empty
    // words count 0 symbols, so totals are unaffected.
    val s = v.asInstanceOf[UTF8String].toLowerCase.toString
    var lo = 0; var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    val words = s.substring(lo, hi).split("\\s+")
    var total = 0
    var i = 0
    while (i < words.length) { total += countWord(words(i)); i += 1 }
    total
  }

  override protected def withNewChildInternal(c: Expression): BpeTokenCount =
    copy(child = c)
  override def prettyName: String = "bpe_token_count"
}

/** PII redaction + audit counts in one chain of Matcher passes —
  * struct(redacted, email, ipv4, phone). `redactPii` and `piiCounts`
  * each re-ran the 3-pattern regex chain (6 passes when a query selects
  * both, as the audit query does); here each pattern runs ONE find loop
  * that counts and substitutes simultaneously on the progressively
  * redacted text — identical values by construction (same java.util.regex
  * Patterns, same sequential order). */
/** Feature-hashed dense text embedding (the "hashing trick"): every token
  * of the child ARRAY hashes to one of `dim` dimensions and a ±1 sign
  * (sign = low hash bit, dimension = remaining bits mod dim — independent
  * by construction); the signed counts l2-normalize into a unit
  * `Array[Float]`. The output is drop-in compatible with the
  * Similarity/Dedup vector tier (cosine of identical token multisets
  * is exactly 1.0), turning raw text into ANN-searchable vectors with no
  * model and no shuffle — a pure projection at any scale.
  *
  * `hashKind` as elsewhere in this file: `xxhash64` (seed 42) production,
  * `md5_60` so a SQL oracle can replay the exact vector. Determinism:
  * the vector is a pure function of the token multiset.
  *
  * CodegenFallback is deliberate (same reasoning as [[MinHashSignature]]):
  * one boxed call per row does the whole O(tokens + dim) pass. */
case class HashedEmbedding(child: Expression, dim: Int, hashKind: String)
    extends UnaryExpression with CodegenFallback {
  require(dim > 0, s"dim must be > 0, got $dim")
  require(hashKind == "xxhash64" || hashKind == "md5_60",
    s"hashKind must be xxhash64 or md5_60, got $hashKind")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val counts = new Array[Long](dim)
    val m = arr.numElements()
    var i = 0
    while (i < m) {
      val t =
        if (arr.isNullAt(i)) UTF8String.fromString("") else arr.getUTF8String(i)
      val h = KgramHash.hash(hashKind, t)
      // h >>> 1 is nonnegative, so plain % is the unsigned remainder
      counts(((h >>> 1) % dim).toInt) += (if ((h & 1L) == 1L) 1L else -1L)
      i += 1
    }
    var ss = 0.0
    i = 0
    while (i < dim) { val c = counts(i).toDouble; ss += c * c; i += 1 }
    val out = new Array[Any](dim)
    if (ss == 0.0) {
      i = 0; while (i < dim) { out(i) = 0.0f; i += 1 }
    } else {
      val norm = math.sqrt(ss)
      i = 0; while (i < dim) { out(i) = (counts(i) / norm).toFloat; i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): HashedEmbedding =
    copy(child = c)
  override def prettyName: String = "hashed_embedding"
}

case class PiiRedactCounts(child: Expression, patterns: Seq[(String, String, String)])
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val compiled: Array[(java.util.regex.Pattern, String)] =
    patterns.map { case (_, p, r) => (java.util.regex.Pattern.compile(p), r) }.toArray

  override def dataType: DataType = StructType(
    StructField("redacted", StringType, nullable = true) +:
      patterns.map { case (name, _, _) =>
        StructField(name, IntegerType, nullable = false)
      })

  override def nullSafeEval(v: Any): Any = {
    var cur = v.asInstanceOf[UTF8String].toString
    val counts = new Array[Int](compiled.length)
    var i = 0
    while (i < compiled.length) {
      val (p, repl) = compiled(i)
      val m = p.matcher(cur)
      if (m.find()) {
        val sb = new java.lang.StringBuilder(cur.length)
        var n = 0
        do {
          n += 1
          m.appendReplacement(sb, repl)
        } while (m.find())
        m.appendTail(sb)
        counts(i) = n
        cur = sb.toString
      }
      i += 1
    }
    val fields = new Array[Any](1 + counts.length)
    fields(0) = UTF8String.fromString(cur)
    i = 0
    while (i < counts.length) { fields(i + 1) = counts(i); i += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(fields)
  }

  override protected def withNewChildInternal(c: Expression): PiiRedactCounts =
    copy(child = c)
  override def prettyName: String = "pii_redact_counts"
}

/** Deflate compression ratio of the UTF-8 text: compressed/uncompressed
  * bytes in [0, ~1.05] (tiny inputs can exceed 1 with the header
  * overhead). A Gopher-family quality signal: highly repetitive or
  * templated text compresses far below prose (~0.3–0.5 for English,
  * < 0.1 for boilerplate loops), machine noise compresses near 1.
  * Empty text → 0.0 by convention.
  *
  * `level` is the deflate level (1 fast … 9 best, 6 default — the zlib
  * convention); the value is deterministic for a given level and JDK
  * zlib, which is why this operator is spec-verified against planted
  * redundancy rather than SQL-oracle-gated (no SQL engine exposes raw
  * deflate). One Deflater per eval, `end()`ed — no native-memory leak.
  * CodegenFallback as elsewhere: one boxed call around a native-zlib
  * pass. */
case class CompressionRatio(child: Expression, level: Int)
    extends UnaryExpression with CodegenFallback {
  require(level >= 1 && level <= 9, s"level must be in [1,9], got $level")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "compression_ratio"

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    if (bytes.isEmpty) return 0.0
    val d = new java.util.zip.Deflater(level, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / bytes.length
    } finally d.end()
  }

  override protected def withNewChildInternal(c: Expression): CompressionRatio =
    copy(child = c)
}

object TextStats {
  import org.apache.spark.sql.graft.bridge

  def text_counts(text: Column): Column =
    bridge.column(TextCounts(bridge.expression(text)))

  def compression_ratio(text: Column, level: Int = 6): Column =
    bridge.column(CompressionRatio(bridge.expression(text), level))

  def lang_scores(text: Column, langs: Seq[String], lexicons: Seq[Seq[String]]): Column =
    bridge.column(LangScores(bridge.expression(text), langs, lexicons))

  def lang_id_best(text: Column, langs: Seq[String], lexicons: Seq[Seq[String]]): Column =
    bridge.column(LangIdBest(bridge.expression(text), langs, lexicons))

  def canonical_text(text: Column): Column =
    bridge.column(CanonicalText(bridge.expression(text)))

  def winnowed_hashes(tokens: Column, k: Int, window: Int,
      hashKind: String = "xxhash64"): Column =
    bridge.column(WinnowedHashes(bridge.expression(tokens), k, window, hashKind))

  def kgram_hashes(tokens: Column, k: Int, hashKind: String = "xxhash64"): Column =
    bridge.column(KgramHashes(bridge.expression(tokens), k, hashKind))

  def bpe_token_count(text: Column, merges: Seq[(String, String)]): Column =
    bridge.column(BpeTokenCount(bridge.expression(text), merges))

  def cdc_chunk_hashes(tokens: Column, avgChunkTokens: Int,
      hashKind: String = "xxhash64"): Column =
    bridge.column(CdcChunkHashes(bridge.expression(tokens), avgChunkTokens, hashKind))

  def hashed_embedding(tokens: Column, dim: Int,
      hashKind: String = "xxhash64"): Column =
    bridge.column(HashedEmbedding(bridge.expression(tokens), dim, hashKind))

  def pii_redact_counts(text: Column,
      patterns: Seq[(String, String, String)]): Column =
    bridge.column(PiiRedactCounts(bridge.expression(text), patterns))

  def repetition_stats(text: Column): Column =
    bridge.column(RepetitionStats(bridge.expression(text)))
}
