package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused HTML/markup → clean text scan, the front door of a web-crawl
  * ingestion pipeline. One expression, four staged transforms per row:
  *
  *  1. `<script …>…</script>` and `<style …>…</style>` drop WITH their
  *     contents (case-insensitive, dot-matches-newline) — code and CSS
  *     are never training text;
  *  2. every remaining `<…>` tag drops (contents stay). An unterminated
  *     `<` survives literally, exactly like the regex `<[^>]*>` an
  *     external oracle replays;
  *  3. character entities decode in ONE left-to-right pass (no
  *     re-scanning, so `&amp;lt;` yields the literal `&lt;` like a real
  *     HTML parser): named `&amp; &lt; &gt; &quot; &apos;`, numeric
  *     `&#NN;` / `&#xHH;` (any codepoint), and `&nbsp;` → a PLAIN space —
  *     cleaning wants ordinary whitespace, not U+00A0. Unknown or
  *     malformed entities survive literally;
  *  4. whitespace collapse: every run of control-or-space chars
  *     (cp ≤ 0x20) becomes one space; leading/trailing runs drop.
  *
  * The stages are regex-chain-replayable (`Java ∩ RE2` subset, the
  * [[TextStats]] PII convention): 1–2 are literally the patterns below;
  * 3 equals a replace chain that decodes `&amp;` LAST, provided the
  * input has no pre-existing entity-looking text (the gated input is
  * constructed so; the single-pass loop here is the semantics that is
  * CORRECT on adversarial input, spec-covered); 4 is
  * `regexp_replace(x, '[\x00-\x20]+', ' ', 'g')` + trim.
  *
  * CodegenFallback is deliberate (same reasoning as [[MinHashSignature]]):
  * the per-row call walks the whole string; generated code would save
  * one boxed call around an O(len) loop. */
case class StripMarkup(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_markup"

  override def nullSafeEval(v: Any): Any = {
    val s0 = v.asInstanceOf[UTF8String].toString
    val s1 = StripMarkup.Style.matcher(
      StripMarkup.Script.matcher(s0).replaceAll(" ")).replaceAll(" ")
    val s2 = StripMarkup.Tag.matcher(s1).replaceAll(" ")
    UTF8String.fromString(StripMarkup.collapseWs(StripMarkup.decodeEntities(s2)))
  }

  override protected def withNewChildInternal(newChild: Expression): StripMarkup =
    copy(child = newChild)
}

/** Unicode-normalizing text cleanup, the "fix the bytes" stage that runs
  * before any hash/shingle/token operator: byte-identical text is what
  * exact dedup keys on, so `e`+U+0301 vs precomposed `é` MUST collapse
  * before hashing or the same sentence dedups as two documents.
  *
  *  1. NFC canonical composition (`java.text.Normalizer`; skipped via the
  *     `isNormalized` quick check — identity on ASCII, the common case);
  *  2. control/whitespace collapse: every run of cp ≤ 0x20 or DEL (0x7F)
  *     becomes one space, leading/trailing runs drop. Non-ASCII spaces
  *     (U+00A0 …) survive — they are CONTENT under NFC, and an oracle's
  *     `[\x00-\x20\x7F]+` regex sees exactly the same boundary.
  *
  * Externally replayable as `trim(regexp_replace(nfc_normalize(x),
  * '[\x00-\x20\x7F]+', ' ', 'g'))` (both regex dialects agree on explicit
  * `\xNN` classes — the Java∩RE2 convention of [[TextStats]]).
  *
  * CodegenFallback as elsewhere in this file: one boxed call per row
  * around an O(len) pass. */
case class NormalizeText(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def nullSafeEval(v: Any): Any = {
    import java.text.Normalizer
    val s0 = v.asInstanceOf[UTF8String].toString
    val s1 =
      if (Normalizer.isNormalized(s0, Normalizer.Form.NFC)) s0
      else Normalizer.normalize(s0, Normalizer.Form.NFC)
    UTF8String.fromString(NormalizeText.collapseControls(s1))
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  /** Runs of cp ≤ 0x20 or DEL → one space; leading/trailing runs drop. */
  private[graft] def collapseControls(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var pendingSpace = false
    while (i < n) {
      val c = s.charAt(i)
      if (c <= ' ' || c == '\u007f') pendingSpace = true
      else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}

object StripMarkup {
  private val Script = Pattern.compile("<script[^>]*>.*?</script>",
    Pattern.CASE_INSENSITIVE | Pattern.DOTALL)
  private val Style = Pattern.compile("<style[^>]*>.*?</style>",
    Pattern.CASE_INSENSITIVE | Pattern.DOTALL)
  private val Tag = Pattern.compile("<[^>]*>")

  private val Named = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">",
    "quot" -> "\"", "apos" -> "'", "nbsp" -> " ")

  /** One left-to-right pass; decoded output is never re-scanned. */
  private[graft] def decodeEntities(s: String): String = {
    val n = s.length
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        // entities are short; a far-away ';' means this '&' is literal
        if (semi < 0 || semi - i > 10) { sb.append(c); i += 1 }
        else {
          val body = s.substring(i + 1, semi)
          val decoded: String =
            if (body.startsWith("#x") || body.startsWith("#X")) {
              val hex = body.substring(2)
              if (hex.nonEmpty && hex.forall(ch => Character.digit(ch, 16) >= 0))
                codePointOrNull(java.lang.Long.parseLong(hex, 16))
              else null
            } else if (body.startsWith("#")) {
              val dec = body.substring(1)
              if (dec.nonEmpty && dec.forall(_.isDigit))
                codePointOrNull(java.lang.Long.parseLong(dec))
              else null
            } else Named.getOrElse(body, null)
          if (decoded == null) { sb.append(c); i += 1 }
          else { sb.append(decoded); i = semi + 1 }
        }
      }
    }
    sb.toString
  }

  private def codePointOrNull(cp: Long): String =
    if (cp >= 0 && cp <= Character.MAX_CODE_POINT && cp != 0)
      new String(Character.toChars(cp.toInt))
    else null

  /** Runs of cp ≤ 0x20 → one space; leading/trailing runs drop. */
  private[graft] def collapseWs(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var pendingSpace = false
    while (i < n) {
      val c = s.charAt(i)
      if (c <= ' ') pendingSpace = true
      else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
