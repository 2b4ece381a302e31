package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Python-literal → JSON normalization.
  *
  * The reference parses stringified object cells with `ast.literal_eval`
  * falling back to `json.loads` (gluestick/singer.py:306-331,
  * pandas_utils.py:282,340): inputs look like
  * `{'a': None, 'b': True, 'c': 'x'}` — single quotes, Python constants.
  * We normalize such strings to strict JSON so Spark's codegen'd
  * `from_json` does the actual parsing; the normalizer itself is a native
  * Catalyst expression (no UDF serialization, null-safe).
  */
object PyLiteral {

  /** Normalize a Python-literal string to JSON. Already-valid JSON passes
    * through unchanged (modulo whitespace) because the tokenizer treats
    * double-quoted strings as strings and bare words outside strings.
    * Returns null for null input; leaves unparseable text as-is (downstream
    * `from_json` then yields null — the reference's coerce behavior). */
  def toJson(s: String): String = {
    if (s == null) return null
    val n = s.length
    val out = new java.lang.StringBuilder(n + 8)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\'' || c == '"') {
        // String literal: re-emit double-quoted JSON string
        val quote = c
        out.append('"')
        i += 1
        while (i < n && s.charAt(i) != quote) {
          val ch = s.charAt(i)
          if (ch == '\\' && i + 1 < n) {
            val nx = s.charAt(i + 1)
            nx match {
              case '\'' => out.append('\'') // \' is plain quote in JSON
              case '"'  => out.append("\\\"")
              case 'n' | 't' | 'r' | 'b' | 'f' | '\\' | '/' =>
                out.append('\\').append(nx)
              case 'u' => out.append("\\u")
              case other => // python tolerates unknown escapes: keep verbatim
                out.append('\\').append('\\').append(other)
            }
            i += 2
          } else {
            ch match {
              case '"'  => out.append("\\\"")
              case '\\' => out.append("\\\\")
              case '\n' => out.append("\\n")
              case '\t' => out.append("\\t")
              case '\r' => out.append("\\r")
              case o if o < ' ' => out.append(f"\\u${o.toInt}%04x")
              case o    => out.append(o)
            }
            i += 1
          }
        }
        i += 1 // closing quote
        out.append('"')
      } else if (Character.isLetter(c) || c == '_') {
        val start = i
        while (i < n && (Character.isLetterOrDigit(s.charAt(i)) || s.charAt(i) == '_')) i += 1
        s.substring(start, i) match {
          case "None" | "null" | "NaN" | "nan" => out.append("null")
          case "True" | "true"                 => out.append("true")
          case "False" | "false"               => out.append("false")
          case "Infinity" | "inf"              => out.append("null")
          case w                               => out.append(w) // leave; from_json will null out
        }
      } else {
        // Python tuples → JSON arrays
        if (c == '(') out.append('[')
        else if (c == ')') out.append(']')
        else out.append(c)
        i += 1
      }
    }
    out.toString
  }

  def parse_py_literal(c: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(ParsePyLiteral(bridge.expression(c)))
  }
}

/** Native expression wrapper so the normalizer participates in Catalyst
  * (constant-folds on literals, null-intolerant). Falls back to interpreted
  * eval inside codegen spans; the hot parse path is still `from_json`. */
case class ParsePyLiteral(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(PyLiteral.toJson(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.PyLiteral.toJson($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): ParsePyLiteral =
    copy(child = newChild)

  override def prettyName: String = "parse_py_literal"
}

/** Python float `str()` rendering as a native expression (no UDF — keeps
  * the row-hash projection inside whole-stage codegen). */
case class PyFloatRepr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(PyStr.floatRepr(input.asInstanceOf[Double]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.PyStr.floatRepr($c))")
  override protected def withNewChildInternal(newChild: Expression): PyFloatRepr =
    copy(child = newChild)
  override def prettyName: String = "py_float_repr"
}

/** numpy float32 scalar `str()` rendering as a native expression — shortest
  * round-trip digits at FLOAT width (see [[PyStr.float32Repr]]). Used for
  * FloatType columns so row hashes match reference frames where pandas kept
  * the float32 dtype (any mixed-dtype row, i.e. every snapshot frame with a
  * pk column). */
case class PyFloat32Repr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(PyStr.float32Repr(input.asInstanceOf[Float]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.PyStr.float32Repr($c))")
  override protected def withNewChildInternal(newChild: Expression): PyFloat32Repr =
    copy(child = newChild)
  override def prettyName: String = "py_float32_repr"
}

/** Python `str()`/`repr()` of a COMPLEX cell (struct/array/map) as a native
  * expression. The reference hashes object-valued cells via `str(v)`
  * (gluestick/etl_utils.py:292-295) and compress_rows_to_col stringifies
  * each row-dict with `str(x.to_dict())` (pandas_utils.py:441): single-
  * quoted strings with CPython quote switching, `True`/`False`/`None`,
  * `", "` element and `": "` key separators. Interpreted eval
  * (CodegenFallback) — complex cells are off the scalar hot path, and the
  * surrounding projection stays codegen'd. */
case class PyRepr(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any = {
    val sb = new java.lang.StringBuilder
    PyStr.appendRepr(sb, input, child.dataType)
    UTF8String.fromString(sb.toString)
  }
  override protected def withNewChildInternal(newChild: Expression): PyRepr =
    copy(child = newChild)
  override def prettyName: String = "py_repr"
}

/** Canonical Python `str()` rendering + MD5 row hash.
  *
  * The reference's change-data-capture hashes each row as
  * `md5("".join(str(v) for v in row[sorted_cols] if v == v and v is not None))`
  * (gluestick/etl_utils.py:272-296). Hash-snapshot compatibility requires
  * byte-identical string forms: `True`/`False`, `1.5`, `2024-01-01 00:00:00`.
  */
object PyStr {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types._

  /** Python str() of a float: shortest round-trip digits, switching to
    * exponent notation only below 1e-4 or at/above 1e16 (Java's
    * Double.toString switches at 1e-3/1e7, so its exponent forms inside
    * Python's plain-decimal band are re-expanded digit-wise). */
  def floatRepr(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d.isInfinite) return if (d > 0) "inf" else "-inf"
    val abs = math.abs(d)
    if (d == math.rint(d) && abs < 1e16) {
      val l = d.toLong
      s"$l.0"
    } else {
      val j = java.lang.Double.toString(d) // shortest round-trip digits
      if (!j.contains("E")) j
      else {
        val Array(m0, e) = j.split("E")
        val exp = e.toInt
        val pythonPlain = abs >= 1e-4 && abs < 1e16
        if (!pythonPlain) {
          val mantissa = if (m0.endsWith(".0")) m0.dropRight(2) else m0
          f"${mantissa}e${if (exp < 0) "-" else "+"}${math.abs(exp)}%02d"
        } else {
          // shift the decimal point by exp to render without exponent
          val neg = m0.startsWith("-")
          val digits0 = m0.stripPrefix("-")
          val dot = digits0.indexOf('.')
          val digits = digits0.replace(".", "")
          val pointPos = dot + exp // digits before the decimal point
          val plain =
            if (pointPos <= 0) "0." + ("0" * -pointPos) + digits
            else if (pointPos >= digits.length)
              digits + ("0" * (pointPos - digits.length)) + ".0"
            else digits.substring(0, pointPos) + "." + digits.substring(pointPos)
          val trimmed =
            if (plain.contains('.'))
              plain.reverse.dropWhile(_ == '0').reverse match {
                case s if s.endsWith(".") => s + "0"
                case s                    => s
              }
            else plain
          (if (neg) "-" else "") + trimmed
        }
      }
    }
  }

  /** numpy float32 scalar `str()`/`repr()` (numpy >= 1.14 dragon4): the
    * SHORTEST decimal digits that round-trip at float32 width, with
    * CPython-style rendering — positional iff `1e-4 <= |value| < 1e16`,
    * else `<digits>e±NN`. Two deliberate differences from [[floatRepr]]
    * (CPython float64): digits are shortest at 32-bit width (str(
    * np.float32(0.1)) == '0.1', not '0.10000000149011612'), and the
    * positional/scientific split keys off the VALUE, not the rendered
    * exponent — np.float32(1e-4) is 9.9999997e-05 < 1e-4, so numpy prints
    * '1e-04' where CPython's str(0.0001) is positional. Verified against
    * numpy 1.26.4 output value-by-value in PyLiteralSpec. */
  def float32Repr(f: Float): String = {
    if (java.lang.Float.isNaN(f)) return "nan"
    if (java.lang.Float.isInfinite(f)) return if (f > 0) "inf" else "-inf"
    if (f == 0.0f)
      return if (java.lang.Float.floatToRawIntBits(f) != 0) "-0.0" else "0.0"
    val af = math.abs(f)
    val exact = new java.math.BigDecimal(af.toDouble) // widening is exact
    // shortest digit count whose closest decimal round-trips (<= 9 always)
    var bd: java.math.BigDecimal = null
    var p = 1
    while (bd == null) {
      val cand = exact.round(
        new java.math.MathContext(p, java.math.RoundingMode.HALF_EVEN))
      // parseFloat is correctly rounded per spec (floatValue() is not)
      if (java.lang.Float.parseFloat(cand.toPlainString) == af || p >= 12)
        bd = cand
      p += 1
    }
    val st = bd.stripTrailingZeros
    val digits = st.unscaledValue.toString
    val exp10 = digits.length - 1 - st.scale // decimal exponent of lead digit
    val sb = new java.lang.StringBuilder
    if (f < 0) sb.append('-')
    if (af.toDouble < 1e-4 || af.toDouble >= 1e16) { // value-based (numpy)
      sb.append(digits.charAt(0))
      if (digits.length > 1) sb.append('.').append(digits, 1, digits.length)
      sb.append('e').append(if (exp10 < 0) '-' else '+')
      val ae = math.abs(exp10)
      if (ae < 10) sb.append('0')
      sb.append(ae)
    } else if (exp10 >= 0) {
      if (digits.length > exp10 + 1)
        sb.append(digits, 0, exp10 + 1).append('.')
          .append(digits, exp10 + 1, digits.length)
      else {
        sb.append(digits)
        var i = digits.length; while (i < exp10 + 1) { sb.append('0'); i += 1 }
        sb.append(".0")
      }
    } else {
      sb.append("0.")
      var i = -1; while (i > exp10) { sb.append('0'); i -= 1 }
      sb.append(digits)
    }
    sb.toString
  }

  /** Column rendered as Python `str()` would render the pandas value. */
  def canonical(c: Column, dt: DataType): Column = dt match {
    case BooleanType => when(c, "True").otherwise("False")
    case DoubleType => {
      import org.apache.spark.sql.graft.bridge
      bridge.column(PyFloatRepr(bridge.expression(c.cast(DoubleType))))
    }
    // float32 columns hash at FLOAT width: pandas keeps the float32 dtype
    // through df.apply(axis=1) whenever the row is mixed-dtype (every
    // reference snapshot frame has a pk/hash column), so str(row[col]) is
    // numpy's float32 shortest-repr, not the float64 widening. (An
    // ALL-float32 frame would upcast rows to float64 — not a frame
    // drop_redundant can see.)
    case FloatType => {
      import org.apache.spark.sql.graft.bridge
      bridge.column(PyFloat32Repr(bridge.expression(c)))
    }
    case _: IntegerType | _: LongType | _: ShortType | _: ByteType =>
      c.cast(StringType)
    case TimestampType | TimestampNTZType =>
      // pandas str(Timestamp utc) = "2024-01-01 00:09:58.778549+00:00",
      // but OMITS the fraction entirely on whole seconds
      concat(
        when(unix_micros(c.cast(TimestampType)) % 1000000L === 0L,
          date_format(c, "yyyy-MM-dd HH:mm:ss"))
          .otherwise(date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")),
        lit("+00:00"))
    case DateType => date_format(c, "yyyy-MM-dd")
    // object-valued cells: Python str(dict)/str(list) — hash snapshots
    // written by the reference on frames with object columns now match
    case _: StructType | _: ArrayType | _: MapType => pyRepr(c)
    case _ => c.cast(StringType)
  }

  /** Python `str(v)` of a complex cell (see [[PyRepr]]). */
  def pyRepr(c: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(PyRepr(bridge.expression(c)))
  }

  /** CPython string repr: `'...'` unless the text contains a single quote
    * and no double quote (then `"..."`); `\\`, the active quote, and
    * newline/tab/CR escaped; every other codepoint failing Python's
    * `str.isprintable` (categories Cc/Cf/Cs/Co/Cn/Zl/Zp and Zs other than
    * space — e.g. soft hyphen U+00AD, zero-width space U+200B, line
    * separator U+2028) escapes as `\xNN` / `\uNNNN` / `\UNNNNNNNN` by
    * codepoint width, exactly like CPython's repr. Printable non-ASCII is
    * kept verbatim (Python 3 semantics). Residual caveat: Java and
    * CPython may disagree on very recently assigned codepoints (Unicode
    * table skew makes Cn classification version-dependent). */
  private def pyUnprintable(cp: Int): Boolean = cp != ' '.toInt && {
    Character.getType(cp) match {
      case Character.CONTROL | Character.FORMAT | Character.SURROGATE |
           Character.PRIVATE_USE | Character.UNASSIGNED |
           Character.LINE_SEPARATOR | Character.PARAGRAPH_SEPARATOR |
           Character.SPACE_SEPARATOR => true
      case _ => false
    }
  }

  private[functions] def appendStrRepr(sb: java.lang.StringBuilder, s: String): Unit = {
    val quote = if (s.indexOf('\'') >= 0 && s.indexOf('"') < 0) '"' else '\''
    sb.append(quote)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp == quote.toInt || cp == '\\'.toInt) sb.append('\\').appendCodePoint(cp)
      else cp match {
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case o if pyUnprintable(o) =>
          if (o < 0x100) sb.append(f"\\x$o%02x")
          else if (o <= 0xffff) sb.append(f"\\u$o%04x")
          else sb.append(f"\\U$o%08x")
        case o => sb.appendCodePoint(o)
      }
      i += Character.charCount(cp)
    }
    sb.append(quote)
  }

  private def timestampRepr(micros: Long): String = {
    val secs = Math.floorDiv(micros, 1000000L)
    val frac = Math.floorMod(micros, 1000000L)
    val ldt = java.time.LocalDateTime.ofEpochSecond(secs, frac.toInt * 1000,
      java.time.ZoneOffset.UTC)
    val base = ldt.format(java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss"))
    if (frac == 0L) base else f"$base.$frac%06d"
  }

  /** Recursive Python repr over Catalyst internal values. Nulls render as
    * `None` (a pandas NaN-typed hole would be `nan`; object cells sourced
    * from JSON/literal_eval hold None, which is the case that matters for
    * reference interop). Timestamps/dates inside object cells render as
    * their single-quoted ISO string — the reference's object cells only
    * ever hold str/num/bool/None/dict/list, so this path is a documented
    * approximation for Spark-typed nested values. */
  private[functions] def appendRepr(sb: java.lang.StringBuilder, v: Any, dt: DataType): Unit = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
    if (v == null) { sb.append("None"); return }
    dt match {
      case StringType  => appendStrRepr(sb, v.toString)
      case BooleanType => sb.append(if (v.asInstanceOf[Boolean]) "True" else "False")
      case DoubleType  => sb.append(floatRepr(v.asInstanceOf[Double]))
      // float32 cells render at FLOAT width via numpy's shortest-repr
      // (str(np.float32(0.1)) == '0.1'), matching reference-written hash
      // snapshots whose object cells hold np.float32 scalars. Remaining
      // documented divergence: a parquet-sourced pandas ARRAY cell is an
      // np.ndarray, whose str() is space-separated ('[0.1 2.5]'); this
      // path renders Python-list style ('[0.1, 2.5]'), which is what the
      // reference's literal_eval/JSON-sourced object cells contain.
      case FloatType   => sb.append(float32Repr(v.asInstanceOf[Float]))
      case ByteType | ShortType | IntegerType | LongType => sb.append(v.toString)
      case _: DecimalType =>
        sb.append(v.asInstanceOf[org.apache.spark.sql.types.Decimal]
          .toJavaBigDecimal.toPlainString)
      case TimestampType | TimestampNTZType =>
        appendStrRepr(sb, timestampRepr(v.asInstanceOf[Long]))
      case DateType =>
        appendStrRepr(sb, java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString)
      case st: StructType =>
        val row = v.asInstanceOf[InternalRow]
        sb.append('{')
        var i = 0
        while (i < st.length) {
          if (i > 0) sb.append(", ")
          appendStrRepr(sb, st(i).name)
          sb.append(": ")
          appendRepr(sb, if (row.isNullAt(i)) null else row.get(i, st(i).dataType),
            st(i).dataType)
          i += 1
        }
        sb.append('}')
      case ArrayType(et, _) =>
        val arr = v.asInstanceOf[ArrayData]
        sb.append('[')
        var i = 0
        while (i < arr.numElements()) {
          if (i > 0) sb.append(", ")
          appendRepr(sb, if (arr.isNullAt(i)) null else arr.get(i, et), et)
          i += 1
        }
        sb.append(']')
      case MapType(kt, vt, _) =>
        val m = v.asInstanceOf[MapData]
        val ks = m.keyArray(); val vs = m.valueArray()
        sb.append('{')
        var i = 0
        while (i < m.numElements()) {
          if (i > 0) sb.append(", ")
          appendRepr(sb, ks.get(i, kt), kt)
          sb.append(": ")
          appendRepr(sb, if (vs.isNullAt(i)) null else vs.get(i, vt), vt)
          i += 1
        }
        sb.append('}')
      case _ => appendStrRepr(sb, v.toString)
    }
  }

  /** MD5 row hash over sorted columns' non-null canonical strings
    * (null/NaN values contribute nothing, matching `v == v and not None`).
    *
    * Float caveat: float32 values render via numpy's scalar `str()` —
    * shortest round-trip digits at 32-bit width (dragon4), positional iff
    * 1e-4 ≤ |v| < 1e16 decided on the VALUE. Verified against numpy
    * 1.26.4; that algorithm has been stable since numpy 1.14, but if a
    * future numpy changes scalar repr, hashes produced here will diverge
    * from a reference run on that numpy — check here first when a
    * cross-system hash mismatch appears. Verified vectors (118 cases):
    * PyLiteralSpec. */
  def rowHash(df: org.apache.spark.sql.DataFrame, cols: Seq[String]): Column = {
    val sorted = cols.sorted
    val parts = sorted.map { name =>
      val dt = df.schema(name).dataType
      val cv = canonical(col(name), dt)
      val nn = dt match {
        case DoubleType | FloatType => col(name).isNotNull && !isnan(col(name))
        case _                      => col(name).isNotNull
      }
      when(nn, cv).otherwise(lit(""))
    }
    md5(concat(parts: _*))
  }
}
