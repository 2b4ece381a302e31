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

  /** Column rendered as Python `str()` would render the pandas value. */
  def canonical(c: Column, dt: DataType): Column = dt match {
    case BooleanType => when(c, "True").otherwise("False")
    case DoubleType | FloatType => {
      import org.apache.spark.sql.graft.bridge
      bridge.column(PyFloatRepr(bridge.expression(c.cast(DoubleType))))
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
    case _        => c.cast(StringType)
  }

  /** MD5 row hash over sorted columns' non-null canonical strings
    * (null/NaN values contribute nothing, matching `v == v and not None`). */
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
