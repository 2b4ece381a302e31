package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Datetime canonicalization (reference gluestick/date_utils.py).
  *
  * The reference localizes everything to UTC and serializes as
  * `%Y-%m-%dT%H:%M:%S.%fZ`. Spark timestamps are instants and the session
  * timezone is UTC, so "localize" is a parse/cast; unparseable values
  * coerce to null (pandas `errors="coerce"`).
  */
object DateUtils {

  val IsoMicrosZ = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"

  /** DataFrame-mode localize_datetime (date_utils.py:82-90): parse the
    * column to a UTC timestamp; bad values → null. */
  def localizeDatetime(df: DataFrame, colName: String): DataFrame =
    df.withColumn(colName, toUtcTimestamp(col(colName), df.schema(colName).dataType))

  def toUtcTimestamp(c: Column, dt: DataType): Column = dt match {
    case TimestampType | TimestampNTZType => c.cast(TimestampType)
    case DateType                         => c.cast(TimestampType) // midnight UTC
    case _: NumericType                   => timestamp_seconds(c)
    case _                                => try_to_timestamp(c)
  }

  /** Scalar-mode promotion (date_utils.py:91-115): strict — a null result
    * from a non-null input raises, mirroring CustomValidationError. */
  def localizeDatetimeStrict(df: DataFrame, colName: String): DataFrame = {
    val parsed = toUtcTimestamp(col(colName), df.schema(colName).dataType)
    df.withColumn(colName,
      when(col(colName).isNotNull && parsed.isNull,
        raise_error(concat(lit(s"Invalid datetime in '$colName': "), col(colName).cast(StringType))))
        .otherwise(parsed))
  }

  /** Serialize to the Singer wire format (singer.py:17). */
  def isoMicrosZ(c: Column): Column = date_format(c, IsoMicrosZ)

  /** Dates as `%Y-%m-%d` (singer.py:303). */
  def isoDate(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** Names of timestamp-typed fields in a schema (date_utils.py:9-36's
    * model reflection, for StructTypes). */
  def datetimeFields(schema: StructType): Seq[String] =
    schema.fields.collect {
      case StructField(n, TimestampType | TimestampNTZType | DateType, _, _) => n
    }.toSeq
}
