package graft.singer

import graft.schema.SingerSchema
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Singer-spec sink: SCHEMA / RECORD / STATE messages as NDJSON.
  *
  * Reference: gluestick/singer.py (whole file). Message shapes:
  *   {"type":"SCHEMA","stream":s,"schema":{…},"key_properties":[…]}
  *   {"type":"RECORD","stream":s,"record":{…}}
  *   {"type":"STATE","value":{}}
  *
  * Record serialization is fully distributed and codegen'd: `to_json` over
  * a struct of all columns with `ignoreNullFields` (null scalars dropped,
  * singer.py:534-540), timestamps as `%Y-%m-%dT%H:%M:%S.%fZ` and dates as
  * `%Y-%m-%d` (singer.py:17,137,301) — including *nested* datetimes, which
  * the reference deep-converts per record (singer.py:280-304) and Spark's
  * JSON writer formats via the same options at any nesting depth.
  *
  * Two write modes:
  *  - `write(path)`: the reference's file contract — ONE ordered file,
  *    schema header, record body, state footer, append mode. Streams
  *    partitions through the driver via `toLocalIterator` (bounded memory,
  *    never `collect`).
  *  - `writeDistributed(dir)`: the 100 TB path — per-partition NDJSON part
  *    files of RECORD lines plus `_schema.singer` / `_state.singer`
  *    sidecars; no driver bottleneck.
  */
object SingerWriter {

  /** Null-field serialization modes, mirroring the reference's three
    * reachable behaviors in `to_singer` (singer.py:520-537):
    *  - [[NullMode.DropAll]] — `trim_nested_nulls=True`: nulls removed at
    *    every depth (`remove_nulls_deep`); Spark `ignoreNullFields=true`.
    *    Graft's legacy boolean default maps here.
    *  - [[NullMode.KeepAll]] — `keep_null_fields=True`: nulls serialized
    *    explicitly at every depth.
    *  - [[NullMode.DropTopLevel]] — the reference DEFAULT
    *    (`{k: v for k, v in rec.items() if not _is_null_scalar(v)}`,
    *    singer.py:536-537): top-level null cells vanish from the record,
    *    nulls INSIDE object/array cells stay. Spark's `ignoreNullFields`
    *    is all-or-nothing, so this mode builds the record from per-field
    *    `"key":<json>` fragments gated on `isNotNull` and joined with
    *    `concat_ws` (which skips null fragments) — still pure codegen'd
    *    expressions, no UDF. */
  sealed abstract class NullMode
  object NullMode {
    case object DropAll extends NullMode
    case object KeepAll extends NullMode
    case object DropTopLevel extends NullMode
  }

  private def resolveNullMode(keepNullFields: Boolean, nullMode: Option[NullMode]): NullMode =
    nullMode.getOrElse(if (keepNullFields) NullMode.KeepAll else NullMode.DropAll)

  private val TsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"
  private val DateFormat = "yyyy-MM-dd"

  private def jsonOptions(keepNullFields: Boolean = false): Map[String, String] = Map(
    "timestampFormat" -> TsFormat,
    "timestampNTZFormat" -> TsFormat,
    "dateFormat" -> DateFormat,
    "timeZone" -> "UTC",
    // keep_nulls mode serializes null scalars explicitly (singer.py:536-540)
    "ignoreNullFields" -> (!keepNullFields).toString)

  private def esc(s: String): String = {
    val b = new StringBuilder
    s.foreach {
      case '"'  => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c    => b.append(c)
    }
    b.toString
  }

  /** Non-`allow_objects` serialization (the reference DEFAULT,
    * `_serialize_value` singer.py:72-78): array/struct/map columns are
    * JSON-stringified into STRING record fields (and therefore typed
    * `string` in the emitted SCHEMA). Primitive columns keep their types —
    * the reference only applies `_serialize_value` to object-dtype columns
    * (gen_singer_header's else branch, singer.py:176-178). Spacing differs
    * from json.dumps (`{"a":1}` vs `{"a": 1}`); values are identical.
    *
    * `keepNullFields` controls nulls INSIDE the stringified cells — a
    * keep-nulls export must not silently drop nested keys here (the
    * round-2 hardcoded drop-nulls bug). */
  def stringifyComplexColumns(df: DataFrame, keepNullFields: Boolean = false): DataFrame = {
    val cols = df.schema.fields.toIndexedSeq.map { f =>
      f.dataType match {
        case _: StructType | _: ArrayType | _: MapType =>
          to_json(col(s"`${f.name}`"), jsonOptions(keepNullFields)).as(f.name)
        case _ => col(s"`${f.name}`")
      }
    }
    df.select(cols: _*)
  }

  /** Drop columns that are entirely null — the reference's `allow_objects`
    * export mode (singer.py:498-499). One cheap aggregate pass (count per
    * column), then a projection. */
  def dropAllNullColumns(df: DataFrame): DataFrame = {
    val counts = df.select(df.columns.toIndexedSeq.map(c =>
      count(col(s"`$c`")).as(c)): _*).first()
    val keep = df.columns.zipWithIndex.collect {
      case (c, i) if counts.getLong(i) > 0 => c
    }
    df.select(keep.toIndexedSeq.map(c => col(s"`$c`")): _*)
  }

  def schemaMessage(
      stream: String,
      schema: StructType,
      keyProperties: Seq[String],
      bookmarkProperties: Seq[String] = Nil,
      recursiveTyping: Boolean = true): String = {
    val schemaJson = SingerSchema.fromStructTypeJson(schema, recursiveTyping)
    val kp = keyProperties.map(k => s""""${esc(k)}"""").mkString("[", ", ", "]")
    val bp =
      if (bookmarkProperties.isEmpty) ""
      else s""", "bookmark_properties": ${bookmarkProperties.map(k => s""""${esc(k)}"""").mkString("[", ", ", "]")}"""
    s"""{"type": "SCHEMA", "stream": "${esc(stream)}", "schema": $schemaJson, "key_properties": $kp$bp}"""
  }

  def stateMessage(value: String = "{}"): String =
    s"""{"type": "STATE", "value": $value}"""

  /** A Column holding the full RECORD line for each row. Float columns
    * promote to double first — the reference's pandas path serializes
    * float32 values at float64 precision (golden data.singer). Optional
    * `version` / `time_extracted` envelope fields per the Singer spec
    * (reference write_record, singer.py:49-62; time_extracted must be
    * UTC `%Y-%m-%dT%H:%M:%S.%fZ`). */
  def recordLine(
      df: DataFrame,
      stream: String,
      version: Option[Long] = None,
      timeExtracted: Option[java.time.Instant] = None,
      keepNullFields: Boolean = false,
      nullMode: Option[NullMode] = None): Column = {
    // NaN (like NaT/NA) is a null scalar to the reference (_is_null_scalar,
    // singer.py:90-91): keep_nulls REPLACES it with None, the drop modes
    // drop the key. Nullifying NaN here once makes every mode below agree —
    // otherwise Spark's to_json would render the non-standard literal NaN.
    val promoted = df.schema.fields.toIndexedSeq.map { f =>
      val c0 = col(s"`${f.name}`")
      val c = f.dataType match {
        case FloatType  => when(!isnan(c0), c0.cast(DoubleType))
        case DoubleType => when(!isnan(c0), c0)
        case _          => c0
      }
      f.name -> c
    }
    val payload = resolveNullMode(keepNullFields, nullMode) match {
      case NullMode.DropTopLevel =>
        // reference-default semantics: per-field "key":<json> fragments.
        // Each value renders via to_json over a one-field struct with
        // keep-nulls options (so NESTED nulls survive); the `{"x":` prefix
        // (5 chars) and trailing `}` are sliced off. A null top-level cell
        // nulls its fragment, and concat_ws skips it entirely.
        val frags = promoted.map { case (name, c) =>
          val j = to_json(struct(c.as("x")), jsonOptions(keepNullFields = true))
          when(c.isNotNull,
            concat(lit("\"" + esc(name) + "\":"), j.substr(lit(6), length(j) - 6)))
        }
        concat(lit("{"), concat_ws(",", frags: _*), lit("}"))
      case mode =>
        to_json(
          struct(promoted.map { case (name, c) => c.as(name) }: _*),
          jsonOptions(mode == NullMode.KeepAll))
    }
    val versionPart = version.map(v => s""", "version": $v""").getOrElse("")
    val tePart = timeExtracted.map { t =>
      val s = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
        .withZone(java.time.ZoneOffset.UTC).format(t)
      s""", "time_extracted": "$s""""
    }.getOrElse("")
    concat(
      lit(s"""{"type": "RECORD", "stream": "${esc(stream)}"$versionPart$tePart, "record": """),
      payload,
      lit("}"))
  }

  /** Merge catalog properties over the inferred header, keeping extra df
    * columns the catalog doesn't know (reference USE_CATALOG_SCHEMA merge,
    * singer.py:181-185: `header_map["properties"].update(schema[...])`). */
  private[graft] def mergeSchemas(inferred: StructType, catalog: StructType): StructType = {
    val catByName = catalog.fields.map(f => f.name -> f).toMap
    val overridden = inferred.fields.map(f => catByName.getOrElse(f.name, f))
    val extras = catalog.fields.filterNot(f => inferred.fieldNames.contains(f.name))
    StructType((overridden ++ extras).toIndexedSeq)
  }

  /** Single-file Singer export (reference contract: singer.py:452-549).
    * Appends if the file already exists (singer.py:518); the SCHEMA message
    * is emitted on EVERY call including append mode, like the reference's
    * per-call write_schema — appended batches with evolved columns are
    * always described by a preceding SCHEMA.
    *
    * `allowObjects=false` (the reference's parameter default; graft's
    * default here stays `true` for backward compatibility — the
    * `Exporter.toSinger` router applies the reference default) serializes
    * complex columns as JSON strings via [[stringifyComplexColumns]].
    * `mergeSchemaWith` overlays catalog property types on the inferred
    * header while keeping extra columns (USE_CATALOG_SCHEMA mode); when
    * `schemaOverride` is also given, the merge bases on the override, not
    * the inferred schema. `nullMode` (see [[NullMode]]) supersedes the
    * legacy `keepNullFields` boolean when set. */
  def write(
      df: DataFrame,
      stream: String,
      path: String,
      keyProperties: Seq[String] = Nil,
      bookmarkProperties: Seq[String] = Nil,
      schemaOverride: Option[StructType] = None,
      emitState: Boolean = true,
      allowObjects: Boolean = true,
      keepNullFields: Boolean = false,
      mergeSchemaWith: Option[StructType] = None,
      recursiveTyping: Boolean = true,
      nullMode: Option[NullMode] = None): Unit = {
    import java.nio.charset.StandardCharsets.UTF_8
    import java.nio.file.{Files, Paths, StandardOpenOption => O}
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    val appending = Files.exists(p)
    val out = Files.newBufferedWriter(p, UTF_8,
      (if (appending) Seq(O.APPEND, O.WRITE) else Seq(O.CREATE, O.TRUNCATE_EXISTING, O.WRITE)): _*)
    try {
      val mode = resolveNullMode(keepNullFields, nullMode)
      val prepared =
        if (allowObjects) df
        else stringifyComplexColumns(df, mode != NullMode.DropAll)
      val base = schemaOverride.getOrElse(prepared.schema)
      val headerSchema = mergeSchemaWith match {
        case Some(cat) => mergeSchemas(base, cat)
        case None      => base
      }
      out.write(schemaMessage(stream, headerSchema, keyProperties, bookmarkProperties,
        recursiveTyping))
      out.write("\n")
      val lines = prepared.select(
        recordLine(prepared, stream, nullMode = Some(mode)).as("line"))
      // toLocalIterator: one partition in driver memory at a time
      val it = lines.toLocalIterator()
      while (it.hasNext) { out.write(it.next().getString(0)); out.write("\n") }
      if (emitState) { out.write(stateMessage()); out.write("\n") }
    } finally out.close()
  }

  /** Distributed Singer export for scale: RECORD part files written by
    * executors, SCHEMA/STATE as driver sidecars. Supports the same
    * serialization options as [[write]], so `Exporter.export` produces
    * consistent output regardless of `singleFile`. */
  def writeDistributed(
      df: DataFrame,
      stream: String,
      dir: String,
      keyProperties: Seq[String] = Nil,
      schemaOverride: Option[StructType] = None,
      allowObjects: Boolean = true,
      keepNullFields: Boolean = false,
      mergeSchemaWith: Option[StructType] = None,
      recursiveTyping: Boolean = true,
      nullMode: Option[NullMode] = None): Unit = {
    import org.apache.hadoop.fs.Path
    val mode = resolveNullMode(keepNullFields, nullMode)
    val prepared =
      if (allowObjects) df
      else stringifyComplexColumns(df, mode != NullMode.DropAll)
    val schemaBase = schemaOverride.getOrElse(prepared.schema)
    val headerSchema = mergeSchemaWith match {
      case Some(cat) => mergeSchemas(schemaBase, cat)
      case None      => schemaBase
    }
    prepared.select(recordLine(prepared, stream, nullMode = Some(mode)).as("value"))
      .write.mode("overwrite").text(s"$dir/records")
    // sidecars through the same Hadoop filesystem as the record parts —
    // java.nio would silently write to a local path for hdfs://, s3a://, …
    val base = new Path(dir)
    val fs = base.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    fs.mkdirs(base)
    def put(name: String, content: String): Unit = {
      val out = fs.create(new Path(base, name), true)
      try out.write((content + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    put("_schema.singer",
      schemaMessage(stream, headerSchema, keyProperties, recursiveTyping = recursiveTyping))
    put("_state.singer", stateMessage())
  }
}
