package graft.operators

import graft.functions.PyLiteral.parse_py_literal
import graft.schema.CatalogReader
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Nested-JSON relational operators: explode arrays-of-objects to rows,
  * unnest objects to columns, re-compress rows to nested columns.
  *
  * Spark-native re-expression of gluestick/pandas_utils.py. The reference
  * parses stringified Python/JSON literals per cell with `ast.literal_eval`
  * and flattens dicts row-by-row; here cells normalize to JSON via a native
  * expression, `from_json` does codegen'd parsing, and the key-union across
  * rows (pandas_utils.py:346-372) is a schema-inference pass (sampled at
  * scale) — so the transform itself stays a single distributed projection.
  */
object Explode {

  /** Infer the JSON schema of a (normalized) string column — the key-union
    * semantics of the reference. `samplingRatio < 1.0` bounds the inference
    * pass at 100 TB; the transform still applies to every row.
    *
    * The sample is taken BEFORE the (expensive) normalization expression in
    * `jsonCol` is projected, so a 10% sample evaluates the py-literal parse
    * on 10% of rows — sampling after the projection would pay the full
    * parse cost and only discount the cheap JSON tokenization. */
  def inferJsonSchema(df: DataFrame, jsonCol: Column, samplingRatio: Double = 1.0): DataType = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = if (samplingRatio < 1.0) df.sample(samplingRatio) else df
    val strings = base.select(jsonCol.cast(StringType)).na.drop().as[String]
    spark.read.option("primitivesAsString", "false").json(strings).schema match {
      case s if s.isEmpty => StructType(Nil)
      case s              => s
    }
  }

  private def quoted(name: String): String = s"`${name.replace("`", "``")}`"

  /** Explode a stringified array-of-objects column into one row per element,
    * flattening each object one level into `col.key` columns.
    * Non-array cells are wrapped as single-element arrays; empty/null cells
    * keep the row (explode_outer). Reference: pandas_utils.py:175-295. */
  def explodeJsonToRows(
      df: DataFrame,
      column: String,
      drop: Boolean = true,
      catalog: Option[CatalogReader.StreamCatalog] = None,
      samplingRatio: Double = 1.0,
      maxLevel: Int = 1): DataFrame = {
    val normalized = parse_py_literal(col(column).cast(StringType))
    // wrap non-list values into a one-element list (reference :219-224)
    val wrapped = when(normalized.isNull || normalized === "", lit(null).cast(StringType))
      .otherwise(
        when(ltrim(normalized).startsWith("["), normalized)
          .otherwise(concat(lit("["), normalized, lit("]"))))
    val tmp = df.withColumn("__gs_json", wrapped)
    val elemType = inferJsonSchema(tmp, col("__gs_json"), samplingRatio) match {
      case ArrayType(et: StructType, _) => et
      case st: StructType               => st
      case _                            => StructType(Seq(StructField("value", StringType)))
    }
    val parsed = tmp.withColumn("__gs_arr", from_json(col("__gs_json"), ArrayType(elemType)))
      .withColumn("__gs_elem", explode_outer(col("__gs_arr")))
    val keep = df.columns.filterNot(c => drop && c == column)
      .map(c => col(quoted(c)))
    val flat = elemType.fields.map(f =>
      col(s"__gs_elem.${quoted(f.name)}").as(s"$column.${f.name}"))
    val out0 = parsed.select((keep ++ flat).toIndexedSeq: _*)
    // deeper flattening: nested structs unfold one dotted level per pass
    // (reference nested_to_record max_level, pandas_utils.py:253-260)
    val out = (1 until maxLevel).foldLeft(out0)((d, _) => flattenStructsOneLevel(d))
    catalog.map(cat => enforceExplodedColTypes(out, column, cat)).getOrElse(out)
  }

  /** Unfold every struct-typed column into `parent.child` columns (one
    * level); non-struct columns pass through. */
  def flattenStructsOneLevel(df: DataFrame): DataFrame = {
    if (!df.schema.fields.exists(_.dataType.isInstanceOf[StructType])) return df
    val cols: Seq[Column] = df.schema.fields.toSeq.flatMap {
      case StructField(name, st: StructType, _, _) =>
        st.fields.toSeq.map(f => col(s"${quoted(name)}.${quoted(f.name)}").as(s"$name.${f.name}"))
      case f => Seq(col(quoted(f.name)))
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Unnest a stringified-object column into `col.key` columns; key set is
    * the union across rows plus `expectedKeys` (missing → null). Fallback
    * keys when nothing is inferable: value, name (pandas_utils.py:341-344). */
  def explodeJsonToCols(
      df: DataFrame,
      column: String,
      drop: Boolean = true,
      expectedKeys: Seq[String] = Nil,
      samplingRatio: Double = 1.0): DataFrame = {
    val normalized = parse_py_literal(col(column).cast(StringType))
    val tmp = df.withColumn("__gs_json", normalized)
    val inferred = inferJsonSchema(tmp, col("__gs_json"), samplingRatio) match {
      case st: StructType => st
      case _              => StructType(Nil)
    }
    val baseKeys =
      if (inferred.isEmpty && expectedKeys.isEmpty) Seq("value", "name")
      else inferred.fieldNames.toSeq
    val allKeys = (baseKeys ++ expectedKeys.filterNot(baseKeys.contains)).distinct
    val schema = StructType(allKeys.map { k =>
      inferred.fields.find(_.name == k).getOrElse(StructField(k, StringType))
    })
    val parsed = tmp.withColumn("__gs_obj", from_json(col("__gs_json"), schema))
    val keep = df.columns.filterNot(c => drop && c == column).map(c => col(quoted(c)))
    val flat = allKeys.map(k => col(s"__gs_obj.${quoted(k)}").as(s"$column.$k"))
    parsed.select((keep ++ flat).toIndexedSeq: _*)
  }

  /** Dict-or-first-of-list column → two columns (key prop, value prop),
    * dropping the original. Reference: pandas_utils.py:12-71.
    *
    * `keyProp`/`valueProp` are LITERAL top-level field names (json_tuple
    * matches the exact key string), mirroring the reference's dict access
    * `x[prop]` — a prop containing a dot selects the field literally named
    * `"a.b"`, never a nested path. */
  def jsonTupleToCols(
      df: DataFrame,
      column: String,
      keyProp: String = "Name",
      valueProp: String = "Value",
      outKey: Option[String] = None,
      outValue: Option[String] = None,
      samplingRatio: Double = 1.0): DataFrame = {
    val normalized = parse_py_literal(col(column).cast(StringType))
    // take the first element when the cell is a list (reference x[0],
    // pandas_utils.py:30-40) — a JSONPath index, so multi-element lists
    // yield element 0 rather than the concatenation of all elements
    val first = when(ltrim(normalized).startsWith("["),
      get_json_object(normalized, "$[0]"))
      .otherwise(normalized)
    val obj = when(ltrim(first).startsWith("{"),
      first).otherwise(lit(null).cast(StringType))
    val keyOut = outKey.getOrElse(s"$column.$keyProp")
    val valOut = outValue.getOrElse(s"$column.$valueProp")
    // json_tuple extracts both fields from ONE parse (two get_json_object
    // calls would each re-parse the object); values match get_json_object
    // exactly — text for scalars, JSON text for nested, null for missing.
    // The generator lands in temp columns and is folded back with
    // withColumn REPLACEMENT semantics: an output name colliding with an
    // existing column overwrites it in place (position preserved) instead
    // of producing an ambiguous duplicate.
    df.select(col("*"),
        json_tuple(obj, keyProp, valueProp).as(Seq("__gs_jt_k", "__gs_jt_v")))
      .withColumn(keyOut, col("__gs_jt_k"))
      .withColumn(valOut, col("__gs_jt_v"))
      .drop("__gs_jt_k", "__gs_jt_v")
      .drop(column)
  }

  /** `[{Name: k, Value: v}, …]` array column → map column
    * (reference array_to_dict_reducer, pandas_utils.py:381-412) —
    * pure higher-order functions, no UDF. */
  def arrayToDict(arr: Column, keyProp: String = "Name", valueProp: String = "Value"): Column =
    map_from_entries(transform(arr, x =>
      struct(x.getField(keyProp).as("key"), x.getField(valueProp).as("value"))))

  /** Inverse explode: gather `prefix.*` columns back into a per-row struct,
    * group by pk collecting a list, keeping the first value of every other
    * column. Reference compress_rows_to_col (pandas_utils.py:415-445) does
    * group + re-join; a single groupBy pass avoids the second shuffle.
    * `sorted=true` orders each list by the struct's fields (put the
    * ordering key first among the prefixed columns) — collect_list order
    * is otherwise nondeterministic under parallelism. */
  def compressRowsToCol(
      df: DataFrame,
      columnPrefix: String,
      pk: Seq[String],
      sorted: Boolean = true,
      pythonStr: Boolean = false): DataFrame = {
    val prefixed = df.columns.filter(_.startsWith(columnPrefix + "."))
    require(prefixed.nonEmpty, s"no columns with prefix '$columnPrefix.'")
    val entryStruct = struct(prefixed.toIndexedSeq.map(c =>
      col(quoted(c)).as(c.stripPrefix(columnPrefix + "."))): _*)
    // pythonStr: each entry becomes `str(row.to_dict())` like the reference
    // (pandas_utils.py:441) — the compressed column is then a list of
    // single-quoted Python dict strings, not structs. The sort happens on
    // the STRUCTS before rendering, so list order follows the struct's
    // field ordering regardless of rendered-string width (lexicographic
    // string order would put id 10 before 9); the rendering is a per-
    // element transform over the already-collected list. When the entry
    // struct is NOT orderable (e.g. a map-typed prefixed column), the
    // sort falls back to the rendered strings — analyzable for any type,
    // at the cost of string-lexicographic ordering.
    val structOrderable =
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(
        df.select(entryStruct).schema.head.dataType)
    val others = df.columns.filterNot(c => prefixed.contains(c) || pk.contains(c))
    val rawList = collect_list(col("__gs_entry"))
    val listAgg = (if (pythonStr && structOrderable && sorted)
        transform(sort_array(rawList), x => graft.functions.PyStr.pyRepr(x))
      else if (pythonStr) {
        val rendered = transform(rawList, x => graft.functions.PyStr.pyRepr(x))
        if (sorted) sort_array(rendered) else rendered
      }
      else if (sorted) sort_array(rawList)
      else rawList).as(columnPrefix)
    val aggs = listAgg +: others.toIndexedSeq.map(c => first(col(quoted(c)), ignoreNulls = false).as(c))
    df.withColumn("__gs_entry", entryStruct)
      .groupBy(pk.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select((pk ++ others :+ columnPrefix).map(c => col(quoted(c))).toIndexedSeq: _*)
  }

  /** Post-explode typing from the catalog: boolean/integer properties cast;
    * columns that are entirely true/false strings become boolean.
    * Reference: pandas_utils.py:115-172. */
  def enforceExplodedColTypes(
      df: DataFrame,
      columnPrefix: String,
      catalog: CatalogReader.StreamCatalog): DataFrame = {
    val want: Map[String, DataType] = catalog.schema.fields.collect {
      case StructField(name, ArrayType(st: StructType, _), _, _) if name == columnPrefix =>
        st.fields.map(f => s"$columnPrefix.${f.name}" -> f.dataType).toMap
      case StructField(name, st: StructType, _, _) if name == columnPrefix =>
        st.fields.map(f => s"$columnPrefix.${f.name}" -> f.dataType).toMap
    }.fold(Map.empty)(_ ++ _)
    val casts = df.columns.map { c =>
      want.get(c) match {
        case Some(dt) if dt != df.schema(c).dataType =>
          col(quoted(c)).try_cast(dt).as(c)
        case _ => col(quoted(c))
      }
    }
    df.select(casts.toIndexedSeq: _*)
  }

  /** `element_at` with out-of-range → null (reference get_index_safely,
    * etl_utils.py:430-448; Python 0-based → Spark 1-based). */
  def getIndexSafely(arr: Column, i: Int): Column = try_element_at(arr, lit(i + 1))

  /** Parse every string column the catalog types as object/array into real
    * nested values (reference parse_df_cols, singer.py:383-401: applies
    * parse_objs to columns typed object/array in the schema). */
  def parseDfCols(df: DataFrame, catalog: CatalogReader.StreamCatalog): DataFrame = {
    val targets = catalog.schema.fields.collect {
      case StructField(n, dt @ (_: StructType | _: ArrayType | _: MapType), _, _)
          if df.columns.contains(n) && df.schema(n).dataType == StringType => (n, dt)
    }
    targets.foldLeft(df) { case (d, (n, dt)) =>
      d.withColumn(n, from_json(parse_py_literal(col(s"`$n`")), dt))
    }
  }
}
