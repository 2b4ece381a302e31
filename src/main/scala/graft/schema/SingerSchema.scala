package graft.schema

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Singer/JSON-Schema ⇄ Spark StructType bridge.
  *
  * Reimplements, Spark-natively, the catalog-typing semantics of the
  * reference (gluestick/reader.py:232-279 and gluestick/singer.py:333-380):
  * each property is a type union with "null" (nullable-by-default);
  * `anyOf` collapses to the variant carrying a `format`, else to the union
  * of member types; a multi-type union degrades to string.
  */
object SingerSchema {
  private val mapper = new ObjectMapper()

  def parse(json: String): JsonNode = mapper.readTree(json)

  /** Choose the winning `anyOf` variant: prefer the variant with a `format`
    * key (reference singer.py:366-380); else a single non-null variant;
    * else merge the member `type`s. Variants are inspected through a ONE-HOP
    * deref (cycle-safe), but the ORIGINAL variant node is returned so the
    * caller's recursion keeps `$ref` cycle tracking intact — e.g.
    * `anyOf:[{$ref:…},{type:null}]`, the pydantic Optional[Model] shape. */
  private def chooseAnyOfVariant(node: JsonNode, root: JsonNode): JsonNode = {
    val originals = node.get("anyOf").elements().asScala.toSeq
    val resolved = originals.map(v => deref(v, root))
    resolved.indexWhere(_.has("format")) match {
      case i if i >= 0 => originals(i)
      case _ =>
        // a single non-null variant keeps its full shape (properties/items)
        val nonNull = originals.zip(resolved).filterNot { case (_, r) => typeNames(r) == Seq("null") }
        if (nonNull.size == 1) nonNull.head._1
        else {
          val types = nonNull.flatMap(p => typeNames(p._2)).filterNot(_ == "null").distinct
          val o = mapper.createObjectNode()
          if (types.size == 1) o.put("type", types.head)
          else o.put("type", "string") // multi-type union → string (reader.py:268)
          o
        }
    }
  }

  private def typeNames(node: JsonNode): Seq[String] = {
    val t = node.get("type")
    if (t == null) Seq.empty
    else if (t.isArray) t.elements().asScala.map(_.asText()).toSeq
    else Seq(t.asText())
  }

  /** Resolve `{"$ref": "#/$defs/X"}` (or `#/definitions/X`) against the
    * schema root — the reference resolves pydantic model_json_schema refs
    * the same way (singer.py:222-240). Unresolvable refs degrade to the
    * node itself (→ string). */
  private def deref(node: JsonNode, root: JsonNode): JsonNode =
    Option(node.get("$ref")).map(_.asText()) match {
      case Some(ref) if ref.startsWith("#/") =>
        val target = ref.stripPrefix("#/").split("/")
          .foldLeft(root)((n, seg) => if (n == null) null else n.get(seg))
        if (target != null) target else node
      case _ => node
    }

  /** One JSON-Schema property node → Spark DataType. `root` anchors
    * `$ref` resolution (defaults to the node itself for flat schemas). */
  def propertyToDataType(node0: JsonNode): DataType = propertyToDataType(node0, node0, Set.empty)

  def propertyToDataType(nodeIn: JsonNode, root: JsonNode): DataType =
    propertyToDataType(nodeIn, root, Set.empty)

  /** `seen` tracks `$ref` paths already being resolved on this branch:
    * pydantic emits self-referential `$defs` for recursive models
    * (model_json_schema), which would otherwise recurse unboundedly — a
    * repeated ref degrades to StringType, like an unresolvable one. */
  private def propertyToDataType(nodeIn: JsonNode, root: JsonNode, seen: Set[String]): DataType =
    Option(nodeIn.get("$ref")).map(_.asText()) match {
      case Some(ref) if seen.contains(ref) => StringType // $ref cycle
      case Some(ref) =>
        val target = deref(nodeIn, root)
        if (target eq nodeIn) StringType // unresolvable ref
        else propertyToDataType(target, root, seen + ref)
      case None if nodeIn.has("anyOf") =>
        propertyToDataType(chooseAnyOfVariant(nodeIn, root), root, seen)
      case None =>
        val node = nodeIn
        val types = typeNames(node).filterNot(_ == "null")
        val fmt = Option(node.get("format")).map(_.asText())
        types match {
          case Seq("string") =>
            fmt match {
              case Some("date-time") => TimestampType
              case Some("date")      => DateType
              case _                 => StringType // incl. "time": no TimeType → string
            }
          case Seq("integer") => LongType
          case Seq("number")  => DoubleType
          case Seq("boolean") => BooleanType
          case Seq("object") =>
            val props = node.get("properties")
            if (props == null || !props.fieldNames().hasNext)
              MapType(StringType, StringType) // open object
            else toStructType(node, root, seen)
          case Seq("array") =>
            val items = node.get("items")
            if (items == null) ArrayType(StringType)
            else ArrayType(propertyToDataType(items, root, seen))
          case _ => StringType // multi-type / unknown → string
        }
    }

  /** JSON-Schema `{"type":"object","properties":{…}}` → StructType.
    * All fields nullable (Singer unions every type with "null"). */
  def toStructType(schema: JsonNode): StructType = toStructType(schema, schema, Set.empty)

  def toStructType(schema: JsonNode, root: JsonNode): StructType =
    toStructType(schema, root, Set.empty)

  private def toStructType(schema: JsonNode, root: JsonNode, seen: Set[String]): StructType = {
    val seenPlus = seen ++ Option(schema.get("$ref")).map(_.asText())
    val resolved = deref(schema, root)
    val props = resolved.get("properties")
    if (props == null) return StructType(Nil)
    val fields = props.properties().asScala.toSeq.map { e =>
      StructField(e.getKey, propertyToDataType(e.getValue, root, seenPlus), nullable = true)
    }
    StructType(fields)
  }

  def toStructType(json: String): StructType = toStructType(parse(json))

  /** Spark DataType → Singer JSON-Schema node (nullable union).
    * Mirrors reference type emission (singer.py:117-177, 589-596). */
  def dataTypeToProperty(dt: DataType): ObjectNode = {
    val o = mapper.createObjectNode()
    def typed(t: String): ObjectNode = {
      val arr = o.putArray("type"); arr.add(t); arr.add("null"); o
    }
    dt match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType =>
        typed("integer")
      case _: FloatType | _: DoubleType | _: DecimalType => typed("number")
      case _: BooleanType                                => typed("boolean")
      case _: TimestampType | _: TimestampNTZType =>
        typed("string"); o.put("format", "date-time"); o
      case _: DateType =>
        typed("string"); o.put("format", "date"); o
      case ArrayType(et, _) =>
        typed("array"); o.set[ObjectNode]("items", dataTypeToProperty(et)); o
      case st: StructType =>
        typed("object")
        val props = mapper.createObjectNode()
        st.fields.foreach(f => props.set[ObjectNode](f.name, dataTypeToProperty(f.dataType)))
        o.set[ObjectNode]("properties", props); o
      case MapType(_, _, _) => typed("object")
      case _: BinaryType    => typed("string")
      case _                => typed("string")
    }
  }

  /** Full Singer SCHEMA payload for a DataFrame schema (root is a
    * nullable union, matching the reference's emitted header). */
  def fromStructType(st: StructType): ObjectNode = {
    val o = mapper.createObjectNode()
    val rootType = o.putArray("type"); rootType.add("object"); rootType.add("null")
    val props = mapper.createObjectNode()
    st.fields.foreach(f => props.set[ObjectNode](f.name, dataTypeToProperty(f.dataType)))
    o.set[ObjectNode]("properties", props)
    o
  }

  def fromStructTypeJson(st: StructType): String =
    mapper.writeValueAsString(fromStructType(st))

  /** The reference's non-recursive "fuzzy" array typing
    * (gen_singer_header type_mapping["array"], singer.py:131):
    * `{"type": ["array","null"], "items": {"type": ["object","string","null"]}}`. */
  def fuzzyArrayProperty: ObjectNode = {
    val o = mapper.createObjectNode()
    val t = o.putArray("type"); t.add("array"); t.add("null")
    val items = mapper.createObjectNode()
    val it = items.putArray("type"); it.add("object"); it.add("string"); it.add("null")
    o.set[ObjectNode]("items", items)
    o
  }

  /** `recursiveTyping=false` (reference to_singer param) degrades every
    * top-level array property to the fuzzy form instead of recursing into
    * element types. */
  def fromStructTypeJson(st: StructType, recursiveTyping: Boolean): String = {
    val node = fromStructType(st)
    if (!recursiveTyping) {
      val props = node.get("properties").asInstanceOf[ObjectNode]
      st.fields.filter(_.dataType.isInstanceOf[ArrayType])
        .foreach(f => props.set[ObjectNode](f.name, fuzzyArrayProperty))
    }
    mapper.writeValueAsString(node)
  }

  /** Singer schema from a case class — the Spark-native analogue of the
    * reference's Pydantic "unified model" path (singer.py:222-277):
    * the model's typed fields drive the emitted SCHEMA. */
  def fromCaseClass[T <: Product: scala.reflect.runtime.universe.TypeTag]: ObjectNode =
    fromStructType(org.apache.spark.sql.catalyst.ScalaReflection
      .schemaFor[T].dataType.asInstanceOf[StructType])

  /** Parse a `key_properties` value from parquet key-value metadata.
    * Accepts JSON `["id"]` and Python-literal `['id']` forms — the
    * reference uses eval() (reader.py:136); we parse, never eval. */
  def parseKeyProperties(raw: String): Seq[String] = {
    val trimmed = raw.trim
    val jsonish = trimmed.replace('\'', '"')
    try {
      val node = mapper.readTree(jsonish)
      if (node.isArray) node.elements().asScala.map(_.asText()).toSeq
      else Seq(node.asText())
    } catch {
      case _: Exception =>
        trimmed.stripPrefix("[").stripSuffix("]").split(",").toSeq
          .map(_.trim.stripPrefix("'").stripSuffix("'")
            .stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
    }
  }
}

/** Singer `catalog.json` loader: `{streams:[{stream, tap_stream_id, schema,
  * metadata}]}` → per-stream StructType + key properties.
  * Reference: gluestick/reader.py:192-279. */
object CatalogReader {
  import SingerSchema._

  final case class StreamCatalog(
      name: String,
      schema: StructType,
      keyProperties: Seq[String],
      /** names of properties declared `format: date-time` (re-coerced with
        * null-on-error semantics on CSV read — reader.py:110-114) */
      dateFields: Seq[String])

  def load(path: String): Map[String, StreamCatalog] =
    fromJson(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))

  def fromJson(json: String): Map[String, StreamCatalog] = {
    val root = parse(json)
    val streams = Option(root.get("streams")).map(_.elements().asScala.toSeq).getOrElse(Nil)
    streams.flatMap { s =>
      val name = Seq("stream", "tap_stream_id").view
        .flatMap(k => Option(s.get(k)).map(_.asText())).headOption
      name.map { n =>
        val schemaNode = s.get("schema")
        val st = if (schemaNode == null) StructType(Nil) else toStructType(schemaNode)
        val dateFields = Option(schemaNode).map(_.get("properties")).filter(_ != null)
          .map(_.properties().asScala.toSeq.collect {
            case e if isDateTime(e.getValue) => e.getKey
          }).getOrElse(Nil)
        val pk = Option(s.get("metadata")).toSeq
          .flatMap(_.elements().asScala)
          .filter { m =>
            val bc = m.get("breadcrumb")
            bc == null || !bc.elements().hasNext
          }
          .flatMap(m => Option(m.get("metadata")))
          .flatMap(m => Option(m.get("table-key-properties")))
          .flatMap(_.elements().asScala.map(_.asText()))
        n -> StreamCatalog(n, st, pk, dateFields)
      }
    }.toMap
  }

  private def isDateTime(node: JsonNode): Boolean = {
    def fmt(n: JsonNode) = Option(n.get("format")).exists(_.asText() == "date-time")
    fmt(node) || Option(node.get("anyOf")).exists(_.elements().asScala.exists(fmt))
  }
}
