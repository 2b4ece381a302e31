package graft

import graft.schema.{CatalogReader, SingerSchema}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SingerSchemaSpec extends AnyFunSuite {

  val catalogJson: String =
    """{"streams": [{
      |  "stream": "orders", "tap_stream_id": "orders",
      |  "schema": {"type": "object", "properties": {
      |      "order_id": {"type": ["integer", "null"]},
      |      "amount": {"type": ["number", "null"]},
      |      "created_at": {"type": "string", "format": "date-time"},
      |      "is_active": {"type": ["boolean", "null"]},
      |      "tags": {"type": ["array", "null"], "items": {"type": "string"}},
      |      "meta": {"type": "object", "properties": {"k": {"type": "integer"}}},
      |      "multi": {"type": ["integer", "string", "null"]},
      |      "anyof_dt": {"anyOf": [{"type": "string", "format": "date-time"},
      |                             {"type": "null"}]}}},
      |  "metadata": [{"breadcrumb": [], "metadata": {"table-key-properties": ["a","b"]}}]
      |}]}""".stripMargin

  test("catalog → StructType with Singer typing rules") {
    val cat = CatalogReader.fromJson(catalogJson)("orders")
    val f = cat.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(f("order_id") === LongType)
    assert(f("amount") === DoubleType)
    assert(f("created_at") === TimestampType)
    assert(f("is_active") === BooleanType)
    assert(f("tags") === ArrayType(StringType))
    assert(f("meta") === StructType(Seq(StructField("k", LongType))))
    assert(f("multi") === StringType)   // multi-type union degrades to string
    assert(f("anyof_dt") === TimestampType) // anyOf prefers the format variant
    assert(cat.keyProperties === Seq("a", "b"))
    assert(cat.dateFields.toSet === Set("created_at", "anyof_dt"))
  }

  test("StructType → Singer schema round-trips the type system") {
    val st = StructType(Seq(
      StructField("i", LongType), StructField("d", DoubleType),
      StructField("b", BooleanType), StructField("s", StringType),
      StructField("ts", TimestampType), StructField("dt", DateType),
      StructField("arr", ArrayType(LongType)),
      StructField("obj", StructType(Seq(StructField("x", StringType))))))
    val json = SingerSchema.fromStructTypeJson(st)
    val back = SingerSchema.toStructType(json)
    assert(back.fields.map(f => f.name -> f.dataType).toMap === Map(
      "i" -> LongType, "d" -> DoubleType, "b" -> BooleanType,
      "s" -> StringType, "ts" -> TimestampType, "dt" -> DateType,
      "arr" -> ArrayType(LongType),
      "obj" -> StructType(Seq(StructField("x", StringType)))))
  }

  test("key_properties parses JSON and python-literal forms") {
    assert(SingerSchema.parseKeyProperties("""["id"]""") === Seq("id"))
    assert(SingerSchema.parseKeyProperties("""['id', 'x']""") === Seq("id", "x"))
    assert(SingerSchema.parseKeyProperties("[]") === Nil)
  }

  test("pydantic-style $ref/$defs schemas resolve (incl. Optional[Model])") {
    val json =
      """{"type": "object", "properties": {
        |  "addr": {"$ref": "#/$defs/Address"},
        |  "alt": {"anyOf": [{"$ref": "#/$defs/Address"}, {"type": "null"}]},
        |  "legacy": {"$ref": "#/definitions/Legacy"}},
        |"$defs": {"Address": {"type": "object", "properties": {
        |    "city": {"type": "string"}, "zip": {"type": "integer"}}}},
        |"definitions": {"Legacy": {"type": ["number", "null"]}}}""".stripMargin
    val st = SingerSchema.toStructType(json)
    val addr = st("addr").dataType.asInstanceOf[StructType]
    assert(addr.fieldNames.toSeq === Seq("city", "zip"))
    assert(addr("zip").dataType === LongType)
    assert(st("alt").dataType.isInstanceOf[StructType])
    assert(st("legacy").dataType === DoubleType)
  }

  test("self-referential $defs (recursive pydantic model) degrade to string, no overflow") {
    // pydantic model_json_schema() for `class Node(BaseModel): child: Optional[Node]`
    // (root-$ref shape): the repeated ref degrades to string instead of
    // recursing unboundedly into StackOverflowError
    val rootRef =
      """{"$ref": "#/$defs/Node",
        |"$defs": {"Node": {"type": "object", "properties": {
        |  "name": {"type": "string"},
        |  "child": {"anyOf": [{"$ref": "#/$defs/Node"}, {"type": "null"}]},
        |  "children": {"type": "array", "items": {"$ref": "#/$defs/Node"}}}}}}""".stripMargin
    val st = SingerSchema.toStructType(rootRef)
    assert(st.fieldNames.toSeq === Seq("name", "child", "children"))
    assert(st("name").dataType === StringType)
    assert(st("child").dataType === StringType)
    assert(st("children").dataType === ArrayType(StringType))

    // properties-at-root shape: one level resolves, the cycle below degrades
    val propsRoot =
      """{"type": "object", "properties": {
        |  "child": {"$ref": "#/$defs/Node"}},
        |"$defs": {"Node": {"type": "object", "properties": {
        |  "name": {"type": "string"},
        |  "child": {"$ref": "#/$defs/Node"}}}}}""".stripMargin
    val st2 = SingerSchema.toStructType(propsRoot)
    val child = st2("child").dataType.asInstanceOf[StructType]
    assert(child("name").dataType === StringType)
    assert(child("child").dataType === StringType)
  }
}
