package graft.operators

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Declarative field-mapping DSL, compiled to a Catalyst expression tree.
  *
  * The reference applies the mapping per row in Python
  * (gluestick/etl_utils.py:1179-1340: map_fields / map_fields_df); here the
  * mapping dict compiles once, on the driver, into Columns + pre-joins, so
  * the mapped pipeline is a single distributed projection:
  *
  *  - `"out": "src"`                → column copy
  *  - `"out": {…}`                  → nested struct (recursive)
  *  - `"out": [{…}, …]`             → array of structs
  *  - `"out": {"pick": {…}}`        → lookup join into another stream
  *        (lookup deduped keep-last, then broadcast left join;
  *         `is_list` pre-aggregates the lookup with collect_list)
  *  - `"out": {"pickregex": {…}}`   → regex column projection, optionally
  *        reshaped to `[{name, value}]` custom-fields form
  *
  * "pick" lookups that the reference evaluates with a per-row `df.apply`
  * become broadcast hash joins — the O(rows × lookup) scan collapses to
  * O(rows), and nothing is collected to the driver.
  */
object Mapping {
  private val jackson = new ObjectMapper()

  def mapFieldsDf(df: DataFrame, mappingJson: String, otherData: Map[String, DataFrame] = Map.empty): DataFrame =
    mapFields(df, mappingJson, otherData, project = false)

  /** `project=true` returns only the mapped columns (map_fields semantics);
    * `project=false` keeps the source columns too (map_fields_df). */
  def mapFields(
      df: DataFrame,
      mappingJson: String,
      otherData: Map[String, DataFrame] = Map.empty,
      project: Boolean = true): DataFrame = {
    val mapping = jackson.readTree(mappingJson)
    require(mapping.isObject, "mapping must be a JSON object")
    var cur = df
    var pickIdx = 0
    // picks can appear at ANY depth of the mapping (the reference resolves
    // them recursively) — collect and join them all up front, remembering
    // each pick node's temp column
    val pickTags = new java.util.IdentityHashMap[JsonNode, String]()

    def joinPick(node: JsonNode): Unit = {
      val p = node.get("pick")
      val objects = p.get("objects").asText()
      otherData.get(objects).foreach { lookup0 =>
        val idField = p.get("id_field").asText()
        val filterIds = p.get("filter_ids").asText().stripPrefix("rec.")
        val partitionKey = Option(p.get("partition_key")).filterNot(_.isNull).map(_.asText())
        val isList = Option(p.get("is_list")).exists(_.asBoolean())
        val tf = p.get("target_fields")
        val targetFields: Seq[String] =
          if (tf.isArray) tf.elements().asScala.map(_.asText()).toSeq else Seq(tf.asText())
        val valueCol: Column =
          if (tf.isArray) struct(targetFields.map(c => col(s"`$c`").as(c)): _*)
          else col(s"`${targetFields.head}`")
        val joinKeys = idField +: partitionKey.toSeq
        val tag = s"__gs_pick_$pickIdx"; pickIdx += 1
        val prepared =
          if (isList)
            lookup0.groupBy(joinKeys.map(c => col(s"`$c`")): _*)
              .agg(collect_list(valueCol).as(tag))
          else
            Snapshot.dedupKeepLast(lookup0, joinKeys)
              .select((joinKeys.map(c => col(s"`$c`")) :+ valueCol.as(tag)): _*)
        val cond = (cur(s"`$filterIds`") === prepared(s"`$idField`")) +:
          partitionKey.toSeq.map(k => cur(s"`$k`") === prepared(s"`$k`"))
        // lookup streams grow with tenant data — hint only when estimated small
        cur = cur.join(Ops.broadcastIfSmall(prepared), cond.reduce(_ && _), "left")
          .drop(prepared(s"`$idField`"))
        partitionKey.foreach(k => cur = cur.drop(prepared(s"`$k`")))
        pickTags.put(node, tag)
      }
    }

    def collectPicks(node: JsonNode): Unit = node match {
      case o if o.isObject && o.has("pick") => joinPick(o)
      case o if o.isObject =>
        o.properties().asScala.foreach(e => collectPicks(e.getValue))
      case a if a.isArray => a.elements().asScala.foreach(collectPicks)
      case _              =>
    }
    mapping.properties().asScala.foreach(e => collectPicks(e.getValue))

    def compile(node: JsonNode): Option[Column] = node match {
      case s if s.isTextual =>
        val src = s.asText()
        if (cur.columns.contains(src)) Some(col(s"`$src`")) else None
      case o if o.isObject && o.has("pickregex") =>
        val p = o.get("pickregex")
        val regex = p.get("regex_field").asText().r
        val matched = cur.columns.filter(c => regex.findPrefixOf(c).isDefined).toIndexedSeq
        val asCf = Option(p.get("return_as_cf")).exists(_.asBoolean())
        if (asCf) Some(Ops.customFieldsArray(matched))
        else Some(struct(matched.map(c => col(s"`$c`").as(c)): _*))
      case o if o.isObject && o.has("pick") =>
        Option(pickTags.get(o)).map(t => col(s"`$t`"))
      case o if o.isObject =>
        val entries = o.properties().asScala.toSeq.flatMap { e =>
          compile(e.getValue).map(_.as(e.getKey))
        }
        if (entries.isEmpty) None else Some(struct(entries: _*))
      case a if a.isArray =>
        val elems = a.elements().asScala.toSeq.flatMap(compile)
        if (elems.isEmpty) None else Some(array(elems: _*))
      case _ => None
    }

    val outCols = mapping.properties().asScala.toSeq.flatMap { e =>
      compile(e.getValue).map(c => e.getKey -> c)
    }
    val renames = outCols.map { case (k, c) => c.as(k) }
    if (project) cur.select(renames: _*)
    else {
      val out = outCols.foldLeft(cur) { case (d, (k, c)) => d.withColumn(k, c) }
      out.drop((0 until pickIdx).map(i => s"__gs_pick_$i"): _*)
    }
  }

  /** Tenant mapping payload → (field mappings per source stream, source →
    * target stream names). Two wire formats, detected by `version`
    * (reference etl_utils.py:924-1024). */
  def readTenantCustomMapping(
      tenantConfigJson: String,
      flowOrConnectorId: Option[String] = None): (Map[String, JsonNode], Map[String, String]) = {
    val root = jackson.readTree(tenantConfigJson)
    val raw = Option(root.at("/hotglue_mapping/mapping")).filterNot(_.isMissingNode)
      .getOrElse(return (Map.empty, Map.empty))
    val isV1 = Option(raw.get("version")).exists(_.asText() == "1.0")
    if (isV1) {
      val entries: Seq[JsonNode] = flowOrConnectorId
        .flatMap(id => Option(raw.get(id)).filter(_.isArray))
        .map(_.elements().asScala.toSeq)
        .getOrElse(raw.properties().asScala.toSeq.map(_.getValue).filter(_.isArray)
          .flatMap(_.elements().asScala))
      val fields = entries.map(e => e.get("source").asText() -> e.get("fields")).toMap
      val names = entries.map(e => e.get("source").asText() -> e.get("target").asText()).toMap
      (fields, names)
    } else {
      val flowKey = flowOrConnectorId.orElse {
        val keys = raw.properties().asScala.toSeq.map(_.getKey)
        if (keys.size == 1) keys.headOption else None
      }
      flowKey.flatMap(k => Option(raw.get(k))).filter(_.isObject) match {
        case None => (Map.empty, Map.empty)
        case Some(flow) =>
          val pairs = flow.properties().asScala.toSeq.map { e =>
            val Array(src, tgt) = e.getKey.split("/", 2)
            (src, tgt, e.getValue)
          }
          (pairs.map(p => p._1 -> p._3).toMap, pairs.map(p => p._1 -> p._2).toMap)
      }
    }
  }

  /** Config gate: is this stream selected for mapping
    * (reference should_map_table, etl_utils.py:1026-1040). */
  def shouldMapTable(modelName: String, configJson: String): Boolean = {
    val root = jackson.readTree(configJson)
    Option(root.at(s"/selected_tables/$modelName"))
      .exists(n => !n.isMissingNode && !n.isNull && n.asBoolean(false))
  }
}
