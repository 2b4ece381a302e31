package graft.export

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

/** Pipeline directory lifecycle + string-template variables.
  *
  * Reference: gluestick/config_utils.py:12-94 (env → ROOT_DIR and the
  * sync-output / etl-output / snapshots / tmp directories) and
  * etl_utils.py:451-525 (build_string_format_variables: merge tenant
  * metadata with job env vars for output-name templating).
  */
final case class PipelineDirs(
    root: String,
    input: String,
    output: String,
    snapshots: String,
    tmp: String)

object PipelineConfig {

  /** Resolve the standard directory layout from env (ROOT_DIR, else cwd),
    * creating missing directories. */
  def establishDirectories(env: Map[String, String] = sys.env): PipelineDirs = {
    val root = env.getOrElse("ROOT_DIR", ".")
    val dirs = PipelineDirs(
      root = root,
      input = env.getOrElse("INPUT_DIR", s"$root/sync-output"),
      output = env.getOrElse("OUTPUT_DIR", s"$root/etl-output"),
      snapshots = env.getOrElse("SNAPSHOT_DIR", s"$root/snapshots"),
      tmp = s"$root/tmp")
    Seq(dirs.input, dirs.output, dirs.snapshots, dirs.tmp)
      .foreach(d => Files.createDirectories(Paths.get(d)))
    dirs
  }

  /** Merge a JSON config file over defaults: keys present in the defaults
    * keep their default when missing or empty-string in the file; a falsy /
    * missing path returns the defaults unchanged (reference
    * config_utils.py:97-135). */
  def loadConfigJson(path: Option[String], defaults: Map[String, String]): Map[String, String] = {
    val file = path.filter(_.nonEmpty).map(Paths.get(_)).filter(Files.exists(_))
    file match {
      case None => defaults
      case Some(p) =>
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(Files.readString(p))
        val fromFile = node.properties().asScala
          .map(e => e.getKey -> (if (e.getValue.isTextual) e.getValue.asText() else e.getValue.toString))
          .toMap
        defaults ++ fromFile.filterNot { case (k, v) => defaults.contains(k) && v.isEmpty }
    }
  }

  private val JobEnvKeys = Seq("FLOW", "JOB_ID", "TAP", "CONNECTOR_ID", "TENANT", "ENV_ID")

  /** Template variables for output naming: job env vars + tenant metadata,
    * with `TENANT` split into root/sub on the first underscore
    * (reference etl_utils.py:451-525). */
  def buildStringFormatVariables(
      tenantMetadata: Map[String, String] = Map.empty,
      env: Map[String, String] = sys.env): Map[String, String] = {
    val fromEnv = JobEnvKeys.flatMap(k => env.get(k).map(k -> _)).toMap
    val tenantSplit = fromEnv.get("TENANT").map { t =>
      val parts = t.split("_", 2)
      if (parts.length == 2) Map("ROOT_TENANT_ID" -> parts(0), "SUB_TENANT_ID" -> parts(1))
      else Map("ROOT_TENANT_ID" -> t, "SUB_TENANT_ID" -> "")
    }.getOrElse(Map.empty)
    tenantMetadata ++ fromEnv ++ tenantSplit
  }
}
