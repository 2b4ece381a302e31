package graft.export

import graft.singer.SingerWriter
import org.apache.spark.sql.DataFrame

/** Multi-format sink router (reference to_export, etl_utils.py:561-832):
  * singer | parquet | csv | json | jsonl, with env-templated output naming.
  *
  * Formats other than singer go through Spark's native writers (parquet
  * zstd, matching the reference's compression choice — etl_utils.py:189).
  * An unknown format raises (the reference's Polars path behavior; its
  * pandas path silently fell through to CSV — we take the strict variant,
  * divergence noted in SURVEY §7.5).
  */
object Exporter {

  /** `HG_UNIFIED_OUTPUT_<NAME>` env override + `{key}` templating on the
    * prefix (reference etl_utils.py:528-558, 596-607). */
  def outputName(
      stream: String,
      prefix: String = "",
      vars: Map[String, String] = Map.empty,
      env: Map[String, String] = sys.env): String = {
    val overridden = env.getOrElse(s"HG_UNIFIED_OUTPUT_${stream.toUpperCase}", stream)
    val templated = vars.foldLeft(prefix) { case (acc, (k, v)) =>
      acc.replace(s"{$k}", v)
    }
    // unresolved {placeholders} render empty (format_str_safely skip-empty)
    val cleaned = templated.replaceAll("\\{[^}]*\\}", "")
    s"$cleaned$overridden"
  }

  def export(
      df: DataFrame,
      stream: String,
      outputDir: String,
      format: String = "singer",
      keyProperties: Seq[String] = Nil,
      prefix: String = "",
      templateVars: Map[String, String] = Map.empty,
      singleFile: Boolean = true): Unit = {
    val name = outputName(stream, prefix, templateVars)
    val base = s"$outputDir/$name"
    format.toLowerCase match {
      case "singer" =>
        if (singleFile) SingerWriter.write(df, name, s"$base.singer", keyProperties)
        else SingerWriter.writeDistributed(df, name, base, keyProperties)
      case "parquet" =>
        df.write.mode("overwrite").option("compression", "zstd").parquet(base)
      case "csv" =>
        df.write.mode("overwrite").option("header", "true").csv(base)
      case "json" | "jsonl" =>
        df.write.mode("overwrite").json(base)
      case other =>
        throw new IllegalArgumentException(s"Unsupported export format: $other")
    }
  }

  /** Persist error text to `errors.txt` then rethrow
    * (reference exception(), etl_utils.py:834-853). */
  def exception(e: Throwable, rootDir: String, message: Option[String] = None): Nothing = {
    val msg = message.getOrElse(Option(e.getMessage).getOrElse(e.toString))
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(rootDir, "errors.txt"),
        msg.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Exception => () }
    throw e
  }
}
