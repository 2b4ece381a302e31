package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus version diffing (extension): the report behind "what changed
  * between corpus v1 and v2" — release auditing for training-data
  * snapshots (docs added/removed/edited, net token drift per source)
  * before a retrain is signed off.
  *
  * Scale shape: each side collapses to (id, group, content-hash, ntok)
  * BEFORE the join — the full-outer diff join shuffles key+hash+count
  * width only, never document text. Equality is decided on xxhash64
  * (collision odds ~n²/2⁶⁴ — the family's standard trade; an external
  * oracle compares the texts themselves and reaches the same verdict). */
object Diff {

  private def digest(df: DataFrame, idCol: String, groupCol: String,
      textCol: String, suffix: String): DataFrame =
    df.select(col(idCol),
      col(groupCol).as(s"__g$suffix"),
      xxhash64(col(textCol)).as(s"__h$suffix"),
      size(Dedup.tokensCol(col(textCol))).as(s"__t$suffix"))

  /** Row-level diff: (id, group, status, ntok_v1, ntok_v2) with status ∈
    * {added, removed, changed, unchanged}. `group` prefers v2's value
    * (renamed/moved docs report their new home). */
  def corpusDiff(v1: DataFrame, v2: DataFrame, idCol: String,
      groupCol: String, textCol: String): DataFrame = {
    val joined = digest(v1, idCol, groupCol, textCol, "1")
      .join(digest(v2, idCol, groupCol, textCol, "2"), Seq(idCol), "full_outer")
    val status = when(col("__h1").isNull, lit("added"))
      .when(col("__h2").isNull, lit("removed"))
      .when(col("__h1") === col("__h2"), lit("unchanged"))
      .otherwise(lit("changed"))
    joined.select(col(idCol),
      coalesce(col("__g2"), col("__g1")).as(groupCol),
      status.as("status"),
      col("__t1").as("ntok_v1"), col("__t2").as("ntok_v2"))
  }

  /** Per-group rollup: counts per status plus the net token drift
    * Σ ntok_v2 − Σ ntok_v1 (added docs count fully positive, removed
    * fully negative). */
  def corpusDiffReport(v1: DataFrame, v2: DataFrame, idCol: String,
      groupCol: String, textCol: String): DataFrame = {
    def cnt(s: String): Column =
      sum(when(col("status") === s, 1L).otherwise(0L)).as(s"n_$s")
    corpusDiff(v1, v2, idCol, groupCol, textCol)
      .groupBy(col(groupCol))
      .agg(cnt("added"), cnt("removed"), cnt("changed"), cnt("unchanged"),
        sum(coalesce(col("ntok_v2"), lit(0L)).cast("long") -
          coalesce(col("ntok_v1"), lit(0L)).cast("long")).as("token_delta"))
  }
}
