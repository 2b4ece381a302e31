package graft.schema

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Model validation: the Spark-native analogue of the reference's
  * Pydantic-based validate_model / handle_validation_error
  * (gluestick/unified_models_utils.py:9-80).
  *
  * A "model" is a StructType (build one from a case class with
  * `SingerSchema`-style reflection, from a catalog, or by hand). A row
  * fails when a value can't cast to the declared type, or a non-nullable
  * field is null. Failures either raise (first offender, with field/value
  * detail) or append to an error log and drop the row — distributed
  * either way: the valid path never leaves the executors.
  */
object Validation {

  final case class ValidationError(message: String) extends RuntimeException(message)

  /** Returns the frame cast to the model's types with invalid rows removed;
    * `raiseError=true` throws on the first invalid row instead. */
  def validateModel(
      df: DataFrame,
      model: StructType,
      raiseError: Boolean = true,
      errorLog: String = "error_log.txt"): DataFrame = {
    val casts = model.fields.toIndexedSeq.map { f =>
      if (df.columns.contains(f.name))
        col(s"`${f.name}`").try_cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    val casted = df.select((casts :+ struct(df.columns.toIndexedSeq.map(c => col(s"`$c`")): _*).as("__orig")): _*)
    // invalid: declared non-nullable and null after cast, or original
    // value non-null but cast nulled it out
    val invalidCond = model.fields.toIndexedSeq.map { f =>
      val castNulledIt =
        if (df.columns.contains(f.name))
          col(s"__orig.`${f.name}`").isNotNull && col(s"`${f.name}`").isNull
        else lit(false)
      val requiredMissing = if (!f.nullable) col(s"`${f.name}`").isNull else lit(false)
      castNulledIt || requiredMissing
    }.reduce(_ || _)

    val invalid = casted.filter(invalidCond)
    val offenders = invalid.limit(if (raiseError) 1 else 100).collect()
    if (offenders.nonEmpty) {
      val messages = offenders.map(r => describe(r, model))
      if (raiseError) throw ValidationError(messages.head)
      else {
        val out = messages.map(m => s"ERROR: $m\n").mkString
        java.nio.file.Files.writeString(java.nio.file.Paths.get(errorLog), out,
          java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
      }
    }
    casted.filter(!invalidCond).drop("__orig")
  }

  private def describe(r: Row, model: StructType): String = {
    val orig = r.getStruct(r.fieldIndex("__orig"))
    val bad = model.fields.find { f =>
      val i = r.fieldIndex(f.name)
      r.isNullAt(i) && (!f.nullable ||
        (orig.schema.fieldNames.contains(f.name) && !orig.isNullAt(orig.fieldIndex(f.name))))
    }
    bad match {
      case Some(f) =>
        val v = if (orig.schema.fieldNames.contains(f.name)) {
          val i = orig.fieldIndex(f.name)
          if (orig.isNullAt(i)) "null" else orig.get(i).toString
        } else "missing"
        s"Field '${f.name}' failed to be casted as '${f.dataType.simpleString}', value trying to be casted: '$v'"
      case None => s"row failed validation: $orig"
    }
  }
}
