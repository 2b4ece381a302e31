package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract / resize / frame-sample run as `mapPartitions` stages
  * (the Scala analogue of Pandas-UDF-over-mapInPandas: per-partition batch
  * processing with an explicit output schema, so Spark plans them as a
  * single narrow stage — no shuffle, no driver round-trip).
  *
  * The codec layer is STUBBED — the container has no image/audio libs — as
  * `DeterministicFakeCodec`, which derives plausible metadata from the raw
  * bytes deterministically. The Spark-side contract (schemas, batching,
  * partition sizing, null handling) is real and tested; swapping in a real
  * codec is replacing one pure function.
  */
object Multimodal {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("codec", StringType)))

  /** A media table schema: id + opaque payload + typed metadata. */
  def mediaSchema(idType: DataType = LongType): StructType = StructType(Seq(
    StructField("media_id", idType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", mediaMetaType)))

  /** The stub codec: everything derived deterministically from payload
    * bytes, so tests are stable. A real build replaces these bodies with
    * actual decoders (??? marks the genuine decode steps). */
  object DeterministicFakeCodec {
    def sniffMime(payload: Array[Byte]): String =
      if (payload == null || payload.isEmpty) "application/octet-stream"
      else payload(0) & 0x3 match {
        case 0 => "image/jpeg"
        case 1 => "image/png"
        case 2 => "audio/wav"
        case _ => "video/mp4"
      }

    /** REAL IMPL WOULD: decode the image header. Stub: dimensions from the
      * first 8 payload bytes read as two big-endian uint32s (decode step
      * intentionally not implemented: ???). */
    def probeDimensions(payload: Array[Byte]): (Int, Int) = {
      if (payload == null || payload.length < 8) return (64, 64)
      def be32(o: Int): Long =
        ((payload(o) & 0xFFL) << 24) | ((payload(o + 1) & 0xFFL) << 16) |
          ((payload(o + 2) & 0xFFL) << 8) | (payload(o + 3) & 0xFFL)
      ((64 + be32(0) % 1024).toInt, (64 + be32(4) % 1024).toInt)
    }

    /** REAL IMPL WOULD: resample pixels. Stub: truncate/pad bytes to a
      * deterministic size proportional to the target area. */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val target = math.max(16, (w * h) / 64)
      java.util.Arrays.copyOf(payload, target)
    }

    /** REAL IMPL WOULD: decode frames at `everyMs` intervals. Stub: slice
      * the payload into frame-sized chunks. */
    def sampleFrames(payload: Array[Byte], everyMs: Long, durationMs: Long): Seq[Array[Byte]] = {
      val n = math.max(1, (durationMs / math.max(1, everyMs)).toInt).min(16)
      val sz = math.max(1, payload.length / n)
      (0 until n).map(i => java.util.Arrays.copyOfRange(
        payload, i * sz, math.min(payload.length, (i + 1) * sz)))
    }

    /** Batch entry point a real encoder would implement (one model call
      * per batch). Stub: per-item features. */
    def featuresBatch(payloads: Seq[Array[Byte]]): Seq[Array[Float]] =
      payloads.map(features)

    /** REAL IMPL WOULD: run a vision/audio encoder. Stub: a deterministic
      * 16-dim feature vector from byte statistics. */
    def features(payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](16)
      if (payload != null) {
        var i = 0
        while (i < payload.length) {
          out(i % 16) += (payload(i) & 0xFF) / 255.0f
          i += 1
        }
        val n = math.max(1, payload.length / 16)
        (0 until 16).foreach(j => out(j) /= n.toFloat)
      }
      out
    }
  }

  /** Decode pass: fill the `meta` struct from the payload. Batched per
    * partition; payload column stays opaque (never shuffled wider than
    * needed — project before calling at scale). */
  def decodeMeta(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("decoded_meta", mediaMetaType))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.get(idx).asInstanceOf[Array[Byte]]
        val (w, h) = DeterministicFakeCodec.probeDimensions(payload)
        val meta = Row(DeterministicFakeCodec.sniffMime(payload), w, h,
          if (payload == null) 0L else payload.length.toLong, "stub")
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(enc)
  }

  /** Feature-extraction pass → `features: array<float>` column.
    *
    * Batched like mapInPandas: rows are processed `batchSize` at a time so
    * a real encoder can amortize model invocation over the batch (the
    * stub's batch API is a map, but the batching plumbing — grouping,
    * order preservation, last-partial-batch — is the real contract). */
  def extractFeatures(df: DataFrame, payloadCol: String = "payload",
      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val feats = DeterministicFakeCodec.featuresBatch(
          batch.map(_.get(idx).asInstanceOf[Array[Byte]]))
        batch.iterator.zip(feats.iterator).map { case (r, f) =>
          Row.fromSeq(r.toSeq :+ f.toSeq)
        }
      }
    }(enc)
  }

  /** Fused decode + feature pass: one `mapPartitions`, so each media row is
    * deserialized/reserialized ONCE instead of paying the RowEncoder
    * boundary twice (chaining [[decodeMeta]] then [[extractFeatures]]
    * deserializes every row at both stage entries — measurably pure
    * overhead, and the non-codegen boundary deoptimizes the surrounding
    * plan twice). Output schema and values are identical to the chain:
    * `decoded_meta` struct then `features: array<float>`. Feature
    * extraction stays batched (`batchSize`) so a real encoder amortizes
    * model invocation; metadata decode is per-row within the same batch. */
  def decodeAndFeaturize(df: DataFrame, payloadCol: String = "payload",
      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("decoded_meta", mediaMetaType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val payloads = batch.map(_.get(idx).asInstanceOf[Array[Byte]])
        val feats = DeterministicFakeCodec.featuresBatch(payloads)
        batch.iterator.zip(payloads.iterator).zip(feats.iterator).map {
          case ((r, payload), f) =>
            val (w, h) = DeterministicFakeCodec.probeDimensions(payload)
            val meta = Row(DeterministicFakeCodec.sniffMime(payload), w, h,
              if (payload == null) 0L else payload.length.toLong, "stub")
            Row.fromSeq(r.toSeq ++ Seq(meta, f.toSeq))
        }
      }
    }(enc)
  }

  /** Resize pass (image semantics): payload → resized payload. */
  def resize(df: DataFrame, w: Int, h: Int, payloadCol: String = "payload"): DataFrame = {
    val enc = RowEncoder.encoderFor(df.schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.get(idx).asInstanceOf[Array[Byte]]
        val resized = if (payload == null) null
          else DeterministicFakeCodec.resize(payload, w, h)
        Row.fromSeq(r.toSeq.updated(idx, resized))
      }
    }(enc)
  }

  /** Frame-sampling pass (video semantics): one output row per sampled
    * frame — a flatMap, so downstream stages parallelize over frames. */
  def sampleFrames(df: DataFrame, everyMs: Long,
      payloadCol: String = "payload", metaCol: String = "meta"): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val mIdx = df.schema.fieldIndex(metaCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.get(pIdx).asInstanceOf[Array[Byte]]
        if (payload == null) Iterator.empty
        else {
          val meta = r.getStruct(mIdx)
          val dur = if (meta == null || meta.isNullAt(3)) payload.length.toLong else meta.getLong(3)
          DeterministicFakeCodec.sampleFrames(payload, everyMs, dur).iterator
            .zipWithIndex.map { case (f, i) => Row.fromSeq(r.toSeq ++ Seq(i, f)) }
        }
      }
    }(enc)
  }

  /** Synthesize a deterministic media table from any keyed frame (for tests
    * and benches: payload bytes derived from the id). */
  def synthesize(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol).cast(LongType).as("media_id"),
      // payload: repeatable pseudo-bytes from the id
      unhex(repeat(substring(md5(col(idCol).cast(StringType)), 1, 16), 8)).as("payload"))
      .withColumn("meta", lit(null).cast(mediaMetaType))
}
