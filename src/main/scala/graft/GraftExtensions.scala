package graft

import graft.functions.{CanonicalText, MinHashSignature, ParsePyLiteral,
  PyFloat32Repr, PyFloatRepr, SimHashBits, TextCounts, VectorDot,
  WinnowedHashes, WordShingles}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers the engine's native expressions as SQL functions, so
  * `spark.sql("SELECT parse_py_literal(c) ...")` works alongside the
  * Column API. Install via
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`, or call
  * `GraftExtensions.register(spark)` on an existing session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("parse_py_literal",
      info("parse_py_literal", "normalizes a python-literal string to JSON"),
      (args: Seq[Expression]) => ParsePyLiteral(args.head)),
    ("py_float_repr",
      info("py_float_repr", "renders a double exactly like python str()"),
      (args: Seq[Expression]) => PyFloatRepr(args.head)),
    ("vector_dot",
      info("vector_dot", "fused-loop dot product of two float/double arrays"),
      (args: Seq[Expression]) => VectorDot(args(0), args(1))),
    ("py_float32_repr",
      info("py_float32_repr", "renders a float exactly like numpy str(float32)"),
      (args: Seq[Expression]) => PyFloat32Repr(args.head)),
    ("text_counts",
      info("text_counts", "struct(chars, tokens, bpeish, alpha, punct, stop) in one scan"),
      (args: Seq[Expression]) => TextCounts(args.head)),
    ("canonical_text",
      info("canonical_text", "fingerprint canonicalization (lower, strip, collapse ws)"),
      (args: Seq[Expression]) => CanonicalText(args.head)),
    ("word_shingles",
      info("word_shingles", "word_shingles(tokens, n, distinct) — n-gram shingles in one pass"),
      (args: Seq[Expression]) => WordShingles(args(0),
        intArg(args, 1, "word_shingles", "n"),
        boolArg(args, 2, "word_shingles", "distinct"))),
    ("minhash_signature",
      info("minhash_signature", "minhash_signature(shingles, numHashes) — all lanes in one pass"),
      (args: Seq[Expression]) => MinHashSignature(args(0),
        intArg(args, 1, "minhash_signature", "numHashes"))),
    ("simhash_bits",
      info("simhash_bits", "64-bit simhash of a token array in one pass"),
      (args: Seq[Expression]) => SimHashBits(args.head)),
    ("winnowed_hashes",
      info("winnowed_hashes",
        "winnowed_hashes(tokens, k, window, hashKind) — fused winnowing fingerprints"),
      (args: Seq[Expression]) => WinnowedHashes(args(0),
        intArg(args, 1, "winnowed_hashes", "k"),
        intArg(args, 2, "winnowed_hashes", "window"),
        strArg(args, 3, "winnowed_hashes", "hashKind"))),
    ("repetition_stats",
      info("repetition_stats",
        "struct(dup_line_frac, dup_2gram_frac, adj_repeat_frac) in one scan"),
      (args: Seq[Expression]) => graft.functions.RepetitionStats(args.head)),
    ("kgram_hashes",
      info("kgram_hashes",
        "kgram_hashes(tokens, k, hashKind) — every positional k-gram hash in one pass"),
      (args: Seq[Expression]) => graft.functions.KgramHashes(args(0),
        intArg(args, 1, "kgram_hashes", "k"),
        strArg(args, 2, "kgram_hashes", "hashKind"))),
    ("cdc_chunk_hashes",
      info("cdc_chunk_hashes",
        "cdc_chunk_hashes(tokens, avgChunkTokens, hashKind) — content-defined chunk hashes"),
      (args: Seq[Expression]) => graft.functions.CdcChunkHashes(args(0),
        intArg(args, 1, "cdc_chunk_hashes", "avgChunkTokens"),
        strArg(args, 2, "cdc_chunk_hashes", "hashKind"))),
    ("strip_markup",
      info("strip_markup", "HTML/markup → clean text in one fused scan"),
      (args: Seq[Expression]) => graft.functions.StripMarkup(args.head)),
    ("normalize_text",
      info("normalize_text", "Unicode NFC + control/whitespace collapse in one pass"),
      (args: Seq[Expression]) => graft.functions.NormalizeText(args.head)),
    ("hashed_embedding",
      info("hashed_embedding",
        "hashed_embedding(tokens, dim, hashKind) — l2-normalized feature-hashed vector"),
      (args: Seq[Expression]) => graft.functions.HashedEmbedding(args(0),
        intArg(args, 1, "hashed_embedding", "dim"),
        strArg(args, 2, "hashed_embedding", "hashKind"))),
    ("compression_ratio",
      info("compression_ratio",
        "compression_ratio(text, level) — deflate(compressed)/raw bytes redundancy signal"),
      (args: Seq[Expression]) => graft.functions.CompressionRatio(args(0),
        intArg(args, 1, "compression_ratio", "level"))),
    ("bigram_bucket_counts",
      info("bigram_bucket_counts",
        "bigram_bucket_counts(tokens, buckets, hashKind) — sorted sparse (bucket, cnt) hashed-bigram feature vector"),
      (args: Seq[Expression]) => graft.functions.BigramBucketCounts(args(0),
        intArg(args, 1, "bigram_bucket_counts", "buckets"),
        strArg(args, 2, "bigram_bucket_counts", "hashKind"))))

  private def lit(args: Seq[Expression], i: Int, fn: String, name: String): Any =
    args(i) match {
      case Literal(v, _) => v
      case other => throw new IllegalArgumentException(
        s"$fn: argument '$name' must be a literal, got $other")
    }
  private def intArg(args: Seq[Expression], i: Int, fn: String, name: String): Int =
    lit(args, i, fn, name) match {
      case n: Int => n
      case n: Long if n >= Int.MinValue && n <= Int.MaxValue => n.toInt
      case v => throw new IllegalArgumentException(
        s"$fn: '$name' must be an int in [${Int.MinValue}, ${Int.MaxValue}], got $v")
    }
  private def boolArg(args: Seq[Expression], i: Int, fn: String, name: String): Boolean =
    lit(args, i, fn, name) match {
      case b: Boolean => b
      case v => throw new IllegalArgumentException(s"$fn: '$name' must be a boolean, got $v")
    }
  private def strArg(args: Seq[Expression], i: Int, fn: String, name: String): String =
    lit(args, i, fn, name) match {
      case s: UTF8String => s.toString
      case s: String     => s
      case v => throw new IllegalArgumentException(s"$fn: '$name' must be a string, got $v")
    }

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
