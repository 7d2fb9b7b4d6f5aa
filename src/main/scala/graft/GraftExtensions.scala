package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryMinus}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{AudioEnergySig, BpeSegmentExpr, UnigramSegmentExpr, CharNgramHashes, DotProduct, FnvHash64, HyperplaneSigs, ImageDHash, MatVec, MediaFeaturesExpr, MinHashBandBuckets, MinHashSig, NearestCentroid, PqEncodeCodes, SimHash64, SortedJaccard, TokenShingleHashes, TokenWindowHashes, TopKRows}

/** Session extension registering graft's native expressions in the
  * SQL function registry, so `spark.sql` users get the codegen'd
  * kernels by name:
  *
  *   spark.builder.withExtensions(new GraftExtensions) // or
  *   spark.conf: spark.sql.extensions=graft.GraftExtensions // or
  *   GraftExtensions.register(spark)                   // existing session
  *
  * SQL surface:
  *   dot_product(a, b)             — array<float|double> dot product
  *   simhash64(hashes)             — 64-bit simhash of array<bigint>
  *   token_shingle_hashes(s, k)    — distinct word-k-shingle hashes
  *   char_ngram_hashes(s, n)       — distinct char-n-gram hashes
  *   fnv_hash64(s)                 — FNV-1a codepoint hash of a string
  *   token_window_hashes(s, k)     — positional word-k-window hashes
  *   sorted_jaccard(a, b)          — merge-pass Jaccard of sorted-distinct array<bigint>
  *   topk_rows(struct(ord,id), k)  — bounded-heap top-k aggregate
  *   minhash_sig(hashes, k, seed)  — k-permutation MinHash signature
  *   minhash_band_buckets(sig, bands) — (band, bucket) pairs of a signature
  *   hyperplane_sigs(v, bands, bits, dim, seed) — sign-LSH band signatures
  *   pq_encode(v, cb, m, nCodes)   — PQ subspace codes vs a flat codebook
  *   nearest_centroid(v, cents, dim) — argmax-dot cell vs a flat centroid list
  *   mat_vec(v, flat, rows)        — dense y = R·x over a flat row-major matrix
  *   bpe_segment(word, merges)     — BPE pieces vs a "left right" merge list
  *   unigram_segment(word, pieces) — Viterbi pieces vs a "piece logprob" table
  *   image_dhash(bytes)            — perceptual dHash (stub fallback)
  *   audio_energy_sig(kind, bytes) — audio energy signature (stub fallback)
  *   media_features(kind, bytes, w, h, dur, tw, th) — decode-features struct
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def arity(args: Seq[Expression], n: Int, fn: String): Unit =
    if (args.size != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments, got ${args.size}")

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, _) => v
    // the SQL parser produces UnaryMinus(Literal), not a negative
    // Literal — accept it so e.g. a negative seed works from SQL too
    case UnaryMinus(Literal(v: Int, _), _) => -v
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an integer literal, got $other")
  }

  private def longArg(e: Expression, fn: String, pos: Int): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case UnaryMinus(Literal(v: Long, _), _) => -v
    case UnaryMinus(Literal(v: Int, _), _) => -v.toLong
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an integer literal, got $other")
  }

  private[graft] val registrations: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("dot_product",
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        arity(args, 2, "dot_product"); DotProduct(args(0), args(1))
      }),
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => {
        arity(args, 1, "simhash64"); SimHash64(args(0))
      }),
    ("token_shingle_hashes",
      new ExpressionInfo(classOf[TokenShingleHashes].getName, "token_shingle_hashes"),
      (args: Seq[Expression]) => {
        arity(args, 2, "token_shingle_hashes")
        TokenShingleHashes(args(0), intArg(args(1), "token_shingle_hashes", 2))
      }),
    ("char_ngram_hashes",
      new ExpressionInfo(classOf[CharNgramHashes].getName, "char_ngram_hashes"),
      (args: Seq[Expression]) => {
        arity(args, 2, "char_ngram_hashes")
        CharNgramHashes(args(0), intArg(args(1), "char_ngram_hashes", 2))
      }),
    ("fnv_hash64",
      new ExpressionInfo(classOf[FnvHash64].getName, "fnv_hash64"),
      (args: Seq[Expression]) => {
        arity(args, 1, "fnv_hash64"); FnvHash64(args(0))
      }),
    ("token_window_hashes",
      new ExpressionInfo(classOf[TokenWindowHashes].getName, "token_window_hashes"),
      (args: Seq[Expression]) => {
        arity(args, 2, "token_window_hashes")
        TokenWindowHashes(args(0), intArg(args(1), "token_window_hashes", 2))
      }),
    ("sorted_jaccard",
      new ExpressionInfo(classOf[SortedJaccard].getName, "sorted_jaccard"),
      (args: Seq[Expression]) => {
        arity(args, 2, "sorted_jaccard"); SortedJaccard(args(0), args(1))
      }),
    ("topk_rows",
      new ExpressionInfo(classOf[TopKRows].getName, "topk_rows"),
      (args: Seq[Expression]) => {
        arity(args, 2, "topk_rows"); TopKRows(args(0), args(1))
      }),
    ("minhash_sig",
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => {
        arity(args, 3, "minhash_sig")
        MinHashSig(args(0),
          intArg(args(1), "minhash_sig", 2), longArg(args(2), "minhash_sig", 3))
      }),
    ("minhash_band_buckets",
      new ExpressionInfo(classOf[MinHashBandBuckets].getName, "minhash_band_buckets"),
      (args: Seq[Expression]) => {
        arity(args, 2, "minhash_band_buckets")
        MinHashBandBuckets(args(0), intArg(args(1), "minhash_band_buckets", 2))
      }),
    ("hyperplane_sigs",
      new ExpressionInfo(classOf[HyperplaneSigs].getName, "hyperplane_sigs"),
      (args: Seq[Expression]) => {
        arity(args, 5, "hyperplane_sigs")
        HyperplaneSigs(args(0),
          intArg(args(1), "hyperplane_sigs", 2), intArg(args(2), "hyperplane_sigs", 3),
          intArg(args(3), "hyperplane_sigs", 4), longArg(args(4), "hyperplane_sigs", 5))
      }),
    ("pq_encode",
      new ExpressionInfo(classOf[PqEncodeCodes].getName, "pq_encode"),
      (args: Seq[Expression]) => {
        arity(args, 4, "pq_encode")
        PqEncodeCodes(args(0), args(1),
          intArg(args(2), "pq_encode", 3), intArg(args(3), "pq_encode", 4))
      }),
    ("nearest_centroid",
      new ExpressionInfo(classOf[NearestCentroid].getName, "nearest_centroid"),
      (args: Seq[Expression]) => {
        arity(args, 3, "nearest_centroid")
        NearestCentroid(args(0), args(1),
          intArg(args(2), "nearest_centroid", 3))
      }),
    ("mat_vec",
      new ExpressionInfo(classOf[MatVec].getName, "mat_vec"),
      (args: Seq[Expression]) => {
        arity(args, 3, "mat_vec")
        MatVec(args(0), args(1), intArg(args(2), "mat_vec", 3))
      }),
    ("bpe_segment",
      new ExpressionInfo(classOf[BpeSegmentExpr].getName, "bpe_segment"),
      (args: Seq[Expression]) => {
        arity(args, 2, "bpe_segment")
        BpeSegmentExpr(args(0), args(1))
      }),
    ("unigram_segment",
      new ExpressionInfo(classOf[UnigramSegmentExpr].getName, "unigram_segment"),
      (args: Seq[Expression]) => {
        arity(args, 2, "unigram_segment")
        UnigramSegmentExpr(args(0), args(1))
      }),
    ("image_dhash",
      new ExpressionInfo(classOf[ImageDHash].getName, "image_dhash"),
      (args: Seq[Expression]) => {
        arity(args, 1, "image_dhash"); ImageDHash(args(0))
      }),
    ("audio_energy_sig",
      new ExpressionInfo(classOf[AudioEnergySig].getName, "audio_energy_sig"),
      (args: Seq[Expression]) => {
        arity(args, 2, "audio_energy_sig"); AudioEnergySig(args(0), args(1))
      }),
    ("media_features",
      new ExpressionInfo(classOf[MediaFeaturesExpr].getName, "media_features"),
      (args: Seq[Expression]) => {
        arity(args, 7, "media_features")
        MediaFeaturesExpr(args(0), args(1), args(2), args(3), args(4),
          intArg(args(5), "media_features", 6),
          intArg(args(6), "media_features", 7))
      }))

  /** Register on an already-built session (temp functions). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
