package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{CharNgramHashes, DotProduct, HyperplaneSigs, MinHashBandBuckets, MinHashSig, SimHash64, TokenShingleHashes, TopKRows}

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
  *   topk_rows(struct(ord,id), k)  — bounded-heap top-k aggregate
  *   minhash_sig(hashes, k, seed)  — k-permutation MinHash signature
  *   hyperplane_sigs(v, bands, bits, dim, seed) — sign-LSH band signatures
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: second argument must be an integer literal, got $other")
  }

  private def longArg(e: Expression, fn: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$fn: argument must be an integer literal, got $other")
  }

  private[graft] val registrations: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("dot_product",
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args(0))),
    ("token_shingle_hashes",
      new ExpressionInfo(classOf[TokenShingleHashes].getName, "token_shingle_hashes"),
      (args: Seq[Expression]) =>
        TokenShingleHashes(args(0), intArg(args(1), "token_shingle_hashes"))),
    ("char_ngram_hashes",
      new ExpressionInfo(classOf[CharNgramHashes].getName, "char_ngram_hashes"),
      (args: Seq[Expression]) =>
        CharNgramHashes(args(0), intArg(args(1), "char_ngram_hashes"))),
    ("topk_rows",
      new ExpressionInfo(classOf[TopKRows].getName, "topk_rows"),
      (args: Seq[Expression]) => TopKRows(args(0), args(1))),
    ("minhash_sig",
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => MinHashSig(args(0),
        intArg(args(1), "minhash_sig"), longArg(args(2), "minhash_sig"))),
    ("minhash_band_buckets",
      new ExpressionInfo(classOf[MinHashBandBuckets].getName, "minhash_band_buckets"),
      (args: Seq[Expression]) =>
        MinHashBandBuckets(args(0), intArg(args(1), "minhash_band_buckets"))),
    ("hyperplane_sigs",
      new ExpressionInfo(classOf[HyperplaneSigs].getName, "hyperplane_sigs"),
      (args: Seq[Expression]) =>
        HyperplaneSigs(args(0),
          intArg(args(1), "hyperplane_sigs"), intArg(args(2), "hyperplane_sigs"),
          intArg(args(3), "hyperplane_sigs"), longArg(args(4), "hyperplane_sigs"))))

  /** Register on an already-built session (temp functions). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
