package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Featurize, Similarity}

class FeaturizeSpec extends SparkSpec {
  import spark.implicits._

  private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
  }

  test("hashedTfIdf: near-dups cosine high, unrelated texts separate, zeros covered") {
    val scope = new Dedup.CacheScope
    try {
      val docs = Seq(
        (1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
        (3L, "spark shuffle partitions exchange broadcast join codegen"),
        (4L, "")) // token-less → zero vector
        .toDF("doc_id", "text")
      val vecs = Featurize.hashedTfIdf(docs, "doc_id", "text", dim = 256,
          scope = scope)
        .as[(Long, Seq[Float])].collect().toMap
      assert(vecs.keySet == Set(1L, 2L, 3L, 4L))
      assert(vecs.values.forall(_.size == 256))
      val c12 = cosine(vecs(1L), vecs(2L))
      val c13 = cosine(vecs(1L), vecs(3L))
      assert(c12 > 0.75, s"near-dup cosine too low: $c12")
      assert(c13 < 0.3, s"unrelated cosine too high: $c13")
      assert(c12 > c13 + 0.4, s"no separation: $c12 vs $c13")
      // token-less doc: exact zero vector, and normalization produced
      // no NaN (the 0/1 guard)
      assert(vecs(4L).forall(_ == 0.0f))
      // normalized rows have unit L2 norm (within float tolerance)
      val n1 = math.sqrt(vecs(1L).map(x => x.toDouble * x).sum)
      assert(math.abs(n1 - 1.0) < 1e-5, s"norm $n1")
    } finally scope.release()
  }

  test("hashedTfIdf vectors feed the kNN machinery unchanged") {
    val scope = new Dedup.CacheScope
    try {
      val docs = Seq(
        (1L, "alpha beta gamma delta epsilon"),
        (2L, "alpha beta gamma delta zeta"), // 1's near-dup
        (3L, "one two three four five six"),
        (4L, "seven eight nine ten eleven"))
        .toDF("doc_id", "text")
      val vecs = Featurize.hashedTfIdf(docs, "doc_id", "text", dim = 128,
        scope = scope)
      // brute-force batch kNN over the hashed vectors: each doc's top
      // non-self neighbour — docs 1 and 2 must pick each other
      val nn = Similarity.knnBruteBatch(
          vecs, "doc_id", "vector", vecs, "doc_id", "vector", k = 2)
        .where(col("query_id") =!= col("id"))
        .groupBy("query_id").agg(max_by(col("id"), col("cosine")).as("nn"))
        .as[(Long, Long)].collect().toMap
      assert(nn(1L) == 2L && nn(2L) == 1L, nn.toString)
    } finally scope.release()
  }

  test("hashedTfIdf is deterministic across partitionings") {
    val scope = new Dedup.CacheScope
    try {
      val base = Tables.load(spark, sfDir, "documents").limit(50)
      val a = Featurize.hashedTfIdf(base.repartition(1), "doc_id", "text",
        dim = 64, scope = scope)
      val b = Featurize.hashedTfIdf(base.repartition(7), "doc_id", "text",
        dim = 64, scope = scope)
      // bit-exact agreement regardless of partition arrival order —
      // the scaled-long collision sums are what make this hold
      assertSameRows(a, b)
    } finally scope.release()
  }
}
