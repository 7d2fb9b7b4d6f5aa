package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Featurize, QualityModel, Similarity}

class FeaturizeSpec extends SparkSpec {
  import spark.implicits._

  // planted corpora for the learned quality filter: "good" docs look
  // like prose (stopwords, varied vocabulary), "bad" docs are the
  // boilerplate/spam shapes a curation filter exists to kill
  private def goodDoc(i: Int): String =
    s"the quick study of language model training data shows that " +
      s"careful curation improves results across benchmark $i and " +
      s"downstream evaluation with diverse well formed sentences"
  private def badDoc(i: Int): String =
    s"click here buy now $i free free free offer offer " +
      "win win win cash prize " + ("spam " * 12).trim

  test("quality classifier separates planted good/bad docs and generalizes") {
    val scope = new Dedup.CacheScope
    try {
      val labeled = ((1 to 30).map(i => (i.toLong, goodDoc(i), 1)) ++
        (31 to 60).map(i => (i.toLong, badDoc(i), 0)))
        .toDF("doc_id", "text", "label")
      val model = QualityModel.train(labeled, "doc_id", "text", "label",
        dim = 128, scope = scope)
      assert(model.weights.length == 128)
      // held-out docs (ids/pattern indices the trainer never saw)
      val held = ((101 to 110).map(i => (i.toLong, goodDoc(i))) ++
        (201 to 210).map(i => (i.toLong, badDoc(i))) :+
        (301L.toLong, "")).toDF("doc_id", "text")
      val scored = QualityModel.score(held, "doc_id", "text", model,
          scope = scope)
        .as[(Long, Double, Double)].collect().toSeq
      val byId = scored.map(s => s._1 -> s._2).toMap
      val worstGood = (101 to 110).map(i => byId(i.toLong)).min
      val bestBad = (201 to 210).map(i => byId(i.toLong)).max
      assert(worstGood > bestBad,
        s"no margin separation: worst good $worstGood <= best bad $bestBad")
      // probabilities land on the right sides of 0.5
      val probs = scored.map(s => s._1 -> s._3).toMap
      assert((101 to 110).forall(i => probs(i.toLong) > 0.5))
      assert((201 to 210).forall(i => probs(i.toLong) < 0.5))
      // token-less doc scores exactly at the bias
      assert(byId(301L) == model.bias)
    } finally scope.release()
  }

  test("quality scores are partition-independent and training is deterministic") {
    val scope = new Dedup.CacheScope
    try {
      val labeled = ((1 to 20).map(i => (i.toLong, goodDoc(i), 1)) ++
        (21 to 40).map(i => (i.toLong, badDoc(i), 0)))
        .toDF("doc_id", "text", "label")
      val m1 = QualityModel.train(labeled, "doc_id", "text", "label",
        dim = 64, scope = scope)
      val m2 = QualityModel.train(labeled.repartition(13), "doc_id",
        "text", "label", dim = 64, scope = scope)
      assert(m1.bias == m2.bias &&
        m1.weights.toSeq == m2.weights.toSeq,
        "training diverged across partitionings")
      val corpus = (1 to 50).map(i =>
        (i.toLong, if (i % 2 == 0) goodDoc(i) else badDoc(i)))
        .toDF("doc_id", "text")
      def scores(df: org.apache.spark.sql.DataFrame) =
        QualityModel.score(df, "doc_id", "text", m1, scope = scope)
          .as[(Long, Double, Double)].collect().sortBy(_._1).toSeq
      val a = scores(corpus.coalesce(1))
      val b = scores(corpus.repartition(11))
      assert(a == b, "scores diverged across partitionings")
    } finally scope.release()
  }

  test("distributed quality trainer: driver-IRLS parity, bit-deterministic across layouts, no sample cap") {
    val scope = new Dedup.CacheScope
    try {
      val labeled = ((1 to 30).map(i => (i.toLong, goodDoc(i), 1)) ++
        (31 to 60).map(i => (i.toLong, badDoc(i), 0)))
        .toDF("doc_id", "text", "label").localCheckpoint()
      val driver = QualityModel.train(labeled, "doc_id", "text", "label",
        dim = 64, scope = scope)
      val dist = QualityModel.trainDistributed(labeled, "doc_id", "text",
        "label", dim = 64, scope = scope)
      // parity to quantization tolerance: the distributed fit rounds
      // residuals/IRLS weights at 1e-6 per Newton round, so weights
      // agree closely but not bit-for-bit
      val dw = (dist.weights :+ dist.bias)
        .zip(driver.weights :+ driver.bias)
        .map { case (a, b) => math.abs(a - b) }.max
      assert(dw < 1e-3, s"distributed fit drifted from driver IRLS: $dw")
      // and the model it ships separates held-out docs the same way
      val held = ((101 to 110).map(i => (i.toLong, goodDoc(i))) ++
        (201 to 210).map(i => (i.toLong, badDoc(i))))
        .toDF("doc_id", "text")
      val probs = QualityModel.score(held, "doc_id", "text", dist,
          scope = scope)
        .as[(Long, Double, Double)].collect().map(s => s._1 -> s._3).toMap
      assert((101 to 110).forall(i => probs(i.toLong) > 0.5) &&
        (201 to 210).forall(i => probs(i.toLong) < 0.5),
        s"distributed model lost separation: $probs")
      // bit-determinism across partition layouts: every distributed
      // sum is an exact integer in decimal(38,0)
      val dist2 = QualityModel.trainDistributed(labeled.repartition(13),
        "doc_id", "text", "label", dim = 64, scope = scope)
      assert(dist.bias == dist2.bias &&
        dist.weights.toSeq == dist2.weights.toSeq,
        "distributed training diverged across partitionings")
      // the probe the bounded trainer fails: past maxSample the driver
      // path refuses while the distributed path trains the same data
      intercept[IllegalArgumentException] {
        QualityModel.train(labeled, "doc_id", "text", "label", dim = 64,
          maxSample = 10, scope = scope)
      }
      val uncapped = QualityModel.trainDistributed(labeled, "doc_id",
        "text", "label", dim = 64, scope = scope)
      assert(uncapped.weights.length == 64)
      // a non-integral id would cast to null in the internal joins and
      // silently train a bias-only model — fail fast instead
      // (round-15 review finding)
      val strId = intercept[IllegalArgumentException] {
        QualityModel.trainDistributed(
          labeled.withColumn("doc_id", concat(lit("d"), col("doc_id"))),
          "doc_id", "text", "label", dim = 64, scope = scope)
      }
      assert(strId.getMessage.contains("integral id"), strId.getMessage)
    } finally scope.release()
  }

  test("trainDistributed cachePairs=false recompute path is bit-identical to the cached pairs path") {
    // round 16 — verdict task 4: the persisted pair-products frame is
    // the trainer's memory ceiling at DCLM label counts; the
    // recompute path must trade it for per-round CPU WITHOUT changing
    // a single bit of the fit (both orders sum the same exact
    // integers in decimal(38,0))
    val scope = new Dedup.CacheScope
    try {
      val labeled = ((1 to 30).map(i => (i.toLong, goodDoc(i), 1)) ++
        (31 to 60).map(i => (i.toLong, badDoc(i), 0)))
        .toDF("doc_id", "text", "label").localCheckpoint()
      val cached = QualityModel.trainDistributed(labeled, "doc_id",
        "text", "label", dim = 64, cachePairs = true, scope = scope)
      val recomputed = QualityModel.trainDistributed(labeled, "doc_id",
        "text", "label", dim = 64, cachePairs = false, scope = scope)
      assert(java.lang.Double.doubleToLongBits(cached.bias) ==
        java.lang.Double.doubleToLongBits(recomputed.bias))
      assert(java.util.Arrays.equals(
        cached.weights.map(java.lang.Double.doubleToLongBits),
        recomputed.weights.map(java.lang.Double.doubleToLongBits)),
        "recompute path drifted from the cached pairs path")
      // and it stays bit-deterministic across partition layouts
      val recomputed2 = QualityModel.trainDistributed(
        labeled.repartition(13), "doc_id", "text", "label", dim = 64,
        cachePairs = false, scope = scope)
      assert(java.util.Arrays.equals(
        recomputed.weights.map(java.lang.Double.doubleToLongBits),
        recomputed2.weights.map(java.lang.Double.doubleToLongBits)),
        "recompute path diverged across partitionings")
    } finally scope.release()
  }

  test("quality trainer fails fast on bad labels and oversized samples") {
    val scope = new Dedup.CacheScope
    try {
      intercept[IllegalArgumentException] {
        QualityModel.train(
          Seq((1L, "a b c", 2)).toDF("doc_id", "text", "label"),
          "doc_id", "text", "label", dim = 16, scope = scope)
      }
      intercept[IllegalArgumentException] {
        QualityModel.train(
          Seq((1L, "a b c", 1), (2L, "d e f", 0))
            .toDF("doc_id", "text", "label"),
          "doc_id", "text", "label", dim = 16, maxSample = 1,
          scope = scope)
      }
    } finally scope.release()
  }

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
