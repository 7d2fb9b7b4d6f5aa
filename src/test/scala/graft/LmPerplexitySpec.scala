package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Bigram-LM perplexity (t29, the CCNet-style filter): hand-computed
  * tiny model, partition-order independence of the micro-nat sums,
  * separation on planted in-domain vs out-of-domain docs, and the
  * measured quantization-boundary margin that backs the cross-engine
  * ln stance.
  */
class LmPerplexitySpec extends SparkSpec {
  import spark.implicits._

  private def lmOf(train: Seq[String]) =
    TextAnalysis.bigramLmTrain(
      train.zipWithIndex.map(_.swap).toDF("doc_id", "text"), "text")

  test("hand-computed bigram probabilities on a two-doc corpus") {
    // train: "a b a" and "a b" →
    //   bigrams: (<s>,a)x2 (a,b)x2 (b,a)x1 ; contexts: <s>:2 a:2 b:1
    //   vocab V = 2 (types a, b)
    val lm = lmOf(Seq("a b a", "a b"))
    val bi = lm.bigrams.collect().map(r =>
      (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(bi == Map(("<s>", "a") -> 2L, ("a", "b") -> 2L, ("b", "a") -> 1L))
    val ctx = lm.contexts.collect().map(r =>
      r.getString(0) -> r.getLong(1)).toMap
    assert(ctx == Map("<s>" -> 2L, "a" -> 2L, "b" -> 1L))
    assert(lm.vocab.head().getLong(0) == 2L)

    // score "a b": p(a|<s>) = (2+1)/(2+2) = 0.75 ; p(b|a) = (2+1)/(2+2)
    //   lp_micro = 2·round(ln 0.75 · 1e6) = 2·(-287682) = -575364
    val out = TextAnalysis.bigramLmPerplexity(
      lm, Seq((0L, "a b")).toDF("doc_id", "text"), "doc_id", "text").head()
    assert(out.getLong(1) == 2L, "n_tokens")
    assert(out.getLong(2) == 2L * math.round(java.lang.StrictMath.log(0.75) * 1e6))
    // unseen bigram from a seen context: p(a|a) = (0+1)/(2+2) = 0.25;
    // "z z": p(z|<s>) = (0+1)/(2+2) = 0.25 (seen context <s>), then
    // the unseen-context floor p(z|z) = (0+1)/(0+2) = 1/V = 0.5
    val out2 = TextAnalysis.bigramLmPerplexity(
      lm, Seq((0L, "a a"), (1L, "z z")).toDF("doc_id", "text"),
      "doc_id", "text").orderBy("doc_id").collect()
    assert(out2(0).getLong(2) ==
      math.round(java.lang.StrictMath.log(0.75) * 1e6) + math.round(java.lang.StrictMath.log(0.25) * 1e6))
    assert(out2(1).getLong(2) ==
      math.round(java.lang.StrictMath.log(0.25) * 1e6) + math.round(java.lang.StrictMath.log(0.5) * 1e6))
  }

  test("zero-token docs yield no row; every tokenized doc scores") {
    val lm = lmOf(Seq("a b"))
    val docs = Seq((0L, "a b"), (1L, "   "), (2L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmPerplexity(lm, docs, "doc_id", "text")
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(0L))
  }

  test("lp_micro is partition-order independent") {
    val docs = Tables.load(spark, sfDir, "documents")
    val lm = TextAnalysis.bigramLmTrain(
      docs.where(col("doc_id") % 10 =!= 0), "text")
    val a = TextAnalysis.bigramLmPerplexity(lm, docs, "doc_id", "text")
      .select("doc_id", "n_tokens", "lp_micro")
    val b = TextAnalysis.bigramLmPerplexity(
        lm, docs.repartition(17, col("doc_id")), "doc_id", "text")
      .select("doc_id", "n_tokens", "lp_micro")
    assertSameRows(a, b)
  }

  test("planted out-of-domain docs land in the high-perplexity tail") {
    val docs = Tables.load(spark, sfDir, "documents")
    val lm = TextAnalysis.bigramLmTrain(docs, "text")
    val planted = Seq(
      (9000001L, "zzq qxv wkj pluv vrrm qxv zzq wkj pluv vrrm"),
      (9000002L, "xj kq vv zp wq mx jj qq kk pp")
    ).toDF("doc_id", "text")
    val scored = TextAnalysis.bigramLmPerplexity(
      lm, docs.select("doc_id", "text").unionByName(planted),
      "doc_id", "text")
    val ranked = scored.orderBy(col("ppl").desc)
      .select("doc_id").as[Long].take(2).toSet
    assert(ranked == Set(9000001L, 9000002L),
      "the two planted word-soup docs must be the 2 highest-perplexity docs")
  }

  test("quantization-boundary margin on the real corpus is >> 1 ulp") {
    // The cross-engine stance: Spark's StrictMath.log and DuckDB's
    // libm ln may differ by 1 ulp, which flips round(ln p · 1e6) only when the
    // product sits within ~1e-9 of a half-integer boundary. Measure
    // the minimum distance over every distinct probability the sf0.001
    // corpus produces — the margin backing t29's oracle gate.
    val docs = Tables.load(spark, sfDir, "documents")
    val lm = TextAnalysis.bigramLmTrain(
      docs.where(col("doc_id") % 10 =!= 0), "text")
    // every distinct (c_bi, c_ctx) combination the SCORING path can
    // hit: seen bigrams, unseen bigram under a seen context
    // (c_bi = 0), and the unseen-context floor 1/V — the exact
    // probability set t29's oracle quantizes
    val seen = lm.bigrams.join(lm.contexts, "prev")
      .select(col("c_bi"), col("c_ctx"))
    val unseenBigram = lm.contexts.select(lit(0L).as("c_bi"), col("c_ctx"))
    val unseenCtx = seen.limit(1).select(lit(0L).as("c_bi"), lit(0L).as("c_ctx"))
    val margins = seen.unionByName(unseenBigram).unionByName(unseenCtx)
      .distinct()
      .crossJoin(broadcast(lm.vocab))
      .select(((col("c_bi") + lit(1L)).cast("double") /
        (col("c_ctx") + col("v")).cast("double")).as("p"))
      .select((log(col("p")) * lit(1e6) + lit(0.5)).as("x"))
      // distance to the nearest INTEGER boundary of floor(x):
      // min(frac, 1 − frac) = 0.5 − |frac − 0.5|
      .select((lit(0.5) -
        abs(col("x") - floor(col("x")) - lit(0.5))).as("m"))
      .agg(min("m")).head().getDouble(0)
    assert(margins > 1e-4,
      s"min distance to a rounding boundary was $margins — too close " +
        "for the 1-ulp cross-engine ln band")
  }
}
