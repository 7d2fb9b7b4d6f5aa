package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.operators.Dedup

/** Property-style checks for the codegen kernels: generated inputs —
  * unicode, degenerate whitespace, empty strings, adversarial
  * duplicates — instead of only the corpus. Uses scalacheck
  * generators sampled into Spark rows (a full forAll-per-row round
  * trip through a SparkSession would be quadratically slow; one batch
  * of 200 generated docs exercises the same space).
  */
class KernelPropertySpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  private val wordGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.oneOf("的", "是", "naïve", "Ω", "🦆🦆", "a-b.c", "x'y\"z", ""),
    Gen.listOfN(3, Gen.choose('!', '~')).map(_.mkString))

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 12)
    ws <- Gen.listOfN(n, wordGen)
    // exotic separators pin the tokenizer contract: U+2028/U+00A0 are
    // NOT Java-\s whitespace (they must stay part of words in kernel
    // and HOF alike),  IS
    sep <- Gen.oneOf(" ", "  ", "\t", "\n", " \t ", "\u000B",
      " \u2028 ", " \u00A0 ")
  } yield ws.mkString(sep)

  private lazy val docs = {
    val seed = org.scalacheck.rng.Seed(42L)
    val texts = Iterator.iterate(seed)(_.next)
      .map(s => textGen.pureApply(Gen.Parameters.default, s))
      .take(200).toSeq
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .cache()
  }

  test("mat_vec kernel equals the per-row dot composition bit-for-bit and survives codegen") {
    import graft.functions.VectorOps
    // random rectangular matrices over random float vectors: the
    // kernel must reproduce the array-of-DotProducts form EXACTLY
    // (identical left-to-right accumulation), which is what makes the
    // rotateExpr swap hash-invisible to the s19 oracle
    val rnd = new scala.util.Random(11L)
    val dim = 24; val rows = 16
    val mat = Array.fill(rows, dim)(rnd.nextGaussian())
    val vecs = (0L until 60L).map(i =>
      (i, Array.fill(dim)(rnd.nextGaussian().toFloat))).toDF("id", "v")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val a = vecs.select($"id",
        VectorOps.matVec($"v", mat.flatten, rows).as("y"))
      val b = vecs.select($"id", org.apache.spark.sql.functions.array(
        mat.toIndexedSeq.map(row =>
          VectorOps.dot($"v", org.apache.spark.sql.functions.typedlit(
            row.toSeq))): _*).as("y"))
      val ga = a.as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
      val gb = b.as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
      assert(ga == gb, "mat_vec diverged from the per-row dot oracle")
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
    // dimension mismatch fails fast, never truncates
    intercept[Exception] {
      vecs.select(VectorOps.matVec($"v", mat.flatten, rows + 1)).collect()
    }
  }

  test("minhash kernel equals the composed-builtin family on generated texts") {
    val base = docs.select($"doc_id", Dedup.shingleHashes($"text", 3).as("sh"))
    val a = base.select($"doc_id",
      graft.functions.SketchOps.minhashSig($"sh", 64).as("sig"))
    val b = base.select($"doc_id", Dedup.minhashSignatureHof($"sh", 64).as("sig"))
    assertSameRows(a, b)
  }

  test("simhash kernel equals the composed-builtin votes on generated texts") {
    val base = docs.select($"doc_id", Dedup.simhashFeatures($"text").as("f"))
    val a = base.select($"doc_id", graft.functions.SketchOps.simhash64($"f"))
    val b = base.select($"doc_id", Dedup.simhashFromFeaturesHof($"f"))
    assertSameRows(a, b)
  }

  test("shingle-hash cardinalities equal the HOF shingle pipeline on generated texts") {
    // different hash families — the SET SIZES must agree (that is what
    // jaccard consumes), including whitespace-only and empty texts
    val a = docs.select($"doc_id", size(Dedup.shingleHashes($"text", 3)).as("n"))
    val b = docs.select($"doc_id", size(Dedup.shingleHashesHof($"text", 3)).as("n"))
    assertSameRows(a, b)
  }

  test("sorted_jaccard equals the array_intersect/array_union builtin on generated texts and edges") {
    import graft.functions.TextKernelOps
    // the kernel replaces the builtin in EVERY verify pass (r20
    // optimization) — pin exact value equivalence on both hash
    // families it serves, with codegen fallback disabled so the
    // generated code path is the one under test
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val sh = docs.select($"doc_id", Dedup.shingleHashes($"text", 3).as("sh"),
        TextKernelOps.charNgramHashes($"text", 3).as("gr"))
      val pairs = sh.toDF("id_a", "sh_a", "gr_a")
        .crossJoin(sh.toDF("id_b", "sh_b", "gr_b"))
        .where($"id_a" < $"id_b")
      val a = pairs.select($"id_a", $"id_b",
        TextKernelOps.sortedJaccard($"sh_a", $"sh_b").as("j1"),
        TextKernelOps.sortedJaccard($"gr_a", $"gr_b").as("j2"))
      val b = pairs.select($"id_a", $"id_b",
        (size(array_intersect($"sh_a", $"sh_b")).cast("double") /
         size(array_union($"sh_a", $"sh_b"))).as("j1"),
        (size(array_intersect($"gr_a", $"gr_b")).cast("double") /
         size(array_union($"gr_a", $"gr_b"))).as("j2"))
      assertSameRows(a, b)
      // edges the corpus can't produce: one-empty → 0.0 like the
      // builtin; negatives keep the signed sort order. Both-empty is
      // asserted separately against NULL — under ANSI (the session
      // default) the BUILTIN's 0/0 division throws, so it cannot be
      // the reference there; the sorted-distinct kernels never emit
      // empty arrays, so the case is unreachable from any query path
      val edge = Seq(
        (1L, Seq.empty[Long], Seq(1L, 2L)),
        (2L, Seq.empty[Long], Seq.empty[Long]),
        (3L, Seq(-5L, 0L, 7L), Seq(-5L, 7L, 9L)),
        (4L, Seq(Long.MinValue, Long.MaxValue), Seq(Long.MinValue))).toDF("id", "x", "y")
      val ea = edge.select($"id", TextKernelOps.sortedJaccard($"x", $"y").as("j"))
      val eb = edge.where($"id" =!= 2L).select($"id",
        (size(array_intersect($"x", $"y")).cast("double") /
         size(array_union($"x", $"y"))).as("j"))
      assertSameRows(ea.where($"id" =!= 2L), eb)
      assert(ea.where($"id" === 2L).head().isNullAt(1),
        "both-empty must be NULL (a 0/0 Jaccard has no value)")
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("fingerprint and split labels are partition-independent") {
    val wide = docs.repartition(13)
    val narrow = docs.coalesce(1)
    def fp(df: org.apache.spark.sql.DataFrame) = df.select($"doc_id",
      graft.operators.TextAnalysis.fingerprint64($"text").as("fp"),
      graft.operators.TextAnalysis.splitLabel($"doc_id",
        Seq("train" -> 900, "val" -> 50, "test" -> 50)).as("split"))
    assertSameRows(fp(wide), fp(narrow))
  }

  test("topk aggregate equals window ranking on generated skewed data") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(500) { i =>
      // heavy ties: ord drawn from only 5 distinct values
      (rnd.nextInt(8).toLong, rnd.nextInt(5).toDouble, i.toLong)
    }
    val df = rows.toDF("g", "ord", "id")
    val viaAgg = df.groupBy("g")
      .agg(graft.functions.TopK.topk($"ord", $"id", 4).as("top"))
      .select($"g", explode($"top").as("e"))
      .select($"g", $"e.id", $"e.ord")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("g").orderBy($"ord".desc, $"id".asc)
    val viaWindow = df
      .select($"g", $"id", $"ord", row_number().over(w).as("rn"))
      .where($"rn" <= 4).select($"g", $"id", $"ord")
    assertSameRows(viaAgg, viaWindow)
  }
}
