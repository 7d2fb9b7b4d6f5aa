package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Scale probe for the unigram-LM trainer (t34's trainer,
  * `TextAnalysis.unigramTrain`) — the round-11 §4 row.
  *
  * The trainer's scale contract has two axes, probed separately:
  *
  *  - CORPUS axis (vocab held flat): the corpus is touched once, by
  *    the word-frequency groupBy; every later stage (substring seed,
  *    each EM step, the prune) rides the DISTINCT-word table. So
  *    replicating the corpus N× with the same vocabulary must scale
  *    well under N× — the EM loop's cost does not move at all.
  *  - VOCAB axis (corpus word mass held flat): salting each word with
  *    doc_id % K multiplies word TYPES by K at constant corpus size.
  *    EM forward–backward runs once per distinct word and the seed
  *    substring aggregate grows with types, so ~linear in K is the
  *    correct null hypothesis here — a blow-up would mean per-word
  *    work leaked into a corpus-sized stage.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.UnigramScaleProbe [corpusFactor] [vocabFactor]"
  * (defaults 10 10)
  */
object UnigramScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val cFactor = if (args.length > 0) args(0).toInt else 10
    val vFactor = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")

    def rep(n: Int): DataFrame =
      (0 until n).map { i =>
        docs.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          col("text"))
      }.reduce(_ unionByName _)

    /** Word-type salt: every word gets a per-doc suffix drawn from K
      * classes, so distinct words multiply by (up to) K while the
      * corpus word mass is unchanged.
      */
    def salt(d: DataFrame, k: Int): DataFrame =
      d.select(col("doc_id"),
        regexp_replace(col("text"), lit("(\\S+)"),
          concat(lit("$1k"), (col("doc_id") % k).cast("string"))).as("text"))

    def run(d: DataFrame, vocabSize: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val table = TextAnalysis.unigramTrain(d, "text", vocabSize = vocabSize,
        emIters = 2, seedSize = 2048, maxPieceLen = 4)
      val n = table.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }

    // ---- corpus axis: same 31-type vocabulary, corpus ×cFactor ----
    run(docs, 40) // warm-up: JIT + codegen, untimed
    val (tc1, n1) = run(rep(1), 40)
    val (tcN, nN) = run(rep(cFactor), 40)
    val cRatio = tcN / math.max(tc1, 1e-9)
    println(f"[probe-unigram] corpus 1x:  $tc1%6.2f s ($n1 pieces)")
    println(f"[probe-unigram] corpus ${cFactor}x: $tcN%6.2f s ($nN pieces)")
    // the corpus-axis CONTRACT is ~flat (the EM loop must not touch
    // the corpus at all), so the budget is a small constant over the
    // base — NOT linear-times-headroom, which would wave through the
    // exact corpus-mass leak this axis exists to catch
    println(f"[probe-unigram] corpus-axis ratio $cRatio%.2f " +
      s"(flat budget 3.0); verdict: " +
      (if (tcN <= 3.0 * math.max(tc1, 1.0)) "FLAT-OK"
       else "OVER-BUDGET"))

    // ---- vocab axis: constant corpus, word types ×vFactor. The
    // TARGET vocab stays fixed so both runs walk the same number of
    // shrink rounds and the ratio isolates per-round EM cost, which
    // rides the distinct-word count ----
    val k1 = 20
    val (tv1, v1) = run(salt(docs, k1), 500)
    val (tvN, vN) = run(salt(docs, k1 * vFactor), 500)
    val vRatio = tvN / math.max(tv1, 1e-9)
    println(f"[probe-unigram] vocab ${k1}-salt:  $tv1%6.2f s ($v1 pieces)")
    println(f"[probe-unigram] vocab ${k1 * vFactor}-salt: $tvN%6.2f s ($vN pieces)")
    println(f"[probe-unigram] vocab-axis ratio $vRatio%.2f " +
      s"(linear budget $vFactor.0); verdict: " +
      (if (tvN <= 1.5 * vFactor * math.max(tv1, 1.0)) "LINEAR-OK"
       else "OVER-BUDGET"))
    spark.stop()
  }
}
