package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** 10× scale probe for the bigram-LM family (t29) — the one round-7
  * shuffle shape the other probes don't cover: corpus-sized bigram
  * explodes joined against vocabulary-bounded count tables.
  *
  * Replication salts each copy with its own interleaved `zq<i>`
  * token, so the BIGRAM TABLE grows linearly with copies too (each
  * copy's (word, zq_i)/(zq_i, word') bigrams are distinct): both the
  * corpus-sized side and the count-table build side scale, which is
  * the actual 100 TB shape (a bigger crawl has a bigger vocabulary).
  * Per-key group sizes stay constant — linear scaling is the correct
  * null hypothesis, and a blow-up would be a real plan bug (an
  * accidental cross join, a count table that stopped pruning).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.LmScaleProbe [factor]"     (default 10)
  */
object LmScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val factor = if (args.nonEmpty) args(0).toInt else 10
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
        docs.select(
          (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          regexp_replace(col("text"), " ", s" zq$i ").as("text"))
      }.reduce(_ unionByName _)

    /** Train on the %10≠0 split, score everything, force the full
      * result; returns (seconds, scored rows, bigram-table size).
      */
    def run(d: DataFrame): (Double, Long, Long) = {
      val scope = new Dedup.CacheScope
      try {
        val t0 = System.nanoTime()
        val lm = TextAnalysis.bigramLmTrain(
          d.where(col("doc_id") % 10 =!= 0), "text", scope)
        val scored = TextAnalysis.bigramLmPerplexity(lm, d, "doc_id", "text")
        val n = scored.count()
        val secs = (System.nanoTime() - t0) / 1e9
        (secs, n, lm.bigrams.count())
      } finally scope.release()
    }

    run(rep(1)) // warm-up: JIT + codegen + footer caches, untimed
    val (tBase, nBase, vBase) = run(rep(1))
    val (tX, nX, vX) = run(rep(factor))
    val ratio = tX / math.max(tBase, 1e-9)
    // budget: linear (factor×) on a per-query floor absorbing constant
    // overhead, plus the bench's documented 1.5 ambient headroom
    val budget = 1.5 * factor * math.max(tBase, 1.0)
    println(f"[probe-lm] base:  $tBase%6.2f s, $nBase rows, $vBase bigram types")
    println(f"[probe-lm] ${factor}x:   $tX%6.2f s, $nX rows, $vX bigram types")
    println(f"[probe-lm] ratio ${ratio}%.2f (budget ${budget / math.max(tBase, 1.0)}%.1f); " +
      s"verdict: ${if (tX <= budget) "LINEAR-OK" else "OVER-BUDGET"}")
    spark.stop()
  }
}
