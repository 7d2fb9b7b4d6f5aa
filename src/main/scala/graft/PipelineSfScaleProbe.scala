package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** sf1.0 scale check of the bench's five heaviest entries (round 16 —
  * verdict task 6): every bench pin is sf0.1; this probe materializes
  * a 10× corpus ("sf1.0") and runs c10/c01/c03/d17/c09 through the
  * SAME `SparkEntry.queries` bodies the bench times, at sf0.1 and at
  * the synthetic sf1.0.
  *
  * Replication shape — a per-copy deterministic WORD SHUFFLE (each
  * copy's words sort by xxhash64(word, copy)): the token MULTISET is
  * invariant, so every multiset-derived metric (quality score,
  * dup-word fraction, stopword hits, token counts) scores each copy
  * exactly like its original and the curation filters pass 10× the
  * mass — where salting with injected tokens (the first draft) blew
  * dupWordFrac past the c01/c10 cutoff and quietly shrank every
  * downstream stage back to sf0.1. Word ORDER differs per copy, so
  * 3-token shingle sets decorrelate across copies: exact dedup keeps
  * all copies (distinct texts) and near-dup candidate mass stays
  * that of fresh data.
  *
  * Expected shape: ~10× wall for the corpus-linear plans
  * (c01/c03/c09/c10 — every stage is one exchange over the corpus)
  * MINUS the per-job constants that dominate sub-second sf0.1
  * readings, and ~FLAT for d17 (its eval pool is capped at 200 rows
  * by a cross-engine hash order, the round-15 fix this probe
  * validates one order of magnitude up). The id shift is a multiple
  * of 40 so every doc_id-modulus plant (eval splits at %10, edit
  * plants at %20/%40) keeps its density.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.PipelineSfScaleProbe"
  */
object PipelineSfScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rep = sys.env.get("SPARK_GRAFT_SF_REP").map(_.toInt).getOrElse(10)
    val entries: Seq[String] =
      if (args.nonEmpty) args.toSeq
      else Seq("c01_curate", "c03_contamination_report",
        "c09_quality_score", "c10_pipeline_capstone",
        "d17_lsh_tuning_eval")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // synthetic sf1.0: documents replicated rep× — copy i shifts ids
    // by i·10⁸ (a multiple of 40, modulus-plant-preserving) and
    // WORD-SHUFFLES its text per the scaladoc's multiset-invariant
    // argument (copy 0 shuffles too, so all copies are statistically
    // alike)
    val synthDir = java.nio.file.Files
      .createTempDirectory("graft-sf1").toString
    val docs = Tables.load(spark, sfDir, "documents")
    val n0 = docs.count()
    // SPARK_GRAFT_SF_SHAPE=zipf (round 19 — r18 verdict task 7):
    // generate BOTH scales from the Zipf-real vocabulary instead of
    // replicating the 31-word synthetic corpus, so the ratio
    // measures the operator on realistic posting lists — the small
    // scale is regenerated too (same law, 1× mass) and swapped in as
    // the baseline dir
    val shape = sys.env.getOrElse("SPARK_GRAFT_SF_SHAPE", "replicate")
    val baseDir =
      if (shape == "zipf") {
        val d = java.nio.file.Files
          .createTempDirectory("graft-sf01z").toString
        SfSynth.zipfDocuments(spark, n0)
          .write.mode("overwrite").parquet(s"$d/documents.parquet")
        d
      } else sfDir
    (if (shape == "zipf") SfSynth.zipfDocuments(spark, n0 * rep)
     else SfSynth.replicateDocuments(docs, rep))
      .write.mode("overwrite").parquet(s"$synthDir/documents.parquet")
    println(s"shape=$shape sf0.1 docs=$n0, synthetic " +
      s"${rep}x docs=${n0 * rep} at $synthDir")

    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      Dedup.unpersistAll()
      (System.nanoTime() - t0) / 1e9
    }

    println("entry,sf01_sec,sf10_sec,ratio")
    entries.foreach { e =>
      time(e, baseDir) // untimed warm-up: JIT/codegen/footer warmth
      val t1 = time(e, baseDir)
      val t10 = time(e, synthDir)
      println(f"$e,$t1%.2f,$t10%.2f,${t10 / t1}%.2f")
    }
    spark.stop()
  }
}
