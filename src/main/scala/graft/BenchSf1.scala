package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Dedup

/** BENCH_SF1 (round 17 — r16 missing item 4): the bench's top-20
  * queries by sf0.1 cost, re-timed at a synthetic sf1.0 (every table
  * replicated 10× by [[SfSynth]], key-consistent), so the per-query
  * SCALING EXPONENT is measured instead of argued. The committed
  * artifact (BENCH_SF1.json) carries, per query, the sf0.1 and sf1.0
  * wall times and their ratio; the reading guide —
  *
  *  - corpus-linear plans should land near 10× MINUS the per-job
  *    constants that dominate second-scale sf0.1 readings (so
  *    healthy ratios sit well under 10);
  *  - capped/bounded plans (d17's 200-row truth harness) should stay
  *    FLAT;
  *  - anything materially ABOVE ~10× is super-linear at the design
  *    point and gets the c03/d17 treatment (round 16 caught exactly
  *    two such defects with this instrument).
  *
  * Queries run through the SAME `SparkEntry.queries` bodies the
  * bench times, with the bench's noop-sink semantics (every
  * projected column computed). Default entry set = the top 20 by
  * r16 sf0.1 cost; override with args.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.BenchSf1"
  */
object BenchSf1 {
  /** Top-20 by sf0.1 cost in the round-16 artifact (BENCH_r16). */
  val defaultEntries: Seq[String] = Seq(
    "c10_pipeline_capstone", "c01_curate", "c03_contamination_report",
    "d17_lsh_tuning_eval", "c09_quality_score", "t29_lm_perplexity",
    "d06_dup_clusters", "c05_topic_clusters", "q46_grouping_sets",
    "d08_quality_survivor", "d13_substring_dedup", "d16_multimodal_dedup",
    "s21_rrf_fusion", "c08_dup_matrix", "s11_knn_pq_batch",
    "d02_dedup_minhash", "g01_sqlgen_roundtrip", "q43_bloom_join",
    "s18_pq_recall", "d07_decontaminate")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rep = sys.env.get("SPARK_GRAFT_SF_REP").map(_.toInt).getOrElse(10)
    val entries = if (args.nonEmpty) args.toSeq else defaultEntries
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val unknown = entries.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")

    // reuse an existing synth dir across runs when provided (the
    // synthesis is deterministic), else build one
    val synthDir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", {
      val d = java.nio.file.Files.createTempDirectory("graft-sf1").toString
      SfSynth.synthesize(spark, sfDir, d, rep)
      d
    })
    if (sys.env.contains("SPARK_GRAFT_SF1_DIR") &&
        !new java.io.File(s"$synthDir/documents.parquet").exists)
      SfSynth.synthesize(spark, sfDir, synthDir, rep)
    val n0 = Tables.load(spark, sfDir, "documents").count()
    val n1 = Tables.load(spark, synthDir, "documents").count()
    System.err.println(s"[bench-sf1] sf0.1 docs=$n0, synthetic docs=$n1 " +
      s"at $synthDir")

    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      finally Dedup.unpersistAll()
      (System.nanoTime() - t0) / 1e9
    }

    println("entry,sf01_sec,sf10_sec,ratio")
    val results = entries.map { e =>
      time(e, sfDir) // untimed warm-up: JIT/codegen/footer warmth
      val t1 = time(e, sfDir)
      val t10 = time(e, synthDir)
      println(f"$e,$t1%.2f,$t10%.2f,${t10 / t1}%.2f")
      (e, t1, t10)
    }
    val entriesJson = results.map { case (e, t1, t10) =>
      s""""$e":{"sf01":$t1,"sf10":$t10,"ratio":${t10 / t1}}"""
    }.mkString("{", ",", "}")
    val full = s"""{"metric":"bench_sf1","rep":$rep,"cpus":$cpus,""" +
      s""""sf_base":"$sfDir","entries":$entriesJson}"""
    println(full)
    val outName = sys.env.getOrElse("SPARK_GRAFT_SF1_OUT", "BENCH_SF1.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outName),
      full.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: java.io.IOException =>
      System.err.println(s"[bench-sf1] could not write $outName: $e")
    }
    spark.stop()
  }
}
