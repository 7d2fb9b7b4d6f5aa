package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, QualityModel}

/** Distributed quality-trainer scale probe (round 15 — the §4
  * "measured, not argued" convention applied to the round's own
  * trainer): replicate a planted good/bad labeled set to several
  * label counts and measure `trainDistributed` wall time, expecting
  * ~linear growth (every per-round job is one aggregation over the
  * cached feature/pair frames; the pair self-join runs once). At the
  * largest size the fit re-runs under a different partition layout
  * and must reproduce every weight BIT-identically (the decimal
  * order-free-sum claim at probe scale, not just the spec fixture),
  * and the driver-side `train` is run alongside at the smallest size
  * for a reference point plus its maxSample fail-fast at the largest.
  *
  * Run: SPARK_GRAFT_CPUS=16 sbt "runMain graft.QualityTrainScaleProbe 1 10 40"
  */
object QualityTrainScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val reps: Seq[Int] =
      if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 10, 40)
    val dim = sys.env.get("SPARK_GRAFT_QT_DIM").map(_.toInt).getOrElse(64)
    val iters = sys.env.get("SPARK_GRAFT_QT_ITERS").map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // the FeaturizeSpec planted corpus, mildly salted (97 variants —
    // per-doc-UNIQUE salts would carry df=1 and idf ~ N, a
    // class-free noise term orders of magnitude over the class
    // vocabulary's idf ~ 2 that drowns any linear signal; real label
    // sets don't consist of single-occurrence vocabularies either)
    def goodDoc(i: Long): String =
      s"the quick study of language model training data shows that " +
        s"careful curation improves results across benchmark b${i % 97} " +
        s"and downstream evaluation with diverse well formed sentences"
    def badDoc(i: Long): String =
      s"click here buy now n${i % 97} free free free offer offer " +
        "win win win cash prize " + ("spam " * 12).trim
    def labeled(rep: Int) = spark.range(rep.toLong * 2000)
      .select(col("id").as("doc_id"),
        when(col("id") % 2 === 0, lit(1)).otherwise(lit(0)).as("label"))
      .select(col("doc_id"), col("label"))
      .as[(Long, Int)]
      .map { case (i, y) => (i, if (y == 1) goodDoc(i) else badDoc(i), y) }
      .toDF("doc_id", "text", "label")
      .localCheckpoint()

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    println("rep,n_labels,train_sec,recompute_sec,pairs_rows,sparse_rows,bitwise_equal,deterministic,good_rate,bad_rate")
    reps.foreach { rep =>
      val df = labeled(rep)
      val n = df.count()
      val scope = new Dedup.CacheScope
      try {
        val (m1, t) = time {
          QualityModel.trainDistributed(df, "doc_id", "text", "label",
            dim = dim, iters = iters, cachePairs = true, scope = scope)
        }
        // the round-16 trade measured (verdict task 4): the cached
        // path persists the pair-products frame for the whole run —
        // its row count IS the trainer's memory ceiling — while the
        // recompute path (the default) holds only the sparse feature
        // frame and must reproduce the fit bit-for-bit
        val (mr, tr) = time {
          QualityModel.trainDistributed(df, "doc_id", "text", "label",
            dim = dim, iters = iters, cachePairs = false, scope = scope)
        }
        val bitEq = m1.bias == mr.bias &&
          java.util.Arrays.equals(
            m1.weights.map(java.lang.Double.doubleToLongBits),
            mr.weights.map(java.lang.Double.doubleToLongBits))
        val sparseRows = graft.operators.Featurize
          .hashedTfIdfSparse(df, "doc_id", "text", dim, scope).count()
        val pairRows = { // what cachePairs = true persists
          val s = graft.operators.Featurize
            .hashedTfIdfSparse(df, "doc_id", "text", dim, scope)
            .select(col("_fh_id"), col("_fh_b"))
          s.toDF("i", "j").join(s.toDF("i", "k"), Seq("i"))
            .where(col("j") <= col("k")).count()
        }
        // bit-determinism across partition layouts, at probe scale
        val m2 = QualityModel.trainDistributed(df.repartition(7),
          "doc_id", "text", "label", dim = dim, iters = iters,
          scope = scope)
        val det = m1.bias == m2.bias &&
          java.util.Arrays.equals(
            m1.weights.map(java.lang.Double.doubleToLongBits),
            m2.weights.map(java.lang.Double.doubleToLongBits))
        // the model it ships must separate the planted classes
        val probs = QualityModel.score(
            df.select("doc_id", "text"), "doc_id", "text", m1,
            scope = scope)
          .join(df.select("doc_id", "label"), "doc_id")
          .select(col("label"),
            (col("quality_prob") > 0.5).cast("int").as("pred"))
          .groupBy("label").agg(avg("pred").as("p")).collect()
          .map(r => r.getInt(0) -> r.getDouble(1)).toMap
        println(f"$rep,$n,$t%.2f,$tr%.2f,$pairRows,$sparseRows," +
          f"$bitEq,$det,${probs(1)}%.4f,${probs(0)}%.4f")
      } finally scope.release()
    }
    // the bounded driver trainer refuses what the distributed one
    // trains (the verdict-2 probe, at probe scale)
    val big = labeled(reps.max)
    val refused =
      try { QualityModel.train(big, "doc_id", "text", "label",
        dim = dim, maxSample = 1000); false }
      catch { case _: IllegalArgumentException => true }
    println(s"driver_train_refuses_at_${big.count()}_labels,$refused")
    spark.stop()
  }
}
