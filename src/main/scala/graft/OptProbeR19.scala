package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 optimization probe: phase-level wall-clock breakdown of
  * the multi-job bench entries (c11's store+stream chain, s25's
  * index build+walk) — the per-phase timers the single JSON bench
  * line cannot show. Measurement harness only; mirrors the query
  * bodies without changing them.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.OptProbeR19 c11"
  */
object OptProbeR19 {
  private def t[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(n => Tables.load(spark, dir, n).count())
    val what = if (args.isEmpty) Set("c11") else args.toSet
    if (what("jobs")) {
      // per-Spark-job wall time with call sites — attributes a
      // multi-job phase's cost to the exact actions inside it
      val lock = new Object
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val starts =
            scala.collection.mutable.Map[Int, (Long, String)]()
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            lock.synchronized {
              starts(j.jobId) = (System.nanoTime(),
                Option(j.properties.getProperty("callSite.short"))
                  .filter(_.nonEmpty)
                  .orElse(Option(
                    j.properties.getProperty("spark.job.description")))
                  .orElse(Option(j.properties.getProperty(
                    "spark.sql.execution.root.id")).map("sqlRoot=" + _))
                  .getOrElse("?"))
            }
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
            lock.synchronized {
              starts.remove(j.jobId).foreach { case (t0, site) =>
                println(f"[job] ${(System.nanoTime() - t0) / 1e9}%7.3f s  " +
                  f"job=${j.jobId}%-4d $site")
              }
            }
        })
    }
    if (what("c11")) probeC11(spark, dir)
    if (what("s25")) probeS25(spark, dir)
    if (what("c10legs")) probeC10Legs(spark, dir)
    // any bench query name: run it 3x in one JVM — the first pass
    // carries the one-time cost (analysis + codegen compile), the
    // later passes are the marginal execution cost; the gap tells
    // which side to optimize
    args.filter(SparkEntry.queries.contains).foreach { name =>
      (1 to 3).foreach { i =>
        t(s"$name run$i") {
          SparkEntry.queries(name)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          graft.operators.Dedup.unpersistAll()
        }
      }
    }
    spark.stop()
  }

  private def probeC11(s: SparkSession, dir: String): Unit = {
    import graft.sources.CorpusStore
    println("===== c11 phases =====")
    val docs = Tables.load(s, dir, "documents")
    val tmpRoot = TempRoots.forRun("graft-c11probe")
    val store = s"$tmpRoot/store"
    t("writeCorpusCow") {
      CorpusStore.writeCorpusCow(
        docs.where(pmod(col("doc_id"), lit(4)) === 0), store,
        "doc_id", numBuckets = 8)
    }
    (1 to 3).foreach { i =>
      t(s"cowIngestBatch $i") {
        CorpusStore.cowIngestBatch(store)(
          docs.where(pmod(col("doc_id"), lit(4)) === i), i.toLong)
      }
    }
    val staged = s"$tmpRoot/staged"
    t("stream drain") {
      val q = s.readStream.format("graft-corpus")
        .option("path", store)
        .option("maxGenerationsPerTrigger", "1")
        .option("consumer", "c11probe")
        .load()
        .writeStream
        .option("checkpointLocation", s"$tmpRoot/ckpt")
        .foreachBatch {
          (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.write.mode("append").parquet(staged); ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    t("pipeline over staged") {
      val q = SparkEntry.queries("c10_pipeline_capstone")
      // c10 over raw parquet approximates the pipeline tail; timed
      // separately so the store+stream overhead above is isolated
      q(s, dir).write.format("noop").mode("overwrite").save()
      graft.operators.Dedup.unpersistAll()
    }
  }

  private def probeC10Legs(s: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.{Dedup, Packing, TextAnalysis}
    println("===== c10 legs =====")
    (1 to 2).foreach { rep =>
      val docs = Tables.load(s, dir, "documents")
      val curated = Dedup.batchScope.persistTracked(docs
        .where(TextAnalysis.qualityScore(col("text")) >= 0.75 &&
          TextAnalysis.dupWordFrac(col("text")) <= 0.7)
        .withColumn("_c_surv",
          min("doc_id").over(Window.partitionBy(xxhash64(col("text")))))
        .where(col("doc_id") === col("_c_surv"))
        .select("doc_id", "source", "text"))
      t(s"rep$rep curate+persist") { curated.count() }
      val train = curated.where(col("doc_id") % 10 =!= 0)
      val evalSplit = docs.where(col("doc_id") % 10 === 0)
        .select("doc_id", "text")
      val contaminated = Dedup.decontaminate(train, evalSplit,
          "doc_id", "text", shingleK = 3, numHashes = 128, bands = 16,
          threshold = 0.5, maxBucketSize = 8)
        .select(col("id_left").as("doc_id")).distinct()
      t(s"rep$rep decontaminate") {
        contaminated.write.format("noop").mode("overwrite").save()
      }
      val clean = train.join(contaminated, Seq("doc_id"), "left_anti")
      val rates = clean.groupBy("source")
        .agg(sum(TextAnalysis.wsTokenCount(col("text")).cast("long"))
          .as("_c_nt"))
        .withColumn("_c_rate", round(least(lit(1.0),
          lit(100000.0) / count(lit(1)).over(Window.partitionBy()) /
            col("_c_nt")), 6))
        .select("source", "_c_rate")
      val sampled = clean.join(broadcast(rates), Seq("source"))
        .where(((pmod(col("doc_id"), lit(2147483647L)) *
            lit(2654435761L)) % lit(1000003L))
          .cast("double") / lit(1000003.0) < col("_c_rate"))
      t(s"rep$rep mix+pack tail") {
        Packing.packSequences(sampled, "doc_id",
            TextAnalysis.bpePieceCount(col("text")),
            seqLen = 2048, numShards = 8)
          .orderBy("shard", "chunk_id")
          .write.format("noop").mode("overwrite").save()
      }
      Dedup.unpersistAll()
    }
  }

  private def probeS25(s: SparkSession, dir: String): Unit = {
    import graft.operators.Similarity
    println("===== s25 phases =====")
    val emb = Tables.load(s, dir, "embeddings")
    val root = TempRoots.forRun("graft-s25probe")
    val path = s"$root/hnsw"
    t("writeHnswIndex") {
      Similarity.writeHnswIndex(emb, "vec_id", "embedding", path,
        nCells = 16, m = 6)
    }
    t("addPqToHnswIndex") {
      Similarity.addPqToHnswIndex(s, path,
        Similarity.pqSeededCodebook(emb, "vec_id", "embedding",
          m = 4, nCodes = 16))
    }
    val qv = Tables.load(s, dir, "embeddings")
      .orderBy("vec_id").select("embedding").head()
      .getSeq[Float](0).toArray
    val (cb, lut, qnorm, probeCells) = t("codedProbePlan") {
      Similarity.codedProbePlan(s, path, qv, nProbe = 4)
    }
    val ids = t("codedBeamIds") {
      Similarity.codedBeamIds(s, path, cb, lut, qnorm,
        probeCells, ef = 12, rounds = 4, None)
    }
    t("rerank") {
      val cells = s.read.parquet(s"$path/cells")
      cells.where(col("cell").isin(probeCells: _*))
        .where(col("id").isin(ids.toIndexedSeq: _*))
        .select(col("id"),
          graft.functions.VectorOps.cosine(col("vec"),
            typedlit(qv.toSeq)).as("cosine"))
        .orderBy(col("cosine").desc, col("id").asc).limit(10)
        .write.format("noop").mode("overwrite").save()
    }
  }
}
