package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Graph ANN — per-cell navigable-small-world (round 17, r16
  * next-task 7). The family's pinned contract:
  *
  *  - a COVERING walk (complete within-cell graph, beam ≥ cell,
  *    every cell probed) degenerates to exact brute-force top-k —
  *    the correctness anchor that needs no recall argument;
  *  - the inline build and the persisted index return row-identical
  *    results (the IVF inline/indexed parity stance), and the batch
  *    surface equals per-query probes;
  *  - a persisted probe reads ONLY the probed cells of BOTH trees
  *    (vectors and adjacency) — partition pruning pinned in the
  *    plan;
  *  - tombstoned nodes still route but are never returned;
  *  - at matched probe cost the walk's recall meets or beats the
  *    compressed IVF-PQ probe it complements (the regime the family
  *    exists for), measured by [[Similarity.hnswRecall]] vs
  *    [[Similarity.pqRecall]] on the same data and knobs.
  */
class HnswSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private lazy val emb = Tables.load(spark, sfDir, "embeddings")
    .localCheckpoint()
  private lazy val query: Array[Float] = emb.orderBy("vec_id").limit(1)
    .select(col("embedding")).as[Seq[Float]].head().toArray

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.select(col("id"), round(col("cosine"), 9).as("c"))
      .as[(Long, Double)].collect().sortBy(r => (-r._2, r._1)).toSeq

  test("covering walk equals exact brute-force top-k") {
    // complete graph per cell (m ≥ cell size), beam ≥ cell, all cells
    // probed, 2 rounds (entry reaches every neighbor in one hop):
    // the walk IS brute force, merged across cells
    val brute = Similarity.knnBrute(emb, "vec_id", "embedding",
      query, k = 10)
    val walked = Similarity.knnHnsw(emb, "vec_id", "embedding",
      query, k = 10, nCells = 8, nProbe = 8, m = 500, ef = 500,
      rounds = 2)
    assert(rows(walked) == rows(brute))
  }

  test("inline, indexed and batch probes are row-identical; only probed cells are read") {
    val path = tmp("graft-hnsw")
    Similarity.writeHnswIndex(emb, "vec_id", "embedding", path,
      nCells = 16, m = 6)
    val inline = Similarity.knnHnsw(emb, "vec_id", "embedding",
      query, k = 10, nCells = 16, nProbe = 4, m = 6, ef = 12, rounds = 4)
    val indexed = Similarity.knnHnswIndexed(spark, path, query,
      k = 10, nProbe = 4, ef = 12, rounds = 4)
    assert(rows(indexed) == rows(inline))
    // the graph walk actually prunes: both scans carry a cell
    // partition filter in the physical plan
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("cell"), plan.take(2000))

    // batch surface: three queries, each row-identical to its own
    // indexed probe
    val queries = emb.orderBy("vec_id").limit(3)
      .select(col("vec_id").as("qid"), col("embedding"))
    val batch = Similarity.knnHnswBatch(spark, path, queries,
      "qid", "embedding", k = 10, nProbe = 4, ef = 12, rounds = 4)
    val qs = queries.as[(Long, Seq[Float])].collect()
    qs.foreach { case (qid, qv) =>
      val single = Similarity.knnHnswIndexed(spark, path, qv.toArray,
        k = 10, nProbe = 4, ef = 12, rounds = 4)
      assert(rows(batch.where(col("query_id") === qid)
        .select("id", "cosine")) == rows(single),
        s"batch result for query $qid diverges from the single probe")
    }
  }

  test("tombstoned nodes route but are never returned") {
    val path = tmp("graft-hnsw-tomb")
    Similarity.writeHnswIndex(emb, "vec_id", "embedding", path,
      nCells = 16, m = 6)
    val before = Similarity.knnHnswIndexed(spark, path, query,
      k = 10, nProbe = 4, ef = 12, rounds = 4)
    val victim = rows(before).head._1
    Similarity.deleteFromIvfIndex(Seq(victim).toDF("id"), "id", path)
    val after = Similarity.knnHnswIndexed(spark, path, query,
      k = 10, nProbe = 4, ef = 12, rounds = 4)
    val ids = rows(after).map(_._1)
    assert(!ids.contains(victim), s"tombstoned $victim still returned")
    // the rest of the beam survives the mask (ef > k headroom)
    assert(ids.size == 10, s"masked probe returned ${ids.size} rows")
    assert(rows(before).map(_._1).filterNot(_ == victim)
      .forall(ids.contains), "masking removed more than the victim")
  }

  test("append joins the lifecycle: new vectors probe-visible via a bounded re-knit; untouched cells' graph files never rewritten") {
    import graft.operators.IndexHealth
    val path = tmp("graft-hnsw-app")
    // the founding half holds the 16 lowest vec_ids, so the STORED
    // centroids equal the full corpus's seeded centroids and the
    // post-append index is comparable to an inline build over the
    // full set
    val first = emb.orderBy("vec_id").limit(250).localCheckpoint()
    val extra = emb.orderBy(col("vec_id").desc).limit(3).localCheckpoint()
    Similarity.writeHnswIndex(first, "vec_id", "embedding", path,
      nCells = 16, m = 6)
    def graphFiles(): Map[String, Seq[(String, Long)]] = {
      val root = new java.io.File(s"$path/graph")
      root.listFiles.filter(_.isDirectory).map { d =>
        d.getName -> d.listFiles.filter(_.isFile)
          .map(f => (f.getName, f.lastModified)).sortBy(_._1).toSeq
      }.toMap
    }
    val before = graphFiles()
    Similarity.appendToHnswIndex(extra, "vec_id", "embedding", path)
    val after = graphFiles()
    // ≤3 appended vectors touch ≤3 cells; every other cell's graph
    // partition is byte-untouched (dynamic partition overwrite)
    val changed = after.keySet.filter(c => before.get(c) != after.get(c))
    assert(changed.nonEmpty && changed.size <= 3, changed.toString)
    // the appended vectors are probe-visible and the whole index is
    // row-identical to an inline build over the full set
    val full = first.unionByName(extra)
    val inline = Similarity.knnHnsw(full, "vec_id", "embedding",
      query, k = 10, nCells = 16, nProbe = 4, m = 6, ef = 12, rounds = 4)
    val indexed = Similarity.knnHnswIndexed(spark, path, query,
      k = 10, nProbe = 4, ef = 12, rounds = 4)
    assert(rows(indexed) == rows(inline))
    // clean state reads healthy under the catalog loop
    val h = IndexHealth.report(spark, path)
    assert(h.kind == "hnsw" && !h.needsCompact && !h.needsRebuild,
      h.toString)
  }

  test("append crash window: unknitted nodes flag needsCompact; maintain repairs with an in-place knit, not a rebuild") {
    import graft.operators.IndexHealth
    val path = tmp("graft-hnsw-crash")
    Similarity.writeHnswIndex(emb, "vec_id", "embedding", path,
      nCells = 16, m = 6)
    val want = rows(Similarity.knnHnswIndexed(spark, path, query,
      k = 10, nProbe = 4, ef = 12, rounds = 4))
    // simulate the crash's end state — nodes present, edges missing —
    // by dropping one probed cell's graph partition
    val victimCell = new java.io.File(s"$path/graph").listFiles
      .filter(_.isDirectory).map(_.getName).sorted.head
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rmrf)); f.delete(); ()
    }
    rmrf(new java.io.File(s"$path/graph/$victimCell"))
    val h = IndexHealth.report(spark, path)
    assert(h.kind == "hnsw" && h.needsCompact && h.tombstones == 0,
      h.toString)
    val r = IndexHealth.maintain(spark, path, tmp("graft-hnsw-dst"))
    assert(r.action == "knitted" && r.activePath == path, r.toString)
    assert(!r.after.needsCompact, r.after.toString)
    assert(rows(Similarity.knnHnswIndexed(spark, path, query,
      k = 10, nProbe = 4, ef = 12, rounds = 4)) == want,
      "the re-knit index must probe identically to the pre-crash one")
  }

  test("takedown → rebuild lifecycle: maintain rebuilds a tombstoned graph index into a clean tree, parity with an inline build over the live set") {
    import graft.operators.IndexHealth
    val path = tmp("graft-hnsw-reb")
    val dst = tmp("graft-hnsw-reb-dst")
    Similarity.writeHnswIndex(emb, "vec_id", "embedding", path,
      nCells = 16, m = 6)
    val victims = rows(Similarity.knnHnswIndexed(spark, path, query,
      k = 10, nProbe = 4, ef = 12, rounds = 4)).map(_._1).take(2)
    Similarity.deleteFromIvfIndex(victims.toDF("id"), "id", path)
    val h = IndexHealth.report(spark, path)
    assert(h.kind == "hnsw" && h.needsCompact && h.tombstones == 2,
      h.toString)
    val r = IndexHealth.maintain(spark, path, dst)
    assert(r.action == "rebuilt" && r.activePath == dst, r.toString)
    assert(r.after.kind == "hnsw" && r.after.tombstones == 0 &&
      !r.after.needsCompact, r.after.toString)
    // the rebuilt index equals an inline build over the live corpus
    // with the same (kmeans) centroids — and the victims are gone
    val live = emb.where(!col("vec_id").isin(victims: _*))
    val inline = Similarity.knnHnsw(live, "vec_id", "embedding",
      query, k = 10, nCells = 16, nProbe = 4, m = 6, ef = 12,
      rounds = 4, strategy = Similarity.KMeansCentroids())
    val rebuilt = Similarity.knnHnswIndexed(spark, dst, query,
      k = 10, nProbe = 4, ef = 12, rounds = 4)
    assert(rows(rebuilt) == rows(inline))
    assert(!rows(rebuilt).map(_._1).exists(victims.contains))
  }

  test("hnsw serving loop: streamed queries equal the direct batch probe, replay is a no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp("graft-hnsw-srv")
    val out = tmp("graft-hnsw-srv-out")
    Similarity.writeHnswIndex(emb, "vec_id", "embedding", dir,
      nCells = 16, m = 6)
    val qset = emb.orderBy("vec_id").limit(4)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      .as[(Long, Array[Float])].collect()
    val mem = MemoryStream[(Long, Array[Float])]
    val q = mem.toDF().toDF("query_id", "qvec").writeStream
      .foreachBatch(Similarity.hnswServeBatch(dir, "query_id", "qvec",
        out, k = 10, nProbe = 4) _)
      .start()
    try {
      mem.addData(qset(0), qset(1)); q.processAllAvailable()
      mem.addData(qset(2), qset(3)); q.processAllAvailable()
    } finally q.stop()
    val served = spark.read.parquet(s"$out/results")
      .select("query_id", "id", "cosine")
    val direct = Similarity.knnHnswBatch(spark, dir,
      qset.toSeq.toDF("query_id", "qvec"), "query_id", "qvec",
      k = 10, nProbe = 4)
    assertSameRows(served, direct)
    // replaying a served batch id appends nothing
    val before = spark.read.parquet(s"$out/results").count()
    Similarity.hnswServeBatch(dir, "query_id", "qvec", out,
      k = 10, nProbe = 4)(Seq(qset(0)).toDF("query_id", "qvec"), 0L)
    assert(spark.read.parquet(s"$out/results").count() == before,
      "replayed batch id must not re-serve")
    assert(spark.read.parquet(s"$out/serve_log").count() == 2)
  }

  test("recall at matched probe cost meets or beats the compressed IVF-PQ probe") {
    val queries = emb.orderBy("vec_id").limit(5)
      .select(col("vec_id").as("qid"), col("embedding"))
    def avg(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(org.apache.spark.sql.functions.avg("recall"))
        .as[Double].head()
    val hnsw = avg(Similarity.hnswRecall(queries, "qid", "embedding",
      emb, "vec_id", "embedding", k = 10, nCells = 16, nProbe = 4,
      m = 8, ef = 20, rounds = 4))
    val cb = Similarity.pqSeededCodebook(emb, "vec_id", "embedding",
      m = 8, nCodes = 16)
    val pq = avg(Similarity.pqRecall(queries, "qid", "embedding",
      emb, "vec_id", "embedding", k = 10, cb, overfetch = 2))
    info(f"recall@10 over 5 queries: hnsw=$hnsw%.3f ivfpq=$pq%.3f")
    assert(hnsw > 0.5, s"hnsw recall degenerate: $hnsw")
    assert(hnsw >= pq - 1e-9,
      s"graph walk recall $hnsw below compressed probe $pq at matched cost")
  }
}
