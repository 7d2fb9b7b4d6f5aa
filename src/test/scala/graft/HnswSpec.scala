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

  test("a tombstoned min-id entry re-knit out of the adjacency no longer traps the beam: the walk seeds from the min LIVE id") {
    // round 18 — r17 ADVICE: knitHnswCells rebuilds adjacency from
    // live nodes only, so after delete + re-knit a tombstoned min-id
    // node has no adjacency row; the old walk seeded min PHYSICAL id
    // and the beam never left the dead, edge-less entry — every live
    // node in the cell was probe-invisible until a full rebuild.
    // nCells = 1 makes the displaced entry the GLOBAL min id and the
    // parity target exact: with one cell, centroids play no role in
    // assignment or probe, so the post-delete+knit index must equal
    // an inline build over the live corpus.
    val path = tmp("graft-hnsw-entry")
    Similarity.writeHnswIndex(emb, "vec_id", "embedding", path,
      nCells = 1, m = 6)
    val victim = emb.agg(min("vec_id")).as[Long].head()
    Similarity.deleteFromIvfIndex(Seq(victim).toDF("id"), "id", path)
    Similarity.knitHnswCells(spark, path, Seq(0))
    val after = Similarity.knnHnswIndexed(spark, path, query,
      k = 10, nProbe = 1, ef = 12, rounds = 4)
    val ids = rows(after).map(_._1)
    assert(ids.size == 10,
      s"dead entry trapped the beam: ${ids.size} rows returned")
    assert(!ids.contains(victim))
    val live = emb.where(col("vec_id") =!= victim)
    val inline = Similarity.knnHnsw(live, "vec_id", "embedding",
      query, k = 10, nCells = 1, nProbe = 1, m = 6, ef = 12, rounds = 4)
    assert(rows(after) == rows(inline),
      "post-knit probe must equal an inline build over the live corpus")
  }

  test("serve_log compaction: N served batches fold to one file + watermark; replay refused across the fold; the next batch re-opens the tail") {
    import graft.sources.BatchLog
    val dir = tmp("graft-hnsw-slog")
    val out = tmp("graft-hnsw-slog-out")
    val logPath = s"$out/serve_log"
    Similarity.writeHnswIndex(emb, "vec_id", "embedding", dir,
      nCells = 16, m = 6)
    val qs = emb.orderBy("vec_id").limit(4)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      .as[(Long, Seq[Float])].collect()
    (0 until 4).foreach { i =>
      Similarity.hnswServeBatch(dir, "query_id", "qvec", out,
        k = 10, nProbe = 4)(
        Seq((qs(i)._1, qs(i)._2)).toDF("query_id", "qvec"), i.toLong)
    }
    // the tail disease: one log file per served batch
    assert(BatchLog.tailFiles(spark, logPath).size == 4)
    val served = spark.read.parquet(s"$out/results").count()
    assert(Similarity.compactServeLog(spark, out) == 4)
    assert(BatchLog.tailFiles(spark, logPath).isEmpty)
    assert(BatchLog.watermark(spark, logPath).contains(3L))
    // replaying any folded batch id is still a no-op
    (0 until 4).foreach { i =>
      Similarity.hnswServeBatch(dir, "query_id", "qvec", out,
        k = 10, nProbe = 4)(
        Seq((qs(i)._1, qs(i)._2)).toDF("query_id", "qvec"), i.toLong)
    }
    assert(spark.read.parquet(s"$out/results").count() == served,
      "a folded batch id must stay refused")
    // life goes on: a new batch serves and logs to the tail; the next
    // fold absorbs it
    Similarity.hnswServeBatch(dir, "query_id", "qvec", out,
      k = 10, nProbe = 4)(
      Seq((qs(0)._1, qs(0)._2)).toDF("query_id", "qvec"), 4L)
    assert(spark.read.parquet(s"$out/results").count() == served + 10)
    assert(BatchLog.tailFiles(spark, logPath).size == 1)
    assert(Similarity.compactServeLog(spark, out) == 1)
    assert(BatchLog.watermark(spark, logPath).contains(4L))
  }

  test("tuning eval: one build sweeps (m, ef, rounds); cost grows with the budget and a covering config reaches recall 1.0") {
    val queries = emb.orderBy("vec_id").limit(3)
      .select(col("vec_id").as("qid"), col("embedding"))
    val report = Similarity.hnswTuningEval(queries, "qid", "embedding",
        emb, "vec_id", "embedding", k = 10, nCells = 16, nProbe = 4,
        configs = Seq((2, 10, 2), (4, 12, 3), (6, 12, 4)))
      .orderBy("m", "ef", "rounds")
      .as[(Int, Int, Int, Int, Double, Double)].collect()
    assert(report.length == 3, report.mkString("; "))
    assert(report.forall(r => r._4 == 3 && r._5 >= 0.0 && r._5 <= 1.0
      && r._6 > 0.0), report.mkString("; "))
    // a larger (m, ef, rounds) budget scores strictly more nodes
    assert(report(0)._6 < report(1)._6 && report(1)._6 < report(2)._6,
      s"visited not increasing: ${report.map(_._6).mkString(", ")}")
    // and on this fixture buys at least as much recall
    assert(report(2)._5 >= report(0)._5,
      s"max-budget recall ${report(2)._5} below min-budget ${report(0)._5}")
    report.foreach(r => info(
      f"m=${r._1} ef=${r._2} rounds=${r._3}: recall=${r._5}%.3f " +
        f"visited=${r._6}%.1f"))
    // the correctness anchor: a covering walk (complete graph, beam ≥
    // cell, every cell probed) is exact — recall 1.0, no argument
    val covering = Similarity.hnswTuningEval(queries, "qid", "embedding",
        emb, "vec_id", "embedding", k = 10, nCells = 8, nProbe = 8,
        configs = Seq((500, 500, 2)))
      .as[(Int, Int, Int, Int, Double, Double)].head()
    assert(covering._5 == 1.0, s"covering config recall ${covering._5}")
  }

  test("filtered walk: covering filtered probe is exact over the passing subset; inline/indexed/batch parity; filtered nodes route but are never returned") {
    val pred = col("label") % 2 === 0
    // the correctness anchor: a COVERING walk (complete graph, beam ≥
    // cell, every cell probed) visits everything, so the emission
    // filter makes it exact brute-force over the passing subset
    val covering = Similarity.knnHnsw(emb, "vec_id", "embedding",
      query, k = 10, nCells = 8, nProbe = 8, m = 500, ef = 500,
      rounds = 2, attrCols = Seq("label"), predicate = Some(pred))
    val brute = Similarity.knnBrute(emb.where(pred), "vec_id",
      "embedding", query, k = 10)
    assert(rows(covering) == rows(brute))
    // persisted parity at real knobs (ef sized for ~50% selectivity)
    val path = tmp("graft-hnsw-filt")
    Similarity.writeHnswIndex(emb, "vec_id", "embedding", path,
      nCells = 16, m = 6, attrCols = Seq("label"))
    val inline = Similarity.knnHnsw(emb, "vec_id", "embedding",
      query, k = 10, nCells = 16, nProbe = 4, m = 6, ef = 20,
      rounds = 4, attrCols = Seq("label"), predicate = Some(pred))
    val indexed = Similarity.knnHnswIndexed(spark, path, query,
      k = 10, nProbe = 4, ef = 20, rounds = 4, predicate = Some(pred))
    assert(rows(indexed) == rows(inline))
    // every returned id passes; the walk still ROUTED through
    // failing nodes (an emission filter, not a subgraph walk) —
    // unfiltered and filtered probes read the same graph
    val failing = emb.where(!pred).select(col("vec_id")).as[Long]
      .collect().toSet
    assert(rows(indexed).map(_._1).forall(id => !failing(id)))
    // batch surface: per-query identity with the single filtered probe
    val queries3 = emb.orderBy("vec_id").limit(3)
      .select(col("vec_id").as("qid"), col("embedding"))
    val batch = Similarity.knnHnswBatch(spark, path, queries3,
      "qid", "embedding", k = 10, nProbe = 4, ef = 20, rounds = 4,
      predicate = Some(pred))
    queries3.as[(Long, Seq[Float])].collect().foreach { case (qid, qv) =>
      val single = Similarity.knnHnswIndexed(spark, path, qv.toArray,
        k = 10, nProbe = 4, ef = 20, rounds = 4, predicate = Some(pred))
      assert(rows(batch.where(col("query_id") === qid)
        .select("id", "cosine")) == rows(single),
        s"filtered batch result for query $qid diverges")
    }
  }

  test("hnsw ingest loop: streamed appends equal direct appends, replay is a no-op; the serving loop self-folds its log") {
    import graft.sources.BatchLog
    val path = tmp("graft-hnsw-ing")
    // founding half holds the 16 lowest vec_ids, so the stored
    // centroids equal the full corpus's seeded centroids (the append
    // test's fixture argument) and inline parity holds post-ingest
    val first = emb.orderBy("vec_id").limit(250).localCheckpoint()
    val extra = emb.orderBy(col("vec_id").desc).limit(6).localCheckpoint()
    Similarity.writeHnswIndex(first, "vec_id", "embedding", path,
      nCells = 16, m = 6)
    val b0 = extra.where(pmod(col("vec_id"), lit(2)) === 0)
    val b1 = extra.where(pmod(col("vec_id"), lit(2)) === 1)
    Similarity.hnswIngestBatch("vec_id", "embedding", path)(b0, 0L)
    Similarity.hnswIngestBatch("vec_id", "embedding", path)(b1, 1L)
    // replay: byte-unchanged index
    val cellsBefore = spark.read.parquet(s"$path/cells").count()
    Similarity.hnswIngestBatch("vec_id", "embedding", path)(b0, 0L)
    assert(spark.read.parquet(s"$path/cells").count() == cellsBefore,
      "replayed ingest batch re-appended")
    // streamed appends ≡ an inline build over the full set (the
    // appendToHnswIndex parity, now through the loop)
    val full = first.unionByName(extra)
    val inline = Similarity.knnHnsw(full, "vec_id", "embedding",
      query, k = 10, nCells = 16, nProbe = 4, m = 6, ef = 12, rounds = 4)
    val indexed = Similarity.knnHnswIndexed(spark, path, query,
      k = 10, nProbe = 4, ef = 12, rounds = 4)
    assert(rows(indexed) == rows(inline))

    // self-folding serving: compactEvery = 2 folds after batch ids
    // 1 and 3 — no external scheduler, tail never outgrows the cadence
    val out = tmp("graft-hnsw-ing-out")
    val qs = emb.orderBy("vec_id").limit(4)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      .as[(Long, Seq[Float])].collect()
    (0 until 4).foreach { i =>
      Similarity.hnswServeBatch(path, "query_id", "qvec", out,
        k = 10, nProbe = 4, compactEvery = Some(2L))(
        Seq((qs(i)._1, qs(i)._2)).toDF("query_id", "qvec"), i.toLong)
    }
    assert(BatchLog.tailFiles(spark, s"$out/serve_log").isEmpty,
      "self-fold left a tail")
    assert(BatchLog.watermark(spark, s"$out/serve_log").contains(3L))
    assert(spark.read.parquet(s"$out/results").count() == 40)
    // replay after the fold is still refused
    Similarity.hnswServeBatch(path, "query_id", "qvec", out,
      k = 10, nProbe = 4, compactEvery = Some(2L))(
      Seq((qs(0)._1, qs(0)._2)).toDF("query_id", "qvec"), 0L)
    assert(spark.read.parquet(s"$out/results").count() == 40)
  }

  test("rebuild carries the ingest log: carried batch ids stay refused at the new path (folded history included)") {
    // r18 ADVICE: IndexHealth's append-drift trigger auto-rebuilds
    // precisely while an ingest stream is live — after the pointer
    // swap, a Spark-replayed batch id must find its replay guard at
    // the new path or it re-appends duplicate rows. The carry must
    // include the FOLDED history (compactLshIndex's contract), so one
    // batch is folded before the rebuild and one stays in the tail.
    import graft.sources.BatchLog
    val path = tmp("graft-hnsw-carry")
    val first = emb.orderBy("vec_id").limit(250).localCheckpoint()
    val extra = emb.orderBy(col("vec_id").desc).limit(6).localCheckpoint()
    Similarity.writeHnswIndex(first, "vec_id", "embedding", path,
      nCells = 16, m = 6)
    val b0 = extra.where(pmod(col("vec_id"), lit(2)) === 0)
    val b1 = extra.where(pmod(col("vec_id"), lit(2)) === 1)
    Similarity.hnswIngestBatch("vec_id", "embedding", path)(b0, 0L)
    assert(Similarity.compactIngestReplayLog(spark, path) == 1)
    Similarity.hnswIngestBatch("vec_id", "embedding", path)(b1, 1L)
    val dst = tmp("graft-hnsw-carry-dst")
    Similarity.rebuildHnswIndex(spark, path, dst,
      strategy = Similarity.SeededCentroids)
    (0 to 1).foreach(i =>
      assert(BatchLog.contains(spark, s"$dst/ingest_log", i.toLong),
        s"batch $i lost its replay guard across the rebuild"))
    val before = spark.read.parquet(s"$dst/cells").count()
    Similarity.hnswIngestBatch("vec_id", "embedding", dst)(b0, 0L)
    Similarity.hnswIngestBatch("vec_id", "embedding", dst)(b1, 1L)
    assert(spark.read.parquet(s"$dst/cells").count() == before,
      "a carried batch id re-appended at the rebuilt path")
    // a genuinely NEW batch id still ingests
    Similarity.hnswIngestBatch("vec_id", "embedding", dst)(
      b0.limit(0), 2L)
    assert(BatchLog.contains(spark, s"$dst/ingest_log", 2L))
  }

  test("coded walk: covering probe is exact, recall matches the float walk at matched knobs, batch equals single probes") {
    // round 19 — r18 verdict task 1: the serving walk on PQ codes
    // (ADC beam) + the bounded point-read exact rerank. Correctness
    // anchor first: a COVERING coded walk (complete graph, every
    // cell probed, beam ≥ cell) visits every node no matter how ADC
    // ranks them, and the rerank is exact — so the output must equal
    // brute force with no recall argument.
    val path = tmp("graft-hnsw-pqc")
    Similarity.writeHnswIndex(emb, "vec_id", "embedding", path,
      nCells = 8, m = 500, attrCols = Seq("label"))
    Similarity.addPqToHnswIndex(spark, path, pqM = 8, nCodes = 16)
    val covering = Similarity.knnHnswIndexedCoded(spark, path, query,
      k = 10, nProbe = 8, ef = 500, rounds = 2)
    val brute = Similarity.knnBrute(emb, "vec_id", "embedding", query,
      k = 10)
    assert(rows(covering) == rows(brute), "covering coded walk not exact")

    // matched-knobs recall: the tuned index (m=6) walked on codes vs
    // on floats, same (k, nProbe, ef, rounds), brute truth
    val tuned = tmp("graft-hnsw-pqt")
    Similarity.writeHnswIndex(emb, "vec_id", "embedding", tuned,
      nCells = 16, m = 6, attrCols = Seq("label"))
    Similarity.addPqToHnswIndex(spark, tuned, pqM = 8, nCodes = 16)
    val queries5 = emb.orderBy("vec_id").limit(5)
      .select(col("vec_id").as("qid"), col("embedding"))
    def avgOf(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(org.apache.spark.sql.functions.avg("recall")).as[Double].head()
    val floatR = avgOf(Similarity.hnswRecallIndexed(spark, tuned,
      queries5, "qid", "embedding", emb, "vec_id", "embedding",
      k = 10, nProbe = 4, ef = 20, rounds = 4))
    val codedR = avgOf(Similarity.hnswRecallIndexedCoded(spark, tuned,
      queries5, "qid", "embedding", emb, "vec_id", "embedding",
      k = 10, nProbe = 4, ef = 20, rounds = 4))
    info(f"recall@10 float=$floatR%.3f coded=$codedR%.3f")
    assert(codedR >= floatR - 0.1,
      s"coded walk recall $codedR collapsed vs float walk $floatR")

    // batch surface ≡ per-query coded probes (the family's parity
    // stance)
    val batch = Similarity.knnHnswBatchCoded(spark, tuned, queries5,
      "qid", "embedding", k = 10, nProbe = 4, ef = 20, rounds = 4)
    queries5.as[(Long, Seq[Float])].collect().foreach { case (qid, qv) =>
      val single = Similarity.knnHnswIndexedCoded(spark, tuned,
        qv.toArray, k = 10, nProbe = 4, ef = 20, rounds = 4)
      assert(rows(batch.where(col("query_id") === qid)
        .select("id", "cosine")) == rows(single),
        s"coded batch result for query $qid diverges")
    }

    // OPQ sidecar: batch ≡ single is the real rotation cross-check —
    // the single probe rotates the query DRIVER-side (adcLutOf's
    // dotSeq rows), the batch rotates it DECLARATIVELY (the MatVec
    // kernel); a mismatch between the two LUTs through the rotation
    // would diverge the beams here
    val opqd = tmp("graft-hnsw-pqopq")
    Similarity.writeHnswIndex(emb, "vec_id", "embedding", opqd,
      nCells = 16, m = 6)
    Similarity.addPqToHnswIndex(spark, opqd, pqM = 8, nCodes = 16,
      opq = true)
    val obatch = Similarity.knnHnswBatchCoded(spark, opqd, queries5,
      "qid", "embedding", k = 10, nProbe = 4, ef = 20, rounds = 4)
    queries5.as[(Long, Seq[Float])].collect().foreach { case (qid, qv) =>
      val single = Similarity.knnHnswIndexedCoded(spark, opqd,
        qv.toArray, k = 10, nProbe = 4, ef = 20, rounds = 4)
      assert(rows(obatch.where(col("query_id") === qid)
        .select("id", "cosine")) == rows(single),
        s"OPQ coded batch result for query $qid diverges")
    }
  }

  test("coded walk lifecycle: appends encode with the stored codebook, tombstones never emit, filters mask emission, rebuild retrains the sidecar") {
    val path = tmp("graft-hnsw-pql")
    val first = emb.orderBy("vec_id").limit(250).localCheckpoint()
    val extra = emb.orderBy(col("vec_id").desc).limit(6).localCheckpoint()
    Similarity.writeHnswIndex(first, "vec_id", "embedding", path,
      nCells = 8, m = 6, attrCols = Seq("label"))
    Similarity.addPqToHnswIndex(spark, path, pqM = 8, nCodes = 16)
    // append extends the sidecar: a covering coded probe AT an
    // appended vector must return it (exact self-match, cosine 1)
    Similarity.appendToHnswIndex(extra, "vec_id", "embedding", path)
    assert(spark.read.parquet(s"$path/pqcodes").count() == 256,
      "append did not extend the pq sidecar")
    val (aid, av) = extra.orderBy("vec_id")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].head()
    val hit = Similarity.knnHnswIndexedCoded(spark, path, av.toArray,
      k = 5, nProbe = 8, ef = 300, rounds = 3)
    assert(hit.select("id").as[Long].collect().contains(aid),
      "appended vector invisible to the coded walk")
    // tombstone: delete it — the coded walk must never return it
    Similarity.deleteFromIvfIndex(Seq(aid).toDF("id"), "id", path)
    val afterDel = Similarity.knnHnswIndexedCoded(spark, path, av.toArray,
      k = 5, nProbe = 8, ef = 300, rounds = 3)
    assert(!afterDel.select("id").as[Long].collect().contains(aid),
      "tombstoned id emitted by the coded walk")
    // filtered: only predicate-passing ids emit (emission mask, the
    // s24 contract), checked against the corpus's failing set
    val pred = col("label") % 2 === 0
    val filtered = Similarity.knnHnswIndexedCoded(spark, path, query,
      k = 5, nProbe = 8, ef = 300, rounds = 3, predicate = Some(pred))
    val failing = emb.where(!pred).select(col("vec_id")).as[Long]
      .collect().toSet
    assert(filtered.select("id").as[Long].collect()
      .forall(id => !failing(id)), "filtered coded walk emitted a failer")
    // rebuild carries the sidecar (retrained at the same code shape)
    val dst = tmp("graft-hnsw-pql-dst")
    Similarity.rebuildHnswIndex(spark, path, dst,
      strategy = Similarity.SeededCentroids)
    assert(Similarity.hnswHasPq(spark, dst),
      "rebuild dropped the pq sidecar")
    // and the tombstoned node is physically gone from the new sidecar
    assert(spark.read.parquet(s"$dst/pqcodes")
      .where(col("id") === aid).isEmpty,
      "rebuild carried a tombstoned node's codes")
  }

  test("recall after appends: entry drift from new min-id nodes is measured, not assumed") {
    // round 18 — r17 verdict task 7: the founding half holds the
    // HIGHEST vec_ids, so every appended batch brings new per-cell
    // MINIMUM ids — the exact entry-displacement regime. The eval is
    // hnswRecallIndexed (the batch probe vs brute truth on the same
    // final corpus); the rebuilt index's recall on identical knobs is
    // the no-drift reference the drift is measured against.
    val path = tmp("graft-hnsw-drift")
    val founding = emb.orderBy(col("vec_id").desc).limit(250)
      .localCheckpoint()
    val rest = emb.orderBy(col("vec_id").asc).limit(250).localCheckpoint()
    Similarity.writeHnswIndex(founding, "vec_id", "embedding", path,
      nCells = 16, m = 6)
    // three append batches, each displacing entries downward
    Seq(2, 1, 0).foreach { b =>
      Similarity.appendToHnswIndex(
        rest.where(pmod(col("vec_id"), lit(3)) === b),
        "vec_id", "embedding", path)
    }
    val queries = emb.orderBy("vec_id").limit(5)
      .select(col("vec_id").as("qid"), col("embedding"))
    def avgRecall(p: String): Double =
      Similarity.hnswRecallIndexed(spark, p, queries, "qid", "embedding",
          emb, "vec_id", "embedding", k = 10, nProbe = 4, ef = 20,
          rounds = 4)
        .agg(org.apache.spark.sql.functions.avg("recall")).as[Double].head()
    val appended = avgRecall(path)
    val dst = tmp("graft-hnsw-drift-dst")
    Similarity.rebuildHnswIndex(spark, path, dst,
      strategy = Similarity.SeededCentroids)
    val rebuilt = avgRecall(dst)
    // measured on this fixture: appended ≈ 0.50 vs rebuilt ≈ 0.92 —
    // the drift is REAL (displaced entries + centroids that never saw
    // the appended vectors), which is exactly why the eval exists:
    // without it, append-heavy indexes would serve degraded recall
    // invisibly. The pins are DETECTION (the eval runs and the
    // appended reading is honest, not degenerate) and RECOVERY (the
    // rebuild restores the walk on identical knobs) — the rebuild
    // trigger itself is IndexHealth's, informed by this report.
    info(f"recall@10 after appends=$appended%.3f rebuilt=$rebuilt%.3f " +
      f"(drift ${rebuilt - appended}%.3f)")
    assert(appended > 0.3, s"appended-index recall degenerate: $appended")
    assert(rebuilt >= appended,
      s"rebuild lost recall: appended=$appended rebuilt=$rebuilt")
    assert(rebuilt > 0.8,
      s"rebuilt reference degenerate: $rebuilt")
  }

  test("append drift trips needsRebuild at the recorded founding size; maintain rebuilds and the trigger resets") {
    import graft.operators.IndexHealth
    // round 18: the drift hnswRecallIndexed MEASURES (0.50 vs 0.92 on
    // the adversarial fixture) now has an automatic trigger — more
    // than maxAppendedFrac of the live corpus arrived after the
    // build, so the catalog loop rebuilds without a human reading
    // the eval
    val path = tmp("graft-hnsw-agedr")
    val founding = emb.orderBy(col("vec_id").desc).limit(300)
      .localCheckpoint()
    val rest = emb.orderBy(col("vec_id").asc).limit(200).localCheckpoint()
    Similarity.writeHnswIndex(founding, "vec_id", "embedding", path,
      nCells = 16, m = 6)
    assert(!IndexHealth.report(spark, path).needsRebuild)
    Similarity.appendToHnswIndex(rest, "vec_id", "embedding", path)
    val h = IndexHealth.report(spark, path)
    // 200 of 500 live rows post-date the build: 0.4 > the 0.3 default
    assert(h.kind == "hnsw" && h.needsRebuild, h.toString)
    val dst = tmp("graft-hnsw-agedr-d")
    val r = IndexHealth.maintain(spark, path, dst)
    assert(r.action == "rebuilt" && r.activePath == dst, r.toString)
    // the rebuild re-records its founding size — the trigger resets
    assert(!r.after.needsRebuild, r.after.toString)
    assert(r.after.totalRows == 500, r.after.toString)
  }

  test("coded sidecar crash window: uncoded nodes flag needsCompact; maintain re-encodes in place, never a rebuild") {
    import graft.operators.IndexHealth
    val path = tmp("graft-hnsw-pqcrash")
    Similarity.writeHnswIndex(emb, "vec_id", "embedding", path,
      nCells = 8, m = 6)
    Similarity.addPqToHnswIndex(spark, path, pqM = 8, nCodes = 16)
    assert(!IndexHealth.report(spark, path).needsCompact)
    val want = Similarity.knnHnswIndexedCoded(spark, path, query,
      k = 10, nProbe = 8, ef = 20, rounds = 4)
      .collect().map(_.toString).sorted.toSeq
    // simulate the cells-landed-codes-didn't crash signature: one
    // cell's sidecar partition vanishes (the knit-crash test's
    // graph-partition drop, aimed at pqcodes)
    val victimCell = new java.io.File(s"$path/pqcodes").listFiles
      .filter(_.isDirectory).map(_.getName).sorted.head
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rmrf)); f.delete(); ()
    }
    rmrf(new java.io.File(s"$path/pqcodes/$victimCell"))
    val h = IndexHealth.report(spark, path)
    assert(h.kind == "hnsw" && h.needsCompact, h.toString)
    val r = IndexHealth.maintain(spark, path, tmp("graft-hnsw-pqcrash-d"))
    assert(r.action == "recoded" && r.activePath == path, r.toString)
    assert(!r.after.needsCompact, r.after.toString)
    // the deterministic encoder restores byte-identical codes: the
    // coded probe equals its pre-crash self
    val got = Similarity.knnHnswIndexedCoded(spark, path, query,
      k = 10, nProbe = 8, ef = 20, rounds = 4)
      .collect().map(_.toString).sorted.toSeq
    assert(got == want, "re-encoded sidecar changed the coded probe")
  }

  test("coded serving loop: useCodes triggers equal the direct coded batch probe; replay stays a no-op") {
    import graft.sources.BatchLog
    val path = tmp("graft-hnsw-pqserve")
    Similarity.writeHnswIndex(emb, "vec_id", "embedding", path,
      nCells = 16, m = 6)
    Similarity.addPqToHnswIndex(spark, path, pqM = 8, nCodes = 16)
    val out = tmp("graft-hnsw-pqserve-out")
    val qs = emb.orderBy("vec_id").limit(4)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      .as[(Long, Seq[Float])].collect()
    (0 until 2).foreach { i =>
      Similarity.hnswServeBatch(path, "query_id", "qvec", out,
        k = 10, nProbe = 4, useCodes = true)(
        Seq(qs(2 * i), qs(2 * i + 1)).toDF("query_id", "qvec"), i.toLong)
    }
    val served = spark.read.parquet(s"$out/results")
      .select("query_id", "id", "cosine")
    val direct = Similarity.knnHnswBatchCoded(spark, path,
      qs.toSeq.toDF("query_id", "qvec"), "query_id", "qvec",
      k = 10, nProbe = 4)
    assert(served.collect().map(_.toString).sorted.toSeq ==
      direct.collect().map(_.toString).sorted.toSeq,
      "coded serving loop diverges from the direct coded batch probe")
    // replay is refused; an index without the sidecar is too
    Similarity.hnswServeBatch(path, "query_id", "qvec", out,
      k = 10, nProbe = 4, useCodes = true)(
      Seq(qs(0), qs(1)).toDF("query_id", "qvec"), 0L)
    assert(spark.read.parquet(s"$out/results").count() == 40)
    assert(BatchLog.contains(spark, s"$out/serve_log", 1L))
    val bare = tmp("graft-hnsw-nopq")
    Similarity.writeHnswIndex(emb.limit(50), "vec_id", "embedding",
      bare, nCells = 4, m = 4)
    intercept[IllegalArgumentException] {
      Similarity.hnswServeBatch(bare, "query_id", "qvec", out,
        k = 4, nProbe = 2, ef = 8, useCodes = true)(
        Seq(qs(0)).toDF("query_id", "qvec"), 9L)
    }
  }

  test("hot-cell salting: a concentrated batch fans out across salt keys with row-identical results") {
    // round 19 — r18 verdict task 3: the cogroup keys walks by cell,
    // so a batch concentrated on one cell used to walk serially in
    // one task. Salting replicates the cell across ceil(q/threshold)
    // keys; every replica holds the FULL cell, so results must be
    // row-identical at any threshold — pinned here on both the float
    // and the coded walk, plus the pure sizing rule.
    assert(Similarity.saltsOf(Map(0 -> 40L), 4) == Map(0 -> 10))
    assert(Similarity.saltsOf(Map(0 -> 3L, 1 -> 65L), 64) ==
      Map(0 -> 1, 1 -> 2))
    assert(Similarity.saltsOf(Map(0 -> 1000000L), 1) ==
      Map(0 -> Similarity.maxCellSalts))
    val path = tmp("graft-hnsw-salt")
    Similarity.writeHnswIndex(emb, "vec_id", "embedding", path,
      nCells = 8, m = 6)
    Similarity.addPqToHnswIndex(spark, path, pqM = 8, nCodes = 16)
    // 40 queries sharing one vector: every probe lands on the same
    // cells — the hot-cell regime
    val hot = Seq.tabulate(40)(i =>
        (1000L + i, query.toSeq))
      .toDF("qid", "embedding")
      .select(col("qid"), col("embedding").cast("array<float>")
        .as("embedding"))
    def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val serial = Similarity.knnHnswBatch(spark, path, hot,
      "qid", "embedding", k = 10, nProbe = 4,
      saltQueriesPerTask = Int.MaxValue)
    val fanned = Similarity.knnHnswBatch(spark, path, hot,
      "qid", "embedding", k = 10, nProbe = 4, saltQueriesPerTask = 4)
    assert(rowsOf(fanned) == rowsOf(serial),
      "salted float walk diverged from the serial form")
    assert(serial.count() == 400)
    val serialC = Similarity.knnHnswBatchCoded(spark, path, hot,
      "qid", "embedding", k = 10, nProbe = 4,
      saltQueriesPerTask = Int.MaxValue)
    val fannedC = Similarity.knnHnswBatchCoded(spark, path, hot,
      "qid", "embedding", k = 10, nProbe = 4, saltQueriesPerTask = 4)
    assert(rowsOf(fannedC) == rowsOf(serialC),
      "salted coded walk diverged from the serial form")
  }

  test("hnswRecall rides the batch probe: report equals the per-query inline form, and a 500-query eval is one plan") {
    // round 19 — r18 verdict task 4: the old form unioned one inline
    // knnHnsw plan per query. Parity: the batch-probe report must
    // equal the per-query-union report row-for-row (the pinned
    // inline ≡ indexed ≡ batch chain, composed).
    val queries = emb.orderBy("vec_id").limit(4)
      .select(col("vec_id").as("qid"), col("embedding"))
    val report = Similarity.hnswRecall(queries, "qid", "embedding",
      emb, "vec_id", "embedding", k = 10, nCells = 16, nProbe = 4,
      m = 6, ef = 12, rounds = 4)
    val perQueryApprox = queries.as[(Long, Seq[Float])].collect()
      .map { case (qid, qv) =>
        Similarity.knnHnsw(emb, "vec_id", "embedding", qv.toArray,
            k = 10, nCells = 16, nProbe = 4, m = 6, ef = 12, rounds = 4)
          .select(lit(qid).as("query_id"), col("id"))
      }.reduce(_ unionByName _)
    val exact = Similarity.knnBruteBatch(queries, "qid", "embedding",
      emb, "vec_id", "embedding", k = 10)
    val oldForm = Similarity.recallReport(queries, "qid",
      perQueryApprox, exact, 10)
    def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    assert(sortedRows(report) == sortedRows(oldForm),
      "batch-probe recall report diverges from the per-query form")
    // the scale point: 500 queries are ONE batch plan, not 500
    // unioned walks — this completes in seconds where the old form
    // took minutes to even plan
    val q500 = emb.limit(500)
      .select(col("vec_id").as("qid"), col("embedding"))
    val big = Similarity.hnswRecall(q500, "qid", "embedding",
      emb, "vec_id", "embedding", k = 10, nCells = 16, nProbe = 4,
      m = 6, ef = 12, rounds = 4)
    assert(big.count() == 500)
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
