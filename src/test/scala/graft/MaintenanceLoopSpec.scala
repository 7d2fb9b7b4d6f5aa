package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, IndexHealth, Retrieval, Similarity}

/** The living-corpus maintenance capstone (round 14 — verdict task 1):
  * for EACH of the four persisted index kinds, one end-to-end cycle
  * composed through the SAME driver loop body —
  *
  *   ingest batches → takedown → IndexHealth flags flip →
  *   IndexHealth.maintain runs the kind's own compaction/rebuild →
  *   probes stay row-identical across the fold → flags clear.
  *
  * Every leg exists and is unit-spec'd elsewhere (DedupSpec,
  * RetrievalSpec, SimilaritySpec, IndexHealthSpec); this spec pins
  * their COMPOSITION, because round 13's ledger-tombstone bug was a
  * composition bug no per-leg spec could see.
  *
  * Plus the round-14 takedown scale guard: every deleteFrom* fails
  * fast toward "rebuild, don't tombstone" when the PENDING tombstone
  * set (incoming + already written) would cross maxTombstones.
  */
class MaintenanceLoopSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("lsh cycle: ingest → takedown → flags → maintain compacts → probe parity, flags clear") {
    val src = tmp("graft-ml-lsh")
    val dst = tmp("graft-ml-lshc")
    val docs1 = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "red orange yellow green blue indigo violet ultraviolet"),
      (3L, "one two three four five six seven eight"),
      (4L, "north south east west up down left right"))
      .toDF("doc_id", "text")
    val docs2 = Seq(
      (5L, "monday tuesday wednesday thursday friday saturday sunday always"),
      (6L, "spring summer autumn winter rain snow wind sun"))
      .toDF("doc_id", "text")
    Dedup.writeLshIndex(docs1, "doc_id", "text", src)
    Dedup.appendToLshIndex(docs2, "doc_id", "text", src)
    // probe batch: exact twins of docs 2 and 5 → certain collisions
    val probeBatch = Seq(
      (102L, "red orange yellow green blue indigo violet ultraviolet"),
      (105L, "monday tuesday wednesday thursday friday saturday sunday always"))
      .toDF("doc_id", "text")
    def probe(path: String): Seq[String] =
      try sortedRows(Dedup.dedupAgainstLshIndex(
        probeBatch, "doc_id", "text", path, threshold = 0.5))
      finally Dedup.unpersistAll()
    val p1 = probe(src)
    assert(p1.size == 2, s"expected collisions with 2 and 5: $p1")

    Dedup.deleteFromLshIndex(Seq(2L).toDF("doc_id"), "doc_id", src)
    val p2 = probe(src)
    assert(p2.size == 1 && p2.forall(_.contains("5")),
      s"tombstoned doc still probe-visible: $p2")
    val flagged = IndexHealth.report(spark, src)
    assert(flagged.tombstones == 1 && flagged.needsCompact,
      flagged.toString)

    val r = IndexHealth.maintain(spark, src, dst)
    assert(r.action == "compacted" && r.activePath == dst, r.toString)
    assert(r.after.tombstones == 0 && !r.after.needsCompact &&
      r.after.totalRows == 5, r.after.toString)
    // the fold changed nothing a probe can see
    assert(probe(dst) == p2, "probe drifted across the compaction fold")
    // a clean index is a no-op pass
    val r2 = IndexHealth.maintain(spark, dst, tmp("graft-ml-lshc2"))
    assert(r2.action == "none" && r2.activePath == dst, r2.toString)
  }

  test("maintain folds the replay log on its own cadence: tail collapses, the guard stays a pointer read, probes untouched") {
    import graft.sources.BatchLog
    val src = tmp("graft-ml-lshlog")
    Dedup.writeLshIndex(
      Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"))
        .toDF("doc_id", "text"), "doc_id", "text", src)
    // two ingest batches: enough to grow a >1-file tail while the
    // data trees stay under the report's file-count compaction
    // threshold — the pass must be fold-ONLY
    val texts = Seq(
      "red orange yellow green blue indigo violet ultraviolet",
      "one two three four five six seven eight")
    texts.zipWithIndex.foreach { case (t, i) =>
      Dedup.lshIngestBatch("doc_id", "text", src)(
        Seq((10L + i, t)).toDF("doc_id", "text"), i.toLong)
      Dedup.unpersistAll()
    }
    val before = IndexHealth.report(spark, src)
    assert(before.replayLogTail == 2 && !before.needsCompact,
      before.toString)
    // a clean index with a grown log tail: maintain's only action is
    // the fold
    val r = IndexHealth.maintain(spark, src, tmp("graft-ml-lshlog-d"))
    assert(r.action == "log_folded" && r.activePath == src, r.toString)
    assert(r.after.replayLogTail == 0, r.after.toString)
    assert(BatchLog.watermark(spark, s"$src/ingest_log").contains(1L))
    // replay across the fold is still refused
    val rows = spark.read.parquet(s"$src/hashes").count()
    Dedup.lshIngestBatch("doc_id", "text", src)(
      Seq((10L, texts(0))).toDF("doc_id", "text"), 0L)
    Dedup.unpersistAll()
    assert(spark.read.parquet(s"$src/hashes").count() == rows)
    // and a re-pass is a full no-op (compact file alone never re-folds)
    val r2 = IndexHealth.maintain(spark, src, tmp("graft-ml-lshlog-d2"))
    assert(r2.action == "none", r2.toString)
  }

  test("exact-ledger cycle: ingest → takedown → flags → maintain compacts → admission parity, flags clear") {
    val src = tmp("graft-ml-led")
    val dst = tmp("graft-ml-ledc")
    Dedup.writeExactLedger(
      Seq("seen one", "seen two").toDF("text"), "text", src)
    Dedup.appendToExactLedger(Seq("seen three").toDF("text"), "text", src)
    val batch = Seq(
      (1L, "seen one"), (2L, "seen three"), (3L, "brand new"),
      (4L, "seen two")).toDF("doc_id", "text")
    def admitted(path: String): Seq[String] =
      try sortedRows(Dedup.admitAgainstExactLedger(
        batch, "doc_id", "text", path).select("doc_id"))
      finally Dedup.unpersistAll()
    assert(admitted(src) == Seq("[3]"), "only unseen content admits")

    // takedown: "seen two" must become admittable again
    Dedup.deleteFromExactLedger(Seq("seen two").toDF("text"), "text", src)
    val a2 = admitted(src)
    assert(a2 == Seq("[3]", "[4]"),
      s"tombstoned content still blocks admission: $a2")
    val flagged = IndexHealth.report(spark, src)
    assert(flagged.tombstones == 1 && flagged.needsCompact,
      flagged.toString)

    val r = IndexHealth.maintain(spark, src, dst)
    assert(r.action == "compacted" && r.activePath == dst, r.toString)
    assert(r.after.tombstones == 0 && !r.after.needsCompact &&
      r.after.totalRows == 2, r.after.toString)
    assert(admitted(dst) == a2, "admission drifted across the fold")
    val r2 = IndexHealth.maintain(spark, dst, tmp("graft-ml-ledc2"))
    assert(r2.action == "none" && r2.activePath == dst, r2.toString)
  }

  test("bm25 cycle: appends → takedown → flags → maintain compacts in place → probe parity, flags clear") {
    val dir = tmp("graft-ml-bm")
    Retrieval.writeBm25Index(
      Seq((1L, "spark shuffle join"), (2L, "spark streaming state"))
        .toDF("doc_id", "text"),
      "doc_id", "text", dir, numBuckets = 8)
    Retrieval.appendToBm25Index(
      Seq((3L, "hash join strategy"), (4L, "window aggregate join"))
        .toDF("doc_id", "text"),
      "doc_id", "text", dir)
    val queries = Seq((1, "spark join")).toDF("query_id", "qtext")
    def probe(): Seq[String] =
      try sortedRows(Retrieval.bm25AgainstIndex(
        queries, "query_id", "qtext", dir, k = 10))
      finally Dedup.unpersistAll()
    val p1 = probe()
    assert(p1.size == 4, s"all four docs match 'spark join': $p1")

    Retrieval.deleteFromBm25Index(spark, Seq(1L).toDF("id"), "id", dir)
    // row shape is [query_id, rank, doc_id, score] — doc_id is field 3
    val p2 = probe()
    assert(p2.size == 3 && !p2.exists(_.matches("""\[1,\d+,1,.*""")),
      s"tombstoned doc still probe-visible: $p2")
    val flagged = IndexHealth.report(spark, dir)
    assert(flagged.tombstones == 1 && flagged.generations == 2 &&
      flagged.needsCompact, flagged.toString)

    // BM25 compaction is in place: dstPath is ignored
    val r = IndexHealth.maintain(spark, dir, "/nonexistent/ignored")
    assert(r.action == "compacted" && r.activePath == dir, r.toString)
    // 4 docs × 3 distinct terms = 12 postings, minus doc 1's 3 = 9
    assert(r.after.tombstones == 0 && r.after.generations == 1 &&
      !r.after.needsCompact && r.after.totalRows == 9, r.after.toString)
    // the takedown's probe-time stats correction and the fold's
    // physical stats correction must agree bit for bit
    assert(probe() == p2, "probe drifted across the in-place compaction")
    val r2 = IndexHealth.maintain(spark, dir, "/nonexistent/ignored")
    assert(r2.action == "none" && r2.activePath == dir, r2.toString)
  }

  test("ivf cycle: append → takedown → flags → maintain rebuilds → exact-probe parity, flags clear") {
    val dir = tmp("graft-ml-ivf")
    val dst = tmp("graft-ml-ivfr")
    val emb = Tables.load(spark, sfDir, "embeddings").cache()
    val ids = emb.select("vec_id").orderBy("vec_id")
      .limit(3).collect().map(_.getLong(0))
    val total = emb.count()
    Similarity.writeIvfIndex(
      emb.where($"vec_id" =!= ids(0)), "vec_id", "embedding", dir,
      nCells = 4)
    Similarity.appendToIvfIndex(
      emb.where($"vec_id" === ids(0)), "vec_id", "embedding", dir)
    val qv = emb.where($"vec_id" === ids(1))
      .select("embedding").head().getSeq[Float](0).toArray
    // nProbe = nCells → the probe is exact, so parity across a
    // rebuild holds no matter how the retrained centroids move
    def probe(path: String, nProbe: Int): Seq[String] =
      sortedRows(Similarity.knnIvfIndexed(spark, path, qv, k = 5,
        nProbe = nProbe))
    val p1 = probe(dir, 4)
    assert(p1.size == 5, s"k=5 probe: $p1")

    Similarity.deleteFromIvfIndex(
      Seq(ids(1)).toDF("vec_id"), "vec_id", dir)
    val p2 = probe(dir, 4)
    assert(p2.size == 5 && !p2.exists(_.startsWith(s"[${ids(1)},")),
      s"tombstoned vector still probe-visible: $p2")
    val flagged = IndexHealth.report(spark, dir)
    assert(flagged.tombstones == 1 && flagged.needsCompact &&
      flagged.totalRows == total - 1, flagged.toString)

    val r = IndexHealth.maintain(spark, dir, dst)
    assert(r.action == "rebuilt" && r.activePath == dst, r.toString)
    assert(r.after.tombstones == 0 && !r.after.needsCompact &&
      r.after.totalRows == total - 1, r.after.toString)
    assert(probe(dst, 4) == p2, "probe drifted across the rebuild fold")
    val r2 = IndexHealth.maintain(spark, dst, tmp("graft-ml-ivfr2"))
    assert(r2.action == "none" && r2.activePath == dst, r2.toString)
  }

  test("ivf-pq maintain: default leg refuses (lossy codes); caller's rebuild leg closes the cycle") {
    val dir = tmp("graft-ml-ivfpq")
    val dst = tmp("graft-ml-ivfpqr")
    val emb = Tables.load(spark, sfDir, "embeddings").cache()
    val cb = Similarity.pqTrainCodebook(emb, "vec_id", "embedding",
      m = 4, nCodes = 16, sampleSize = 500, iters = 5, seed = 9)
    Similarity.writeIvfPqIndex(emb, "vec_id", "embedding", dir, cb,
      nCells = 4)
    val anyId = emb.select("vec_id").orderBy("vec_id").head().getLong(0)
    Similarity.deleteFromIvfIndex(Seq(anyId).toDF("vec_id"), "vec_id", dir)
    // PQ codes can't be decoded back to vectors — maintain must fail
    // fast rather than rebuild from garbage (and the message points at
    // the storeVectors fix)
    val e = intercept[IllegalArgumentException] {
      IndexHealth.maintain(spark, dir, dst)
    }
    assert(e.getMessage.contains("full-precision") &&
      e.getMessage.contains("storeVectors"), e.getMessage)
    // the caller's leg (closed over the current corpus) completes it
    val r = IndexHealth.maintain(spark, dir, dst,
      ivfRebuild = Some((src, d) =>
        Similarity.rebuildIvfPqIndex(emb, "vec_id", "embedding",
          src, d, nCells = 4, m = 4, nCodes = 16)))
    assert(r.action == "rebuilt" && r.activePath == dst, r.toString)
    assert(r.after.tombstones == 0 && !r.after.needsCompact &&
      r.after.totalRows == emb.count() - 1, r.after.toString)
  }

  test("ivf-pq storeVectors cycle: append keeps vectors → takedown → maintain self-rebuilds with NO caller leg → exact-probe parity, self-sufficiency survives") {
    val dir = tmp("graft-ml-ivfpqv")
    val dst = tmp("graft-ml-ivfpqvr")
    val emb = Tables.load(spark, sfDir, "embeddings").cache()
    val total = emb.count()
    val ids = emb.select("vec_id").orderBy("vec_id")
      .limit(3).collect().map(_.getLong(0))
    val cb = Similarity.pqTrainCodebook(emb, "vec_id", "embedding",
      m = 4, nCodes = 16, sampleSize = 500, iters = 5, seed = 9)
    Similarity.writeIvfPqIndex(
      emb.where($"vec_id" =!= ids(0)), "vec_id", "embedding", dir, cb,
      nCells = 4, storeVectors = true)
    // the append path must carry the vec column through (schema-driven,
    // like attrCols) or the self-rebuild would train on a partial corpus
    Similarity.appendToIvfPqIndex(
      emb.where($"vec_id" === ids(0)), "vec_id", "embedding", dir)
    val vecCount = spark.read.parquet(s"$dir/cells")
      .where(col("vec").isNotNull).count()
    assert(vecCount == total, s"stored vectors after append: $vecCount")

    val qv = emb.where($"vec_id" === ids(1))
      .select("embedding").head().getSeq[Float](0).toArray
    // nProbe = nCells and k·overfetch ≥ corpus → the probe is EXACT,
    // so parity across the retrained-codebook rebuild is guaranteed
    def probe(path: String): Seq[String] =
      sortedRows(Similarity.knnIvfPqIndexed(spark, path, emb,
        "vec_id", "embedding", qv, k = 5, nProbe = 4, overfetch = 100))
    val p1 = probe(dir)
    assert(p1.size == 5, s"k=5 probe: $p1")

    Similarity.deleteFromIvfIndex(Seq(ids(1)).toDF("vec_id"), "vec_id", dir)
    val p2 = probe(dir)
    assert(p2.size == 5 && !p2.exists(_.startsWith(s"[${ids(1)},")),
      s"tombstoned vector still probe-visible: $p2")
    val flagged = IndexHealth.report(spark, dir)
    assert(flagged.tombstones == 1 && flagged.needsCompact,
      flagged.toString)

    // NO ivfRebuild argument — the stored vectors are the corpus
    val r = IndexHealth.maintain(spark, dir, dst)
    assert(r.action == "rebuilt" && r.activePath == dst, r.toString)
    assert(r.after.tombstones == 0 && !r.after.needsCompact &&
      r.after.totalRows == total - 1, r.after.toString)
    assert(probe(dst) == p2, "probe drifted across the self-rebuild")
    // self-sufficiency survives: the rebuilt tree stores vectors again
    assert(spark.read.parquet(s"$dst/cells")
      .schema.fieldNames.contains("vec"), "rebuilt index lost its vectors")
    val r2 = IndexHealth.maintain(spark, dst, tmp("graft-ml-ivfpqv2"))
    assert(r2.action == "none" && r2.activePath == dst, r2.toString)
  }

  test("lsh maintain: a needsRebuild-only pass is a no-op that surfaces the flag, not a futile rewrite") {
    // bucket saturation (needsRebuild) with nothing to compact:
    // 1100 distinct ids sharing one text → every band has one
    // >1000-row bucket (satFrac 1.0), dupFrac 0 (ids distinct), no
    // tombstones. Compaction cannot clear saturation, so a periodic
    // maintain loop that ran it would rewrite the whole index every
    // pass forever (round-14 review fix) — the pass must be a no-op
    // with the flag surfaced for the caller's rebanding decision.
    val src = tmp("graft-ml-lshsat")
    val dst = tmp("graft-ml-lshsatc")
    val docs = spark.range(1100).select(col("id").as("doc_id"),
      lit("the same saturated text in every single document").as("text"))
    Dedup.writeLshIndex(docs, "doc_id", "text", src)
    val before = IndexHealth.report(spark, src)
    assert(before.needsRebuild && !before.needsCompact, before.toString)
    val r = IndexHealth.maintain(spark, src, dst)
    assert(r.action == "none" && r.activePath == src, r.toString)
    assert(r.after.needsRebuild, r.after.toString)
    val d = new java.io.File(dst)
    assert(!d.exists || d.list().isEmpty, "no-op pass must not write")
  }

  test("takedown scale guard: every deleteFrom* fails fast past maxTombstones, counting pending rows") {
    val lsh = tmp("graft-ml-g-lsh")
    val led = tmp("graft-ml-g-led")
    val bm = tmp("graft-ml-g-bm")
    val ivf = tmp("graft-ml-g-ivf")
    val docs = Seq(
      (1L, "aa bb cc dd"), (2L, "ee ff gg hh"), (3L, "ii jj kk ll"))
      .toDF("doc_id", "text")
    Dedup.writeLshIndex(docs, "doc_id", "text", lsh)
    Dedup.writeExactLedger(docs, "text", led)
    Retrieval.writeBm25Index(docs, "doc_id", "text", bm, numBuckets = 4)
    val emb = Tables.load(spark, sfDir, "embeddings").limit(50)
      .localCheckpoint()
    Similarity.writeIvfIndex(emb, "vec_id", "embedding", ivf, nCells = 2)

    def refuses(f: => Unit): Unit = {
      val e = intercept[IllegalArgumentException](f)
      assert(e.getMessage.contains("REBUILD"), e.getMessage)
    }
    val three = Seq(1L, 2L, 3L).toDF("doc_id")
    refuses(Dedup.deleteFromLshIndex(three, "doc_id", lsh,
      maxTombstones = 2))
    refuses(Dedup.deleteFromExactLedger(docs, "text", led,
      maxTombstones = 2))
    refuses(Retrieval.deleteFromBm25Index(spark, three, "doc_id", bm,
      maxTombstones = 2))
    refuses(Similarity.deleteFromIvfIndex(
      emb.select("vec_id"), "vec_id", ivf, maxTombstones = 2))
    // nothing was written by a refused delete
    assert(IndexHealth.report(spark, lsh).tombstones == 0)

    // BM25's guard counts the HELD set, not the request: tombstones
    // land only for ids the index holds, so a bulk takedown feed of
    // mostly-absent candidate ids must not be refused for rows that
    // would never be written (round-14 review fix) — 101 requested,
    // 1 held, ceiling 2 → proceeds and writes exactly the held row
    Retrieval.deleteFromBm25Index(spark,
      spark.range(5000, 5100).select(col("id").as("doc_id"))
        .unionByName(Seq(1L).toDF("doc_id")),
      "doc_id", bm, maxTombstones = 2)
    assert(IndexHealth.report(spark, bm).tombstones == 1)

    // the ceiling is CUMULATIVE: pending rows count against it
    Dedup.deleteFromLshIndex(Seq(1L).toDF("doc_id"), "doc_id", lsh,
      maxTombstones = 2)
    refuses(Dedup.deleteFromLshIndex(Seq(2L, 3L).toDF("doc_id"),
      "doc_id", lsh, maxTombstones = 2))
    // and an in-budget delete still lands
    Dedup.deleteFromLshIndex(Seq(2L).toDF("doc_id"), "doc_id", lsh,
      maxTombstones = 2)
    assert(IndexHealth.report(spark, lsh).tombstones == 2)
  }
}
