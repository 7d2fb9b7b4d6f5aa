package graft

import org.apache.spark.sql.functions._

import graft.operators.{Packing, TextAnalysis}

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, Int)*) =
    rows.toDF("id", "n")

  test("packSequences: chunks advance with the cumulative token count") {
    // one shard (numShards=1) to make the stream order obvious
    val d = docs(1L -> 100, 2L -> 900, 3L -> 100, 4L -> 1000, 5L -> 50)
    val out = Packing.packSequences(d, "id", col("n"),
        seqLen = 1000, numShards = 1)
      .orderBy("chunk_id")
      .select("chunk_id", "n_docs", "n_tokens")
      .as[(Long, Long, Long)].collect().toSeq
    // starts: 0,100,1000,1100,2100 → chunks 0,0,1,1,2
    assert(out == Seq((0L, 2L, 1000L), (1L, 2L, 1100L), (2L, 1L, 50L)))
  }

  test("packSequences: shard totals conserve every token") {
    val d = Tables.load(spark, sfDir, "documents")
    val tok = TextAnalysis.bpePieceCount(col("text"))
    val packed = Packing.packSequences(d, "doc_id", tok, 2048, 8)
    val packedTotal = packed.agg(sum("n_tokens")).head().getLong(0)
    val rawTotal = d.select(sum(tok.cast("long"))).head().getLong(0)
    assert(packedTotal == rawTotal)
    val nShards = packed.select("shard").distinct().count()
    assert(nShards > 1 && nShards <= 8)
  }

  test("packSequences: window is partitioned, never global") {
    val d = Tables.load(spark, sfDir, "documents")
    val plan = Packing.packSequences(d, "doc_id",
        TextAnalysis.bpePieceCount(col("text")), 2048, 8)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("windowspecdefinition(shard"),
      s"window must partition on shard:\n$plan")
  }

  test("chunkWindows: covers every token, stride-aligned") {
    val d = docs(1L -> 0, 2L -> 1, 3L -> 512, 4L -> 513, 5L -> 900)
    val out = Packing.chunkWindows(d, "id", col("n"), 512, 384)
      .orderBy("id", "chunk_idx")
      .select("id", "chunk_idx", "start_tok", "end_tok")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 0L, 0L),          // empty doc → one empty chunk
      (2L, 0L, 0L, 1L),
      (3L, 0L, 0L, 512L),        // exactly one window
      (4L, 0L, 0L, 512L), (4L, 1L, 384L, 513L),
      (5L, 0L, 0L, 512L), (5L, 1L, 384L, 896L), (5L, 2L, 768L, 900L)))
    // every token index < n is inside some [start, end) window
    out.groupBy(_._1).foreach { case (_, chunks) =>
      val n = chunks.map(_._4).max
      (0L until n).foreach { t =>
        assert(chunks.exists(c => c._3 <= t && t < c._4))
      }
    }
  }

  test("lengthBucketBatches: bucket bounds, per-batch aggregates, pad waste") {
    // batchSize 10 → one batch per bucket, so the aggregates are
    // order-independent and hand-checkable
    val d = docs(1L -> 3, 2L -> 4, 3L -> 7, 4L -> 12, 5L -> 20)
    val out = Packing.lengthBucketBatches(d, "id", col("n"),
        bounds = Seq(5, 10), batchSize = 10, numShards = 1)
      .orderBy("bucket")
      .select("bucket", "shard", "batch", "n_docs", "max_tokens",
        "sum_tokens", "pad_tokens")
      .as[(Int, Int, Int, Long, Int, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0, 0, 0, 2L, 4, 7L, 1L),    // 3,4 pad to 4 → 1 wasted
      (1, 0, 0, 1L, 7, 7L, 0L),
      (2, 0, 0, 2L, 20, 32L, 8L))) // 12,20 pad to 20 → 8 wasted
  }

  test("lengthBucketBatches: batches cut at batchSize, tokens conserved") {
    val d = docs((1L to 5L).map(_ -> 4): _*)
    val out = Packing.lengthBucketBatches(d, "id", col("n"),
        bounds = Seq(10), batchSize = 2, numShards = 1)
      .select("batch", "n_docs", "sum_tokens")
      .as[(Int, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._2) == Seq(2L, 2L, 1L), "5 docs at batchSize 2")
    assert(out.map(_._3).sum == 20L, "every token accounted for")
  }

  test("lengthBucketBatches: window partitions on (bucket, shard); bad args fail") {
    val d = Tables.load(spark, sfDir, "documents")
    val plan = Packing.lengthBucketBatches(d, "doc_id",
        TextAnalysis.wsTokenCount(col("text")),
        bounds = Seq(32, 56, 80), batchSize = 8, numShards = 4)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("windowspecdefinition(bucket"),
      s"window must partition on (bucket, shard), never global:\n$plan")
    intercept[IllegalArgumentException] {
      Packing.lengthBucketBatches(d, "doc_id", lit(1),
        bounds = Seq(5, 5), batchSize = 8, numShards = 4)
    }
    intercept[IllegalArgumentException] {
      Packing.lengthBucketBatches(d, "doc_id", lit(1),
        bounds = Seq(5), batchSize = 0, numShards = 4)
    }
  }

  test("streamingPackSequences: one-batch run reproduces the batch manifest") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = (0L until 100L).map(i => (i, (i * 37 % 500) + 1))
    val mem = MemoryStream[(Long, Long)]
    val q = Packing.streamingPackSequences(
        mem.toDS().toDF("doc_id", "n_tok"), "doc_id", col("n_tok"),
        seqLen = 1000, numShards = 4)
      .writeStream.format("memory").queryName("pack_one")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*); q.processAllAvailable()
      val streamed = spark.table("pack_one")
        .groupBy("shard", "chunk_id")
        .agg(count(lit(1)).as("n_docs"))
      val batch = Packing.packSequences(
          rows.toDF("doc_id", "n_tok"), "doc_id", col("n_tok"), 1000, 4)
        .select("shard", "chunk_id", "n_docs")
      assertSameRows(streamed.select("shard", "chunk_id", "n_docs"),
        batch.withColumn("shard", col("shard").cast("int")))
    } finally q.stop()
  }

  test("streamingPackSequences: counters continue across micro-batches in arrival order") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, Long)]
    // numShards=1 so every doc shares one counter
    val q = Packing.streamingPackSequences(
        mem.toDS().toDF("doc_id", "n_tok"), "doc_id", col("n_tok"),
        seqLen = 100, numShards = 1)
      .writeStream.format("memory").queryName("pack_cont")
      .outputMode("append").start()
    try {
      mem.addData((10L, 60L), (20L, 70L)); q.processAllAvailable()
      // batch 2 arrives with SMALLER ids — arrival order still appends
      mem.addData((1L, 50L)); q.processAllAvailable()
      val rows = spark.table("pack_cont")
        .select("doc_id", "chunk_id", "start_tok")
        .as[(Long, Long, Long)].collect().toSeq.sortBy(_._3)
      assert(rows == Seq((10L, 0L, 0L), (20L, 0L, 60L), (1L, 1L, 130L)))
    } finally q.stop()
  }

  test("writeCurriculumCorpus: training-ready files survive stop-and-restart — no loss, no dups, packer state recovered") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("graft-ccw").toString
    val seqLen = 200
    // (doc_id, quality, n_tok, text): quality spreads over the bands
    val rows = (0L until 80L).map(i =>
      (i, (i % 10) / 10.0, (i * 37 % 150) + 10, s"doc-$i"))
    val mem = MemoryStream[(Long, Double, Long, String)]
    def start() = Packing.writeCurriculumCorpus(
      mem.toDS().toDF("doc_id", "q", "n_tok", "text"),
      "doc_id", col("q"), col("n_tok"), "text",
      seqLen = seqLen, nShards = 2,
      outPath = s"$dir/out", checkpointPath = s"$dir/ckpt")
    val (a, b) = rows.splitAt(40)
    val q1 = start()
    try { mem.addData(a: _*); q1.processAllAvailable() } finally q1.stop()
    // data arriving while the writer is DOWN must land exactly once
    // after the restart (the file-sink checkpoint stance)
    mem.addData(b: _*)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val landed = spark.read.parquet(s"$dir/out")
    // 1) no loss, no dups — across the restart boundary
    val ids = landed.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == (0L until 80L).toSeq,
      s"lost or duplicated docs across restart: ${ids.size} rows")
    // 2) packer state recovered: per (phase, shard) the start_tok
    // chain is one unbroken cumulative sum in landing order — a
    // state loss would restart the counter at 0 mid-stream
    val chains = landed
      .select("phase", "shard", "start_tok", "n_tok")
      .as[(Int, Int, Long, Long)].collect()
      .groupBy(t => (t._1, t._2))
    chains.foreach { case ((p, s), rs) =>
      val sorted = rs.sortBy(_._3)
      var cum = 0L
      sorted.foreach { case (_, _, start, n) =>
        assert(start == cum,
          s"($p,$s): start_tok chain broken at $start (expected $cum)")
        cum += n
      }
    }
    // 3) the manifest reads the committed files: tokens conserve,
    // and per stream the complete-chunk arithmetic closes exactly
    // (n_complete_chunks·seqLen + tail_tokens == n_tokens — gap-free
    // even for docs longer than seqLen, the review fix)
    val man = Packing.curriculumCorpusManifest(spark, s"$dir/out", seqLen)
    assert(man.agg(sum("n_tokens")).head().getLong(0) ==
      rows.map(_._3).sum)
    man.select("n_tokens", "n_complete_chunks", "tail_tokens")
      .as[(Long, Long, Long)].collect().foreach { case (nt, nc, tail) =>
        assert(nc * seqLen + tail == nt && tail < seqLen,
          s"manifest arithmetic broken: $nt != $nc*$seqLen+$tail")
      }
  }

  test("writeLengthBucketCorpus: restart keeps batch slots contiguous; manifest marks full batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("graft-lbw").toString
    val rows = (0L until 60L).map(i =>
      (i, (i * 31 % 900) + 1, s"doc-$i"))
    val mem = MemoryStream[(Long, Long, String)]
    def start() = Packing.writeLengthBucketCorpus(
      mem.toDS().toDF("doc_id", "n_tok", "text"),
      "doc_id", col("n_tok"), "text",
      bounds = Seq(256, 512), batchSize = 4, numShards = 2,
      outPath = s"$dir/out", checkpointPath = s"$dir/ckpt")
    val (a, b) = rows.splitAt(30)
    val q1 = start()
    try { mem.addData(a: _*); q1.processAllAvailable() } finally q1.stop()
    mem.addData(b: _*)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val landed = spark.read.parquet(s"$dir/out")
    val ids = landed.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == (0L until 60L).toSeq, s"loss/dup: ${ids.size} rows")
    // counter state recovered: per (bucket, shard), (batch, slot)
    // positions are exactly 0..n-1 in batch-major order
    landed.select("bucket", "shard", "batch", "slot")
      .as[(Int, Int, Int, Int)].collect()
      .groupBy(t => (t._1, t._2))
      .foreach { case ((bk, sh), rs) =>
        val pos = rs.map(t => t._3 * 4 + t._4).sorted.toSeq
        assert(pos == (0 until rs.length).toSeq,
          s"($bk,$sh): slot sequence broken across restart: $pos")
      }
    val man = Packing.lengthBucketManifest(spark, s"$dir/out", batchSize = 4)
    val full = man.where(col("full")).select("n_docs")
      .as[Long].collect()
    assert(full.forall(_ == 4L))
    // at most one partial batch per (bucket, shard), and it is the last
    man.where(!col("full")).select("bucket", "shard", "batch", "n_docs")
      .as[(Int, Int, Int, Long)].collect()
      .groupBy(t => (t._1, t._2)).foreach { case (_, rs) =>
        assert(rs.length == 1 && rs.head._4 < 4)
      }
  }

  test("curriculumPack: curriculum layout and packing share ONE exchange") {
    // the cum-sum window keys on the same (phase, shard) as
    // curriculumOrder's row_number — a second exchange would mean the
    // composition re-shuffles the corpus it just laid out
    val d = Tables.load(spark, sfDir, "documents")
    val packed = Packing.curriculumPack(d, "doc_id",
      TextAnalysis.qualityScore(col("text")),
      TextAnalysis.bpePieceCount(col("text")), seqLen = 2048, nShards = 8)
    val plan = packed.queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected one exchange, got $exchanges:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"global window in curriculum pack:\n$plan")
    // tokens conserved: every doc's n_tok lands in exactly one chunk
    val tok = TextAnalysis.bpePieceCount(col("text"))
    val rawTotal = d.select(sum(tok.cast("long"))).head().getLong(0)
    val joined = packed.join(
      d.select(col("doc_id"), tok.cast("long").as("_n")), "doc_id")
    assert(joined.agg(sum("_n")).head().getLong(0) == rawTotal)
    // chunk ids advance with the cumulative count inside each stream
    val bad = joined
      .withColumn("_expect", floor(col("start_tok") / lit(2048.0)).cast("long"))
      .where(col("chunk_id") =!= col("_expect"))
    assert(bad.isEmpty, "chunk_id must be start_tok div seqLen")
  }

  test("repetitionMetrics: degenerate text flags, clean prose does not") {
    val d = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"),
      (2L, "the quick brown fox jumps over one lazy sleeping dog"),
      (3L, "a\na\na\na\na\nunique line here"),
      (4L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionMetrics(d, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "dup_word_frac", "dup_line_frac", "flagged")
      .as[(Long, Double, Double, Int)].collect().toSeq
    assert(out(0)._2 == 0.9 && out(0)._4 == 1)   // 10 words, 1 distinct
    assert(out(1)._2 == 0.0 && out(1)._4 == 0)
    assert(out(2)._3 == 4.0 / 6 && out(2)._4 == 1) // 6 lines, 2 distinct
    assert(out(3)._2 == 0.0 && out(3)._3 == 0.0 && out(3)._4 == 0)
  }
}
