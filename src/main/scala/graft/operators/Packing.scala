package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Sequence assembly for LLM training data: concat-and-chunk packing
  * and sliding-window chunking.
  *
  * Packing is how training pipelines turn variable-length documents
  * into fixed-length model sequences: concatenate documents in a
  * deterministic order and cut every `seqLen` tokens. A single global
  * concatenation order would be a one-partition window — the classic
  * scale-killer — so packing here is SHARDED: documents hash into
  * `numShards` independent streams, each packed by a windowed
  * cumulative sum partitioned on the shard. That is exactly how a real
  * 1000-executor packing job runs (each worker packs its shard; chunk
  * ids are (shard, local_chunk)), and it keeps every window bounded at
  * corpus_size / numShards rows. The shard hash is the same integer
  * scheme as [[TextAnalysis.splitLabel]] — engine-reproducible, no
  * xxhash64 — so a SQL oracle can replay the assignment exactly.
  */
object Packing {

  /** Deterministic shard in [0, numShards) from an integer id —
    * `((id % 2147483647) * 2654435761) % numShards`, the repo's
    * cross-engine integer hash (fits in a signed 64-bit intermediate
    * for any id ≥ 0).
    */
  def shardOf(id: Column, numShards: Int): Column = {
    require(numShards > 0)
    // pmod, not % — Spark's % keeps the dividend's sign, so a signed
    // id (e.g. an xxhash64-derived key) would produce a NEGATIVE
    // shard and silently break the documented [0, numShards) range
    pmod(pmod(id, lit(2147483647L)) * 2654435761L, lit(numShards.toLong))
  }

  /** Concat-and-chunk packing plan: each document is assigned to the
    * fixed-size sequence (chunk) in which its FIRST token lands when
    * its shard's documents are concatenated in `id` order. Documents
    * spanning a boundary belong to the chunk they start in (the
    * standard "document may straddle sequences" packing; the trainer
    * reads on from the next chunk).
    *
    * Output: one row per (shard, chunk_id) with n_docs and n_tokens —
    * the packing manifest a downstream writer would consume.
    */
  def packSequences(df: DataFrame, idCol: String, tokenCount: Column,
      seqLen: Int, numShards: Int): DataFrame = {
    require(seqLen > 0)
    val shard = shardOf(col(idCol), numShards)
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), shard.as("shard"), tokenCount.as("n_tok"))
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      // first-token offset of this doc within the shard's stream
      .withColumn("chunk_id",
        floor((col("cum_tok") - col("n_tok")) / lit(seqLen.toDouble)).cast("long"))
      .groupBy("shard", "chunk_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast("long").as("n_tokens"))
  }

  /** Length-bucketed batch manifest: group documents into token-length
    * buckets, then cut each (bucket, shard) stream into fixed-count
    * batches — the padding-minimizing layout for non-packed training
    * and inference: a batch pads every member to its own max length,
    * so batching SIMILAR lengths together is what turns O(maxlen)
    * waste into O(bucket width). `pad_tokens` in the output is that
    * waste, measured — the number a pipeline owner reads to size the
    * bucket bounds.
    *
    * No global sort, deliberately (the [[Sampling.curriculumOrder]]
    * stance): buckets come from FIXED bounds on the deterministic
    * token count (first bound above wins — `bucket` = how many bounds
    * the doc meets, so bucket 0 is the shortest band and
    * `bounds.size` the overflow band); the only window partitions by
    * (bucket, shard) with the decorrelated t18 second hash ordering,
    * so batch composition is independent of both id order and shard
    * choice, and every window stays corpus/(buckets·shards)-bounded.
    *
    * Output: one row per (bucket, shard, batch) — n_docs (≤
    * `batchSize`; the stream's last batch may be partial),
    * max_tokens, sum_tokens, pad_tokens = n_docs·max − sum.
    */
  /** [[lengthBucketBatches]]' bucket assignment alone — `bucket` =
    * how many (strictly increasing) bounds the token count meets, so
    * bucket 0 is the shortest band and `bounds.size` the overflow
    * band. Stateless per row, which is what lets the streaming twin
    * compose with it (the curriculumPhase stance).
    */
  def bucketOf(nTok: Column, bounds: Seq[Int]): Column = {
    require(bounds.nonEmpty &&
        bounds.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
      "bucketOf: bounds must be strictly increasing and non-empty " +
        "(duplicate bounds would create unreachable buckets)")
    bounds.tail.zipWithIndex
      .foldLeft(when(nTok < lit(bounds.head), 0)) {
        case (acc, (b, i)) => acc.when(nTok < lit(b), i + 1)
      }.otherwise(bounds.size).cast("int")
  }

  def lengthBucketBatches(df: DataFrame, idCol: String,
      tokenCount: Column, bounds: Seq[Int], batchSize: Int,
      numShards: Int): DataFrame = {
    require(batchSize > 0, "lengthBucketBatches: batchSize must be positive")
    require(bounds.nonEmpty &&
        bounds.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
      "lengthBucketBatches: bounds must be strictly increasing and " +
        "non-empty (duplicate bounds would create unreachable buckets)")
    df.select(col(idCol).as("id"), tokenCount.as("n_tok"))
      .withColumn("bucket", bucketOf(col("n_tok"), bounds))
      .withColumn("shard", shardOf(col("id"), numShards).cast("int"))
      .withColumn("_lb_ord", Sampling.curriculumOrd(col("id")))
      .withColumn("batch",
        floor((row_number().over(
          Window.partitionBy("bucket", "shard")
            .orderBy(col("_lb_ord"), col("id"))) - 1)
          / lit(batchSize.toDouble)).cast("int"))
      .groupBy("bucket", "shard", "batch")
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tok")).as("max_tokens"),
        sum(col("n_tok")).cast("long").as("sum_tokens"))
      .withColumn("pad_tokens",
        col("n_docs") * col("max_tokens") - col("sum_tokens"))
  }

  /** Input row shape for [[streamingPackSequences]]. */
  final case class PackInput(doc_id: Long, shard: Int, n_tok: Long)

  /** One packing assignment: the chunk (fixed `seqLen`-token
    * sequence) in which this document's first token lands within its
    * shard's stream, and the token offset where it starts.
    */
  final case class PackAssignment(doc_id: Long, shard: Int,
                                  chunk_id: Long, start_tok: Long)

  /** Per-shard state: tokens emitted so far. One long per shard —
    * state is O(numShards) forever, the smallest possible stateful
    * operator. Public for the state encoder.
    */
  final case class PackState(cumTok: Long)

  /** Streaming concat-and-chunk packing: documents are packed in
    * ARRIVAL order (micro-batch by micro-batch; deterministic id
    * order within a batch), each shard maintaining one cumulative
    * token counter. An assignment never changes once emitted — append
    * mode, no watermark, no retraction — which is exactly the
    * training-data ingest contract: the packer tells the writer where
    * each arriving document goes, and the sequence files fill in
    * order.
    *
    * Arrival order IS the semantic (what a live packer can do);
    * fed the whole corpus in one batch it reproduces the batch
    * manifest ([[packSequences]]) exactly, which is how the spec pins
    * the two against each other.
    */
  def streamingPackSequences(docs: DataFrame, idCol: String,
      tokenCount: Column, seqLen: Int, numShards: Int)
      (implicit spark: SparkSession): Dataset[PackAssignment] = {
    import spark.implicits._
    require(seqLen > 0)
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        shardOf(col(idCol), numShards).cast("int").as("shard"),
        tokenCount.cast("long").as("n_tok"))
      .as[PackInput]
      .groupByKey(_.shard)
      .flatMapGroupsWithState[PackState, PackAssignment](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (shard, it, state) =>
          var cum = state.getOption.map(_.cumTok).getOrElse(0L)
          val out = it.toSeq.sortBy(_.doc_id).map { d =>
            val start = cum
            cum += d.n_tok
            PackAssignment(d.doc_id, shard, start / seqLen, start)
          }
          state.update(PackState(cum))
          out.iterator
      }
  }

  /** One curriculum packing assignment: the chunk this document's
    * first token lands in within its (phase, shard) stream.
    */
  final case class CurriculumPackAssignment(doc_id: Long, phase: Int,
      shard: Int, chunk_id: Long, start_tok: Long)

  /** Batch curriculum packing: [[Sampling.curriculumOrder]]'s
    * (phase, shard, seq) layout driving [[packSequences]]'s
    * concat-and-chunk — each (phase, shard) is an independent pack
    * stream, documents concatenated in the curriculum's decorrelated
    * `seq` order, chunks cut every `seqLen` tokens. This is the
    * curriculum-corpus writer's job: phase 0's shards hold the best
    * band, already packed into model-ready sequences.
    *
    * Scale shape: the cumulative-sum window partitions by
    * (phase, shard) and orders by `seq` — the SAME (exchange, sort)
    * curriculumOrder's row_number already paid, so the composition
    * adds zero shuffles (spec-pinned: one exchange, no
    * SinglePartition). Output: one row per doc —
    * (doc_id, phase, shard, chunk_id, start_tok).
    */
  def curriculumPack(df: DataFrame, idCol: String, quality: Column,
      tokenCount: Column, seqLen: Int, nShards: Int,
      bounds: Seq[Double] = Seq(0.25, 0.5, 0.75)): DataFrame = {
    require(seqLen > 0)
    val ordered = Sampling.curriculumOrder(
      df.select(col(idCol), quality.as("_cp_q"), tokenCount.as("_cp_n")),
      idCol, col("_cp_q"), nShards, bounds)
    val w = Window.partitionBy("phase", "shard").orderBy("seq")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ordered
      .withColumn("_cp_cum", sum(col("_cp_n").cast("long")).over(w))
      .select(col(idCol).cast("long").as("doc_id"),
        col("phase"), col("shard"),
        floor((col("_cp_cum") - col("_cp_n")) / lit(seqLen.toDouble))
          .cast("long").as("chunk_id"),
        (col("_cp_cum") - col("_cp_n")).cast("long").as("start_tok"))
  }

  /** Streaming curriculum packing: a live ingest emits
    * curriculum-ordered packed shards — [[Sampling.curriculumPhase]]/
    * [[Sampling.curriculumShard]] assign each arriving document its
    * (phase, shard) stream statelessly (fixed quality bands, hash
    * shard — no window, which is exactly why the curriculum layout
    * streams), and one cumulative token counter per (phase, shard)
    * packs it ([[streamingPackSequences]]'s O(#streams) state, here
    * O(phases·nShards) longs). Within a micro-batch documents pack in
    * the curriculum's decorrelated (ord, id) order; across batches
    * arrival order is the semantic (the live-packer contract). Fed
    * the whole corpus in one batch it reproduces [[curriculumPack]]
    * exactly (spec-pinned), the same twin contract as
    * streamingPackSequences vs packSequences.
    */
  def streamingCurriculumPack(docs: DataFrame, idCol: String,
      quality: Column, tokenCount: Column, seqLen: Int, nShards: Int,
      bounds: Seq[Double] = Seq(0.25, 0.5, 0.75))
      (implicit spark: SparkSession): Dataset[CurriculumPackAssignment] = {
    import spark.implicits._
    // one stateful core (round-13 review): the assignment-only form
    // rides the doc-carrying packer with an empty payload, so the
    // grouping/ordering/counter-state logic exists exactly once
    streamingCurriculumPackDocs(
        docs.withColumn("_scp_payload", lit("")), idCol, quality,
        tokenCount, "_scp_payload", seqLen, nShards, bounds)
      .map(p => CurriculumPackAssignment(
        p.doc_id, p.phase, p.shard, p.chunk_id, p.start_tok))
  }

  /** One length-bucket batching assignment: the (bucket, shard)
    * stream's batch this document joins and its slot within it.
    */
  final case class LbAssignment(doc_id: Long, bucket: Int, shard: Int,
                                batch: Int, slot: Int, n_tok: Int)

  /** Per-(bucket, shard) state: documents assigned so far. One long
    * per group — O(buckets·numShards) state forever.
    */
  final case class LbState(nSeen: Long)

  /** Streaming length-bucketed batching: the ingest-time twin of
    * [[lengthBucketBatches]]. Bucket and shard assign STATELESSLY per
    * row (fixed bounds + the t18 hash — the property that makes the
    * layout streamable); the only state is one doc counter per
    * (bucket, shard), so batch = counter ÷ batchSize and slot =
    * counter mod batchSize at arrival, append-only, never retracted —
    * the writer contract: each arriving doc learns its batch file and
    * slot immediately. Within a micro-batch docs assign in the batch
    * twin's decorrelated (ord, id) order, so a one-batch run
    * reproduces [[lengthBucketBatches]]' batch membership exactly
    * (spec-pinned via the aggregated manifest).
    */
  def streamingLengthBucketBatches(docs: DataFrame, idCol: String,
      tokenCount: Column, bounds: Seq[Int], batchSize: Int,
      numShards: Int)
      (implicit spark: SparkSession): Dataset[LbAssignment] = {
    import spark.implicits._
    // one stateful core (round-13 review): the streamingCurriculumPack
    // delegation stance — empty payload through the doc-carrying
    // packer, counter logic in exactly one place
    streamingLengthBucketDocs(
        docs.withColumn("_slb_payload", lit("")), idCol, tokenCount,
        "_slb_payload", bounds, batchSize, numShards)
      .map(p => LbAssignment(
        p.doc_id, p.bucket, p.shard, p.batch, p.slot, p.n_tok))
  }

  /** Input row for the doc-carrying curriculum packer. */
  final case class CurriculumDocInput(doc_id: Long, phase: Int,
      shard: Int, ord: Long, n_tok: Long, text: String)

  /** One PACKED document: the curriculum assignment plus the payload
    * — what a training reader consumes directly off disk.
    */
  final case class CurriculumPackedDoc(doc_id: Long, phase: Int,
      shard: Int, chunk_id: Long, start_tok: Long, n_tok: Long,
      text: String)

  /** [[streamingCurriculumPack]] with the document payload carried
    * through the packer state, so the assignment can land ON DISK
    * next to its text — the missing leg between "a live corpus can
    * be curriculum-packed" and "a live corpus lands training-ready"
    * (round 13). Same O(phases·nShards) state, same one-batch-equals-
    * [[curriculumPack]] twin contract (spec-pinned through the
    * writer).
    */
  def streamingCurriculumPackDocs(docs: DataFrame, idCol: String,
      quality: Column, tokenCount: Column, textCol: String,
      seqLen: Int, nShards: Int,
      bounds: Seq[Double] = Seq(0.25, 0.5, 0.75))
      (implicit spark: SparkSession): Dataset[CurriculumPackedDoc] = {
    import spark.implicits._
    require(seqLen > 0)
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        Sampling.curriculumPhase(quality, bounds).as("phase"),
        Sampling.curriculumShard(col(idCol), nShards).as("shard"),
        Sampling.curriculumOrd(col(idCol)).cast("long").as("ord"),
        tokenCount.cast("long").as("n_tok"),
        col(textCol).as("text"))
      .as[CurriculumDocInput]
      .groupByKey(d => (d.phase, d.shard))
      .flatMapGroupsWithState[PackState, CurriculumPackedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((phase, shard), it, state) =>
          var cum = state.getOption.map(_.cumTok).getOrElse(0L)
          val out = it.toSeq.sortBy(d => (d.ord, d.doc_id)).map { d =>
            val start = cum
            cum += d.n_tok
            CurriculumPackedDoc(d.doc_id, phase, shard,
              start / seqLen, start, d.n_tok, d.text)
          }
          state.update(PackState(cum))
          out.iterator
      }
  }

  /** Land a live corpus curriculum-packed and training-ready: the
    * doc-carrying packer into Spark's transactional parquet file
    * sink, partitioned by (phase, shard) so each training stream is
    * one directory of chunk-ordered files. Exactly-once across
    * restarts is the FILE-SINK CHECKPOINT stance (the
    * streaming-core recovery contract, spec-pinned): offsets AND the
    * packer's per-(phase, shard) cumulative-token state live in
    * `checkpointPath`, and the sink's `_spark_metadata` commit log
    * means `spark.read.parquet(outPath)` sees only committed files —
    * a crash mid-batch replays into the same assignments (the state
    * rewinds with the offsets) and the half-written files are never
    * visible. Returns the started query; the caller owns its
    * lifecycle.
    */
  def writeCurriculumCorpus(docs: DataFrame, idCol: String,
      quality: Column, tokenCount: Column, textCol: String,
      seqLen: Int, nShards: Int, outPath: String, checkpointPath: String,
      bounds: Seq[Double] = Seq(0.25, 0.5, 0.75))
      (implicit spark: SparkSession): org.apache.spark.sql.streaming.StreamingQuery =
    streamingCurriculumPackDocs(docs, idCol, quality, tokenCount,
        textCol, seqLen, nShards, bounds)
      .writeStream.format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpointPath)
      .partitionBy("phase", "shard")
      .outputMode(OutputMode.Append())
      .start()

  /** Manifest of a landed curriculum corpus: one row per training
    * STREAM — (phase, shard, n_docs, n_tokens, n_complete_chunks,
    * tail_tokens). Stream-level on purpose (round-13 review fix): a
    * document longer than `seqLen` spans chunks no document STARTS
    * in, so a per-chunk grouping of doc rows has gaps exactly where
    * the corpus is densest; the token total per stream defines the
    * complete-chunk count with no gaps — chunks `0 until
    * n_complete_chunks` are full, `tail_tokens` sit in the one
    * trailing partial chunk a live stream always has. Derived from
    * the committed files, so always consistent with what a reader
    * sees.
    */
  def curriculumCorpusManifest(spark: SparkSession, path: String,
                               seqLen: Int): DataFrame =
    spark.read.parquet(path)
      .groupBy("phase", "shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"),
        floor(sum("n_tok") / lit(seqLen.toLong)).cast("long")
          .as("n_complete_chunks"),
        (sum("n_tok") % lit(seqLen.toLong)).as("tail_tokens"))

  /** One length-bucketed document with payload — [[LbAssignment]]
    * plus text, the on-disk row of [[writeLengthBucketCorpus]].
    */
  final case class LbDocInput(doc_id: Long, bucket: Int, shard: Int,
                              n_tok: Int, ord: Long, text: String)
  final case class LbPackedDoc(doc_id: Long, bucket: Int, shard: Int,
      batch: Int, slot: Int, n_tok: Int, text: String)

  /** [[streamingLengthBucketBatches]] with the payload carried — the
    * doc-carrying twin for the fixed-shape-batch training layout.
    */
  def streamingLengthBucketDocs(docs: DataFrame, idCol: String,
      tokenCount: Column, textCol: String, bounds: Seq[Int],
      batchSize: Int, numShards: Int)
      (implicit spark: SparkSession): Dataset[LbPackedDoc] = {
    import spark.implicits._
    require(batchSize > 0,
      "streamingLengthBucketDocs: batchSize must be positive")
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        bucketOf(tokenCount, bounds).as("bucket"),
        shardOf(col(idCol), numShards).cast("int").as("shard"),
        tokenCount.cast("int").as("n_tok"),
        Sampling.curriculumOrd(col(idCol)).cast("long").as("ord"),
        col(textCol).as("text"))
      .as[LbDocInput]
      .groupByKey(d => (d.bucket, d.shard))
      .flatMapGroupsWithState[LbState, LbPackedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((bucket, shard), it, state) =>
          var n = state.getOption.map(_.nSeen).getOrElse(0L)
          val out = it.toSeq.sortBy(d => (d.ord, d.doc_id)).map { d =>
            val a = LbPackedDoc(d.doc_id, bucket, shard,
              (n / batchSize).toInt, (n % batchSize).toInt, d.n_tok, d.text)
            n += 1
            a
          }
          state.update(LbState(n))
          out.iterator
      }
  }

  /** Land a live corpus length-bucket-batched and training-ready —
    * [[writeCurriculumCorpus]]'s file-sink checkpoint contract,
    * partitioned by (bucket, shard).
    */
  def writeLengthBucketCorpus(docs: DataFrame, idCol: String,
      tokenCount: Column, textCol: String, bounds: Seq[Int],
      batchSize: Int, numShards: Int, outPath: String,
      checkpointPath: String)
      (implicit spark: SparkSession): org.apache.spark.sql.streaming.StreamingQuery =
    streamingLengthBucketDocs(docs, idCol, tokenCount, textCol,
        bounds, batchSize, numShards)
      .writeStream.format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpointPath)
      .partitionBy("bucket", "shard")
      .outputMode(OutputMode.Append())
      .start()

  /** Manifest of a landed length-bucketed corpus: one row per
    * training batch — (bucket, shard, batch, n_docs, n_tokens,
    * full). Only `full` batches (n_docs == batchSize) are servable
    * with a fixed shape; each live (bucket, shard) stream has at
    * most one trailing partial batch.
    */
  def lengthBucketManifest(spark: SparkSession, path: String,
                           batchSize: Int): DataFrame =
    spark.read.parquet(path)
      .groupBy("bucket", "shard", "batch")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"),
        (count(lit(1)) === batchSize).as("full"))

  /** Sliding-window chunking: one row per (document, window) for
    * windows of `windowTokens` tokens advancing by `strideTokens`.
    * Start offsets are `{0, stride, 2·stride, …}` kept while the
    * window still contributes a token the previous one didn't —
    * i.e. `start < max(n_tok - max(window - stride, 0), 1)` — so an
    * empty document still yields its one (empty) chunk, every token is
    * covered when stride ≤ window, and a final window that would sit
    * entirely inside the previous one is dropped (a doc of exactly
    * `windowTokens` tokens yields ONE chunk, not a redundant second).
    * Pure narrow explode — rows fan out ~n_tok/stride per doc with no
    * shuffle; the downstream writer partitions however it likes.
    */
  def chunkWindows(df: DataFrame, idCol: String, tokenCount: Column,
      windowTokens: Int, strideTokens: Int): DataFrame = {
    require(windowTokens > 0 && strideTokens > 0)
    // stride > window would silently leave every (window, stride)
    // residue range of tokens in NO chunk — almost always transposed
    // arguments, and a violation of the coverage contract above.
    // Deliberate gap sampling should be composed explicitly.
    require(strideTokens <= windowTokens,
      s"chunkWindows: stride $strideTokens > window $windowTokens would " +
        "leave token gaps uncovered")
    val overlap = (windowTokens - strideTokens).toLong // ≥ 0 by the require
    df.select(col(idCol), tokenCount.cast("long").as("n_tok"))
      .withColumn("start_tok",
        explode(sequence(lit(0L),
          greatest(col("n_tok") - overlap - 1L, lit(0L)),
          lit(strideTokens.toLong))))
      .select(col(idCol),
        (col("start_tok") / strideTokens).cast("long").as("chunk_idx"),
        col("start_tok"),
        least(col("start_tok") + windowTokens, col("n_tok")).as("end_tok"))
  }
}
