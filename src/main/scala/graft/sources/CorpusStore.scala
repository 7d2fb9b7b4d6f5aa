package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Versioned corpus snapshots: the BM25 index's generation-pointer
  * idiom (Retrieval.scala `CURRENT` protocol) applied to the corpus
  * ITSELF, so "which exact dataset version did run X train on?" has a
  * first-class answer. Two storage layouts share one commit protocol:
  *
  * FULL layout (round 14) under `path`:
  *  - `snapshots/gen=<g>/` — one IMMUTABLE parquet tree per version
  *    (whatever schema the caller's pipeline produces);
  *  - `meta/gen=<g>/` — a 1-row (gen, n_rows) manifest so listing
  *    versions never scans data;
  *  - `CURRENT` — "g" or "g b": the committed generation g and the
  *    oldest RETAINED generation b (b moves only at vacuum time).
  *    Both numbers ride one file so they commit in one atomic rename.
  *
  * COPY-ON-WRITE layout (round 15 — verdict task 1) under `path`:
  *  - `cowmeta/` — 1 row (id_col, num_buckets): the store's OWN
  *    content-defined partitioning (bucket = pmod(xxhash64(id), N)),
  *    fixed at init so every generation buckets identically;
  *  - `parts/gen=<g>/_cs_bucket=<b>/` — immutable PER-BUCKET trees; a
  *    generation writes ONLY the buckets it touches;
  *  - `manifest/gen=<g>/` — (bucket, src_gen, n_rows) rows: which
  *    generation OWNS each bucket of version g, and its row count
  *    (so occupancy/health stay metadata-scale). A read of version g
  *    unions exactly the manifest's referenced bucket trees;
  *  - `meta/gen=<g>/` + `CURRENT` — as above.
  *
  * Why COW: in the full layout a takedown of 100 docs from a 100 TB
  * corpus costs a 100 TB write ([[writeCorpusSnapshot]] materializes
  * every generation). Under COW, [[deleteFromCorpusCow]] /
  * [[upsertIntoCorpusCow]] read and rewrite ONLY the buckets the
  * changed ids hash into — cost = touched/num_buckets of the corpus —
  * and untouched buckets are SHARED across generations through the
  * manifest. num_buckets sets the granularity trade: rewrite cost per
  * touched bucket is corpus/N, while a k-id takedown touches ≤ k
  * buckets; size N so corpus/N is an acceptable single-job rewrite
  * (e.g. 4096 buckets × 25 GB at 100 TB).
  *
  * The pointer is the commit, in both layouts: a writer materializes
  * everything into generation-private directories no reader ever
  * lists, and the version becomes visible only when the `CURRENT`
  * rename lands. Readers resolve the pointer ONCE (at DataFrame
  * construction) to explicit generation paths, and generation
  * directories are never mutated after commit — so a reader that
  * resolved before a swap keeps reading its version bit-identically
  * while new readers see the new one (concurrent-reader safety across
  * swaps is spec-pinned in CorpusStoreSpec).
  *
  * WRITERS ARE SINGLE-WRITER PER PATH (round 15 — ADVICE): two
  * concurrent writers both resolve CURRENT=g and both materialize
  * generation g+1, and the interleaved data writes can publish one
  * writer's rows under the other's manifest. Every commit therefore
  * writes a writer-unique token into the generation it is about to
  * publish and re-reads it immediately before the CURRENT rename,
  * failing fast when another writer overwrote the directory in
  * between — a BEST-EFFORT tripwire (the verify→rename window is not
  * atomic without a CAS primitive the FileSystem API lacks), not a
  * lock. Serialize writers externally; readers need nothing.
  *
  * Retention is [[vacuumCorpusSnapshots]] in both layouts: the new
  * base commits in ONE atomic rename FIRST, then doomed directories
  * are deleted — under COW with a REFERENCE COUNT: a bucket tree of a
  * vacuumed generation survives while any retained generation's
  * manifest still points at it (spec-pinned), so sharing never breaks
  * a live version. Between-version review is [[snapshotDelta]] —
  * [[graft.operators.Dedup.snapshotDiff]] over two committed
  * generations: the full-outer exchange carries (id, 8-byte hash),
  * never document text.
  */
object CorpusStore {

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new org.apache.hadoop.fs.Path(path))

  /** Whether the store at `path` is copy-on-write. */
  def isCow(spark: SparkSession, path: String): Boolean =
    exists(spark, s"$path/cowmeta")

  /** The committed (gen, base) pair from `CURRENT` (the shared
    * [[GenPointer]] protocol — race-free read, see there); fails fast
    * on a store that was never committed.
    */
  def currentGen(spark: SparkSession, path: String): (Int, Int) = {
    require(GenPointer.exists(spark, path),
      s"CorpusStore: no CURRENT at $path — no committed snapshot")
    GenPointer.read(spark, path)
  }

  private def commitCurrent(spark: SparkSession, path: String,
                            gen: Int, base: Int): Unit =
    GenPointer.commit(spark, path, gen, base)

  /** Best-effort concurrent-writer tripwire (see the module doc's
    * single-writer contract), in two halves so the guarded window
    * covers the whole write phase, not just the final milliseconds
    * (round-15 review finding): [[stampWriterToken]] writes a
    * writer-unique token as an underscore file (ignored by parquet
    * readers) into a generation-private directory IMMEDIATELY after
    * that directory's data lands, and [[verifyWriterTokens]] re-reads
    * every stamp immediately before the CURRENT rename. A token that
    * changed or vanished means another writer overwrote that
    * directory somewhere between the two calls — the commit fails
    * fast rather than publish a manifest over the other writer's
    * data.
    */
  private def stampWriterToken(spark: SparkSession,
                               dir: String): (String, String) = {
    val f = fs(spark, dir)
    val p = new org.apache.hadoop.fs.Path(s"$dir/_WRITER")
    val token = java.util.UUID.randomUUID().toString
    val out = f.create(p, true)
    try out.write(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    (dir, token)
  }

  private def verifyWriterTokens(spark: SparkSession,
                                 stamps: Seq[(String, String)]): Unit =
    stamps.foreach { case (dir, token) =>
      val f = fs(spark, dir)
      val p = new org.apache.hadoop.fs.Path(s"$dir/_WRITER")
      // the file VANISHING is the concurrent-overwrite signature (we
      // wrote it — only another writer's directory overwrite removes
      // it); any OTHER read-back I/O failure PROPAGATES, since
      // mapping it to a mismatch would blame a concurrent writer for
      // a transient storage error and misdirect the operator toward
      // serializing writers instead of retrying
      val readBack =
        try {
          val in = f.open(p)
          val buf = new java.io.ByteArrayOutputStream(64)
          try {
            val chunk = new Array[Byte](256)
            var n = in.read(chunk)
            while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
          } finally in.close()
          new String(buf.toByteArray,
            java.nio.charset.StandardCharsets.UTF_8)
        } catch { case _: java.io.FileNotFoundException => "" }
      if (readBack != token)
        throw new IllegalStateException(
          s"CorpusStore: concurrent writer detected at $dir — another " +
            "writer overwrote this generation between its write and " +
            "commit. The store is single-writer per path; serialize " +
            "writers and retry.")
    }

  // ——— Full-materialization layout ——————————————————————————————————

  /** Commit `df` as the next corpus version and return its generation
    * (0 for a fresh store). The data and manifest land in
    * generation-private directories in OVERWRITE mode — a crashed
    * attempt's orphan is truncated on retry, making the write
    * idempotent — and only then does the atomic CURRENT rename
    * publish the version. The input may itself read the current
    * committed generation (read-modify-write): source and destination
    * directories never coincide. Full layout only — a COW store's
    * versions are written by [[writeCorpusCow]] /
    * [[upsertIntoCorpusCow]] / [[deleteFromCorpusCow]].
    */
  def writeCorpusSnapshot(df: DataFrame, path: String): Int = {
    val spark = df.sparkSession
    import spark.implicits._
    require(!isCow(spark, path),
      s"CorpusStore: $path is a copy-on-write store — use " +
        "writeCorpusCow/upsertIntoCorpusCow/deleteFromCorpusCow")
    val (gen, base) =
      if (GenPointer.exists(spark, path))
        currentGen(spark, path) match { case (g, b) => (g + 1, b) }
      else (0, 0)
    df.write.mode("overwrite").parquet(s"$path/snapshots/gen=$gen")
    val dataStamp = stampWriterToken(spark, s"$path/snapshots/gen=$gen")
    val n = spark.read.parquet(s"$path/snapshots/gen=$gen").count()
    Seq((gen, n)).toDF("gen", "n_rows")
      .repartition(1).write.mode("overwrite").parquet(s"$path/meta/gen=$gen")
    val metaStamp = stampWriterToken(spark, s"$path/meta/gen=$gen")
    verifyWriterTokens(spark, Seq(dataStamp, metaStamp))
    commitCurrent(spark, path, gen, base)
    gen
  }

  // ——— Copy-on-write layout —————————————————————————————————————————

  private def readCowMeta(spark: SparkSession, path: String): (String, Int) = {
    val r = spark.read.parquet(s"$path/cowmeta").head()
    (r.getAs[String]("id_col"), r.getAs[Int]("num_buckets"))
  }

  /** (bucket → (src_gen, n_rows)) of version `gen`'s manifest —
    * bounded by num_buckets. Carrying the per-bucket row count in the
    * manifest makes occupancy/health METADATA-scale (the IndexHealth
    * stance) and lets modifications derive their counts from the
    * previous manifest instead of re-counting touched buckets.
    * FORMAT NOTE: (bucket, src_gen, n_rows) is the COW manifest's v1
    * schema — the layout and this refactor shipped in the same round,
    * before any store crossed a session boundary, so there is no
    * 2-column legacy manifest to migrate; a FUTURE schema change must
    * add versioning here.
    */
  private def readCowManifest(spark: SparkSession, path: String,
                              gen: Int): Map[Int, (Int, Long)] =
    spark.read.parquet(s"$path/manifest/gen=$gen")
      .select("bucket", "src_gen", "n_rows").collect()
      .map(r => r.getInt(0) -> ((r.getInt(1), r.getLong(2)))).toMap

  private def cowBucketDir(path: String, srcGen: Int, bucket: Int): String =
    s"$path/parts/gen=$srcGen/_cs_bucket=$bucket"

  /** The content-defined bucket of each row — pmod(xxhash64(id), N):
    * stable across partition layouts, replays, and engines' row
    * orders, so a row's bucket is a pure function of its id.
    */
  private def bucketExpr(idCol: String, numBuckets: Int) =
    pmod(xxhash64(col(idCol)), lit(numBuckets.toLong)).cast("int")

  /** Shared COW commit tail: manifest + meta + writer-token
    * verification + pointer. `dataStamps` are the tokens stamped into
    * the generation's data trees right after their writes — verified
    * here, at the last moment before the rename, together with the
    * manifest's own stamp, so the tripwire covers the whole write
    * phase.
    */
  private def commitCowGen(spark: SparkSession, path: String, gen: Int,
      base: Int, manifest: Map[Int, (Int, Long)],
      dataStamps: Seq[(String, String)]): Int = {
    import spark.implicits._
    manifest.toSeq.map { case (b, (s, n)) => (b, s, n) }.sorted
      .toDF("bucket", "src_gen", "n_rows")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$path/manifest/gen=$gen")
    Seq((gen, manifest.values.map(_._2).sum)).toDF("gen", "n_rows")
      .repartition(1).write.mode("overwrite").parquet(s"$path/meta/gen=$gen")
    val manifestStamp = stampWriterToken(spark, s"$path/manifest/gen=$gen")
    verifyWriterTokens(spark, dataStamps :+ manifestStamp)
    commitCurrent(spark, path, gen, base)
    gen
  }

  /** Initialize a copy-on-write store (or commit a FULL rewrite of an
    * existing one — every bucket owned by the new generation, e.g.
    * after a corpus-wide refilter). `idCol`/`numBuckets` fix the
    * store's bucketing at init; a rewrite must pass the same values
    * (they are the sharing contract every manifest depends on).
    * Returns the committed generation.
    */
  def writeCorpusCow(df: DataFrame, path: String, idCol: String,
                     numBuckets: Int = 256): Int = {
    val spark = df.sparkSession
    import spark.implicits._
    require(numBuckets >= 1, "writeCorpusCow: numBuckets must be >= 1")
    require(df.columns.contains(idCol),
      s"writeCorpusCow: frame has no column '$idCol'")
    val (gen, base) =
      if (GenPointer.exists(spark, path)) {
        require(isCow(spark, path),
          s"CorpusStore: $path is a full-materialization store — use " +
            "writeCorpusSnapshot")
        val (storedId, storedN) = readCowMeta(spark, path)
        require(storedId == idCol && storedN == numBuckets,
          s"writeCorpusCow: store at $path buckets by " +
            s"pmod(xxhash64($storedId), $storedN); got ($idCol, $numBuckets)")
        currentGen(spark, path) match { case (g, b) => (g + 1, b) }
      } else {
        Seq((idCol, numBuckets)).toDF("id_col", "num_buckets")
          .repartition(1).write.mode("overwrite").parquet(s"$path/cowmeta")
        (0, 0)
      }
    df.withColumn("_cs_bucket", bucketExpr(idCol, numBuckets))
      .write.mode("overwrite").partitionBy("_cs_bucket")
      .parquet(s"$path/parts/gen=$gen")
    val dataStamp = stampWriterToken(spark, s"$path/parts/gen=$gen")
    // the written tree (with partition inference) names the buckets
    // this generation owns and the version's row count in one scan
    val counts = spark.read.parquet(s"$path/parts/gen=$gen")
      .groupBy("_cs_bucket").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "writeCorpusCow: refusing an empty corpus")
    commitCowGen(spark, path, gen, base,
      counts.map { case (b, n) => b -> ((gen, n)) }, Seq(dataStamp))
  }

  /** Shared body of upsert/delete: read ONLY the buckets the change
    * set hashes into (from whichever generations own them), transform
    * them, write the survivors as generation-private bucket trees,
    * and commit a manifest that points untouched buckets at their
    * existing owners. Cost is proportional to the touched buckets,
    * never the corpus.
    */
  private def cowModify(spark: SparkSession, path: String,
      changeBuckets: Array[Int],
      merge: Option[DataFrame] => DataFrame): Int = {
    val (idCol, numBuckets) = readCowMeta(spark, path)
    val (g, base) = currentGen(spark, path)
    val gen = g + 1
    val manifest = readCowManifest(spark, path, g)
    val oldDirs = changeBuckets.toSeq.sorted
      .flatMap(b => manifest.get(b).map { case (src, _) =>
        cowBucketDir(path, src, b)
      })
    val old =
      if (oldDirs.nonEmpty) Some(spark.read.parquet(oldDirs: _*)) else None
    val merged = merge(old)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val bucketOf = bucketExpr(idCol, numBuckets)
      val counts = merged.groupBy(bucketOf.as("_cs_bucket"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      require(counts.keySet.subsetOf(changeBuckets.toSet),
        "cowModify: merge produced rows outside the touched buckets")
      val dataStamps =
        if (counts.isEmpty) Nil
        else {
          merged.withColumn("_cs_bucket", bucketOf)
            .write.mode("overwrite").partitionBy("_cs_bucket")
            .parquet(s"$path/parts/gen=$gen")
          Seq(stampWriterToken(spark, s"$path/parts/gen=$gen"))
        }
      val newManifest = (manifest -- changeBuckets) ++
        counts.map { case (b, n) => b -> ((gen, n)) }
      // a takedown that would empty the store must not commit: the
      // store refuses empty corpora at init, and an empty CURRENT
      // would make every subsequent read fail — a full-corpus
      // takedown is a store drop, not a delete (round-15 review
      // finding)
      require(newManifest.nonEmpty,
        "CorpusStore: refusing to commit an EMPTY generation — this " +
          "change removes every remaining row; a full-corpus takedown " +
          "is a store drop, not a delete")
      commitCowGen(spark, path, gen, base, newManifest, dataStamps)
    } finally merged.unpersist(false)
  }

  /** The buckets a change frame's ids hash into — bounded collect
    * (≤ num_buckets distinct values).
    */
  private def touchedBuckets(df: DataFrame, idCol: String,
                             numBuckets: Int): Array[Int] =
    df.select(bucketExpr(idCol, numBuckets).as("_cs_bucket"))
      .distinct().collect().map(_.getInt(0))

  /** Upsert into a COW store: rows of `df` REPLACE same-id rows and
    * insert otherwise; only the buckets the incoming ids hash into
    * are read and rewritten. `df` must carry the store's full row
    * schema (it becomes the stored row) and be ID-UNIQUE — two rows
    * under one id have no deterministic survivor (dropping one
    * arbitrarily would make the committed content depend on partition
    * order), so a duplicated id FAILS FAST (round-15 review finding;
    * dedupe upstream — the admission operators exist for exactly
    * this). Returns the committed generation.
    */
  def upsertIntoCorpusCow(df: DataFrame, path: String): Int = {
    val spark = df.sparkSession
    require(isCow(spark, path),
      s"CorpusStore: $path is not a copy-on-write store")
    val (idCol, numBuckets) = readCowMeta(spark, path)
    require(df.columns.contains(idCol),
      s"upsertIntoCorpusCow: frame has no column '$idCol'")
    val changes = df.localCheckpoint()
    val dup = changes.groupBy(col(idCol)).agg(count(lit(1)).as("_cs_n"))
      .where(col("_cs_n") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"upsertIntoCorpusCow: duplicated id ${dup.head.get(0)} in the " +
        "change set — a keyed store has no deterministic survivor for " +
        "two rows under one id; dedupe the batch first")
    val touched = touchedBuckets(changes, idCol, numBuckets)
    require(touched.nonEmpty, "upsertIntoCorpusCow: empty change set")
    cowModify(spark, path, touched, {
      case Some(old) => old
        .join(changes.select(col(idCol)), Seq(idCol), "left_anti")
        .unionByName(changes)
      case None => changes
    })
  }

  /** Takedown from a COW store: remove the given ids. THE operation
    * COW exists for — a k-id takedown reads and rewrites at most k
    * buckets (corpus/num_buckets bytes each), never the corpus.
    * Unknown ids are harmless no-ops. Returns the committed
    * generation.
    */
  def deleteFromCorpusCow(ids: DataFrame, path: String): Int = {
    val spark = ids.sparkSession
    require(isCow(spark, path),
      s"CorpusStore: $path is not a copy-on-write store")
    val (idCol, numBuckets) = readCowMeta(spark, path)
    require(ids.columns.contains(idCol),
      s"deleteFromCorpusCow: frame has no column '$idCol'")
    val del = ids.select(col(idCol)).distinct().localCheckpoint()
    val touched = touchedBuckets(del, idCol, numBuckets)
    require(touched.nonEmpty, "deleteFromCorpusCow: empty takedown set")
    cowModify(spark, path, touched, {
      case Some(old) => old.join(broadcast(del), Seq(idCol), "left_anti")
      case None =>
        // no touched bucket physically exists: nothing to remove —
        // an empty frame in the store's row shape commits a
        // no-change generation
        spark.read.parquet(
          readCowManifest(spark, path, currentGen(spark, path)._1)
            .map { case (b, (src, _)) => cowBucketDir(path, src, b) }
            .toSeq.sorted: _*)
          .limit(0)
    })
  }

  /** One micro-batch of the streaming COW corpus writer — the
    * foreachBatch body that gives an ingest stream versioned,
    * replay-safe corpus commits (the [[graft.operators.Dedup]]
    * lshIngestBatch idiom applied to the corpus itself):
    *
    *  1. replay guard: `path/ingest_log` records (batch_id, gen);
    *     a restarted stream re-offering a logged batch id is a no-op,
    *     so batches commit exactly-once per batch id;
    *  2. the batch UPSERTS bucket-locally ([[upsertIntoCorpusCow]])
    *     — one new generation per non-empty micro-batch, touching
    *     only the buckets the batch's ids hash into;
    *  3. the batch id is logged with its committed generation.
    *
    * Crash window: a failure between the generation commit and the
    * log write leaves the batch unlogged, so the restarted stream
    * replays it and upserts AGAIN — one extra generation whose
    * content is identical (an upsert of the same rows replaces the
    * same ids), never wrong data; history gains a redundant version,
    * every read stays correct. Empty micro-batches commit nothing.
    * Batches must be ID-UNIQUE ([[upsertIntoCorpusCow]]'s fail-fast
    * contract — an intra-batch duplicated id has no deterministic
    * survivor); route the stream through an admission/dedup operator
    * first.
    *
    * Wire it:
    * {{{
    * docs.writeStream
    *   .foreachBatch(CorpusStore.cowIngestBatch(path) _)
    *   .start()
    * }}}
    */
  /** Whether an ingest log records `batchId`. "No log yet" is an
    * explicit existence check, NOT a swallowed read error (round-15
    * review finding): a corrupted log would otherwise silently
    * downgrade exactly-once to replay-everything forever —
    * corruption must surface loudly instead. Shared by
    * [[cowIngestBatch]] and [[graft.operators.Ingest]].
    */
  private[graft] def ingestLogContains(spark: SparkSession,
      logPath: String, batchId: Long): Boolean =
    exists(spark, logPath) &&
      spark.read.parquet(logPath)
        .where(col("batch_id") === batchId).limit(1).count() > 0

  /** The store's (id column, num buckets) — the keying contract
    * cross-store orchestrators need (package-private surface).
    */
  private[graft] def cowKey(spark: SparkSession,
                            path: String): (String, Int) = {
    require(isCow(spark, path),
      s"CorpusStore: $path is not a copy-on-write store")
    readCowMeta(spark, path)
  }

  def cowIngestBatch(path: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val logPath = s"$path/ingest_log"
    if (ingestLogContains(spark, logPath, batchId)) return
    // eager checkpoint: the upsert reads store paths it then mutates;
    // the streaming source's batch must also be pinned before reuse
    val b = batch.localCheckpoint()
    if (b.isEmpty) return
    val gen = upsertIntoCorpusCow(b, path)
    Seq((batchId, gen)).toDF("batch_id", "gen")
      .repartition(1).write.mode("append").parquet(logPath)
  }

  // ——— Reads (both layouts) —————————————————————————————————————————

  /** The committed corpus version — resolves CURRENT once, then reads
    * the explicit generation path(s) (no glob over other generations,
    * so concurrent writers and vacuum orphans are invisible).
    */
  def readCorpusSnapshot(spark: SparkSession, path: String): DataFrame =
    readCorpusSnapshotAt(spark, path, currentGen(spark, path)._1)

  /** Time-travel read of a specific retained generation. Fails fast
    * outside [base, CURRENT] — below base the data was vacuumed,
    * above CURRENT it was never committed (a crashed writer's orphan
    * directory must not be readable as if it were a version). Under
    * COW the read unions exactly the generation's manifest-referenced
    * bucket trees — a bounded path list, still resolved once.
    */
  def readCorpusSnapshotAt(spark: SparkSession, path: String,
                           gen: Int): DataFrame = {
    val (g, b) = currentGen(spark, path)
    require(gen >= b && gen <= g,
      s"CorpusStore: generation $gen is not retained at $path " +
        s"(committed $g, oldest retained $b)")
    if (isCow(spark, path)) {
      val manifest = readCowManifest(spark, path, gen)
      require(manifest.nonEmpty,
        s"CorpusStore: generation $gen at $path holds no rows")
      spark.read.parquet(manifest.toSeq.sortBy(_._1)
        .map { case (bk, (src, _)) => cowBucketDir(path, src, bk) }: _*)
    } else spark.read.parquet(s"$path/snapshots/gen=$gen")
  }

  /** (gen, n_rows) per retained version, from the 1-row manifests —
    * never scans snapshot data.
    */
  def listCorpusSnapshots(spark: SparkSession, path: String): DataFrame = {
    val (g, b) = currentGen(spark, path)
    spark.read
      .parquet((b to g).map(i => s"$path/meta/gen=$i"): _*)
      .orderBy("gen")
  }

  /** Between-version review: [[graft.operators.Dedup.snapshotDiff]]
    * (per id: added / removed / changed / unchanged) from generation
    * `genFrom` to `genTo`. Both must be retained. Works identically
    * across COW generations (the reads resolve through manifests).
    */
  def snapshotDelta(spark: SparkSession, path: String,
                    genFrom: Int, genTo: Int,
                    idCol: String, textCol: String): DataFrame =
    Dedup.snapshotDiff(
      readCorpusSnapshotAt(spark, path, genFrom),
      readCorpusSnapshotAt(spark, path, genTo), idCol, textCol)

  /** Trim time-travel history to the newest `keepLast` generations.
    * Ordering is the crash-safety contract: the new base commits in
    * ONE atomic rename FIRST — from that instant no new reader can
    * resolve a doomed generation — and only then are directories
    * below it deleted. A crash between the two leaves unreachable
    * orphan directories (readCorpusSnapshotAt refuses gens below
    * base; re-running the vacuum removes them). Readers that resolved
    * a doomed generation BEFORE the vacuum may fail mid-scan — trim
    * retention only past your longest reader, the same contract every
    * table-format vacuum carries.
    *
    * Under COW the physical delete is REFERENCE-COUNTED: a vacuumed
    * generation's manifest and meta go, but each of its bucket trees
    * survives while ANY retained generation's manifest still points
    * at it — sharing never breaks a live version (spec-pinned).
    */
  def vacuumCorpusSnapshots(spark: SparkSession, path: String,
                            keepLast: Int): Unit = {
    require(keepLast >= 1, "vacuumCorpusSnapshots: keepLast must be >= 1")
    val (g, b) = currentGen(spark, path)
    val newBase = math.max(b, g - keepLast + 1)
    if (newBase != b) commitCurrent(spark, path, g, newBase)
    val f = fs(spark, path)
    def rm(dir: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(dir)
      if (f.exists(p)) f.delete(p, true)
    }
    if (isCow(spark, path)) {
      // every (src_gen, bucket) a RETAINED manifest references must
      // survive — collected before any delete, bounded by
      // (retained gens) × num_buckets
      val referenced = (newBase to g).flatMap(i =>
        readCowManifest(spark, path, i).toSeq
          .map { case (bk, (src, _)) => (src, bk) })
        .toSet
      (0 until newBase).foreach { i =>
        rm(s"$path/manifest/gen=$i")
        rm(s"$path/meta/gen=$i")
        if (exists(spark, s"$path/parts/gen=$i")) {
          val buckets = cowBucketsOnDisk(spark, path, i)
          buckets.filterNot(bk => referenced((i, bk)))
            .foreach(bk => rm(cowBucketDir(path, i, bk)))
          if (buckets.forall(bk => !referenced((i, bk))))
            rm(s"$path/parts/gen=$i")
        }
      }
      // ABOVE-current orphans (crashed/abandoned writers): gens
      // STRICTLY past g+1 can never be resolved by a reader and can
      // never be an in-flight writer's work-in-progress either — an
      // in-flight writer materializes exactly g+1 (it read CURRENT=g)
      // and its own overwrite truncates that one on retry. g+1 itself
      // is left alone for that reason.
      cowGenDirsOnDisk(spark, path).filter(_ > g + 1).foreach { i =>
        rm(s"$path/parts/gen=$i")
        rm(s"$path/manifest/gen=$i")
        rm(s"$path/meta/gen=$i")
      }
    } else {
      (0 until newBase).foreach { i =>
        Seq("snapshots", "meta").foreach(d => rm(s"$path/$d/gen=$i"))
      }
    }
  }

  /** Generation numbers with a physical parts tree on disk —
    * committed or not (orphans included). Filesystem listing only.
    */
  private def cowGenDirsOnDisk(spark: SparkSession,
                               path: String): Seq[Int] = {
    val f = fs(spark, path)
    val root = new org.apache.hadoop.fs.Path(s"$path/parts")
    if (!f.exists(root)) Nil
    else f.listStatus(root).filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("gen=") =>
        n.stripPrefix("gen=").toInt
      }.toSeq.sorted
  }

  /** Bucket numbers with a physical tree under `parts/gen=<gen>` —
    * the ONE dir-listing idiom vacuum's refcount sweep and the health
    * report's orphan scan both use (round-15 review finding: a
    * naming/tolerance change must not be appliable to one and not the
    * other, or the reference set and the orphan set silently
    * disagree). Caller checks existence of the gen dir.
    */
  private def cowBucketsOnDisk(spark: SparkSession, path: String,
                               gen: Int): Seq[Int] =
    fs(spark, path)
      .listStatus(new org.apache.hadoop.fs.Path(s"$path/parts/gen=$gen"))
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("_cs_bucket=") =>
        n.stripPrefix("_cs_bucket=").toInt
      }.toSeq

  /** One health row for a COW store — the [[graft.operators
    * .IndexHealth]] stance applied to the corpus itself, and
    * METADATA-scale throughout: occupancy comes from the CURRENT
    * manifest's per-bucket row counts (never a data scan), orphans
    * from filesystem listings against the retained manifests'
    * reference set.
    *
    *  - `totalRows` / `populatedBuckets` / `maxBucket` / `skew`:
    *    CURRENT-version occupancy of the store's pruning unit (skew =
    *    max/mean over populated buckets — the worst-case
    *    touched-bucket rewrite multiplier);
    *  - `generations`: retained version count (g − base + 1);
    *  - `orphanDirs` / `orphanBytes`: bucket trees no retained
    *    manifest references (interrupted vacuums below base, crashed
    *    writers above CURRENT+1 — the in-flight g+1 slot is NOT
    *    counted, it may be a writer mid-materialization);
    *  - `needsVacuum`: orphans exist or retention exceeds
    *    `maxGenerations`. [[vacuumCorpusSnapshots]] clears both.
    */
  final case class CowHealth(
      current: Int, base: Int, generations: Int,
      totalRows: Long, numBuckets: Int, populatedBuckets: Int,
      maxBucket: Long, skew: Double,
      orphanDirs: Long, orphanBytes: Long,
      needsVacuum: Boolean)

  def cowHealthReport(spark: SparkSession, path: String,
                      maxGenerations: Int = 16): CowHealth = {
    require(isCow(spark, path),
      s"CorpusStore: $path is not a copy-on-write store")
    val (_, numBuckets) = readCowMeta(spark, path)
    val (g, b) = currentGen(spark, path)
    val cur = readCowManifest(spark, path, g)
    val total = cur.values.map(_._2).sum
    val maxB = if (cur.isEmpty) 0L else cur.values.map(_._2).max
    val mean = if (cur.isEmpty) 0.0 else total.toDouble / cur.size
    val referenced = (b to g).flatMap(i =>
      readCowManifest(spark, path, i).toSeq
        .map { case (bk, (src, _)) => (src, bk) })
      .toSet
    val f = fs(spark, path)
    val orphans = cowGenDirsOnDisk(spark, path)
      .filterNot(_ == g + 1) // possibly a writer mid-materialization
      .flatMap { i =>
        cowBucketsOnDisk(spark, path, i).map((i, _)).filterNot(referenced)
      }
    val orphanBytes = orphans.map { case (i, bk) =>
      f.getContentSummary(
        new org.apache.hadoop.fs.Path(cowBucketDir(path, i, bk)))
        .getLength
    }.sum
    CowHealth(
      current = g, base = b, generations = g - b + 1,
      totalRows = total, numBuckets = numBuckets,
      populatedBuckets = cur.size,
      maxBucket = maxB,
      skew = if (mean > 0) maxB / mean else 0.0,
      orphanDirs = orphans.size.toLong,
      orphanBytes = orphanBytes,
      needsVacuum = orphans.nonEmpty || (g - b + 1) > maxGenerations)
  }
}
