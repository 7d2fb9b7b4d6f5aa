package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Order-of-magnitude scale probe (round 6): grow the CORPUS 10×
  * beyond the round-5 probes while holding duplicate DENSITY fixed,
  * and show runtime/candidates grow with the corpus, not its square.
  *
  * Why a new replication shape: [[ScaleProbe]] replicates every row
  * rep× with shifted ids, so every copy duplicates every other — the
  * true-pair count itself grows as rep²·n, and at rep=200 a probe
  * couldn't distinguish "runtime tracks candidates" (the claim that
  * carries to 100 TB) from "runtime tracks corpus²" (the failure it
  * exists to catch): both predict the same curve. Here replication
  * happens in GROUPS of 20 copies whose content is salted per group
  * (documents: a group token interleaved between words, so the
  * 3-token shingle sets of different groups are disjoint; embeddings:
  * the vector circular-shifted by the group index, which preserves
  * the norm and decorrelates groups), so a corpus replicated rep×
  * holds rep/20 disjoint 20-copy duplicate families. Corpus grows
  * 10×/30×/100×… while true pairs grow only 1×/3×/10× — the linear
  * and quadratic hypotheses finally predict different curves, and
  * three measured points per family show which one the operators
  * follow.
  *
  * Families probed (same operators, same configs as the oracle paths,
  * all in one process so the comparison is ambient-load-fair):
  * dedup LSH, embedding LSH, cross-corpus decontamination (unsalted —
  * its eval side is fixed, so growth is already linear by
  * construction), batch-ANN over a persisted IVF index (files-read
  * ratio), bloom runtime filter (surviving-row ratio at 10× the fact
  * side).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=16 \
  *   sbt "runMain graft.ScaleProbeXL [rep...]"   (default 20 60 200)
  */
object ScaleProbeXL {
  private val GroupSize = 20

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val reps: Seq[Int] =
      if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(20, 60, 200)
    // local-iteration family filter (comma-separated probe names as
    // printed in the [probe-xl] lines); empty/unset = run everything
    val families: Set[String] = sys.env.get("SPARK_GRAFT_PROBE_FAMILIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
    def fam(n: String): Boolean = families.isEmpty || families(n)
    // heap comes from build.sbt's fork JVM opts — spark.driver.memory
    // set at builder time is a no-op for an already-started local JVM
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.load(spark, sfDir, "documents")
    val emb = Tables.load(spark, sfDir, "embeddings")
    val d0 = docs.count()
    val n0 = emb.count()
    val dim = 64

    /** documents replicated rep× in GroupSize-copy families: copy i
      * gets shifted ids and the group token `zq<g>` interleaved
      * between words — same shingle set within a family, disjoint
      * shingle sets across families.
      *
      * Round 11: built with ONE explode(sequence) over the base scan
      * instead of a rep-way unionByName — identical rows, but the
      * plan stays O(1) in rep, which is what lets the 100× point
      * (rep 2000) plan and codegen in milliseconds rather than
      * minutes. The explode keeps the base file's partition count, so
      * a repartition restores the parallelism the per-copy scans used
      * to provide.
      */
    def saltedDocs(rep: Int): DataFrame = {
      val g = (col("i") / lit(GroupSize)).cast("int")
      // repartition the BASE scan, then explode locally inside each
      // task: same downstream parallelism as shuffling the exploded
      // frame, at 1/rep the exchange bytes (at rep 2000 the other
      // order would shuffle 2000× the corpus mass)
      docs.repartition(math.min(512, math.max(32, rep)))
        .select(explode(sequence(lit(0), lit(rep - 1))).as("i"),
          col("doc_id"), col("text"))
        .select(
          (col("doc_id") + col("i").cast("long") * lit(10000000L)).as("doc_id"),
          regexp_replace(col("text"), lit(" "),
            concat(lit(" zq"), g.cast("string"), lit(" "))).as("text"))
    }

    /** embeddings replicated rep× in GroupSize-copy families: copy i
      * circular-shifts the vector by its group index — norm-preserving
      * and (for these pseudo-random vectors) decorrelated across
      * families, exact twins within one.
      */
    def saltedEmb(rep: Int): DataFrame = {
      // same explode(sequence) shape as saltedDocs; the shift is
      // g mod dim so the expression stays valid past rep = 20·dim
      // (the pair families that NEED cross-family decorrelation run
      // at rep ≤ 200, far below the wrap)
      val g = (col("i") / lit(GroupSize)).cast("int") % lit(dim)
      emb.repartition(math.min(512, math.max(32, rep)))
        .select(explode(sequence(lit(0), lit(rep - 1))).as("i"),
          col("vec_id"), col("embedding"))
        .select(
          (col("vec_id") + col("i").cast("long") * lit(10000000L)).as("vec_id"),
          when(g === 0, col("embedding"))
            .otherwise(concat(
              slice(col("embedding"), g + lit(1), lit(dim) - g),
              slice(col("embedding"), lit(1), g))).as("embedding"))
    }

    // ── dedup LSH: pairs must scale with families (rep/20), not corpus² ──
    if (fam("minhash")) for (rep <- reps) {
      val big = saltedDocs(rep)
      val t0 = System.nanoTime()
      val nPairs = operators.Dedup.minhashDuplicates(
        big, "doc_id", "text", shingleK = 3, numHashes = 128,
        bands = 16, threshold = 0.5).count()
      operators.Dedup.unpersistAll()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe-xl] minhash rep=$rep%-4d docs=${d0 * rep}%-8d " +
        f"groups=${rep / GroupSize}%-3d pairs=$nPairs%-9d time=$sec%.1fs")
    }

    // ── embedding LSH: bitsPerBand=16 per the log2(corpus) rule ──
    if (fam("cosine")) for (rep <- reps) {
      val big = saltedEmb(rep)
      val t0 = System.nanoTime()
      val nPairs = operators.Similarity.cosineDuplicates(
        big, "vec_id", "embedding", dim = dim, threshold = 0.4,
        bands = 12, bitsPerBand = 16).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe-xl] cosine rep=$rep%-4d vectors=${n0 * rep}%-8d " +
        f"groups=${rep / GroupSize}%-3d pairs=$nPairs%-9d time=$sec%.1fs")
    }

    // ── distributed k-means (round 14): the strategy's claim is one
    // narrow aggregation job per Lloyd round (assign → posexplode →
    // decimal sums, collect bounded by nCells·dim) — so a 10× corpus
    // must cost ~10× per round with the driver-side work FLAT, and
    // the fit must stay bit-deterministic across the replication's
    // different partition layouts. The sampled strategy is timed
    // alongside: its cost is corpus-independent (bounded TakeOrdered
    // + driver Lloyd), the baseline the distributed rounds buy
    // corpus-true cell mass over. ──
    if (fam("kmeans-distributed")) for (rep <- Seq(reps.min, reps.max)) {
      val big = saltedEmb(rep)
      val t0 = System.nanoTime()
      val cd = operators.Similarity.kmeansDistributed(
        big, "vec_id", "embedding", nCells = 16, sampleSize = 4096,
        iters = 5, seed = 42L)
      val tDist = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      operators.Similarity.kmeansOnSample(
        big.select(col("vec_id").as("id"), col("embedding").as("vec"))
          .orderBy(xxhash64(col("id")), col("id")).limit(4096)
          .select("vec").collect()
          .map(_.getSeq[Float](0).map(_.toDouble).toArray),
        16, 20, 42L)
      val tSample = (System.nanoTime() - t1) / 1e9
      // determinism across layouts: same corpus, different partition
      // count → identical centroids (the decimal-sum claim)
      val cd2 = operators.Similarity.kmeansDistributed(
        big.repartition(7), "vec_id", "embedding", nCells = 16,
        sampleSize = 4096, iters = 5, seed = 42L)
      val det = cd.zip(cd2).forall { case (a, b) =>
        java.util.Arrays.equals(a, b) }
      println(f"[probe-xl] kmeans-distributed rep=$rep%-4d " +
        f"vectors=${n0 * rep}%-8d distributed=$tDist%.1fs " +
        f"sampled=$tSample%.1fs deterministic=$det")
    }

    // ── cross-corpus decontamination: eval fixed, train grows — the
    // unsalted replication is already the right shape (cross-pair
    // growth is linear in rep by construction) ──
    val evalSplit = docs.where(col("doc_id") % 10 === 0)
    val train1 = docs.where(col("doc_id") % 10 =!= 0)
    if (fam("decontaminate")) for (rep <- reps) {
      val train = (0 until rep).map { i =>
        train1.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          col("text"))
      }.reduce(_ unionByName _)
      val t0 = System.nanoTime()
      val nPairs = operators.Dedup.decontaminate(
        train, evalSplit, "doc_id", "text").count()
      operators.Dedup.unpersistAll()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe-xl] decontaminate rep=$rep%-4d " +
        f"train=${train1.count() * rep}%-8d pairs=$nPairs%-9d time=$sec%.1fs")
    }

    // ── batch-ANN over a persisted IVF index at 400k vectors: the
    // carrying metric is files read / total files ──
    if (fam("batch-ann")) {
      val rep = reps.max
      val big = saltedEmb(rep)
      val queries5 = emb.orderBy("vec_id").limit(5)
      val dir = java.nio.file.Files.createTempDirectory("graft-xl-ivf").toString
      val t1 = System.nanoTime()
      operators.Similarity.writeIvfIndex(big, "vec_id", "embedding", dir,
        nCells = 64)
      val tBuild = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val probeDf = operators.Similarity.knnIvfBatchIndexed(spark, dir,
        queries5, "vec_id", "embedding", k = 10, nProbe = 4)
      val probeFiles = sources.Layout.filesRead(probeDf)
      val tProbe = (System.nanoTime() - t2) / 1e9
      val totalFiles = sources.Layout.filesRead(
        spark.read.parquet(s"$dir/cells").select(count(lit(1))))
      val stats = operators.Similarity.cellStats(spark, dir)
      println(f"[probe-xl] batch-ann rep=$rep%-4d vectors=${n0 * rep}%-8d " +
        f"build=$tBuild%.1fs probe=$tProbe%.1fs " +
        f"files=$probeFiles/$totalFiles skew=${stats.skew}%.2f")
    }

    // ── filtered IVF-PQ (round 9): fixed 5-query filtered probe
    // against a 1× vs 10× attr-carrying compressed index. Carrying
    // claims: the probed-cell file FRACTION stays ≈ |∪ probed cells| /
    // nCells at both scales (static-isin partition pruning is
    // scale-independent), and probe time grows with the probed cells'
    // code bytes — never a full-index or full-float scan. ──
    if (fam("filtered-ivfpq")) for (rep <- Seq(reps.min, reps.max)) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-xl-fpq$rep").toString
      val big = saltedEmb(rep).withColumn("label", col("vec_id") % 10)
        .localCheckpoint()
      val queries5 = emb.orderBy("vec_id").limit(5)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val cb = operators.Similarity.pqSeededCodebook(
        big, "vec_id", "embedding", m = 8, nCodes = 16)
      val tb = System.nanoTime()
      operators.Similarity.writeIvfPqIndex(big, "vec_id", "embedding",
        dir, cb, nCells = 64, attrCols = Seq("label"))
      val tBuild = (System.nanoTime() - tb) / 1e9
      val tp = System.nanoTime()
      val n = operators.Similarity.knnIvfPqBatchIndexedFiltered(
        spark, dir, big, "vec_id", "embedding", queries5, "query_id",
        "embedding", col("label") % 2 === 0, k = 10, nProbe = 4).count()
      val tProbe = (System.nanoTime() - tp) / 1e9
      // probed-cell union recomputed driver-side (the probe's own
      // ranking math) → file counts by directory
      val cents = spark.read.parquet(s"$dir/centroids").collect()
        .map(r => (r.getInt(r.fieldIndex("cell")),
          r.getSeq[Double](r.fieldIndex("cv")).toArray))
        .sortBy(_._1).map(_._2)
      val probed = queries5.collect().flatMap { row =>
        val q = row.getSeq[Float](1).map(_.toDouble).toArray
        cents.zipWithIndex
          .map { case (c, i) => (c.zip(q).map(t => t._1 * t._2).sum, i) }
          .sortBy { case (s, cIdx) => (-s, cIdx) }.take(4).map(_._2)
      }.toSet
      def filesIn(p: java.io.File): Int =
        if (!p.isDirectory) 0
        else p.listFiles().map(f =>
          if (f.isDirectory) filesIn(f)
          else if (f.getName.endsWith(".parquet")) 1 else 0).sum
      val cellRoot = new java.io.File(s"$dir/cells")
      val totalFiles = filesIn(cellRoot)
      val probedFiles = probed.toSeq.map(c =>
        filesIn(new java.io.File(s"$dir/cells/cell=$c"))).sum
      println(f"[probe-xl] filtered-ivfpq rep=$rep%-4d " +
        f"vectors=${n0 * rep}%-8d build=$tBuild%.1fs probe=$tProbe%.1fs " +
        f"rows=$n%-3d files=$probedFiles/$totalFiles " +
        f"cells=${probed.size}/64")
    }

    // ── graph-ANN batch probe (round 18 — r17 verdict task 1): the
    // probe is DISTRIBUTED — per-query probed cells computed in the
    // plan, query fan-out via a cogroup on cell — so DRIVER heap must
    // stay flat as the query batch grows 100× (the old form collected
    // every query vector and shipped a per-cell map in the task
    // closure: O(|Q|·dim) driver bytes + an O(|Q|²) scan). One index
    // build, then batches of 50 / 500 / 5000 queries; the carrying
    // metrics are probe time ≲ linear in |Q| and the driver-heap
    // delta NOT tracking |Q|. ──
    if (fam("hnsw-batch")) {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-xl-hnsw").toString
      val big = saltedEmb(20)
      val tb = System.nanoTime()
      operators.Similarity.writeHnswIndex(big, "vec_id", "embedding", dir,
        nCells = 64, m = 6)
      val tBuild = (System.nanoTime() - tb) / 1e9
      def usedHeapMb(): Long = {
        System.gc(); System.gc()
        val r = Runtime.getRuntime
        (r.totalMemory - r.freeMemory) / (1024 * 1024)
      }
      for (nq <- Seq(50, 500, 5000)) {
        // queries derive from the corpus with shifted ids — same dim,
        // deterministic, |Q|-scalable without touching the driver
        val queries = emb.repartition(32)
          .select(explode(sequence(lit(0), lit((nq + n0 - 1) / n0 - 1)))
            .as("i"), col("vec_id"), col("embedding"))
          .select((col("vec_id") + col("i") * lit(10000000L))
            .as("query_id"), col("embedding"))
          .orderBy("query_id").limit(nq).localCheckpoint()
        val h0 = usedHeapMb()
        val t0 = System.nanoTime()
        val n = operators.Similarity.knnHnswBatch(spark, dir, queries,
          "query_id", "embedding", k = 10, nProbe = 4).count()
        val sec = (System.nanoTime() - t0) / 1e9
        val h1 = usedHeapMb()
        println(f"[probe-xl] hnsw-batch queries=$nq%-5d rows=$n%-7d " +
          f"build=$tBuild%.1fs probe=$sec%.1fs " +
          f"driver_heap=${h0}MB->${h1}MB (delta ${h1 - h0}MB)")
      }
    }

    // ── graph walk on PQ codes (round 19 — r18 verdict task 1): grow
    // the probed cell ~100× (6k → 500k nodes) and compare the float
    // walk's task footprint against the coded walk's. The float
    // walk's cogroup holds every probed cell's float64 vectors in
    // one task heap — dim·8 B/node payload plus the boxed decode —
    // so its peak TRACKS cell·dim; the coded walk replaces that
    // payload with pqM·4-byte codes + an 8-byte norm (the analytic
    // walk_bytes columns, ~13× apart at every scale and
    // DIM-INDEPENDENT — at dim 1024 the gap is 32×) and point-reads
    // only the final beam's floats. Residual coded growth is the
    // rank-indexed adjacency + codes — inherent to walking a cell's
    // graph in one task, and independent of the vector width that
    // makes embedding corpora big. The ANALYTIC columns carry the
    // claim; the measured peak is a whole-JVM sample (all local
    // tasks + parquet decode + shuffle buffers + GC timing) and
    // reads noisy across runs: float 1774–3011 MB at the 500k cell
    // across two runs (always TRACKING the cell: ~200 → ~800 →
    // 1774+ MB), coded 1558–1801 MB (dominated by the shuffle/decode
    // machinery both paths share, not the scoring payload — the
    // retained per-task scoring state is 264 MB of double vectors vs
    // 24 MB of codes at 500k nodes). rows=10 results per probe pin
    // that both paths still answer. ──
    // synthesize a single-cell graph index directly — the whole
    // replicated corpus in ONE cell, ring adjacency (rank ±1..3) from
    // a single window pass. The walk contract only needs SOME
    // adjacency; a quadratic kNN build at 500k-node cells would
    // measure build cost, not the walk claims under test. Shared by
    // the coded-mem and hot-cell families.
    def buildRingIndex(rep: Int): (String, Long) = {
      import spark.implicits._
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-xl-hnswring$rep").toString
      val big = saltedEmb(rep)
        .withColumn("cell", lit(0)).localCheckpoint()
      val n = big.count()
      big.select(col("cell"), col("vec_id").as("id"),
          col("embedding").as("vec"))
        .write.partitionBy("cell").parquet(s"$dir/cells")
      val w = org.apache.spark.sql.expressions.Window.orderBy("id")
      spark.read.parquet(s"$dir/cells").select("cell", "id")
        .withColumn("nbrs", array_sort(filter(array(
          lag("id", 3).over(w), lag("id", 2).over(w),
          lag("id", 1).over(w), lead("id", 1).over(w),
          lead("id", 2).over(w), lead("id", 3).over(w)),
          x => x.isNotNull)))
        .write.partitionBy("cell").parquet(s"$dir/graph")
      emb.orderBy("vec_id").limit(1)
        .select(col("embedding").cast("array<double>").as("cv"),
          lit(0).as("cell"))
        .repartition(1).write.parquet(s"$dir/centroids")
      Seq((6, 1, n)).toDF("m", "n_cells", "n_built")
        .repartition(1).write.parquet(s"$dir/hnswmeta")
      operators.Similarity.addPqToHnswIndex(spark, dir, pqM = 8,
        nCodes = 16)
      (dir, n)
    }

    if (fam("hnsw-coded-mem")) {
      import spark.implicits._
      for (rep <- Seq(3, 25, 250)) {
        val (dir, n) = buildRingIndex(rep)
        val floatBytes = n * dim * 8L
        val codedBytes = n * (8L * 4L + 8L)
        val q = emb.orderBy("vec_id").limit(1)
          .select(col("vec_id").as("query_id"), col("embedding"))
          .localCheckpoint()
        def peakDuring(run: () => Long): (Long, Long, Double) = {
          System.gc(); System.gc()
          val rt = Runtime.getRuntime
          val base = rt.totalMemory - rt.freeMemory
          @volatile var peak = base
          @volatile var stop = false
          val sampler = new Thread(() => {
            while (!stop) {
              val u = rt.totalMemory - rt.freeMemory
              if (u > peak) peak = u
              Thread.sleep(20)
            }
          })
          sampler.setDaemon(true)
          sampler.start()
          val t0 = System.nanoTime()
          val got = run()
          val sec = (System.nanoTime() - t0) / 1e9
          stop = true
          sampler.join()
          (got, math.max(0L, peak - base) / (1024 * 1024), sec)
        }
        val (nf, fPeak, fSec) = peakDuring(() =>
          operators.Similarity.knnHnswBatch(spark, dir, q, "query_id",
            "embedding", k = 10, nProbe = 1).count())
        val (nc, cPeak, cSec) = peakDuring(() =>
          operators.Similarity.knnHnswBatchCoded(spark, dir, q,
            "query_id", "embedding", k = 10, nProbe = 1).count())
        println(f"[probe-xl] hnsw-coded-mem rep=$rep%-4d cell=$n%-8d " +
          f"float: rows=$nf walk_bytes=${floatBytes / 1024}%-7dKB " +
          f"peak=${fPeak}MB $fSec%.1fs | " +
          f"coded: rows=$nc walk_bytes=${codedBytes / 1024}%-6dKB " +
          f"peak=${cPeak}MB $cSec%.1fs")
      }
    }

    // ── hot-cell fan-out (round 19 — r18 verdict task 3): 1024
    // queries all probing ONE 50k-node cell. Unsalted, the cogroup
    // walks them serially in one task; salted, the cell replicates
    // across ≤32 keys and the walks parallelize. Carrying metric:
    // salted wall-clock well under serial on the SAME query set with
    // row-identical output counts. Measured on the coded walk (code
    // replication is ~16× cheaper through the shuffle than floats —
    // the composition argument for salting + codes). ──
    if (fam("hnsw-hot-cell")) {
      import spark.implicits._
      val (dir, n) = buildRingIndex(25)
      val qv = emb.orderBy("vec_id").limit(1)
        .select(col("embedding")).as[Seq[Float]].head()
      val nq = 1024
      val hot = spark.range(0, nq)
        .select(col("id").as("query_id"),
          typedlit(qv).cast("array<float>").as("embedding"))
        .localCheckpoint()
      def timed(saltPerTask: Int): (Long, Double) = {
        val t0 = System.nanoTime()
        val got = operators.Similarity.knnHnswBatchCoded(spark, dir, hot,
          "query_id", "embedding", k = 10, nProbe = 1, ef = 100,
          rounds = 4, saltQueriesPerTask = saltPerTask).count()
        (got, (System.nanoTime() - t0) / 1e9)
      }
      val (rowsSerial, serialSec) = timed(Int.MaxValue)
      val (rowsSalted, saltedSec) = timed(64)
      println(f"[probe-xl] hnsw-hot-cell cell=$n%-7d queries=$nq " +
        f"serial: rows=$rowsSerial $serialSec%.1fs | " +
        f"salted(<=32 keys): rows=$rowsSalted $saltedSec%.1fs " +
        f"(speedup ${serialSec / saltedSec}%.1fx)")
    }

    // ── persisted LSH index: probe a FIXED ingest batch against a 1×
    // vs 10× index. The incremental-dedup claim that carries to
    // 100 TB is that probe cost tracks the BATCH and its candidates
    // (the batch matches only group-0 families, so true pairs are
    // fixed by construction); index growth contributes only the
    // columnar (band, bucket) scan. Build time may grow linearly —
    // that is the once-per-corpus cost the index exists to amortize. ──
    if (fam("lsh-index")) for (rep <- Seq(reps.min, reps.max)) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-xl-lsh$rep").toString
      val big = saltedDocs(rep)
      val batch = evalSplit.select(
        (col("doc_id") + lit(900000000L)).as("doc_id"),
        regexp_replace(col("text"), " ", " zq0 ").as("text"))
      val tb0 = System.nanoTime()
      operators.Dedup.writeLshIndex(big, "doc_id", "text", dir)
      operators.Dedup.unpersistAll()
      val tBuild = (System.nanoTime() - tb0) / 1e9
      val tp0 = System.nanoTime()
      val nPairs = operators.Dedup.dedupAgainstLshIndex(
        batch, "doc_id", "text", dir).count()
      operators.Dedup.unpersistAll()
      val tProbe = (System.nanoTime() - tp0) / 1e9
      println(f"[probe-xl] lsh-index rep=$rep%-4d indexed=${d0 * rep}%-8d " +
        f"build=$tBuild%.1fs probe=$tProbe%.1fs pairs=$nPairs%-7d")
      // ── takedown overhead (round 13): a human-scale tombstone set
      // (1000 ids) must cost a broadcast anti-join, NOT an index-
      // sized rescan — probe time with tombstones should track the
      // clean probe at every index scale (the §4 takedown claim).
      operators.Dedup.deleteFromLshIndex(
        big.select("doc_id").limit(1000), "doc_id", dir)
      val tt0 = System.nanoTime()
      val nPairsTd = operators.Dedup.dedupAgainstLshIndex(
        batch, "doc_id", "text", dir).count()
      operators.Dedup.unpersistAll()
      val tTd = (System.nanoTime() - tt0) / 1e9
      println(f"[probe-xl] lsh-takedown rep=$rep%-4d tombstones=1000 " +
        f"probe=$tTd%.1fs (clean $tProbe%.1fs) pairs=$nPairsTd%-7d")
    }

    // ── takedown crossover (round 14): tombstones ride probe-time
    // broadcast anti-joins, and the maxTombstones guard (default 1M)
    // encodes "a corpus-scale delete is a REBUILD". This family
    // measures where that crossover actually sits: one index, then
    // cumulative synthetic tombstone sets stepping 10³ → 10⁶ ids
    // (anti-join cost depends on the broadcast set's size, not on
    // membership, so ids above the real id range measure the same
    // curve without shrinking the matched pairs), probing at each
    // step. The printed build time is the rebuild alternative the
    // guard points at — the crossover is where per-probe overhead ×
    // expected probes before the next fold exceeds it. ──
    if (fam("takedown-crossover")) {
      val rep = reps.max
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-xl-tdx$rep").toString
      val big = saltedDocs(rep)
      val batch = evalSplit.select(
        (col("doc_id") + lit(900000000L)).as("doc_id"),
        regexp_replace(col("text"), " ", " zq0 ").as("text"))
      val tb0 = System.nanoTime()
      operators.Dedup.writeLshIndex(big, "doc_id", "text", dir)
      operators.Dedup.unpersistAll()
      val tBuild = (System.nanoTime() - tb0) / 1e9
      def probeOnce(): (Long, Double) = {
        val t0 = System.nanoTime()
        val n = operators.Dedup.dedupAgainstLshIndex(
          batch, "doc_id", "text", dir).count()
        operators.Dedup.unpersistAll()
        (n, (System.nanoTime() - t0) / 1e9)
      }
      probeOnce() // untimed warm-up: JIT/codegen/footer warmth
      val (nClean, tClean) = probeOnce()
      println(f"[probe-xl] takedown-crossover rep=$rep%-4d tombstones=0 " +
        f"probe=$tClean%.2fs build=$tBuild%.1fs pairs=$nClean%-7d")
      var written = 0L
      for (target <- Seq(1000L, 10000L, 100000L, 1000000L)) {
        // synthetic id base sits far above ANY salted id (doc_id +
        // rep·10⁷ tops out near 2·10⁹ at rep 200) so the measured
        // curve is pure broadcast overhead — at the earlier 8·10⁸
        // base the 10⁶-id block exactly covered replica copy 80's
        // live ids (round-14 review fix)
        operators.Dedup.deleteFromLshIndex(
          spark.range(written, target)
            .select((col("id") + lit(100000000000L)).as("doc_id")),
          "doc_id", dir, maxTombstones = 2000000L)
        written = target
        val (n, t) = probeOnce()
        println(f"[probe-xl] takedown-crossover rep=$rep%-4d " +
          f"tombstones=$target%-8d probe=$t%.2fs (clean $tClean%.2fs, " +
          f"build $tBuild%.1fs) pairs=$n%-7d")
      }
    }

    // ── incremental BPE trainer (round 11): the corpus is touched
    // ONCE (the word-frequency groupBy); every merge round rides the
    // persisted pair-delta table, whose size tracks word TYPES (the
    // base vocabulary plus one zq<g> token per group), not corpus
    // mass. Growing the corpus 100× must grow the train ~linearly in
    // that single corpus stage with the per-round cost flat — a
    // re-counting trainer would pay the corpus mass once per merge. ──
    if (fam("bpe-train")) for (rep <- Seq(reps.min, reps.max)) {
      val big = saltedDocs(rep)
      val t0 = System.nanoTime()
      val merges = operators.TextAnalysis
        .bpeTrain(big, "text", numMerges = 5).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe-xl] bpe-train rep=$rep%-4d docs=${d0 * rep}%-9d " +
        f"merges=${merges.length} time=$sec%.1fs")
    }

    // ── persisted BM25 inverted index: fixed 3-query probe against a
    // 1× vs 10× index. The carrying claim is PRUNING: a probe reads
    // only its query terms' buckets, so the files-read FRACTION stays
    // ≈ |probed buckets|/numBuckets at both scales, and probe time
    // grows with the probed buckets' bytes (corpus/numBuckets), never
    // with a corpus-wide postings scan or a vocabulary aggregate. ──
    if (fam("bm25-index")) for (rep <- Seq(reps.min, reps.max)) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-xl-bm25-$rep").toString
      val big = saltedDocs(rep)
      import spark.implicits._
      val probes = Seq((1, "hash join table"),
        (2, "window agg sort stream"), (3, "fast vector scan"))
        .toDF("query_id", "query_text")
      val tb0 = System.nanoTime()
      operators.Retrieval.writeBm25Index(big, "doc_id", "text", dir,
        numBuckets = 64)
      val tBuild = (System.nanoTime() - tb0) / 1e9
      val tp0 = System.nanoTime()
      operators.Retrieval.bm25AgainstIndex(
        probes, "query_id", "query_text", dir, k = 10).count()
      val tProbe = (System.nanoTime() - tp0) / 1e9
      // release the probe's batchScope cache like every sibling block —
      // a resident rep=1 cache would skew the rep=10 measurements
      operators.Dedup.unpersistAll()
      // pruning measured on the raw pruned scan: the operator's own
      // plan caches the matched postings, and filesRead cannot see
      // scans that run inside InMemoryRelation materialization
      val numBuckets = spark.read.parquet(s"$dir/meta").head().getInt(0)
      // derive the bucket set with the OPERATOR's tokenizer — an ad-hoc
      // split would drift (empty terms from double spaces hash to
      // buckets the operator never reads, inflating probeFiles)
      val qbuckets = probes
        .select(explode(operators.TextAnalysis.tokens(col("query_text")))
          .as("term"))
        .select(pmod(xxhash64(col("term")), lit(numBuckets.toLong))
          .cast("int").as("tb"))
        .distinct().collect().map(_.getInt(0)).toSeq
      val probeFiles = sources.Layout.filesRead(
        spark.read.parquet(s"$dir/postings")
          .where(col("tbucket").isin(qbuckets: _*)).select(count(lit(1))))
      val totalFiles = sources.Layout.filesRead(
        spark.read.parquet(s"$dir/postings").select(count(lit(1))))
      println(f"[probe-xl] bm25-index rep=$rep%-4d indexed=${d0 * rep}%-8d " +
        f"build=$tBuild%.1fs probe=$tProbe%.1fs files=$probeFiles/$totalFiles")
    }

    // ── duplicated-window spans (d13): the posexplode side is
    // corpus × positions and the hash-count side is distinct windows —
    // both linear in the corpus when duplicate DENSITY is fixed, which
    // the salted families guarantee (every window inside a 20-copy
    // family is duplicated; different families' windows contain
    // different group tokens, so they never collide). Budget: time and
    // span mass both ≤ linear in rep. ──
    if (fam("dup-windows")) for (rep <- Seq(reps.min, reps.max)) {
      val big = saltedDocs(rep)
      val t0 = System.nanoTime()
      val spans = operators.Dedup.duplicatedWindowSpans(
        big, "doc_id", "text", k = 8, minCount = 2)
      val agg = spans.agg(count(lit(1)),
        coalesce(sum(col("span_end") - col("span_start")), lit(0L))).head()
      val (nSpans, covTok) = (agg.getLong(0), agg.getLong(1))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe-xl] dup-windows rep=$rep%-4d docs=${d0 * rep}%-8d " +
        f"spans=$nSpans%-9d cov_tokens=$covTok%-10d time=$sec%.1fs")
    }

    // ── batch PQ (s11): a FIXED 5-query batch against a 1× vs 10×
    // corpus. The coarse ADC scan is linear in the corpus (it reads
    // m-byte codes); the shuffle into the bounded heap carries ≤
    // k·overfetch rows per (query, partition) at BOTH scales — the
    // output row count is exactly k·|queries| at any corpus size, the
    // candidates-flat contract. Budget: time ≤ linear in rep. ──
    if (fam("batch-pq")) {
      val cbp = operators.Similarity.pqSeededCodebook(
        emb, "vec_id", "embedding", m = 4, nCodes = 16)
      val queries5 = emb.orderBy("vec_id").limit(5)
        .select(col("vec_id").as("query_id"), col("embedding"))
      for (rep <- Seq(reps.min, reps.max)) {
        val big = saltedEmb(rep)
        val t0 = System.nanoTime()
        val n = operators.Similarity.knnPqBatch(
          queries5, "query_id", "embedding", big, "vec_id", "embedding",
          k = 10, cb = cbp, overfetch = 4).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[probe-xl] batch-pq rep=$rep%-4d vectors=${n0 * rep}%-8d " +
          f"rows=$n%-5d time=$sec%.1fs")
      }
    }

    // ── SemDeDup (d15): corpus AND nClusters grow 10× TOGETHER — the
    // paper's scale stance, viable only with the nearest_centroid
    // kernel (a greatest-chain assignment would be 640 expression
    // nodes at rep=40). With k ∝ n the intra-cluster pair mass
    // Σ|cell|² ≈ n²/k grows linearly, and the true twins (20-copy
    // families) grow exactly 10×. Budget: time ≤ linear in rep. ──
    if (fam("semdedup")) for (rep <- Seq(4, 40)) {
      val big = saltedEmb(rep)
      val nClusters = 16 * rep
      val t0 = System.nanoTime()
      val out = operators.Similarity.semDedup(
        big, "vec_id", "embedding", nClusters, threshold = 0.4,
        strategy = operators.Similarity.KMeansCentroids(
          sampleSize = 4096, iters = 10, seed = 42L))
      val agg = out.agg(count(lit(1)),
        sum(when(col("kept"), 0L).otherwise(1L))).head()
      val (nRows, nPruned) = (agg.getLong(0), agg.getLong(1))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe-xl] semdedup rep=$rep%-4d vectors=${n0 * rep}%-8d " +
        f"clusters=$nClusters%-5d pruned=$nPruned%-8d rows=$nRows%-8d " +
        f"time=$sec%.1fs")
    }

    // ── rolling actives (e07): events replicated rep× with a per-copy
    // user shift — the (user, day) distinct mass grows rep× while the
    // day span stays FIXED, so every stage (distinct, ×windowDays
    // explode, per-day aggregate) is corpus-linear, and the gap-fill
    // windows run on the same fixed |days|-sized aggregate at every
    // rep. roll_mass (Σ rolling_users) must grow exactly rep× —
    // disjoint users per copy — which pins the semantics of the
    // replication itself. Budget: time ≤ linear in rep. ──
    if (fam("rolling")) {
      val ev = Tables.events(spark, sfDir).select("user_id", "ts")
      val e0 = ev.count()
      for (rep <- Seq(1, math.max(reps.min / 2, 10))) {
        val big = ev.select(col("user_id"), col("ts"),
            explode(sequence(lit(0), lit(rep - 1))).as("cp"))
          .select((col("user_id") + col("cp") * lit(1000000000L))
            .as("user_id"), col("ts"))
        val t0 = System.nanoTime()
        val agg = operators.EventsAnalytics
          .rollingActive(big, "user_id", "ts")
          .agg(count(lit(1)), sum("rolling_users")).head()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[probe-xl] rolling rep=$rep%-4d events=${e0 * rep}%-9d " +
          f"days=${agg.getLong(0)}%-4d roll_mass=${agg.getLong(1)}%-12d " +
          f"time=$sec%.1fs")
      }
    }

    // ── bloom runtime filter at 10× the fact side: the surviving-row
    // RATIO is the scale quantity — it must hold as the probe side
    // grows, because it is what the exchange carries at 100 TB ──
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try if (fam("bloom")) {
      val li1 = Tables.load(spark, sfDir, "lineitem")
      val sel = Tables.load(spark, sfDir, "orders")
        .where(col("o_orderpriority") === "1-URGENT" &&
          col("o_totalprice") > 250000)
      val nSel = math.max(sel.count(), 1)
      val nb = operators.BloomPrune.bitsFor(nSel)
      val nh = operators.BloomPrune.hashesFor(nb, nSel)
      for (factor <- Seq(1, 10)) {
        val li = (0 until factor).map(_ => li1).reduce(_ unionByName _)
        val nLi = li.count()
        val t0 = System.nanoTime()
        val words = operators.BloomPrune.buildBitset(
          sel, sel("o_orderkey"), nb, nh)
        val pruned = li.where(
          operators.BloomPrune.mightContain(col("l_orderkey"), words, nh))
        val surviving = pruned.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[probe-xl] bloom fact=$nLi%-9d surviving=$surviving%-8d " +
          f"(${100.0 * surviving / nLi}%.1f%%) time=$sec%.1fs (incl. build)")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.stop()
    }
  }
}
