package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deduplication operators for large text corpora.
  *
  * These are the data-pipeline operators a 100 TB training-data job
  * needs on top of the reference's relational surface. Everything here
  * is built from declarative, shuffle-bounded primitives:
  *
  *  - exact dedup        → one hash-shuffle (groupBy content hash)
  *  - MinHash + LSH      → shingle → signature → band → bucket join;
  *                         the O(n²) pair space collapses to per-bucket
  *                         joins, each shuffle-partitioned by band key
  *  - SimHash            → 64-bit sketch + pigeonhole chunk join for
  *                         hamming-radius search
  *  - n-gram Jaccard     → exact verify pass over candidate pairs only
  *
  * No operator ever collects to the driver; every intermediate is a
  * DataFrame keyed for its next shuffle.
  */
object Dedup {

  /** Word k-shingles of a text column (arrays stay inside Tungsten;
    * no explode unless an operator needs one). Empty tokens are
    * filtered rather than trimmed away: Spark's `trim` strips only
    * U+0020, so a leading tab/newline would otherwise inject a
    * phantom "" word and diverge from the kernel's
    * skip-all-whitespace tokenization (caught by KernelPropertySpec).
    */
  def shingles(text: Column, k: Int): Column = {
    val words = filter(split(text, "\\s+"), w => length(w) > 0)
    val n = size(words)
    when(n >= k,
      transform(sequence(lit(0), n - k),
        i => concat_ws(" ", slice(words, i + 1, lit(k)))))
      .otherwise(array(concat_ws(" ", words)))
  }

  /** Distinct 64-bit hashes of the word k-shingle set (codegen'd
    * single-pass kernel; see [[graft.functions.TextKernels]]).
    */
  def shingleHashes(text: Column, k: Int): Column =
    graft.functions.TextKernelOps.tokenShingleHashes(text, k)

  /** Composed-builtin shingle hashing (different hash family than the
    * kernel — set *cardinalities* and Jaccard ratios match, hash
    * values don't). Kept as the slow-path reference.
    */
  def shingleHashesHof(text: Column, k: Int): Column =
    array_distinct(transform(shingles(text, k), s => xxhash64(s)))

  /** Character n-grams (for the Jaccard verify pass). */
  def charNgrams(text: Column, n: Int): Column = {
    val len = length(text)
    when(len >= n,
      array_distinct(transform(sequence(lit(1), len - n + 1),
        i => text.substr(i, lit(n)))))
      .otherwise(array(text))
  }

  /** MinHash signature: `numHashes` permutations simulated as affine
    * transforms (a·h + b) of a single base hash — the standard
    * one-hash MinHash family. The arithmetic stays in a 30-bit domain
    * (hash masked to 30 bits, 30-bit coefficients ⇒ products < 2^60)
    * so it can never overflow a long — Spark 4 runs ANSI mode by
    * default, where silent wraparound is an execution error.
    * Deterministic via fixed seed.
    *
    * Production path is the codegen'd single-pass kernel
    * [[graft.functions.SketchOps.minhashSig]]; this composed-builtin
    * form computes the identical signature and serves as its test
    * oracle.
    */
  def minhashSignatureHof(hashes: Column, numHashes: Int, seed: Long = 42L): Column = {
    val mask = (1L << 30) - 1
    array(graft.functions.MinHashSig.coefficients(numHashes, seed)
      .map { case (a, b) =>
        array_min(transform(hashes,
          h => (h.bitwiseAND(lit(mask)) * lit(a) + lit(b)) %
            lit(graft.functions.MinHashSig.Prime)))
      }: _*)
  }

  /** MinHash signature (codegen'd kernel). */
  def minhashSignature(hashes: Column, numHashes: Int, seed: Long = 42L): Column =
    graft.functions.SketchOps.minhashSig(hashes, numHashes, seed)

  /** Exact duplicate groups by content hash. Output:
    * (content_hash, survivor_id = min id, n_copies). One shuffle on
    * the 64-bit content hash; map-side combine does the heavy lifting.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(xxhash64(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("n_copies"))

  /** Candidate near-duplicate pairs via MinHash + LSH banding.
    *
    * `bands` bands of `numHashes / bands` rows each; docs colliding in
    * any band become a candidate pair. The band-bucket join is the
    * scale path: shuffle key is (band, bucket-hash), so candidate
    * generation is linear in collisions rather than quadratic in
    * corpus size. Skewed buckets (boilerplate shingles) are bounded
    * upstream by `array_distinct`, can be salted by raising
    * `bands`×rows at constant signature length, and — the production
    * guard — dropped outright via `maxBucketSize` (a saturated bucket
    * carries no discriminative signal; true near-dups still collide in
    * their selective bands).
    *
    * Output: (id_a, id_b) with id_a < id_b, distinct.
    */
  def minhashCandidates(
      df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 128, bands: Int = 16,
      maxBucketSize: Int = Int.MaxValue): DataFrame =
    candidatesFromHashes(hashedCorpus(df, idCol, textCol, shingleK),
      numHashes, bands, maxBucketSize)

  /** The canonical (id, sh) projection every MinHash operator consumes.
    * Materialized in its own projection: the signature references `sh`
    * numHashes times, and CollapseProject would otherwise inline (and
    * recompute) the whole shingle pipeline into every one of the 128
    * min-hash lambdas.
    */
  private def hashedCorpus(
      df: DataFrame, idCol: String, textCol: String, shingleK: Int): DataFrame =
    df.select(col(idCol).as("id"),
              shingleHashes(col(textCol), shingleK).as("sh"))

  /** The ONE Jaccard expression every verify pass computes,
    * |A∩B| / |A∪B| over sorted-distinct hash arrays — a single
    * codegen'd merge pass ([[graft.functions.SortedJaccard]]) instead
    * of `size(array_intersect)/size(array_union)`, which builds a
    * hash set and materializes both result arrays per pair just to
    * take two lengths. Exact value equivalence (same integer counts,
    * same IEEE division; a 0/0 pair — impossible for these kernels'
    * never-empty outputs — is NULL instead of the builtin's ANSI
    * divide error); valid because every hash
    * array here comes from the TextKernels sorted-distinct kernels
    * (directly or via a parquet round-trip, which preserves element
    * order).
    */
  private def jaccardOf(a: Column, b: Column): Column =
    graft.functions.TextKernelOps.sortedJaccard(a, b)

  /** (id → idAs, band, bucket) banding of a pre-hashed (id, sh) corpus —
    * the ONE implementation of signature + band bucketing every MinHash
    * operator shares (within-corpus, cross-corpus, streaming).
    * `carry` columns ride along (used by the streaming path to keep the
    * stream row's own hashes for the verify step without re-hashing).
    */
  private def bandedFromHashes(
      sh: DataFrame, idAs: String, numHashes: Int, bands: Int,
      carry: Seq[String] = Nil): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val keep = (idAs +: carry).map(col)
    sh.select((col("id").as(idAs) +: carry.map(col)) :+
        minhashSignature(col("sh"), numHashes).as("sig"): _*)
      .select(keep :+
        posexplode(graft.functions.SketchOps
          .minhashBandBuckets(col("sig"), bands)).as(Seq("band", "bucket")): _*)
  }

  /** Scope-bound registry of persisted projections. The persists are
    * deliberate — they are what makes each corpus hash once — but
    * Spark offers no scope-bound cache, so the library tracks its own
    * handles. Every persisting operator takes a `scope` parameter;
    * callers running concurrent work (e.g. a batch verify sweep next
    * to a long-lived streaming query in the same JVM) pass their own
    * scope so releasing one caller's caches can never unpersist
    * another's.
    */
  final class CacheScope {
    private val handles =
      java.util.Collections.newSetFromMap(
        new java.util.concurrent.ConcurrentHashMap[DataFrame, java.lang.Boolean]())

    // private[graft]: query entries composing multi-stage pipelines
    // (c10) persist their shared stage outputs through the same
    // scope-tracked registry the operators use
    private[graft] def persistTracked(df: DataFrame): DataFrame = {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      handles.add(p)
      p
    }

    /** Unpersist everything tracked by this scope. */
    def release(): Unit = {
      handles.forEach(df => { df.unpersist(false); () })
      handles.clear()
    }

    /** Number of live handles (for specs/diagnostics). */
    def size: Int = handles.size()
  }

  /** Default scope for BATCH operators; [[unpersistAll]] releases it.
    * Per-query release (as Verify/Bench do) is safe for sequential
    * batch work; concurrent batch callers should pass their own scope.
    */
  val batchScope = new CacheScope

  /** Default scope for [[streamingDecontaminate]]'s static-side caches.
    * Deliberately NOT touched by [[unpersistAll]]: a streaming query's
    * persisted banded eval side must survive unrelated batch cleanup,
    * or every micro-batch silently recomputes O(eval corpus). Release
    * explicitly via `Dedup.streamingScope.release()` once the streams
    * using it are stopped.
    */
  val streamingScope = new CacheScope

  /** Unpersist every projection cached by batch Dedup operators in the
    * default [[batchScope]]. Streaming-owned caches ([[streamingScope]]
    * or any caller-provided scope) are untouched.
    */
  def unpersistAll(): Unit = batchScope.release()

  /** Candidate pairs from a pre-hashed (id, sh) corpus — lets the
    * end-to-end paths ([[minhashDuplicates]], [[decontaminate]]) share
    * ONE text-hashing pass between candidate generation and verify.
    */
  private def candidatesFromHashes(
      sh: DataFrame, numHashes: Int, bands: Int,
      maxBucketSize: Int = Int.MaxValue): DataFrame =
    // single-pass band bucketing: no per-band slice copies
    selfCandidatesFromBanded(
      bandedFromHashes(sh, "id", numHashes, bands), maxBucketSize)

  /** The within-corpus (band, bucket) self-join + skew guard over an
    * already-banded (id, band, bucket) frame — shared by the in-memory
    * path and [[selfDedupFromLshIndex]] (whose banding comes from
    * disk).
    */
  private def selfCandidatesFromBanded(
      banded0: DataFrame, maxBucketSize: Int): DataFrame = {
    // Skew guard: a bucket hit by boilerplate shingles produces
    // |bucket|² candidate pairs — at corpus scale a single saturated
    // bucket can dominate the whole join. Buckets over the cap carry
    // no discriminative signal (they match "everything with this
    // header"), so production dedup drops them; true near-dup pairs
    // still collide in their other, selective bands. The count and the
    // semi-join share the (band, bucket) hash partitioning, so the
    // guard adds no extra exchange of the banded side.
    val banded =
      if (maxBucketSize == Int.MaxValue) banded0
      else banded0.join(
        banded0.groupBy("band", "bucket").agg(count(lit(1)).as("n"))
          .where(col("n") <= maxBucketSize).select("band", "bucket"),
        Seq("band", "bucket"), "left_semi")
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Cross-corpus MinHash candidates: near-duplicate pairs BETWEEN two
    * corpora (never within one) — the decontamination shape: "which
    * eval/benchmark documents leak into the training set". Each side
    * is banded independently; the band-bucket join keys one side
    * against the other, so cost is linear in cross-collisions, and a
    * duplicate-heavy training corpus never pays intra-corpus pair
    * volume. Output: (id_left, id_right), distinct.
    */
  def minhashCandidatesAcross(
      left: DataFrame, right: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 128, bands: Int = 16,
      maxBucketSize: Int = Int.MaxValue): DataFrame =
    candidatesAcrossFromHashes(
      hashedCorpus(left, idCol, textCol, shingleK),
      hashedCorpus(right, idCol, textCol, shingleK), numHashes, bands,
      maxBucketSize)

  /** Cross-corpus candidates from two pre-hashed (id, sh) sides.
    *
    * `maxBucketSize` is the cross-corpus skew guard: a (band, bucket)
    * key saturated on EITHER side produces |L|·|R| cross pairs — a
    * boilerplate header present 10⁵× in train and 10²× in eval is 10⁷
    * pairs from ONE bucket, all signal-free. Keys over the cap on
    * either side are dropped from both (an anti-join against the
    * small oversized-key set, which reuses the banding partitioning);
    * true near-dup pairs still collide in their selective bands.
    */
  private def candidatesAcrossFromHashes(
      shL: DataFrame, shR: DataFrame,
      numHashes: Int, bands: Int,
      maxBucketSize: Int = Int.MaxValue): DataFrame =
    crossCandidatesFromBanded(
      bandedFromHashes(shL, "id_left", numHashes, bands),
      bandedFromHashes(shR, "id_right", numHashes, bands),
      maxBucketSize)

  /** The (band, bucket) cross join + skew guard over two already-banded
    * sides — shared by the in-memory cross-corpus path and the
    * persisted-index probe (whose left side comes banded from disk).
    */
  private def crossCandidatesFromBanded(
      bL0: DataFrame, bR0: DataFrame,
      maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val (bL, bR) =
      if (maxBucketSize == Int.MaxValue) (bL0, bR0)
      else {
        def oversized(b: DataFrame) =
          b.groupBy("band", "bucket").agg(count(lit(1)).as("n"))
            .where(col("n") > maxBucketSize).select("band", "bucket")
        val bad = oversized(bL0).union(oversized(bR0)).distinct()
        (bL0.join(bad, Seq("band", "bucket"), "left_anti"),
         bR0.join(bad, Seq("band", "bucket"), "left_anti"))
      }
    bL.as("a")
      .join(bR.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
      .select(col("a.id_left"), col("b.id_right"))
      .distinct()
  }

  /** Decontamination: training documents whose word-shingle Jaccard
    * against any right-side (eval) document meets `threshold`.
    * Candidates via cross-corpus LSH, then the exact verify pass.
    * Output: (id_left, id_right, jaccard) ≥ threshold.
    */
  def decontaminate(
      train: DataFrame, eval: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 128, bands: Int = 16,
      threshold: Double = 0.5,
      maxBucketSize: Int = Int.MaxValue,
      scope: CacheScope = batchScope): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // hash each corpus ONCE; persist shares the pass between banding
    // and verify (MEMORY_AND_DISK: spills instead of recomputing at
    // 100 TB). The logical plan is untouched — caching swaps in at
    // physical planning — so SqlGen roundtrips are unaffected.
    // Long-lived sessions can reclaim the caches via [[unpersistAll]].
    val shL = scope.persistTracked(hashedCorpus(train, idCol, textCol, shingleK))
    val shR = scope.persistTracked(hashedCorpus(eval, idCol, textCol, shingleK))
    val cands = candidatesAcrossFromHashes(shL, shR, numHashes, bands,
      maxBucketSize)
    cands
      .join(shL.withColumnsRenamed(Map("id" -> "id_left", "sh" -> "sh_l")), "id_left")
      .join(shR.withColumnsRenamed(Map("id" -> "id_right", "sh" -> "sh_r")), "id_right")
      .select(col("id_left"), col("id_right"),
        jaccardOf(col("sh_l"), col("sh_r")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Exact word-shingle Jaccard verification of candidate pairs.
    * Joins the (small) candidate set back to the corpus twice —
    * both joins are hash joins on the doc id — and computes
    * |A∩B| / |A∪B| on the distinct shingle-hash arrays.
    * Output: (id_a, id_b, jaccard) filtered to ≥ threshold.
    */
  def jaccardVerify(
      candidates: DataFrame, df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, threshold: Double = 0.5): DataFrame =
    jaccardVerifyHashed(candidates,
      hashedCorpus(df, idCol, textCol, shingleK), threshold)

  /** Largest candidate-id set the index probes will collect for a
    * static-In pushdown (the verify-side point-read guard); past it,
    * the join-based verify stands. 32k ids is well inside InSet's
    * comfortable range and parquet's filter evaluation.
    */
  private val maxIsinIds = 32768

  /** Per-band bucket-set size above which the probe's buckets scan
    * stops using per-band In pushdown (row-group stats saturate and
    * the pushed parquet predicate costs per record) and falls back
    * to one flat scan + a global Spark-side InSet — the measured
    * crossover between the small-batch and large-batch regimes.
    */
  private val maxBandLocalBuckets = 64

  /** Verify pass over a pre-hashed (id, sh) corpus. */
  private def jaccardVerifyHashed(
      candidates: DataFrame, sh: DataFrame, threshold: Double): DataFrame =
    candidates
      .join(sh.withColumnsRenamed(Map("id" -> "id_a", "sh" -> "sh_a")), "id_a")
      .join(sh.withColumnsRenamed(Map("id" -> "id_b", "sh" -> "sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        jaccardOf(col("sh_a"), col("sh_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)

  /** End-to-end MinHash near-dup detection: candidates → verify.
    * The corpus is text-hashed ONCE: the (id, sh) projection is
    * persisted (MEMORY_AND_DISK — spills rather than recomputes) and
    * shared by the signature/banding pass and both verify join sides,
    * so at 100 TB the shingle-hash kernel reads the corpus once, not
    * three times. Caching is a physical-planning substitution; the
    * logical plan (and so SqlGen) is unchanged.
    */
  def minhashDuplicates(
      df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 128, bands: Int = 16,
      threshold: Double = 0.5,
      maxBucketSize: Int = Int.MaxValue,
      scope: CacheScope = batchScope): DataFrame = {
    val sh = scope.persistTracked(hashedCorpus(df, idCol, textCol, shingleK))
    jaccardVerifyHashed(
      candidatesFromHashes(sh, numHashes, bands, maxBucketSize),
      sh, threshold)
  }

  /** Streaming decontamination: flag streaming documents whose
    * MinHash-LSH word-shingle Jaccard against a STATIC eval corpus
    * meets `threshold` — the ingest-time twin of [[decontaminate]]
    * ("is this incoming training document a near-copy of a benchmark
    * document?").
    *
    * Fully STATELESS on the stream side: shingle-hash, signature and
    * banding are per-row projections, the band-bucket match and the
    * verify lookup are stream-static inner joins (no watermark
    * state), and the Jaccard test is row-local — so this runs inside
    * ingest at any scale. The static side is hashed AND banded once,
    * persisted, so per-batch work is O(batch), not O(eval corpus).
    * Output:
    * (id_left, id_right, jaccard) with jaccard ≥ threshold; a pair
    * colliding in several bands emits one row per colliding band
    * (a within-stream distinct would itself be a stateful
    * aggregate). Exactly-once flags are the caller's consumption
    * pattern: foreachBatch + `dropDuplicates("id_left", "id_right")`
    * per micro-batch — pinned by StreamingSpec's "exactly-once
    * decontamination flags via foreachBatch per-pair dedup".
    */
  def streamingDecontaminate(
      docs: DataFrame, eval: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 128, bands: Int = 16,
      threshold: Double = 0.5,
      maxStaticBucketSize: Int = Int.MaxValue,
      scope: CacheScope = streamingScope): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // static-side caches live in streamingScope by default: they must
    // outlive any batch cleanup (unpersistAll) running in the same JVM,
    // or every micro-batch recomputes O(eval corpus)
    val shR = scope.persistTracked(hashedCorpus(eval, idCol, textCol, shingleK))
    // persist the BANDED static side too: every micro-batch replays the
    // stream-static join's static subtree, so without this the
    // signature + explode would recompute over the whole eval corpus
    // per batch — per-batch work must be O(batch), not O(eval)
    val bandedR0 = bandedFromHashes(shR, "id_right", numHashes, bands)
    // static-side skew guard, applied ONCE at stream start (the capped
    // frame is what gets persisted): a streamed boilerplate row hitting
    // a saturated eval bucket would otherwise fan out |bucket| rows per
    // colliding band, per batch, forever. The stream side itself can't
    // be capped without stateful aggregation — the static cap is what
    // bounds the per-row fanout.
    val bandedR = scope.persistTracked(
      if (maxStaticBucketSize == Int.MaxValue) bandedR0
      else bandedR0.join(
        bandedR0.groupBy("band", "bucket").agg(count(lit(1)).as("n"))
          .where(col("n") <= maxStaticBucketSize).select("band", "bucket"),
        Seq("band", "bucket"), "left_semi"))
    // the stream doc's shingle hashes ride along to the verify step, so
    // the text-hashing kernel runs once per streamed row too
    val bandedL = bandedFromHashes(
      hashedCorpus(docs, idCol, textCol, shingleK),
      "id_left", numHashes, bands, carry = Seq("sh"))
      .withColumnRenamed("sh", "sh_l")
    bandedL
      .join(bandedR, Seq("band", "bucket"))
      .join(shR.withColumnsRenamed(Map("id" -> "id_right", "sh" -> "sh_r")),
        "id_right")
      .select(col("id_left"), col("id_right"),
        jaccardOf(col("sh_l"), col("sh_r")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash from a materialized feature-hash array column:
    * per bit, majority vote of feature-hash bits. Composed-builtin
    * test oracle for the codegen'd
    * [[graft.functions.SketchOps.simhash64]] kernel (the production
    * path). IMPORTANT: pass an *attribute* (a column materialized by a
    * prior projection), not an expression — this references its input
    * 64 times.
    */
  def simhashFromFeaturesHof(feats: Column): Column = {
    val bits = (0 until 64).map { i =>
      val vote = aggregate(feats, lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(vote > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Token-bigram feature hashes (codegen'd kernel). */
  def simhashFeatures(text: Column): Column = shingleHashes(text, 2)

  /** SimHash sketch of a text column (codegen'd kernel). */
  def simhash64(text: Column): Column =
    graft.functions.SketchOps.simhash64(simhashFeatures(text))

  /** SimHash near-dup pairs within a hamming radius, using the
    * pigeonhole principle: split the 64-bit sketch into
    * `maxHamming + 1` chunks; a pair within the radius must agree
    * exactly on at least one chunk, so the join key is
    * (chunk_index, chunk_value) — linear shuffle, no n² scan.
    *
    * Scale note: chunk width is 64/(r+1) bits, so bucket count per
    * chunk is 2^width — at radius 3 that's 16-bit chunks (65k buckets,
    * the classic production setting); wider radii shrink buckets and
    * grow candidates. Short documents (few sketch features) need the
    * wider radius; long documents separate at radius 3.
    * Output: (id_a, id_b, hamming) with hamming ≤ maxHamming.
    */
  def simhashDuplicates(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame =
    hammingPairs(
      df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sim")),
      "id", "sim", maxHamming)

  /** Pigeonhole hamming join over ANY 64-bit sketch column — the
    * machinery behind [[simhashDuplicates]], shared with the image
    * perceptual-hash near-dup (d12): split the sketch into
    * `maxHamming + 1` near-equal chunks; a pair within the radius must
    * agree exactly on at least one chunk, so the join key is
    * (chunk_index, chunk_value) — linear shuffle, no n² scan.
    * Output: (id_a, id_b, hamming) with hamming ≤ maxHamming, each
    * pair once.
    */
  def hammingPairs(sketched: DataFrame, idCol: String, sketchCol: String,
                   maxHamming: Int,
                   scope: CacheScope = batchScope): DataFrame = {
    val nChunks = maxHamming + 1
    require(nChunks <= 16, "radius > 15 would make chunks < 4 bits")
    // near-equal chunk widths summing to 64
    val widths = Array.tabulate(nChunks)(i => 64 / nChunks + (if (i < 64 % nChunks) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    // 1L << 64 wraps to 1 in JVM shift semantics, so the radius-0
    // single-chunk mask must be spelled -1L (round-14 review fix: the
    // wrapped mask made every chunk value 0 — a constant join key,
    // i.e. a silent cross join)
    def maskOf(w: Int): Long = if (w == 64) -1L else (1L << w) - 1
    // materialize the (id, sketch) projection ONCE: the sketch column
    // (a simhash/dHash/audio-sig expression) is referenced by every
    // chunk extraction on BOTH self-join sides — inlined, the
    // optimizer duplicates the (expensive: decode/hash-set) producing
    // expression up to 2·(nChunks+1) times per row (measured 12× in
    // d12's optimized plan). The cache is two 8-byte columns per row —
    // the hashed-projection persistTracked stance every banding
    // operator here already takes.
    val chunked = scope.persistTracked(
        sketched.select(col(idCol).as("id"), col(sketchCol).as("sim")))
      .select(
        col("id"), col("sim"),
        explode(array((0 until nChunks).map { c =>
          struct(lit(c).as("chunk"),
                 shiftright(col("sim"), offsets(c))
                   .bitwiseAND(lit(maskOf(widths(c)))).as("cv"))
        }: _*)).as("ch"))
      .select(col("id"), col("sim"), col("ch.chunk").as("chunk"), col("ch.cv").as("cv"))
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") &&
        col("a.cv") === col("b.cv") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
              bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).as("hamming"))
      // filter BEFORE dedup: candidate volume is quadratic in bucket
      // size; the radius test kills ~all of it, so the distinct only
      // sees true pairs (once per agreeing chunk)
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Stream-vs-static pigeonhole hamming flag — [[hammingPairs]]'s
    * ingest-time twin over ANY 64-bit sketch column: flag arriving
    * sketches within `maxHamming` of a STATIC reference side. Fully
    * STATELESS on the stream side (the streamingDecontaminate
    * stance): chunk extraction is a per-row projection, the match is
    * a stream-static equi-join on (chunk, value), the radius test is
    * row-local — no watermark, no state. The static side's chunked
    * projection persists once in the streaming cache scope, so
    * per-batch work is O(batch), not O(reference).
    *
    * EXACTLY-ONCE emit without state: a pair inside the radius can
    * agree on several chunks (one join hit each), but which chunks
    * agree is derivable from the two sketches alone — so rows where
    * the matched chunk is not the pair's FIRST agreeing chunk are
    * filtered out row-locally, and each flagged pair emits exactly
    * one row per micro-batch with no distinct/aggregation. (The
    * batch operator dedups the same multiplicity with a distinct —
    * stateful on a stream; this is the stateless equivalent.)
    *
    * Output: (id_left, id_right, hamming) with hamming ≤ maxHamming.
    */
  def hammingFlagStream(
      stream: DataFrame, static: DataFrame, idCol: String,
      sketchCol: String, maxHamming: Int,
      scope: CacheScope = streamingScope): DataFrame = {
    val nChunks = maxHamming + 1
    require(nChunks <= 16, "radius > 15 would make chunks < 4 bits")
    val widths = Array.tabulate(nChunks)(i =>
      64 / nChunks + (if (i < 64 % nChunks) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    // radius-0 single-chunk mask must be -1L, not the wrapped 1L<<64
    // (see hammingPairs — same fix, same silent-cross-join failure)
    def maskOf(w: Int): Long = if (w == 64) -1L else (1L << w) - 1
    def chunked(df: DataFrame, idAs: String, simAs: String): DataFrame =
      df.select(col(idCol).as(idAs), col(sketchCol).as(simAs))
        .select(col(idAs), col(simAs),
          explode(array((0 until nChunks).map { c =>
            struct(lit(c).as("chunk"),
              shiftright(col(simAs), offsets(c))
                .bitwiseAND(lit(maskOf(widths(c)))).as("cv"))
          }: _*)).as("ch"))
        .select(col(idAs), col(simAs),
          col("ch.chunk").as("chunk"), col("ch.cv").as("cv"))
    // persist the CHUNKED static side, not its pre-explode input:
    // every micro-batch replays the stream-static join's static
    // subtree, so anything above the cache re-runs over the whole
    // reference per batch — the streamingDecontaminate banded-side
    // stance (round-14 review fix; the pre-explode cache left the
    // chunk extraction O(reference) per batch)
    val r = scope.persistTracked(chunked(static, "id_right", "sim_r"))
    val l = chunked(stream, "id_left", "sim_l")
    val xor = col("sim_l").bitwiseXOR(col("sim_r"))
    // first agreeing chunk = first chunk whose XOR window is zero;
    // total on joined rows (the matched chunk itself agrees)
    val firstAgree = coalesce((0 until nChunks).map { c =>
      when(shiftright(xor, offsets(c))
        .bitwiseAND(lit(maskOf(widths(c)))) === 0L, lit(c))
    }: _*)
    l.join(r, l("chunk") === r("chunk") && l("cv") === r("cv"))
      .where(bit_count(xor) <= maxHamming && l("chunk") === firstAgree)
      .select(col("id_left"), col("id_right"),
        bit_count(xor).as("hamming"))
  }

  /** Streaming exact dedup: first document per content hash within
    * the watermark survives; later copies are dropped. The same
    * content-hash contract as [[exact]] lifted onto Structured
    * Streaming — state is one hash per distinct document, evicted
    * when the watermark passes (bounded by distinct-docs-per-window,
    * not stream length). Works on any stream with an event-time
    * column.
    */
  def streamingExact(
      docs: DataFrame, textCol: String, tsCol: String,
      watermark: String): DataFrame =
    docs.withColumn("content_hash", xxhash64(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming curation: c01's single-pass shape at ingest time —
    * quality + repetition filters (stateless per-row expressions, the
    * Column forms of t02/t11) BEFORE the exact-dedup state, then
    * [[streamingExact]]'s content-hash dropDuplicates. Filter-first
    * matters twice: low-quality rows never enter the dedup state
    * store (the same rows-never-pay-the-shuffle argument as c01's
    * filter-below-window), and a low-quality earlier copy can't
    * shadow a later identical copy — filtering after dedup would
    * drop BOTH. Survivor contract: FIRST ARRIVAL wins (stream order),
    * where batch c01 keeps min doc_id — identical when the stream
    * arrives in id order, documented divergence otherwise (an ingest
    * pipeline keeps what it has already shipped; it cannot retract
    * for a lower id it hasn't seen).
    */
  def streamingCurate(
      docs: DataFrame, textCol: String, tsCol: String,
      watermark: String, minQuality: Double = 0.75,
      maxDupWordFrac: Double = 0.7): DataFrame =
    streamingExact(
      docs.where(
        TextAnalysis.qualityScore(col(textCol)) >= minQuality &&
          TextAnalysis.dupWordFrac(col(textCol)) <= maxDupWordFrac),
      textCol, tsCol, watermark)

  /** Streaming near-dup dedup: drop documents whose SimHash sketch
    * has been seen within the watermark. The sketch is the codegen'd
    * [[graft.functions.SketchOps.simhash64]] kernel, so "near" means
    * identical 64-bit sketch — the streaming-feasible approximation
    * (banded LSH joins need a batch verify pass; sketch-equality
    * catches boilerplate/whitespace variants at zero join cost).
    */
  def streamingNearDup(
      docs: DataFrame, textCol: String, tsCol: String,
      watermark: String): DataFrame =
    docs.withColumn("simhash", simhash64(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("simhash")

  /** Resolve near-duplicate *pairs* into duplicate *clusters*: every
    * id is labeled with the minimum id reachable through the pair
    * graph (connected components). Pairs alone don't answer the
    * question a 100 TB dedup job actually asks — "which one copy do I
    * keep?" — when duplicates chain (A~B, B~C but A≁C).
    *
    * Algorithm: iterative min-label propagation to fixpoint. Each
    * round is one shuffle (join on dst + groupBy src); rounds needed =
    * graph diameter, and LSH duplicate clusters are near-cliques, so
    * 2-3 rounds in practice. The driver-side loop reads only a single
    * converged? scalar per round (an aggregate, not data).
    * `localCheckpoint` truncates the growing lineage so round N's plan
    * doesn't replay rounds 1..N-1.
    *
    * Input: pairs (idA, idB). Output: (id, cluster) for every id that
    * appears in a pair; cluster = min id of its component. Ids with no
    * pairs are implicitly their own singleton cluster (left to the
    * caller to union in, so the operator stays linear in |pairs|).
    */
  /** `WITH RECURSIVE` twin of [[duplicateClusters]] over a pair
    * subquery (round 9): the same min-label-of-component result as a
    * single SQL text — `pairsSql` must yield columns (idA, idB).
    * Spark's recursive CTEs are UNION ALL-only, so the closure is a
    * level-bounded BFS with a per-step DISTINCT: the working table at
    * level k holds the distinct pairs reachable in k+1 hops (≤ n² per
    * level — DISTINCT is what keeps a near-clique from exploding into
    * path enumeration), and `lvl < maxIters` terminates it on cycles,
    * mirroring the operator's own bounded-iteration contract (equal
    * results whenever the component diameter fits the bound — the
    * operator's convergence condition). This text is what
    * [[duplicateClusters]] registers with
    * [[graft.sqlgen.SqlGen.registerIterative]], closing the last two
    * plan→SQL carve-outs (d06/d08).
    */
  def duplicateClustersSql(pairsSql: String, idA: String = "id_a",
      idB: String = "id_b", maxIters: Int = 25): String =
    closureCoreSql(pairsSql, idA, idB, maxIters) +
      "\nSELECT src AS id, least(src, min(dst)) AS cluster" +
      "\nFROM _dc_reach GROUP BY src"

  private def closureCoreSql(pairsSql: String, idA: String, idB: String,
      maxIters: Int): String =
    s"""WITH RECURSIVE _dc_p AS (
       |$pairsSql
       |), _dc_e (src, dst) AS (
       |  SELECT `$idA`, `$idB` FROM _dc_p
       |  UNION
       |  SELECT `$idB`, `$idA` FROM _dc_p
       |), _dc_reach (src, dst, lvl) AS (
       |  SELECT src, dst, 0 FROM _dc_e
       |  UNION ALL
       |  SELECT DISTINCT r.src, e2.dst, r.lvl + 1
       |  FROM _dc_reach r JOIN _dc_e e2 ON r.dst = e2.src
       |  WHERE r.lvl < $maxIters
       |)""".stripMargin

  def duplicateClusters(
      pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
      maxIters: Int = 25): DataFrame = {
    val edges = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .union(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct()
      .localCheckpoint(true)
    // seed with min(self, neighbors) — the first propagation round
    // fused into initialization, so near-cliques converge in one
    // verification round instead of two
    var labels = edges.groupBy(col("src"))
      .agg(least(min(col("dst")), col("src")).as("label"))
      .select(col("src").as("id"), col("label"))
      .localCheckpoint(true)
    var iters = 0
    var converged = false
    while (!converged && iters < maxIters) {
      val neighborMin = edges
        .join(labels.withColumnsRenamed(Map("id" -> "dst", "label" -> "dst_label")), "dst")
        .groupBy(col("src")).agg(min(col("dst_label")).as("nbr_label"))
      val updated = labels
        .join(neighborMin.withColumnRenamed("src", "id"), Seq("id"), "left")
        .select(col("id"), col("label"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("new_label"))
        .localCheckpoint(true)
      iters += 1
      // convergence probe every OTHER round (r20 optimization —
      // halves the per-round action count): propagation at the
      // fixpoint is a no-op, so the one extra round a skipped probe
      // can cost leaves the labels output-identical (the fixpoint
      // argument; cadence pinned by EdgeCaseSpec's parity test). A
      // probe on the final permitted round is skipped too — the loop
      // exits on `iters == maxIters` regardless of its answer.
      converged = iters % 2 == 0 && iters < maxIters &&
        updated.where(col("new_label") < col("label")).isEmpty
      labels = updated.select(col("id"), col("new_label").as("label"))
    }
    val out = labels.select(col("id"), col("label").as("cluster"))
    // plan→SQL provenance: attach the WITH RECURSIVE twin to this
    // result's checkpoint barrier so SqlGen can print the whole query
    // (the result's leaf is the last loop round's
    // (id, label, new_label) frame — at convergence the two label
    // columns are equal, which is what the twin emits). Registered as
    // a THUNK: the pairs plan renders only if a toSql call actually
    // reaches the barrier — execution-only callers pay nothing, and a
    // non-renderable pairs source fails AT toSql with SqlGen's own
    // error instead of silently skipping registration here.
    val pairsPlan = pairs.select(col(idA), col(idB))
    graft.sqlgen.SqlGen.registerIterative(out, () => {
      val lab = "least(src, min(dst))"
      closureCoreSql(graft.sqlgen.SqlGen.toSql(pairsPlan),
        idA, idB, maxIters) +
        s"\nSELECT src AS id, $lab AS label, $lab AS new_label" +
        "\nFROM _dc_reach GROUP BY src"
    })
    out
  }

  /** Character n-gram Jaccard verify over candidate pairs (the
    * "different distance, same verify shape" variant).
    * Output: (id_a, id_b, char_jaccard) ≥ threshold.
    */
  def charJaccardVerify(
      candidates: DataFrame, df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.7,
      scope: CacheScope = batchScope): DataFrame = {
    // one char-ngram pass feeds both join sides (same hash-once shape
    // as minhashDuplicates)
    val gr = scope.persistTracked(df.select(col(idCol).as("id"),
      graft.functions.TextKernelOps.charNgramHashes(col(textCol), n).as("gr")))
    candidates.select("id_a", "id_b")
      .join(gr.withColumnsRenamed(Map("id" -> "id_a", "gr" -> "gr_a")), "id_a")
      .join(gr.withColumnsRenamed(Map("id" -> "id_b", "gr" -> "gr_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        jaccardOf(col("gr_a"), col("gr_b")).as("char_jaccard"))
      .where(col("char_jaccard") >= threshold)
  }

  /** LSH candidate-stage quality report — the dedup-side analog of
    * `Similarity.ivfRecall`: on an EVAL SAMPLE of the corpus, compare
    * the banding's candidate pairs against the brute-force truth
    * (all-pairs shingle Jaccard ≥ threshold) and report one row of
    * (n_true, n_candidates, n_hit, precision, recall). recall < 1
    * means the (bands, rowsPerBand) point misses true duplicates —
    * raise bands before committing an index build; precision is the
    * verify-stage cost multiplier (how many candidate Jaccards are
    * computed per kept pair). The truth side is a deliberate
    * |sample|² join — ground truth is the price of the eval, which
    * is why this runs on a sample, never the corpus (the same
    * stance as ivfRecall's exact side). One text-hash pass feeds
    * banding AND both truth sides.
    */
  def lshCandidateEval(
      df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 128, bands: Int = 16,
      threshold: Double = 0.5, maxBucketSize: Int = Int.MaxValue,
      scope: CacheScope = batchScope): DataFrame = {
    val sh = scope.persistTracked(hashedCorpus(df, idCol, textCol, shingleK))
    val cands = candidatesFromHashes(sh, numHashes, bands, maxBucketSize)
      .select(col("id_a"), col("id_b"))
    val truth = sh.toDF("id_a", "sh_a")
      .join(sh.toDF("id_b", "sh_b"), col("id_a") < col("id_b"))
      .where(jaccardOf(col("sh_a"), col("sh_b")) >= threshold)
      .select(col("id_a"), col("id_b"))
    val hit = cands.join(truth, Seq("id_a", "id_b"))
    val agg = truth.agg(count(lit(1))).crossJoin(cands.agg(count(lit(1))))
      .crossJoin(hit.agg(count(lit(1))))
      .toDF("n_true", "n_candidates", "n_hit")
    agg.select(col("n_true"), col("n_candidates"), col("n_hit"),
      when(col("n_candidates") > 0,
        col("n_hit").cast("double") / col("n_candidates"))
        .otherwise(lit(1.0)).as("precision"),
      when(col("n_true") > 0,
        col("n_hit").cast("double") / col("n_true"))
        .otherwise(lit(1.0)).as("recall"))
  }

  /** Cross-source near-duplicate overlap matrix: the d02/d04 chain
    * (MinHash-LSH candidates → char-n-gram Jaccard verify) attributed
    * to source pairs — per unordered (source_a ≤ source_b) pair, how
    * many verified near-dup document pairs straddle it. The report
    * that tells a corpus owner WHICH feeds are mirroring each other
    * before any row is dropped.
    *
    * Scale shape: pair volume is the candidates-linear LSH output
    * (never |corpus|²); attaching sources is two hash joins of that
    * pair set against an (id, source) two-column projection of the
    * corpus; the final aggregate is at most |sources|² rows. Adds no
    * new shuffle shape beyond d04 itself.
    */
  def crossSourceDupMatrix(
      df: DataFrame, idCol: String, textCol: String, sourceCol: String,
      shingleK: Int = 3, ngramN: Int = 3, threshold: Double = 0.8,
      numHashes: Int = 128, bands: Int = 16,
      maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val verified = charJaccardVerify(
      minhashCandidates(df, idCol, textCol, shingleK, numHashes, bands,
        maxBucketSize),
      df, idCol, textCol, ngramN, threshold)
    val srcs = df.select(col(idCol).as("_cs_id"), col(sourceCol).as("_cs_src"))
    verified
      .join(srcs.withColumnsRenamed(
        Map("_cs_id" -> "id_a", "_cs_src" -> "_cs_sa")), "id_a")
      .join(srcs.withColumnsRenamed(
        Map("_cs_id" -> "id_b", "_cs_src" -> "_cs_sb")), "id_b")
      .select(least(col("_cs_sa"), col("_cs_sb")).as("source_a"),
              greatest(col("_cs_sa"), col("_cs_sb")).as("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"))
  }

  // ——— Persisted LSH dedup index ———————————————————————————————————
  //
  // The incremental-dedup shape a living 100 TB corpus actually runs:
  // nobody re-hashes yesterday's exabyte to admit today's batch. The
  // corpus is shingle-hashed and banded ONCE, the banding and the
  // shingle-hash sets go to parquet, and every future ingest batch
  // dedups against the index with a (band, bucket) join + the exact
  // Jaccard verify — reading index bytes, never index text. Same
  // immutable-plus-append lifecycle as the persisted IVF index
  // (Similarity.writeIvfIndex): build writes a fresh tree, append adds
  // new docs banded under the STORED parameters, probes stay correct
  // throughout.
  //
  // Layout under `path`:
  //   meta/     1 row (shingle_k, num_hashes, bands) — probe/append
  //             read the build parameters from here, so a mismatched
  //             banding between build and probe is unrepresentable
  //   buckets/  (id, bucket) partitioned by band — the join target
  //   hashes/   (id, sh) — the verify side, joined only for candidates

  private[operators] def lshMetaOf(spark: org.apache.spark.sql.SparkSession,
      path: String): (Int, Int, Int) = {
    // driver-direct 1-row read (r20 — TinyParquet): the spark.read
    // job here was pure fixed cost on every index probe/ingest batch
    val g = graft.sources.TinyParquet.readGroups(spark, s"$path/meta").head
    (g.getInteger("shingle_k", 0), g.getInteger("num_hashes", 0),
      g.getInteger("bands", 0))
  }

  /** Driver-direct write of the LSH index's 1-row meta (r20 —
    * TinyParquet; same physical shape the Spark writer produced).
    */
  private def writeLshMeta(spark: org.apache.spark.sql.SparkSession,
      path: String, shingleK: Int, numHashes: Int, bands: Int): Unit =
    graft.sources.TinyParquet.write(spark, s"$path/meta",
      """message spark_schema {
        |  required int32 shingle_k;
        |  required int32 num_hashes;
        |  required int32 bands;
        |}""".stripMargin,
      Seq(Seq[Any](shingleK, numHashes, bands)))

  /** Build a persisted LSH dedup index over a corpus. One text-hashing
    * pass (persisted, shared by the banding write and the hashes
    * write), two parquet writes. Overwrite semantics match
    * [[graft.operators.Similarity.writeIvfIndex]]: a rebuild targets a
    * fresh path and the old index stays probe-able until the caller
    * swaps pointers.
    */
  /** The hashes tree's layout policy, in ONE place: range-sorted by
    * id with an id bloom filter — what makes the point-read verify's
    * static-In pushdown a row-group-pruned read.
    */
  private def writeSortedHashes(sh: DataFrame, mode: String,
                                path: String): Unit =
    sh.repartitionByRange(col("id")).sortWithinPartitions("id")
      .write.mode(mode)
      .option("parquet.bloom.filter.enabled#id", "true")
      .option("parquet.bloom.filter.expected.ndv#id", "1000000")
      .parquet(path)

  /** The buckets tree's layout policy, in ONE place (round 11):
    * partitioned by band, range-sorted by (band, bucket) with a
    * bucket bloom filter — what makes the probe's guarded bucket-set
    * pushdown a row-group-pruned read. The 100× probe measured the
    * old full (band, bucket) scan as the probe's only index-sized
    * term (~1.8 s / 10⁶ indexed docs); narrow per-file bucket ranges
    * + bloom turn it into ≤ |batch buckets| row-group reads, the
    * same treatment the hashes tree's id point-reads already get.
    */
  private def writeSortedBuckets(banded: DataFrame, mode: String,
                                 path: String): Unit =
    banded.repartitionByRange(col("band"), col("bucket"))
      .sortWithinPartitions("band", "bucket")
      .write.mode(mode).partitionBy("band")
      .option("parquet.bloom.filter.enabled#bucket", "true")
      .option("parquet.bloom.filter.expected.ndv#bucket", "1000000")
      .parquet(path)

  def writeLshIndex(
      df: DataFrame, idCol: String, textCol: String, path: String,
      shingleK: Int = 3, numHashes: Int = 128, bands: Int = 16): Unit = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val spark = df.sparkSession
    import spark.implicits._
    writeLshMeta(spark, path, shingleK, numHashes, bands)
    // local persist, released before returning: both writes consume it
    // eagerly and nothing lazy escapes — unlike the probe, whose
    // returned frame still references its cache
    val sh = hashedCorpus(df, idCol, textCol, shingleK)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      writeSortedBuckets(bandedFromHashes(sh, "id", numHashes, bands),
        "overwrite", s"$path/buckets")
      // hashes land RANGE-SORTED by id with an id bloom filter: the
      // point-read verify (dedupAgainstLshIndex's static-In guard)
      // then skips row groups by id stats/bloom instead of reading
      // every stored hash set. One extra exchange, paid once per
      // build — the cost the index amortizes.
      writeSortedHashes(sh, "overwrite", s"$path/hashes")
    } finally sh.unpersist(false)
  }

  /** Append a batch to a persisted LSH index: band the new docs under
    * the STORED build parameters (read from `path/meta` — the caller
    * cannot get them wrong) and append to both trees. Existing files
    * are untouched; ids are the caller's contract (append the same doc
    * twice and it will later self-report as a duplicate, which is the
    * honest answer).
    */
  def appendToLshIndex(
      df: DataFrame, idCol: String, textCol: String, path: String): Unit = {
    val (shingleK, numHashes, bands) = lshMetaOf(df.sparkSession, path)
    val sh = hashedCorpus(df, idCol, textCol, shingleK)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // appended buckets keep the sorted-by-bucket file layout (narrow
      // bucket ranges per appended file + bloom), so bucket-set
      // pushdown stays prunable across appends
      writeSortedBuckets(bandedFromHashes(sh, "id", numHashes, bands),
        "append", s"$path/buckets")
      // appended hashes keep the sorted-by-id file layout (narrow id
      // ranges per appended file + bloom), so point-read verifies
      // stay prunable across appends
      writeSortedHashes(sh, "append", s"$path/hashes")
    } finally sh.unpersist(false)
  }

  /** Compact a persisted LSH index into a fresh tree (round 11 —
    * the BM25 index's LSM compaction applied to the LSH lifecycle).
    * The index is self-contained: the banding re-derives from the
    * STORED hash sets under the stored meta parameters, so
    * compaction never needs (or reads) corpus text. What it
    * restores:
    *
    *  - the layout policy's pruning properties, which append streams
    *    erode — every append adds files spanning its own full
    *    id/bucket range, so after many appends a point-read or
    *    bucket-set probe stops skipping row groups; the rewrite
    *    re-sorts both trees globally.
    *  - file count: one consolidated set of range-partitioned files
    *    instead of per-append fragments.
    *  - row dedup: [[lshIngestBatch]]'s crash-window replays leave
    *    byte-identical duplicate rows (harmless to probes, which
    *    distinct their output, but paid on every scan); the
    *    hash-set distinct collapses them and the banding regenerates
    *    once per surviving id.
    *
    * Same rebuild stance as [[writeLshIndex]]: targets a fresh path,
    * the source index stays probe-able throughout, the caller swaps
    * pointers when the write completes. The ingest log (if present)
    * is carried forward so a streaming ingest resuming against the
    * compacted path keeps its replay guard.
    *
    * ORDER MATTERS (round 13): the log copies FIRST, the data trees
    * snapshot AFTER. [[lshIngestBatch]] writes data-then-log, so any
    * batch present in the log at copy time has its rows fully landed
    * before the later hashes listing — the compacted tree can never
    * claim a batch it doesn't hold. A concurrent append landing
    * AFTER the log copy is at worst data-without-log: the resumed
    * stream replays it, which is a no-op re-append of idempotent
    * rows (probe-identical by the crash-window contract). The
    * REVERSE ordering (log last) had a data-loss window — an append
    * landing between the hashes snapshot and the log copy produced a
    * logged-but-absent batch the resumed stream silently skipped.
    * Quiesce contract: concurrent appends during compaction are
    * SAFE (replayed, never lost) but waste work re-ingesting; pause
    * the ingest stream across the compact-and-swap for efficiency,
    * not for correctness.
    */
  def compactLshIndex(spark: org.apache.spark.sql.SparkSession,
                      srcPath: String, dstPath: String): Unit = {
    copyLshIngestLog(spark, srcPath, dstPath)
    compactLshData(spark, srcPath, dstPath)
  }

  /** Log-copy leg of [[compactLshIndex]] — exposed at package scope
    * only so the crash-window spec can interleave an append between
    * the log copy and the data snapshot.
    */
  private[graft] def copyLshIngestLog(
      spark: org.apache.spark.sql.SparkSession,
      srcPath: String, dstPath: String): Unit =
    // carry through BatchLog (round 18): the carried history must
    // include the COMPACTED file, not just the tail — a folded batch
    // id losing its guard at the new path would re-ingest on replay.
    // The new path starts as one tail file; fold it there on the
    // normal cadence ([[compactIngestReplayLog]]).
    graft.sources.BatchLog.copyTo(spark,
      s"$srcPath/ingest_log", s"$dstPath/ingest_log")

  /** Fold the LSH ingest loop's replay log into one file + watermark —
    * the [[graft.operators.Similarity.compactIngestReplayLog]] twin
    * for this index family (round 18; shared
    * [[graft.sources.BatchLog]] machinery). Content-neutral,
    * crash-convergent; run on the index-maintenance cadence. Returns
    * the number of tail files folded.
    */
  def compactIngestReplayLog(spark: org.apache.spark.sql.SparkSession,
      path: String): Int =
    graft.sources.BatchLog.compact(spark, s"$path/ingest_log")

  /** Data-snapshot leg of [[compactLshIndex]]: meta + re-banded
    * buckets + distinct'd hashes, all re-derived from the stored
    * hash sets. Must run AFTER [[copyLshIngestLog]] — see the
    * ordering contract there.
    */
  private[graft] def compactLshData(
      spark: org.apache.spark.sql.SparkSession,
      srcPath: String, dstPath: String): Unit = {
    val (shingleK, numHashes, bands) = lshMetaOf(spark, srcPath)
    import spark.implicits._
    writeLshMeta(spark, dstPath, shingleK, numHashes, bands)
    // takedown fold: tombstoned docs are physically absent from the
    // rewrite, and the tombstones themselves are NOT carried — the
    // compacted tree starts clean ([[deleteFromLshIndex]]'s lifecycle)
    val sh = minusTombstones(
        spark.read.parquet(s"$srcPath/hashes").select("id", "sh"),
        lshTombstones(spark, srcPath), "id")
      .distinct() // replay duplicates are byte-identical rows
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      writeSortedBuckets(bandedFromHashes(sh, "id", numHashes, bands),
        "overwrite", s"$dstPath/buckets")
      writeSortedHashes(sh, "overwrite", s"$dstPath/hashes")
    } finally sh.unpersist(false)
  }

  /** Takedown/delete for a persisted LSH index (round 13): append the
    * doc ids to `path/tombstones`. Every probe path anti-joins the
    * tombstone set (bounded: takedowns are human-scale events, so the
    * set broadcasts), making deleted docs PROBE-INVISIBLE immediately
    * — no rebuild, no file rewrite. Physical removal happens at the
    * next [[compactLshIndex]], which folds the tombstones into the
    * rewrite and does not carry them to the compacted tree.
    *
    * Semantics are "as if never indexed": a future batch near-dup of
    * a deleted doc is ADMITTED (the takedown point — the content must
    * stop influencing curation), and a replayed ingest batch cannot
    * resurrect a deleted doc because the ingest log retains the batch
    * id (the replay is a no-op; spec-pinned). Deleting an id not in
    * the index is a harmless no-op row. Idempotent: re-deletes
    * collapse in the distinct'd read.
    *
    * Quiesce contract: a delete racing a running compaction may miss
    * the rewrite (the compaction snapshots tombstones when it reads) —
    * re-issue such deletes against the compacted path (idempotent)
    * or pause deletes across compact-and-swap.
    *
    * Id lifecycle: a tombstoned ID stays dead until the next
    * compaction folds it — rows appended under that id before the
    * fold are masked, and the fold removes them. Re-ingested content
    * therefore lands under FRESH ids (the normal crawl flow; ids are
    * the caller's contract), never by resurrecting a taken-down one.
    * The content-keyed exact ledger differs: its append
    * re-establishes content by clearing the covering tombstone.
    */
  def deleteFromLshIndex(
      ids: DataFrame, idCol: String, path: String,
      maxTombstones: Long = defaultMaxTombstones): Unit =
    guardedTombstoneWrite("deleteFromLshIndex",
      ids.select(col(idCol).as("id")).distinct(), path, maxTombstones)

  /** Shared tail of every id/hash-keyed takedown: persist the
    * distinct'd set so the guard's count and the write are ONE
    * computation (round-14 review fix — the unpersisted form ran the
    * full distinct twice, and a non-deterministic input could even
    * write a different set than the one the guard admitted), guard,
    * then append. A refused delete writes nothing.
    */
  private[operators] def guardedTombstoneWrite(
      op: String, ts: DataFrame, path: String,
      maxTombstones: Long): Unit = {
    val cached =
      ts.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      guardTombstoneScale(op, path, cached.count(),
        pendingTombstoneCount(ts.sparkSession, path), maxTombstones)
      cached.repartition(1).write.mode("append")
        .parquet(s"$path/tombstones")
    } finally cached.unpersist(false)
  }

  /** Ceiling on a persisted index's PENDING tombstone set (requested
    * delete + already-pending rows), shared by every takedown path.
    * The tombstone design assumes a broadcast-scale set — every probe
    * anti-joins it, so past broadcast scale each probe silently pays a
    * giant broadcast instead of the rebuild the situation calls for.
    * 1M ids ≈ 8 MB of key bytes (tens of MB as a hashed relation) —
    * still cheap to broadcast and probe; past it, fail fast toward
    * "rebuild without the deleted rows". §4 carries the measured
    * crossover. Policy, not physics: every deleteFrom* exposes it.
    */
  val defaultMaxTombstones: Long = 1000000L

  /** The fail-fast itself — a corpus-scale delete is a rebuild, not a
    * tombstone (shared by LSH / exact-ledger / BM25 / IVF / PQ
    * takedowns; both counts are one aggregate job each, no driver
    * data).
    */
  private[operators] def guardTombstoneScale(
      op: String, path: String, incoming: Long, existing: Long,
      maxTombstones: Long): Unit =
    require(incoming + existing <= maxTombstones,
      s"$op: this delete would leave ${incoming + existing} pending " +
        s"tombstone rows at $path (> maxTombstones = $maxTombstones). " +
        "Tombstones are probe-time broadcast anti-joins, sized for " +
        "human-scale takedowns; a corpus-scale delete is a REBUILD — " +
        "compact/rebuild the index without the deleted rows instead, " +
        "or raise maxTombstones if your cluster can broadcast the set.")

  /** Pending (already written) tombstone row count at an index path —
    * 0 when the tree doesn't exist (one existence check).
    */
  private[operators] def pendingTombstoneCount(
      spark: org.apache.spark.sql.SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(s"$path/tombstones").count()
    else 0L
  }

  /** The distinct'd tombstone id set, if any — None on an index with
    * no deletes (the common case pays one existence check, no read).
    */
  private[operators] def lshTombstones(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      Some(spark.read.parquet(s"$path/tombstones").select("id").distinct())
    else None
  }

  /** Anti-join `df` against a tombstone set on `key` (broadcast — the
    * takedown set is bounded by definition; a corpus-scale delete is
    * a rebuild, not a tombstone).
    */
  private[operators] def minusTombstones(
      df: DataFrame, ts: Option[DataFrame], key: String): DataFrame =
    ts.map(t => df.join(
        broadcast(t.withColumnRenamed("id", key)), Seq(key), "left_anti"))
      .getOrElse(df)

  /** One micro-batch of the streaming LSH ingest loop — the
    * foreachBatch body that closes the live-corpus cycle
    * admit → dedup → index on a persisted LSH index:
    *
    *  1. replay guard: `path/ingest_log` records ingested batch ids;
    *     a restarted stream re-offering a logged batch is a no-op, so
    *     appends are exactly-once per batch id.
    *  2. within-batch near-dup: a batch doc whose Jaccard against a
    *     LOWER-id batch doc meets `threshold` is rejected (min-id
    *     survivor, d01's direction), under the INDEX's stored banding
    *     parameters so batch and index agree on what "near" means.
    *  3. index near-dup: survivors colliding with any indexed doc at
    *     `threshold` are rejected ([[dedupAgainstLshIndex]]).
    *  4. the admitted remainder is appended ([[appendToLshIndex]]),
    *     then the batch id is logged with its admitted count.
    *
    * Crash window: a failure between the data append and the log
    * write leaves the batch unlogged, so the restarted stream replays
    * it and re-appends — duplicate byte-identical index rows, never
    * wrong ones (same text ⇒ same banding/hash rows; the re-run's
    * admission decisions repeat because the extra rows only ADD
    * already-rejected collisions). Both probe paths distinct their
    * output, so duplicated rows cannot change any probe result
    * (spec-pinned: a crashed-and-replayed ingest leaves the index
    * probe-identical to a clean batch rebuild). This recover-by-replay
    * stance — rather than the BM25 generation-pointer commit — is
    * deliberate: LSH index rows are idempotent facts, while BM25's
    * n_docs/n_tokens stats would double-count.
    *
    * Wire it:
    * {{{
    * docs.writeStream
    *   .foreachBatch(Dedup.lshIngestBatch("doc_id", "text", path) _)
    *   .start()
    * }}}
    */
  def lshIngestBatch(idCol: String, textCol: String, path: String,
                     threshold: Double = 0.5,
                     maxBucketSize: Int = Int.MaxValue)
                    (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val logPath = s"$path/ingest_log"
    // watermark → compact → tail (round 18, the shared BatchLog
    // probe): a long-lived ingest stream stops paying O(batches)
    // listing metadata per trigger once [[compactIngestReplayLog]]'s
    // fold runs on the maintenance cadence
    val replayed = graft.sources.BatchLog.contains(spark, logPath, batchId)
    if (replayed) return
    val (shingleK, numHashes, bands) = lshMetaOf(spark, path)
    val scope = new CacheScope
    try {
      val b = scope.persistTracked(batch)
      val selfDrop = minhashDuplicates(b, idCol, textCol,
          shingleK = shingleK, numHashes = numHashes, bands = bands,
          threshold = threshold, maxBucketSize = maxBucketSize,
          scope = scope)
        .select(col("id_b").as(idCol))
      val idxDrop = dedupAgainstLshIndex(b, idCol, textCol, path,
          threshold, maxBucketSize, scope)
        .select(col("id_right").as(idCol))
      // eager localCheckpoint severs the plan's dependency on the
      // index paths BEFORE the append mutates them: admitted's lazy
      // plan reads the index (the probe), and a post-append recompute
      // (cache invalidation refreshes plans reading a written path)
      // would see the batch's own rows in the index and self-collide
      // everything to zero
      val admitted = b.join(selfDrop, Seq(idCol), "left_anti")
        .join(idxDrop, Seq(idCol), "left_anti")
        .localCheckpoint()
      appendToLshIndex(admitted, idCol, textCol, path)
      // driver-direct 1-row log append (r20 — TinyParquet)
      graft.sources.TinyParquet.appendRows(spark, logPath,
        """message spark_schema {
          |  required int64 batch_id;
          |  required int64 n_admitted;
          |}""".stripMargin,
        Seq(Seq[Any](batchId, admitted.count())))
    } finally scope.release()
  }

  /** Dedup an ingest batch against a persisted LSH index: batch docs
    * whose word-shingle Jaccard against any INDEXED doc meets
    * `threshold`. Candidates come from the (band, bucket) join of the
    * batch's banding against the stored banding — cost is linear in
    * cross-collisions and in the BATCH size, never in the indexed
    * corpus (whose text is not even readable from here). The verify
    * join touches stored hash sets only for candidate ids.
    * `maxBucketSize` is the same either-side skew guard as
    * [[decontaminate]]: at index scale the count on the stored side is
    * a columnar scan of (band, bucket) pairs, no text.
    *
    * Output: (id_left = indexed id, id_right = batch id, jaccard) —
    * identical contract to `decontaminate(indexedCorpus, batch, …)`,
    * which is exactly what the spec pins it against.
    */
  def dedupAgainstLshIndex(
      batch: DataFrame, idCol: String, textCol: String, path: String,
      threshold: Double = 0.5, maxBucketSize: Int = Int.MaxValue,
      scope: CacheScope = batchScope): DataFrame = {
    val spark = batch.sparkSession
    val (shingleK, numHashes, bands) = lshMetaOf(spark, path)
    val shB = scope.persistTracked(hashedCorpus(batch, idCol, textCol, shingleK))
    val bandedB = scope.persistTracked(
      bandedFromHashes(shB, "id_right", numHashes, bands))
    // takedown filter first: tombstoned docs leave the candidate
    // space before any pushdown regime or skew count sees them
    val bIdx0 = minusTombstones(
      spark.read.parquet(s"$path/buckets")
        .select(col("id").as("id_left"), col("band"), col("bucket")),
      lshTombstones(spark, path), "id_left")
    // Guarded bucket-set pushdown (round 11 — the 100× probe's
    // measured linear term): the candidate join can only ever match
    // index rows whose (band, bucket) appears in the batch's banding,
    // and that set is batch-bounded (≤ |batch|·bands pairs). When it
    // fits the In cap it collects (off the cached batch banding — one
    // cheap bounded job) and prunes the scan, in one of two regimes
    // picked by per-band set size — both MEASURED, neither dominates:
    //
    //  - SMALL batch (every band's bucket set ≤ maxBandLocalBuckets,
    //    the streaming-micro-batch shape): a UNION of per-band scans,
    //    each carrying `band === b` (a clean partition filter — band
    //    inside a mixed disjunction would block pushdown) AND that
    //    band's bucket In set pushed to parquet. Band-LOCAL sets are
    //    what makes row-group stats bite (2-doc batch: 30/129 groups
    //    accepted, spec) — a global union leaks every band's values
    //    into every band's files. Union width = `bands`, a build
    //    constant.
    //  - LARGE batch: hundreds of buckets per band straddle every row
    //    group anyway (stats saturate), and a pushed several-hundred-
    //    value parquet predicate costs per RECORD; one flat scan with
    //    a single Spark-side InSet over all buckets is strictly
    //    cheaper (100×-probe measured: 6.9 s global vs 18.1 s
    //    per-band at a 500-doc batch).
    //
    // A flood-scale batch (> maxIsinIds pairs) keeps the full scan —
    // the join stays exact in every regime, and the skew guard's
    // per-(band, bucket) counts are complete for every group the
    // filter retains (the predicate keeps or drops whole
    // (band, bucket) groups, never part of one).
    val bIdx = {
      val pairs = bandedB.select("band", "bucket").distinct()
        .limit(maxIsinIds + 1).collect()
      if (pairs.length > maxIsinIds) bIdx0
      else if (pairs.isEmpty) bIdx0.where(lit(false)) // empty batch
      else {
        val byBand = pairs.groupBy(_.getInt(0))
        if (byBand.valuesIterator.map(_.length).max <= maxBandLocalBuckets)
          byBand.toSeq.map { case (b, rs) =>
            bIdx0.where(col("band") === b &&
              col("bucket").isin(rs.map(_.getLong(1)).toIndexedSeq: _*))
          }.reduce(_ unionByName _)
        else
          bIdx0.where(col("bucket")
            .isin(pairs.map(_.getLong(1)).distinct.toIndexedSeq: _*))
      }
    }
    val cands = scope.persistTracked(crossCandidatesFromBanded(
      bIdx, bandedB, maxBucketSize))
    val shIdx0 = spark.read.parquet(s"$path/hashes")
    // Guarded point-read of the indexed hash sets (round 9, the ANN
    // rerank's static-In stance): the verify join's indexed side used
    // to SCAN every stored hash set — an index-sized read per probe.
    // The candidate id set is batch-bounded (capped banding), so when
    // it fits an In filter it collects (off the cached candidate
    // frame — two cheap actions, count then collect) and pushes into
    // the hashes scan: with the range-sorted bloom-filtered layout
    // [[writeLshIndex]] writes, that is ≤ |candidate ids| row-group
    // reads instead of the whole tree. A flood-scale candidate set
    // (> maxIsinIds) keeps the join — collecting it would trade a
    // scan for a driver cliff.
    val shIdx = {
      // one guarded action: collect at most maxIsinIds+1 distinct ids
      // (materializing the candidate cache the verify join reuses);
      // an overflowing set falls back to the join-based verify
      val ids = cands.select("id_left").distinct()
        .limit(maxIsinIds + 1).collect().map(_.get(0))
      if (ids.length <= maxIsinIds)
        shIdx0.where(col("id").isin(ids.toIndexedSeq: _*))
      else shIdx0
    }
    cands
      .join(shIdx.withColumnsRenamed(Map("id" -> "id_left", "sh" -> "sh_l")), "id_left")
      .join(shB.withColumnsRenamed(Map("id" -> "id_right", "sh" -> "sh_r")), "id_right")
      .select(col("id_left"), col("id_right"),
        jaccardOf(col("sh_l"), col("sh_r")).as("jaccard"))
      .where(col("jaccard") >= threshold)
      // duplicate tolerance: a [[lshIngestBatch]] crash-window replay
      // can leave byte-identical duplicate index rows, which multiply
      // verify-join rows with IDENTICAL values — a result-sized
      // distinct restores exact probe output. No-op (and ~free) on a
      // clean index: candidates are already pair-distinct and hashes
      // hold one row per id.
      .distinct()
  }

  /** Incremental cross-source dup matrix: [[crossSourceDupMatrix]]'s
    * report for an INGEST BATCH probed against a persisted LSH index —
    * which sources does today's delivery mirror, without re-hashing
    * (or even having) the indexed corpus text. Pairs come from
    * [[dedupAgainstLshIndex]] (cost linear in the batch and its
    * cross-collisions, never in the index); the indexed side's
    * sources arrive as a caller-supplied (idCol, sourceCol) frame —
    * catalog metadata the index deliberately does not store (it
    * holds bandings and hash sets, never attributes). Attaching
    * sources is two id-keyed joins on the pair set; the rollup is
    * ≤|sources|² rows.
    *
    * Output: (source_a ≤ source_b lexicographically, n_pairs) — the
    * same contract as the batch matrix, so dashboards can union the
    * two.
    *
    * Catalog completeness (round 9): the indexed-side source join is
    * LEFT — a pair whose indexed id is missing from `indexSources`
    * lands under the sentinel source `"unknown"` instead of silently
    * leaving the matrix, so a catalog gap is VISIBLE in the output
    * (an `unknown` row means "fix the catalog", and the matrix's
    * pair total always equals [[dedupAgainstLshIndex]]'s pair
    * count). The batch side needs no sentinel: its sources come from
    * the probed frame itself, which by construction has one row per
    * probed id.
    */
  def dupMatrixAgainstLshIndex(
      batch: DataFrame, idCol: String, textCol: String, sourceCol: String,
      path: String, indexSources: DataFrame,
      threshold: Double = 0.5, maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val pairs = dedupAgainstLshIndex(batch, idCol, textCol, path,
      threshold, maxBucketSize)
    val bSrc = batch.select(col(idCol).as("id_right"),
      col(sourceCol).as("_dm_sb"))
    val iSrc = indexSources.select(col(idCol).as("id_left"),
      col(sourceCol).as("_dm_sa"))
    pairs.join(iSrc, Seq("id_left"), "left").join(bSrc, "id_right")
      .select(coalesce(col("_dm_sa"), lit("unknown")).as("_dm_sa"),
              col("_dm_sb"))
      .select(least(col("_dm_sa"), col("_dm_sb")).as("source_a"),
              greatest(col("_dm_sa"), col("_dm_sb")).as("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Within-corpus near-dup pairs straight from a persisted LSH index
    * — [[minhashDuplicates]] semantics without touching (or even
    * having) the corpus text: candidates from the stored banding
    * self-joined on (band, bucket), verify from the stored hash sets.
    * This is the re-dedup shape after appends ("what duplicates does
    * the index hold NOW?") and costs one columnar banding self-join +
    * the candidate-bounded verify, never a re-hash of the corpus.
    * Output: (id_a, id_b, jaccard) with id_a < id_b, ≥ threshold.
    */
  def selfDedupFromLshIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      threshold: Double = 0.5, maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val banded = minusTombstones(
      spark.read.parquet(s"$path/buckets")
        .select(col("id"), col("band"), col("bucket")),
      lshTombstones(spark, path), "id")
    jaccardVerifyHashed(
      selfCandidatesFromBanded(banded, maxBucketSize),
      spark.read.parquet(s"$path/hashes"), threshold)
      // duplicate tolerance — same contract as the probe in
      // [[dedupAgainstLshIndex]]: replayed appends can only duplicate
      // identical rows, never change values, and the distinct makes
      // them invisible to callers.
      .distinct()
  }

  /** Occupancy snapshot of a persisted LSH index — the maintenance
    * monitor [[Similarity.cellStats]] is for IVF, applied to banding
    * buckets. The quantity that matters is SATURATION against the
    * probe-time `maxBucketSize` cap: every doc in a bucket past the
    * cap contributes candidates the capped probe will DROP, so
    * `saturatedDocRows / totalRows` estimates the fraction of banding
    * rows whose candidate pairs are being sacrificed to flood
    * control. A healthy text index keeps it near zero; growth over
    * appends means boilerplate is pooling (raise shingle K, pre-clean
    * with [[TextAnalysis.cleanLines]], or re-shard the corpus) — the
    * documented rebuild trigger, now measured instead of prose.
    */
  final case class LshBucketStats(
      totalRows: Long, nBuckets: Long, maxBucket: Long,
      saturatedBuckets: Long, saturatedDocRows: Long,
      saturatedRowFrac: Double)

  /** One columnar scan of the stored (band, bucket) pairs; the
    * collect is one row. `capForStats` should match the probe-time
    * maxBucketSize.
    */
  def lshBucketStats(
      spark: org.apache.spark.sql.SparkSession, path: String,
      capForStats: Int): LshBucketStats = {
    require(capForStats >= 2, "lshBucketStats: cap must be >= 2")
    val per = spark.read.parquet(s"$path/buckets")
      .groupBy("band", "bucket").agg(count(lit(1)).as("n"))
    val r = per.agg(
      coalesce(sum("n"), lit(0L)).as("total"),
      count(lit(1)).as("nb"),
      coalesce(max("n"), lit(0L)).as("mx"),
      coalesce(sum(when(col("n") > capForStats, 1L).otherwise(0L)), lit(0L))
        .as("satB"),
      coalesce(sum(when(col("n") > capForStats, col("n")).otherwise(0L)),
        lit(0L)).as("satRows")).head()
    val total = r.getLong(0)
    LshBucketStats(
      totalRows = total, nBuckets = r.getLong(1), maxBucket = r.getLong(2),
      saturatedBuckets = r.getLong(3), saturatedDocRows = r.getLong(4),
      saturatedRowFrac =
        if (total == 0) 0.0 else r.getLong(4).toDouble / total)
  }

  /** Content diff of two corpus snapshots — the review artifact
    * between dataset versions ("what did this recrawl/refilter change
    *?"): per id, `added` (only in `b`), `removed` (only in `a`),
    * `changed` (both, content differs), `unchanged`.
    *
    * Content compares by xxhash64 computed BEFORE the join, so the
    * full-outer exchange carries (id, 8-byte hash) — never document
    * text ([[exact]]'s collision stance; a string-exact oracle twin
    * catches a collision). One join keyed on the id; no window.
    */
  def snapshotDiff(
      a: DataFrame, b: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ha = a.select(col(idCol).as("id"), xxhash64(col(textCol)).as("_sd_ha"))
    val hb = b.select(col(idCol).as("id"), xxhash64(col(textCol)).as("_sd_hb"))
    ha.join(hb, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("_sd_ha").isNull, "added")
          .when(col("_sd_hb").isNull, "removed")
          .when(col("_sd_ha") =!= col("_sd_hb"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Exact-dedup ledger: the content-hash twin of the LSH index for
    * the most common incremental question — "which of today's docs
    * has the pipeline never seen, byte-for-byte?". The ledger is the
    * DISTINCT xxhash64(text) set (8 bytes/doc — a 10¹²-doc corpus is
    * an 8 TB ledger, scannable; same collision stance as [[exact]]).
    */
  /** The ledger tree's layout policy, in ONE place (round 11):
    * range-sorted by content_hash with a hash bloom filter — what
    * makes admission's guarded hash-set pushdown a row-group-pruned
    * read (≤ |batch| row groups of an arbitrarily large ledger
    * instead of a full-column anti-join scan; an 8 TB ledger at
    * 10¹² docs stops being an 8 TB read per ingest batch).
    */
  private def writeLedgerHashes(h: DataFrame, mode: String,
                                path: String): Unit =
    h.repartitionByRange(col("content_hash"))
      .sortWithinPartitions("content_hash")
      .write.mode(mode)
      .option("parquet.bloom.filter.enabled#content_hash", "true")
      .option("parquet.bloom.filter.expected.ndv#content_hash", "1000000")
      .parquet(path)

  def writeExactLedger(
      df: DataFrame, textCol: String, path: String): Unit =
    writeLedgerHashes(
      df.select(xxhash64(col(textCol)).as("content_hash")).distinct(),
      "overwrite", s"$path/hashes")

  /** Record a batch's content hashes in the ledger (append-only;
    * cross-generation duplicate hashes are harmless — admission is an
    * anti-join). Callers append the ADMITTED batch after a successful
    * ingest, making admit-then-append exactly-once per content.
    */
  def appendToExactLedger(
      df: DataFrame, textCol: String, path: String): Unit = {
    val hashes = df.select(xxhash64(col(textCol)).as("content_hash"))
      .distinct()
    // appended hashes keep the sorted layout (narrow ranges per
    // appended file + bloom), so admission pruning survives appends
    writeLedgerHashes(hashes, "append", s"$path/hashes")
    // Takedown lifecycle (round-13 review fix): an append
    // RE-ESTABLISHES its content — clear any tombstone covering an
    // appended hash, or the tombstone would mask the new ledger row
    // forever (unbounded re-admission of the same content) and the
    // next compaction would destroy the legitimately re-appended
    // hash. Order matters: data first, clear second — a crash
    // between the two leaves the tombstone masking a present row,
    // which only re-admits the content once more before the retry's
    // clear converges (the log-before-data stance inverted for the
    // same reason: the safe failure mode is a transient duplicate,
    // never a loss). Quiesce: a delete racing this clear may be
    // dropped — re-issue it (idempotent).
    clearLedgerTombstones(df.sparkSession, path, hashes)
  }

  /** Remove tombstones covered by `hashes` (eagerly materialized
    * before the overwrite — the Layout.compact in-place stance:
    * overwrite truncates before a lazy read would run).
    */
  private def clearLedgerTombstones(
      spark: org.apache.spark.sql.SparkSession, path: String,
      hashes: DataFrame): Unit = {
    val tp = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(tp)) {
      val remaining = spark.read.parquet(s"$path/tombstones")
        .select("content_hash").distinct()
        .join(hashes, Seq("content_hash"), "left_anti")
        .localCheckpoint() // eager: sever from the path before overwrite
      remaining.repartition(1).write.mode("overwrite")
        .parquet(s"$path/tombstones")
    }
  }

  /** Compact a persisted exact-dedup ledger into a fresh tree
    * (round 11 — the LSH/BM25 compaction stance for the simplest
    * index): one distinct over the stored 8-byte column collapses
    * cross-generation duplicate hashes, and the rewrite restores the
    * globally-sorted layout append streams erode (each append's
    * files span their own full hash range, so after many ingest
    * cycles admission pruning degrades toward a full scan). Same
    * rebuild stance as [[writeLshIndex]]: fresh path, source stays
    * admissible throughout, caller swaps pointers.
    *
    * Quiesce contract (round-13 audit, alongside the
    * [[compactLshIndex]] ordering fix): the ledger has no ingest log
    * — appends are idempotent and admission is an anti-join — so
    * there is no logged-but-absent data-loss window here. A
    * concurrent [[appendToExactLedger]] landing after the distinct's
    * file listing is simply missing from the compacted tree: its
    * content can be admitted once more (a dedup MISS, never a lost
    * document). Callers that cannot tolerate the miss should pause
    * appends across the compact-and-swap, or re-append the racing
    * batch's hashes to the new path (idempotent by design).
    */
  def compactExactLedger(spark: org.apache.spark.sql.SparkSession,
                         srcPath: String, dstPath: String): Unit =
    // takedown fold: tombstoned hashes leave the rewrite physically;
    // tombstones are not carried (deleteFromExactLedger's lifecycle)
    writeLedgerHashes(
      ledgerMinusTombstones(
        spark.read.parquet(s"$srcPath/hashes").distinct(),
        ledgerTombstones(spark, srcPath)),
      "overwrite", s"$dstPath/hashes")

  /** Takedown/delete for the exact-dedup ledger (round 13): append the
    * docs' content hashes to `path/tombstones`. Admission anti-joins
    * the tombstone set immediately, so deleted content becomes
    * ADMITTABLE again — the post-hoc decontamination shape ("we
    * ledgered benchmark text by mistake; let the clean recrawl back
    * in") and the takedown shape (the hash itself is derived data the
    * policy may require dropping). Physical removal at the next
    * [[compactExactLedger]], which folds tombstones and does not
    * carry them. Idempotent; unknown hashes are harmless.
    *
    * Lifecycle (round-13 review fix): a later
    * [[appendToExactLedger]] of the same content RE-ESTABLISHES it —
    * the append clears the covering tombstone, so the admit→append
    * loop naturally restores dedup for re-admitted content instead
    * of masking the new ledger row forever.
    */
  def deleteFromExactLedger(
      docs: DataFrame, textCol: String, path: String,
      maxTombstones: Long = defaultMaxTombstones): Unit =
    guardedTombstoneWrite("deleteFromExactLedger",
      docs.select(xxhash64(col(textCol)).as("content_hash")).distinct(),
      path, maxTombstones)

  private def ledgerTombstones(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      Some(spark.read.parquet(s"$path/tombstones")
        .select("content_hash").distinct())
    else None
  }

  private def ledgerMinusTombstones(
      led: DataFrame,
      ts: Option[DataFrame]): DataFrame =
    ts.map(t => led.join(broadcast(t), Seq("content_hash"), "left_anti"))
      .getOrElse(led)

  /** Streaming admission against a persisted exact ledger: the
    * ingest-time twin of [[admitAgainstExactLedger]] — drop stream
    * docs whose content hash the ledger already holds (stream-static
    * anti-join, stateless; the ledger projection is scope-persisted so
    * micro-batches don't re-read it), then within-stream first-arrival
    * dedup via the watermarked content-hash state
    * ([[streamingExact]]'s contract). The static side is the ledger
    * SNAPSHOT at query start — content admitted mid-stream is deduped
    * by the in-stream state, not the ledger; restart the query after
    * [[appendToExactLedger]] to fold a new generation in. Emits the
    * admitted rows + `content_hash` (feed them back to the ledger
    * append on successful ingest).
    */
  def streamingAdmitAgainstExactLedger(
      docs: DataFrame, textCol: String, tsCol: String, watermark: String,
      path: String, scope: CacheScope = streamingScope): DataFrame = {
    val led = scope.persistTracked(ledgerMinusTombstones(
      docs.sparkSession.read.parquet(s"$path/hashes"),
      ledgerTombstones(docs.sparkSession, path)))
    docs.withColumn("content_hash", xxhash64(col(textCol)))
      .join(led, Seq("content_hash"), "left_anti")
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")
  }

  /** Admit the byte-new documents of an ingest batch: within-batch
    * survivors ([[exact]]'s min-id contract) whose content hash is
    * absent from the ledger. One hash aggregation of the batch + one
    * anti-join against the ledger's 8-byte column — the batch text
    * shuffles zero times beyond the survivor groupBy, and the ledger
    * is never read as text because it has none. Output: the admitted
    * batch rows + (content_hash, n_copies = within-batch multiplicity).
    *
    * Cache release contract (round 13): the RETURNED frame's plan
    * references the scope-persisted survivor projection, so the
    * cache must outlive consumption of the result — which is why
    * this method cannot release it. One-shot callers on the default
    * scope call [[unpersistAll]] after consuming. Long-lived ingest
    * loops (one admission per arriving batch) MUST NOT accumulate on
    * the shared [[batchScope]]: pass a per-batch `new CacheScope`,
    * consume (write/append) the admitted rows eagerly, and
    * `scope.release()` in a finally — the [[lshIngestBatch]]
    * pattern. A frame consumed after release recomputes correctly;
    * only the hash-once economy is lost.
    */
  def admitAgainstExactLedger(
      batch: DataFrame, idCol: String, textCol: String,
      path: String, scope: CacheScope = batchScope): DataFrame = {
    require(idCol != "survivor_id",
      "admitAgainstExactLedger: idCol must not be named survivor_id")
    val surv = scope.persistTracked(exact(batch, idCol, textCol))
    val led0 = batch.sparkSession.read.parquet(s"$path/hashes")
    // Guarded hash-set pushdown (round 11, the LSH probe's bucket
    // stance): the anti-join can only ever MATCH ledger rows whose
    // hash appears among the batch's survivors — a batch-bounded set.
    // When it fits the In cap it collects (off the cached survivor
    // frame) and pushes into the ledger scan: with
    // [[writeLedgerHashes]]' sorted bloom layout that is ≤ |batch|
    // row-group reads instead of a full-ledger scan. Dropping
    // non-matching rows cannot change the anti-join's output (rows
    // absent from the batch's hash set never matched anything), and
    // a flood-scale batch keeps the full scan.
    val led = ledgerMinusTombstones({
      val hs = surv.select("content_hash").distinct()
        .limit(maxIsinIds + 1).collect().map(_.get(0))
      if (hs.length <= maxIsinIds)
        led0.where(col("content_hash").isin(hs.toIndexedSeq: _*))
      else led0
    }, ledgerTombstones(batch.sparkSession, path))
    surv
      .join(led, Seq("content_hash"), "left_anti")
      .join(batch, col("survivor_id") === col(idCol))
      .drop("survivor_id")
  }

  /** Benchmark n-gram overlap contamination score (the GPT-3 appendix
    * style "dirty if it shares n-grams with the benchmark" check, as a
    * per-document FRACTION rather than d07's pair list): for every
    * train doc, the share of its distinct word `shingleK`-shingles
    * that appear anywhere in `bench`. 1.0 = every shingle leaked;
    * scores feed a threshold the caller owns (GPT-3 used containment
    * of 8-grams; the default here matches the suite's 3-shingle
    * convention).
    *
    * Scale shape: the benchmark side is DISTINCT shingle hashes —
    * definitionally small (eval sets are thousands of docs, not
    * billions) — broadcast to a left join against the train corpus's
    * exploded shingles; one exchange of (doc_id, flag) pairs re-
    * aggregates per doc. Train text is hashed once, streamed through
    * the codegen'd shingle kernel; nothing is quadratic and nothing
    * shuffles full text.
    *
    * Output: (id, n_shingles, n_contaminated, overlap_frac), one row
    * per train doc (docs with zero shingle overlap included, frac 0).
    */
  def ngramOverlapScore(
      train: DataFrame, bench: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3): DataFrame = {
    val benchSh = bench
      .select(explode(shingleHashes(col(textCol), shingleK)).as("_no_h"))
      .distinct()
    train
      .select(col(idCol).as("id"),
        explode(shingleHashes(col(textCol), shingleK)).as("_no_sh"))
      .join(broadcast(benchSh), col("_no_sh") === col("_no_h"), "left")
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("_no_h").isNotNull, 1L).otherwise(0L))
          .as("n_contaminated"))
      .select(col("id"), col("n_shingles"), col("n_contaminated"),
        (col("n_contaminated").cast("double") / col("n_shingles"))
          .as("overlap_frac"))
  }

  /** Duplicated-SPAN detection — the windowed form of exact substring
    * dedup (the suffix-array pass of Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better", re-expressed for a
    * distributed engine): every k-token window whose hash occurs
    * ≥ minCount times CORPUS-WIDE (across docs AND within one doc —
    * occurrences, not distinct docs) is duplicated; per doc,
    * overlapping/touching duplicated windows merge into maximal spans
    * `[span_start, span_end)` in token offsets. This is what doc-level
    * dedup (d01/d02) structurally misses: two long documents sharing
    * one boilerplate paragraph are nowhere near Jaccard-duplicate,
    * but the paragraph itself is repeated training text.
    *
    * Scale shape: the corpus-sized stage is ONE codegen'd kernel pass
    * (token_window_hashes — positional FNV chains, no window strings
    * materialized) + posexplode to (id, pos, 8-byte hash) rows. The
    * duplicated-hash set comes from a map-side-combined count on the
    * 8-byte key (partial counts collapse per partition before the
    * exchange); the windows-side join lets AQE broadcast that set in
    * the common case (duplicated windows are the small minority of a
    * healthy corpus). Span merge is gaps-and-islands — a window
    * PARTITIONED BY DOC over the duplicated windows only (a running
    * max over preceding ends; never a global sort).
    *
    * Hash-keyed with the d01 collision stance: the string-exact
    * DuckDB oracle (d13) would catch an FNV collision merging two
    * distinct windows.
    */
  def duplicatedWindowSpans(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int, minCount: Int = 2): DataFrame = {
    require(k >= 2, s"window width k must be ≥ 2, got $k")
    require(minCount >= 2, s"minCount must be ≥ 2, got $minCount")
    import org.apache.spark.sql.expressions.Window
    val wins = docs.select(
      col(idCol),
      posexplode(graft.functions.TextKernelOps
        .tokenWindowHashes(col(textCol), k)).as(Seq("pos", "wh")))
    val dup = wins.groupBy("wh").agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= minCount)
      .select("wh")
    val w = Window.partitionBy(idCol).orderBy("pos")
    val prevMaxEnd = max(col("pos") + lit(k))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    wins.join(dup, "wh")
      // a window starts a new span iff its coverage [pos, pos+k)
      // neither overlaps nor touches the furthest end seen so far
      .withColumn("_sp_new",
        when(prevMaxEnd.isNull || col("pos") > prevMaxEnd, 1L)
          .otherwise(0L))
      .withColumn("_sp_id",
        sum("_sp_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(idCol), col("_sp_id"))
      .agg(min("pos").as("span_start"),
        (max(col("pos")) + lit(k)).as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"))
  }

  /** Span REMOVAL: drop every token covered by a duplicated span and
    * reassemble the document (the curation rewrite
    * duplicatedWindowSpans exists for). Emits the original docs plus
    * `clean_text` (surviving tokens joined by single spaces —
    * original whitespace inside removed regions is gone, the
    * tokenization contract), `n_tokens`, `n_spans`, `n_cov_tokens`.
    * Docs without spans (including sub-k docs) pass through with
    * zeros; a fully-covered doc cleans to "".
    *
    * The span list joins back as a per-doc ARRAY (bounded by doc
    * length — never a corpus-wide explode of covered positions), and
    * the rewrite is a per-row builtin filter over token positions:
    * O(n_tokens · n_spans) per doc, no extra shuffle beyond the spans
    * computation itself.
    */
  def removeDuplicatedWindows(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int, minCount: Int = 2): DataFrame = {
    val spans = duplicatedWindowSpans(docs, idCol, textCol, k, minCount)
      .groupBy(idCol)
      .agg(
        sort_array(collect_list(struct(col("span_start"), col("span_end"))))
          .as("_sp_spans"),
        count(lit(1)).as("_sp_n"),
        sum(col("span_end") - col("span_start")).as("_sp_cov"))
    val toks = filter(split(col(textCol), "\\s+"), t => length(t) > 0)
    docs.join(spans, Seq(idCol), "left")
      .withColumn("_sp_toks", toks)
      .select(
        docs.columns.map(col) ++ Seq(
          when(col("_sp_spans").isNull,
              concat_ws(" ", col("_sp_toks")))
            .otherwise(concat_ws(" ",
              filter(col("_sp_toks"), (t, i) =>
                !exists(col("_sp_spans"), r =>
                  i >= r("span_start") && i < r("span_end")))))
            .as("clean_text"),
          size(col("_sp_toks")).cast("long").as("n_tokens"),
          coalesce(col("_sp_n"), lit(0L)).as("n_spans"),
          coalesce(col("_sp_cov"), lit(0L)).as("n_cov_tokens")): _*)
  }
}
