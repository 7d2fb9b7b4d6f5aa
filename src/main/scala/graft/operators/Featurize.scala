package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text → fixed-width feature vectors without a model — the bridge
  * from the text operators to the dense-vector family: hash-embedded
  * documents feed [[Similarity]]'s kNN/IVF/quantization machinery
  * unchanged (near-dup mining, clustering, diversity sampling) on
  * corpora that have no learned embeddings yet.
  *
  * FEATURE-HASH VERSION: round 13 moved the bucket hash from
  * xxhash64 to FNV-1a (`fnv_hash64`) so the quality scorer could be
  * oracle-gated. The hash IS the feature space: vectors materialized
  * to disk or [[QualityModel.LinearModel]] weights trained before
  * the switch are incompatible with post-switch scoring — recompute
  * vectors and retrain models together (nothing in this repo
  * persists either, but external checkpoints must not be mixed
  * across the boundary).
  */
object Featurize {

  /** Feature-hashed tf·idf document vectors ("hashing trick",
    * Weinberger et al.): each term lands in bucket
    * `xxhash64(term) mod dim` with a pseudo-random ±1 sign (an
    * independent hash bit — signed hashing keeps collision noise
    * zero-mean instead of additive), weighted tf · idf with t07's
    * RATIONAL idf `(N+1)/(df+1)` (no transcendentals — every value is
    * a fixed IEEE op sequence). Optional L2 normalization so cosine
    * against other hashed vectors is a plain dot product.
    *
    * Scale shape: the same stages tf·idf itself needs — one explode →
    * map-side-combined (doc, term) tf, a vocabulary-sized df
    * aggregate joined back on the term (hash join, 8-byte-hashable
    * keys), a (doc, bucket) re-aggregate, then ONE per-doc map build;
    * the dense array materializes once per document, `dim` floats
    * wide. No window, no driver loop; every shuffle key is a doc id,
    * term, or (doc, bucket).
    *
    * Collisions are the accepted trade (dim buckets for an unbounded
    * vocabulary); the spec pins that near-dup texts cosine ≈ 1 and
    * unrelated texts stay well-separated at dim = 256 on word-soup
    * vocabulary. Token-less docs emit the zero vector (normalized
    * form included — 0/1 guard, not NaN).
    *
    * Output: (id, vector: array<float> of length dim).
    */
  /** The sparse scaled-long form of [[hashedTfIdf]]: one row per
    * (doc, non-empty bucket) with the bucket's signed tf·idf sum as a
    * 6-decimal-scaled LONG (`_fh_v6` — exact integer arithmetic, the
    * s09 stance). This is both the dense builder's input and the
    * integer-exact surface [[QualityModel.score]] consumes directly:
    * a linear scorer never needs the dense array, and the sparse form
    * keeps the 100 TB scoring pass to (doc, bucket, long) rows.
    * Zero-token docs have no rows here; dense/scoring consumers
    * restore them. Output: (_fh_id, _fh_b, _fh_v6).
    */
  /** Per-TERM quantized weights: one row per (doc, term occurrence
    * group) — (_fh_id, _fh_b, _fh_q6) BEFORE the per-bucket
    * collision sum. This is the shuffle-minimal surface for linear
    * consumers: [[QualityModel.score]]'s margin distributes over the
    * bucket sum exactly (integer products of scaled longs), so it
    * aggregates these rows straight to the doc key — one exchange
    * fewer than going through [[hashedTfIdfSparse]] (round-13 c09
    * plan audit; the dense builder still needs the bucket grouping).
    */
  private[operators] def hashedTfIdfTermWeights(
      df: DataFrame, idCol: String, textCol: String, dim: Int,
      scope: Dedup.CacheScope = Dedup.batchScope): DataFrame = {
    require(dim >= 2, "hashedTfIdf: dim must be >= 2")
    val tf = scope.persistTracked(
      df.select(col(idCol).as("_fh_id"),
          explode(TextAnalysis.tokens(col(textCol))).as("term"))
        .groupBy("_fh_id", "term").agg(count(lit(1)).as("tf")))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))

    // FNV-1a codepoint hash (round 13, was xxhash64): same collision
    // class for the hashing trick, but DuckDB-replayable with the d03
    // HUGEINT idiom — what lets QualityModel.score be oracle-GATED
    // (c09). With a power-of-two dim, unsigned-mod in the oracle
    // equals Spark's signed pmod (2⁶⁴ ≡ 0 mod 2ᵏ).
    val h = graft.functions.TextKernelOps.fnvHash64(col("term"))
    val bucket = pmod(h, lit(dim.toLong)).cast("int")
    // an independent bit of the same hash (bit 32 — above the bucket
    // bits for any sane dim): ±1 sign, exact long bit ops
    val sign = when(pmod(shiftright(h, 32), lit(2)) === 0, lit(1.0))
      .otherwise(lit(-1.0))
    val weight = col("tf").cast("double") *
      ((col("n_docs") + lit(1)) / (col("df") + lit(1))) * sign

    tf
      .join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .select(col("_fh_id"), bucket.as("_fh_b"),
        // 6-decimal-scaled LONG (the s09 trick): all downstream sums
        // are exact integer arithmetic, retry/partition-deterministic
        floor(weight * lit(1e6) + lit(0.5)).cast("long").as("_fh_q6"))
  }

  def hashedTfIdfSparse(
      df: DataFrame, idCol: String, textCol: String, dim: Int,
      scope: Dedup.CacheScope = Dedup.batchScope): DataFrame =
    hashedTfIdfTermWeights(df, idCol, textCol, dim, scope)
      .groupBy("_fh_id", "_fh_b")
      .agg(sum("_fh_q6").as("_fh_v6"))

  def hashedTfIdf(
      df: DataFrame, idCol: String, textCol: String, dim: Int = 256,
      normalize: Boolean = true,
      scope: Dedup.CacheScope = Dedup.batchScope): DataFrame = {
    val sparse = scope.persistTracked(
      hashedTfIdfSparse(df, idCol, textCol, dim, scope))
    val buckets = sparse.select(col("_fh_id"), col("_fh_b"),
      (col("_fh_v6") / lit(1e6)).as("_fh_v"))

    val dense = buckets
      .groupBy("_fh_id")
      .agg(map_from_arrays(collect_list("_fh_b"), collect_list("_fh_v"))
        .as("_fh_m"))
      .select(col("_fh_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("_fh_m"), i), lit(0.0))).as("_fh_raw"))

    val out =
      if (!normalize) dense.select(col("_fh_id"), col("_fh_raw"))
      else {
        // norm bound in its own projection (the t20 lambda trap: a
        // lambda body sits outside codegen subexpression elimination,
        // so an inlined O(dim) fold would re-run per element — O(dim²)
        // per doc)
        dense
          .withColumn("_fh_norm", sqrt(aggregate(col("_fh_raw"), lit(0.0),
            (acc, x) => acc + x * x)))
          .select(col("_fh_id"),
            transform(col("_fh_raw"),
              x => x / when(col("_fh_norm") === 0.0, 1.0)
                .otherwise(col("_fh_norm"))).as("_fh_raw"))
      }
    // docs with no tokens never reach `buckets` — restore them as
    // zero vectors so the output covers the input exactly. The id set
    // in `out` is exactly the ids in the CACHED sparse table —
    // anti-join against that, not against `out`, whose whole
    // vector-build chain would otherwise execute a second time
    val zeros = df.select(col(idCol).as("_fh_id"))
      .join(sparse.select("_fh_id").distinct(), Seq("_fh_id"), "left_anti")
      .select(col("_fh_id"),
        transform(sequence(lit(0), lit(dim - 1)), _ => lit(0.0))
          .as("_fh_raw"))
    out.unionByName(zeros)
      .select(col("_fh_id").as(idCol),
        col("_fh_raw").cast("array<float>").as("vector"))
  }
}
