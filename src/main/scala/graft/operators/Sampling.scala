package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data mixing.
  * Everything here is pure integer arithmetic over codegen'd
  * builtins, so results are identical at any parallelism AND across
  * engines — the property that lets the driver's DuckDB oracle gate
  * a sampler at all.
  */
object Sampling {

  /** Integer-weighted sampling without replacement — the "best of w
    * draws" scheme: every row takes `weight` independent integer hash
    * draws (sequence + transform, no UDF) and competes with its
    * MINIMUM; the global top-k by (key, id) keeps rows with inclusion
    * probability ≈ proportional to weight. Why: the min of w iid
    * uniforms is Beta(1, w), so P(key ≤ t) ≈ w·t at the small
    * threshold a selective k implies — the domain-reweighting
    * primitive ("books 8×, web 1×") for assembling a training mix.
    *
    * Deliberately NOT the classic A-ES exponential keys
    * (u^(1/w) / -ln(u)/w): those need IEEE pow/log, which are not
    * bit-identical across engines (Java Math.pow vs C pow differ in
    * ulps), so near-equal keys could rank differently under an
    * oracle. All-integer hashing sidesteps that entirely.
    *
    * `weight` must be a positive INTEGER column/expression (small —
    * the draw array is weight-long; cap domain weights at ~100).
    * Output: the input row plus `sample_key`, the k winners, ordered
    * by (sample_key, id). One TakeOrdered — no shuffle of the corpus.
    */
  /** The best-of-w-draws key shared by [[weightedSample]] and
    * [[weightedStratifiedSample]].
    *
    * hash(id, draw) in a 30-bit-safe domain: (id + draw·7919) stays
    * far below 2^31 for any realistic id, the 2654435761 multiply
    * below 2^62 — no overflow under ANSI mode. The draw stride MUST
    * NOT be a multiple of the output modulus 1000003: a stride
    * divisible by it cancels in the final mod and every draw
    * collapses to the same value (no weighting at all) — 7919 is
    * prime and coprime to both moduli.
    *
    * Enforces the positive-integer contract AT RUNTIME, per row: a
    * zero/negative weight makes the 2-arg sequence(1, w) run
    * DESCENDING (yielding 1+|1-w| draws — MORE aggressive sampling
    * for the rows the caller meant to exclude), and a NULL weight
    * yields a NULL key that sorts FIRST and monopolizes the top-k.
    * Both are silent wrong-sample bugs; fail loudly instead.
    * assert_true (not raise_error): Spark 4's raise_error(Column)
    * desugars to the 2-child USER_RAISED_EXCEPTION form whose
    * printed SQL doesn't re-parse (the SQL builder takes 1 arg), so
    * it would break the SqlGen roundtrip; assert_true prints as the
    * 2-arg SQL it parses from.
    */
  private def sampleKey(id: Column, weight: Column): Column = {
    val guard = assert_true(weight.isNotNull && weight >= 1, concat(
      lit("weightedSample: weight must be a positive integer, got "),
      coalesce(weight.cast("string"), lit("NULL"))))
    val checkedWeight = when(guard.isNull, weight)
    array_min(transform(sequence(lit(1), checkedWeight),
      r => pmod(
        pmod(id + r * lit(7919L), lit(2147483647L)) *
          lit(2654435761L),
        lit(1000003L))))
  }

  def weightedSample(
      df: DataFrame, idCol: String, weight: Column, k: Int): DataFrame = {
    require(k > 0)
    require(!df.columns.contains("sample_key"),
      "weightedSample: input already has a sample_key column")
    df.withColumn("sample_key", sampleKey(col(idCol), weight))
      .orderBy(col("sample_key"), col(idCol))
      .limit(k)
  }

  /** Per-stratum integer-weighted sampling — [[weightedSample]]'s
    * best-of-w-draws keys ranked WITHIN each stratum, k winners per
    * stratum: the actual training-mix primitive ("5 docs per language,
    * books weighted 8×"). Strata and weights compose freely because
    * the key depends only on (id, weight), never on the stratum.
    *
    * Scale shape: a global TakeOrdered can't express per-stratum k,
    * and the declarative window alternative (row_number over stratum)
    * sorts EVERY row of every stratum. Instead the winners come from
    * the bounded-heap topk_rows aggregate — map-side state is a
    * k-heap per stratum, the exchange carries ≤ k rows per (stratum,
    * input partition) — and the (tiny, ≤ k·|strata|) winner id set
    * broadcast-joins back to recover full rows. No corpus-wide sort,
    * no corpus-wide shuffle beyond the heap partials.
    *
    * Ranking contract matches weightedSample per stratum: ascending
    * (sample_key, id); topk_rows ranks descending by ord with
    * smaller-id tie-break, so ord = −sample_key (exact in double —
    * keys are < 2^20). Output: input row + `sample_key`.
    */
  def weightedStratifiedSample(
      df: DataFrame, idCol: String, stratumCol: String,
      weight: Column, kPerStratum: Int): DataFrame = {
    require(kPerStratum > 0)
    require(!df.columns.contains("sample_key"),
      "weightedStratifiedSample: input already has a sample_key column")
    val idType = df.schema(idCol).dataType
    require(Seq("long", "integer", "short", "byte").contains(idType.typeName),
      s"weightedStratifiedSample needs an integral id column (the heap " +
        s"packs ids as long); '$idCol' is $idType")
    val keyed = df.withColumn("sample_key", sampleKey(col(idCol), weight))
    val winners = keyed
      .groupBy(col(stratumCol))
      .agg(graft.functions.TopK.topk(
        negate(col("sample_key").cast("double")),
        col(idCol).cast("long"), kPerStratum).as("_ws_top"))
      .select(col(stratumCol).as("_ws_stratum"),
        explode(col("_ws_top")).as("_ws_w"))
      .select(col("_ws_stratum"), col("_ws_w.id").as("_ws_id"))
    keyed.join(broadcast(winners),
        keyed(idCol) === winners("_ws_id") &&
          keyed(stratumCol) <=> winners("_ws_stratum"))
      .drop("_ws_stratum", "_ws_id")
  }

  /** Streaming twin of [[weightedStratifiedSample]]: a live winners
    * leaderboard per stratum over an unbounded document stream — the
    * ingest-time training-mix primitive ("the best k docs per
    * language seen so far, books weighted 8×").
    *
    * The sample keys are stateless per-row functions of (id, weight),
    * so the bounded topk_rows heap is the ONLY state: k entries per
    * stratum, merged across micro-batches, O(k·|strata|) forever.
    * Determinism buys the batch-twin contract: after ANY prefix of
    * the stream the leaderboard holds exactly the batch sampler's
    * winners over the rows seen so far, and a drained stream equals
    * [[weightedStratifiedSample]] on the same corpus (spec-pinned,
    * including mid-stream). Run with Complete output mode (the
    * leaderboard is a revision, not an append).
    *
    * Emits one row per stratum: winner ids best-first plus their
    * sample keys (so downstream can merge leaderboards by key).
    */
  def streamingWeightedStratifiedSample(
      stream: DataFrame, idCol: String, stratumCol: String,
      weight: Column, kPerStratum: Int): DataFrame = {
    require(kPerStratum > 0)
    stream
      .withColumn("_ws_key", sampleKey(col(idCol), weight))
      .groupBy(col(stratumCol))
      .agg(graft.functions.TopK.topk(
        negate(col("_ws_key").cast("double")),
        col(idCol).cast("long"), kPerStratum).as("_t"))
      .select(col(stratumCol),
        col("_t.id").as("winner_ids"),
        transform(col("_t.ord"), o => negate(o).cast("long"))
          .as("winner_keys"))
  }

  /** Deterministic training-order shuffle: assign every row a shard
    * and a position within its shard, both pure integer-hash functions
    * of the id — the "global shuffle" step before writing a training
    * corpus as N order-randomized shard files. Two INDEPENDENT hashes
    * (different increment/multiplier) so the within-shard order is
    * decorrelated from the shard assignment: rows that land together
    * do not arrive in id order.
    *
    * Scale shape: there is deliberately NO global sort/row_number — a
    * single-partition window is the classic 100 TB killer. The only
    * sort is per-shard (one window partitioned by shard), which is the
    * sort a shard-file writer pays anyway; pick nShards so
    * corpus/nShards fits a task (shard files are GB-sized by design,
    * so real runs have 10⁴-10⁵ shards, not 8). Arithmetic is
    * overflow-safe for the FULL long id range: every id is reduced
    * mod 2³¹−1 BEFORE the +9176 increment and the multiplies (the
    * products stay below 2⁶³), and both multipliers are coprime to
    * the 1000003 modulus, so the oracle replays it exactly.
    *
    * Output: input row + (shard INT, shard_pos INT), shard_pos
    * starting at 1 within each shard.
    */
  def shardAssignment(
      df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0)
    require(!df.columns.contains("shard") && !df.columns.contains("shard_pos")
        && !df.columns.contains("_sh_ord"),
      "shardAssignment: input already has a shard/shard_pos/_sh_ord column")
    val id = col(idCol)
    val h1 = pmod(pmod(id, lit(2147483647L)) * lit(2654435761L),
      lit(1000003L))
    val h2 = pmod((pmod(id, lit(2147483647L)) + lit(9176L)) * lit(1540483477L),
      lit(1000003L))
    import org.apache.spark.sql.expressions.Window
    df.withColumn("shard", pmod(h1, lit(nShards.toLong)).cast("int"))
      .withColumn("_sh_ord", h2)
      .withColumn("shard_pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("_sh_ord"), id)))
      .drop("_sh_ord")
  }

  /** Curriculum ordering: assign every row a PHASE from absolute
    * quality bands (first bound met wins — phase 0 is the best band,
    * the one a curriculum schedule trains on first), a shard, and a
    * deterministic position within (phase, shard) — the layout a
    * curriculum-learning run reads: phases in band order, shards in
    * parallel, within-shard order decorrelated from both id order and
    * shard choice (t18's second hash).
    *
    * No global sort, deliberately: a total corpus order IS a global
    * sort, which is exactly the scale trap. Phases come from FIXED
    * thresholds on the deterministic quality score (no window at
    * all — the score is engine-reproducible, so the band assignment
    * replays exactly); the only window partitions by (phase, shard),
    * which is the per-shard-file sort a training-corpus writer pays
    * anyway (t18's stance; real runs size nShards so each
    * (phase, shard) fits a task).
    *
    * Output: input row + phase (int) + shard (int) + seq (position
    * within (phase, shard), 1-based).
    */
  def curriculumOrder(
      df: DataFrame, idCol: String, quality: Column, nShards: Int,
      bounds: Seq[Double] = Seq(0.25, 0.5, 0.75)): DataFrame = {
    require(nShards > 0)
    require(bounds.nonEmpty &&
        bounds.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
      "curriculumOrder: bounds must be strictly increasing and " +
        "non-empty (duplicate bounds would create unreachable phases)")
    require(!df.columns.contains("phase") && !df.columns.contains("shard")
        && !df.columns.contains("seq") && !df.columns.contains("_cu_ord"),
      "curriculumOrder: input already has a phase/shard/seq/_cu_ord column")
    val id = col(idCol)
    import org.apache.spark.sql.expressions.Window
    df.withColumn("phase", curriculumPhase(quality, bounds))
      .withColumn("shard", curriculumShard(id, nShards))
      .withColumn("_cu_ord", curriculumOrd(id))
      .withColumn("seq", row_number().over(
        Window.partitionBy(col("phase"), col("shard"))
          .orderBy(col("_cu_ord"), id)))
      .drop("_cu_ord")
  }

  /** [[curriculumOrder]]'s phase assignment alone — FIXED descending
    * thresholds on a deterministic quality score (first bound met
    * wins; phase 0 is the best band). Stateless per row, which is
    * what lets the streaming packer compose with it.
    */
  def curriculumPhase(quality: Column,
      bounds: Seq[Double] = Seq(0.25, 0.5, 0.75)): Column = {
    require(bounds.nonEmpty &&
        bounds.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
      "curriculumPhase: bounds must be strictly increasing and " +
        "non-empty (duplicate bounds would create unreachable phases)")
    val desc = bounds.sorted.reverse
    desc.zipWithIndex.tail
      .foldLeft(when(quality >= desc.head, 0)) {
        case (acc, (b, i)) => acc.when(quality >= b, i)
      }.otherwise(bounds.size).cast("int")
  }

  /** [[curriculumOrder]]'s shard hash alone (t18's first hash family,
    * reduced mod nShards).
    */
  def curriculumShard(id: Column, nShards: Int): Column =
    pmod(pmod(pmod(id, lit(2147483647L)) * lit(2654435761L),
      lit(1000003L)), lit(nShards.toLong)).cast("int")

  /** [[curriculumOrder]]'s within-shard ordering key alone (the
    * second, decorrelated hash; ties broken by id downstream).
    */
  def curriculumOrd(id: Column): Column =
    pmod((pmod(id, lit(2147483647L)) + lit(9176L)) * lit(1540483477L),
      lit(1000003L))
}
