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
  def weightedSample(
      df: DataFrame, idCol: String, weight: Column, k: Int): DataFrame = {
    require(k > 0)
    require(!df.columns.contains("sample_key"),
      "weightedSample: input already has a sample_key column")
    // hash(id, draw) in a 30-bit-safe domain: (id + draw·7919) stays
    // far below 2^31 for any realistic id, the 2654435761 multiply
    // below 2^62 — no overflow under ANSI mode. The draw stride MUST
    // NOT be a multiple of the output modulus 1000003: a stride
    // divisible by it cancels in the final mod and every draw
    // collapses to the same value (no weighting at all) — 7919 is
    // prime and coprime to both moduli.
    // Enforce the positive-integer contract AT RUNTIME, per row: a
    // zero/negative weight makes the 2-arg sequence(1, w) run
    // DESCENDING (yielding 1+|1-w| draws — MORE aggressive sampling
    // for the rows the caller meant to exclude), and a NULL weight
    // yields a NULL key that sorts FIRST and monopolizes the top-k.
    // Both are silent wrong-sample bugs; fail loudly instead.
    // assert_true (not raise_error): Spark 4's raise_error(Column)
    // desugars to the 2-child USER_RAISED_EXCEPTION form whose
    // printed SQL doesn't re-parse (the SQL builder takes 1 arg), so
    // it would break the SqlGen roundtrip; assert_true prints as the
    // 2-arg SQL it parses from.
    val guard = assert_true(weight.isNotNull && weight >= 1, concat(
      lit("weightedSample: weight must be a positive integer, got "),
      coalesce(weight.cast("string"), lit("NULL"))))
    val checkedWeight = when(guard.isNull, weight)
    val key = array_min(transform(sequence(lit(1), checkedWeight),
      r => pmod(
        pmod(col(idCol) + r * lit(7919L), lit(2147483647L)) *
          lit(2654435761L),
        lit(1000003L))))
    df.withColumn("sample_key", key)
      .orderBy(col("sample_key"), col(idCol))
      .limit(k)
  }
}
