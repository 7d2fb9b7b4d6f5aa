package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sparse-lexical retrieval over a document corpus — the BM25
  * counterpart to [[Similarity]]'s dense-vector kNN family. Training-
  * data pipelines use this for benchmark decontamination sweeps,
  * targeted corpus slicing ("every doc matching these probe queries"),
  * and hard-negative mining next to the embedding index.
  *
  * Reference analogue: the reference engine exposes only relational
  * scan/filter/agg surface (logical_plan.rs:37-203); retrieval is part
  * of this library's LLM-pipeline extension, like the dedup/ANN
  * families.
  */
object Retrieval {

  /** BM25 top-k retrieval of `docs` for a (small) query set.
    *
    * Scoring is Okapi BM25 with the RATIONAL Robertson–Spärck Jones
    * idf `(N − df + 0.5) / (df + 0.5)` — the monotone core of the
    * canonical `ln`-idf, kept log-free for the same reason t07's
    * tf·idf is rational: every arithmetic step is a fixed sequence of
    * IEEE double ops (int-to-double casts, +, ×, ÷), which two engines
    * reproduce bit-identically, while `ln` is correctly-rounded in
    * neither and would leak ±1-ulp rank flips into the oracle compare.
    * (Per term the two idfs rank identically; across a multi-term sum
    * the rational form weights rare terms more steeply — a documented
    * variant choice, not an approximation bug.) The per-term
    * contribution is rounded to 6 decimals and scaled to a LONG before
    * the per-(query, doc) sum, so the sum is exact integer arithmetic
    * — a double sum's value depends on partition arrival order and
    * could not be oracle-gated.
    *
    * Scale shape (the part that matters at 100 TB):
    *  - the corpus is tokenized ONCE into a postings table
    *    (doc, term, tf) — one map-side-combined groupBy; `scope`
    *    persists it across its three consumers (doc lengths, the
    *    semi-filter, corpus token total), the decontaminate
    *    hash-once contract;
    *  - the query set is small by declaration: its distinct-term
    *    vocabulary BROADCASTS into a semi-filter so only postings of
    *    query terms (a vanishing corpus fraction) ever reach scoring —
    *    document frequencies are computed AFTER the filter (per-term
    *    df over filtered postings equals corpus-wide df for those
    *    terms), so no vocabulary-sized aggregate is ever built;
    *  - the only big–big exchange joins matched postings to per-doc
    *    lengths on the 8-byte doc id;
    *  - top-k per query rides the bounded [[graft.functions.TopK]]
    *    heap (k rows per query per partition on the exchange), never a
    *    corpus-wide window sort; ties rank by smaller doc id.
    *
    * Output: (query_id, rank, doc_id, score), rank 1 = best. Queries
    * whose terms miss the corpus entirely emit no rows; docs with no
    * tokens can never match.
    */
  def bm25(
      docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      scope: Dedup.CacheScope = Dedup.batchScope): DataFrame = {
    require(k >= 1, "bm25: k must be positive")
    require(k1 > 0 && b >= 0 && b <= 1, s"bm25: need k1 > 0, b in [0,1]")

    val postings = scope.persistTracked(
      docs.select(col(idCol).as("doc_id"),
          explode(TextAnalysis.tokens(col(textCol))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
    val docLen = postings.groupBy("doc_id").agg(sum("tf").as("dl"))
    // N counts ALL docs (token-less ones included — they shorten
    // avgdl); the count-only scan prunes every column
    val stats = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(docLen.agg(coalesce(sum("dl"), lit(0L)).as("n_tokens")))

    val qterms = queries.select(col(queryIdCol).as("query_id"),
      explode(array_distinct(TextAnalysis.tokens(col(queryTextCol))))
        .as("term"))
    val qvocab = qterms.select("term").distinct()

    val matched = postings.join(broadcast(qvocab), Seq("term"))
    // (doc, term) is unique in postings, so count(*) = document
    // frequency; query-vocab-sized, broadcastable by construction
    val dfreq = matched.groupBy("term").agg(count(lit(1)).as("doc_freq"))

    val tfD = col("tf").cast("double")
    val idf = (col("n_docs") - col("doc_freq") + lit(0.5)) /
      (col("doc_freq") + lit(0.5))
    val avgdl = col("n_tokens").cast("double") / col("n_docs")
    val contrib = idf * (tfD * (lit(k1) + lit(1.0))) /
      (tfD + lit(k1) * ((lit(1.0) - lit(b)) +
        lit(b) * (col("dl").cast("double") / avgdl)))

    val scores = matched
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(dfreq), Seq("term"))
      .join(docLen, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("_bm_ci",
        floor(contrib * lit(1e6) + lit(0.5)).cast("long"))
      .groupBy("query_id", "doc_id")
      .agg(sum("_bm_ci").as("score_i"))

    // score_i < 2^53 by construction (6-decimal-scaled bounded
    // contributions × query length), so the heap's double ord is exact
    scores.groupBy("query_id")
      .agg(graft.functions.TopK.topk(
        col("score_i").cast("double"), col("doc_id"), k).as("_t"))
      .select(col("query_id"), posexplode(col("_t")).as(Seq("_p", "_w")))
      .select(col("query_id"), (col("_p") + 1).cast("int").as("rank"),
        col("_w.id").as("doc_id"),
        (col("_w.ord") / lit(1e6)).as("score"))
  }
}
