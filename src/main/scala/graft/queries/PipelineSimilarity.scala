package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Multimodal, Packing, Similarity, TextAnalysis}
import graft.queries.Relational.Q

/** SparkEntry wiring for the training-data pipeline operators
  * (SURVEY.md §2: dedup, similarity, text analysis, multimodal).
  * Entries without a DuckDB-expressible oracle are rows-only checks;
  * each is still fully deterministic (fixed seeds, total ordering).
  */
/** Similarity-search / ANN query entries (s01-s19). Split out of Pipeline.scala (round 13 — mechanical,
  * no behavior change); shared fixtures/oracle fragments live in
  * [[PipelineShared]].
  */
private[queries] object PipelineSimilarity {
  import PipelineShared._

  val all: Seq[Q] = Seq(

    // exact brute-force cosine top-k. Oracle is the same scan+sort+k in
    // DuckDB, with the query vector looked up identically (lowest
    // vec_id); cosine mirrored op-for-op so doubles are bit-identical.
    Q("s01_knn_brute",
      (s, dir) => {
        Similarity.knnBrute(Tables.load(s, dir, "embeddings"),
            "vec_id", "embedding", queryVec(s, dir), k = 20)
          .select(col("id"), r6(col("cosine")).as("cosine"))
          .orderBy(col("cosine").desc, col("id"))
      },
      Some(s"""WITH q AS (
             |  SELECT CAST(embedding AS DOUBLE[]) AS qv
             |  FROM embeddings ORDER BY vec_id LIMIT 1
             |), e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
             |), c AS (
             |  SELECT vec_id AS id,
             |    ${cosineSql("v", "qv")} AS cos
             |  FROM e, q
             |)
             |SELECT id, ${r6sql("cos")} AS cosine
             |FROM c ORDER BY cos DESC, id LIMIT 20""".stripMargin)),


    // batch exact top-k: 5 query vectors × corpus in one pass, bounded
    // heap per query. Oracle: window row_number per query over the
    // mirrored cosine.
    Q("s04_knn_batch",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val queries = emb.orderBy("vec_id").limit(5)
        Similarity.knnBruteBatch(queries, "vec_id", "embedding",
            emb, "vec_id", "embedding", k = 10)
          .select(col("query_id"), col("id"), r6(col("cosine")).as("cosine"))
          .orderBy("query_id", "id")
      },
      Some(s"""WITH q AS (
             |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
             |  FROM embeddings ORDER BY vec_id LIMIT 5
             |), e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
             |), scored AS (
             |  SELECT query_id, vec_id AS id,
             |    ${cosineSql("v", "qv")} AS cos
             |  FROM e CROSS JOIN q
             |), ranked AS (
             |  SELECT query_id, id, cos, ROW_NUMBER() OVER (
             |    PARTITION BY query_id ORDER BY cos DESC, id ASC) AS rn
             |  FROM scored
             |)
             |SELECT query_id, id, ${r6sql("cos")} AS cosine
             |FROM ranked WHERE rn <= 10 ORDER BY query_id, id""".stripMargin)),


    // LSH-bucketed ANN, same query vector; oracle replays the probe
    // with the deterministic hyperplanes inlined (see s02OracleSql).
    Q("s02_knn_lsh",
      (s, dir) => {
        Similarity.knnLsh(Tables.load(s, dir, "embeddings"),
            "vec_id", "embedding", queryVec(s, dir), k = 20,
            bands = 8, bitsPerBand = 8)
          .select(col("id"), r6(col("cosine")).as("cosine"))
          .orderBy(col("cosine").desc, col("id"))
      },
      Some(s02OracleSql)),


    // IVF-bucketed ANN: nearest-centroid cells only (scale path reads
    // nProbe/nCells of the corpus when the index is cell-partitioned).
    // Oracle replays the whole deterministic pipeline: centroids = 16
    // lowest-id vectors, cell = argmax dot (ties → LOWER cell — the
    // same direction the probe ranking breaks them, so duplicate
    // centroids can't send probes to an empty twin cell), probe =
    // top-4 centroids by dot with the query (ties → lower cell,
    // stable sort), then brute top-k within probed cells.
    Q("s03_knn_ivf",
      (s, dir) => {
        Similarity.knnIvf(Tables.load(s, dir, "embeddings"),
            "vec_id", "embedding", queryVec(s, dir), k = 20,
            nCells = 16, nProbe = 4)
          .select(col("id"), r6(col("cosine")).as("cosine"))
          .orderBy(col("cosine").desc, col("id"))
      },
      Some(s"""WITH cent AS (
             |  SELECT (ROW_NUMBER() OVER (ORDER BY vec_id)) - 1 AS cell,
             |         CAST(embedding AS DOUBLE[]) AS cv
             |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
             |), q AS (
             |  SELECT CAST(embedding AS DOUBLE[]) AS qv
             |  FROM embeddings ORDER BY vec_id LIMIT 1
             |), e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
             |), assigned AS (
             |  SELECT vec_id, v, cell,
             |    ROW_NUMBER() OVER (PARTITION BY vec_id
             |      ORDER BY list_dot_product(v, cv) DESC, cell ASC) AS rn
             |  FROM e CROSS JOIN cent
             |), probe AS (
             |  SELECT cell FROM cent, q
             |  ORDER BY list_dot_product(cv, qv) DESC, cell ASC LIMIT 4
             |), scored AS (
             |  SELECT vec_id AS id,
             |    ${cosineSql("v", "qv")} AS cos
             |  FROM assigned, q
             |  WHERE rn = 1 AND cell IN (SELECT cell FROM probe)
             |)
             |SELECT id, ${r6sql("cos")} AS cosine
             |FROM scored ORDER BY cos DESC, id LIMIT 20""".stripMargin)),


    // batch IVF top-k: 3 query vectors, each probing its own 4 best
    // cells of 16, one corpus pass, bounded heap per query — the
    // batched ANN shape for a cell-partitioned 100 TB index. Oracle
    // replays centroids/assignment/per-query probe/rank (s03's oracle
    // with a per-query probe CTE).
    Q("s07_knn_ivf_batch",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val queries = emb.orderBy("vec_id").limit(3)
        Similarity.knnIvfBatch(queries, "vec_id", "embedding",
            emb, "vec_id", "embedding", k = 10, nCells = 16, nProbe = 4)
          .select(col("query_id"), col("id"), r6(col("cosine")).as("cosine"))
          .orderBy("query_id", "id")
      },
      Some(s"""WITH cent AS (
             |  SELECT (ROW_NUMBER() OVER (ORDER BY vec_id)) - 1 AS cell,
             |         CAST(embedding AS DOUBLE[]) AS cv
             |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
             |), q AS (
             |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
             |  FROM embeddings ORDER BY vec_id LIMIT 3
             |), e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
             |), assigned AS (
             |  SELECT vec_id, v, cell,
             |    ROW_NUMBER() OVER (PARTITION BY vec_id
             |      ORDER BY list_dot_product(v, cv) DESC, cell ASC) AS rn
             |  FROM e CROSS JOIN cent
             |), probe AS (
             |  SELECT query_id, cell FROM (
             |    SELECT query_id, cell, ROW_NUMBER() OVER (
             |      PARTITION BY query_id
             |      ORDER BY list_dot_product(cv, qv) DESC, cell ASC) AS pk
             |    FROM cent CROSS JOIN q)
             |  WHERE pk <= 4
             |), scored AS (
             |  SELECT q.query_id, a.vec_id AS id,
             |    ${cosineSql("a.v", "q.qv")} AS cos
             |  FROM assigned a
             |  JOIN probe p ON a.cell = p.cell AND a.rn = 1
             |  JOIN q ON q.query_id = p.query_id
             |), ranked AS (
             |  SELECT query_id, id, cos, ROW_NUMBER() OVER (
             |    PARTITION BY query_id ORDER BY cos DESC, id ASC) AS rk
             |  FROM scored
             |)
             |SELECT query_id, id, ${r6sql("cos")} AS cosine
             |FROM ranked WHERE rk <= 10 ORDER BY query_id, id""".stripMargin)),


    // IVF recall@k eval: the s07 approximate results scored against
    // the s04 exact ground truth, per query — the report that picks
    // nCells/nProbe before an index layout is committed. Oracle
    // replays BOTH paths (s07's probe chain + s04's brute window) and
    // joins them; recall is one small-int/double division, bit-stable.
    Q("s14_ann_recall",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val queries = emb.orderBy("vec_id").limit(3)
        Similarity.ivfRecall(queries, "vec_id", "embedding",
            emb, "vec_id", "embedding", k = 10, nCells = 16, nProbe = 4)
          .orderBy("query_id")
      },
      Some(s"""WITH cent AS (
             |  SELECT (ROW_NUMBER() OVER (ORDER BY vec_id)) - 1 AS cell,
             |         CAST(embedding AS DOUBLE[]) AS cv
             |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
             |), q AS (
             |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
             |  FROM embeddings ORDER BY vec_id LIMIT 3
             |), e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
             |), assigned AS (
             |  SELECT vec_id, v, cell,
             |    ROW_NUMBER() OVER (PARTITION BY vec_id
             |      ORDER BY list_dot_product(v, cv) DESC, cell ASC) AS rn
             |  FROM e CROSS JOIN cent
             |), probe AS (
             |  SELECT query_id, cell FROM (
             |    SELECT query_id, cell, ROW_NUMBER() OVER (
             |      PARTITION BY query_id
             |      ORDER BY list_dot_product(cv, qv) DESC, cell ASC) AS pk
             |    FROM cent CROSS JOIN q)
             |  WHERE pk <= 4
             |), iscored AS (
             |  SELECT q.query_id, a.vec_id AS id,
             |    ${cosineSql("a.v", "q.qv")} AS cos
             |  FROM assigned a
             |  JOIN probe p ON a.cell = p.cell AND a.rn = 1
             |  JOIN q ON q.query_id = p.query_id
             |), ivf AS (
             |  SELECT query_id, id FROM (
             |    SELECT query_id, id, ROW_NUMBER() OVER (
             |      PARTITION BY query_id ORDER BY cos DESC, id ASC) AS rk
             |    FROM iscored)
             |  WHERE rk <= 10
             |), bscored AS (
             |  SELECT q.query_id, e.vec_id AS id,
             |    ${cosineSql("e.v", "q.qv")} AS cos
             |  FROM e CROSS JOIN q
             |), exact AS (
             |  SELECT query_id, id FROM (
             |    SELECT query_id, id, ROW_NUMBER() OVER (
             |      PARTITION BY query_id ORDER BY cos DESC, id ASC) AS rk
             |    FROM bscored)
             |  WHERE rk <= 10
             |), h AS (
             |  SELECT ivf.query_id, COUNT(*) AS c
             |  FROM ivf JOIN exact USING (query_id, id) GROUP BY 1
             |)
             |SELECT q.query_id, COALESCE(c, 0) AS n_hit,
             |  COALESCE(c, 0) / 10.0 AS recall
             |FROM q LEFT JOIN h USING (query_id)
             |ORDER BY query_id""".stripMargin)),


    // metadata-filtered IVF ANN: top-k among probed-cell vectors
    // satisfying a label predicate, applied INSIDE the probed scan
    // (exact pre-filtering — never overfetch). Centroids and probe
    // ranking come from the FULL corpus (the index predates the
    // predicate); oracle is s03's chain with the predicate on the
    // corpus CTE.
    Q("s15_knn_filtered",
      (s, dir) => {
        Similarity.knnIvfFiltered(Tables.load(s, dir, "embeddings"),
            "vec_id", "embedding", col("label") % 2 === 0,
            queryVec(s, dir), k = 20, nCells = 16, nProbe = 4)
          .select(col("id"), r6(col("cosine")).as("cosine"))
          .orderBy(col("cosine").desc, col("id"))
      },
      Some(s"""WITH cent AS (
             |  SELECT (ROW_NUMBER() OVER (ORDER BY vec_id)) - 1 AS cell,
             |         CAST(embedding AS DOUBLE[]) AS cv
             |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
             |), q AS (
             |  SELECT CAST(embedding AS DOUBLE[]) AS qv
             |  FROM embeddings ORDER BY vec_id LIMIT 1
             |), e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings WHERE label % 2 = 0
             |), assigned AS (
             |  SELECT vec_id, v, cell,
             |    ROW_NUMBER() OVER (PARTITION BY vec_id
             |      ORDER BY list_dot_product(v, cv) DESC, cell ASC) AS rn
             |  FROM e CROSS JOIN cent
             |), probe AS (
             |  SELECT cell FROM cent, q
             |  ORDER BY list_dot_product(cv, qv) DESC, cell ASC LIMIT 4
             |), scored AS (
             |  SELECT vec_id AS id,
             |    ${cosineSql("v", "qv")} AS cos
             |  FROM assigned, q
             |  WHERE rn = 1 AND cell IN (SELECT cell FROM probe)
             |)
             |SELECT id, ${r6sql("cos")} AS cosine
             |FROM scored ORDER BY cos DESC, id LIMIT 20""".stripMargin)),


    // batch filtered ANN: 3 queries against the predicate-filtered
    // corpus in one pass — s07's probe/join/heap chain over s15's
    // pre-filtered cell assignment. Oracle = s07's CTEs with the
    // predicate on the corpus CTE.
    Q("s16_knn_filtered_batch",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val queries = emb.orderBy("vec_id").limit(3)
        Similarity.knnIvfBatchFiltered(queries, "vec_id", "embedding",
            emb, "vec_id", "embedding", col("label") % 2 === 0,
            k = 10, nCells = 16, nProbe = 4)
          .select(col("query_id"), col("id"), r6(col("cosine")).as("cosine"))
          .orderBy("query_id", "id")
      },
      Some(s"""WITH cent AS (
             |  SELECT (ROW_NUMBER() OVER (ORDER BY vec_id)) - 1 AS cell,
             |         CAST(embedding AS DOUBLE[]) AS cv
             |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
             |), q AS (
             |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
             |  FROM embeddings ORDER BY vec_id LIMIT 3
             |), e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings WHERE label % 2 = 0
             |), assigned AS (
             |  SELECT vec_id, v, cell,
             |    ROW_NUMBER() OVER (PARTITION BY vec_id
             |      ORDER BY list_dot_product(v, cv) DESC, cell ASC) AS rn
             |  FROM e CROSS JOIN cent
             |), probe AS (
             |  SELECT query_id, cell FROM (
             |    SELECT query_id, cell, ROW_NUMBER() OVER (
             |      PARTITION BY query_id
             |      ORDER BY list_dot_product(cv, qv) DESC, cell ASC) AS pk
             |    FROM cent CROSS JOIN q)
             |  WHERE pk <= 4
             |), scored AS (
             |  SELECT q.query_id, a.vec_id AS id,
             |    ${cosineSql("a.v", "q.qv")} AS cos
             |  FROM assigned a
             |  JOIN probe p ON a.cell = p.cell AND a.rn = 1
             |  JOIN q ON q.query_id = p.query_id
             |), ranked AS (
             |  SELECT query_id, id, cos, ROW_NUMBER() OVER (
             |    PARTITION BY query_id ORDER BY cos DESC, id ASC) AS rk
             |  FROM scored
             |)
             |SELECT query_id, id, ${r6sql("cos")} AS cosine
             |FROM ranked WHERE rk <= 10 ORDER BY query_id, id""".stripMargin)),


    // kNN classification: majority label of the 10 nearest neighbors
    // for the 5 lowest-id vectors (self excluded). Oracle replays the
    // rank + vote chain with the mirrored cosine.
    Q("s05_knn_classify",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        Similarity.knnClassify(emb.orderBy("vec_id").limit(5),
            "vec_id", "embedding", emb, "vec_id", "embedding", "label",
            k = 10)
          .orderBy("query_id")
      },
      Some(s"""WITH q AS (
             |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
             |  FROM embeddings ORDER BY vec_id LIMIT 5
             |), e AS (
             |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings
             |), ranked AS (
             |  SELECT query_id, vec_id, label, ROW_NUMBER() OVER (
             |    PARTITION BY query_id ORDER BY
             |      ${cosineSql("v", "qv")} DESC,
             |      vec_id ASC) AS rn
             |  FROM e CROSS JOIN q
             |  WHERE vec_id <> query_id
             |), votes AS (
             |  SELECT query_id, label, COUNT(*) AS votes
             |  FROM ranked WHERE rn <= 10 GROUP BY query_id, label
             |), best AS (
             |  SELECT query_id, label, votes, ROW_NUMBER() OVER (
             |    PARTITION BY query_id ORDER BY votes DESC, label ASC) AS rk
             |  FROM votes
             |)
             |SELECT query_id, label AS pred_label, votes
             |FROM best WHERE rk = 1 ORDER BY query_id""".stripMargin)),


    // int8-quantized kNN: the oracle replays the symmetric
    // quantization (scale = 127/max|x|, floor(x·scale + 0.5)) on both
    // corpus and query, then the mirrored cosine — codes are
    // integer-valued doubles so every op is exact cross-engine.
    Q("s06_knn_quantized",
      (s, dir) => {
        Similarity.knnQuantized(Tables.load(s, dir, "embeddings"),
            "vec_id", "embedding", queryVec(s, dir), k = 20)
          .select(col("id"), r6(col("cosine")).as("cosine"))
          .orderBy(col("cosine").desc, col("id"))
      },
      Some(s"""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
             |), eq AS (
             |  SELECT vec_id, ${quantizeSql("v")} AS qv
             |  FROM e
             |), q AS (
             |  SELECT ${quantizeSql("v")} AS qq
             |  FROM (SELECT CAST(embedding AS DOUBLE[]) AS v
             |        FROM embeddings ORDER BY vec_id LIMIT 1)
             |), c AS (
             |  SELECT vec_id AS id, ${cosineSql("qv", "qq")} AS cos
             |  FROM eq, q
             |)
             |SELECT id, ${r6sql("cos")} AS cosine
             |FROM c ORDER BY cos DESC, id LIMIT 20""".stripMargin)),


    // quantized-scan + exact re-rank: coarse top-40 on int8 codes,
    // exact cosine only on those 40, final top-10 — the two-pass
    // pattern whose oracle replays coarse rank THEN exact re-rank.
    Q("s08_knn_rerank",
      (s, dir) => {
        Similarity.knnQuantizedRerank(Tables.load(s, dir, "embeddings"),
            "vec_id", "embedding", queryVec(s, dir), k = 10, overfetch = 4)
          .select(col("id"), r6(col("cosine")).as("cosine"))
          .orderBy(col("cosine").desc, col("id"))
      },
      Some(s"""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
             |), eq AS (
             |  SELECT vec_id, v, ${quantizeSql("v")} AS qv
             |  FROM e
             |), q AS (
             |  SELECT v AS qfull, ${quantizeSql("v")} AS qq
             |  FROM (SELECT CAST(embedding AS DOUBLE[]) AS v
             |        FROM embeddings ORDER BY vec_id LIMIT 1)
             |), coarse AS (
             |  SELECT vec_id, v, qfull, ${cosineSql("qv", "qq")} AS qcos
             |  FROM eq, q
             |  ORDER BY qcos DESC, vec_id ASC LIMIT 40
             |), exact AS (
             |  SELECT vec_id AS id, ${cosineSql("v", "qfull")} AS cos
             |  FROM coarse
             |)
             |SELECT id, ${r6sql("cos")} AS cosine
             |FROM exact ORDER BY cos DESC, id LIMIT 10""".stripMargin)),


    // product quantization + exact rerank — the 16-32× ANN memory
    // layout (m=4 subspaces × 16 codes over dim 64). Codebook is
    // SEEDED (subvectors of the 16 lowest-id vectors — the
    // SeededCentroids stance) so DuckDB rebuilds it exactly; encode =
    // argmin sequential squared-L2 per subspace (list_reduce fold =
    // the Scala loop's op order, ties → lowest code), coarse rank =
    // ADC lookup sum in subspace order / (|q|·stored norm), rerank
    // exact. Production trains with pqTrainCodebook (spec-pinned
    // recall); every downstream step is shared.
    Q("s10_knn_pq",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val cb = Similarity.pqSeededCodebook(
          emb, "vec_id", "embedding", m = 4, nCodes = 16)
        Similarity.knnPq(emb, "vec_id", "embedding", queryVec(s, dir),
            k = 10, cb = cb, overfetch = 4)
          .select(col("id"), r6(col("cosine")).as("cosine"))
          .orderBy(col("cosine").desc, col("id"))
      },
      Some(s"""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
             |), q AS (
             |  SELECT v AS qv FROM e ORDER BY vec_id LIMIT 1
             |), cbsrc AS (
             |  SELECT v, row_number() OVER (ORDER BY vec_id) - 1 AS c
             |  FROM e ORDER BY vec_id LIMIT 16
             |), cb AS (
             |  SELECT c, s, v[s * 16 + 1 : s * 16 + 16] AS cv
             |  FROM cbsrc, range(0, 4) t(s)
             |), sub AS (
             |  SELECT vec_id, s, v[s * 16 + 1 : s * 16 + 16] AS sv
             |  FROM e, range(0, 4) t(s)
             |), d AS (
             |  SELECT vec_id, s, c,
             |    list_reduce([(sv[j] - cv[j]) * (sv[j] - cv[j])
             |                 for j in range(1, 17)],
             |                (a, b) -> a + b) AS dist
             |  FROM sub JOIN cb USING (s)
             |), code AS (
             |  SELECT vec_id, s, c FROM (
             |    SELECT vec_id, s, c,
             |      row_number() OVER (PARTITION BY vec_id, s
             |                         ORDER BY dist, c) AS rn
             |    FROM d) WHERE rn = 1
             |), lut AS (
             |  SELECT vec_id, s,
             |    list_dot_product(qv[s * 16 + 1 : s * 16 + 16], cv) AS term
             |  FROM code JOIN cb USING (s, c), q
             |), adcv AS (
             |  SELECT vec_id,
             |    list_reduce(list(term ORDER BY s), (a, b) -> a + b) AS adc
             |  FROM lut GROUP BY vec_id
             |), approx AS (
             |  SELECT a.vec_id,
             |    CASE WHEN sqrt(list_dot_product(qv, qv))
             |              * sqrt(list_dot_product(v, v)) = 0 THEN 0
             |    ELSE adc / (sqrt(list_dot_product(qv, qv))
             |                * sqrt(list_dot_product(v, v))) END AS score
             |  FROM adcv a JOIN e ON a.vec_id = e.vec_id, q
             |), cand AS (
             |  SELECT vec_id FROM approx
             |  ORDER BY score DESC, vec_id ASC LIMIT 40
             |), exact AS (
             |  SELECT e.vec_id AS id, ${cosineSql("v", "qv")} AS cos
             |  FROM e JOIN cand ON e.vec_id = cand.vec_id, q
             |)
             |SELECT id, ${r6sql("cos")} AS cosine
             |FROM exact ORDER BY cos DESC, id LIMIT 10""".stripMargin)),


    // batch PQ ANN: many queries (vec_id % 200 = 0) against the
    // encoded corpus — s10's asymmetric-distance scoring composed
    // with s04's one-scan batch shape. The oracle is s10's replay
    // with a query dimension: codes are query-independent, each
    // query's LUT/ADC ranks per query (row_number ≤ k·overfetch),
    // exact rerank per query. Per-query results are bit-identical to
    // s10's machinery (parity spec-pinned in SimilaritySpec).
    Q("s11_knn_pq_batch",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val cb = Similarity.pqSeededCodebook(
          emb, "vec_id", "embedding", m = 4, nCodes = 16)
        val queries = emb.where(col("vec_id") % 200 === 0)
          .select(col("vec_id").as("query_id"), col("embedding"))
        Similarity.knnPqBatch(queries, "query_id", "embedding",
            emb, "vec_id", "embedding", k = 10, cb = cb, overfetch = 4)
          .select(col("query_id"), col("id"),
            r6(col("cosine")).as("cosine"))
          .orderBy(col("query_id"), col("cosine").desc, col("id"))
      },
      Some(s"""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
             |), q AS (
             |  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 200 = 0
             |), cbsrc AS (
             |  SELECT v, row_number() OVER (ORDER BY vec_id) - 1 AS c
             |  FROM e ORDER BY vec_id LIMIT 16
             |), cb AS (
             |  SELECT c, s, v[s * 16 + 1 : s * 16 + 16] AS cv
             |  FROM cbsrc, range(0, 4) t(s)
             |), sub AS (
             |  SELECT vec_id, s, v[s * 16 + 1 : s * 16 + 16] AS sv
             |  FROM e, range(0, 4) t(s)
             |), d AS (
             |  SELECT vec_id, s, c,
             |    list_reduce([(sv[j] - cv[j]) * (sv[j] - cv[j])
             |                 for j in range(1, 17)],
             |                (a, b) -> a + b) AS dist
             |  FROM sub JOIN cb USING (s)
             |), code AS (
             |  SELECT vec_id, s, c FROM (
             |    SELECT vec_id, s, c,
             |      row_number() OVER (PARTITION BY vec_id, s
             |                         ORDER BY dist, c) AS rn
             |    FROM d) WHERE rn = 1
             |), lut AS (
             |  SELECT query_id, vec_id, s,
             |    list_dot_product(qv[s * 16 + 1 : s * 16 + 16], cv) AS term
             |  FROM code JOIN cb USING (s, c), q
             |), adcv AS (
             |  SELECT query_id, vec_id,
             |    list_reduce(list(term ORDER BY s), (a, b) -> a + b) AS adc
             |  FROM lut GROUP BY query_id, vec_id
             |), approx AS (
             |  SELECT a.query_id, a.vec_id,
             |    CASE WHEN sqrt(list_dot_product(qv, qv))
             |              * sqrt(list_dot_product(v, v)) = 0 THEN 0
             |    ELSE adc / (sqrt(list_dot_product(qv, qv))
             |                * sqrt(list_dot_product(v, v))) END AS score
             |  FROM adcv a
             |  JOIN e ON a.vec_id = e.vec_id
             |  JOIN q ON a.query_id = q.query_id
             |), cand AS (
             |  SELECT query_id, vec_id FROM (
             |    SELECT query_id, vec_id,
             |      row_number() OVER (PARTITION BY query_id
             |        ORDER BY score DESC, vec_id ASC) AS rn
             |    FROM approx) WHERE rn <= 40
             |), exact AS (
             |  SELECT c.query_id, e.vec_id AS id,
             |    ${cosineSql("v", "qv")} AS cos
             |  FROM e
             |  JOIN cand c ON e.vec_id = c.vec_id
             |  JOIN q ON c.query_id = q.query_id
             |)
             |SELECT query_id, id, ${r6sql("cos")} AS cosine FROM (
             |  SELECT query_id, id, cos,
             |    row_number() OVER (PARTITION BY query_id
             |      ORDER BY cos DESC, id ASC) AS rn
             |  FROM exact) WHERE rn <= 10
             |ORDER BY query_id, ${r6sql("cos")} DESC, id""".stripMargin)),


    // IVF-PQ composed ANN (round 8): s03's seeded-centroid cell
    // pruning stacked on s10's PQ asymmetric-distance scoring — the
    // standard 100 TB ANN layout (codes stored inside cells; a probe
    // reads nProbe/nCells of the data AND only m-byte codes), then
    // the s08 exact rerank. Oracle = s03's centroid/assignment/probe
    // CTEs feeding s10's codebook/code/ADC chain over the pruned
    // rows only (codes are query-independent, so encoding after
    // pruning equals filtering a pre-encoded corpus).
    Q("s12_knn_ivfpq",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val cb = Similarity.pqSeededCodebook(
          emb, "vec_id", "embedding", m = 4, nCodes = 16)
        Similarity.knnIvfPq(emb, "vec_id", "embedding", queryVec(s, dir),
            k = 10, cb = cb, nCells = 16, nProbe = 4, overfetch = 4)
          .select(col("id"), r6(col("cosine")).as("cosine"))
          .orderBy(col("cosine").desc, col("id"))
      },
      Some(s"""WITH cent AS (
             |  SELECT (ROW_NUMBER() OVER (ORDER BY vec_id)) - 1 AS cell,
             |         CAST(embedding AS DOUBLE[]) AS cv
             |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
             |), q AS (
             |  SELECT CAST(embedding AS DOUBLE[]) AS qv
             |  FROM embeddings ORDER BY vec_id LIMIT 1
             |), e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
             |), assigned AS (
             |  SELECT vec_id, v, cell,
             |    ROW_NUMBER() OVER (PARTITION BY vec_id
             |      ORDER BY list_dot_product(v, cv) DESC, cell ASC) AS rn
             |  FROM e CROSS JOIN cent
             |), probe AS (
             |  SELECT cell FROM cent, q
             |  ORDER BY list_dot_product(cv, qv) DESC, cell ASC LIMIT 4
             |), pruned AS (
             |  SELECT vec_id, v FROM assigned
             |  WHERE rn = 1 AND cell IN (SELECT cell FROM probe)
             |), cbsrc AS (
             |  SELECT v, row_number() OVER (ORDER BY vec_id) - 1 AS c
             |  FROM e ORDER BY vec_id LIMIT 16
             |), cb AS (
             |  SELECT c, s, v[s * 16 + 1 : s * 16 + 16] AS cv
             |  FROM cbsrc, range(0, 4) t(s)
             |), sub AS (
             |  SELECT vec_id, s, v[s * 16 + 1 : s * 16 + 16] AS sv
             |  FROM pruned, range(0, 4) t(s)
             |), d AS (
             |  SELECT vec_id, s, c,
             |    list_reduce([(sv[j] - cv[j]) * (sv[j] - cv[j])
             |                 for j in range(1, 17)],
             |                (a, b) -> a + b) AS dist
             |  FROM sub JOIN cb USING (s)
             |), code AS (
             |  SELECT vec_id, s, c FROM (
             |    SELECT vec_id, s, c,
             |      row_number() OVER (PARTITION BY vec_id, s
             |                         ORDER BY dist, c) AS rn
             |    FROM d) WHERE rn = 1
             |), lut AS (
             |  SELECT vec_id, s,
             |    list_dot_product(qv[s * 16 + 1 : s * 16 + 16], cv) AS term
             |  FROM code JOIN cb USING (s, c), q
             |), adcv AS (
             |  SELECT vec_id,
             |    list_reduce(list(term ORDER BY s), (a, b) -> a + b) AS adc
             |  FROM lut GROUP BY vec_id
             |), approx AS (
             |  SELECT a.vec_id,
             |    CASE WHEN sqrt(list_dot_product(qv, qv))
             |              * sqrt(list_dot_product(p.v, p.v)) = 0 THEN 0
             |    ELSE adc / (sqrt(list_dot_product(qv, qv))
             |                * sqrt(list_dot_product(p.v, p.v))) END AS score
             |  FROM adcv a JOIN pruned p ON a.vec_id = p.vec_id, q
             |), cand AS (
             |  SELECT vec_id FROM approx
             |  ORDER BY score DESC, vec_id ASC LIMIT 40
             |), exact AS (
             |  SELECT e.vec_id AS id, ${cosineSql("v", "qv")} AS cos
             |  FROM e JOIN cand ON e.vec_id = cand.vec_id, q
             |)
             |SELECT id, ${r6sql("cos")} AS cosine
             |FROM exact ORDER BY cos DESC, id LIMIT 10""".stripMargin)),


    // metadata-filtered IVF-PQ ANN (round 9): s15's exact
    // pre-filtering stance composed with s12's compressed layout —
    // the filtered query against the 100 TB code-partitioned index,
    // no decompression, no overfetch-and-hope. Centroids, codebook
    // and probe ranking come from the FULL corpus (the index predates
    // the predicate); assignment/ADC run over the predicate-passing
    // rows only. Oracle = s12's CTE chain with the predicate on the
    // assignment-corpus CTE (codebook CTE stays unfiltered).
    Q("s17_knn_ivfpq_filtered",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val cb = Similarity.pqSeededCodebook(
          emb, "vec_id", "embedding", m = 4, nCodes = 16)
        Similarity.knnIvfPqFiltered(emb, "vec_id", "embedding",
            col("label") % 2 === 0, queryVec(s, dir),
            k = 10, cb = cb, nCells = 16, nProbe = 4, overfetch = 4)
          .select(col("id"), r6(col("cosine")).as("cosine"))
          .orderBy(col("cosine").desc, col("id"))
      },
      Some(s"""WITH cent AS (
             |  SELECT (ROW_NUMBER() OVER (ORDER BY vec_id)) - 1 AS cell,
             |         CAST(embedding AS DOUBLE[]) AS cv
             |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
             |), q AS (
             |  SELECT CAST(embedding AS DOUBLE[]) AS qv
             |  FROM embeddings ORDER BY vec_id LIMIT 1
             |), e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
             |), ef AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings WHERE label % 2 = 0
             |), assigned AS (
             |  SELECT vec_id, v, cell,
             |    ROW_NUMBER() OVER (PARTITION BY vec_id
             |      ORDER BY list_dot_product(v, cv) DESC, cell ASC) AS rn
             |  FROM ef CROSS JOIN cent
             |), probe AS (
             |  SELECT cell FROM cent, q
             |  ORDER BY list_dot_product(cv, qv) DESC, cell ASC LIMIT 4
             |), pruned AS (
             |  SELECT vec_id, v FROM assigned
             |  WHERE rn = 1 AND cell IN (SELECT cell FROM probe)
             |), cbsrc AS (
             |  SELECT v, row_number() OVER (ORDER BY vec_id) - 1 AS c
             |  FROM e ORDER BY vec_id LIMIT 16
             |), cb AS (
             |  SELECT c, s, v[s * 16 + 1 : s * 16 + 16] AS cv
             |  FROM cbsrc, range(0, 4) t(s)
             |), sub AS (
             |  SELECT vec_id, s, v[s * 16 + 1 : s * 16 + 16] AS sv
             |  FROM pruned, range(0, 4) t(s)
             |), d AS (
             |  SELECT vec_id, s, c,
             |    list_reduce([(sv[j] - cv[j]) * (sv[j] - cv[j])
             |                 for j in range(1, 17)],
             |                (a, b) -> a + b) AS dist
             |  FROM sub JOIN cb USING (s)
             |), code AS (
             |  SELECT vec_id, s, c FROM (
             |    SELECT vec_id, s, c,
             |      row_number() OVER (PARTITION BY vec_id, s
             |                         ORDER BY dist, c) AS rn
             |    FROM d) WHERE rn = 1
             |), lut AS (
             |  SELECT vec_id, s,
             |    list_dot_product(qv[s * 16 + 1 : s * 16 + 16], cv) AS term
             |  FROM code JOIN cb USING (s, c), q
             |), adcv AS (
             |  SELECT vec_id,
             |    list_reduce(list(term ORDER BY s), (a, b) -> a + b) AS adc
             |  FROM lut GROUP BY vec_id
             |), approx AS (
             |  SELECT a.vec_id,
             |    CASE WHEN sqrt(list_dot_product(qv, qv))
             |              * sqrt(list_dot_product(p.v, p.v)) = 0 THEN 0
             |    ELSE adc / (sqrt(list_dot_product(qv, qv))
             |                * sqrt(list_dot_product(p.v, p.v))) END AS score
             |  FROM adcv a JOIN pruned p ON a.vec_id = p.vec_id, q
             |), cand AS (
             |  SELECT vec_id FROM approx
             |  ORDER BY score DESC, vec_id ASC LIMIT 40
             |), exact AS (
             |  SELECT e.vec_id AS id, ${cosineSql("v", "qv")} AS cos
             |  FROM e JOIN cand ON e.vec_id = cand.vec_id, q
             |)
             |SELECT id, ${r6sql("cos")} AS cosine
             |FROM exact ORDER BY cos DESC, id LIMIT 10""".stripMargin)),


    // rotated-PQ ANN (round 9): the OPQ rotation PLUMBING — rotated
    // encode, rotated query LUT, ADC over rotated codes, exact rerank
    // on originals — oracle-gated with a FIXED orthonormal rotation
    // (the dimension-reversal permutation, which DuckDB replays as
    // list_reverse). The learned-rotation SOLVER (SVD) stays
    // spec-gated (driver k-means class); this entry pins that every
    // declarative step the solver's output rides is cross-engine
    // exact. Codebook = the 16 lowest-id vectors' ROTATED subvectors
    // (what an OPQ build stores); oracle = s10's chain over
    // list_reverse'd vectors with original-order corpus norms.
    Q("s19_knn_pq_rotated",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val dim = 64
        val perm = Array.tabulate(dim, dim)((i, j) =>
          if (j == dim - 1 - i) 1.0 else 0.0)
        val seeds = emb.orderBy("vec_id").limit(16)
          .select("embedding").collect()
          .map(_.getSeq[Float](0).map(_.toDouble).toArray.reverse)
        val cb = Similarity.PqCodebook(16,
          Array.tabulate(4)(s0 => seeds.map(_.slice(s0 * 16, s0 * 16 + 16))),
          Some(perm))
        Similarity.knnPq(emb, "vec_id", "embedding", queryVec(s, dir),
            k = 10, cb = cb, overfetch = 4)
          .select(col("id"), r6(col("cosine")).as("cosine"))
          .orderBy(col("cosine").desc, col("id"))
      },
      Some(s"""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             |         list_reverse(CAST(embedding AS DOUBLE[])) AS vr
             |  FROM embeddings
             |), q AS (
             |  SELECT v AS qv, vr AS qvr FROM e ORDER BY vec_id LIMIT 1
             |), cbsrc AS (
             |  SELECT vr, row_number() OVER (ORDER BY vec_id) - 1 AS c
             |  FROM e ORDER BY vec_id LIMIT 16
             |), cb AS (
             |  SELECT c, s, vr[s * 16 + 1 : s * 16 + 16] AS cv
             |  FROM cbsrc, range(0, 4) t(s)
             |), sub AS (
             |  SELECT vec_id, s, vr[s * 16 + 1 : s * 16 + 16] AS sv
             |  FROM e, range(0, 4) t(s)
             |), d AS (
             |  SELECT vec_id, s, c,
             |    list_reduce([(sv[j] - cv[j]) * (sv[j] - cv[j])
             |                 for j in range(1, 17)],
             |                (a, b) -> a + b) AS dist
             |  FROM sub JOIN cb USING (s)
             |), code AS (
             |  SELECT vec_id, s, c FROM (
             |    SELECT vec_id, s, c,
             |      row_number() OVER (PARTITION BY vec_id, s
             |                         ORDER BY dist, c) AS rn
             |    FROM d) WHERE rn = 1
             |), lut AS (
             |  SELECT vec_id, s,
             |    list_dot_product(qvr[s * 16 + 1 : s * 16 + 16], cv) AS term
             |  FROM code JOIN cb USING (s, c), q
             |), adcv AS (
             |  SELECT vec_id,
             |    list_reduce(list(term ORDER BY s), (a, b) -> a + b) AS adc
             |  FROM lut GROUP BY vec_id
             |), approx AS (
             |  SELECT a.vec_id,
             |    CASE WHEN sqrt(list_dot_product(qvr, qvr))
             |              * sqrt(list_dot_product(v, v)) = 0 THEN 0
             |    ELSE adc / (sqrt(list_dot_product(qvr, qvr))
             |                * sqrt(list_dot_product(v, v))) END AS score
             |  FROM adcv a JOIN e ON a.vec_id = e.vec_id, q
             |), cand AS (
             |  SELECT vec_id FROM approx
             |  ORDER BY score DESC, vec_id ASC LIMIT 40
             |), exact AS (
             |  SELECT e.vec_id AS id, ${cosineSql("v", "qv")} AS cos
             |  FROM e JOIN cand ON e.vec_id = cand.vec_id, q
             |)
             |SELECT id, ${r6sql("cos")} AS cosine
             |FROM exact ORDER BY cos DESC, id LIMIT 10""".stripMargin)),


    // PQ recall eval (round 9): recall@10 of the ADC probe (s11's
    // chain at overfetch=2 — small on purpose, so the candidate set
    // can actually miss) against the exact brute top-10 — s14's
    // report for the COMPRESSED layout, closing the m/nCodes/
    // overfetch tuning loop the 100 TB code store needs. Oracle =
    // s11's codebook/code/LUT/ADC/rerank CTEs + the brute window +
    // the hit join on (query_id, id).
    Q("s18_pq_recall",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val cb = Similarity.pqSeededCodebook(
          emb, "vec_id", "embedding", m = 4, nCodes = 16)
        val queries = emb.orderBy("vec_id").limit(3)
        Similarity.pqRecall(queries, "vec_id", "embedding",
            emb, "vec_id", "embedding", k = 10, cb = cb, overfetch = 2)
          .orderBy("query_id")
      },
      Some(s"""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
             |), q AS (
             |  SELECT vec_id AS query_id, v AS qv
             |  FROM e ORDER BY vec_id LIMIT 3
             |), cbsrc AS (
             |  SELECT v, row_number() OVER (ORDER BY vec_id) - 1 AS c
             |  FROM e ORDER BY vec_id LIMIT 16
             |), cb AS (
             |  SELECT c, s, v[s * 16 + 1 : s * 16 + 16] AS cv
             |  FROM cbsrc, range(0, 4) t(s)
             |), sub AS (
             |  SELECT vec_id, s, v[s * 16 + 1 : s * 16 + 16] AS sv
             |  FROM e, range(0, 4) t(s)
             |), d AS (
             |  SELECT vec_id, s, c,
             |    list_reduce([(sv[j] - cv[j]) * (sv[j] - cv[j])
             |                 for j in range(1, 17)],
             |                (a, b) -> a + b) AS dist
             |  FROM sub JOIN cb USING (s)
             |), code AS (
             |  SELECT vec_id, s, c FROM (
             |    SELECT vec_id, s, c,
             |      row_number() OVER (PARTITION BY vec_id, s
             |                         ORDER BY dist, c) AS rn
             |    FROM d) WHERE rn = 1
             |), lut AS (
             |  SELECT query_id, vec_id, s,
             |    list_dot_product(qv[s * 16 + 1 : s * 16 + 16], cv) AS term
             |  FROM code JOIN cb USING (s, c), q
             |), adcv AS (
             |  SELECT query_id, vec_id,
             |    list_reduce(list(term ORDER BY s), (a, b) -> a + b) AS adc
             |  FROM lut GROUP BY query_id, vec_id
             |), approx AS (
             |  SELECT a.query_id, a.vec_id,
             |    CASE WHEN sqrt(list_dot_product(qv, qv))
             |              * sqrt(list_dot_product(v, v)) = 0 THEN 0
             |    ELSE adc / (sqrt(list_dot_product(qv, qv))
             |                * sqrt(list_dot_product(v, v))) END AS score
             |  FROM adcv a
             |  JOIN e ON a.vec_id = e.vec_id
             |  JOIN q ON a.query_id = q.query_id
             |), cand AS (
             |  SELECT query_id, vec_id FROM (
             |    SELECT query_id, vec_id,
             |      row_number() OVER (PARTITION BY query_id
             |        ORDER BY score DESC, vec_id ASC) AS rn
             |    FROM approx) WHERE rn <= 20
             |), pq AS (
             |  SELECT query_id, id FROM (
             |    SELECT c.query_id, e.vec_id AS id,
             |      row_number() OVER (PARTITION BY c.query_id
             |        ORDER BY ${cosineSql("v", "qv")} DESC, e.vec_id ASC)
             |        AS rk
             |    FROM e
             |    JOIN cand c ON e.vec_id = c.vec_id
             |    JOIN q ON c.query_id = q.query_id) WHERE rk <= 10
             |), bscored AS (
             |  SELECT q.query_id, e.vec_id AS id,
             |    ${cosineSql("e.v", "q.qv")} AS cos
             |  FROM e CROSS JOIN q
             |), exact AS (
             |  SELECT query_id, id FROM (
             |    SELECT query_id, id, ROW_NUMBER() OVER (
             |      PARTITION BY query_id ORDER BY cos DESC, id ASC) AS rk
             |    FROM bscored)
             |  WHERE rk <= 10
             |), h AS (
             |  SELECT pq.query_id, COUNT(*) AS c
             |  FROM pq JOIN exact USING (query_id, id) GROUP BY 1
             |)
             |SELECT q.query_id, COALESCE(c, 0) AS n_hit,
             |  COALESCE(c, 0) / 10.0 AS recall
             |FROM q LEFT JOIN h USING (query_id)
             |ORDER BY query_id""".stripMargin)),


    // BM25 top-k retrieval for a 3-query probe set — rational RSJ idf
    // (no ln: every step is a fixed IEEE op sequence both engines
    // replay bit-identically) and 6-decimal-scaled LONG per-term
    // contributions so the per-(query, doc) sum is exact integer
    // arithmetic (a double sum depends on partition arrival order).
    // Query-vocab semi-filter before any scoring; bounded-heap top-k.
    Q("s09_bm25",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
        val probes = Seq(
          (1, "hash join table"),
          (2, "window agg sort stream"),
          (3, "fast vector scan")).toDF("query_id", "query_text")
        graft.operators.Retrieval.bm25(docs, "doc_id", "text",
            probes, "query_id", "query_text", k = 10)
          .orderBy("query_id", "rank")
      },
      Some("""WITH q(query_id, qtext) AS (
             |  VALUES (1, 'hash join table'), (2, 'window agg sort stream'),
             |         (3, 'fast vector scan')
             |), toks AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(
             |    trim(lower(text)), '[ \t\n\v\f\r]+'), x -> x <> '')) AS term
             |  FROM documents
             |), postings AS (
             |  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
             |), dl AS (
             |  SELECT doc_id, SUM(tf) AS dl FROM postings GROUP BY doc_id
             |), stats AS (
             |  SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
             |         (SELECT coalesce(SUM(dl), 0) FROM dl) AS n_tokens
             |), qterms AS (
             |  SELECT query_id, unnest(list_distinct(list_filter(
             |    regexp_split_to_array(trim(lower(qtext)), '[ \t\n\v\f\r]+'),
             |    x -> x <> ''))) AS term
             |  FROM q
             |), matched AS (
             |  SELECT p.* FROM postings p
             |  WHERE term IN (SELECT term FROM qterms)
             |), dfreq AS (
             |  SELECT term, COUNT(*) AS doc_freq FROM matched GROUP BY term
             |), contrib AS (
             |  SELECT qt.query_id, m.doc_id,
             |    CAST(FLOOR(
             |      ((n_docs - doc_freq + 0.5) / (doc_freq + 0.5))
             |      * (CAST(m.tf AS DOUBLE) * (1.2 + 1.0))
             |      / (CAST(m.tf AS DOUBLE) + 1.2 * ((1.0 - 0.75)
             |         + 0.75 * (CAST(d.dl AS DOUBLE)
             |                   / (CAST(n_tokens AS DOUBLE) / n_docs))))
             |      * 1000000 + 0.5) AS BIGINT) AS ci
             |  FROM matched m
             |  JOIN qterms qt USING (term)
             |  JOIN dfreq USING (term)
             |  JOIN dl d ON m.doc_id = d.doc_id, stats
             |), sc AS (
             |  SELECT query_id, doc_id, SUM(ci) AS score_i
             |  FROM contrib GROUP BY query_id, doc_id
             |), r AS (
             |  SELECT query_id, doc_id, score_i,
             |    ROW_NUMBER() OVER (PARTITION BY query_id
             |      ORDER BY score_i DESC, doc_id ASC) AS rnk
             |  FROM sc
             |)
             |SELECT query_id, CAST(rnk AS INT) AS rank, doc_id,
             |  score_i / 1000000.0 AS score
             |FROM r WHERE rnk <= 10 ORDER BY query_id, rank""".stripMargin)),


    // positional exact-phrase search: anchor = pos - qpos alignment,
    // full-coverage anchors are occurrences, rank by occurrence count.
    // Oracle replays positional postings (the d13 struct-comprehension
    // idiom), the alignment join and both aggregates.
    Q("s13_phrase_search",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
        val probes = Seq(
          (1, "table hash"),
          (2, "stream table hash"),
          (3, "vector small")).toDF("query_id", "phrase")
        graft.operators.Retrieval.phraseSearch(docs, "doc_id", "text",
            probes, "query_id", "phrase", k = 10)
          .orderBy("query_id", "rank")
      },
      Some("""WITH q(query_id, qtext) AS (
             |  VALUES (1, 'table hash'), (2, 'stream table hash'),
             |         (3, 'vector small')
             |), d AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(
             |    trim(lower(text)), '[ \t\n\v\f\r]+'), x -> x <> '') AS w
             |  FROM documents
             |), p0 AS (
             |  SELECT doc_id, unnest([{'pos': i, 'tok': w[i + 1]}
             |                         for i in range(0, len(w))]) AS u
             |  FROM d
             |), postings AS (
             |  SELECT doc_id, u.pos AS pos, u.tok AS term FROM p0
             |), qa AS (
             |  SELECT query_id, list_filter(regexp_split_to_array(
             |    trim(lower(qtext)), '[ \t\n\v\f\r]+'), x -> x <> '') AS w
             |  FROM q
             |), q0 AS (
             |  SELECT query_id, unnest([{'pos': i, 'tok': w[i + 1]}
             |                           for i in range(0, len(w))]) AS u
             |  FROM qa
             |), qterms AS (
             |  SELECT query_id, u.pos AS qpos, u.tok AS term FROM q0
             |), qlen AS (
             |  SELECT query_id, COUNT(*) AS qlen FROM qterms GROUP BY query_id
             |), anchors AS (
             |  SELECT qt.query_id, p.doc_id, p.pos - qt.qpos AS anchor,
             |    COUNT(*) AS hits
             |  FROM postings p JOIN qterms qt ON p.term = qt.term
             |  GROUP BY qt.query_id, p.doc_id, p.pos - qt.qpos
             |), occ AS (
             |  SELECT a.query_id, a.doc_id, COUNT(*) AS n_occurrences
             |  FROM anchors a JOIN qlen l
             |    ON a.query_id = l.query_id AND a.hits = l.qlen
             |  GROUP BY a.query_id, a.doc_id
             |), r AS (
             |  SELECT query_id, doc_id, n_occurrences,
             |    ROW_NUMBER() OVER (PARTITION BY query_id
             |      ORDER BY n_occurrences DESC, doc_id ASC) AS rnk
             |  FROM occ
             |)
             |SELECT query_id, CAST(rnk AS INT) AS rank, doc_id,
             |  n_occurrences
             |FROM r WHERE rnk <= 10 ORDER BY query_id, rank""".stripMargin)),


    // MMR diversified re-ranking (round 14, 148th entry): the greedy
    // λ·relevance − (1−λ)·max-redundancy pick over a 40-candidate
    // overfetch. The corpus-side work is a brute top-k probe; the
    // greedy loop runs on the DRIVER over the bounded candidate set
    // (the kmeansOnSample stance) — and the oracle replays that loop
    // as a WITH RECURSIVE CTE carrying the picked vectors in a list
    // column, one row per rank, same strict-> tie-break (ORDER BY
    // score DESC, candidate order ASC). (1.0 - 0.7) is written as the
    // SUBTRACTION in SQL so both engines use the same IEEE double
    // (0.30000000000000004), and the candidate-candidate cosine is
    // the same sqrt(a·a)·sqrt(b·b) shape as cosLocal.
    Q("s20_mmr_diversify",
      (s, dir) => {
        Similarity.diversifyTopK(Tables.load(s, dir, "embeddings"),
            "vec_id", "embedding", queryVec(s, dir),
            k = 10, lambdaRel = 0.7, overfetch = 4)
          .select(col("rank"), col("id"), r6(col("cosine")).as("cosine"),
            r6(col("mmr")).as("mmr"))
          .orderBy("rank")
      },
      Some(s20OracleSql)),


    // hybrid retrieval (round 16, 151st entry): BM25 lexical top-20
    // and brute-cosine dense top-20 per query, fused by reciprocal
    // rank (rrf = Σ 1/(60+rank), Cormack'09 — the standard score-free
    // combiner). The probe set pairs each s09 text query with a
    // deterministic query vector (the embedding at vec_id = 7·qid —
    // doc_id and vec_id share one id space in the testdata). The
    // fused score is a fixed two-term IEEE sum (lexical side first),
    // so the oracle replays the s09 BM25 chain, the s04 cosine chain
    // and the same full-outer fusion bit-identically.
    Q("s21_rrf_fusion",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
        val emb = Tables.load(s, dir, "embeddings")
        val probes = Seq(
          (1, "hash join table"),
          (2, "window agg sort stream"),
          (3, "fast vector scan")).toDF("query_id", "query_text")
        val qvecs = emb.where(col("vec_id").isin(7L, 14L, 21L))
          .select((col("vec_id") / 7).cast("int").as("query_id"),
            col("embedding"))
        val lex = graft.operators.Retrieval.bm25(docs, "doc_id", "text",
            probes, "query_id", "query_text", k = 20)
          .select(col("query_id"), col("doc_id").as("id"), col("rank"))
        val dw = org.apache.spark.sql.expressions.Window
          .partitionBy("query_id")
          .orderBy(col("cosine").desc, col("id").asc)
        val dense = Similarity.knnBruteBatch(qvecs, "query_id",
            "embedding", emb, "vec_id", "embedding", k = 20)
          .withColumn("rank", row_number().over(dw))
        graft.operators.Retrieval.rrfFuse(lex, dense,
            "query_id", "id", "rank", k = 10)
          .select(col("query_id"), col("rank"), col("id"),
            r6(col("rrf")).as("rrf"))
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH q(query_id, qtext) AS (
             |  VALUES (1, 'hash join table'), (2, 'window agg sort stream'),
             |         (3, 'fast vector scan')
             |), toks AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(
             |    trim(lower(text)), '[ \\t\\n\\v\\f\\r]+'), x -> x <> '')) AS term
             |  FROM documents
             |), postings AS (
             |  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
             |), dl AS (
             |  SELECT doc_id, SUM(tf) AS dl FROM postings GROUP BY doc_id
             |), stats AS (
             |  SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
             |         (SELECT coalesce(SUM(dl), 0) FROM dl) AS n_tokens
             |), qterms AS (
             |  SELECT query_id, unnest(list_distinct(list_filter(
             |    regexp_split_to_array(trim(lower(qtext)), '[ \\t\\n\\v\\f\\r]+'),
             |    x -> x <> ''))) AS term
             |  FROM q
             |), matched AS (
             |  SELECT p.* FROM postings p
             |  WHERE term IN (SELECT term FROM qterms)
             |), dfreq AS (
             |  SELECT term, COUNT(*) AS doc_freq FROM matched GROUP BY term
             |), contrib AS (
             |  SELECT qt.query_id, m.doc_id,
             |    CAST(FLOOR(
             |      ((n_docs - doc_freq + 0.5) / (doc_freq + 0.5))
             |      * (CAST(m.tf AS DOUBLE) * (1.2 + 1.0))
             |      / (CAST(m.tf AS DOUBLE) + 1.2 * ((1.0 - 0.75)
             |         + 0.75 * (CAST(d.dl AS DOUBLE)
             |                   / (CAST(n_tokens AS DOUBLE) / n_docs))))
             |      * 1000000 + 0.5) AS BIGINT) AS ci
             |  FROM matched m
             |  JOIN qterms qt USING (term)
             |  JOIN dfreq USING (term)
             |  JOIN dl d ON m.doc_id = d.doc_id, stats
             |), sc AS (
             |  SELECT query_id, doc_id, SUM(ci) AS score_i
             |  FROM contrib GROUP BY query_id, doc_id
             |), lexk AS (
             |  SELECT query_id, doc_id AS id, rnk FROM (
             |    SELECT query_id, doc_id, ROW_NUMBER() OVER (
             |      PARTITION BY query_id
             |      ORDER BY score_i DESC, doc_id ASC) AS rnk
             |    FROM sc) WHERE rnk <= 20
             |), qv AS (
             |  SELECT CAST(vec_id / 7 AS INT) AS query_id,
             |         CAST(embedding AS DOUBLE[]) AS qv
             |  FROM embeddings WHERE vec_id IN (7, 14, 21)
             |), e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
             |), denk AS (
             |  SELECT query_id, id, rnk FROM (
             |    SELECT query_id, vec_id AS id, ROW_NUMBER() OVER (
             |      PARTITION BY query_id
             |      ORDER BY ${cosineSql("v", "qv")} DESC, vec_id ASC) AS rnk
             |    FROM e CROSS JOIN qv) WHERE rnk <= 20
             |), fused AS (
             |  SELECT COALESCE(l.query_id, d.query_id) AS query_id,
             |         COALESCE(l.id, d.id) AS id,
             |         COALESCE(1.0 / (60 + l.rnk), 0)
             |           + COALESCE(1.0 / (60 + d.rnk), 0) AS rrf
             |  FROM lexk l FULL OUTER JOIN denk d
             |    ON l.query_id = d.query_id AND l.id = d.id
             |), r AS (
             |  SELECT query_id, id, rrf, ROW_NUMBER() OVER (
             |    PARTITION BY query_id ORDER BY rrf DESC, id ASC) AS rnk
             |  FROM fused
             |)
             |SELECT query_id, CAST(rnk AS INT) AS rank, id,
             |  ${r6sql("rrf")} AS rrf
             |FROM r WHERE rnk <= 10 ORDER BY query_id, rank""".stripMargin)),


    // graph ANN (round 17): per-cell navigable-small-world walk —
    // s03's cell partitioning + a within-cell kNN graph (top-6
    // neighbors by cosine, ties→lower id), entry = min id per probed
    // cell, 4 beam-expansion rounds at ef=12, beams merged into the
    // global top-10. Fully deterministic, so the oracle replays the
    // WHOLE chain — centroids, assignment, probe, graph edges, each
    // beam round as a chained CTE pair, final merge — bit-identically
    // (the s02/s03 stance; the walk's in-memory cosine mirrors the
    // codegen kernel op-for-op).
    Q("s22_knn_hnsw",
      (s, dir) => {
        Similarity.knnHnsw(Tables.load(s, dir, "embeddings"),
            "vec_id", "embedding", queryVec(s, dir), k = 10,
            nCells = 16, nProbe = 4, m = 6, ef = 12, rounds = 4)
          .select(col("id"), r6(col("cosine")).as("cosine"))
          .orderBy(col("cosine").desc, col("id"))
      },
      Some(s22OracleSql)),


    // graph-ANN tuning eval (round 18 — r17 verdict task 3): d17's
    // recall/cost-curve treatment for the s22 family. ONE build (cell
    // assignment + the within-cell kNN edges ranked to max(m) — a
    // smaller m's graph is the rk<=m prefix, by construction of the
    // shared neighbor ranking) swept over three (m, ef, rounds)
    // budgets; per config, recall@10 of the walk against the brute
    // truth and the walk's true read cost (distinct nodes SCORED =
    // the union of its candidate sets). Sums-then-one-division keeps
    // the doubles bit-stable cross-engine; the oracle replays every
    // config's full beam chain as unrolled CTE pairs (the s22
    // stance), plus the visited-count union and the recall join.
    // The curve is what sizes the default knobs: on this corpus
    // (m=6, ef=12, rounds=4) buys its recall with ~2-3x the reads of
    // the cheapest config — the data behind s22's defaults.
    // Cost shape (measured): wall time is FLAT across sf0.01→sf0.1
    // (~30s → ~27s) — the sweep is bound by its fixed count of
    // sequential beam-round stages (9 across the three configs), not
    // by data; at real scale the same stage count serves the full
    // corpus, which is the design point. An eval, not a serving path.
    Q("s23_hnsw_tuning_eval",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val queries = emb.orderBy("vec_id").limit(3)
          .select(col("vec_id").as("qid"), col("embedding"))
        Similarity.hnswTuningEval(queries, "qid", "embedding",
            emb, "vec_id", "embedding", k = 10, nCells = 16, nProbe = 4,
            configs = Seq((2, 10, 2), (4, 12, 3), (6, 12, 4)))
          .select(col("m"), col("ef"), col("rounds"), col("n_queries"),
            r6(col("avg_recall")).as("avg_recall"),
            r6(col("avg_visited")).as("avg_visited"))
          .orderBy("m", "ef", "rounds")
      },
      Some(s23OracleSql)),


    // filtered graph ANN (round 18 — s15's treatment for the s22
    // family, closing the last IVF↔graph symmetry gap): top-k among
    // predicate-passing nodes via the graph walk. The walk runs over
    // the FULL graph — filtered nodes still route and seed (walking
    // only the passing subgraph would disconnect it; the opposite
    // trade from s15's exact pre-filter, which a flat scan can
    // afford) — and the predicate masks EMISSION, with ef sized above
    // k for the selectivity (ef=20 at ~50% here). Oracle = s22's
    // chain with the predicate on the final merge only.
    Q("s24_knn_hnsw_filtered",
      (s, dir) => {
        Similarity.knnHnsw(Tables.load(s, dir, "embeddings"),
            "vec_id", "embedding", queryVec(s, dir), k = 10,
            nCells = 16, nProbe = 4, m = 6, ef = 20, rounds = 4,
            attrCols = Seq("label"),
            predicate = Some(col("label") % 2 === 0))
          .select(col("id"), r6(col("cosine")).as("cosine"))
          .orderBy(col("cosine").desc, col("id"))
      },
      Some(hnswWalkOracleSql(20, Some("n.label % 2 = 0")))),


    // coded graph ANN (round 19 — r18 verdict task 1's oracle gate):
    // the memory-bounded serving walk — beam on PQ ADC scores over
    // the persisted sidecar, exact rerank of only the final beam ids
    // via the static-In point read. The entry builds a real index
    // (SeededCentroids + the SQL-replayable seeded codebook) in a
    // self-deleting temp root, runs the walk imperatively (typed
    // cogroup — the c11 stance: store machinery imperative, the
    // FINAL frame declarative), registers the cells tree for SqlGen
    // and returns the rerank as a printable plan. The oracle replays
    // the WHOLE chain: s22's centroid/assign/probe/edge CTEs + s11's
    // codebook/code/LUT/ADC CTEs fused into per-node walk scores,
    // four beam rounds ranked by ADC (the walk's one behavioral
    // difference from s22 — bit-identical arithmetic, same
    // left-to-right accumulation), exact-cosine rerank of beam4.
    Q("s25_knn_hnsw_coded",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val root = tempRootForRun("graft-s25")
        val path = s"$root/hnsw"
        Similarity.writeHnswIndex(emb, "vec_id", "embedding", path,
          nCells = 16, m = 6)
        Similarity.addPqToHnswIndex(s, path,
          Similarity.pqSeededCodebook(emb, "vec_id", "embedding",
            m = 4, nCodes = 16))
        val qv = queryVec(s, dir)
        val (cb, lut, qnorm, probeCells) =
          Similarity.codedProbePlan(s, path, qv, nProbe = 4)
        val ids = Similarity.codedBeamIds(s, path, cb, lut, qnorm,
          probeCells, ef = 12, rounds = 4, None)
        val cells = s.read.parquet(s"$path/cells")
        graft.sqlgen.SqlGen.register("s25_cells", cells)
        cells.createOrReplaceTempView("s25_cells")
        cells.where(col("cell").isin(probeCells: _*))
          .where(col("id").isin(ids.toIndexedSeq: _*))
          .select(col("id"),
            graft.functions.VectorOps.cosine(col("vec"),
              typedlit(qv.toSeq)).as("cosine"))
          .orderBy(col("cosine").desc, col("id").asc).limit(10)
          .select(col("id"), r6(col("cosine")).as("cosine"))
          .orderBy(col("cosine").desc, col("id"))
      },
      Some(s25OracleSql)),
  )

  /** The s22/s24 oracle generator: the deterministic NSW chain in
    * DuckDB, beam rounds unrolled as CTE pairs (candN = beam ∪ its
    * out-edges; beamN = per-cell top-ef by cosine-to-query, ties→id).
    * `finalPred` (s24) filters EMISSION only — the walk's beams are
    * untouched, the filtered-graph-ANN contract the Spark side
    * documents on knnHnsw.
    */
  private def hnswWalkOracleSql(ef: Int,
      finalPred: Option[String]): String = {
    val rounds = 4
    val roundCtes = (1 to rounds).map { r =>
      s"""cand$r AS (
         |  SELECT DISTINCT cell, id FROM (
         |    SELECT cell, id FROM beam${r - 1}
         |    UNION ALL
         |    SELECT g.cell, g.dst AS id FROM beam${r - 1} b
         |    JOIN edge g ON g.cell = b.cell AND g.src = b.id)
         |), beam$r AS (
         |  SELECT cell, id FROM (
         |    SELECT c.cell, c.id, ROW_NUMBER() OVER (PARTITION BY c.cell
         |      ORDER BY ${cosineSql("n.v", "qv")} DESC, c.id ASC) AS rk
         |    FROM cand$r c
         |    JOIN node n ON n.cell = c.cell AND n.id = c.id, q)
         |  WHERE rk <= $ef
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH cent AS (
       |  SELECT (ROW_NUMBER() OVER (ORDER BY vec_id)) - 1 AS cell,
       |         CAST(embedding AS DOUBLE[]) AS cv
       |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
       |), q AS (
       |  SELECT CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings ORDER BY vec_id LIMIT 1
       |), e AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings
       |), assigned AS (
       |  SELECT vec_id, label, v, cell,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY list_dot_product(v, cv) DESC, cell ASC) AS rn
       |  FROM e CROSS JOIN cent
       |), probe AS (
       |  SELECT cell FROM cent, q
       |  ORDER BY list_dot_product(cv, qv) DESC, cell ASC LIMIT 4
       |), node AS (
       |  SELECT vec_id AS id, label, v, cell FROM assigned
       |  WHERE rn = 1 AND cell IN (SELECT cell FROM probe)
       |), edge AS (
       |  SELECT cell, src, dst FROM (
       |    SELECT a.cell AS cell, a.id AS src, b.id AS dst,
       |      ROW_NUMBER() OVER (PARTITION BY a.id
       |        ORDER BY ${cosineSql("a.v", "b.v")} DESC, b.id ASC) AS rk
       |    FROM node a JOIN node b ON a.cell = b.cell AND a.id <> b.id)
       |  WHERE rk <= 6
       |), beam0 AS (
       |  SELECT cell, MIN(id) AS id FROM node GROUP BY cell
       |), $roundCtes
       |SELECT id, ${r6sql("cos")} AS cosine FROM (
       |  SELECT b.id, ${cosineSql("n.v", "qv")} AS cos
       |  FROM beam$rounds b
       |  JOIN node n ON n.cell = b.cell AND n.id = b.id, q
       |  ${finalPred.map(p => s"WHERE $p").getOrElse("")})
       |ORDER BY cos DESC, id LIMIT 10""".stripMargin
  }

  private def s22OracleSql: String = hnswWalkOracleSql(12, None)

  /** The s25 oracle: the coded walk replayed end to end — s22's
    * build/probe CTEs, s11's seeded-codebook encode + per-node
    * LUT/ADC score against the one query, beam rounds ranked by that
    * score, exact-cosine rerank of the final beam. subDim = 16
    * (dim 64 / pqM 4), nCodes = 16.
    */
  private def s25OracleSql: String =
    s"""WITH cent AS (
       |  SELECT (ROW_NUMBER() OVER (ORDER BY vec_id)) - 1 AS cell,
       |         CAST(embedding AS DOUBLE[]) AS cv
       |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
       |), q AS (
       |  SELECT CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings ORDER BY vec_id LIMIT 1
       |), e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), assigned AS (
       |  SELECT vec_id, v, cell,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY list_dot_product(v, cv) DESC, cell ASC) AS rn
       |  FROM e CROSS JOIN cent
       |), probe AS (
       |  SELECT cell FROM cent, q
       |  ORDER BY list_dot_product(cv, qv) DESC, cell ASC LIMIT 4
       |), node AS (
       |  SELECT vec_id AS id, v, cell FROM assigned
       |  WHERE rn = 1 AND cell IN (SELECT cell FROM probe)
       |), edge AS (
       |  SELECT cell, src, dst FROM (
       |    SELECT a.cell AS cell, a.id AS src, b.id AS dst,
       |      ROW_NUMBER() OVER (PARTITION BY a.id
       |        ORDER BY ${cosineSql("a.v", "b.v")} DESC, b.id ASC) AS rk
       |    FROM node a JOIN node b ON a.cell = b.cell AND a.id <> b.id)
       |  WHERE rk <= 6
       |), cbsrc AS (
       |  SELECT v, row_number() OVER (ORDER BY vec_id) - 1 AS c
       |  FROM e ORDER BY vec_id LIMIT 16
       |), cb AS (
       |  SELECT c, s, v[s * 16 + 1 : s * 16 + 16] AS scv
       |  FROM cbsrc, range(0, 4) t(s)
       |), sub AS (
       |  SELECT id, s, v[s * 16 + 1 : s * 16 + 16] AS sv
       |  FROM node, range(0, 4) t(s)
       |), d AS (
       |  SELECT id, s, c,
       |    list_reduce([(sv[j] - scv[j]) * (sv[j] - scv[j])
       |                 for j in range(1, 17)],
       |                (a, b) -> a + b) AS dist
       |  FROM sub JOIN cb USING (s)
       |), code AS (
       |  SELECT id, s, c FROM (
       |    SELECT id, s, c,
       |      row_number() OVER (PARTITION BY id, s
       |                         ORDER BY dist, c) AS rn
       |    FROM d) WHERE rn = 1
       |), lutt AS (
       |  SELECT id, s,
       |    list_dot_product(qv[s * 16 + 1 : s * 16 + 16], scv) AS term
       |  FROM code JOIN cb USING (s, c), q
       |), adcv AS (
       |  SELECT id,
       |    list_reduce(list(term ORDER BY s), (a, b) -> a + b) AS adc
       |  FROM lutt GROUP BY id
       |), nsc AS (
       |  SELECT n.cell, n.id,
       |    CASE WHEN sqrt(list_dot_product(qv, qv))
       |              * sqrt(list_dot_product(v, v)) = 0 THEN 0
       |    ELSE adc / (sqrt(list_dot_product(qv, qv))
       |                * sqrt(list_dot_product(v, v))) END AS sc
       |  FROM node n JOIN adcv ON n.id = adcv.id, q
       |), beam0 AS (
       |  SELECT cell, MIN(id) AS id FROM node GROUP BY cell
       |), cand1 AS (
       |  SELECT DISTINCT cell, id FROM (
       |    SELECT cell, id FROM beam0
       |    UNION ALL
       |    SELECT g.cell, g.dst AS id FROM beam0 b
       |    JOIN edge g ON g.cell = b.cell AND g.src = b.id)
       |), beam1 AS (
       |  SELECT cell, id FROM (
       |    SELECT c.cell, c.id, ROW_NUMBER() OVER (PARTITION BY c.cell
       |      ORDER BY w.sc DESC, c.id ASC) AS rk
       |    FROM cand1 c JOIN nsc w ON w.cell = c.cell AND w.id = c.id)
       |  WHERE rk <= 12
       |), cand2 AS (
       |  SELECT DISTINCT cell, id FROM (
       |    SELECT cell, id FROM beam1
       |    UNION ALL
       |    SELECT g.cell, g.dst AS id FROM beam1 b
       |    JOIN edge g ON g.cell = b.cell AND g.src = b.id)
       |), beam2 AS (
       |  SELECT cell, id FROM (
       |    SELECT c.cell, c.id, ROW_NUMBER() OVER (PARTITION BY c.cell
       |      ORDER BY w.sc DESC, c.id ASC) AS rk
       |    FROM cand2 c JOIN nsc w ON w.cell = c.cell AND w.id = c.id)
       |  WHERE rk <= 12
       |), cand3 AS (
       |  SELECT DISTINCT cell, id FROM (
       |    SELECT cell, id FROM beam2
       |    UNION ALL
       |    SELECT g.cell, g.dst AS id FROM beam2 b
       |    JOIN edge g ON g.cell = b.cell AND g.src = b.id)
       |), beam3 AS (
       |  SELECT cell, id FROM (
       |    SELECT c.cell, c.id, ROW_NUMBER() OVER (PARTITION BY c.cell
       |      ORDER BY w.sc DESC, c.id ASC) AS rk
       |    FROM cand3 c JOIN nsc w ON w.cell = c.cell AND w.id = c.id)
       |  WHERE rk <= 12
       |), cand4 AS (
       |  SELECT DISTINCT cell, id FROM (
       |    SELECT cell, id FROM beam3
       |    UNION ALL
       |    SELECT g.cell, g.dst AS id FROM beam3 b
       |    JOIN edge g ON g.cell = b.cell AND g.src = b.id)
       |), beam4 AS (
       |  SELECT cell, id FROM (
       |    SELECT c.cell, c.id, ROW_NUMBER() OVER (PARTITION BY c.cell
       |      ORDER BY w.sc DESC, c.id ASC) AS rk
       |    FROM cand4 c JOIN nsc w ON w.cell = c.cell AND w.id = c.id)
       |  WHERE rk <= 12
       |)
       |SELECT id, ${r6sql("cos")} AS cosine FROM (
       |  SELECT b.id, ${cosineSql("n.v", "qv")} AS cos
       |  FROM beam4 b
       |  JOIN node n ON n.cell = b.cell AND n.id = b.id, q)
       |ORDER BY cos DESC, id LIMIT 10""".stripMargin

  /** The s23 oracle: the tuning sweep's every config replayed as its
    * own unrolled beam chain over ONE shared node/edge build (edges
    * ranked to max(m); a config filters `rk <= m`), plus the
    * visited-count union and the recall join against the brute
    * truth. Multi-query: every beam/cand CTE carries query_id and
    * the per-cell windows partition by (query_id, cell).
    */
  private def s23OracleSql: String = {
    val k = 10
    val nQ = 3
    val configs = Seq((2, 10, 2), (4, 12, 3), (6, 12, 4))
    val mMax = configs.map(_._1).max
    val perConfig = configs.zipWithIndex.map { case ((m, ef, rounds), ci) =>
      val chain = (1 to rounds).map { r =>
        s"""c${ci}_$r AS (
           |  SELECT DISTINCT query_id, cell, id FROM (
           |    SELECT query_id, cell, id FROM ${if (r == 1) "beam0"
              else s"b${ci}_${r - 1}"}
           |    UNION ALL
           |    SELECT b.query_id, g.cell, g.dst AS id
           |    FROM ${if (r == 1) "beam0" else s"b${ci}_${r - 1}"} b
           |    JOIN edge g ON g.cell = b.cell AND g.src = b.id
           |      AND g.rk <= $m)
           |), b${ci}_$r AS (
           |  SELECT query_id, cell, id FROM (
           |    SELECT c.query_id, c.cell, c.id, ROW_NUMBER() OVER (
           |      PARTITION BY c.query_id, c.cell
           |      ORDER BY ${cosineSql("n.v", "qq.qv")} DESC, c.id ASC)
           |      AS rk
           |    FROM c${ci}_$r c
           |    JOIN node n ON n.cell = c.cell AND n.id = c.id
           |    JOIN q qq ON qq.query_id = c.query_id)
           |  WHERE rk <= $ef
           |)""".stripMargin
      }.mkString(", ")
      val candUnion = (1 to rounds)
        .map(r => s"SELECT query_id, id FROM c${ci}_$r")
        .mkString("\n    UNION ALL\n    ")
      s"""$chain, appx$ci AS (
         |  SELECT query_id, id FROM (
         |    SELECT bb.query_id, bb.id, ROW_NUMBER() OVER (
         |      PARTITION BY bb.query_id
         |      ORDER BY ${cosineSql("n.v", "qq.qv")} DESC, bb.id ASC)
         |      AS rk
         |    FROM b${ci}_$rounds bb
         |    JOIN node n ON n.cell = bb.cell AND n.id = bb.id
         |    JOIN q qq ON qq.query_id = bb.query_id)
         |  WHERE rk <= $k
         |), vis$ci AS (
         |  SELECT SUM(nv) AS sv FROM (
         |    SELECT query_id, COUNT(DISTINCT id) AS nv FROM (
         |    $candUnion
         |    ) GROUP BY query_id)
         |), hit$ci AS (
         |  SELECT COUNT(*) AS nh FROM appx$ci a
         |  JOIN exact x ON a.query_id = x.query_id AND a.id = x.id
         |)""".stripMargin
    }
    val rows = configs.zipWithIndex.map { case ((m, ef, rounds), ci) =>
      s"""SELECT CAST($m AS INT) AS m, CAST($ef AS INT) AS ef,
         |  CAST($rounds AS INT) AS rounds, CAST($nQ AS INT) AS n_queries,
         |  ${r6sql(s"nh / ${k * nQ}.0")} AS avg_recall,
         |  ${r6sql(s"sv / $nQ.0")} AS avg_visited
         |FROM hit$ci, vis$ci""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH cent AS (
       |  SELECT (ROW_NUMBER() OVER (ORDER BY vec_id)) - 1 AS cell,
       |         CAST(embedding AS DOUBLE[]) AS cv
       |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
       |), q AS (
       |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings ORDER BY vec_id LIMIT $nQ
       |), e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), assigned AS (
       |  SELECT vec_id, v, cell,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY list_dot_product(v, cv) DESC, cell ASC) AS rn
       |  FROM e CROSS JOIN cent
       |), probe AS (
       |  SELECT query_id, cell FROM (
       |    SELECT query_id, cell, ROW_NUMBER() OVER (
       |      PARTITION BY query_id
       |      ORDER BY list_dot_product(cv, qv) DESC, cell ASC) AS pk
       |    FROM cent CROSS JOIN q)
       |  WHERE pk <= 4
       |), node AS (
       |  SELECT vec_id AS id, v, cell FROM assigned
       |  WHERE rn = 1 AND cell IN (SELECT DISTINCT cell FROM probe)
       |), edge AS (
       |  SELECT cell, src, dst, rk FROM (
       |    SELECT a.cell AS cell, a.id AS src, b.id AS dst,
       |      ROW_NUMBER() OVER (PARTITION BY a.id
       |        ORDER BY ${cosineSql("a.v", "b.v")} DESC, b.id ASC) AS rk
       |    FROM node a JOIN node b ON a.cell = b.cell AND a.id <> b.id)
       |  WHERE rk <= $mMax
       |), bscored AS (
       |  SELECT q.query_id, e.vec_id AS id,
       |    ${cosineSql("e.v", "q.qv")} AS cos
       |  FROM e CROSS JOIN q
       |), exact AS (
       |  SELECT query_id, id FROM (
       |    SELECT query_id, id, ROW_NUMBER() OVER (
       |      PARTITION BY query_id ORDER BY cos DESC, id ASC) AS rk
       |    FROM bscored)
       |  WHERE rk <= $k
       |), beam0 AS (
       |  SELECT p.query_id, n.cell, MIN(n.id) AS id
       |  FROM node n JOIN probe p ON n.cell = p.cell
       |  GROUP BY 1, 2
       |), ${perConfig.mkString(", ")}
       |SELECT * FROM (
       |$rows
       |) ORDER BY m, ef, rounds""".stripMargin
  }
}
