package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.queries.Relational.Q

/** SparkEntry wiring for the training-data pipeline operators
  * (SURVEY.md §2: dedup, similarity, text analysis, multimodal).
  * Entries without a DuckDB-expressible oracle are rows-only checks;
  * each is still fully deterministic (fixed seeds, total ordering).
  */
object Pipeline {

  /** First embedding (vec_id = min) as the query vector for the ANN
    * entries — fetched per-run from the scale factor under test so the
    * query composes at any SF. Single-row lookup, not a data scan.
    */
  private def queryVec(s: SparkSession, dir: String): Array[Float] = {
    val row = Tables.load(s, dir, "embeddings")
      .orderBy("vec_id").select("embedding").head()
    row.getSeq[Float](0).toArray
  }

  val all: Seq[Q] = Seq(

    // exact dedup: survivors + multiplicity, SQL-checkable
    Q("d01_dedup_exact",
      (s, dir) => {
        Dedup.exact(Tables.load(s, dir, "documents"), "doc_id", "text")
          .select(col("survivor_id"), col("n_copies"))
          .orderBy("survivor_id")
      },
      Some("""SELECT MIN(doc_id) AS survivor_id, COUNT(*) AS n_copies
             |FROM documents GROUP BY text ORDER BY survivor_id""".stripMargin)),

    // MinHash + LSH banding + exact-Jaccard verify
    Q("d02_dedup_minhash",
      (s, dir) => {
        Dedup.minhashDuplicates(Tables.load(s, dir, "documents"),
            "doc_id", "text", shingleK = 3, numHashes = 128, bands = 16,
            threshold = 0.5)
          .select(col("id_a"), col("id_b"),
                  round(col("jaccard"), 6).as("jaccard"))
          .orderBy("id_a", "id_b")
      },
      None),

    // SimHash + pigeonhole hamming join
    Q("d03_dedup_simhash",
      (s, dir) => {
        // radius 10: the synthetic docs are short (~30 tokens), so the
        // bigram sketch is noisy — see simhashDuplicates scale note.
        Dedup.simhashDuplicates(Tables.load(s, dir, "documents"),
            "doc_id", "text", maxHamming = 10)
          .orderBy("id_a", "id_b")
      },
      None),

    // char n-gram Jaccard verify over MinHash candidates
    Q("d04_dedup_jaccard",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val cands = Dedup.minhashCandidates(docs, "doc_id", "text")
        Dedup.charJaccardVerify(cands, docs, "doc_id", "text",
            n = 3, threshold = 0.7)
          .select(col("id_a"), col("id_b"),
                  round(col("char_jaccard"), 6).as("char_jaccard"))
          .orderBy("id_a", "id_b")
      },
      None),

    // embedding cosine near-dup via sign-LSH buckets
    Q("d05_dedup_embedding",
      (s, dir) => {
        Similarity.cosineDuplicates(Tables.load(s, dir, "embeddings"),
            "vec_id", "embedding", dim = 64, threshold = 0.4,
            bands = 12, bitsPerBand = 6)
          .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
          .orderBy("id_a", "id_b")
      },
      None),

    // exact brute-force cosine top-k
    Q("s01_knn_brute",
      (s, dir) => {
        Similarity.knnBrute(Tables.load(s, dir, "embeddings"),
            "vec_id", "embedding", queryVec(s, dir), k = 20)
          .select(col("id"), round(col("cosine"), 6).as("cosine"))
          .orderBy(col("cosine").desc, col("id"))
      },
      None),

    // LSH-bucketed ANN, same query vector
    Q("s02_knn_lsh",
      (s, dir) => {
        Similarity.knnLsh(Tables.load(s, dir, "embeddings"),
            "vec_id", "embedding", queryVec(s, dir), k = 20,
            bands = 8, bitsPerBand = 8)
          .select(col("id"), round(col("cosine"), 6).as("cosine"))
          .orderBy(col("cosine").desc, col("id"))
      },
      None),

    // IVF-bucketed ANN: nearest-centroid cells only (scale path reads
    // nProbe/nCells of the corpus when the index is cell-partitioned)
    Q("s03_knn_ivf",
      (s, dir) => {
        Similarity.knnIvf(Tables.load(s, dir, "embeddings"),
            "vec_id", "embedding", queryVec(s, dir), k = 20,
            nCells = 16, nProbe = 4)
          .select(col("id"), round(col("cosine"), 6).as("cosine"))
          .orderBy(col("cosine").desc, col("id"))
      },
      None),

    // language ID heuristic
    Q("t01_lang_id",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        docs.select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
          .orderBy("doc_id")
      },
      None),

    // quality features + composite score
    Q("t02_quality",
      (s, dir) => {
        TextAnalysis.qualityFeatures(Tables.load(s, dir, "documents"),
            "doc_id", "text")
          .withColumn("quality", round(col("quality"), 6))
          .withColumn("alpha_ratio", round(col("alpha_ratio"), 6))
          .withColumn("punct_ratio", round(col("punct_ratio"), 6))
          .withColumn("stopword_rate", round(col("stopword_rate"), 6))
          .withColumn("mean_word_len", round(col("mean_word_len"), 6))
          .orderBy("doc_id")
      },
      None),

    // token counting — SQL-checkable against DuckDB regex engine
    Q("t03_token_count",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        docs.select(col("doc_id"),
            TextAnalysis.wsTokenCount(col("text")).as("n_ws_tokens"),
            TextAnalysis.bpePieceCount(col("text")).as("n_bpe_pieces"),
            length(col("text")).as("n_len"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |CAST(CASE WHEN length(trim(text)) = 0 THEN 0
             |  ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS INT) AS n_ws_tokens,
             |CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_bpe_pieces,
             |CAST(length(text) AS INT) AS n_len
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // order-sensitive 64-bit fingerprint
    Q("t04_fingerprint",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        docs.select(col("doc_id"),
            TextAnalysis.fingerprint64(col("text")).as("fingerprint"))
          .orderBy("doc_id")
      },
      None),

    // gap-based sessionization, batch twin of the streaming operator
    // (graft.streaming.EventsStream.sessionize). Timestamps formatted
    // at second precision: the raw column is ns in parquet, µs in
    // Spark — second-level truncation is the engine-agnostic contract.
    Q("st01_sessionize",
      (s, dir) => {
        graft.streaming.EventsStream
          .sessionizeBatch(Tables.load(s, dir, "events"), 30 * 60 * 1000L)
          .select(col("user_id"),
            date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("start_s"),
            date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("end_s"),
            col("n_events"), col("total_value"))
          .orderBy("user_id", "start_s")
      },
      Some("""WITH g AS (
             |  SELECT user_id, ts, event_id, value,
             |    CASE WHEN CAST(epoch(ts) AS BIGINT) * 1000 -
             |      LAG(CAST(epoch(ts) AS BIGINT) * 1000) OVER
             |        (PARTITION BY user_id ORDER BY ts, event_id) > 1800000
             |    THEN 1 ELSE 0 END AS new_session
             |  FROM events
             |), s AS (
             |  SELECT user_id, ts, value,
             |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             |  FROM g
             |)
             |SELECT user_id,
             |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS start_s,
             |  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS end_s,
             |  COUNT(*) AS n_events,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
             |FROM s GROUP BY user_id, session_id
             |ORDER BY user_id, start_s""".stripMargin)),

    // as-of (backward) join: each purchase gets the user's most recent
    // signup at-or-before it. Implemented union+window (one shuffle) —
    // see graft.operators.AsOfJoin.
    Q("st02_asof_join",
      (s, dir) => {
        val events = Tables.load(s, dir, "events")
        val purchases = events.where(col("event_type") === "purchase")
        val signups = events.where(col("event_type") === "signup")
          .select("user_id", "ts", "event_id", "value")
        graft.operators.AsOfJoin.backward(
            purchases, signups,
            keyCols = Seq("user_id"),
            leftTs = "ts", rightTs = "ts",
            leftTiebreak = "event_id", rightTiebreak = "event_id",
            rightValueCols = Seq("value"))
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
            date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss").as("signup_ts_s"),
            col("asof_value").as("signup_value"))
          .orderBy("event_id")
      },
      Some("""WITH o AS (
             |  SELECT event_id, user_id, ts, event_type,
             |    CASE WHEN event_type = 'signup' THEN ts END AS sig_ts,
             |    CASE WHEN event_type = 'signup' THEN value END AS sig_val
             |  FROM events WHERE event_type IN ('purchase', 'signup')
             |), c AS (
             |  SELECT event_id, user_id, ts, event_type,
             |    LAST_VALUE(sig_ts IGNORE NULLS) OVER w AS m_ts,
             |    LAST_VALUE(sig_val IGNORE NULLS) OVER w AS m_val
             |  FROM o
             |  WINDOW w AS (PARTITION BY user_id
             |    ORDER BY epoch_us(ts),
             |      CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |)
             |SELECT event_id, user_id,
             |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
             |  strftime(m_ts, '%Y-%m-%d %H:%M:%S') AS signup_ts_s,
             |  m_val AS signup_value
             |FROM c WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin)),

    // bucketed point-in-interval range join (equi-join on quantized
    // buckets + residual BETWEEN — no nested-loop; see RangeJoin)
    Q("q30_range_join",
      (s, dir) => {
        import s.implicits._
        val bands = Seq(
          ("low", 0.0, 2500.0), ("mid", 2500.0, 7000.0),
          ("high", 7000.0, 100000.0), ("neg", -100000.0, 0.0))
          .toDF("band", "lo", "hi")
        graft.operators.RangeJoin.pointInInterval(
            Tables.load(s, dir, "customer").select(col("c_custkey"), col("c_acctbal")),
            bands, "c_acctbal", "lo", "hi", bucket = 2500.0)
          .select(col("c_custkey"), col("band"), col("c_acctbal"))
          .orderBy("c_custkey", "band")
      },
      Some("""SELECT c_custkey, band, c_acctbal
             |FROM customer JOIN (VALUES
             |  ('low', 0.0, 2500.0), ('mid', 2500.0, 7000.0),
             |  ('high', 7000.0, 100000.0), ('neg', -100000.0, 0.0))
             |  AS t(band, lo, hi)
             |ON c_acctbal >= lo AND c_acctbal <= hi
             |ORDER BY c_custkey, band""".stripMargin)),

    // deterministic stratified sampling: hash-based per-stratum rates.
    // Unlike sampleBy (RNG over partition order), a hash-mod rule is
    // reproducible across runs, partitionings and engines — at 100 TB
    // resumable sampling beats "random but unrepeatable". The hash is
    // Knuth multiplicative in explicit bigint arithmetic so any engine
    // computes the same sample (and it stays below 2^63: ANSI-safe).
    Q("t05_stratified_sample",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val h = pmod(pmod(col("doc_id"), lit(2147483647L)) * lit(2654435761L),
                     lit(1000003L))
        val rate = when(col("lang") === "en", 10)  // keep ~1/10 of en
          .otherwise(2)                            // ~1/2 of the rest
        docs.where(pmod(h, rate) === 0)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_sampled"))
          .orderBy("lang")
      },
      Some("""SELECT lang, COUNT(*) AS n_sampled FROM documents
             |WHERE ((doc_id % 2147483647) * 2654435761) % 1000003
             |  % (CASE WHEN lang = 'en' THEN 10 ELSE 2 END) = 0
             |GROUP BY lang ORDER BY lang""".stripMargin)),

    // deterministic train/val/test split (hash-mod assignment)
    Q("t06_train_val_split",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        docs.select(TextAnalysis.splitLabel(col("doc_id"),
            Seq("train" -> 900, "val" -> 50, "test" -> 50)).as("split"))
          .groupBy("split").agg(count(lit(1)).as("n"))
          .orderBy("split")
      },
      Some("""SELECT CASE
             |  WHEN h < 900 THEN 'train'
             |  WHEN h < 950 THEN 'val'
             |  ELSE 'test' END AS split, COUNT(*) AS n
             |FROM (SELECT ((doc_id % 2147483647) * 2654435761) % 1000 AS h
             |      FROM documents) t
             |GROUP BY 1 ORDER BY split""".stripMargin)),

    // multimodal: binary columns → stub decode → per-kind rollup
    Q("m01_multimodal_meta",
      (s, dir) => {
        implicit val sp: SparkSession = s
        val media = Multimodal.fromDocuments(Tables.load(s, dir, "documents"))
        Multimodal.featureSummary(Multimodal.decodeFeatures(media))
      },
      None)
  )
}
