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
/** Text-analysis / tokenizer / mix query entries (t01-t36). Split out of Pipeline.scala (round 13 — mechanical,
  * no behavior change); shared fixtures/oracle fragments live in
  * [[PipelineShared]].
  */
private[queries] object PipelineText {
  import PipelineShared._

  val all: Seq[Q] = Seq(

    // language ID heuristic. Oracle replicates the stopword-overlap
    // scores per profile; the CASE chain encodes greatest(struct)'s
    // tie-breaking (equal scores → later profile wins).
    Q("t01_lang_id",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        docs.select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $langPredCtesSql
             |SELECT doc_id, lang_pred
             |FROM pred ORDER BY doc_id""".stripMargin)),


    // classifier evaluation: confusion matrix of the t01 heuristic
    // against the labeled lang column, with each cell's share of its
    // actual-language row — the accuracy dashboard any classifier-
    // driven curation stage (lang filter, quality model) needs before
    // its predictions gate a 100 TB corpus. One mapper pass + one
    // map-side-combined aggregate (cells are bounded by langs²); the
    // share is an exact long/long division over a bounded window.
    Q("t31_langid_eval",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.load(s, dir, "documents")
        docs.select(col("lang").as("lang_actual"),
            TextAnalysis.langId(col("text")).as("lang_pred"))
          .groupBy("lang_actual", "lang_pred")
          .agg(count(lit(1)).as("n"))
          .withColumn("frac_of_actual",
            col("n").cast("double") /
              sum("n").over(Window.partitionBy("lang_actual"))
                .cast("double"))
          .orderBy("lang_actual", "lang_pred")
      },
      Some(s"""WITH $langPredCtesSql, cm AS (
             |  SELECT lang AS lang_actual, lang_pred, COUNT(*) AS n
             |  FROM pred GROUP BY 1, 2
             |)
             |SELECT lang_actual, lang_pred, n,
             |  CAST(n AS DOUBLE)
             |    / CAST(SUM(n) OVER (PARTITION BY lang_actual) AS DOUBLE)
             |    AS frac_of_actual
             |FROM cm ORDER BY lang_actual, lang_pred""".stripMargin)),


    // quality features + composite score. Oracle mirrors the exact
    // double-arithmetic order of TextAnalysis.qualityFeatures so the
    // values are bit-identical before r6.
    Q("t02_quality",
      (s, dir) => {
        TextAnalysis.qualityFeatures(Tables.load(s, dir, "documents"),
            "doc_id", "text")
          .withColumn("quality", r6(col("quality")))
          .withColumn("alpha_ratio", r6(col("alpha_ratio")))
          .withColumn("punct_ratio", r6(col("punct_ratio")))
          .withColumn("stopword_rate", r6(col("stopword_rate")))
          .withColumn("mean_word_len", r6(col("mean_word_len")))
          .orderBy("doc_id")
      },
      Some(s"""WITH f AS (
             |  SELECT doc_id,
             |    CAST(length(text) AS DOUBLE) AS n_chars,
             |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS n_alpha,
             |    CAST(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS DOUBLE) AS n_punct,
             |    CAST(len(list_filter(regexp_split_to_array(trim(lower(text)),
             |      '[ \\t\\n\\v\\f\\r]+'), x -> x <> '')) AS DOUBLE) AS n_tokens,
             |    CAST(len(list_intersect(
             |      list_distinct(list_filter(regexp_split_to_array(trim(lower(text)),
             |        '[ \\t\\n\\v\\f\\r]+'), x -> x <> '')),
             |      ['the','a','of','and','to','in','is','that','it','for'])) AS DOUBLE) AS stop_hits
             |  FROM documents
             |), g AS (
             |  SELECT doc_id, n_chars, n_tokens,
             |    n_alpha / greatest(n_chars, 1.0) AS alpha_ratio,
             |    n_punct / greatest(n_chars, 1.0) AS punct_ratio,
             |    stop_hits / 10.0 AS stopword_rate,
             |    n_chars / greatest(n_tokens, 1.0) AS mean_word_len
             |  FROM f
             |)
             |SELECT doc_id, n_chars, n_tokens,
             |  ${r6sql("alpha_ratio")} AS alpha_ratio,
             |  ${r6sql("punct_ratio")} AS punct_ratio,
             |  ${r6sql("stopword_rate")} AS stopword_rate,
             |  ${r6sql("mean_word_len")} AS mean_word_len,
             |  ${r6sql("least(1.0, greatest(0.0, 0.25 * least(n_tokens / 20.0, 1.0) + 0.25 * alpha_ratio + 0.25 * (1.0 - least(punct_ratio * 5.0, 1.0)) + 0.25 * least(stopword_rate * 2.0, 1.0)))")} AS quality
             |FROM g ORDER BY doc_id""".stripMargin)),


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
             |CAST(len(list_filter(regexp_split_to_array(trim(text), '[ \t\n\v\f\r]+'),
             |  x -> x <> '')) AS INT) AS n_ws_tokens,
             |CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_bpe_pieces,
             |CAST(length(text) AS INT) AS n_len
             |FROM documents ORDER BY doc_id""".stripMargin)),


    // training-mix budget allocation: per-source token counts → the
    // per-source sampling rate realizing a uniform token budget ("cap
    // every source at budget/n_sources tokens") — the planning step
    // that precedes t10/t12's weighted draws. The corpus is touched
    // by ONE map-side-combined aggregation; the global window runs
    // over the already-aggregated per-source frame (≤ |sources| rows),
    // so the no-global-window scale rule is not violated by it.
    Q("t15_mix_allocation",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.load(s, dir, "documents")
        val perSource = docs.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(TextAnalysis.wsTokenCount(col("text")).cast("long"))
              .as("n_tokens"))
        perSource
          .withColumn("rate", r6(least(lit(1.0),
            lit(100000.0) / count(lit(1)).over(Window.partitionBy()) /
              col("n_tokens"))))
          .select(col("source"), col("n_docs"), col("n_tokens"), col("rate"))
          .orderBy("source")
      },
      Some(s"""WITH t AS (
              |  SELECT source,
              |    COUNT(*) AS n_docs,
              |    CAST(SUM(len(list_filter(
              |      regexp_split_to_array(trim(text), '[ \\t\\n\\v\\f\\r]+'),
              |      x -> x <> ''))) AS BIGINT) AS n_tokens
              |  FROM documents GROUP BY source
              |)
              |SELECT source, n_docs, n_tokens,
              |  ${r6sql("LEAST(1.0, 100000.0 / (SELECT COUNT(*) FROM t) / n_tokens)")}
              |    AS rate
              |FROM t ORDER BY source""".stripMargin)),


    // temperature-scaled mix allocation (T = 2): sampling weight ∝
    // sqrt(token share) — the standard smoothing that upsamples small
    // domains without letting one giant source dominate (multilingual
    // and DoReMi-adjacent mixes). Oracle-gatable because T = 2 needs
    // only sqrt — CORRECTLY ROUNDED per IEEE 754, so cross-engine
    // bit-identical where pow/log (general T) are not — and the
    // normalization denominator is an exact INTEGER sum of
    // floor-scaled weights (a float denominator would depend on
    // engine summation order; the scaled-long sum does not — the
    // t21/s09 stance). Global windows run over the ≤|sources|
    // aggregated frame only (t15's carve-out).
    Q("t28_mix_temperature",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.load(s, dir, "documents")
        val tot = Window.partitionBy()
        docs.groupBy("source")
          .agg(sum(TextAnalysis.wsTokenCount(col("text")).cast("long"))
            .as("n_tokens"))
          .withColumn("w_temp",
            floor(sqrt(col("n_tokens").cast("double") /
              sum("n_tokens").over(tot).cast("double")) * lit(1e9))
              .cast("long"))
          .withColumn("rate", r6(least(lit(1.0),
            lit(100000.0) * (col("w_temp").cast("double") /
              sum("w_temp").over(tot).cast("double")) /
              col("n_tokens").cast("double"))))
          .select(col("source"), col("n_tokens"), col("w_temp"),
            col("rate"))
          .orderBy("source")
      },
      Some(s"""WITH t AS (
              |  SELECT source,
              |    CAST(SUM(len(list_filter(
              |      regexp_split_to_array(trim(text), '[ \\t\\n\\v\\f\\r]+'),
              |      x -> x <> ''))) AS BIGINT) AS n_tokens
              |  FROM documents GROUP BY source
              |), tw AS (
              |  SELECT source, n_tokens,
              |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE) /
              |      CAST(CAST((SELECT SUM(n_tokens) FROM t) AS BIGINT) AS DOUBLE))
              |      * 1000000000.0) AS BIGINT) AS w_temp
              |  FROM t
              |)
              |SELECT source, n_tokens, w_temp,
              |  ${r6sql("LEAST(1.0, (100000.0 * (CAST(w_temp AS DOUBLE) / CAST(CAST((SELECT SUM(w_temp) FROM tw) AS BIGINT) AS DOUBLE))) / CAST(n_tokens AS DOUBLE))")}
              |    AS rate
              |FROM tw ORDER BY source""".stripMargin)),


    // order-sensitive fingerprint → duplicate groups. The raw hash
    // value is engine-specific (xxhash64 words), so the oracle-checked
    // output is the fingerprint's *equality classes*: two docs share a
    // fingerprint iff they have the same token sequence (57-bit hash ⇒
    // collisions are ~n²/2^58, negligible). DuckDB groups by the
    // normalized token sequence itself.
    Q("t04_fingerprint",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.load(s, dir, "documents")
        val w = Window.partitionBy("fingerprint")
        docs.select(col("doc_id"),
            TextAnalysis.fingerprint64(col("text")).as("fingerprint"))
          .select(col("doc_id"),
            min("doc_id").over(w).as("fp_survivor"),
            count(lit(1)).over(w).as("fp_group_size"))
          .orderBy("doc_id")
      },
      Some("""WITH n AS (
             |  SELECT doc_id,
             |    array_to_string(list_filter(
             |      regexp_split_to_array(trim(lower(text)), '[ \t\n\v\f\r]+'), x -> x <> ''), ' ') AS norm
             |  FROM documents
             |)
             |SELECT doc_id,
             |  MIN(doc_id) OVER (PARTITION BY norm) AS fp_survivor,
             |  COUNT(*) OVER (PARTITION BY norm) AS fp_group_size
             |FROM n ORDER BY doc_id""".stripMargin)),


    // per-document top-k salient terms (tf·idf-style, rational idf so
    // both engines compute bit-identical doubles)
    Q("t07_top_terms",
      (s, dir) => {
        TextAnalysis.topTerms(Tables.load(s, dir, "documents"),
            "doc_id", "text", k = 5)
          .withColumn("score", r6(col("score")))
          .orderBy("doc_id", "term_rank")
      },
      Some(s"""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(
             |    trim(lower(text)), '[ \\t\\n\\v\\f\\r]+'), x -> x <> '')) AS term
             |  FROM documents
             |), tf AS (
             |  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
             |), dfreq AS (
             |  SELECT term, COUNT(*) AS doc_freq FROM tf GROUP BY term
             |), n AS (
             |  SELECT COUNT(*) AS n_docs FROM documents
             |), scored AS (
             |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.doc_freq,
             |    CAST(tf.tf AS DOUBLE) * (n.n_docs + 1) / (dfreq.doc_freq + 1) AS score
             |  FROM tf JOIN dfreq USING (term) CROSS JOIN n
             |), ranked AS (
             |  SELECT doc_id, term, tf, doc_freq, score,
             |    ROW_NUMBER() OVER (PARTITION BY doc_id
             |      ORDER BY score DESC, term ASC) AS term_rank
             |  FROM scored
             |)
             |SELECT doc_id, term, tf, doc_freq,
             |  ${r6sql("score")} AS score, CAST(term_rank AS INT) AS term_rank
             |FROM ranked WHERE term_rank <= 5
             |ORDER BY doc_id, term_rank""".stripMargin)),


    // canonical text-normalization pass (lower → strip non-alnum →
    // collapse spaces → drop stopwords), pure per-row expressions.
    Q("t08_normalize",
      (s, dir) => {
        TextAnalysis.normalize(Tables.load(s, dir, "documents"),
            "doc_id", "text")
          .orderBy("doc_id")
      },
      Some("""WITH f AS (
             |  SELECT doc_id, list_filter(
             |    string_split(trim(regexp_replace(regexp_replace(
             |      lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '),
             |    t -> t <> '' AND t NOT IN
             |      ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'that', 'it', 'for')) AS w
             |  FROM documents
             |)
             |SELECT doc_id,
             |  array_to_string(w, ' ') AS norm_text,
             |  CAST(len(w) AS INT) AS n_tokens,
             |  CAST(len(list_distinct(w)) AS INT) AS n_distinct
             |FROM f ORDER BY doc_id""".stripMargin)),


    // corpus-global heavy hitters: top-100 terms by frequency —
    // explode → map-side-combined groupBy → TakeOrdered (no global
    // sort); ties cut deterministically by term asc.
    Q("t09_heavy_hitters",
      (s, dir) => {
        TextAnalysis.heavyHitters(Tables.load(s, dir, "documents"),
            "text", k = 100)
          .orderBy(col("n").desc, col("term").asc)
      },
      Some("""SELECT term, COUNT(*) AS n
             |FROM (SELECT unnest(list_filter(regexp_split_to_array(
             |        trim(lower(text)), '[ \t\n\v\f\r]+'), x -> x <> '')) AS term
             |      FROM documents)
             |GROUP BY term ORDER BY n DESC, term ASC LIMIT 100""".stripMargin)),


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


    // integer-weighted sampling (best-of-w draws): curated sources
    // get weight 8, the rest 1 — the domain-reweighting primitive for
    // a training mix. Oracle replays the identical integer hashing.
    Q("t10_weighted_sample",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val w = when(col("source")
          .isin("src0", "src1", "src2", "src3", "src4"), 8).otherwise(1)
        graft.operators.Sampling.weightedSample(docs, "doc_id", w, k = 60)
          .select(col("doc_id"), col("source"), col("sample_key"))
          .orderBy("sample_key", "doc_id")
      },
      Some("""WITH keyed AS (
             |  SELECT doc_id, source,
             |    list_min([((doc_id + r * 7919) % 2147483647)
             |               * 2654435761 % 1000003
             |              for r in range(1, (CASE WHEN source IN
             |                ('src0','src1','src2','src3','src4')
             |                THEN 8 ELSE 1 END) + 1)]) AS sample_key
             |  FROM documents
             |)
             |SELECT doc_id, source, sample_key FROM keyed
             |ORDER BY sample_key, doc_id LIMIT 60""".stripMargin)),


    // weighted + stratified composed: k winners per stratum (lang),
    // weights by source — the per-stratum heap replaces the global
    // TakeOrdered (see Sampling.weightedStratifiedSample scaladoc);
    // oracle replays the identical integer hashing per stratum with a
    // per-partition row_number.
    Q("t12_weighted_stratified_sample",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val w = when(col("source")
          .isin("src0", "src1", "src2", "src3", "src4"), 8).otherwise(1)
        graft.operators.Sampling.weightedStratifiedSample(
            docs, "doc_id", "lang", w, kPerStratum = 5)
          .select(col("lang"), col("doc_id"), col("source"), col("sample_key"))
          .orderBy("lang", "sample_key", "doc_id")
      },
      Some("""WITH keyed AS (
             |  SELECT doc_id, lang, source,
             |    list_min([((doc_id + r * 7919) % 2147483647)
             |               * 2654435761 % 1000003
             |              for r in range(1, (CASE WHEN source IN
             |                ('src0','src1','src2','src3','src4')
             |                THEN 8 ELSE 1 END) + 1)]) AS sample_key
             |  FROM documents
             |), ranked AS (
             |  SELECT lang, doc_id, source, sample_key,
             |    ROW_NUMBER() OVER (PARTITION BY lang
             |      ORDER BY sample_key, doc_id) AS rn
             |  FROM keyed
             |)
             |SELECT lang, doc_id, source, sample_key FROM ranked
             |WHERE rn <= 5 ORDER BY lang, sample_key, doc_id""".stripMargin)),


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


    // repetition metrics (C4/Gopher boilerplate rules): fraction of
    // word occurrences / non-empty lines that repeat. Thresholds are
    // compared on the RAW fractions (rounding only for the emitted
    // columns), so both engines flag identically even on boundary
    // values. Tokenization parity with DuckDB is the t03-proven
    // regex class.
    Q("t11_repetition",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        TextAnalysis.repetitionMetrics(docs, "doc_id", "text")
          .select(col("doc_id"),
            r6(col("dup_word_frac")).as("dup_word_frac"),
            r6(col("dup_line_frac")).as("dup_line_frac"),
            col("flagged"))
          .orderBy("doc_id")
      },
      Some(s"""WITH m AS (
              |  SELECT doc_id,
              |    list_filter(regexp_split_to_array(trim(lower(text)),
              |      '[ \\t\\n\\v\\f\\r]+'), x -> x <> '') AS toks,
              |    list_filter([trim(l) for l in string_split(text, chr(10))],
              |      x -> x <> '') AS lns
              |  FROM documents
              |), f AS (
              |  SELECT doc_id,
              |    CASE WHEN len(toks) = 0 THEN 0.0
              |         ELSE (len(toks) - len(list_distinct(toks)))
              |              / CAST(len(toks) AS DOUBLE) END AS dwf,
              |    CASE WHEN len(lns) = 0 THEN 0.0
              |         ELSE (len(lns) - len(list_distinct(lns)))
              |              / CAST(len(lns) AS DOUBLE) END AS dlf
              |  FROM m
              |)
              |SELECT doc_id,
              |  ${r6sql("dwf")} AS dup_word_frac,
              |  ${r6sql("dlf")} AS dup_line_frac,
              |  CAST(CASE WHEN dwf > 0.3 OR dlf > 0.2 THEN 1 ELSE 0 END AS INT)
              |    AS flagged
              |FROM f ORDER BY doc_id""".stripMargin)),


    // char-trigram uniqueness: the char-level repetitiveness signal
    // word-level t11 misses. Counts are string-exact across engines;
    // the only float is the final ratio (r6-rounded).
    Q("t14_trigram_uniqueness",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val (total, distinctN, frac) = TextAnalysis.trigramStats(col("text"))
        docs.select(col("doc_id"),
            total.as("n_trigrams"),
            distinctN.as("n_distinct"),
            r6(frac).as("uniq_frac"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (
             |  SELECT doc_id, lower(text) AS t, length(text) AS n
             |  FROM documents
             |), g AS (
             |  SELECT doc_id,
             |    CASE WHEN n >= 3 THEN n - 2 ELSE 0 END AS n_trigrams,
             |    CASE WHEN n >= 3 THEN len(list_distinct(
             |      [substr(t, i, 3) for i in range(1, n - 1)]))
             |      ELSE 0 END AS n_distinct
             |  FROM t
             |)
             |SELECT doc_id,
             |  CAST(n_trigrams AS BIGINT) AS n_trigrams,
             |  CAST(n_distinct AS BIGINT) AS n_distinct,
             |  ${r6sql("CASE WHEN n_trigrams >= 1 THEN CAST(n_distinct AS DOUBLE) / n_trigrams ELSE 0 END")}
             |    AS uniq_frac
             |FROM g ORDER BY doc_id""".stripMargin)),


    // C4-style line cleaning: the corpus is single-block word soup, so
    // the query builds a structured doc per row (corpus text + a kept
    // sentence, a too-short line, a braced template line, a
    // doc-varying closer) and the operator strips the boilerplate.
    // Rules replayed verbatim in DuckDB; counts + cleaned length
    // gate the rewrite.
    Q("t16_line_cleaning",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val structured = concat_ws("\n",
          col("text"),
          lit("This is a proper kept sentence."),
          lit("Too short."),
          lit("A brace { template line with many words."),
          concat(lit("Doc "), col("doc_id").cast("string"),
            lit(" has a unique closing line!")))
        val (cleaned, nKept, nDropped) = TextAnalysis.cleanLines(structured)
        docs.select(col("doc_id"),
            nKept.as("n_kept"), nDropped.as("n_dropped"),
            length(cleaned).as("clean_len"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    text || chr(10) || 'This is a proper kept sentence.'
             |      || chr(10) || 'Too short.'
             |      || chr(10) || 'A brace { template line with many words.'
             |      || chr(10) || 'Doc ' || CAST(doc_id AS VARCHAR)
             |      || ' has a unique closing line!' AS t
             |  FROM documents
             |), k AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(t, '\r?\n'), l ->
             |      len(list_filter(regexp_split_to_array(trim(l), ' +'),
             |        w -> w <> '')) >= 3
             |      AND regexp_matches(trim(l), '[.!?"]$')
             |      AND NOT contains(lower(trim(l)), 'lorem ipsum')
             |      AND NOT contains(trim(l), '{')
             |      AND NOT contains(trim(l), '}')) AS kept,
             |    len(string_split_regex(t, '\r?\n')) AS n_lines
             |  FROM d
             |)
             |SELECT doc_id,
             |  CAST(len(kept) AS BIGINT) AS n_kept,
             |  CAST(n_lines - len(kept) AS BIGINT) AS n_dropped,
             |  CAST(length(array_to_string(kept, chr(10))) AS INT) AS clean_len
             |FROM k ORDER BY doc_id""".stripMargin)),


    // Corpus-level line dedup (CCNet/RefinedWeb): drop lines occurring
    // in >= 3 distinct docs. The word-soup corpus is single-line, so
    // each doc gets a structured tail: a corpus-wide footer (always
    // removed), a group footer shared by doc_id % 300 (removed exactly
    // when its group has >= 3 members at this SF — the threshold
    // boundary is exercised differently per scale factor), and a
    // per-doc unique closing (always kept). The original text line is
    // common only within exact-duplicate families. Oracle replays the
    // same count-distinct-docs rule on raw line strings — which also
    // cross-checks the Spark side's xxhash64 line keys (d01 stance).
    Q("t17_corpus_line_dedup",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val structured = docs.select(col("doc_id"), concat_ws("\n",
          col("text"),
          lit("All rights reserved."),
          concat(lit("Group "), (col("doc_id") % 300).cast("string"),
            lit(" footer.")),
          concat(lit("Doc "), col("doc_id").cast("string"),
            lit(" unique closing."))).as("text"))
        TextAnalysis.dedupCorpusLines(structured, "doc_id", "text", minDocs = 3)
          .select(col("doc_id"), col("n_kept"), col("n_removed"),
            length(col("text_clean")).as("clean_len"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    text || chr(10) || 'All rights reserved.'
             |      || chr(10) || 'Group ' || CAST(doc_id % 300 AS VARCHAR)
             |      || ' footer.'
             |      || chr(10) || 'Doc ' || CAST(doc_id AS VARCHAR)
             |      || ' unique closing.' AS t
             |  FROM documents
             |), l AS (
             |  SELECT doc_id, unnest(string_split_regex(t, '\r?\n')) AS line
             |  FROM d
             |), common AS (
             |  SELECT coalesce(list(line), []) AS cl FROM (
             |    SELECT line FROM l WHERE trim(line) <> ''
             |    GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 3)
             |), k AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(t, '\r?\n'),
             |      ln -> NOT list_contains(cl, ln)) AS kept,
             |    len(string_split_regex(t, '\r?\n')) AS n_lines
             |  FROM d, common
             |)
             |SELECT doc_id,
             |  CAST(len(kept) AS BIGINT) AS n_kept,
             |  CAST(n_lines - len(kept) AS BIGINT) AS n_removed,
             |  CAST(length(array_to_string(kept, chr(10))) AS INT) AS clean_len
             |FROM k ORDER BY doc_id""".stripMargin)),


    // deterministic training-order shuffle: shard + in-shard position,
    // both pure integer hashes of doc_id (no global sort — see
    // Sampling.shardAssignment). Oracle replays the identical
    // arithmetic with a per-shard ROW_NUMBER.
    Q("t18_shard_assignment",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        graft.operators.Sampling.shardAssignment(docs, "doc_id", nShards = 8)
          .select(col("doc_id"), col("shard"), col("shard_pos"))
          .orderBy("doc_id")
      },
      Some("""WITH h AS (
             |  SELECT doc_id,
             |    ((doc_id % 2147483647) * 2654435761) % 1000003 AS h1,
             |    ((doc_id % 2147483647 + 9176) * 1540483477) % 1000003 AS h2
             |  FROM documents
             |)
             |SELECT doc_id, CAST(h1 % 8 AS INT) AS shard,
             |  CAST(ROW_NUMBER() OVER (PARTITION BY h1 % 8
             |    ORDER BY h2, doc_id) AS INT) AS shard_pos
             |FROM h ORDER BY doc_id""".stripMargin)),


    // URL canonicalization for crawl curation: synthetic URLs (mixed-
    // case scheme+host, tracking params, fragment) derived from
    // doc_id, normalized by the fixed regexp chain — oracle replays
    // the identical rewrites ('g' flags mirror Spark's replace-all).
    // Per-row builtins only: a no-shuffle mapper at 100 TB.
    Q("t19_url_normalize",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val host0 = when(col("doc_id") % 3 === 0, "WWW.Example.COM")
          .when(col("doc_id") % 3 === 1, "blog.Example.com")
          .otherwise("news.site.org")
        val url = concat(lit("HTTPS://"), host0,
          lit("/Path/"), col("doc_id").cast("string"),
          lit("?utm_source=x&id="), (col("doc_id") % 7).cast("string"),
          lit("&utm_campaign=y#frag"))
        val (norm, host) = TextAnalysis.normalizeUrl(url)
        docs.select(col("doc_id"), norm.as("norm_url"), host.as("host"))
          .orderBy("doc_id")
      },
      Some("""WITH u AS (
             |  SELECT doc_id,
             |    'HTTPS://' ||
             |    CASE WHEN doc_id % 3 = 0 THEN 'WWW.Example.COM'
             |         WHEN doc_id % 3 = 1 THEN 'blog.Example.com'
             |         ELSE 'news.site.org' END ||
             |    '/Path/' || CAST(doc_id AS VARCHAR) ||
             |    '?utm_source=x&id=' || CAST(doc_id % 7 AS VARCHAR) ||
             |    '&utm_campaign=y#frag' AS url
             |  FROM documents
             |), p AS (
             |  SELECT doc_id, url,
             |    regexp_extract(url,
             |      '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1) AS rawp
             |  FROM u
             |), r AS (
             |  SELECT doc_id, lower(rawp) AS prefix,
             |    regexp_replace(substr(url, length(rawp) + 1),
             |      '#.*', '', 'g') AS nofrag
             |  FROM p
             |), sq AS (
             |  SELECT doc_id, prefix,
             |    regexp_extract(nofrag, '^[^?]*', 0) AS path,
             |    substr(nofrag,
             |      length(regexp_extract(nofrag, '^[^?]*', 0)) + 1) AS q
             |  FROM r
             |), c AS (
             |  SELECT doc_id, prefix, path,
             |    regexp_replace(
             |      regexp_replace(
             |        regexp_replace(q, '&utm_[^&]*', '', 'g'),
             |        '^\?utm_[^&]*&', '?', 'g'),
             |      '^\?utm_[^&]*', '', 'g') AS qq
             |  FROM sq
             |)
             |SELECT doc_id,
             |  prefix || path ||
             |    (CASE WHEN qq = '?' THEN '' ELSE qq END) AS norm_url,
             |  regexp_extract(prefix, '://(.*)', 1) AS host
             |FROM c ORDER BY doc_id""".stripMargin)),


    // adjacent-token-pair heavy hitters — the counting step of one
    // BPE merge round (tokenizer induction). Same tokenization as
    // t09; explode → map-side-combined count → TakeOrdered with the
    // (n desc, pair asc) total order making the LIMIT deterministic.
    Q("t20_bigram_merges",
      (s, dir) => {
        TextAnalysis.bigramMerges(
            Tables.load(s, dir, "documents"), "text", k = 50)
          .orderBy(col("n").desc, col("pair").asc)
      },
      Some("""WITH t AS (
             |  SELECT list_filter(regexp_split_to_array(trim(lower(text)),
             |    '[ \t\n\v\f\r]+'), x -> x <> '') AS w
             |  FROM documents
             |), b AS (
             |  SELECT unnest(CASE WHEN len(w) >= 2
             |    THEN [w[i] || ' ' || w[i+1] for i in range(1, len(w))]
             |    ELSE [] END) AS pair
             |  FROM t
             |)
             |SELECT pair, COUNT(*) AS n FROM b
             |GROUP BY pair ORDER BY n DESC, pair ASC LIMIT 50""".stripMargin)),


    // trained-vocabulary BPE encode (t26) + the budgeting consumers
    // that switch from bpePieceCount's regex estimate to REAL piece
    // counts (t27 mix allocation, p04 packing). The merge table is a
    // FIXED literal (both engines must replay the identical table;
    // training at query time would make the oracle depend on the
    // scale factor) and is unique-creation by construction — each
    // merged string is produced by exactly one rule, at a rank before
    // any rule that consumes it — which makes the encoder's canonical
    // min-rank loop (TextAnalysis.bpeSegment) provably identical to
    // the rank-ordered nested-replace chain the oracle replays.
    Q("t26_bpe_encode",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        TextAnalysis.bpeEncode(docs, "doc_id", "text", bpeFixedMerges)
          .select(explode(col("pieces")).as("piece"))
          .groupBy("piece").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("piece").asc)
      },
      Some(s"""WITH toks AS (
             |  SELECT unnest(list_filter(regexp_split_to_array(
             |    trim(lower(text)), '[ \\t\\n\\v\\f\\r]+'),
             |    x -> x <> '')) AS w
             |  FROM documents
             |), enc AS (
             |  SELECT ${bpeOracleEncode("w")} AS e FROM toks
             |), p AS (
             |  SELECT unnest(list_filter(string_split(e, '$bpeSep$bpeSep'),
             |    x -> x <> '')) AS piece
             |  FROM enc
             |)
             |SELECT piece, COUNT(*) AS n FROM p
             |GROUP BY piece ORDER BY n DESC, piece ASC""".stripMargin)),


    // t15's mix-allocation planning step re-run on trained-vocabulary
    // piece counts — the numbers a real training run budgets with.
    // Same single map-side-combined corpus aggregation; the encode
    // join adds one vocabulary-sized build side.
    Q("t27_mix_bpe",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.load(s, dir, "documents")
        val counts = TextAnalysis.bpeDocPieceCount(
          docs, "doc_id", "text", bpeFixedMerges)
        docs.select(col("doc_id"), col("source"))
          .join(counts, "doc_id")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_bpe_pieces").as("n_tokens"))
          .withColumn("rate", r6(least(lit(1.0),
            lit(100000.0) / count(lit(1)).over(Window.partitionBy()) /
              col("n_tokens"))))
          .select(col("source"), col("n_docs"), col("n_tokens"),
            col("rate"))
          .orderBy("source")
      },
      Some(s"""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(
             |    trim(lower(text)), '[ \\t\\n\\v\\f\\r]+'),
             |    x -> x <> '')) AS w
             |  FROM documents
             |), enc AS (
             |  SELECT doc_id, ${bpeOracleEncode("w")} AS e FROM toks
             |), cnt AS (
             |  SELECT doc_id, SUM(len(list_filter(
             |    string_split(e, '$bpeSep$bpeSep'), x -> x <> ''))) AS n
             |  FROM enc GROUP BY doc_id
             |), t AS (
             |  SELECT d.source, COUNT(*) AS n_docs,
             |    CAST(SUM(COALESCE(c.n, 0)) AS BIGINT) AS n_tokens
             |  FROM documents d LEFT JOIN cnt c ON d.doc_id = c.doc_id
             |  GROUP BY d.source
             |)
             |SELECT source, n_docs, n_tokens,
             |  ${r6sql("LEAST(1.0, 100000.0 / (SELECT COUNT(*) FROM t) / n_tokens)")}
             |    AS rate
             |FROM t ORDER BY source""".stripMargin)),


    // DSIR-style domain affinity: per-train-doc fraction of shingles
    // relatively more frequent in the target split — integer-exact by
    // cross-multiplication (no IEEE log), so the oracle replays it
    // with HUGEINT products over raw shingle strings. Same split as
    // d09/d10; totals are document frequencies summed per side.
    Q("t21_domain_affinity",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val train = docs.where(col("doc_id") % 10 =!= 0)
        val target = docs.where(col("doc_id") % 10 === 0)
        TextAnalysis.domainAffinity(train, target, "doc_id", "text",
            shingleK = 3)
          .select(col("id").as("doc_id"),
            col("n_shingles"), col("n_target_leaning"),
            r6(col("affinity")).as("affinity"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (
             |  SELECT doc_id, list_filter(
             |    regexp_split_to_array(trim(text), '[ \\t\\n\\v\\f\\r]+'),
             |    x -> x <> '') AS w
             |  FROM documents
             |), sh AS (
             |  SELECT doc_id, CASE WHEN len(w) >= 3
             |    THEN list_distinct([array_to_string(w[i:i+2], ' ')
             |                        for i in range(1, len(w) - 1)])
             |    ELSE [array_to_string(w, ' ')] END AS s
             |  FROM t
             |), occ AS (
             |  SELECT doc_id, unnest(s) AS g FROM sh
             |), ct AS (
             |  SELECT g, COUNT(*) AS c FROM occ WHERE doc_id % 10 = 0 GROUP BY g
             |), cs AS (
             |  SELECT g, COUNT(*) AS c FROM occ WHERE doc_id % 10 <> 0 GROUP BY g
             |), tot AS (
             |  SELECT
             |    (SELECT COUNT(*) FROM occ WHERE doc_id % 10 = 0) AS nt,
             |    (SELECT COUNT(*) FROM occ WHERE doc_id % 10 <> 0) AS ns
             |), lean AS (
             |  SELECT coalesce(ct.g, cs.g) AS g,
             |    CASE WHEN CAST(coalesce(ct.c, 0) AS HUGEINT) * ns
             |            > CAST(coalesce(cs.c, 0) AS HUGEINT) * nt
             |         THEN 1 ELSE 0 END AS lt
             |  FROM ct FULL OUTER JOIN cs ON ct.g = cs.g, tot
             |), m AS (
             |  SELECT o.doc_id,
             |    COUNT(*) AS n_shingles,
             |    SUM(l.lt) AS n_target_leaning
             |  FROM occ o JOIN lean l ON o.g = l.g
             |  WHERE o.doc_id % 10 <> 0
             |  GROUP BY o.doc_id
             |)
             |SELECT doc_id,
             |  CAST(n_shingles AS BIGINT) AS n_shingles,
             |  CAST(n_target_leaning AS BIGINT) AS n_target_leaning,
             |  ${r6sql("CAST(n_target_leaning AS DOUBLE) / n_shingles")}
             |    AS affinity
             |FROM m ORDER BY doc_id""".stripMargin)),


    // DSIR importance RESAMPLING — t21's affinity actually driving
    // t10's weighted draw, the full select-by-target-domain loop:
    // weight = 1 + ⌊8 · n_target_leaning / n_shingles⌋ ∈ [1, 9] in
    // EXACT integer arithmetic (div, never the double affinity — the
    // weight an engine computes must be bit-identical for the draw to
    // replay), then best-of-w integer draws, global top-60. Docs with
    // zero tokens carry no shingles and sit out the draw (no weight
    // is the correct DSIR semantics for an empty doc). Scale shape:
    // t21's count-table joins + ONE TakeOrdered — no new shuffle.
    Q("t32_dsir_resample",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val train = docs.where(col("doc_id") % 10 =!= 0)
        val target = docs.where(col("doc_id") % 10 === 0)
        val weighted = TextAnalysis.domainAffinity(
            train, target, "doc_id", "text", shingleK = 3)
          .select(col("id").as("doc_id"),
            expr("1L + (n_target_leaning * 8L) div n_shingles").as("w"))
        graft.operators.Sampling.weightedSample(
            weighted, "doc_id", col("w"), k = 60)
          .select(col("doc_id"), col("w"), col("sample_key"))
          .orderBy("sample_key", "doc_id")
      },
      Some(s"""WITH t AS (
             |  SELECT doc_id, list_filter(
             |    regexp_split_to_array(trim(text), '[ \\t\\n\\v\\f\\r]+'),
             |    x -> x <> '') AS w
             |  FROM documents
             |), sh AS (
             |  SELECT doc_id, CASE WHEN len(w) >= 3
             |    THEN list_distinct([array_to_string(w[i:i+2], ' ')
             |                        for i in range(1, len(w) - 1)])
             |    ELSE [array_to_string(w, ' ')] END AS s
             |  FROM t
             |), occ AS (
             |  SELECT doc_id, unnest(s) AS g FROM sh
             |), ct AS (
             |  SELECT g, COUNT(*) AS c FROM occ WHERE doc_id % 10 = 0 GROUP BY g
             |), cs AS (
             |  SELECT g, COUNT(*) AS c FROM occ WHERE doc_id % 10 <> 0 GROUP BY g
             |), tot AS (
             |  SELECT
             |    (SELECT COUNT(*) FROM occ WHERE doc_id % 10 = 0) AS nt,
             |    (SELECT COUNT(*) FROM occ WHERE doc_id % 10 <> 0) AS ns
             |), lean AS (
             |  SELECT coalesce(ct.g, cs.g) AS g,
             |    CASE WHEN CAST(coalesce(ct.c, 0) AS HUGEINT) * ns
             |            > CAST(coalesce(cs.c, 0) AS HUGEINT) * nt
             |         THEN 1 ELSE 0 END AS lt
             |  FROM ct FULL OUTER JOIN cs ON ct.g = cs.g, tot
             |), m AS (
             |  SELECT o.doc_id,
             |    COUNT(*) AS n_shingles,
             |    SUM(l.lt) AS n_target_leaning
             |  FROM occ o JOIN lean l ON o.g = l.g
             |  WHERE o.doc_id % 10 <> 0
             |  GROUP BY o.doc_id
             |), wgt AS (
             |  SELECT doc_id,
             |    CAST(1 + (n_target_leaning * 8) // n_shingles AS BIGINT)
             |      AS w
             |  FROM m
             |), keyed AS (
             |  SELECT doc_id, w,
             |    list_min([((doc_id + r * 7919) % 2147483647)
             |               * 2654435761 % 1000003
             |              for r in range(1, w + 1)]) AS sample_key
             |  FROM wgt
             |)
             |SELECT doc_id, w, sample_key FROM keyed
             |ORDER BY sample_key, doc_id LIMIT 60""".stripMargin)),


    // curriculum ordering: phase from FIXED bands on the
    // engine-reproducible quality score (best band = phase 0, trained
    // first; no window, no global sort), shard + within-(phase,shard)
    // position from t18's decorrelated hashes — the layout a
    // curriculum-learning run reads (phases in order, shards in
    // parallel). Only window partitions by (phase, shard): the
    // per-shard-file sort a corpus writer pays anyway.
    Q("t33_curriculum_order",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        graft.operators.Sampling.curriculumOrder(
            docs.select(col("doc_id"), col("text")), "doc_id",
            TextAnalysis.qualityScore(col("text")), nShards = 4)
          .select(col("doc_id"), col("phase"), col("shard"), col("seq"))
          .orderBy("phase", "shard", "seq")
      },
      Some(s"""WITH f AS (
             |  SELECT doc_id,
             |    CAST(length(text) AS DOUBLE) AS n_chars,
             |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS n_alpha,
             |    CAST(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS DOUBLE) AS n_punct,
             |    list_filter(regexp_split_to_array(trim(lower(text)),
             |      '[ \\t\\n\\v\\f\\r]+'), x -> x <> '') AS toks
             |  FROM documents
             |), g AS (
             |  SELECT doc_id,
             |    least(1.0, greatest(0.0,
             |      0.25 * least(len(toks) / 20.0, 1.0) +
             |      0.25 * (n_alpha / greatest(n_chars, 1.0)) +
             |      0.25 * (1.0 - least((n_punct / greatest(n_chars, 1.0)) * 5.0, 1.0)) +
             |      0.25 * least((len(list_intersect(list_distinct(toks),
             |        ['the','a','of','and','to','in','is','that','it','for'])) / 10.0)
             |        * 2.0, 1.0))) AS qual
             |  FROM f
             |), p AS (
             |  SELECT doc_id,
             |    CASE WHEN qual >= 0.75 THEN 0
             |         WHEN qual >= 0.5 THEN 1
             |         WHEN qual >= 0.25 THEN 2
             |         ELSE 3 END AS phase,
             |    CAST(((doc_id % 2147483647) * 2654435761) % 1000003 % 4
             |      AS INT) AS shard,
             |    ((doc_id % 2147483647) + 9176) * 1540483477 % 1000003
             |      AS ord
             |  FROM g
             |)
             |SELECT doc_id, phase, shard,
             |  CAST(ROW_NUMBER() OVER (PARTITION BY phase, shard
             |    ORDER BY ord, doc_id) AS INT) AS seq
             |FROM p ORDER BY phase, shard, seq""".stripMargin)),


    // Unigram-LM (SentencePiece) encode with a FIXED dominance table:
    // multi pieces {qu, th, er} can never overlap an occurrence of any
    // table piece (no suffix of one is a prefix of another, incl.
    // themselves), and each scores -1 vs ≥ -12 for any single-piece
    // tiling of its span, so the Viterbi optimum is exactly "every
    // multi-piece occurrence + singles elsewhere" — which reduces the
    // piece count to codepoint arithmetic DuckDB replays with
    // length/replace (the s19 stance: a fixed artifact oracle-gates
    // the plumbing — posexplode, distinct-word Viterbi kernel, join
    // back, empty-doc restore — while the trainer itself is spec-gated
    // because EM logprobs are transcendental, SURVEY §5). Unknown
    // codepoints cost the UNK penalty but still count 1 piece each, so
    // the arithmetic needs no alphabet assumption. Scale shape: one
    // posexplode + vocabulary-sized segmentation + hash join — the
    // t26/bpeEncode class.
    Q("t34_unigram_encode",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        TextAnalysis.unigramDocPieceCount(
            docs.select(col("doc_id"), col("text")), "doc_id", "text",
            unigramFixedTable)
          .orderBy("doc_id")
      },
      Some("""WITH w AS (
             |  SELECT doc_id,
             |    unnest(list_filter(regexp_split_to_array(trim(lower(text)),
             |      '[ \t\n\v\f\r]+'), x -> x <> '')) AS w
             |  FROM documents
             |), c AS (
             |  SELECT doc_id,
             |    sum(length(w)
             |      - (length(w) - length(replace(w, 'qu', ''))) // 2
             |      - (length(w) - length(replace(w, 'th', ''))) // 2
             |      - (length(w) - length(replace(w, 'er', ''))) // 2
             |    ) AS n
             |  FROM w GROUP BY doc_id
             |)
             |SELECT d.doc_id,
             |  CAST(coalesce(c.n, 0) AS BIGINT) AS n_unigram_pieces
             |FROM documents d LEFT JOIN c ON d.doc_id = c.doc_id
             |ORDER BY d.doc_id""".stripMargin)),


    // t15's mix-allocation planning step on UNIGRAM piece counts —
    // t27's twin for the SentencePiece family (round 11): same
    // single map-side-combined aggregation over t34's oracle-gated
    // per-doc counts; the rate column is what a sampling run budgets
    // with when the tokenizer is unigram-LM rather than BPE.
    Q("t35_mix_unigram",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.load(s, dir, "documents")
        val counts = TextAnalysis.unigramDocPieceCount(
          docs.select(col("doc_id"), col("text")), "doc_id", "text",
          unigramFixedTable)
        docs.select(col("doc_id"), col("source"))
          .join(counts, "doc_id")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_unigram_pieces").as("n_tokens"))
          .withColumn("rate", r6(least(lit(1.0),
            lit(100000.0) / count(lit(1)).over(Window.partitionBy()) /
              col("n_tokens"))))
          .select(col("source"), col("n_docs"), col("n_tokens"),
            col("rate"))
          .orderBy("source")
      },
      Some("""WITH w AS (
             |  SELECT doc_id,
             |    unnest(list_filter(regexp_split_to_array(trim(lower(text)),
             |      '[ \t\n\v\f\r]+'), x -> x <> '')) AS w
             |  FROM documents
             |), c AS (
             |  SELECT doc_id,
             |    sum(length(w)
             |      - (length(w) - length(replace(w, 'qu', ''))) // 2
             |      - (length(w) - length(replace(w, 'th', ''))) // 2
             |      - (length(w) - length(replace(w, 'er', ''))) // 2
             |    ) AS n
             |  FROM w GROUP BY doc_id
             |), t AS (
             |  SELECT d.source, COUNT(*) AS n_docs,
             |    CAST(SUM(COALESCE(c.n, 0)) AS BIGINT) AS n_tokens
             |  FROM documents d LEFT JOIN c ON d.doc_id = c.doc_id
             |  GROUP BY d.source
             |)
             |SELECT source, n_docs, n_tokens,
             |  FLOOR((LEAST(1.0, 100000.0 / (SELECT COUNT(*) FROM t)
             |    / n_tokens)) * 1000000 + 0.5) / 1000000 AS rate
             |FROM t ORDER BY source""".stripMargin)),


    // t30's vocabulary-health report on the UNIGRAM encoder — the
    // fertility / whole-word-rate / chars-per-piece table a tokenizer
    // owner reads before committing a SentencePiece vocab (round 11).
    // One posexplode + per-DISTINCT-word Viterbi + hash join, then a
    // sources-sized rollup; the oracle replays the t34 dominance
    // count per word instead of per document.
    Q("t36_unigram_coverage",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val enc = TextAnalysis.unigramEncode(
          docs.select(col("doc_id"), col("text")), "doc_id", "text",
          unigramFixedTable)
        docs.select(col("doc_id"), col("source"))
          .join(enc, "doc_id")
          .groupBy("source")
          .agg(count(lit(1)).as("n_words"),
            sum("n_pieces").as("n_pieces"),
            sum(when(col("n_pieces") === 1, 1L).otherwise(0L))
              .as("n_whole"),
            sum(length(col("word")).cast("long")).as("n_chars"))
          .select(col("source"), col("n_words"), col("n_pieces"),
            col("n_whole"),
            (col("n_pieces").cast("double") / col("n_words").cast("double"))
              .as("fertility"),
            (col("n_whole").cast("double") / col("n_words").cast("double"))
              .as("whole_word_rate"),
            (col("n_chars").cast("double") / col("n_pieces").cast("double"))
              .as("chars_per_piece"))
          .orderBy("source")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    unnest(list_filter(regexp_split_to_array(trim(lower(text)),
             |      '[ \t\n\v\f\r]+'), x -> x <> '')) AS w
             |  FROM documents
             |), p AS (
             |  SELECT doc_id, w,
             |    length(w)
             |      - (length(w) - length(replace(w, 'qu', ''))) // 2
             |      - (length(w) - length(replace(w, 'th', ''))) // 2
             |      - (length(w) - length(replace(w, 'er', ''))) // 2
             |    AS np
             |  FROM toks
             |), g AS (
             |  SELECT d.source, COUNT(*) AS n_words,
             |    CAST(SUM(np) AS BIGINT) AS n_pieces,
             |    CAST(SUM(CASE WHEN np = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_whole,
             |    CAST(SUM(length(w)) AS BIGINT) AS n_chars
             |  FROM p JOIN documents d USING (doc_id)
             |  GROUP BY d.source
             |)
             |SELECT source, n_words, n_pieces, n_whole,
             |  CAST(n_pieces AS DOUBLE) / CAST(n_words AS DOUBLE)
             |    AS fertility,
             |  CAST(n_whole AS DOUBLE) / CAST(n_words AS DOUBLE)
             |    AS whole_word_rate,
             |  CAST(n_chars AS DOUBLE) / CAST(n_pieces AS DOUBLE)
             |    AS chars_per_piece
             |FROM g ORDER BY source""".stripMargin)),


    // PII redaction: the corpus itself is PII-free word soup, so each
    // doc gets deterministic synthetic PII appended (email, dotted
    // quad, 16-digit card, phone — all derived from doc_id), the
    // operator scrubs it, and the redaction-tag counts + redacted
    // length are compared. Patterns live in the Java-regex ∩ RE2
    // common subset, so DuckDB replays the identical rewrite chain —
    // the whole pass is oracle-GATED, not spot-checked. Per-row
    // builtins only: a no-shuffle mapper stage at 100 TB.
    Q("t13_pii_redaction",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val dirty = concat(col("text"),
          lit(" contact u"), col("doc_id").cast("string"),
          lit("@ex.com ip 10.0."), (col("doc_id") % 256).cast("string"),
          lit(".7 card 4111111111111111 tel 415-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
        val red = TextAnalysis.redactPii(dirty)
        docs.select(col("doc_id"),
          (size(split(red, "<EMAIL>", -1)) - 1).as("n_email"),
          (size(split(red, "<IP>", -1)) - 1).as("n_ip"),
          (size(split(red, "<PHONE>", -1)) - 1).as("n_phone"),
          (size(split(red, "<NUM>", -1)) - 1).as("n_num"),
          length(red).as("red_len"))
          .orderBy("doc_id")
      },
      Some("""WITH dirty AS (
             |  SELECT doc_id,
             |    text || ' contact u' || CAST(doc_id AS VARCHAR) ||
             |    '@ex.com ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) ||
             |    '.7 card 4111111111111111 tel 415-555-' ||
             |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
             |  FROM documents
             |), red AS (
             |  SELECT doc_id,
             |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
             |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             |      '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g'),
             |      '\b\d{12,19}\b', '<NUM>', 'g') AS r
             |  FROM dirty
             |)
             |SELECT doc_id,
             |  CAST(len(string_split(r, '<EMAIL>')) - 1 AS INT) AS n_email,
             |  CAST(len(string_split(r, '<IP>')) - 1 AS INT) AS n_ip,
             |  CAST(len(string_split(r, '<PHONE>')) - 1 AS INT) AS n_phone,
             |  CAST(len(string_split(r, '<NUM>')) - 1 AS INT) AS n_num,
             |  CAST(length(r) AS INT) AS red_len
             |FROM red ORDER BY doc_id""".stripMargin)),


    // collocation mining: top-50 bigrams by lift (the monotone core of
    // PMI — ranking by lift IS ranking by PMI, so the cross-engine-
    // unreproducible ln never gets computed; t21's stance). Unigrams
    // and bigrams ride ONE explode; all counts exact longs; the lift
    // ratio is a fixed IEEE cast/mul/div sequence.
    Q("t22_collocations",
      (s, dir) => {
        TextAnalysis.collocations(Tables.load(s, dir, "documents"),
            "text", k = 50, minCount = 2)
          .orderBy(col("lift").desc, col("pair").asc)
      },
      Some("""WITH t AS (
             |  SELECT list_filter(regexp_split_to_array(trim(lower(text)),
             |    '[ \t\n\v\f\r]+'), x -> x <> '') AS w
             |  FROM documents
             |), uc AS (
             |  SELECT g, COUNT(*) AS c
             |  FROM (SELECT unnest(w) AS g FROM t) GROUP BY g
             |), bc AS (
             |  SELECT pair, COUNT(*) AS c
             |  FROM (SELECT unnest(CASE WHEN len(w) >= 2
             |    THEN [w[i] || ' ' || w[i+1] for i in range(1, len(w))]
             |    ELSE [] END) AS pair FROM t)
             |  GROUP BY pair HAVING COUNT(*) >= 2
             |), tot AS (
             |  SELECT coalesce(SUM(c), 0) AS n_total FROM uc
             |)
             |SELECT bc.pair, bc.c AS n_pair, u1.c AS n_w1, u2.c AS n_w2,
             |  (CAST(bc.c AS DOUBLE) * CAST(n_total AS DOUBLE)) /
             |    (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)) AS lift
             |FROM bc
             |JOIN uc u1 ON string_split(bc.pair, ' ')[1] = u1.g
             |JOIN uc u2 ON string_split(bc.pair, ' ')[2] = u2.g, tot
             |ORDER BY lift DESC, pair ASC LIMIT 50""".stripMargin)),


    // leakage-safe train/val/test split: t06's hash-mod assignment
    // applied to the GROUP representative (min doc_id per canonical
    // URL), so near-identical re-crawls of one page can never straddle
    // train and eval — the group-aware splitting every leakage-
    // conscious pipeline needs (splitting on the raw doc id leaks
    // t19-class URL duplicates across the boundary). Same synthetic
    // colliding URLs as c02.
    Q("t25_group_split",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.load(s, dir, "documents")
        val host0 = when(col("doc_id") % 3 === 0, "WWW.Example.COM")
          .when(col("doc_id") % 3 === 1, "blog.Example.com")
          .otherwise("news.site.org")
        val url = concat(lit("HTTPS://"), host0,
          lit("/page/"), (col("doc_id") % 50).cast("string"),
          lit("?utm_source=s"), (col("doc_id") % 7).cast("string"),
          lit("&ref=r"), (col("doc_id") % 4).cast("string"),
          lit("&utm_campaign=c"), col("doc_id").cast("string"))
        val (norm, _) = TextAnalysis.normalizeUrl(url)
        docs.select(col("doc_id"), norm.as("norm_url"))
          .withColumn("rep_id", min("doc_id").over(
            Window.partitionBy(xxhash64(col("norm_url")))))
          .select(col("doc_id"), col("norm_url"),
            TextAnalysis.splitLabel(col("rep_id"),
              Seq("train" -> 900, "val" -> 50, "test" -> 50)).as("split"))
          .orderBy("doc_id")
      },
      Some("""WITH u AS (
             |  SELECT doc_id,
             |    'HTTPS://' ||
             |    CASE WHEN doc_id % 3 = 0 THEN 'WWW.Example.COM'
             |         WHEN doc_id % 3 = 1 THEN 'blog.Example.com'
             |         ELSE 'news.site.org' END ||
             |    '/page/' || CAST(doc_id % 50 AS VARCHAR) ||
             |    '?utm_source=s' || CAST(doc_id % 7 AS VARCHAR) ||
             |    '&ref=r' || CAST(doc_id % 4 AS VARCHAR) ||
             |    '&utm_campaign=c' || CAST(doc_id AS VARCHAR) AS url
             |  FROM documents
             |), p AS (
             |  SELECT doc_id, url,
             |    regexp_extract(url,
             |      '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1) AS rawp
             |  FROM u
             |), r AS (
             |  SELECT doc_id, lower(rawp) AS prefix,
             |    regexp_replace(substr(url, length(rawp) + 1),
             |      '#.*', '', 'g') AS nofrag
             |  FROM p
             |), sq AS (
             |  SELECT doc_id, prefix,
             |    regexp_extract(nofrag, '^[^?]*', 0) AS path,
             |    substr(nofrag,
             |      length(regexp_extract(nofrag, '^[^?]*', 0)) + 1) AS q
             |  FROM r
             |), c AS (
             |  SELECT doc_id, prefix, path,
             |    regexp_replace(
             |      regexp_replace(
             |        regexp_replace(q, '&utm_[^&]*', '', 'g'),
             |        '^\?utm_[^&]*&', '?', 'g'),
             |      '^\?utm_[^&]*', '', 'g') AS qq
             |  FROM sq
             |), n AS (
             |  SELECT doc_id,
             |    prefix || path ||
             |      (CASE WHEN qq = '?' THEN '' ELSE qq END) AS norm_url
             |  FROM c
             |), g AS (
             |  SELECT doc_id, norm_url,
             |    MIN(doc_id) OVER (PARTITION BY norm_url) AS rep_id
             |  FROM n
             |)
             |SELECT doc_id, norm_url,
             |  CASE WHEN h < 900 THEN 'train'
             |       WHEN h < 950 THEN 'val'
             |       ELSE 'test' END AS split
             |FROM (SELECT doc_id, norm_url,
             |        ((rep_id % 2147483647) * 2654435761) % 1000 AS h
             |      FROM g) t
             |ORDER BY doc_id""".stripMargin)),


    // per-source quality quantiles — the calibration table quality
    // thresholds (c01's 0.75) are read off. DISCRETE quantiles by
    // explicit row_number selection at ceil(p·n): interpolating
    // percentile_cont on arbitrary doubles risks cross-engine ulp
    // drift (a + (b−a)·d is not pinned to one op order across
    // engines); picking an actual member value is exact. Ties in the
    // quality sort are totalized by doc_id.
    Q("t24_quality_quantiles",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.load(s, dir, "documents")
        val q = docs.select(col("source"), col("doc_id"),
          r6(TextAnalysis.qualityScore(col("text"))).as("qual"))
        val w = Window.partitionBy("source")
        val ranked = q
          .withColumn("rn", row_number().over(
            w.orderBy(col("qual"), col("doc_id"))))
          .withColumn("cnt", count(lit(1)).over(w))
        ranked.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            max(when(col("rn") === ceil(col("cnt") * lit(0.5)),
              col("qual"))).as("q50"),
            max(when(col("rn") === ceil(col("cnt") * lit(0.9)),
              col("qual"))).as("q90"))
          .orderBy("source")
      },
      Some(s"""WITH $qualityCtesSql, r AS (
             |  SELECT source, ${r6sql("qual")} AS qual,
             |    ROW_NUMBER() OVER (PARTITION BY source
             |      ORDER BY ${r6sql("qual")}, doc_id) AS rn,
             |    COUNT(*) OVER (PARTITION BY source) AS cnt
             |  FROM q
             |)
             |SELECT source, COUNT(*) AS n_docs,
             |  MAX(CASE WHEN rn = CEIL(cnt * 0.5) THEN qual END) AS q50,
             |  MAX(CASE WHEN rn = CEIL(cnt * 0.9) THEN qual END) AS q90
             |FROM r GROUP BY source ORDER BY source""".stripMargin)),


    // Zipf frequency spectrum: how many terms occur exactly n times —
    // the corpus/tokenizer health diagnostic (hapax mass, tail shape).
    // Corpus-sized stages run once; the spectrum itself is tiny.
    Q("t23_freq_spectrum",
      (s, dir) => {
        TextAnalysis.frequencySpectrum(
            Tables.load(s, dir, "documents"), "text")
          .orderBy("freq")
      },
      Some("""WITH tc AS (
             |  SELECT term, COUNT(*) AS freq FROM (
             |    SELECT unnest(list_filter(regexp_split_to_array(
             |      trim(lower(text)), '[ \t\n\v\f\r]+'), x -> x <> '')) AS term
             |    FROM documents)
             |  GROUP BY term
             |), sp AS (
             |  SELECT freq, COUNT(*) AS n_terms FROM tc GROUP BY freq
             |), v AS (
             |  SELECT CAST(coalesce(SUM(n_terms), 0) AS BIGINT) AS vocab_size
             |  FROM sp
             |)
             |SELECT freq, n_terms, vocab_size,
             |  CAST(n_terms AS DOUBLE) / CAST(vocab_size AS DOUBLE)
             |    AS vocab_frac
             |FROM sp, v ORDER BY freq""".stripMargin)),


    // bigram-LM perplexity (the CCNet filter): train an add-one-
    // smoothed bigram LM on the %10≠0 split, score EVERY doc. The
    // oracle-compared value is lp_micro — each token's ln p quantized
    // to micro-nats BEFORE summing, so the per-doc sum is an exact
    // order-independent long (raw double Σ ln p would be partition-
    // order-dependent); ppl is one fixed exp/div sequence of it. The
    // only cross-engine freedom is ln's 1-ulp band at a rounding
    // boundary — LmPerplexitySpec measures the actual margin.
    Q("t29_lm_perplexity",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val lm = TextAnalysis.bigramLmTrain(
          docs.where(col("doc_id") % 10 =!= 0), "text")
        TextAnalysis.bigramLmPerplexity(lm, docs, "doc_id", "text")
          .select(col("doc_id"), col("n_tokens"), col("lp_micro"),
            r6(col("ppl")).as("ppl"))
          .orderBy("doc_id")
      },
      Some(s"""WITH tr AS (
             |  SELECT ['<s>'] || list_filter(regexp_split_to_array(
             |    trim(lower(text)), '[ \\t\\n\\v\\f\\r]+'), x -> x <> '') AS t
             |  FROM documents WHERE doc_id % 10 <> 0
             |), tb AS (
             |  SELECT u.p AS prev, u.c AS cur, COUNT(*) AS c_bi FROM (
             |    SELECT unnest([{'p': t[i], 'c': t[i+1]}
             |                   for i in range(1, len(t))]) AS u FROM tr)
             |  GROUP BY 1, 2
             |), ctx AS (
             |  SELECT prev, SUM(c_bi) AS c_ctx FROM tb GROUP BY prev
             |), v AS (
             |  SELECT COUNT(DISTINCT cur) AS v FROM tb
             |), sc AS (
             |  SELECT doc_id, ['<s>'] || list_filter(regexp_split_to_array(
             |    trim(lower(text)), '[ \\t\\n\\v\\f\\r]+'), x -> x <> '') AS t
             |  FROM documents
             |), sbg AS (
             |  SELECT doc_id, u.p AS prev, u.c AS cur FROM (
             |    SELECT doc_id, unnest([{'p': t[i], 'c': t[i+1]}
             |                           for i in range(1, len(t))]) AS u
             |    FROM sc)
             |), lq AS (
             |  SELECT doc_id,
             |    CAST(floor(ln(CAST(coalesce(c_bi, 0) + 1 AS DOUBLE)
             |      / CAST(coalesce(c_ctx, 0) + v AS DOUBLE))
             |      * 1000000 + 0.5) AS BIGINT) AS lq
             |  FROM sbg LEFT JOIN tb USING (prev, cur)
             |  LEFT JOIN ctx USING (prev), v
             |)
             |SELECT doc_id, COUNT(*) AS n_tokens,
             |  CAST(SUM(lq) AS BIGINT) AS lp_micro,
             |  ${r6sql("exp(-(CAST(SUM(lq) AS DOUBLE) / 1000000) / COUNT(*))")}
             |    AS ppl
             |FROM lq GROUP BY doc_id ORDER BY doc_id""".stripMargin)),


    // tokenizer health per source: fertility (pieces per word),
    // whole-word rate (occurrences the vocabulary covers in ONE
    // piece), chars per piece (compression) — the dashboard a
    // tokenizer/vocab owner watches before a training run budgets
    // with its counts. One encode join (t26's vocabulary-sized build
    // side), one map-side-combined aggregate; the ratios are single
    // divisions of exact longs (bit-identical cross-engine, no r6).
    Q("t30_vocab_coverage",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val enc = TextAnalysis.bpeEncode(docs, "doc_id", "text",
          bpeFixedMerges)
        docs.select(col("doc_id"), col("source"))
          .join(enc, "doc_id")
          .groupBy("source")
          .agg(count(lit(1)).as("n_words"),
            sum("n_pieces").as("n_pieces"),
            sum(when(col("n_pieces") === 1, 1L).otherwise(0L))
              .as("n_whole"),
            sum(length(col("word")).cast("long")).as("n_chars"))
          .select(col("source"), col("n_words"), col("n_pieces"),
            col("n_whole"),
            (col("n_pieces").cast("double") / col("n_words").cast("double"))
              .as("fertility"),
            (col("n_whole").cast("double") / col("n_words").cast("double"))
              .as("whole_word_rate"),
            (col("n_chars").cast("double") / col("n_pieces").cast("double"))
              .as("chars_per_piece"))
          .orderBy("source")
      },
      Some(s"""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(
             |    trim(lower(text)), '[ \\t\\n\\v\\f\\r]+'),
             |    x -> x <> '')) AS w
             |  FROM documents
             |), p AS (
             |  SELECT doc_id, w, len(list_filter(string_split(
             |    ${bpeOracleEncode("w")}, '$bpeSep$bpeSep'),
             |    x -> x <> '')) AS np
             |  FROM toks
             |), g AS (
             |  SELECT d.source, COUNT(*) AS n_words,
             |    CAST(SUM(np) AS BIGINT) AS n_pieces,
             |    CAST(SUM(CASE WHEN np = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_whole,
             |    CAST(SUM(length(w)) AS BIGINT) AS n_chars
             |  FROM p JOIN documents d USING (doc_id)
             |  GROUP BY d.source
             |)
             |SELECT source, n_words, n_pieces, n_whole,
             |  CAST(n_pieces AS DOUBLE) / CAST(n_words AS DOUBLE)
             |    AS fertility,
             |  CAST(n_whole AS DOUBLE) / CAST(n_words AS DOUBLE)
             |    AS whole_word_rate,
             |  CAST(n_chars AS DOUBLE) / CAST(n_pieces AS DOUBLE)
             |    AS chars_per_piece
             |FROM g ORDER BY source""".stripMargin)),
  )
}
