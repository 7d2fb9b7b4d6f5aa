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
/** Deduplication + decontamination query entries (d01-d15). Split out of Pipeline.scala (round 13 — mechanical,
  * no behavior change); shared fixtures/oracle fragments live in
  * [[PipelineShared]].
  */
private[queries] object PipelineDedup {
  import PipelineShared._

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


    // MinHash + LSH banding + exact-Jaccard verify. Oracle: brute-force
    // word-3-shingle Jaccard over all pairs — valid because the verify
    // pass makes the operator's output exactly "pairs with Jaccard ≥
    // threshold among LSH candidates", and at 128 hashes / 16 bands the
    // planted duplicates' collision probability is ≈1 (the DedupSpec
    // truth-set test pins recall = 100% on this corpus).
    // maxBucketSize = 8 keeps the production skew guard ACTIVE in the
    // oracle-checked plan (bucket counting + semi-join execute) while
    // provably changing nothing: the corpus' largest band bucket is 4
    // at every test SF (measured sf0.001/0.01/0.1), so no bucket is
    // dropped and the brute-force oracle stays valid. LshReuseSpec
    // pins the dropping behavior itself on a saturated corpus.
    Q("d02_dedup_minhash",
      (s, dir) => {
        Dedup.minhashDuplicates(Tables.load(s, dir, "documents"),
            "doc_id", "text", shingleK = 3, numHashes = 128, bands = 16,
            threshold = 0.5, maxBucketSize = 8)
          .select(col("id_a"), col("id_b"),
                  r6(col("jaccard")).as("jaccard"))
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH t AS (
             |  SELECT doc_id, list_filter(
             |    regexp_split_to_array(trim(text), '[ \\t\\n\\v\\f\\r]+'), x -> x <> '') AS w
             |  FROM documents
             |), sh AS (
             |  SELECT doc_id, CASE WHEN len(w) >= 3
             |    THEN list_distinct([array_to_string(w[i:i+2], ' ')
             |                        for i in range(1, len(w) - 1)])
             |    ELSE [array_to_string(w, ' ')] END AS s
             |  FROM t
             |)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  ${r6sql("CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(a.s || b.s))")} AS jaccard
             |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             |  / len(list_distinct(a.s || b.s)) >= 0.5
             |ORDER BY id_a, id_b""".stripMargin)),


    // SimHash + pigeonhole hamming join; oracle replays the whole
    // sketch pipeline in HUGEINT arithmetic (see d03OracleSql)
    Q("d03_dedup_simhash",
      (s, dir) => {
        // radius 10: the synthetic docs are short (~30 tokens), so the
        // bigram sketch is noisy — see simhashDuplicates scale note.
        Dedup.simhashDuplicates(Tables.load(s, dir, "documents"),
            "doc_id", "text", maxHamming = 10)
          .orderBy("id_a", "id_b")
      },
      Some(d03OracleSql)),


    // image perceptual-hash near-dup (the d02-equivalent for the image
    // side of a multimodal corpus): dHash over the decoded 9×8
    // grayscale, pigeonhole hamming join. Synthetic payloads take the
    // stub grid (codepoint resample — the m01 stance: codec faked,
    // pipeline real), which is what makes the query oracle-GATED: the
    // oracle replays grid, bits and pairs exactly. Near-copies are
    // PLANTED (one-codepoint edits and exact twins of strata of the
    // image docs — the t25 stance) because the corpus has no natural
    // image-payload duplicates; a one-codepoint edit moves one grid
    // cell, flipping at most 2 of the 64 gradient bits.
    Q("d12_image_phash_dedup",
      (s, dir) => {
        implicit val sp: SparkSession = s
        val docs = Tables.load(s, dir, "documents")
        val edited = docs.where(col("doc_id") % 6 === 0)
          .select((col("doc_id") + 3000000L).as("doc_id"),
            concat(lit("x"), substring(col("text"), 2, Int.MaxValue))
              .as("text"))
        val twins = docs.where(col("doc_id") % 12 === 0)
          .select((col("doc_id") + 6000000L).as("doc_id"), col("text"))
        val media = Multimodal.fromDocuments(
            docs.select("doc_id", "text")
              .unionByName(edited).unionByName(twins))
          .where(col("kind") === "image")
        Multimodal.imageNearDup(media, maxHamming = 3)
          .orderBy("id_a", "id_b")
      },
      Some(d12OracleSql)),


    // audio fingerprint near-dup: d12's planted-copy construction on
    // the AUDIO kind slice, fingerprinted by the 65-window energy
    // delta-sign signature (real decode for WAV/AIFF/AU; stubAudioSig
    // codepoint resample for these synthetic payloads — the m01
    // stance) and paired by the same pigeonhole hamming join.
    // MultimodalSpec pins the REAL-decode side: a gain-scaled WAV
    // copy fingerprints identically, disjoint noise does not.
    Q("d14_audio_sig_dedup",
      (s, dir) => {
        implicit val sp: SparkSession = s
        val docs = Tables.load(s, dir, "documents")
        val edited = docs.where(col("doc_id") % 6 === 1)
          .select((col("doc_id") + 3000000L).as("doc_id"),
            concat(lit("x"), substring(col("text"), 2, Int.MaxValue))
              .as("text"))
        val twins = docs.where(col("doc_id") % 12 === 4)
          .select((col("doc_id") + 6000000L).as("doc_id"), col("text"))
        val media = Multimodal.fromDocuments(
            docs.select("doc_id", "text")
              .unionByName(edited).unionByName(twins))
          .where(col("kind") === "audio")
        Multimodal.audioNearDup(media, maxHamming = 3)
          .orderBy("id_a", "id_b")
      },
      Some(d14OracleSql)),


    // any-modality duplicate report (round 14): text MinHash + image
    // dHash + audio energy-sig verdicts composed into one row per
    // flagged pair — which modalities call these two documents
    // duplicates. Planting must keep the brute-force oracle valid
    // against LSH candidacy, so the copies are TOKEN-PRESERVING:
    // exact twins (+6M on doc_id%8) and first-space→tab edits (+3M on
    // doc_id%4; same codepoint length, same token stream — a changed
    // byte the stub hashes see as content while the shingle set, and
    // therefore the MinHash signature and every band bucket, is
    // IDENTICAL to the source's). A copy thus collides exactly where
    // its source does, and d02 pins that every natural ≥0.5 pair is a
    // candidate — so candidacy is never the filter, only the exact
    // jaccard verify both sides replay. (A one-codepoint 'x' edit —
    // d12's, which only needs stub-hash locality — was measured to
    // create 0.7-jaccard crosses that 16-band LSH deterministically
    // misses.) 4 and 8 are coprime to 3, so every kind slice receives
    // copies; +3M/+6M ≡ 0 (mod 3) keeps the source's kind. The oracle
    // replays all three legs in SQL and may go quadratic; the plan
    // under test is band-bucket + pigeonhole joins (see d16OracleSql).
    Q("d16_multimodal_dedup",
      (s, dir) => {
        implicit val sp: SparkSession = s
        val docs = Tables.load(s, dir, "documents")
        val edited = docs.where(col("doc_id") % 4 === 0)
          .select((col("doc_id") + 3000000L).as("doc_id"),
            tabEdit(col("text")).as("text"))
        val twins = docs.where(col("doc_id") % 8 === 0)
          .select((col("doc_id") + 6000000L).as("doc_id"), col("text"))
        val base = docs.select("doc_id", "text")
          .unionByName(edited).unionByName(twins)
        Multimodal.multimodalNearDup(base, "doc_id", "text")
          .orderBy("id_a", "id_b")
      },
      Some(d16OracleSql)),


    // LSH candidate-stage tuning eval (round 14, 149th entry): the
    // banding geometry's precision/recall against brute-force shingle
    // Jaccard truth on a planted eval sample — the report a corpus
    // owner reads BEFORE committing an index build's (bands,
    // rowsPerBand) point. Planting reuses d16's token-preserving
    // copies (the raw doc_id%10 sample has no true pairs, which would
    // gate nothing); the oracle replays the WHOLE pipeline — FNV
    // shingle hashing in HUGEINT, the Random(42) coefficient family
    // inlined as a VALUES table, the 16-band FNV bucket fold, the
    // any-band collision join — so n_candidates pins the banding
    // itself, not just the threshold property (see d17OracleSql).
    // Round 15 (verdict task 4): the pool is CAPPED at d17SampleCap
    // rows by a cross-engine hash order (see PipelineShared), and the
    // plants derive FROM the capped sample, so the eval's |sample|²
    // truth join is a harness constant at any corpus size.
    Q("d17_lsh_tuning_eval",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val sample = docs.where(col("doc_id") % 10 === 0)
          .select("doc_id", "text")
          .orderBy((pmod(col("doc_id"), lit(2147483647L)) *
              lit(2654435761L)) % lit(1000000007L),
            col("doc_id"))
          .limit(d17SampleCap)
        val edited = sample.where(col("doc_id") % 20 === 0)
          .select((col("doc_id") + 3000000L).as("doc_id"),
            tabEdit(col("text")).as("text"))
        val twins = sample.where(col("doc_id") % 40 === 0)
          .select((col("doc_id") + 6000000L).as("doc_id"), col("text"))
        Dedup.lshCandidateEval(
          sample.unionByName(edited).unionByName(twins), "doc_id", "text")
      },
      Some(d17OracleSql)),


    // duplicated-SPAN removal (windowed exact-substring dedup, Lee et
    // al. 2021): every 8-token window occurring ≥2 times corpus-wide
    // is duplicated; per doc the duplicated windows merge into
    // maximal spans and every covered token is removed. What d01/d02
    // miss: two long docs sharing ONE boilerplate paragraph are
    // nowhere near doc-level duplicates, but the paragraph is
    // repeated training text. Shared passages are PLANTED (the t13
    // stance — a shared footer on doc_id%5, a shared header on
    // doc_id%7, a within-doc repeated phrase on doc_id%11, so some
    // docs carry several and the within-doc occurrence counting is
    // exercised); organic word-soup repeats are replayed equally by
    // the string-exact oracle (the d01 collision stance on the FNV
    // window hashes).
    Q("d13_substring_dedup",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val aug = docs.select(col("doc_id"),
          concat(
            when(col("doc_id") % 7 === 0, lit(d13Header + " "))
              .otherwise(lit("")),
            col("text"),
            when(col("doc_id") % 5 === 0, lit(" " + d13Footer))
              .otherwise(lit("")),
            when(col("doc_id") % 11 === 0,
                lit(" " + d13Phrase + " " + d13Phrase))
              .otherwise(lit(""))).as("text"))
        Dedup.removeDuplicatedWindows(aug, "doc_id", "text",
            k = 8, minCount = 2)
          .select(col("doc_id"), col("n_tokens"), col("n_spans"),
            col("n_cov_tokens"), col("clean_text"))
          .orderBy("doc_id")
      },
      Some(d13OracleSql)),


    // char n-gram Jaccard verify over MinHash candidates. Oracle:
    // brute-force char-3-gram Jaccard over all pairs — valid because at
    // threshold 0.8 the corpus separates cleanly (coincidental overlap
    // tops out ≈0.73, planted near-dups start ≈0.93), and every
    // ≥0.8 pair is an LSH candidate (recall pinned by the DedupSpec
    // truth-set test). At 0.7 the oracle and the operator diverge:
    // borderline ≈0.70 pairs pass the brute-force filter but are not
    // word-shingle LSH candidates.
    Q("d04_dedup_jaccard",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val cands = Dedup.minhashCandidates(docs, "doc_id", "text")
        Dedup.charJaccardVerify(cands, docs, "doc_id", "text",
            n = 3, threshold = 0.8)
          .select(col("id_a"), col("id_b"),
                  r6(col("char_jaccard")).as("char_jaccard"))
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH g AS (
             |  SELECT doc_id, CASE WHEN length(text) >= 3
             |    THEN list_distinct([text[i:i+2]
             |                        for i in range(1, length(text) - 1)])
             |    ELSE [text] END AS s
             |  FROM documents
             |)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  ${r6sql("CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(a.s || b.s))")} AS char_jaccard
             |FROM g a JOIN g b ON a.doc_id < b.doc_id
             |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             |  / len(list_distinct(a.s || b.s)) >= 0.8
             |ORDER BY id_a, id_b""".stripMargin)),


    // decontamination: near-dup pairs BETWEEN a train split and a
    // held-out eval split (cross-corpus LSH + exact verify). Oracle:
    // brute-force cross Jaccard — same separation argument as d02.
    Q("d07_decontaminate",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val train = docs.where(col("doc_id") % 10 =!= 0)
        val eval = docs.where(col("doc_id") % 10 === 0)
        // maxBucketSize = 8: same lossless-but-active guard rationale
        // as d02 (largest per-side band bucket on the test corpora is 4)
        Dedup.decontaminate(train, eval, "doc_id", "text",
            shingleK = 3, numHashes = 128, bands = 16, threshold = 0.5,
            maxBucketSize = 8)
          .select(col("id_left"), col("id_right"), r6(col("jaccard")).as("jaccard"))
          .orderBy("id_left", "id_right")
      },
      Some(s"""WITH t AS (
             |  SELECT doc_id, list_filter(
             |    regexp_split_to_array(trim(text), '[ \\t\\n\\v\\f\\r]+'), x -> x <> '') AS w
             |  FROM documents
             |), sh AS (
             |  SELECT doc_id, CASE WHEN len(w) >= 3
             |    THEN list_distinct([array_to_string(w[i:i+2], ' ')
             |                        for i in range(1, len(w) - 1)])
             |    ELSE [array_to_string(w, ' ')] END AS s
             |  FROM t
             |)
             |SELECT a.doc_id AS id_left, b.doc_id AS id_right,
             |  ${r6sql("CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(a.s || b.s))")} AS jaccard
             |FROM sh a JOIN sh b
             |  ON a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
             |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             |  / len(list_distinct(a.s || b.s)) >= 0.5
             |ORDER BY id_left, id_right""".stripMargin)),


    // duplicate-cluster resolution: near-dup pairs → connected
    // components → per-doc (cluster survivor, cluster size). Oracle:
    // recursive-CTE transitive closure over the same brute-force pair
    // graph as d02.
    Q("d06_dup_clusters",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.load(s, dir, "documents")
        val pairs = Dedup.minhashDuplicates(docs, "doc_id", "text",
          shingleK = 3, numHashes = 128, bands = 16, threshold = 0.5)
        val clusters = Dedup.duplicateClusters(pairs.select("id_a", "id_b"))
        docs.select(col("doc_id"))
          .join(clusters.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("cluster"), col("doc_id")).as("cluster_id"))
          .select(col("doc_id"), col("cluster_id"),
            count(lit(1)).over(Window.partitionBy("cluster_id")).as("cluster_size"))
          .orderBy("doc_id")
      },
      Some(closureCtesSql +
        """
          |SELECT doc_id, cluster_id,
          |  COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
          |FROM lab ORDER BY doc_id""".stripMargin)),


    // quality-aware survivor selection: within each near-dup cluster
    // keep the HIGHEST-quality copy (tie → lowest id), not the lowest
    // id — the curation semantic a real pipeline wants ("of these
    // five scrapes of the same page, keep the cleanest"). Composes
    // d06's connected components with t02's quality score; survivor =
    // first_value over (quality desc, id asc) with a full frame, a
    // deterministic pick in both engines because the quality doubles
    // are bit-identical (t02).
    Q("d08_quality_survivor",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.load(s, dir, "documents")
        val pairs = Dedup.minhashDuplicates(docs, "doc_id", "text",
          shingleK = 3, numHashes = 128, bands = 16, threshold = 0.5)
        val clusters = Dedup.duplicateClusters(pairs.select("id_a", "id_b"))
        val w = Window.partitionBy("cluster_id")
          .orderBy(col("q").desc, col("doc_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        docs
          .join(clusters.withColumnRenamed("id", "doc_id"),
            Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("cluster"), col("doc_id")).as("cluster_id"),
            TextAnalysis.qualityScore(col("text")).as("q"))
          .select(col("doc_id"), col("cluster_id"),
            first("doc_id").over(w).as("survivor_id"))
          .withColumn("is_survivor",
            (col("doc_id") === col("survivor_id")).cast("int"))
          .orderBy("doc_id")
      },
      Some(closureCtesSql + ", " + qualityCtesSql +
        """, s AS (
          |  SELECT lab.doc_id, lab.cluster_id,
          |    FIRST_VALUE(lab.doc_id) OVER (PARTITION BY cluster_id
          |      ORDER BY qual DESC, lab.doc_id ASC
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
          |      AS survivor_id
          |  FROM lab JOIN q ON lab.doc_id = q.doc_id
          |)
          |SELECT doc_id, cluster_id, survivor_id,
          |  CAST(CASE WHEN doc_id = survivor_id THEN 1 ELSE 0 END AS INT)
          |    AS is_survivor
          |FROM s ORDER BY doc_id""".stripMargin)),


    // embedding cosine near-dup via sign-LSH buckets; oracle replays
    // the identical LSH pipeline in DuckDB (see d05OracleSql).
    Q("d05_dedup_embedding",
      (s, dir) => {
        Similarity.cosineDuplicates(Tables.load(s, dir, "embeddings"),
            "vec_id", "embedding", dim = 64, threshold = 0.4,
            bands = 12, bitsPerBand = 6)
          .select(col("id_a"), col("id_b"), r6(col("cosine")).as("cosine"))
          .orderBy("id_a", "id_b")
      },
      Some(d05OracleSql)),


    // SemDeDup: cluster by nearest deterministic centroid (the s03
    // assignment — 16 lowest-id vectors, argmax dot, ties → lower
    // cell), then prune any vector whose cosine against a LOWER-id
    // cluster-mate meets the threshold. Oracle replays centroids,
    // assignment, intra-cluster pairs and the NOT-EXISTS survivor
    // rule with the mirrored cosine.
    Q("d15_semdedup",
      (s, dir) => {
        Similarity.semDedup(Tables.load(s, dir, "embeddings"),
            "vec_id", "embedding", nClusters = 16, threshold = 0.4)
          .orderBy("id")
      },
      Some(s"""WITH cent AS (
             |  SELECT (ROW_NUMBER() OVER (ORDER BY vec_id)) - 1 AS cell,
             |         CAST(embedding AS DOUBLE[]) AS cv
             |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
             |), e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
             |), assigned AS (
             |  SELECT vec_id, v, cell,
             |    ROW_NUMBER() OVER (PARTITION BY vec_id
             |      ORDER BY list_dot_product(v, cv) DESC, cell ASC) AS rn
             |  FROM e CROSS JOIN cent
             |), mem AS (
             |  SELECT vec_id, v, cell FROM assigned WHERE rn = 1
             |), pruned AS (
             |  SELECT DISTINCT a.vec_id FROM mem a JOIN mem b
             |    ON a.cell = b.cell AND a.vec_id > b.vec_id
             |  WHERE ${cosineSql("a.v", "b.v")} >= 0.4
             |)
             |SELECT m.vec_id AS id, CAST(m.cell AS INT) AS cluster,
             |  (p.vec_id IS NULL) AS kept
             |FROM mem m LEFT JOIN pruned p ON m.vec_id = p.vec_id
             |ORDER BY id""".stripMargin)),


    // semantic (embedding-space) cross-corpus decontamination: the
    // paraphrase-level twin of d07 — train vectors near-parallel to
    // any eval vector. Same deterministic hyperplanes on both sides;
    // oracle replays the cross-banding + cosine verify (d09OracleSql).
    Q("d09_semantic_decontaminate",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        Similarity.cosineDecontaminate(
            emb.where(col("vec_id") % 10 =!= 0),
            emb.where(col("vec_id") % 10 === 0),
            "vec_id", "embedding", dim = 64, threshold = 0.4,
            bands = 12, bitsPerBand = 6)
          .select(col("id_left"), col("id_right"),
            r6(col("cosine")).as("cosine"))
          .orderBy("id_left", "id_right")
      },
      Some(d09OracleSql)),


    // benchmark n-gram overlap contamination score: per-train-doc
    // fraction of its distinct word 3-shingles appearing anywhere in
    // the benchmark split (doc_id % 10 = 0, same split as d09) —
    // GPT-3-style containment as a score, complementing d07's
    // Jaccard pair list. Oracle replays shingling on raw strings
    // (cross-checking the kernel's hashed shingles) with the same
    // tokenization text as the d06/d08 closure CTEs.
    Q("d10_ngram_overlap",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val train = docs.where(col("doc_id") % 10 =!= 0)
        val bench = docs.where(col("doc_id") % 10 === 0)
        Dedup.ngramOverlapScore(train, bench, "doc_id", "text", shingleK = 3)
          .select(col("id").as("doc_id"),
            col("n_shingles"), col("n_contaminated"),
            r6(col("overlap_frac")).as("overlap_frac"))
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
             |), bench AS (
             |  SELECT DISTINCT unnest(s) AS bs FROM sh WHERE doc_id % 10 = 0
             |), tr AS (
             |  SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 10 <> 0
             |), m AS (
             |  SELECT tr.doc_id,
             |    COUNT(*) AS n_shingles,
             |    SUM(CASE WHEN b.bs IS NOT NULL THEN 1 ELSE 0 END)
             |      AS n_contaminated
             |  FROM tr LEFT JOIN bench b ON tr.g = b.bs
             |  GROUP BY tr.doc_id
             |)
             |SELECT doc_id,
             |  CAST(n_shingles AS BIGINT) AS n_shingles,
             |  CAST(n_contaminated AS BIGINT) AS n_contaminated,
             |  ${r6sql("CAST(n_contaminated AS DOUBLE) / n_shingles")}
             |    AS overlap_frac
             |FROM m ORDER BY doc_id""".stripMargin)),


    // snapshot content diff: what did this recrawl/refilter change —
    // v1/v2 are synthetic slices of documents with a deterministic
    // modification band, exercising all four statuses. Spark compares
    // 8-byte content hashes (never text on the exchange); the string-
    // exact oracle twin is what would catch a hash collision.
    Q("d11_snapshot_diff",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val v1 = docs.where(col("doc_id") % 7 =!= 0)
        val v2 = docs.where(col("doc_id") % 5 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 11 === 0,
              concat(col("text"), lit(" [rev2]"))).otherwise(col("text")))
        Dedup.snapshotDiff(v1, v2, "doc_id", "text")
          .select(col("id").as("doc_id"), col("status"))
          .orderBy("doc_id")
      },
      Some("""WITH v1 AS (
             |  SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0
             |), v2 AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 11 = 0 THEN text || ' [rev2]'
             |         ELSE text END AS text
             |  FROM documents WHERE doc_id % 5 <> 0
             |)
             |SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
             |  CASE WHEN v1.doc_id IS NULL THEN 'added'
             |       WHEN v2.doc_id IS NULL THEN 'removed'
             |       WHEN v1.text <> v2.text THEN 'changed'
             |       ELSE 'unchanged' END AS status
             |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
             |ORDER BY doc_id""".stripMargin)),
  )
}
