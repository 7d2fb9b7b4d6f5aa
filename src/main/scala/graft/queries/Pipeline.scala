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
object Pipeline {

  /** First embedding (vec_id = min) as the query vector for the ANN
    * entries — fetched per scale-factor directory so the query composes
    * at any SF. Memoized: four ANN entries share the identical vector,
    * and without the cache each triggered its own TakeOrdered job over
    * the embeddings table per Verify/Bench sweep.
    */
  private val queryVecCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Float]]()
  private def queryVec(s: SparkSession, dir: String): Array[Float] =
    queryVecCache.computeIfAbsent(dir, _ =>
      Tables.load(s, dir, "embeddings")
        .orderBy("vec_id").select("embedding").head()
        .getSeq[Float](0).toArray)

  /** Cross-engine 6-decimal rounding: `floor(x·1e6 + 0.5)/1e6` is the
    * same sequence of IEEE double ops in Spark and DuckDB, so both
    * engines produce bit-identical values — `round(x, 6)` does not
    * (Spark rounds the decimal expansion HALF_UP; DuckDB rounds the
    * binary double), which flips the 6th decimal on ties and breaks
    * the driver's hash compare.
    */
  private def r6(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** DuckDB fragment mirroring [[r6]]. */
  private def r6sql(expr: String): String =
    s"FLOOR(($expr) * 1000000 + 0.5) / 1000000"

  /** Fixed BPE merge table shared by t26/t27/p04 and their oracles —
    * common English digraphs, ordered so every merged string is
    * created by exactly one rule at a rank BEFORE any rule that uses
    * it as a component ("th" at 1 before ("th","e") at 2; "an" at 4
    * before ("an","d") at 5). That unique-creation property is what
    * makes the Scala encoder's min-rank loop equal to the oracle's
    * rank-ordered replace chain (TextAnalysis.bpeSegment scaladoc).
    */
  private val bpeFixedMerges: Seq[TextAnalysis.BpeMerge] = Seq(
    (1, "t", "h"), (2, "th", "e"), (3, "i", "n"), (4, "a", "n"),
    (5, "an", "d"), (6, "e", "r"), (7, "o", "n"), (8, "r", "e"),
    (9, "o", "r"), (10, "e", "n"), (11, "a", "t"), (12, "e", "s"),
    (13, "o", "u"), (14, "i", "t"), (15, "i", "s"), (16, "t", "o")
  ).map { case (rk, l, r) => TextAnalysis.BpeMerge(rk, l, r, 0L) }

  /** Fixed unigram-LM piece table for t34 and its oracle: the multi
    * pieces are chosen so no occurrence of any piece can overlap
    * another (q≠u, t≠h, e≠r rule out self-overlap; no piece's suffix
    * is another's prefix) and each dominates every alternative tiling
    * of its span (-1 vs ≥ two singles at -6 / UNK at -1000), so
    * Viterbi provably takes every occurrence — the property that makes
    * the piece count SQL-replayable.
    */
  private val unigramFixedTable: Seq[TextAnalysis.UnigramPiece] = Seq(
    TextAnalysis.UnigramPiece("qu", -1.0),
    TextAnalysis.UnigramPiece("th", -1.0),
    TextAnalysis.UnigramPiece("er", -1.0),
    TextAnalysis.UnigramPiece("e", -6.0),
    TextAnalysis.UnigramPiece("t", -6.0),
    TextAnalysis.UnigramPiece("a", -6.0))

  /** Fixed literal quality-model weights for c09 and its oracle (the
    * s19/t34 fixed-artifact stance: training is driver-side and
    * deterministic but not SQL-replayable, so the ORACLE-gated entry
    * scores with a pinned model — the corpus-scale half is what runs
    * at 100 TB and what the oracle must replay). Weights are a simple
    * deterministic ramp over the residues mod 101, quantization-safe:
    * floor(k/100·1e6 + 0.5) = k·10⁴ exactly for |k| ≤ 50.
    */
  private val qmFixedDim = 256
  private val qmFixedBias = -0.25
  private val qmFixedModel = graft.operators.QualityModel.LinearModel(
    qmFixedDim, qmFixedBias,
    Array.tabulate(qmFixedDim)(j => ((j * 37) % 101 - 50) / 100.0))
  private val qmFixedWeightsQ: IndexedSeq[Long] =
    qmFixedModel.weights.toIndexedSeq
      .map(w => math.floor(w * 1e6 + 0.5).toLong)

  /** Separator for the oracle's flat-string symbol encoding: U+001F
    * (unit separator), a control char that never appears in the test
    * corpora (and cannot survive `tokens`' whitespace-split as part
    * of a merge-table symbol, which are all ASCII letters here).
    */
  private val bpeSep = "\u001f"

  /** DuckDB replay of [[TextAnalysis.bpeSegment]] on one word
    * expression, as a flat string: each symbol is wrapped ⟨sep⟩sym⟨sep⟩
    * (so the string is sep sep s1 sep sep s2 … sep sep), and one merge
    * (l, r) is `replace(s, ⟨sep⟩l⟨sep⟩⟨sep⟩r⟨sep⟩, ⟨sep⟩lr⟨sep⟩)` —
    * plain replace is leftmost-first non-overlapping and keeps the
    * boundary separators on both flanks, so repeated adjacent pairs
    * ("a a a" under (a,a) → [aa, a]) and consecutive disjoint matches
    * ("a b a b" under (a,b) → [ab, ab]) both come out exactly like
    * mergeOnce; a pattern can never match inside a symbol because a
    * single separator flanked by symbol chars occurs only at a
    * boundary. Merges compose in rank order — identical to the
    * min-rank loop for the unique-creation [[bpeFixedMerges]] table.
    * Pieces are read back by splitting on the double separator.
    */
  private def bpeOracleEncode(wExpr: String): String = {
    val wrapped =
      s"'$bpeSep$bpeSep' || regexp_replace($wExpr, '(.)', '\\1$bpeSep$bpeSep', 'g')"
    bpeFixedMerges.sortBy(_.rank).foldLeft(wrapped) { (acc, m) =>
      s"replace($acc, '$bpeSep${m.left}$bpeSep$bpeSep${m.right}$bpeSep', " +
        s"'$bpeSep${m.left}${m.right}$bpeSep')"
    }
  }

  /** DuckDB mirror of Similarity's symmetric int8 quantization of a
    * DOUBLE[] expression (scale = 127/max|x|, floor(x·scale + 0.5),
    * zero vectors → zero codes) — ONE fragment shared by the s06 and
    * s08 oracles so a change to the Scala quantizer has a single SQL
    * twin to keep in lockstep.
    */
  private def quantizeSql(v: String): String =
    s"""CASE WHEN list_max([abs(x) for x in $v]) = 0
       |    THEN [0.0 for x in $v]
       |    ELSE [floor(x * (127.0 / list_max([abs(y) for y in $v])) + 0.5)
       |          for x in $v] END""".stripMargin

  /** DuckDB fragment mirroring [[graft.functions.VectorOps.cosine]]
    * over two DOUBLE[] expressions (norm-product-then-divide, zero
    * norms → 0) — shared by every kNN oracle's scoring step.
    */
  private def cosineSql(a: String, b: String): String =
    s"""CASE WHEN sqrt(list_dot_product($a, $a))
       |        * sqrt(list_dot_product($b, $b)) = 0 THEN 0
       |ELSE list_dot_product($a, $b)
       |  / (sqrt(list_dot_product($a, $a))
       |     * sqrt(list_dot_product($b, $b))) END""".stripMargin

  /** d03 oracle: replays the ENTIRE simhash pipeline in DuckDB —
    * FNV-1a word/bigram hashing with 64-bit wraparound emulated in
    * HUGEINT arithmetic (BIGINT multiply would overflow-error), bit
    * votes, sketch assembly, pigeonhole chunking, hamming join. Every
    * constant mirrors graft.functions.TextKernels/SketchOps; verified
    * value-identical because both engines fold the same integer ops
    * mod 2^64.
    */
  private lazy val d03OracleSql: String = {
    val maxHamming = 10
    val nChunks = maxHamming + 1
    val widths = Array.tabulate(nChunks)(i => 64 / nChunks + (if (i < 64 % nChunks) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val M = "18446744073709551616" // 2^64
    val off = "14695981039346656037" // FNV offset basis (unsigned)
    val fold = s"(h, c2) -> (xor(h, c2) * 1099511628211) % $M"
    def pow2(i: Int): String = java.math.BigInteger.TWO.pow(i).toString
    val votes = (0 until 64).map(i =>
      s"SUM(CASE WHEN (f // ${pow2(i)}) % 2 = 1 THEN 1 ELSE -1 END) AS v_$i")
      .mkString(",\n    ")
    val sketchBits = (0 until 64).map(i =>
      s"(CASE WHEN v_$i > 0 THEN CAST(${pow2(i)} AS HUGEINT) ELSE 0 END)")
      .mkString(" +\n    ")
    val chunkCols = (0 until nChunks).map(c =>
      s"(sim // ${pow2(offsets(c))}) % ${pow2(widths(c))} AS cv_$c")
      .mkString(",\n    ")
    val collide = (0 until nChunks).map(c => s"a.cv_$c = b.cv_$c").mkString(" OR ")
    val signed = (u: String) =>
      s"CAST(CASE WHEN $u >= 9223372036854775808 THEN $u - $M ELSE $u END AS BIGINT)"
    val ham = s"bit_count(xor(${signed("a.sim")}, ${signed("b.sim")}))"
    s"""WITH w AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(text, '[ \\t\\n\\v\\f\\r]+'), x -> x <> '') AS words
       |  FROM documents
       |), wh AS (
       |  SELECT doc_id,
       |    [list_reduce([CAST($off AS HUGEINT)] ||
       |       [CAST(unicode(ch) AS HUGEINT) for ch in string_split(wd, '')], $fold)
       |     for wd in words] AS whs
       |  FROM w
       |), feats AS (
       |  SELECT doc_id, CASE
       |    WHEN len(whs) = 0 THEN [CAST($off AS HUGEINT)]
       |    WHEN len(whs) = 1 THEN
       |      [list_reduce([CAST($off AS HUGEINT)] || whs, $fold)]
       |    ELSE list_distinct(
       |      [list_reduce([CAST($off AS HUGEINT), whs[i], whs[i + 1]], $fold)
       |       for i in range(1, len(whs))])
       |    END AS fs
       |  FROM wh
       |), f AS (
       |  SELECT doc_id, unnest(fs) AS f FROM feats
       |), votes AS (
       |  SELECT doc_id,
       |    $votes
       |  FROM f GROUP BY doc_id
       |), sketch AS (
       |  SELECT doc_id,
       |    $sketchBits AS sim
       |  FROM votes
       |), ch AS (
       |  SELECT doc_id, sim,
       |    $chunkCols
       |  FROM sketch
       |)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST($ham AS INT) AS hamming
       |FROM ch a JOIN ch b ON a.doc_id < b.doc_id AND ($collide)
       |WHERE $ham <= $maxHamming
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** d12 oracle: replays the planted-copy media construction,
    * Multimodal.stubGrid (codepoint resample onto the 72-cell grid),
    * dHashBits (HUGEINT bit sum wrapped to signed BIGINT, the d03
    * trick) and an all-pairs hamming filter — the oracle may be
    * quadratic; the Spark plan under test is the pigeonhole join.
    */
  private lazy val d12OracleSql: String = {
    val M = "18446744073709551616" // 2^64
    val bitSum = (for { y <- 0 until 8; x <- 0 until 8 } yield {
      val idx = y * 8 + x
      val l = y * 9 + x + 1 // 1-based list index of the cell
      s"(CASE WHEN gr[$l] > gr[${l + 1}] THEN CAST(${java.math.BigInteger.TWO.pow(idx)} AS HUGEINT) ELSE 0 END)"
    }).mkString(" +\n    ")
    val signed = (u: String) =>
      s"CAST(CASE WHEN $u >= 9223372036854775808 THEN $u - $M ELSE $u END AS BIGINT)"
    s"""WITH base AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
       |  UNION ALL
       |  SELECT doc_id + 3000000, 'x' || substr(text, 2)
       |  FROM documents WHERE doc_id % 6 = 0
       |  UNION ALL
       |  SELECT doc_id + 6000000, text FROM documents WHERE doc_id % 12 = 0
       |), cp AS (
       |  SELECT doc_id,
       |    [unicode(ch) for ch in string_split(text, '')] AS cps
       |  FROM base
       |), g AS (
       |  SELECT doc_id, CASE WHEN len(cps) = 0
       |    THEN [0 for i in range(0, 72)]
       |    ELSE [cps[CAST((i * len(cps)) // 72 AS BIGINT) + 1]
       |          for i in range(0, 72)] END AS gr
       |  FROM cp
       |), h AS (
       |  SELECT doc_id, ${signed(s"($bitSum)")} AS phash
       |  FROM g
       |)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
       |FROM h a JOIN h b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.phash, b.phash)) <= 3
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Shared DuckDB replay of TextAnalysis.langId, ending in a `pred`
    * CTE of (doc_id, lang, lang_pred) — ONE definition for the t01
    * oracle and the t31 confusion-matrix oracle, so a change to the
    * heuristic has a single SQL twin to keep in lockstep. The CASE
    * chain encodes greatest(struct)'s tie-breaking (equal scores →
    * later profile wins).
    */
  private lazy val langPredCtesSql: String =
    """tok AS (
      |  SELECT doc_id, lang,
      |    list_distinct(list_filter(
      |      regexp_split_to_array(trim(lower(text)), '[ \t\n\v\f\r]+'), x -> x <> '')) AS t
      |  FROM documents
      |), sc AS (
      |  SELECT doc_id, lang,
      |    len(list_intersect(t, ['the','a','of','and','to','in','is','that','it','for'])) AS s_en,
      |    len(list_intersect(t, ['el','la','de','que','y','en','un','una','los','por'])) AS s_es,
      |    len(list_intersect(t, ['der','die','das','und','ist','nicht','ein','mit','von','zu'])) AS s_de,
      |    len(list_intersect(t, ['le','la','les','de','et','un','une','est','que','pour'])) AS s_fr,
      |    len(list_intersect(t, ['的','是','了','在','我','有','和','不','人','这'])) AS s_zh
      |  FROM tok
      |), pred AS (
      |  SELECT doc_id, lang, CASE
      |    WHEN greatest(s_en, s_es, s_de, s_fr, s_zh) = 0 THEN 'und'
      |    WHEN s_zh >= s_en AND s_zh >= s_es AND s_zh >= s_de AND s_zh >= s_fr THEN 'zh'
      |    WHEN s_fr >= s_en AND s_fr >= s_es AND s_fr >= s_de THEN 'fr'
      |    WHEN s_de >= s_en AND s_de >= s_es THEN 'de'
      |    WHEN s_es >= s_en THEN 'es'
      |    ELSE 'en' END AS lang_pred
      |  FROM sc
      |)""".stripMargin

  /** d14 oracle: replays the planted-copy media construction over the
    * AUDIO kind slice, Multimodal.stubAudioSig (codepoint resample
    * onto 65 windows → 64 delta-sign bits; HUGEINT bit sum wrapped to
    * signed BIGINT, the d03/d12 trick) and an all-pairs hamming
    * filter — the oracle may be quadratic; the Spark plan under test
    * is the pigeonhole join.
    */
  private lazy val d14OracleSql: String = {
    val M = "18446744073709551616" // 2^64
    val bitSum = (0 until 64).map { i =>
      s"(CASE WHEN gr[${i + 1}] > gr[${i + 2}] THEN CAST(${java.math.BigInteger.TWO.pow(i)} AS HUGEINT) ELSE 0 END)"
    }.mkString(" +\n    ")
    val signed = (u: String) =>
      s"CAST(CASE WHEN $u >= 9223372036854775808 THEN $u - $M ELSE $u END AS BIGINT)"
    s"""WITH base AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 1
       |  UNION ALL
       |  SELECT doc_id + 3000000, 'x' || substr(text, 2)
       |  FROM documents WHERE doc_id % 6 = 1
       |  UNION ALL
       |  SELECT doc_id + 6000000, text FROM documents WHERE doc_id % 12 = 4
       |), cp AS (
       |  SELECT doc_id,
       |    [unicode(ch) for ch in string_split(text, '')] AS cps
       |  FROM base
       |), g AS (
       |  SELECT doc_id, CASE WHEN len(cps) = 0
       |    THEN [0 for i in range(0, 65)]
       |    ELSE [cps[CAST((i * len(cps)) // 65 AS BIGINT) + 1]
       |          for i in range(0, 65)] END AS gr
       |  FROM cp
       |), h AS (
       |  SELECT doc_id, ${signed(s"($bitSum)")} AS asig
       |  FROM g
       |)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.asig, b.asig)) AS INT) AS hamming
       |FROM h a JOIN h b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.asig, b.asig)) <= 3
       |ORDER BY id_a, id_b""".stripMargin
  }

  // planted shared passages for d13 (see the query comment): a footer
  // shared by doc_id%5 docs, a header by doc_id%7, a within-doc
  // repeated phrase on doc_id%11 — all ≥8 tokens so each carries
  // duplicated 8-windows of its own.
  private val d13Header =
    "cookie policy notice we use cookies to improve your experience"
  private val d13Footer =
    "subscribe to our newsletter for daily updates and exclusive offers today now"
  private val d13Phrase = "please rate this article and share it widely"

  /** d13 oracle: replays the windowed substring dedup on RAW window
    * strings (the d01 collision stance — an FNV window-hash collision
    * in the operator would hash-mismatch here), with the same
    * gaps-and-islands span merge and token-level removal. The oracle
    * may explode covered positions; the Spark plan under test carries
    * spans as bounded per-doc arrays.
    */
  private lazy val d13OracleSql: String =
    s"""WITH aug AS (
       |  SELECT doc_id,
       |    (CASE WHEN doc_id % 7 = 0 THEN '$d13Header ' ELSE '' END)
       |    || text
       |    || (CASE WHEN doc_id % 5 = 0 THEN ' $d13Footer' ELSE '' END)
       |    || (CASE WHEN doc_id % 11 = 0
       |        THEN ' $d13Phrase $d13Phrase' ELSE '' END) AS t
       |  FROM documents
       |), d AS (
       |  SELECT doc_id, list_filter(
       |    regexp_split_to_array(t, '[ \\t\\n\\v\\f\\r]+'),
       |    x -> x <> '') AS w
       |  FROM aug
       |), toks0 AS (
       |  SELECT doc_id,
       |    unnest([{'pos': i, 'tok': w[i + 1]}
       |            for i in range(0, len(w))]) AS u
       |  FROM d
       |), toks AS (
       |  SELECT doc_id, u.pos AS pos, u.tok AS tok FROM toks0
       |), wins0 AS (
       |  SELECT doc_id,
       |    unnest([{'pos': i,
       |             'wstr': array_to_string(w[i + 1:i + 8], ' ')}
       |            for i in range(0, greatest(len(w) - 7, 0))]) AS u
       |  FROM d
       |), wins AS (
       |  SELECT doc_id, u.pos AS pos, u.wstr AS wstr FROM wins0
       |), dup AS (
       |  SELECT wstr FROM wins GROUP BY wstr HAVING COUNT(*) >= 2
       |), dw AS (
       |  SELECT w.doc_id, w.pos FROM wins w JOIN dup d2 ON w.wstr = d2.wstr
       |), pm AS (
       |  SELECT doc_id, pos,
       |    max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
       |  FROM dw
       |), isl AS (
       |  SELECT doc_id, pos,
       |    SUM(CASE WHEN prev_end IS NULL OR pos > prev_end
       |        THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
       |  FROM pm
       |), spans AS (
       |  SELECT doc_id, span_id, MIN(pos) AS lo, MAX(pos) + 8 AS hi
       |  FROM isl GROUP BY doc_id, span_id
       |), cov AS (
       |  SELECT doc_id,
       |    unnest([lo + i for i in range(0, hi - lo)]) AS pos
       |  FROM spans
       |), st AS (
       |  SELECT doc_id, COUNT(*) AS n_sp, SUM(hi - lo) AS n_cov
       |  FROM spans GROUP BY doc_id
       |), cl AS (
       |  SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.pos) AS ct
       |  FROM toks t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.pos
       |  WHERE c.pos IS NULL
       |  GROUP BY t.doc_id
       |)
       |SELECT d.doc_id, CAST(len(d.w) AS BIGINT) AS n_tokens,
       |  CAST(COALESCE(st.n_sp, 0) AS BIGINT) AS n_spans,
       |  CAST(COALESCE(st.n_cov, 0) AS BIGINT) AS n_cov_tokens,
       |  COALESCE(cl.ct, '') AS clean_text
       |FROM d LEFT JOIN st ON d.doc_id = st.doc_id
       |LEFT JOIN cl ON d.doc_id = cl.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** s02 oracle: replays the sign-LSH probe exactly — corpus and query
    * signatures computed in SQL from the inlined deterministic
    * hyperplanes, probe filter = signature match in any band, then
    * exact cosine ranking of the candidates (same contract as knnLsh).
    */
  private lazy val s02OracleSql: String = {
    val bands = 8; val bitsPerBand = 8; val seed = 7L; val dim = 64
    def sigCols(vec: String, prefix: String): String =
      (0 until bands).map { b =>
        val ps = Similarity.planes(dim, bitsPerBand, seed + b)
        val bits = ps.zipWithIndex.map { case (p, i) =>
          val arr = p.mkString("[", ", ", "]")
          s"(CASE WHEN list_dot_product($vec, $arr) > 0 THEN ${1L << i} ELSE 0 END)"
        }.mkString(" + ")
        s"($bits) AS ${prefix}_$b"
      }.mkString(",\n    ")
    val probe = (0 until bands).map(b => s"s.sig_$b = sq.qsig_$b").mkString(" OR ")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), q AS (
       |  SELECT CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings ORDER BY vec_id LIMIT 1
       |), sq AS (
       |  SELECT qv,
       |    ${sigCols("qv", "qsig")}
       |  FROM q
       |), s AS (
       |  SELECT vec_id, v,
       |    ${sigCols("v", "sig")}
       |  FROM e
       |), cand AS (
       |  SELECT vec_id, v, qv FROM s, sq WHERE $probe
       |), scored AS (
       |  SELECT vec_id AS id,
       |    ${cosineSql("v", "qv")} AS cos
       |  FROM cand
       |)
       |SELECT id, ${r6sql("cos")} AS cosine
       |FROM scored ORDER BY cos DESC, id LIMIT 20""".stripMargin
  }

  /** d05 oracle: replicates the sign-LSH pipeline *exactly* in DuckDB
    * by inlining the deterministic hyperplanes as literals — brute
    * force can't serve as the oracle here because the corpus has no
    * cosine gap at the 0.4 threshold, so LSH recall < 1 is part of the
    * operator's defined output. java.util.Random's Gaussian stream is
    * specified, so the planes are identical constants on any JVM, and
    * Scala's Double.toString round-trips exactly through DuckDB's
    * literal parser.
    */
  /** d09: cross-corpus (train × eval) replay of the same sign-LSH —
    * identical inlined hyperplanes, split predicates instead of the
    * within-corpus id ordering, and the exact cosine verify.
    */
  private lazy val d09OracleSql: String = {
    val bands = 12; val bitsPerBand = 6; val seed = 7L; val dim = 64
    val sigCols = (0 until bands).map { b =>
      val ps = Similarity.planes(dim, bitsPerBand, seed + b)
      val bits = ps.zipWithIndex.map { case (p, i) =>
        val arr = p.mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product(v, $arr) > 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
      s"($bits) AS sig_$b"
    }.mkString(",\n    ")
    val collide = (0 until bands).map(b => s"a.sig_$b = b.sig_$b").mkString(" OR ")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), s AS (
       |  SELECT vec_id, v,
       |    $sigCols
       |  FROM e
       |), pairs AS (
       |  SELECT a.vec_id AS id_left, b.vec_id AS id_right,
       |         a.v AS vl, b.v AS vr
       |  FROM s a JOIN s b
       |    ON a.vec_id % 10 <> 0 AND b.vec_id % 10 = 0 AND ($collide)
       |), scored AS (
       |  SELECT id_left, id_right,
       |    ${cosineSql("vl", "vr")} AS c
       |  FROM pairs
       |)
       |SELECT id_left, id_right, ${r6sql("c")} AS cosine
       |FROM scored WHERE c >= 0.4 ORDER BY id_left, id_right""".stripMargin
  }

  private lazy val d05OracleSql: String = {
    val bands = 12; val bitsPerBand = 6; val seed = 7L; val dim = 64
    val sigCols = (0 until bands).map { b =>
      val ps = Similarity.planes(dim, bitsPerBand, seed + b)
      val bits = ps.zipWithIndex.map { case (p, i) =>
        val arr = p.mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product(v, $arr) > 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
      s"($bits) AS sig_$b"
    }.mkString(",\n    ")
    val collide = (0 until bands).map(b => s"a.sig_$b = b.sig_$b").mkString(" OR ")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), s AS (
       |  SELECT vec_id, v,
       |    $sigCols
       |  FROM e
       |), pairs AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.v AS va, b.v AS vb
       |  FROM s a JOIN s b ON a.vec_id < b.vec_id AND ($collide)
       |), scored AS (
       |  SELECT id_a, id_b,
       |    ${cosineSql("va", "vb")} AS c
       |  FROM pairs
       |)
       |SELECT id_a, id_b, ${r6sql("c")} AS cosine
       |FROM scored WHERE c >= 0.4 ORDER BY id_a, id_b""".stripMargin
  }

  /** Shared d06/d08 oracle prefix: word 3-shingles → Jaccard-0.5
    * pairs → recursive transitive closure → per-doc min-label (`lab`).
    * ONE copy — a shingle-regex or threshold change propagates to
    * both oracles. Plain (non-interpolated) literal on purpose: the
    * regex classes rely on `\t\n\v\f\r` staying raw backslashes.
    */
  private val closureCtesSql: String =
    """WITH RECURSIVE t AS (
      |  SELECT doc_id, list_filter(
      |    regexp_split_to_array(trim(text), '[ \t\n\v\f\r]+'), x -> x <> '') AS w
      |  FROM documents
      |), sh AS (
      |  SELECT doc_id, CASE WHEN len(w) >= 3
      |    THEN list_distinct([array_to_string(w[i:i+2], ' ')
      |                        for i in range(1, len(w) - 1)])
      |    ELSE [array_to_string(w, ' ')] END AS s
      |  FROM t
      |), p AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |    / len(list_distinct(a.s || b.s)) >= 0.5
      |), e AS (
      |  SELECT id_a AS src, id_b AS dst FROM p
      |  UNION SELECT id_b, id_a FROM p
      |), reach(src, dst) AS (
      |  SELECT src, dst FROM e
      |  UNION
      |  SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src
      |), lab AS (
      |  SELECT d.doc_id, least(d.doc_id, coalesce(
      |    (SELECT MIN(dst) FROM reach WHERE src = d.doc_id),
      |    d.doc_id)) AS cluster_id
      |  FROM documents d
      |)""".stripMargin

  /** t02's quality formula as `q(doc_id, qual)` CTEs, appended after
    * [[closureCtesSql]] by d08 (c01/t02 carry their own inline copies
    * because their CTE shapes differ — the FORMULA text must match
    * term-for-term across all of them; spec'd via the oracle gate).
    */
  private val qualityCtesSql: String =
    """qf AS (
      |  SELECT doc_id, source,
      |    CAST(length(text) AS DOUBLE) AS n_chars,
      |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS n_alpha,
      |    CAST(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS DOUBLE) AS n_punct,
      |    list_filter(regexp_split_to_array(trim(lower(text)),
      |      '[ \t\n\v\f\r]+'), x -> x <> '') AS toks
      |  FROM documents
      |), q AS (
      |  SELECT doc_id, source,
      |    least(1.0, greatest(0.0,
      |      0.25 * least(len(toks) / 20.0, 1.0) +
      |      0.25 * (n_alpha / greatest(n_chars, 1.0)) +
      |      0.25 * (1.0 - least((n_punct / greatest(n_chars, 1.0)) * 5.0, 1.0)) +
      |      0.25 * least((len(list_intersect(list_distinct(toks),
      |        ['the','a','of','and','to','in','is','that','it','for'])) / 10.0)
      |        * 2.0, 1.0))) AS qual
      |  FROM qf
      |)""".stripMargin

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

    // per-domain document cap: keep the top-100 docs per domain by
    // quality (ties → lowest id) — the crawl-curation step that stops
    // one boilerplate-heavy domain from flooding the corpus (every
    // CommonCrawl pipeline caps per-registered-domain). Scale shape:
    // the winners ride the bounded topk_rows heap per domain
    // (map-side partial heaps, ≤cap rows per (domain, input
    // partition) on the exchange — t12's shape, NEVER a corpus-wide
    // row_number window); quality is t02's engine-reproducible
    // formula, so the oracle's ROW_NUMBER ranking lands identically.
    Q("c04_domain_cap",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val host = when(col("doc_id") % 3 === 0, lit("www.example.com"))
          .when(col("doc_id") % 3 === 1, lit("blog.example.com"))
          .otherwise(lit("news.site.org"))
        docs.select(col("doc_id"), host.as("domain"),
            TextAnalysis.qualityScore(col("text")).as("qual"))
          .groupBy("domain")
          .agg(graft.functions.TopK.topk(
            col("qual"), col("doc_id"), 100).as("_t"))
          .select(col("domain"), posexplode(col("_t")).as(Seq("rk0", "w")))
          .select(col("w.id").as("doc_id"), col("domain"),
            r6(col("w.ord")).as("qual"),
            (col("rk0") + 1).as("rk"))
          .orderBy("domain", "rk")
      },
      Some(s"""WITH $qualityCtesSql, dom AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 3 = 0 THEN 'www.example.com'
             |         WHEN doc_id % 3 = 1 THEN 'blog.example.com'
             |         ELSE 'news.site.org' END AS domain, qual
             |  FROM q
             |), rk AS (
             |  SELECT doc_id, domain, qual, ROW_NUMBER() OVER (
             |    PARTITION BY domain ORDER BY qual DESC, doc_id ASC) AS rk
             |  FROM dom
             |)
             |SELECT doc_id, domain, ${r6sql("qual")} AS qual,
             |  CAST(rk AS INT) AS rk
             |FROM rk WHERE rk <= 100
             |ORDER BY domain, rk""".stripMargin)),

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
             |    CASE WHEN epoch_us(ts) -
             |      LAG(epoch_us(ts)) OVER
             |        (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
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

    // forward as-of join: each purchase gets the user's NEXT signup
    // at-or-after it (same union+window shape, scan reversed)
    Q("st03_asof_forward",
      (s, dir) => {
        val events = Tables.load(s, dir, "events")
        val purchases = events.where(col("event_type") === "purchase")
        val signups = events.where(col("event_type") === "signup")
          .select("user_id", "ts", "event_id", "value")
        graft.operators.AsOfJoin.forward(
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
             |    ORDER BY epoch_us(ts) DESC,
             |      CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END ASC,
             |      event_id DESC
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

    // multimodal: binary columns → stub decode → per-kind rollup.
    // The rollup's inputs are all deterministic functions of doc_id +
    // the UTF-8 byte length of text (the checksum, which is not SQL-
    // reproducible, is not in the output), so the whole mapPartitions
    // pipeline is oracle-checkable end to end.
    Q("m01_multimodal_meta",
      (s, dir) => {
        implicit val sp: SparkSession = s
        val media = Multimodal.fromDocuments(Tables.load(s, dir, "documents"))
        Multimodal.featureSummary(Multimodal.decodeFeatures(media))
      },
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)] AS kind,
             |    strlen(text) AS byte_len,
             |    CASE WHEN doc_id % 3 = 0 THEN 1
             |         WHEN doc_id % 3 = 1 THEN 0
             |         ELSE greatest(1, (doc_id * 40 % 60000) // 1000) END AS n_frames,
             |    least(doc_id % 640 + 16, 256) AS out_w,
             |    least(doc_id % 480 + 16, 256) AS out_h
             |  FROM documents
             |)
             |SELECT kind, COUNT(*) AS n_media,
             |  CAST(SUM(byte_len) AS BIGINT) AS total_bytes,
             |  CAST(SUM(n_frames) AS BIGINT) AS total_frames,
             |  CAST(MAX(out_w) AS INT) AS max_w,
             |  CAST(MAX(out_h) AS INT) AS max_h
             |FROM m GROUP BY kind ORDER BY kind""".stripMargin)),

    // end-to-end curation pipeline in ONE scan: exact-dedup survivor
    // (min doc_id per text-hash, window — no self-join), quality score
    // and repetition fraction as inline column expressions (the Column
    // forms of t02/t11), then a per-(source, lang) keep count. The
    // single-pass shape is the point: a 100 TB curation run pays one
    // read + one content-hash window + one small aggregate, not three
    // materialized frames joined back together. Two scale choices:
    // (1) the window partitions on xxhash64(text) — d01's collision
    // stance — so the exchange and in-partition sort compare 8-byte
    // keys, never KB-MB documents; (2) the metric filters run BEFORE
    // the window — legal because every duplicate shares the text, so a
    // group passes or fails as a unit and min(doc_id) over the
    // survivors equals min over the originals; with the hash key
    // Catalyst could no longer prove that for us (the text-keyed form
    // relied on filter-below-window pushdown), so the plan states it.
    // Thresholds are corpus-calibrated (the synthetic word-soup runs
    // dup-word-heavy).
    Q("c01_curate",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.load(s, dir, "documents")
        docs
          .where(TextAnalysis.qualityScore(col("text")) >= 0.75 &&
            TextAnalysis.dupWordFrac(col("text")) <= 0.7)
          .withColumn("_c_surv",
            min("doc_id").over(Window.partitionBy(xxhash64(col("text")))))
          .where(col("doc_id") === col("_c_surv"))
          .groupBy("source", "lang")
          .agg(count(lit(1)).as("n_kept"))
          .orderBy("source", "lang")
      },
      Some(s"""WITH f AS (
              |  SELECT doc_id, source, lang, text,
              |    CAST(length(text) AS DOUBLE) AS n_chars,
              |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS n_alpha,
              |    CAST(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS DOUBLE) AS n_punct,
              |    list_filter(regexp_split_to_array(trim(lower(text)),
              |      '[ \\t\\n\\v\\f\\r]+'), x -> x <> '') AS toks
              |  FROM documents
              |), g AS (
              |  SELECT doc_id, source, lang, text,
              |    least(1.0, greatest(0.0,
              |      0.25 * least(len(toks) / 20.0, 1.0) +
              |      0.25 * (n_alpha / greatest(n_chars, 1.0)) +
              |      0.25 * (1.0 - least((n_punct / greatest(n_chars, 1.0)) * 5.0, 1.0)) +
              |      0.25 * least((len(list_intersect(list_distinct(toks),
              |        ['the','a','of','and','to','in','is','that','it','for'])) / 10.0)
              |        * 2.0, 1.0))) AS qual,
              |    CASE WHEN len(toks) = 0 THEN 0.0
              |         ELSE (len(toks) - len(list_distinct(toks)))
              |              / CAST(len(toks) AS DOUBLE) END AS dwf,
              |    MIN(doc_id) OVER (PARTITION BY text) AS surv
              |  FROM f
              |)
              |SELECT source, lang, COUNT(*) AS n_kept
              |FROM g
              |WHERE doc_id = surv AND qual >= 0.75 AND dwf <= 0.7
              |GROUP BY 1, 2 ORDER BY source, lang""".stripMargin)),

    // curation funnel: per-source drop accounting for c01's stages,
    // mutually exclusive in stage order (quality → repetition →
    // dedup → kept) — the report a curation run hands its owner.
    // Same plan class as c01 (one scan, one 8-byte-hash window, one
    // bounded aggregate); the survivor window is a conditional min
    // over metric-passing rows, equal to c01's filter-then-window
    // because duplicate groups share their text. Oracle replays the
    // same stages over raw text (the d01 collision stance on the
    // window key).
    // corpus composition: per-source doc/token counts, corpus shares
    // (exact-long divisions) and dominant language (count argmax,
    // ties → lowest lang). Oracle replays the two-level rollup.
    Q("c07_source_mix",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        TextAnalysis.sourceMix(docs, "doc_id", "text", "lang", "source")
          .orderBy("source")
      },
      Some("""WITH b AS (
             |  SELECT source, lang,
             |    CAST(len(list_filter(regexp_split_to_array(trim(text),
             |      '[ \t\n\v\f\r]+'), x -> x <> '')) AS BIGINT) AS n_tok
             |  FROM documents
             |), sl AS (
             |  SELECT source, lang, COUNT(*) AS nd,
             |    CAST(SUM(n_tok) AS BIGINT) AS nt
             |  FROM b GROUP BY source, lang
             |), s AS (
             |  SELECT source, CAST(SUM(nd) AS BIGINT) AS n_docs,
             |    CAST(SUM(nt) AS BIGINT) AS n_tokens
             |  FROM sl GROUP BY source
             |), tot AS (
             |  SELECT CAST(SUM(n_docs) AS BIGINT) AS td,
             |    CAST(SUM(n_tokens) AS BIGINT) AS tt
             |  FROM s
             |), top AS (
             |  SELECT source, lang AS top_lang, nd AS top_lang_n FROM (
             |    SELECT *, ROW_NUMBER() OVER (PARTITION BY source
             |      ORDER BY nd DESC, lang ASC) AS rn FROM sl)
             |  WHERE rn = 1
             |)
             |SELECT s.source, n_docs, n_tokens,
             |  CAST(n_docs AS DOUBLE) / CAST(td AS DOUBLE) AS doc_share,
             |  CAST(n_tokens AS DOUBLE) / CAST(tt AS DOUBLE) AS token_share,
             |  top_lang, top_lang_n
             |FROM s JOIN top USING (source), tot
             |ORDER BY source""".stripMargin)),

    // cross-source near-dup overlap matrix: the d04 verify chain
    // aggregated to (source_a, source_b) — which feeds mirror each
    // other. Oracle is the brute-force all-pairs truth (the d02/d04
    // separation argument: LSH candidates ⊇ every pair ≥ threshold on
    // this corpus) joined to sources and counted.
    Q("c08_dup_matrix",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.crossSourceDupMatrix(docs, "doc_id", "text", "source")
          .orderBy("source_a", "source_b")
      },
      Some(s"""WITH g AS (
             |  SELECT doc_id, source, CASE WHEN length(text) >= 3
             |    THEN list_distinct([text[i:i+2]
             |                        for i in range(1, length(text) - 1)])
             |    ELSE [text] END AS s
             |  FROM documents
             |), p AS (
             |  SELECT a.source AS sa, b.source AS sb
             |  FROM g a JOIN g b ON a.doc_id < b.doc_id
             |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             |    / len(list_distinct(a.s || b.s)) >= 0.8
             |)
             |SELECT LEAST(sa, sb) AS source_a, GREATEST(sa, sb) AS source_b,
             |  COUNT(*) AS n_pairs
             |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("c06_curation_funnel",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        TextAnalysis.curationFunnel(docs, "doc_id", "text", "source")
          .orderBy("source")
      },
      Some(s"""WITH f AS (
              |  SELECT doc_id, source, text,
              |    CAST(length(text) AS DOUBLE) AS n_chars,
              |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS n_alpha,
              |    CAST(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS DOUBLE) AS n_punct,
              |    list_filter(regexp_split_to_array(trim(lower(text)),
              |      '[ \\t\\n\\v\\f\\r]+'), x -> x <> '') AS toks
              |  FROM documents
              |), g AS (
              |  SELECT doc_id, source, text,
              |    least(1.0, greatest(0.0,
              |      0.25 * least(len(toks) / 20.0, 1.0) +
              |      0.25 * (n_alpha / greatest(n_chars, 1.0)) +
              |      0.25 * (1.0 - least((n_punct / greatest(n_chars, 1.0)) * 5.0, 1.0)) +
              |      0.25 * least((len(list_intersect(list_distinct(toks),
              |        ['the','a','of','and','to','in','is','that','it','for'])) / 10.0)
              |        * 2.0, 1.0))) AS qual,
              |    CASE WHEN len(toks) = 0 THEN 0.0
              |         ELSE (len(toks) - len(list_distinct(toks)))
              |              / CAST(len(toks) AS DOUBLE) END AS dwf
              |  FROM f
              |), h AS (
              |  SELECT *,
              |    MIN(CASE WHEN qual >= 0.75 AND dwf <= 0.7
              |        THEN doc_id END) OVER (PARTITION BY text) AS surv
              |  FROM g
              |)
              |SELECT source, COUNT(*) AS n_docs,
              |  CAST(SUM(CASE WHEN qual < 0.75 THEN 1 ELSE 0 END)
              |    AS BIGINT) AS n_quality_drop,
              |  CAST(SUM(CASE WHEN qual >= 0.75 AND dwf > 0.7
              |    THEN 1 ELSE 0 END) AS BIGINT) AS n_repetition_drop,
              |  CAST(SUM(CASE WHEN qual >= 0.75 AND dwf <= 0.7
              |    AND doc_id <> surv THEN 1 ELSE 0 END) AS BIGINT)
              |    AS n_dup_drop,
              |  CAST(SUM(CASE WHEN qual >= 0.75 AND dwf <= 0.7
              |    AND doc_id = surv THEN 1 ELSE 0 END) AS BIGINT)
              |    AS n_kept,
              |  CAST(SUM(CASE WHEN qual >= 0.75 AND dwf <= 0.7
              |    AND doc_id = surv THEN 1 ELSE 0 END) AS DOUBLE)
              |    / CAST(COUNT(*) AS DOUBLE) AS keep_rate
              |FROM h GROUP BY source ORDER BY source""".stripMargin)),

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

    // p01's sharded concat-and-chunk manifest re-run on trained-
    // vocabulary piece counts. Zero-token documents still occupy a
    // manifest row (COALESCE 0 via bpeDocPieceCount's left join) —
    // a packer that silently dropped them would desync doc ordering.
    Q("p04_pack_bpe",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val counts = TextAnalysis.bpeDocPieceCount(
          docs, "doc_id", "text", bpeFixedMerges)
        Packing.packSequences(counts, "doc_id", col("n_bpe_pieces"),
            seqLen = 2048, numShards = 8)
          .orderBy("shard", "chunk_id")
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
             |  SELECT d.doc_id,
             |    ((d.doc_id % 2147483647) * 2654435761) % 8 AS shard,
             |    COALESCE(c.n, 0) AS n_tok
             |  FROM documents d LEFT JOIN cnt c ON d.doc_id = c.doc_id
             |), cc AS (
             |  SELECT shard, doc_id, n_tok,
             |    SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
             |  FROM t
             |)
             |SELECT shard,
             |  CAST(FLOOR((cum_tok - n_tok) / 2048.0) AS BIGINT) AS chunk_id,
             |  COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
             |FROM cc GROUP BY 1, 2 ORDER BY shard, chunk_id""".stripMargin)),

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

    // sharded concat-and-chunk packing manifest: chunk = the fixed
    // 2048-token sequence a doc's first token lands in when its shard
    // concatenates docs in id order. Window is partitioned on the
    // shard (never global) — the scale contract; oracle replays the
    // identical integer shard hash and windowed cumulative sum.
    Q("p01_pack_sequences",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Packing.packSequences(docs, "doc_id",
            TextAnalysis.bpePieceCount(col("text")),
            seqLen = 2048, numShards = 8)
          .orderBy("shard", "chunk_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    ((doc_id % 2147483647) * 2654435761) % 8 AS shard,
             |    len(regexp_extract_all(text,
             |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_tok
             |  FROM documents
             |), c AS (
             |  SELECT shard, doc_id, n_tok,
             |    SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
             |  FROM t
             |)
             |SELECT shard,
             |  CAST(FLOOR((cum_tok - n_tok) / 2048.0) AS BIGINT) AS chunk_id,
             |  COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
             |FROM c GROUP BY 1, 2 ORDER BY shard, chunk_id""".stripMargin)),

    // length-bucketed batch manifest: fixed token-count bounds
    // (32/56/80 ≈ the corpus quartiles), t18-hash shard + decorrelated
    // within-(bucket, shard) order, batches of 8, padding waste
    // measured per batch. Oracle replays bounds, both hashes, the
    // window and the rollup.
    Q("p05_length_buckets",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Packing.lengthBucketBatches(docs, "doc_id",
            TextAnalysis.wsTokenCount(col("text")),
            bounds = Seq(32, 56, 80), batchSize = 8, numShards = 4)
          .orderBy("bucket", "shard", "batch")
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    CAST(len(list_filter(regexp_split_to_array(trim(text),
             |      '[ \t\n\v\f\r]+'), x -> x <> '')) AS INT) AS n_tok,
             |    CAST(((doc_id % 2147483647) * 2654435761) % 4 AS INT)
             |      AS shard,
             |    ((doc_id % 2147483647 + 9176) * 1540483477) % 1000003
             |      AS ord
             |  FROM documents
             |), b AS (
             |  SELECT doc_id, n_tok, shard, ord,
             |    CASE WHEN n_tok < 32 THEN 0 WHEN n_tok < 56 THEN 1
             |         WHEN n_tok < 80 THEN 2 ELSE 3 END AS bucket
             |  FROM t
             |), r AS (
             |  SELECT bucket, shard, n_tok,
             |    CAST(FLOOR((ROW_NUMBER() OVER (
             |      PARTITION BY bucket, shard ORDER BY ord, doc_id) - 1)
             |      / 8.0) AS INT) AS batch
             |  FROM b
             |), g AS (
             |  SELECT bucket, shard, batch, COUNT(*) AS n_docs,
             |    MAX(n_tok) AS max_tokens,
             |    CAST(SUM(n_tok) AS BIGINT) AS sum_tokens
             |  FROM r GROUP BY bucket, shard, batch
             |)
             |SELECT bucket, shard, batch, n_docs, max_tokens, sum_tokens,
             |  n_docs * max_tokens - sum_tokens AS pad_tokens
             |FROM g ORDER BY bucket, shard, batch""".stripMargin)),

    // sliding-window chunking: 512-token windows, 384 stride (1/4
    // overlap = 128), start offsets {0, 384, …} < max(n_tok - 128, 1)
    // (a window adding no new tokens is dropped). Narrow explode, no
    // shuffle; oracle replays with range()+unnest.
    Q("p02_chunk_windows",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Packing.chunkWindows(docs, "doc_id",
            TextAnalysis.bpePieceCount(col("text")),
            windowTokens = 512, strideTokens = 384)
          .orderBy("doc_id", "chunk_idx")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, len(regexp_extract_all(text,
             |    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_tok
             |  FROM documents
             |), s AS (
             |  SELECT doc_id, n_tok,
             |    unnest(range(0, greatest(n_tok - 128, 1), 384)) AS start_tok
             |  FROM t
             |)
             |SELECT doc_id, CAST(start_tok // 384 AS BIGINT) AS chunk_idx,
             |  CAST(start_tok AS BIGINT) AS start_tok,
             |  CAST(least(start_tok + 512, n_tok) AS BIGINT) AS end_tok
             |FROM s ORDER BY doc_id, chunk_idx""".stripMargin)),

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

    // canonical-URL dedup curation: normalize crawl URLs (t19's
    // chain), then first-crawl-wins survivor per canonical URL — the
    // URL-level dedup every crawl pipeline runs BEFORE content dedup
    // (same page re-crawled under rotating tracking params). The
    // synthetic URLs collide on purpose: path = doc_id % 50, so
    // distinct raw URLs (different utm_ payloads) canonicalize
    // together. Window keys on xxhash64(norm_url) — c01's stance: the
    // exchange compares 8-byte hashes, never URL strings; the string-
    // keyed DuckDB twin would catch a collision.
    Q("c02_url_dedup",
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
        val (norm, host) = TextAnalysis.normalizeUrl(url)
        val w = Window.partitionBy(xxhash64(col("norm_url")))
        docs.select(col("doc_id"), norm.as("norm_url"), host.as("host"))
          .withColumn("survivor_id", min("doc_id").over(w))
          .withColumn("n_dups", count(lit(1)).over(w))
          .withColumn("is_survivor", col("doc_id") === col("survivor_id"))
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
             |      (CASE WHEN qq = '?' THEN '' ELSE qq END) AS norm_url,
             |    regexp_extract(prefix, '://(.*)', 1) AS host
             |  FROM c
             |)
             |SELECT doc_id, norm_url, host,
             |  MIN(doc_id) OVER (PARTITION BY norm_url) AS survivor_id,
             |  COUNT(*) OVER (PARTITION BY norm_url) AS n_dups,
             |  doc_id = MIN(doc_id) OVER (PARTITION BY norm_url) AS is_survivor
             |FROM n ORDER BY doc_id""".stripMargin)),

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

    // multi-signal contamination audit: the report a curation run
    // hands a human — per train doc, BOTH the d10 n-gram containment
    // evidence AND the s09 retrieval evidence (how many bench probes
    // retrieve it in their top-5, and at what best rank). One signal
    // alone misses: containment is blind to paraphrase-scale overlap
    // below the shingle width, retrieval is blind to verbatim spans of
    // globally-common terms; an auditor wants the join. Bench probes
    // are the % 1000 sample of the bench split (bench texts as
    // queries). Probe-count note: the synthetic corpus has a 31-word
    // TOTAL vocabulary, so any full-document probe covers it, every
    // doc matches every probe, and scoring is probe-count-independent
    // (measured 25/10/5 probes: 6.0/5.8/6.1 s at sf0.1 — the vocab
    // semi-filter has nothing to prune). On a Zipf-sparse real
    // vocabulary (t23 measures the spectrum) the semi-filter prunes
    // postings to the probed terms and this side scales like s09.
    // Each signal reuses its parent query's exact shape.
    Q("c03_contamination_report",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val train = docs.where(col("doc_id") % 10 =!= 0)
        val probes = docs.where(col("doc_id") % 1000 === 0)
          .select(col("doc_id").as("query_id"), col("text").as("query_text"))
        val overlap = Dedup.ngramOverlapScore(
            train, docs.where(col("doc_id") % 10 === 0),
            "doc_id", "text", shingleK = 3)
          .select(col("id").as("doc_id"), col("n_contaminated"),
            r6(col("overlap_frac")).as("overlap_frac"))
        val hits = graft.operators.Retrieval.bm25(train, "doc_id", "text",
            probes, "query_id", "query_text", k = 5)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bench_hits"),
            min("rank").as("best_rank"))
        overlap.join(hits, Seq("doc_id"), "left")
          .where(col("n_contaminated") > 0 || col("n_bench_hits").isNotNull)
          .select(col("doc_id"), col("n_contaminated"), col("overlap_frac"),
            coalesce(col("n_bench_hits"), lit(0L)).as("n_bench_hits"),
            coalesce(col("best_rank"), lit(0)).as("best_rank"))
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(
             |    trim(lower(text)), '[ \\t\\n\\v\\f\\r]+'), x -> x <> ''))
             |    AS term
             |  FROM documents WHERE doc_id % 10 <> 0
             |), postings AS (
             |  SELECT doc_id, term, COUNT(*) AS tf
             |  FROM toks GROUP BY doc_id, term
             |), dl AS (
             |  SELECT doc_id, SUM(tf) AS dl FROM postings GROUP BY doc_id
             |), stats AS (
             |  SELECT (SELECT COUNT(*) FROM documents
             |          WHERE doc_id % 10 <> 0) AS n_docs,
             |         (SELECT coalesce(SUM(dl), 0) FROM dl) AS n_tokens
             |), qterms AS (
             |  SELECT doc_id AS query_id, unnest(list_distinct(list_filter(
             |    regexp_split_to_array(trim(lower(text)),
             |    '[ \\t\\n\\v\\f\\r]+'), x -> x <> ''))) AS term
             |  FROM documents WHERE doc_id % 1000 = 0
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
             |), rk AS (
             |  SELECT query_id, doc_id,
             |    ROW_NUMBER() OVER (PARTITION BY query_id
             |      ORDER BY score_i DESC, doc_id ASC) AS rnk
             |  FROM sc
             |), hits AS (
             |  SELECT doc_id, COUNT(*) AS n_bench_hits, MIN(rnk) AS best_rank
             |  FROM rk WHERE rnk <= 5 GROUP BY doc_id
             |), tt AS (
             |  SELECT doc_id, list_filter(
             |    regexp_split_to_array(trim(text), '[ \\t\\n\\v\\f\\r]+'),
             |    x -> x <> '') AS w
             |  FROM documents
             |), sh AS (
             |  SELECT doc_id, CASE WHEN len(w) >= 3
             |    THEN list_distinct([array_to_string(w[i:i+2], ' ')
             |                        for i in range(1, len(w) - 1)])
             |    ELSE [array_to_string(w, ' ')] END AS s
             |  FROM tt
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
             |SELECT m.doc_id,
             |  CAST(n_contaminated AS BIGINT) AS n_contaminated,
             |  ${r6sql("CAST(n_contaminated AS DOUBLE) / n_shingles")}
             |    AS overlap_frac,
             |  CAST(coalesce(n_bench_hits, 0) AS BIGINT) AS n_bench_hits,
             |  CAST(coalesce(best_rank, 0) AS INT) AS best_rank
             |FROM m LEFT JOIN hits ON m.doc_id = hits.doc_id
             |WHERE n_contaminated > 0 OR n_bench_hits IS NOT NULL
             |ORDER BY m.doc_id""".stripMargin)),

    // shard manifest: the provenance "data card" a training job reads
    // before consuming a sharded corpus — per shard (t18's assignment):
    // doc count, token/char budgets, id range. All exact integers, one
    // map-side-combined aggregate over the shard hash; no window (t18's
    // in-shard positions aren't needed for budget accounting).
    Q("p03_shard_manifest",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        docs
          .withColumn("shard",
            pmod(pmod(pmod(col("doc_id"), lit(2147483647L)) *
              lit(2654435761L), lit(1000003L)), lit(8L)).cast("int"))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"),
            sum(TextAnalysis.wsTokenCount(col("text")).cast("long"))
              .as("total_tokens"),
            sum(length(col("text")).cast("long")).as("total_chars"),
            min("doc_id").as("min_doc_id"),
            max("doc_id").as("max_doc_id"))
          .orderBy("shard")
      },
      Some("""WITH h AS (
             |  SELECT doc_id, text,
             |    CAST(((doc_id % 2147483647) * 2654435761) % 1000003 % 8
             |      AS INT) AS shard
             |  FROM documents
             |)
             |SELECT shard, COUNT(*) AS n_docs,
             |  CAST(SUM(len(list_filter(regexp_split_to_array(
             |    trim(lower(text)),
             |    '[ \t\n\v\f\r]+'), x -> x <> ''))) AS BIGINT)
             |    AS total_tokens,
             |  CAST(SUM(length(text)) AS BIGINT) AS total_chars,
             |  MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
             |FROM h GROUP BY shard ORDER BY shard""".stripMargin)),

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

    // topic-cluster corpus profile: every embedding assigned to its
    // nearest seeded centroid (the IVF assignment — argmax dot, ties
    // to the lowest cluster), rolled up into the composition report a
    // curation run reads: cluster size, mean cosine to centroid
    // (micro-quantized per row before the sum — t29's exactness
    // stance, though here even the raw cosine is bit-identical
    // cross-engine), dominant label and purity (exact-count argmax,
    // ties to the lowest label). The assignment pass is narrow; both
    // rollups are bounded by clusters × labels.
    Q("c05_topic_clusters",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        Similarity.clusterProfile(emb, "vec_id", "embedding", "label",
            nClusters = 8)
          .orderBy("cluster")
      },
      Some(s"""WITH e AS (
             |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings
             |), cb AS (
             |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v AS cv
             |  FROM e ORDER BY vec_id LIMIT 8
             |), d AS (
             |  SELECT vec_id, label, v, c, cv,
             |    list_dot_product(v, cv) AS s
             |  FROM e, cb
             |), a AS (
             |  SELECT vec_id, label, v, c, cv FROM (
             |    SELECT *, row_number() OVER (PARTITION BY vec_id
             |      ORDER BY s DESC, c ASC) AS rn FROM d)
             |  WHERE rn = 1
             |), q AS (
             |  SELECT c, label,
             |    CAST(floor((${cosineSql("v", "cv")}) * 1000000 + 0.5)
             |      AS BIGINT) AS cq
             |  FROM a
             |), g AS (
             |  SELECT c, COUNT(*) AS n_vecs, CAST(SUM(cq) AS BIGINT) AS sq
             |  FROM q GROUP BY c
             |), l AS (
             |  SELECT c, label, COUNT(*) AS nl FROM q GROUP BY c, label
             |), top AS (
             |  SELECT c, label AS top_label, nl AS top_label_n FROM (
             |    SELECT *, row_number() OVER (PARTITION BY c
             |      ORDER BY nl DESC, label ASC) AS rn FROM l)
             |  WHERE rn = 1
             |)
             |SELECT CAST(g.c AS INT) AS cluster, n_vecs,
             |  CAST(sq AS DOUBLE) / 1000000 / CAST(n_vecs AS DOUBLE)
             |    AS mean_cos,
             |  top_label, top_label_n,
             |  CAST(top_label_n AS DOUBLE) / CAST(n_vecs AS DOUBLE)
             |    AS purity
             |FROM g JOIN top ON g.c = top.c ORDER BY cluster""".stripMargin)),

    // Learned quality classifier SCORING with a fixed literal model
    // (round 13): the corpus-scale half of QualityModel — hashed
    // tf·idf features (FNV-1a bucket hash, sign bit 32), 6-decimal
    // scaled-long features × quantized weights accumulated in
    // decimal(38,0), margin = bias + Σ/1e12. The oracle replays the
    // ENTIRE feature pipeline: FNV in HUGEINT with mod-2⁶⁴ wraparound
    // (the d03 idiom; dim=256 is a power of two, so unsigned mod
    // equals Spark's signed pmod), the same IEEE weight sequence, the
    // same integer accumulation, the 256 quantized weights inlined as
    // a VALUES table. quality_prob is r6-rounded on both sides (the
    // t29 exp stance).
    Q("c09_quality_score",
      (s, dir) => {
        graft.operators.QualityModel.score(
            Tables.load(s, dir, "documents"), "doc_id", "text",
            qmFixedModel)
          .select(col("doc_id"), col("margin"),
            r6(col("quality_prob")).as("quality_prob"))
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(
             |    trim(lower(text)), '[ \\t\\n\\v\\f\\r]+'), x -> x <> '')) AS term
             |  FROM documents
             |), tf AS (
             |  SELECT doc_id, term, COUNT(*) AS tf
             |  FROM toks GROUP BY doc_id, term
             |), dfreq AS (
             |  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
             |), nd AS (
             |  SELECT COUNT(*) AS n_docs FROM documents
             |), h AS (
             |  SELECT doc_id, tf, df,
             |    list_reduce([CAST(14695981039346656037 AS HUGEINT)] ||
             |      [CAST(unicode(ch) AS HUGEINT) for ch in string_split(tf.term, '')],
             |      (hh, c2) -> (xor(hh, c2) * 1099511628211) % 18446744073709551616) AS hh
             |  FROM tf JOIN dfreq USING (term)
             |), b AS (
             |  SELECT doc_id, CAST(hh % $qmFixedDim AS INT) AS bucket,
             |    CAST(FLOOR(CAST(tf AS DOUBLE)
             |      * ((n_docs + 1) / (df + 1))
             |      * (CASE WHEN (hh // 4294967296) % 2 = 0
             |         THEN 1.0 ELSE -1.0 END)
             |      * 1000000 + 0.5) AS BIGINT) AS v6
             |  FROM h, nd
             |), bk AS (
             |  SELECT doc_id, bucket, SUM(v6) AS v6
             |  FROM b GROUP BY doc_id, bucket
             |), wq(bucket, w6) AS (
             |  VALUES ${(0 until qmFixedDim)
                   .map(j => s"($j, ${qmFixedWeightsQ(j)})").mkString(", ")}
             |), m AS (
             |  SELECT doc_id,
             |    SUM(CAST(w6 AS HUGEINT) * CAST(v6 AS HUGEINT)) AS s
             |  FROM bk JOIN wq USING (bucket) GROUP BY doc_id
             |), sc AS (
             |  SELECT d.doc_id,
             |    ($qmFixedBias) + CAST(coalesce(s, 0) AS DOUBLE)
             |      / 1000000000000.0 AS margin
             |  FROM documents d LEFT JOIN m USING (doc_id)
             |)
             |SELECT doc_id, margin,
             |  ${r6sql("1.0 / (1.0 + exp(-margin))")} AS quality_prob
             |FROM sc ORDER BY doc_id""".stripMargin))
  )
}
