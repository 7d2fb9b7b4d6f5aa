package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation: language ID, quality
  * scoring, token counting, fingerprinting. All pure builtin
  * expressions (codegen-friendly, zero shuffles — these are mapper
  * stages at 100 TB; only a downstream groupBy would shuffle).
  */
object TextAnalysis {

  /** Per-language stopword profiles for the n-gram/stopword-overlap
    * language heuristic. Deliberately small — the operator's value is
    * the Spark shape (score = |tokens ∩ profile| per language, argmax
    * via greatest-of-structs), not lexicography.
    */
  private val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "por"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不", "人", "这"))

  /** Lowercased whitespace tokens, empty-safe: `split` on an empty or
    * whitespace-only string yields `[""]`, which would flow a phantom
    * "" term into topTerms/heavyHitters/fingerprints and count 1 token
    * for an empty document — filter it here, once, for every consumer.
    */
  def tokens(text: Column): Column =
    filter(split(trim(lower(text)), "\\s+"), t => length(t) > 0)

  /** Predicted language code, or "und" when no profile matches. */
  def langId(text: Column): Column = {
    val toks = array_distinct(tokens(text))
    // struct(score, tag) sorts lexicographically → greatest() is the
    // argmax; tag order breaks score ties deterministically.
    val scored = profiles.zipWithIndex.map { case ((lang, words), i) =>
      struct(size(array_intersect(toks, typedlit(words))).as("score"),
             lit(i).as("prio"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise("und")
  }

  /** Heuristic quality features + composite score in [0,1]:
    * length band, alpha ratio, punctuation ratio, stopword hit rate,
    * mean word length sanity. The weights are illustrative; the shape
    * (bounded builtin expressions, no UDF) is the point.
    */
  // Quality sub-expressions, shared by qualityFeatures (as emitted
  // columns) and qualityScore (inside the composite) — ONE definition
  // per regex/ratio so the feature frame and the filter can never
  // drift apart.
  private def nChars(t: Column): Column = length(t).cast("double")
  private def nAlpha(t: Column): Column =
    length(regexp_replace(t, "[^A-Za-z]", "")).cast("double")
  private def nPunct(t: Column): Column =
    length(regexp_replace(t, "[^.,;:!?'\"()-]", "")).cast("double")
  private def stopHits(t: Column): Column =
    size(array_intersect(array_distinct(tokens(t)),
      typedlit(profiles.head._2))).cast("double")
  private def alphaRatio(t: Column): Column =
    nAlpha(t) / greatest(nChars(t), lit(1d))
  private def punctRatio(t: Column): Column =
    nPunct(t) / greatest(nChars(t), lit(1d))
  private def stopwordRate(t: Column): Column =
    stopHits(t) / lit(profiles.head._2.size)

  def qualityFeatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nTok = size(tokens(t)).cast("double")
    df.select(
      col(idCol),
      nChars(t).as("n_chars"),
      nTok.as("n_tokens"),
      alphaRatio(t).as("alpha_ratio"),
      punctRatio(t).as("punct_ratio"),
      stopwordRate(t).as("stopword_rate"),
      (nChars(t) / greatest(nTok, lit(1d))).as("mean_word_len"),
      qualityScore(t).as("quality"))
  }

  /** The composite [0,1] quality score as one reusable column
    * expression — the same formula [[qualityFeatures]] emits, exposed
    * so a curation pipeline can filter on it in a single scan without
    * materializing the feature frame and joining back.
    */
  def qualityScore(text: Column): Column = {
    val nTok = size(tokens(text)).cast("double")
    least(lit(1d), greatest(lit(0d),
      lit(0.25) * least(nTok / 20d, lit(1d)) +
      lit(0.25) * alphaRatio(text) +
      lit(0.25) * (lit(1d) - least(punctRatio(text) * 5d, lit(1d))) +
      lit(0.25) * least(stopwordRate(text) * 2d, lit(1d))))
  }

  /** Repetition metrics for boilerplate/degenerate-text filtering (the
    * C4/Gopher family of rules): the fraction of word occurrences that
    * are repeats of an earlier word, and the same for non-empty lines.
    * Machine-generated spam and scraper boilerplate score high on
    * both; clean prose stays low. Pure per-row builtin expressions —
    * a mapper stage at 100 TB, no shuffle, no UDF.
    *
    * `dupWordFrac = 1 - |distinct words| / |words|` (0 for an empty
    * doc), and likewise for trimmed non-empty lines. Both are exact
    * IEEE divisions of two integer counts, so every engine that
    * tokenizes identically produces bit-identical doubles.
    */
  private def dupFrac(arr: Column): Column = {
    val n = size(arr).cast("double")
    when(n === 0d, 0d)
      .otherwise((n - size(array_distinct(arr)).cast("double")) / n)
  }

  /** Fraction of word occurrences that repeat an earlier word —
    * reusable column form for single-scan curation filters.
    */
  def dupWordFrac(text: Column): Column = dupFrac(tokens(text))

  /** Fraction of trimmed non-empty lines that repeat an earlier line. */
  def dupLineFrac(text: Column): Column =
    dupFrac(filter(transform(split(text, "\n"), l => trim(l)),
      l => length(l) > 0))

  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String,
      wordThreshold: Double = 0.3, lineThreshold: Double = 0.2): DataFrame = {
    df.select(
        col(idCol),
        dupWordFrac(col(textCol)).as("dup_word_frac"),
        dupLineFrac(col(textCol)).as("dup_line_frac"))
      .withColumn("flagged",
        (col("dup_word_frac") > wordThreshold ||
          col("dup_line_frac") > lineThreshold).cast("int"))
  }

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(tokens(text)))

  /** BPE-ish piece count: letter runs, digit runs, and isolated
    * symbols — the classic pre-tokenizer regex. An upper bound on BPE
    * vocabulary pieces, cheap enough to run over 100 TB as a scan
    * (regexp_count counts matches without materializing the pieces).
    */
  def bpePieceCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("int")

  /** 57-bit document fingerprint: polynomial rolling hash over word
    * hashes (order-sensitive, unlike the MinHash sketch) — two docs
    * with the same words in different order fingerprint differently.
    * Accumulator is kept below 2^57 (so acc·31 + 30-bit hash < 2^63)
    * because ANSI mode turns long wraparound into an error.
    */
  def fingerprint64(text: Column): Column = {
    val mod = 1L << 57
    val mask = (1L << 30) - 1
    aggregate(tokens(text), lit(1125899906842597L % mod),
      (acc, w) => (acc * lit(31L) + xxhash64(w).bitwiseAND(lit(mask))) % lit(mod))
  }

  /** Deterministic train/val/test split assignment: hash-mod over the
    * id in explicit bigint arithmetic (engine-agnostic, reproducible
    * across runs and partitionings — the property a 100 TB snapshot
    * split must have; RNG-based `randomSplit` depends on partition
    * layout). `weights` are per-mille (must sum to 1000).
    */
  def splitLabel(id: Column, weights: Seq[(String, Int)]): Column = {
    require(weights.map(_._2).sum == 1000, "weights must sum to 1000 (per-mille)")
    val h = pmod(pmod(id, lit(2147483647L)) * lit(2654435761L), lit(1000L))
    val (label, _) = weights.tail.foldLeft(
      (when(h < weights.head._2, weights.head._1), weights.head._2)) {
      case ((expr, acc), (name, wt)) =>
        (expr.when(h < acc + wt, name), acc + wt)
    }
    label
  }

  /** Per-document top-k salient terms by tf·idf-style weighting.
    *
    * Shuffle shape at 100 TB: explode → partial-aggregated
    * groupBy(doc, term) → groupBy(term) for document frequencies →
    * broadcast of the single-row corpus count → hash join → per-doc
    * window top-k (each partition is one document's term list —
    * bounded, no global sort).
    *
    * The weight is the *rational* idf `tf · (N+1)/(df+1)` rather than
    * a logarithm: monotonic in the same ranking for fixed tf, and —
    * deliberately — free of transcendental functions, so the DuckDB
    * oracle computes bit-identical doubles. Ties rank by term asc.
    * Output: (doc_id, term, tf, doc_freq, score, term_rank).
    */
  def topTerms(df: DataFrame, idCol: String, textCol: String,
               k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("doc_freq"))
    val nDocs = df.select(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf").cast("double") * (col("n_docs") + 1) / (col("doc_freq") + 1))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term").asc)
    scored
      .withColumn("term_rank", row_number().over(w))
      .where(col("term_rank") <= k)
      .select("doc_id", "term", "tf", "doc_freq", "score", "term_rank")
  }

  /** Default stopword list for [[normalize]] (the `en` profile). */
  val defaultStopwords: Seq[String] = profiles.head._2

  /** Canonical cleaning pass: lowercase → strip non-alphanumerics →
    * collapse runs of spaces → drop stopwords. Pure per-row builtin
    * expressions (one codegen'd scan stage at 100 TB — this is the
    * mapper every training-data pipeline runs before dedup/tokenize).
    * Output: (id, norm_text, n_tokens, n_distinct).
    */
  def normalize(df: DataFrame, idCol: String, textCol: String,
                stopwords: Seq[String] = defaultStopwords): DataFrame = {
    val collapsed = regexp_replace(
      regexp_replace(lower(trim(col(textCol))), "[^a-z0-9 ]", " "),
      " +", " ")
    val toks = filter(split(trim(collapsed), " "),
      t => t =!= "" && !t.isin(stopwords: _*))
    df.select(
      col(idCol),
      array_join(toks, " ").as("norm_text"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_distinct"))
  }

  /** Corpus-global heavy hitters: top-k terms by document-independent
    * frequency. Shape at 100 TB: explode → partially-aggregated
    * groupBy(term) (map-side combine collapses each partition to its
    * vocabulary before the shuffle) → TakeOrderedAndProject (per-
    * partition k-heaps; no global sort materializes). Ties rank by
    * term asc so the cut at k is total and deterministic.
    */
  def heavyHitters(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term").asc)
      .limit(k)

  /** Character-trigram uniqueness: distinct char 3-grams / total char
    * 3-grams over the lowercased text — the char-level repetitiveness
    * signal word-level metrics (t11) structurally miss ("abababab…"
    * has one distinct word but also only two distinct trigrams; a
    * keyboard-mash filler string fools word dedup but not this).
    * Low uniqueness ⇒ templated/repetitive content.
    *
    * The distinct count rides the codegen'd CharNgramHashes kernel —
    * one native pass over the codepoints, never materializing gram
    * strings (the HOF substr/array_distinct formulation measured
    * 13.6 s over sf0.1 documents; the kernel is the t04/d04 path and
    * runs with the rest of the sub-second text metrics). Counting
    * distinct 64-bit FNV hashes instead of distinct strings is the
    * d01 collision stance: a collision would undercount by one with
    * probability ~grams²/2⁶⁵, and the string-exact DuckDB oracle
    * would catch exactly that. No shuffle, O(len) per row.
    * Texts under 3 chars have no trigrams: count 0, fraction 0.
    */
  def trigramStats(text: Column): (Column, Column, Column) = {
    val t = lower(text)
    val n = length(t)
    val total = (n - 2).cast("long")
    // the kernel hashes the whole text as one gram when len < n, so
    // the short-text case is guarded out rather than special-cased
    val distinctN = size(
      graft.functions.TextKernelOps.charNgramHashes(t, 3)).cast("long")
    (when(n >= 3, total).otherwise(0L),
     when(n >= 3, distinctN).otherwise(0L),
     when(n >= 3, distinctN.cast("double") / total).otherwise(0d))
  }

  /** C4-style line-level cleaning: keep a line iff it (a) has ≥ 3
    * whitespace tokens, (b) ends in terminal punctuation (.!?" after
    * trim), and (c) contains no template markers (lorem ipsum, braces
    * — the classic code/boilerplate tells). Returns (cleaned text,
    * kept count, dropped count); cleaned text joins the kept lines
    * with newlines. All builtins (split + filter + array_join),
    * per-row, no shuffle — the C4 rules are exactly the shape that
    * must run as a mapper over 100 TB. Predicates use only
    * cross-engine-identical string ops so the DuckDB oracle replays
    * the rewrite verbatim. Lines split on `\r?\n`, not `\n`: a CRLF
    * corpus would otherwise keep a trailing `\r` on every line, and
    * Java's `$` (matches before a final line terminator) would then
    * disagree with RE2/DuckDB's end-of-string `$` on rule (b) — the
    * normalizeUrl-documented divergence, applied here too.
    */
  def cleanLines(text: Column): (Column, Column, Column) = {
    val lines = split(text, "\r?\n")
    def keepLine(l: Column): Column = {
      val t = trim(l)
      size(filter(split(t, " +"), w => w =!= "")) >= 3 &&
        t.rlike("[.!?\"]$") &&
        !lower(t).contains("lorem ipsum") &&
        !t.contains("{") && !t.contains("}")
    }
    val kept = filter(lines, keepLine(_))
    (array_join(kept, "\n"),
     size(kept).cast("long"),
     (size(lines) - size(kept)).cast("long"))
  }

  /** PII redaction patterns, applied in this order (email before IP —
    * an address can embed digit runs; IP before phone — dotted quads
    * must not half-match the phone shape; phone before bare digit
    * runs). Every pattern lives in the Java-regex ∩ RE2 common subset
    * (no backrefs, no lookaround, \b and \d mean the same), so the
    * DuckDB oracle replays the byte-identical rewrite — which is what
    * lets a redaction pass be oracle-GATED instead of spot-checked.
    * Replacement tokens are angle-bracket tags a tokenizer keeps as
    * rare types, the common convention for redacted training corpora.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b" -> "<PHONE>",
    "\\b\\d{12,19}\\b" -> "<NUM>")

  /** Scrub emails / IPv4s / phone-shaped numbers / long digit runs
    * (card- and id-shaped) from a text column. Pure codegen'd
    * regexp_replace chain — a no-shuffle mapper stage at 100 TB, like
    * the other per-row text metrics.
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (p, r)) =>
      regexp_replace(c, p, r)
    }

  /** Corpus-level exact line deduplication (the CCNet/RefinedWeb
    * boilerplate pass [[cleanLines]]' per-row rules can't express):
    * drop every line that occurs in at least `minDocs` DISTINCT
    * documents — navigation bars, cookie banners, footers — and
    * reassemble each document from its surviving lines in order.
    * Whitespace-only lines are never counted and never dropped (they
    * are document structure, not boilerplate).
    *
    * Scale shape: lines are keyed by xxhash64 (8-byte exchange keys,
    * d01's collision stance — two colliding distinct lines could pool
    * their doc counts and over-drop; probability ~lines²/2⁶⁵ and the
    * string-exact oracle would catch it). The common-line set
    * (count ≥ minDocs on the hash) is the heavy-hitter tail — small
    * relative to the corpus, broadcastable when it fits, a plain hash
    * join when it doesn't; Spark picks at runtime from sizes. The
    * reassembly groupBy ships each line exactly once keyed by the
    * 8-byte doc id — one corpus-sized exchange, the same budget c01
    * pays for its survivor window. Rows with a NULL text are dropped
    * (posexplode of a NULL array yields nothing) — filter upstream if
    * NULLs must survive.
    *
    * Output: (idCol, text_clean, n_kept, n_removed), one row per doc.
    */
  def dedupCorpusLines(
      df: DataFrame, idCol: String, textCol: String,
      minDocs: Int,
      scope: Dedup.CacheScope = Dedup.batchScope): DataFrame = {
    require(minDocs >= 2, s"dedupCorpusLines: minDocs must be >= 2 " +
      s"(got $minDocs — at 1 every line is 'common' and all text is dropped)")
    // the exploded lines feed both the common-line aggregate and the
    // rejoin — persist so the corpus is split once, not twice
    // (decontaminate's hash-once contract; caching swaps in at
    // physical planning, the logical plan and SqlGen are untouched)
    // split on \r?\n (not \n) so CRLF corpora key lines without the
    // trailing \r — the cleanLines cross-engine `$`-anchor stance
    val lines = scope.persistTracked(df.select(col(idCol).as("_ld_id"),
      posexplode(split(col(textCol), "\r?\n")).as(Seq("_ld_pos", "_ld_line"))))
    val common = lines
      .where(trim(col("_ld_line")) =!= "")
      .groupBy(xxhash64(col("_ld_line")).as("_ld_h"))
      .agg(countDistinct(col("_ld_id")).as("_ld_n"))
      .where(col("_ld_n") >= minDocs)
      .select(col("_ld_h"))
    lines
      .join(common, xxhash64(col("_ld_line")) === common("_ld_h"), "left")
      .select(col("_ld_id"), col("_ld_pos"), col("_ld_line"),
        col("_ld_h").isNotNull.as("_ld_drop"))
      .groupBy(col("_ld_id").as(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(
            when(!col("_ld_drop"), struct(col("_ld_pos"), col("_ld_line"))))),
          s => s("_ld_line")), "\n").as("text_clean"),
        sum(when(col("_ld_drop"), 0L).otherwise(1L)).as("n_kept"),
        sum(when(col("_ld_drop"), 1L).otherwise(0L)).as("n_removed"))
  }

  /** URL canonicalization for crawl-curation joins: lowercase the
    * scheme+host (never the path — paths are case-significant),
    * strip the fragment, strip `utm_*` tracking parameters, and drop
    * a dangling `?`. Every step is a regexp in the Java ∩ RE2 common
    * subset applied in a FIXED order (the `&utm` pass must run before
    * the `?utm` passes so `?utm_a&utm_b&id` collapses correctly), so
    * the DuckDB oracle replays the identical rewrite. Pure per-row
    * builtins — a no-shuffle mapper stage, like redactPii.
    * Returns (normalized url, lowercased host).
    */
  def normalizeUrl(url: Column): (Column, Column) = {
    val rawPrefix = regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val prefix = lower(rawPrefix)
    // offsets measured on the UN-lowered prefix: case mapping can
    // change codepoint counts (İ lowers to i + combining dot) and
    // would shift the split point
    val rest = substr(url, length(rawPrefix) + 1, lit(Int.MaxValue))
    val noFrag = regexp_replace(rest, "#.*", "")
    // utm stripping confined to the QUERY STRING — '&' and 'utm_' are
    // legal in path segments, so the patterns must never see the path
    // (and the leading-param passes are ^-anchored: a query string may
    // itself contain a later '?')
    val path = regexp_extract(noFrag, "^[^?]*", 0)
    val query = substr(noFrag, length(path) + 1, lit(Int.MaxValue))
    val qNoUtm = regexp_replace(
      regexp_replace(
        regexp_replace(query, "&utm_[^&]*", ""),
        "^\\?utm_[^&]*&", "?"),
      "^\\?utm_[^&]*", "")
    // a query reduced to the bare '?' disappears — an equality CASE,
    // not '\?$' (Java's '$' matches before a trailing line terminator,
    // RE2's does not; scraped URLs can carry exactly that)
    val cleanQuery = when(qNoUtm === "?", lit("")).otherwise(qNoUtm)
    val host = regexp_extract(prefix, "://(.*)", 1)
    (concat(prefix, path, cleanQuery), host)
  }

  /** Adjacent-token-pair frequencies — the counting step of one BPE
    * merge round (tokenizer induction over a corpus): every adjacent
    * token pair, corpus-wide counts, deterministic (count desc, pair
    * asc) top-k. Pair construction is a per-row builtin transform
    * over the token array (guarded: texts with < 2 tokens contribute
    * nothing — the 2-arg sequence would run DESCENDING on size-1 <
    * 1); counting is one map-side-combined aggregation + a bounded
    * TakeOrdered, the same shape as [[heavyHitters]]. At 100 TB this
    * is the job you run per merge round; the k winners feed the next
    * round's merge table.
    */
  def bigramMerges(df: DataFrame, textCol: String, k: Int): DataFrame = {
    // tokens materialized in their own projection: the pair lambda
    // references the array per ELEMENT, and lambda bodies sit outside
    // codegen's subexpression elimination — inlined, the split+filter
    // pipeline re-runs for every element_at (the hashedCorpus trap,
    // Dedup.scala:123). Measured on sf0.1 documents: 7.7 s inlined,
    // sub-second as a bound attribute.
    val toked = df.select(tokens(col(textCol)).as("_bm_toks"))
    val toks = col("_bm_toks")
    val pairs = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array())
    toked.select(explode(pairs).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair").asc)
      .limit(k)
  }

  /** One learned BPE merge: rank 1 = first merge chosen. */
  final case class BpeMerge(rank: Int, left: String, right: String, n: Long)

  /** Train a byte-pair-encoding merge table on the corpus — the full
    * iterative loop [[bigramMerges]] counts ONE round of, at the
    * character level where real tokenizer induction runs.
    *
    * Shape (the sentencepiece/subword-nmt trainer shape, distributed,
    * with INCREMENTAL pair counting since round 10): the corpus is
    * touched ONCE, to build the word-frequency table, and the full
    * weighted pair explode+sum runs ONCE, to seed a persisted
    * (pair, n) table. Every merge round then (a) TakeOrders the top
    * candidates off that cached table — total (n desc, pair asc)
    * order so ties are deterministic, no per-round shuffle of the
    * pair or symbol mass — and (b) rewrites ONLY the affected words
    * (leftmost-first non-overlapping greedy replacement, the classic
    * BPE merge rule), emitting each one's exact pair-count deltas in
    * the same pass; only pairs adjacent to an applied merge change
    * counts, so the table update is a broadcast join of the (capped,
    * driver-collected) delta set against the cached table, with a
    * full union+re-aggregate fallback past `deltaCap` (a merge
    * touching most of the vocabulary) — exact either way. Lineage is
    * truncated by re-persisting both working tables each round and
    * checkpointing every 8 rounds (d06's iterative-loop discipline —
    * without it the plan tree grows linearly in rounds). The per-row
    * merge rewrite is a typed map over the small vocab table (the one
    * place imperative per-row logic is the honest tool; the
    * corpus-sized stage stays declarative).
    *
    * Training stops early when no pair reaches `minPairCount`
    * (degenerate merges of hapax junk are worse than a shorter table).
    * Symbols never contain spaces (tokens are whitespace-split), so
    * the "left right" pair key is unambiguous. Returns the merge
    * table (rank, left, right, n) — apply it with any standard BPE
    * encoder; [[bpePieceCount]] stays the cheap pre-tokenization
    * estimator.
    */
  /** Leftmost-first, non-overlapping single-merge pass: after a merge
    * the cursor moves PAST the merged symbol (classic BPE — "aaa" with
    * merge (a,a) becomes [aa, a], not [aa, aa]). Shared by the trainer
    * (one pass per round) and the encoder (one pass per chosen pair).
    */
  private[operators] def mergeOnce(
      syms: List[String], l: String, r: String): List[String] = {
    val out = List.newBuilder[String]
    var rest = syms
    while (rest.nonEmpty) rest match {
      case a :: b :: tail if a == l && b == r =>
        out += (l + r); rest = tail
      case a :: tail => out += a; rest = tail
      case Nil => ()
    }
    out.result()
  }

  /** Split on CODEPOINTS, not UTF-16 chars: per-Char split turns an
    * astral-plane character (emoji, CJK-ext) into two lone surrogates,
    * which UTF8String encoding collapses to U+FFFD — all distinct
    * astral chars would merge into one symbol.
    */
  private[operators] def codepointSyms(w: String): List[String] = {
    val out = List.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** True iff `l r` occur adjacent somewhere in `syms` — the cheap
    * affected-word test the incremental trainer runs before paying a
    * rewrite + delta pass for a word.
    */
  private[operators] def containsAdjacent(
      syms: List[String], l: String, r: String): Boolean = {
    var rest = syms
    while (rest.nonEmpty && rest.tail.nonEmpty) {
      if (rest.head == l && rest.tail.head == r) return true
      rest = rest.tail
    }
    false
  }

  /** Exact pair-count deltas of rewriting one word: (pair key, ±c) for
    * every adjacent pair whose multiplicity changed between the old
    * and new symbol lists, weighted by the word's corpus count `c`.
    * Only pairs AROUND merge points change, but computing the full
    * old/new multiset diff per affected word is exact and O(|word|).
    */
  private[operators] def pairDeltas(
      oldS: List[String], newS: List[String], c: Long): List[(String, Long)] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    def acc(s: List[String], sign: Long): Unit = {
      var rest = s
      while (rest.nonEmpty && rest.tail.nonEmpty) {
        val k = rest.head + " " + rest.tail.head
        m.update(k, m.getOrElse(k, 0L) + sign)
        rest = rest.tail
      }
    }
    acc(newS, c); acc(oldS, -c)
    m.iterator.filter(_._2 != 0L).toList
  }

  /** Train a BPE merge table over the corpus vocabulary.
    *
    * `batchSize` (round 9) is the scalable-BPE batched-merge knob: at
    * 1 (the default — the t20/t26 oracle contract, byte-identical to
    * the classic one-merge-per-round trainer), each count/apply cycle
    * selects the single argmax pair; at N, each cycle selects up to N
    * MUTUALLY NON-ADJACENT pairs greedily by (count desc, pair asc) —
    * a candidate is skipped while any of its symbols, or its
    * concatenation, collides with an already-selected pair's symbols
    * or concatenation. Disjoint merges cannot create, destroy or
    * re-count each other's occurrences, so applying the batch
    * sequentially inside ONE Spark stage is order-independent and
    * every recorded count is the true pre-batch count. A production
    * 32k-merge train is ~32k/N driver round-trips instead of 32k
    * (the sequential trainer's one-job-per-merge ceiling, round-8
    * verdict); the selection is the standard batched-BPE
    * approximation — batch > 1 may order merges differently than the
    * strict argmax sequence, which re-counts between every merge.
    */
  def bpeTrain(df: DataFrame, textCol: String, numMerges: Int,
               minPairCount: Long = 2, batchSize: Int = 1,
               deltaCap: Int = 65536): DataFrame = {
    require(numMerges >= 1, "bpeTrain: numMerges must be positive")
    require(batchSize >= 1, "bpeTrain: batchSize must be positive")
    require(deltaCap >= 1, "bpeTrain: deltaCap must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // the ONLY corpus-sized stage: word frequencies
    val words = df.select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .as[(String, Long)]

    val vocab0 = words
      .map { case (w, n) => (codepointSyms(w), n) }
      .persist(mem)
    var vocab: org.apache.spark.sql.Dataset[(List[String], Long)] = vocab0
    // the handle actually holding vocab's cached data (vocab itself
    // becomes a cheap map VIEW over the rewrite cache after round 1,
    // and unpersisting a view is a no-op)
    var vocabStore: org.apache.spark.sql.Dataset[_] = vocab0
    // Pair-delta counting (round 10): the FULL pair explode+sum runs
    // ONCE, here; every later round maintains this persisted
    // (pair, n) table incrementally — only pairs adjacent to an
    // applied merge change counts, so each cycle's work is the delta
    // mass of the AFFECTED words, never a re-count of the whole
    // symbol mass (classic incremental BPE, distributed). Candidate
    // selection becomes a TakeOrdered over the cached table: no
    // per-cycle corpus- or vocab-mass shuffle (§4-probed: total
    // shuffle records ~flat in numMerges).
    var pairCounts: DataFrame = vocab
      .flatMap { case (syms, n) =>
        if (syms.size < 2) Iterator.empty
        else syms.iterator.zip(syms.iterator.drop(1))
          .map { case (a, b) => (a + " " + b, n) }
      }
      .toDF("pair", "n")
      .groupBy("pair").agg(sum("n").as("n"))
      .persist(mem)
    // the handle actually holding the pair table's cached data
    // (pairCounts becomes a cheap filter VIEW over the join cache in
    // broadcast-delta rounds, and unpersisting a view is a no-op)
    var pairStore: DataFrame = pairCounts
    // caches a successor plan still reads: they stay persisted until
    // the collect that materializes that successor has run;
    // unpersisting earlier would force a full lineage recompute
    var prevGen: List[DataFrame] = Nil
    val merges = scala.collection.mutable.ArrayBuffer.empty[BpeMerge]
    var done = false
    var rank = 1
    var round = 1
    while (!done && rank <= numMerges) {
      val want = math.min(batchSize, numMerges - rank + 1)
      // overfetch the candidate list so the greedy disjoint filter
      // has room to skip symbol-sharing pairs; a too-short list only
      // costs an extra round, never a wrong merge. batchSize=1 keeps
      // the exact classic shape: the top-1 pair is always selected.
      val cands = pairCounts
        .where(col("n") >= minPairCount)
        .orderBy(col("n").desc, col("pair").asc)
        .limit(want * 4 + 4)
        .as[(String, Long)].collect()
      // that collect materialized the current generation; the caches
      // its plan was derived from are now safe to drop
      prevGen.foreach(_.unpersist(false)); prevGen = Nil
      if (cands.isEmpty) done = true
      else {
        // greedy disjoint selection: block each picked pair's symbols
        // AND its concatenation (a later candidate touching either
        // would see different counts after this batch applies)
        val blocked = scala.collection.mutable.Set.empty[String]
        val picked =
          scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        val it = cands.iterator
        while (picked.length < want && it.hasNext) {
          val (pair, n) = it.next()
          val Array(l, r) = pair.split(" ", 2)
          if (!blocked(l) && !blocked(r) && !blocked(l + r)) {
            blocked += l; blocked += r; blocked += (l + r)
            picked += ((l, r, n))
          }
        }
        picked.foreach { case (l, r, n) =>
          merges += BpeMerge(rank, l, r, n); rank += 1
        }
        // the table is complete → skip the rewrite and delta pass
        // entirely (nothing consumes them)
        if (rank <= numMerges) {
          val sel = picked.toList
          // one vocab pass: rewrite AFFECTED words (the adjacency test
          // is O(|word|·batch)) and emit their exact pair-count deltas;
          // untouched words pass through with no delta
          val mapped = vocab.map { case (syms, c) =>
            if (!sel.exists { case (l, r, _) => containsAdjacent(syms, l, r) })
              (syms, c, List.empty[(String, Long)])
            else {
              val ns = sel.foldLeft(syms) {
                case (s, (l, r, _)) => mergeOnce(s, l, r)
              }
              (ns, c, pairDeltas(syms, ns, c))
            }
          }
          // truncate the typed-map lineage every 8 rounds (eager
          // localCheckpoint returns a plan-free Dataset — d06's
          // discipline); other rounds the delta collect below
          // materializes the cache (no separate count() job)
          val next =
            if (round % 8 == 0) mapped.localCheckpoint()
            else mapped.persist(mem)
          // cached so the cap-overflow fallback's union plan reuses
          // this aggregation instead of re-running it (r11, advice)
          val deltas = next.flatMap(_._3)
            .toDF("pair", "dn")
            .groupBy("pair").agg(sum("dn").as("dn"))
            .persist(mem)
          // bounded-driver pattern: collect the per-round delta set
          // under a cap so the table update is broadcast-join-only
          // (no pair-table shuffle); a pathological round (a merge
          // touching most of the vocabulary) overflows the cap and
          // falls back to the full union+re-aggregate — exact either
          // way, never a driver cliff
          val deltaRows = deltas.limit(deltaCap + 1).collect()
          val oldStore = pairStore
          if (deltaRows.length <= deltaCap) {
            deltas.unpersist(false) // broadcast path reads only deltaRows
            val deltaDf = spark.createDataFrame(
              java.util.Arrays.asList(deltaRows: _*), deltas.schema)
            // ONE pair-table scan (r11, advice — was a semi-join probe
            // PLUS a separate update join): the broadcast left join
            // updates existing pairs and flags which delta pairs it
            // matched; the collect below materializes the new
            // generation's cache and returns the matched set in the
            // same job (output ≤ |deltas| ≤ cap). Unmatched positive
            // deltas are NEW pairs created by this round's merges.
            val joined = pairCounts
              .join(broadcast(deltaDf), Seq("pair"), "left")
              .select(col("pair"),
                (col("n") + coalesce(col("dn"), lit(0L))).as("n"),
                col("dn").isNotNull.as("touched"))
              .persist(mem)
            val matched = joined.where(col("touched"))
              .select("pair").collect().map(_.getString(0)).toSet
            val newPairs = deltaRows.iterator
              .filter(r => !matched(r.getString(0)) && r.getLong(1) > 0)
              .map(r => (r.getString(0), r.getLong(1))).toSeq
            val updatedBase = joined.where(col("n") > 0)
              .select(col("pair"), col("n"))
            val updated =
              if (newPairs.isEmpty) updatedBase
              else updatedBase.union(newPairs.toDF("pair", "n"))
            if (round % 8 == 0) {
              // eager + plan-free: the checkpointed generation no
              // longer references any parent cache
              pairCounts = updated.localCheckpoint()
              pairStore = pairCounts
              joined.unpersist(false)
            } else {
              // the matched collect already materialized `joined`, so
              // the new generation is live as a cheap VIEW over it
              pairCounts = updated
              pairStore = joined
            }
            // new generation materialized → old cache drops NOW (no
            // deferred-unpersist round trip on the broadcast path)
            oldStore.unpersist(false)
          } else {
            val updated = pairCounts
              .union(deltas.select(col("pair"), col("dn").as("n")))
              .groupBy("pair").agg(sum("n").as("n"))
              .where(col("n") > 0)
            if (round % 8 == 0) {
              pairCounts = updated.localCheckpoint()
              pairStore = pairCounts
              deltas.unpersist(false)
              oldStore.unpersist(false)
            } else {
              // lazy: materializes at the NEXT round's candidate
              // collect, whose plan still reads oldStore + deltas
              pairCounts = updated.persist(mem)
              pairStore = pairCounts
              prevGen = List(oldStore, deltas)
            }
          }
          vocabStore.unpersist(false)
          vocabStore = next
          vocab = next.map(t => (t._1, t._2))
        }
      }
      round += 1
    }
    vocabStore.unpersist(false)
    prevGen.foreach(_.unpersist(false))
    pairStore.unpersist(false)
    merges.toSeq.toDF("rank", "left", "right", "n")
  }

  /** Segment ONE word with a trained merge table — the canonical
    * subword-nmt apply loop: repeatedly merge the lowest-rank pair
    * present (ranks are unique, so no ties), each application
    * leftmost-first non-overlapping ([[mergeOnce]]), until no adjacent
    * pair is in the table.
    *
    * For "unique-creation" tables — every symbol string is created by
    * at most one merge, at a rank before any pair that uses it as a
    * component — this loop is provably identical to applying merges in
    * rank order, which is both what [[bpeTrain]] does to its own
    * vocabulary each round and what the t26 DuckDB oracle replays with
    * a nested-replace chain. Tables with a re-creation path (a later
    * merge rebuilding an earlier pair's component string, e.g.
    * [(bc,d), (b,c)] applied to "bcd") make the two loops diverge on
    * novel words; this encoder follows subword-nmt (min-rank wins:
    * "bcd" → [bcd], not [bc, d]) — pinned by spec. Trained tables
    * re-create a component only when two merge paths concat to the
    * same string, which [[bpeTrain]]'s greedy argmax essentially never
    * emits; the oracle query's fixed table is unique-creation by
    * construction.
    */
  private[graft] def bpeSegment(
      w: String, rank: Map[(String, String), Int]): List[String] = {
    var syms = codepointSyms(w)
    var done = syms.lengthCompare(2) < 0
    while (!done) {
      var best = Int.MaxValue
      var bl: String = null
      var br: String = null
      var rest = syms
      while (rest.nonEmpty && rest.tail.nonEmpty) {
        val r = rank.getOrElse((rest.head, rest.tail.head), Int.MaxValue)
        if (r < best) { best = r; bl = rest.head; br = rest.tail.head }
        rest = rest.tail
      }
      if (best == Int.MaxValue) done = true
      else {
        syms = mergeOnce(syms, bl, br)
        done = syms.lengthCompare(2) < 0
      }
    }
    syms
  }

  /** Apply a trained BPE merge table to the corpus — the encode half
    * of [[bpeTrain]], closing the loop so downstream token budgeting
    * (mix allocation, packing, manifests) can run on REAL trained-
    * vocabulary piece counts instead of [[bpePieceCount]]'s regex
    * estimate.
    *
    * Scale shape: the merge table rides inside the codegen'd
    * [[graft.functions.BpeSegmentExpr]] expression (round 8: formerly
    * a typed map — as an expression the plan is fully declarative and
    * the BPE queries round-trip through SqlGen; even a 100k-merge
    * table is a few MB of literal, the broadcast-hashmap scale class);
    * the per-word greedy loop still runs once per DISTINCT word (a
    * VOCABULARY-sized projection); the corpus-sized stages are all
    * declarative: one posexplode of tokens, one hash join of token
    * occurrences against the word→pieces table (vocabulary-sized
    * build side — broadcast when it fits, shuffled hash join when a
    * 100 TB corpus's long-tail vocabulary doesn't), and whatever
    * aggregation the consumer adds. Nothing re-runs the merge loop per
    * token occurrence: a word seen 10⁹ times is segmented once.
    *
    * Output: one row per token occurrence —
    * (idCol, pos, word, pieces Array[String], n_pieces). Zero-token
    * documents contribute no rows (posexplode of an empty array);
    * [[bpeDocPieceCount]] restores them with count 0.
    */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
                merges: Seq[BpeMerge]): DataFrame = {
    require(merges.nonEmpty, "bpeEncode: empty merge table")
    val rankMap = merges.map(m => ((m.left, m.right), m.rank)).toMap
    require(rankMap.size == merges.size,
      "bpeEncode: duplicate (left, right) pairs in merge table")
    require(merges.map(_.rank).distinct.size == merges.size,
      "bpeEncode: duplicate ranks in merge table")
    val toks = df.select(col(idCol),
      posexplode(tokens(col(textCol))).as(Seq("pos", "word")))
    // rank order = literal position order inside the expression; the
    // greedy loop compares priorities only, so sorting by rank
    // preserves every merge decision of the original rank map
    val wordPieces = toks.select("word").distinct()
      .select(col("word"),
        graft.functions.TextKernelOps.bpeSegment(col("word"), merges)
          .as("pieces"))
    toks.join(wordPieces, "word")
      .select(col(idCol), col("pos"), col("word"), col("pieces"),
        size(col("pieces")).as("n_pieces"))
  }

  /** Per-document trained-vocabulary piece count: sum of per-token
    * piece counts, with zero-token documents restored at 0 via a left
    * join back onto the id spine (posexplode drops them; a packing or
    * mix-allocation consumer must still see every document).
    */
  def bpeDocPieceCount(df: DataFrame, idCol: String, textCol: String,
                       merges: Seq[BpeMerge]): DataFrame = {
    val perDoc = bpeEncode(df, idCol, textCol, merges)
      .groupBy(idCol).agg(sum("n_pieces").as("_bpe_n"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("_bpe_n"), lit(0L)).as("n_bpe_pieces"))
  }

  /** Streaming twin of [[bpeEncode]] (round 13): a stateless mapper —
    * posexplode + the codegen'd segment kernel applied PER TOKEN
    * OCCURRENCE, no distinct-word table, no join, no aggregation
    * state — so it runs in append mode with no watermark and its
    * output is row-identical to the batch encoder under any
    * micro-batch slicing (spec-pinned). The merge table rides inside
    * the expression literal (the [[streamingLmPerplexity]] broadcast-
    * model stance). The statelessness trades the batch path's
    * vocabulary-sized segment-once economy for per-occurrence
    * segmentation — the right trade at ingest, where a micro-batch's
    * occurrence count is near its vocabulary size anyway; re-encode
    * the archived corpus with [[bpeEncode]] when amortization
    * matters. Works unchanged on batch frames.
    */
  def streamingBpeEncode(docs: DataFrame, idCol: String, textCol: String,
                         merges: Seq[BpeMerge]): DataFrame = {
    require(merges.nonEmpty, "streamingBpeEncode: empty merge table")
    docs.select(col(idCol),
        posexplode(tokens(col(textCol))).as(Seq("pos", "word")))
      .select(col(idCol), col("pos"), col("word"),
        graft.functions.TextKernelOps.bpeSegment(col("word"), merges)
          .as("pieces"))
      .select(col(idCol), col("pos"), col("word"), col("pieces"),
        size(col("pieces")).as("n_pieces"))
  }

  /** Streaming twin of [[bpeDocPieceCount]]: ONE row per document,
    * stateless — the per-token piece counts fold inside a single
    * aggregate-over-transform expression on the bound token array, so
    * zero-token documents emit 0 without the batch path's restore
    * join. This is the budget row t27's mix-allocation planning
    * consumes, producible at ingest time (spec-pinned row-identical
    * to the batch path across micro-batch splits).
    */
  def streamingBpeDocPieceCount(
      docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[BpeMerge]): DataFrame = {
    require(merges.nonEmpty, "streamingBpeDocPieceCount: empty merge table")
    // coalesce: null text must count 0 like the batch twin's restored
    // row, not propagate null into the budget sums
    docs.select(col(idCol),
      coalesce(aggregate(
        transform(tokens(col(textCol)),
          w => size(graft.functions.TextKernelOps.bpeSegment(w, merges))
            .cast("long")),
        lit(0L), (acc, x) => acc + x), lit(0L)).as("n_bpe_pieces"))
  }

  // ---- Unigram-LM (SentencePiece-style) tokenizer (round 10) ----
  // Public knowledge: Kudo 2018, "Subword Regularization: Improving
  // Neural Network Translation Models with Multiple Subword
  // Candidates" — seed a large substring vocabulary, EM the piece
  // unigram probabilities (forward-backward expected counts over each
  // word's segmentation lattice), prune by likelihood-loss toward the
  // target size, segment with Viterbi.

  /** One trained unigram piece: natural-log probability. */
  final case class UnigramPiece(piece: String, logprob: Double)

  /** Per-codepoint score of a character no piece covers — far below
    * any trained logprob, so unknown characters fall out as single
    * codepoints without making a word unsegmentable.
    */
  final val UnigramUnkLogp: Double = -1000.0

  /** Viterbi best segmentation of one word under a piece→logprob
    * table: maximize the sum of piece logprobs over all tilings of the
    * word's codepoints by pieces of ≤ maxPieceLen codepoints. Unknown
    * single codepoints score [[UnigramUnkLogp]] (total coverage, the
    * SentencePiece UNK stance). Exact score ties prefer the LONGER
    * last piece (spec-pinned). Shared by the trainer's prune loss,
    * the driver API, and [[graft.functions.UnigramSegmentExpr]].
    */
  private[graft] def unigramViterbi(
      w: String, logp: Map[String, Double], maxPieceLen: Int): List[String] = {
    val cps = codepointSyms(w).toArray
    val L = cps.length
    if (L == 0) return Nil
    val best = Array.fill(L + 1)(Double.NegativeInfinity)
    val back = new Array[Int](L + 1) // length of the best last piece
    best(0) = 0.0
    var j = 1
    while (j <= L) {
      var l = 1
      val lMax = math.min(maxPieceLen, j)
      while (l <= lMax) {
        if (best(j - l) != Double.NegativeInfinity) {
          val piece = cps.slice(j - l, j).mkString
          val lp = logp.get(piece) match {
            case Some(v) => v
            case None => if (l == 1) UnigramUnkLogp
                         else Double.NegativeInfinity
          }
          if (lp != Double.NegativeInfinity) {
            val s = best(j - l) + lp
            // >= with l ascending: the longest piece wins exact ties
            if (s >= best(j)) { best(j) = s; back(j) = l }
          }
        }
        l += 1
      }
      j += 1
    }
    var out = List.empty[String]
    var at = L
    while (at > 0) {
      val l = back(at)
      out = cps.slice(at - l, at).mkString :: out
      at -= l
    }
    out
  }

  /** The Viterbi path's total score (used by the prune loss). */
  private def unigramViterbiScore(
      w: String, logp: Map[String, Double], maxPieceLen: Int): Double =
    unigramViterbi(w, logp, maxPieceLen)
      .map(p => logp.getOrElse(p, UnigramUnkLogp)).sum

  /** E-step of one word: forward-backward over the segmentation
    * lattice (positions = codepoint boundaries; edges = table pieces
    * of ≤ maxPieceLen codepoints), emitting each piece's expected
    * count × the word's corpus count, QUANTIZED to micro-units — the
    * t29 stance: per-word doubles are computed in one deterministic
    * order, and the cross-word aggregation sums longs, which is
    * partition-order-free, so training is bit-reproducible.
    */
  private[operators] def unigramExpectedCounts(
      cps: Array[String], n: Long, logp: Map[String, Double],
      maxPieceLen: Int): List[(String, Long)] = {
    val L = cps.length
    if (L == 0) return Nil
    // piece logprob per (start, len) edge; NaN = absent
    val edge = Array.ofDim[Double](L, maxPieceLen + 1)
    var i = 0
    while (i < L) {
      var l = 1
      val lMax = math.min(maxPieceLen, L - i)
      while (l <= lMax) {
        edge(i)(l) = logp.getOrElse(cps.slice(i, i + l).mkString, Double.NaN)
        l += 1
      }
      i += 1
    }
    def lse(acc: Double, x: Double): Double =
      if (acc == Double.NegativeInfinity) x
      else if (x == Double.NegativeInfinity) acc
      else {
        val m = math.max(acc, x)
        m + StrictMath.log(StrictMath.exp(acc - m) + StrictMath.exp(x - m))
      }
    val alpha = Array.fill(L + 1)(Double.NegativeInfinity)
    alpha(0) = 0.0
    var j = 1
    while (j <= L) {
      var l = 1
      val lMax = math.min(maxPieceLen, j)
      while (l <= lMax) {
        val lp = edge(j - l)(l)
        if (!lp.isNaN && alpha(j - l) != Double.NegativeInfinity)
          alpha(j) = lse(alpha(j), alpha(j - l) + lp)
        l += 1
      }
      j += 1
    }
    val z = alpha(L)
    if (z == Double.NegativeInfinity) return Nil // uncoverable: skip
    val beta = Array.fill(L + 1)(Double.NegativeInfinity)
    beta(L) = 0.0
    i = L - 1
    while (i >= 0) {
      var l = 1
      val lMax = math.min(maxPieceLen, L - i)
      while (l <= lMax) {
        val lp = edge(i)(l)
        if (!lp.isNaN && beta(i + l) != Double.NegativeInfinity)
          beta(i) = lse(beta(i), lp + beta(i + l))
        l += 1
      }
      i -= 1
    }
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    i = 0
    while (i < L) {
      var l = 1
      val lMax = math.min(maxPieceLen, L - i)
      while (l <= lMax) {
        val lp = edge(i)(l)
        if (!lp.isNaN && alpha(i) != Double.NegativeInfinity &&
            beta(i + l) != Double.NegativeInfinity) {
          val post = StrictMath.exp(alpha(i) + lp + beta(i + l) - z)
          val micro = math.round(post * n * 1e6)
          if (micro != 0L) {
            val p = cps.slice(i, i + l).mkString
            acc.update(p, acc.getOrElse(p, 0L) + micro)
          }
        }
        l += 1
      }
      i += 1
    }
    acc.toList
  }

  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** Train a unigram-LM piece vocabulary (Kudo 2018, distributed).
    *
    * Shape — the same bounded-driver discipline as [[bpeTrain]]: the
    * corpus is touched once for the word-frequency table; the seed is
    * every corpus single codepoint plus the `seedSize` most frequent
    * multi-codepoint substrings of ≤ maxPieceLen (two bounded
    * TakeOrdered/filter collects off one substring aggregate); each
    * EM step is ONE vocabulary-scale job — a typed flatMap running
    * forward-backward per word against the broadcast piece table,
    * aggregated into ≤ |pieces| micro-unit longs and collected
    * (bounded by the seed size, the codebook scale class). The
    * M-step, the likelihood-loss prune (Viterbi re-segmentation of
    * each candidate piece against the remaining table), and the
    * shrink loop run on the driver over that bounded artifact.
    * Training is deterministic: per-word float work has a fixed
    * evaluation order, cross-word sums are quantized longs (the t29
    * stance), and every tie-break is total ((n desc, piece asc) seed
    * order; (loss desc, piece asc) prune order).
    *
    * Single-codepoint pieces are never pruned and their expected
    * counts floor at one micro-unit, so any corpus word stays
    * segmentable (the SentencePiece character-coverage stance).
    * `vocabSize` must exceed the corpus alphabet for the prune to
    * reach it; the loop stops as soon as a prune makes no progress.
    * Output: (piece, logprob double) — natural-log probabilities,
    * one row per kept piece.
    */
  def unigramTrain(df: DataFrame, textCol: String, vocabSize: Int,
                   emIters: Int = 2, seedSize: Int = 4096,
                   maxPieceLen: Int = 8, shrink: Double = 0.75,
                   minSubstrCount: Long = 2): DataFrame = {
    require(vocabSize >= 1, "unigramTrain: vocabSize must be positive")
    require(emIters >= 1, "unigramTrain: emIters must be positive")
    require(maxPieceLen >= 1, "unigramTrain: maxPieceLen must be positive")
    require(shrink > 0 && shrink < 1, "unigramTrain: shrink must be in (0,1)")
    val spark = df.sparkSession
    import spark.implicits._
    val words = df.select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .as[(String, Long)]
      .map { case (w, n) => (codepointSyms(w).toArray, n) }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // resource hygiene (round 11): `words` lives for the whole train —
    // EVERY exit (empty-corpus return, normal completion, a failed EM
    // job) must release it, so the body runs under one try/finally
    // rather than per-path unpersist calls. Same stance for the
    // seed-scoped `subs` cache and each EM round's broadcast below;
    // pinned by the leaked-cache spec.
    try {
      // seed: one substring aggregate, two bounded collects
      val subs = words.flatMap { case (cps, n) =>
        val L = cps.length
        for {
          i <- (0 until L).iterator
          l <- (1 to math.min(maxPieceLen, L - i)).iterator
        } yield (cps.slice(i, i + l).mkString, n)
      }.toDF("piece", "n").groupBy("piece").agg(sum("n").as("n"))
        .as[(String, Long)]
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (singles, multi) =
        try {
          (subs.filter(t => cpLen(t._1) == 1).collect(), // ≤ |alphabet|
           subs.filter(t => cpLen(t._1) > 1 && t._2 >= minSubstrCount)
             .orderBy(col("n").desc, col("piece").asc)
             .limit(seedSize).as[(String, Long)].collect())
        } finally subs.unpersist(false)
      if (singles.isEmpty) // empty corpus: nothing to learn
        return Seq.empty[(String, Double)].toDF("piece", "logprob")
      val seed = singles ++ multi
      val seedTotal = seed.iterator.map(t => BigInt(t._2)).sum
      val logTotal = StrictMath.log(seedTotal.toDouble)
      var pieces: Map[String, Double] = seed.iterator
        .map { case (p, n) => (p, StrictMath.log(n.toDouble) - logTotal) }
        .toMap
      var q: Map[String, Long] = Map.empty

      def emStep(): Unit = {
        val bc = spark.sparkContext.broadcast((pieces, maxPieceLen))
        val rows =
          try words.flatMap { case (cps, n) =>
            unigramExpectedCounts(cps, n, bc.value._1, bc.value._2)
          }.toDF("piece", "q").groupBy("piece").agg(sum("q").as("q"))
            .as[(String, Long)].collect() // bounded by |pieces|
          finally bc.unpersist()
        q = rows.toMap
        val adjusted = pieces.keysIterator.map { p =>
          val raw = q.getOrElse(p, 0L)
          (p, if (cpLen(p) == 1) math.max(raw, 1L) else raw)
        }.filter(_._2 > 0L).toSeq
        val total = adjusted.iterator.map(t => BigInt(t._2)).sum
        val lt = StrictMath.log(total.toDouble)
        pieces = adjusted.iterator
          .map { case (p, micro) =>
            (p, StrictMath.log(micro.toDouble) - lt)
          }.toMap
      }

      def prune(target: Int): Unit = {
        val (sgl, mlt) = pieces.partition(t => cpLen(t._1) == 1)
        val keepMulti = target - sgl.size
        if (keepMulti >= mlt.size) return
        // SentencePiece's prune loss: expected count × (own logprob −
        // best alternative segmentation's score without the piece)
        val scored = mlt.toSeq.map { case (p, lp) =>
          val alt = unigramViterbiScore(p, pieces - p, maxPieceLen)
          val freq = q.getOrElse(p, 0L).toDouble / 1e6
          (p, lp, freq * (lp - alt))
        }
        val kept = scored.sortBy(t => (-t._3, t._1))
          .take(math.max(keepMulti, 0))
        pieces = sgl ++ kept.iterator.map(t => (t._1, t._2))
      }

      var making = true
      while (pieces.size > vocabSize && making) {
        (1 to emIters).foreach(_ => emStep())
        val before = pieces.size
        if (pieces.size > vocabSize)
          prune(math.max(vocabSize,
            math.ceil(pieces.size * shrink).toInt))
        making = pieces.size < before
      }
      (1 to emIters).foreach(_ => emStep())
      pieces.toSeq.sortBy(_._1).toDF("piece", "logprob")
    } finally words.unpersist(false)
  }

  /** Segment one word with a trained unigram table (driver form of
    * the [[graft.functions.UnigramSegmentExpr]] kernel).
    */
  def unigramSegment(w: String, table: Seq[UnigramPiece]): List[String] = {
    val m = table.iterator.map(p => (p.piece, p.logprob)).toMap
    val maxLen = if (m.isEmpty) 1 else table.iterator.map(p => cpLen(p.piece)).max
    unigramViterbi(w, m, maxLen)
  }

  /** Apply a trained unigram table to the corpus — [[bpeEncode]]'s
    * contract with Viterbi segmentation: one posexplode of tokens,
    * Viterbi once per DISTINCT word (inside the codegen'd
    * [[graft.functions.UnigramSegmentExpr]] — the plan stays
    * declarative and SqlGen-printable), one hash join of occurrences
    * against the word→pieces table. Output: one row per token
    * occurrence — (idCol, pos, word, pieces, n_pieces).
    */
  def unigramEncode(df: DataFrame, idCol: String, textCol: String,
                    table: Seq[UnigramPiece]): DataFrame = {
    require(table.nonEmpty, "unigramEncode: empty piece table")
    require(table.map(_.piece).distinct.size == table.size,
      "unigramEncode: duplicate pieces in table")
    val toks = df.select(col(idCol),
      posexplode(tokens(col(textCol))).as(Seq("pos", "word")))
    val wordPieces = toks.select("word").distinct()
      .select(col("word"),
        graft.functions.TextKernelOps.unigramSegment(col("word"), table)
          .as("pieces"))
    toks.join(wordPieces, "word")
      .select(col(idCol), col("pos"), col("word"), col("pieces"),
        size(col("pieces")).as("n_pieces"))
  }

  /** Per-document unigram piece count with zero-token documents
    * restored at 0 — [[bpeDocPieceCount]]'s contract.
    */
  def unigramDocPieceCount(df: DataFrame, idCol: String, textCol: String,
                           table: Seq[UnigramPiece]): DataFrame = {
    val perDoc = unigramEncode(df, idCol, textCol, table)
      .groupBy(idCol).agg(sum("n_pieces").as("_ug_n"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("_ug_n"), lit(0L)).as("n_unigram_pieces"))
  }

  /** Streaming twin of [[unigramEncode]] — [[streamingBpeEncode]]'s
    * stateless-mapper contract with Viterbi segmentation: per-token-
    * occurrence kernel, no distinct-word join, no state; append mode,
    * row-identical to the batch encoder under any micro-batch
    * slicing (spec-pinned). Works unchanged on batch frames.
    */
  def streamingUnigramEncode(
      docs: DataFrame, idCol: String, textCol: String,
      table: Seq[UnigramPiece]): DataFrame = {
    require(table.nonEmpty, "streamingUnigramEncode: empty piece table")
    docs.select(col(idCol),
        posexplode(tokens(col(textCol))).as(Seq("pos", "word")))
      .select(col(idCol), col("pos"), col("word"),
        graft.functions.TextKernelOps.unigramSegment(col("word"), table)
          .as("pieces"))
      .select(col(idCol), col("pos"), col("word"), col("pieces"),
        size(col("pieces")).as("n_pieces"))
  }

  /** Streaming twin of [[unigramDocPieceCount]] —
    * [[streamingBpeDocPieceCount]]'s one-row-per-document stateless
    * fold, feeding t35's unigram mix budgets at ingest time.
    */
  def streamingUnigramDocPieceCount(
      docs: DataFrame, idCol: String, textCol: String,
      table: Seq[UnigramPiece]): DataFrame = {
    require(table.nonEmpty,
      "streamingUnigramDocPieceCount: empty piece table")
    docs.select(col(idCol),
      coalesce(aggregate(
        transform(tokens(col(textCol)),
          w => size(graft.functions.TextKernelOps.unigramSegment(w, table))
            .cast("long")),
        lit(0L), (acc, x) => acc + x), lit(0L)).as("n_unigram_pieces"))
  }

  /** Domain-affinity scoring for data selection (the DSIR/importance-
    * resampling idea reduced to an integer-exact form): for every
    * train doc, the fraction of its distinct word shingles that are
    * RELATIVELY more frequent in the target corpus than in the train
    * corpus — i.e. shingles with df_t/|T| > df_s/|S|, compared by
    * cross-multiplication so the whole pipeline stays in exact
    * integer/decimal arithmetic (classic DSIR scores sum log-ratios;
    * IEEE log is not bit-identical across engines, a comparison is —
    * which is what lets this be oracle-GATED). High affinity = the
    * doc's vocabulary leans toward the target domain; feed the score
    * to t10/t12's weighted draws to upsample it.
    *
    * Scale shape: shingle document-frequencies are one groupBy per
    * side keyed by the 8-byte shingle hash; corpus-size totals ride a
    * broadcast 1-row frame; the leaning table full-outer-joins the
    * two count tables (vocabulary-sized, hash join); scoring is one
    * join of the train side's exploded shingles against it + one
    * per-doc re-agg. Nothing quadratic, no text in any exchange.
    * Cross-multiplied products are decimal(38,0) — exact to 10³⁸,
    * overflow-safe for any real corpus (df ≤ 10¹² docs × totals ≤
    * 10¹⁹ shingle occurrences).
    *
    * Output: (id, n_shingles, n_target_leaning, affinity).
    */
  def domainAffinity(
      train: DataFrame, target: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3,
      scope: Dedup.CacheScope = Dedup.batchScope): DataFrame = {
    def occ(df: DataFrame) = df.select(col(idCol).as("id"),
      explode(Dedup.shingleHashes(col(textCol), shingleK)).as("g"))
    // the train explode feeds BOTH the count table and the scoring
    // join — persist it so the shingle kernel reads the corpus once
    // (decontaminate's hash-once contract); the totals come from the
    // count tables for free (Σ document frequencies = the occurrence
    // total), so neither corpus is exploded a second time
    val occS = scope.persistTracked(occ(train))
    val cS = occS.groupBy("g").agg(count(lit(1)).as("c_s"))
    val cT = occ(target).groupBy("g").agg(count(lit(1)).as("c_t"))
    val totals = cS.agg(coalesce(sum("c_s"), lit(0L)).as("n_s"))
      .crossJoin(cT.agg(coalesce(sum("c_t"), lit(0L)).as("n_t")))
    val lean = cT.join(cS, Seq("g"), "full_outer")
      .select(col("g"),
        coalesce(col("c_t"), lit(0L)).as("c_t"),
        coalesce(col("c_s"), lit(0L)).as("c_s"))
      .crossJoin(broadcast(totals))
      .select(col("g"),
        (col("c_t").cast("decimal(19,0)") * col("n_s").cast("decimal(19,0)") >
         col("c_s").cast("decimal(19,0)") * col("n_t").cast("decimal(19,0)"))
          .as("lt"))
    occS.join(lean, Seq("g"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("lt"), 1L).otherwise(0L)).as("n_target_leaning"))
      .select(col("id"), col("n_shingles"), col("n_target_leaning"),
        (col("n_target_leaning").cast("double") / col("n_shingles"))
          .as("affinity"))
  }

  /** Collocation mining: top-k adjacent-token bigrams by LIFT —
    * `(c_ab · N) / (c_a · c_b)`, i.e. how much more often the pair
    * occurs than independence predicts. This is the monotone core of
    * PMI (`PMI = ln lift`): ranking by lift IS ranking by PMI, so the
    * `ln` — not bit-reproducible across engines — never needs to be
    * computed (t21's cross-multiplication stance). All four counts are
    * exact longs; the ratio is a fixed sequence of IEEE casts/mul/div,
    * bit-identical in any engine, so the result is oracle-GATED.
    * `minCount` drops hapax pairs (classic PMI degeneracy: a pair seen
    * once between two rare words gets an enormous lift).
    *
    * Scale shape: unigrams and bigrams ride ONE explode over one
    * bound token array (two transforms concatenated, tagged by kind —
    * one corpus scan, one map-side-combined count), `scope`-persisted
    * because the unigram side is consumed three times (w1 join, w2
    * join, token total). The joins key on vocabulary-sized count
    * tables — hash joins on the term, never on document text. Final
    * cut is TakeOrdered on the (lift desc, pair asc) total order.
    * Count products stay exact in double up to 2^53 ≈ 9·10^15 — above
    * that (≈10^14-token corpora × frequent pairs) the lift loses ulps
    * but both engines lose the SAME ulps.
    *
    * Output: (pair, n_pair, n_w1, n_w2, lift), best first.
    */
  def collocations(
      df: DataFrame, textCol: String, k: Int, minCount: Long = 2,
      scope: Dedup.CacheScope = Dedup.batchScope): DataFrame = {
    require(k >= 1, "collocations: k must be positive")
    require(minCount >= 1, "collocations: minCount must be >= 1")
    // tokens bound in their own projection (the t20 lambda trap:
    // inlined, the split pipeline re-runs per element)
    val toked = df.select(tokens(col(textCol)).as("_cl_toks"))
    val toks = col("_cl_toks")
    val pairs = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
    val counts = scope.persistTracked(
      toked.select(explode(concat(
          transform(toks, t => struct(lit(0).as("kind"), t.as("gram"))),
          transform(pairs, p => struct(lit(1).as("kind"), p.as("gram")))))
          .as("g"))
        .groupBy(col("g.kind").as("kind"), col("g.gram").as("gram"))
        .agg(count(lit(1)).as("n")))
    val uni = counts.where(col("kind") === 0)
      .select(col("gram").as("w"), col("n").as("c"))
    val bi = counts.where(col("kind") === 1 && col("n") >= minCount)
      .select(col("gram").as("pair"), col("n").as("n_pair"),
        split(col("gram"), " ").getItem(0).as("_w1"),
        split(col("gram"), " ").getItem(1).as("_w2"))
    val total = uni.agg(coalesce(sum("c"), lit(0L)).as("n_total"))
    bi.join(uni.withColumnRenamed("w", "_w1").withColumnRenamed("c", "n_w1"),
        Seq("_w1"))
      .join(uni.withColumnRenamed("w", "_w2").withColumnRenamed("c", "n_w2"),
        Seq("_w2"))
      .crossJoin(broadcast(total))
      .select(col("pair"), col("n_pair"), col("n_w1"), col("n_w2"),
        ((col("n_pair").cast("double") * col("n_total").cast("double")) /
          (col("n_w1").cast("double") * col("n_w2").cast("double")))
          .as("lift"))
      .orderBy(col("lift").desc, col("pair").asc)
      .limit(k)
  }

  /** Token frequency-of-frequencies — the Zipf spectrum diagnostic
    * ("how many terms occur exactly n times"). Tokenizer and corpus
    * health both read off this table: a healthy natural corpus has a
    * hapax mass around half the vocabulary; a boilerplate-flooded or
    * template corpus collapses the low-frequency tail, and a broken
    * tokenizer explodes it. `vocab_frac` = n_terms / vocab_size is a
    * single long/long IEEE division (bit-identical cross-engine).
    *
    * Scale shape: explode → map-side-combined term counts (the t09
    * shuffle) → a second, frequency-keyed aggregate whose output is
    * tiny (distinct frequency VALUES — tens to hundreds of rows at any
    * corpus size); `scope` persists that small table for its two
    * consumers (rows + vocab total), so the corpus-sized stages run
    * once.
    */
  def frequencySpectrum(
      df: DataFrame, textCol: String,
      scope: Dedup.CacheScope = Dedup.batchScope): DataFrame = {
    val spectrum = scope.persistTracked(
      df.select(explode(tokens(col(textCol))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("freq"))
        .groupBy("freq").agg(count(lit(1)).as("n_terms")))
    spectrum
      .crossJoin(broadcast(spectrum.agg(
        coalesce(sum("n_terms"), lit(0L)).as("vocab_size"))))
      .select(col("freq"), col("n_terms"), col("vocab_size"),
        (col("n_terms").cast("double") / col("vocab_size").cast("double"))
          .as("vocab_frac"))
  }

  // ───────────── n-gram language-model perplexity (CCNet-style) ─────────────

  /** Beginning-of-sentence marker prepended to every document's token
    * stream so the first real token is conditioned on a context too.
    * A plain literal: [[tokens]] lowercases, so a corpus token can
    * collide with it only as the literal string "<s>" — which then
    * (correctly) shares the boundary context's statistics.
    */
  private[operators] val LmBos = "<s>"

  /** A trained bigram language model as three count frames — the
    * vocabulary-bounded artifacts a scorer joins against (train once,
    * score many: batch re-scores and per-micro-batch streaming twins
    * reuse the same frames).
    *
    *  - `bigrams`:  (prev, cur, c_bi) — bigram occurrence counts
    *  - `contexts`: (prev, c_ctx)     — context occurrence counts
    *  - `vocab`:    1 row (v)         — distinct token-type count
    */
  final case class BigramLm(bigrams: DataFrame, contexts: DataFrame,
                            vocab: DataFrame)

  /** Document token stream as exploded (prev, cur) bigram rows, BOS
    * prepended. Fully declarative: the token array is bound in its own
    * projection (the t20 lambda trap — inlined, the split re-runs per
    * consumer), bigrams are a zip of the array against its own shift,
    * and a zero-token document yields no rows (empty zip).
    */
  private def docBigrams(df: DataFrame, idCol: String,
                         textCol: String): DataFrame = {
    val toked = df.select(col(idCol).as("id"),
      concat(array(lit(LmBos)), tokens(col(textCol))).as("_a"))
    toked.select(col("id"),
        explode(zip_with(
          slice(col("_a"), lit(1), size(col("_a")) - 1),
          slice(col("_a"), lit(2), size(col("_a")) - 1),
          (p, c) => struct(p.as("prev"), c.as("cur")))).as("bg"))
      .select(col("id"), col("bg.prev").as("prev"), col("bg.cur").as("cur"))
  }

  /** Train an add-one-smoothed bigram LM on a corpus: the count side
    * of the CCNet-style perplexity filter (score docs against an LM of
    * a trusted corpus; drop the high-perplexity tail).
    *
    * Scale shape: ONE corpus scan — bigram counts ride a single
    * map-side-combined groupBy keyed by the (prev, cur) pair; context
    * counts and the vocabulary size are re-aggregations of that
    * vocabulary²-bounded count table, never of the corpus. `scope`
    * persists the count table for its three consumers.
    */
  def bigramLmTrain(train: DataFrame, textCol: String,
      scope: Dedup.CacheScope = Dedup.batchScope): BigramLm = {
    val bg = docBigrams(train.select(lit(0L).as("_lm_id"), col(textCol)),
      "_lm_id", textCol)
    val cBi = scope.persistTracked(
      bg.groupBy("prev", "cur").agg(count(lit(1)).as("c_bi")))
    val cCtx = cBi.groupBy("prev").agg(sum("c_bi").as("c_ctx"))
    val vocab = cBi.agg(countDistinct("cur").as("v"))
    BigramLm(cBi, cCtx, vocab)
  }

  /** Score documents against a trained [[BigramLm]]: per-token
    * add-one-smoothed conditional probability
    * `p(cur|prev) = (c_bi + 1) / (c_ctx + V)`, per-document perplexity
    * `exp(−mean ln p)`.
    *
    * Cross-engine exactness stance: a raw double Σ ln p is
    * partition-order-dependent, so each token's log-probability is
    * quantized to MICRO-NATS first — `round(ln p · 10⁶)` as a long —
    * and the per-doc sum is an exact, order-independent integer
    * (`lp_micro`, the primary oracle-compared value; `ppl` is one
    * fixed exp/div sequence of it). The only cross-engine freedom left
    * is `ln` itself (1-ulp engines differ only when ln p · 10⁶ lands
    * within an ulp of a rounding boundary — LmPerplexityFuzz pins the
    * measured margin; the same boundary stance as r6 everywhere else).
    *
    * Scale shape: the corpus-sized stages are one bigram explode, one
    * hash join against the vocabulary²-bounded bigram counts, one
    * against the vocabulary-bounded context counts (both declarative —
    * AQE broadcasts them when they fit, shuffles on the term keys when
    * a 100 TB corpus's vocabulary doesn't; frequent-token skew is
    * AQE's skew-join case), a 1-row broadcast of V, and one per-doc
    * re-agg riding map-side combine. Zero-token documents yield no
    * row (no tokens → no perplexity; join back on an id spine to
    * restore them if a consumer needs every doc).
    *
    * Output: (idCol, n_tokens, lp_micro, ppl) — ppl raw double;
    * round at the consumer.
    */
  def bigramLmPerplexity(lm: BigramLm, docs: DataFrame, idCol: String,
                         textCol: String): DataFrame = {
    val p = (coalesce(col("c_bi"), lit(0L)) + lit(1L)).cast("double") /
      (coalesce(col("c_ctx"), lit(0L)) + col("v")).cast("double")
    docBigrams(docs, idCol, textCol)
      .join(lm.bigrams, Seq("prev", "cur"), "left")
      .join(lm.contexts, Seq("prev"), "left")
      .crossJoin(broadcast(lm.vocab))
      .select(col("id"),
        floor(log(p) * lit(1e6) + lit(0.5)).as("_lq"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum("_lq").as("lp_micro"))
      .select(col("id").as(idCol), col("n_tokens"), col("lp_micro"),
        exp(-(col("lp_micro").cast("double") / lit(1e6)
          / col("n_tokens").cast("double"))).as("ppl"))
  }

  /** Curation funnel report: per source, how many documents each
    * stage of the c01 curation pipeline drops — quality gate first,
    * then repetition, then exact-dedup survivor selection — with
    * mutually exclusive attribution in STAGE ORDER (a doc failing
    * both quality and repetition counts against quality, the stage
    * that actually dropped it). The report every curation run hands
    * its owner before the corpus ships.
    *
    * Same single-pass plan as c01: one scan, one window exchange keyed
    * on the 8-byte content hash (never document text), one bounded
    * per-source aggregate. The survivor window takes `min(doc_id)`
    * over METRIC-PASSING rows only (conditional min — null-skipping),
    * which equals c01's filter-then-window because duplicate groups
    * share their text and therefore their metrics. The dup-group key
    * is (xxhash64(text), length(text)), not the raw text — the d01
    * stance: at 100 TB the exchange ships 16-byte keys, not
    * documents, at the cost that two DIFFERENT texts colliding on
    * BOTH the 64-bit hash and their length would merge groups and
    * misattribute their drops (probability ~n²/2⁻⁶⁴ per equal-length
    * stratum; partition by the raw text if that is unacceptable).
    *
    * Output: (srcCol, n_docs, n_quality_drop, n_repetition_drop,
    * n_dup_drop, n_kept, keep_rate) — keep_rate an exact long/long
    * division.
    */
  /** Corpus composition report: one row per source with doc/token
    * counts, corpus shares and the dominant language — the first
    * table a pipeline owner reads when sizing a training mix (t15's
    * allocation wants exactly these shares as input).
    *
    * Scale shape: ONE corpus scan into a (source, lang)-keyed
    * map-side-combined aggregate; everything after operates on that
    * bounded |sources|·|langs| table — the c05 two-level rollup
    * stance (the window for the dominant language partitions the
    * BOUNDED table, not the corpus; totals are a 1-row aggregate of
    * it, broadcast back). Shares are single divisions of exact longs
    * (CAST then divide — the same IEEE op in any engine); dominant
    * language is an exact count argmax, ties → lexicographically
    * lowest lang.
    *
    * Output: (source, n_docs, n_tokens, doc_share, token_share,
    * top_lang, top_lang_n), one row per source.
    */
  def sourceMix(df: DataFrame, idCol: String, textCol: String,
      langCol: String, sourceCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(sourceCol).as("source"),
      col(langCol).as("lang"),
      wsTokenCount(col(textCol)).cast("long").as("n_tok"))
    val sl = base.groupBy("source", "lang")
      .agg(count(lit(1)).as("nd"), sum("n_tok").as("nt"))
    val bySource = sl.groupBy("source")
      .agg(sum("nd").as("n_docs"), sum("nt").as("n_tokens"))
    val totals = bySource.agg(sum("n_docs").as("td"),
      sum("n_tokens").as("tt"))
    val top = sl.withColumn("_sm_rn", row_number().over(
        Window.partitionBy("source")
          .orderBy(col("nd").desc, col("lang").asc)))
      .where(col("_sm_rn") === 1)
      .select(col("source"), col("lang").as("top_lang"),
        col("nd").as("top_lang_n"))
    bySource.join(top, "source").crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        (col("n_docs").cast("double") / col("td").cast("double"))
          .as("doc_share"),
        (col("n_tokens").cast("double") / col("tt").cast("double"))
          .as("token_share"),
        col("top_lang"), col("top_lang_n"))
  }

  def curationFunnel(df: DataFrame, idCol: String, textCol: String,
      srcCol: String, qualityMin: Double = 0.75,
      dupWordMax: Double = 0.7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qual = qualityScore(col(textCol))
    val dwf = dupWordFrac(col(textCol))
    val passes = col("_f_qual") >= qualityMin && col("_f_dwf") <= dupWordMax
    df.select(col(idCol).as("_f_id"), col(srcCol), col(textCol),
        qual.as("_f_qual"), dwf.as("_f_dwf"))
      .withColumn("_f_surv",
        min(when(passes, col("_f_id")))
          .over(Window.partitionBy(
            xxhash64(col(textCol)), length(col(textCol)))))
      .groupBy(srcCol)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("_f_qual") < qualityMin, 1L).otherwise(0L))
          .as("n_quality_drop"),
        sum(when(col("_f_qual") >= qualityMin &&
          col("_f_dwf") > dupWordMax, 1L).otherwise(0L))
          .as("n_repetition_drop"),
        sum(when(passes && col("_f_id") =!= col("_f_surv"), 1L)
          .otherwise(0L)).as("n_dup_drop"),
        sum(when(passes && col("_f_id") === col("_f_surv"), 1L)
          .otherwise(0L)).as("n_kept"))
      .withColumn("keep_rate",
        col("n_kept").cast("double") / col("n_docs").cast("double"))
  }

  /** A [[BigramLm]] collected to driver-side maps for broadcast — the
    * streaming scorer's model form (CCNet's actual shape: the LM is
    * trained on a bounded trusted corpus and shipped to workers; a
    * model that doesn't fit a broadcast belongs on the batch join
    * path). Collect is bounded by the TRAIN corpus's bigram-type
    * count, not the scored corpus.
    */
  final case class BigramLmLocal(
      bigrams: Map[(String, String), Long],
      contexts: Map[String, Long], v: Long)

  /** Collect a trained [[BigramLm]] into its broadcastable form. */
  def collectLm(lm: BigramLm): BigramLmLocal = BigramLmLocal(
    lm.bigrams.collect().map(r =>
      (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap,
    lm.contexts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap,
    lm.vocab.head().getLong(0))

  /** Local twin of [[tokens]], op-for-op: UTF8String lowercase then
    * space-trim (Spark's `lower`/`trim` exactly — String.trim would
    * also strip control chars, String.toLowerCase can diverge on
    * locale-sensitive codepoints), regex split, drop empties.
    */
  private[operators] def tokensLocal(text: String): Array[String] =
    org.apache.spark.unsafe.types.UTF8String.fromString(text)
      .toLowerCase.trim().toString.split("\\s+").filter(_.nonEmpty)

  /** Stateless streaming twin of [[bigramLmPerplexity]]: one narrow
    * map per document against the broadcast model — no explode, no
    * join, no aggregation state, so it runs in append mode with no
    * watermark and survives any micro-batch slicing (per-doc scores
    * don't cross rows). Exact-parity contract with the batch scorer:
    * the same micro-nat quantization per token — literally
    * `Math.floor(x + 0.5).toLong`, the batch path's `floor(x + 0.5)`
    * operation (NOT `Math.round`, which since JDK-8010430 differs
    * from floor(x+0.5) for doubles one ulp below a half-integer) —
    * the same long sum, the same exp/div sequence — StreamingSpec
    * pins row-identical output on the real corpus. Works unchanged on
    * batch frames (it's a plain DataFrame transform).
    */
  def streamingLmPerplexity(docs: DataFrame, lm: BigramLmLocal,
                            idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(lm)
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val m = bc.value
        it.flatMap { case (id, text) =>
          val toks = tokensLocal(text)
          if (toks.isEmpty) None
          else {
            var prev = LmBos
            var sum = 0L
            var n = 0
            toks.foreach { cur =>
              val cbi = m.bigrams.getOrElse((prev, cur), 0L)
              val cctx = m.contexts.getOrElse(prev, 0L)
              val p = (cbi + 1L).toDouble / (cctx + m.v).toDouble
              // StrictMath, not scala.math: Spark's codegen for
              // log/exp calls java.lang.StrictMath (verified in the
              // 4.1.2 bytecode), and the parity contract is bit-exact.
              // floor(x+0.5), not Math.round: they differ for doubles
              // one ulp below a half-integer (JDK-8010430), and the
              // batch expression is floor(log·1e6 + 0.5).
              sum += Math.floor(
                java.lang.StrictMath.log(p) * 1e6 + 0.5).toLong
              n += 1
              prev = cur
            }
            Some((id, n.toLong, sum,
              java.lang.StrictMath.exp(-(sum.toDouble / 1e6 / n))))
          }
        }
      }.toDF(idCol, "n_tokens", "lp_micro", "ppl")
  }

  /** The full per-document analysis row. */
  def analyze(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      langId(col(textCol)).as("lang_pred"),
      wsTokenCount(col(textCol)).as("n_ws_tokens"),
      bpePieceCount(col(textCol)).as("n_bpe_pieces"),
      fingerprint64(col(textCol)).as("fingerprint"))
}
