package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

import graft.queries.Relational

/** Physical-plan audits: the scale properties SURVEY.md §4 promises
  * must be visible in the plans, not just hoped for. Each assertion
  * here is something that, if it regressed, would turn a 100 TB run
  * from a pruned scan into a full-table read or an avoidable shuffle.
  */
class PlanAuditSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    // other specs cache test tables; a cached relation would shadow
    // the parquet scan these audits inspect
    spark.catalog.clearCache()
  }

  private def explain(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def build(name: String): DataFrame =
    (Relational.all ++ graft.queries.Pipeline.all)
      .find(_.name == name).get.build(spark, sfDir)

  test("q01: filter is pushed into the parquet scan") {
    val plan = explain(build("q01_scan_project"))
    assert(plan.contains("PushedFilters: [IsNotNull(l_orderkey), LessThan(l_orderkey,100)]"),
      s"filter not pushed:\n$plan")
  }

  test("q01: scan reads only the three projected columns") {
    val plan = explain(build("q01_scan_project"))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_linenumber") &&
      readSchema.contains("l_extendedprice"))
    assert(!readSchema.contains("l_quantity") && !readSchema.contains("l_shipdate"),
      s"column pruning failed: $readSchema")
  }

  test("q02: timestamp range predicates reach the scan") {
    val plan = explain(build("q02_filter"))
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(l_shipdate") &&
      plan.contains("LessThan(l_shipdate"), s"date pushdown missing:\n$plan")
  }

  test("q03: aggregation is partial (map-side) before the exchange") {
    val plan = explain(build("q03_agg_pricing"))
    assert(plan.contains("HashAggregate"), plan)
    // partial agg appears under the scan stage, final above exchange
    assert(plan.contains("partial_sum"), s"no partial aggregation:\n$plan")
  }

  test("q16: dimension joins broadcast rather than shuffle both sides") {
    val df = build("q16_join_multi")
    df.collect() // let AQE finalize
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("q12: embeddings scan prunes to the two referenced columns") {
    val plan = explain(build("q12_array_index"))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("label"), s"label not pruned: $readSchema")
  }

  test("relational suite stays inside whole-stage codegen") {
    val df = build("q03_agg_pricing")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1)"), s"nothing codegen-fused:\n$plan")
  }

  test("q39: events scan prunes to the two referenced columns") {
    val plan = explain(build("q39_json_extract"))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("event_type") && readSchema.contains("props"))
    assert(!readSchema.contains("user_id") && !readSchema.contains("value"),
      s"column pruning failed: $readSchema")
  }

  test("q41: decimal power sums aggregate map-side before the exchange") {
    val plan = explain(build("q41_stats_moments"))
    assert(plan.contains("partial_sum"), s"no partial aggregation:\n$plan")
    assert(plan.contains("partial_count"), s"no partial count:\n$plan")
  }

  test("t09 heavy hitters: map-side combine + TakeOrdered, no global sort") {
    val plan = explain(build("t09_heavy_hitters"))
    assert(plan.contains("partial_count"), s"map-side combine missing:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k should be a bounded heap, not a sort:\n$plan")
  }

  test("s06 quantized knn: one scan, bounded top-k, zero exchanges") {
    // the raw operator (the Pipeline entry adds a presentation sort of
    // the 20-row result, which is an Exchange but not a data-scale one)
    val emb = Tables.load(spark, sfDir, "embeddings")
    val qv = emb.orderBy("vec_id").select("embedding")
      .head().getSeq[Float](0).toArray
    val plan = explain(
      graft.operators.Similarity.knnQuantized(emb, "vec_id", "embedding", qv, 20))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k should be a bounded heap:\n$plan")
    assert(!plan.contains("Exchange"),
      s"quantized scan+rank must not shuffle:\n$plan")
  }

  test("s23 packed sweep: exchange count is rounds-independent — beam rounds are fold projections, not shuffles") {
    // round 19: the pre-packed form ran one join+window exchange PER
    // beam round per config (9 sequential exchanges across the swept
    // configs — the stage-latency variance the r18 verdict flagged).
    // The packed fold's rounds live inside ONE aggregate() expression,
    // so doubling rounds must not add a single exchange to the plan.
    import graft.operators.Similarity
    val emb = Tables.load(spark, sfDir, "embeddings")
    val queries = emb.orderBy("vec_id").limit(3)
      .select(org.apache.spark.sql.functions.col("vec_id").as("qid"),
        org.apache.spark.sql.functions.col("embedding"))
    def exchanges(rounds: Int): Int =
      "Exchange".r.findAllIn(explain(
        Similarity.hnswTuningEval(queries, "qid", "embedding",
          emb, "vec_id", "embedding", k = 10, nCells = 16, nProbe = 4,
          configs = Seq((6, 12, rounds))))).size
    val base = exchanges(4)
    assert(base == exchanges(8),
      s"exchange count grew with rounds: $base vs ${exchanges(8)} — " +
        "a beam round has re-entered the shuffle path")
    graft.operators.Dedup.unpersistAll()
  }

  test("s22 packed inline walk: exchange count is rounds-independent — the round-19 fold, not the per-round join/window chain") {
    // round 19 optimization: the inline knnHnsw referenced the beam
    // subtree twice per round (cand = beam ∪ beam⋈edges), doubling
    // the shared subtree every round — rounds=4 planned 214 Exchange
    // nodes. The packed fold keeps every beam round inside ONE
    // aggregate() expression, so doubling rounds must not add a
    // single exchange, and the total must stay far under the old
    // blown-up shape.
    import graft.operators.Similarity
    val emb = Tables.load(spark, sfDir, "embeddings")
    val qv = emb.orderBy("vec_id").select("embedding")
      .head().getSeq[Float](0).toArray
    def exchanges(rounds: Int): Int =
      "Exchange".r.findAllIn(explain(
        Similarity.knnHnsw(emb, "vec_id", "embedding", qv, k = 10,
          nCells = 16, nProbe = 4, m = 6, ef = 12,
          rounds = rounds))).size
    val base = exchanges(4)
    assert(base == exchanges(8),
      s"exchange count grew with rounds: $base vs ${exchanges(8)} — " +
        "a beam round has re-entered the shuffle path")
    assert(base <= 12, s"packed inline walk has $base exchanges — " +
      "the linear-plan contract is broken")
    graft.operators.Dedup.unpersistAll()
  }

  test("d01 exact dedup is a single hash-shuffle aggregation") {
    val plan = explain(build("d01_dedup_exact"))
    // one Exchange for the groupBy, one for the final orderBy — no join
    assert(!plan.contains("Join"), s"dedup should not join:\n$plan")
    assert(plan.contains("partial_min"), s"map-side combine missing:\n$plan")
  }

  test("d05 banding exchange carries (id, band, sig) — never the vectors") {
    val plan = explain(build("d05_dedup_embedding"))
    // formatted explain prints one block per operator; every Exchange
    // partitioned on the band key must not move embedding payloads —
    // vectors re-enter later via hash joins keyed on id only
    val blocks = plan.split("\n\n")
    // shuffle Exchange at scale, BroadcastExchange when AQE sizes the
    // banded side under the broadcast threshold — either way it must
    // not carry vectors
    val bandExchanges = blocks.filter(b =>
      b.contains("Exchange") && b.contains("band"))
    assert(bandExchanges.nonEmpty, s"no banding exchange found:\n$plan")
    bandExchanges.foreach { b =>
      assert(!b.contains("vec") && !b.contains("embedding"),
        s"banding exchange carries vectors:\n$b")
    }
  }

  test("s04 batch knn: queries broadcast, topk aggregation is partial (map-side heaps)") {
    val df = build("s04_knn_batch")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"query side must broadcast:\n$plan")
    // partial topk_rows before the exchange: the shuffle carries ≤k
    // rows per (query, partition), not every scored row
    assert(plan.contains("partial_topk_rows"),
      s"no map-side topk aggregation:\n$plan")
  }

  test("d02/d07 banding exchanges carry (id, band, bucket) — never text or shingles") {
    for (name <- Seq("d02_dedup_minhash", "d07_decontaminate")) {
      val plan = explain(build(name))
      val blocks = plan.split("\n\n")
      val bandExchanges = blocks.filter(b =>
        b.contains("Exchange") && b.contains("band"))
      assert(bandExchanges.nonEmpty, s"$name: no banding exchange:\n$plan")
      bandExchanges.foreach { b =>
        assert(!b.contains("text") && !b.contains("sh#") && !b.contains("sig"),
          s"$name banding exchange carries document payloads:\n$b")
      }
    }
  }

  test("d02/d07 hash each corpus once: every shingle kernel sits under the cache") {
    // minhashDuplicates/decontaminate persist the (id, sh) projection;
    // signature/banding and the verify join sides must read the cache,
    // never re-run the kernel. In the executed-plan string, each
    // InMemoryTableScan prints its cached build plan (containing the
    // kernel) — so kernel mentions must equal InMemoryRelation
    // mentions; a live (uncached) kernel evaluation breaks the
    // equality.
    for (name <- Seq("d02_dedup_minhash", "d07_decontaminate")) {
      val df = build(name)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val kernels = "token_shingle_hashes".r.findAllIn(plan).size
      val cached = "InMemoryRelation".r.findAllIn(plan).size
      assert(cached > 0, s"$name no longer caches the hashed corpus:\n$plan")
      assert(kernels == cached,
        s"$name evaluates the shingle kernel outside the cache " +
          s"($kernels kernels vs $cached cached relations):\n$plan")
    }
  }

  test("s07 batch ivf knn: probes broadcast, no cartesian, map-side heaps") {
    val df = build("s07_knn_ivf_batch")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the (query, cell) probe side must broadcast against the
    // cell-assigned corpus — the corpus is never shuffled to meet the
    // queries, and nothing degenerates to a cartesian product
    assert(plan.contains("BroadcastHashJoin"),
      s"probe side not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"batch ivf degenerated to a cartesian product:\n$plan")
    // top-k heaps combine map-side: the shuffle into the final
    // aggregate carries partial heaps, not scored rows
    assert(plan.contains("partial_topk_rows"),
      s"topk aggregation not partial:\n$plan")
  }

  test("sort+limit compiles to TakeOrderedAndProject (no global sort)") {
    val df = Tables.load(spark, sfDir, "orders")
      .orderBy(org.apache.spark.sql.functions.col("o_totalprice").desc)
      .limit(5)
    val plan = explain(df)
    assert(plan.contains("TakeOrderedAndProject"), s"full sort materialized:\n$plan")
  }

  test("t11/t13/t16/p01/p02: documents scan prunes to (doc_id, text)") {
    for (q <- Seq("t11_repetition", "t13_pii_redaction", "t16_line_cleaning",
        "p01_pack_sequences", "p02_chunk_windows")) {
      val plan = explain(build(q))
      val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
      assert(readSchema.contains("doc_id") && readSchema.contains("text") &&
        !readSchema.contains("lang") && !readSchema.contains("source") &&
        !readSchema.contains("n_chars"),
        s"$q column pruning failed: $readSchema")
    }
  }

  test("t17/d10: documents scans prune to (doc_id, text); t17 keys lines by hash") {
    for (q <- Seq("t17_corpus_line_dedup", "d10_ngram_overlap")) {
      val plan = explain(build(q))
      val schemas = plan.linesIterator.filter(_.contains("ReadSchema")).toList
      assert(schemas.nonEmpty, s"$q: no scans found")
      assert(schemas.forall(s => s.contains("doc_id") && s.contains("text") &&
        !s.contains("lang") && !s.contains("source")),
        s"$q column pruning failed: $schemas")
    }
    // the common-line aggregation must key on xxhash64(line) — an
    // exchange keyed on raw line strings would sort KB keys at 100 TB
    // (same contract as d01/c01's content hashing)
    val opt = build("t17_corpus_line_dedup")
      .queryExecution.optimizedPlan.toString
    assert(opt.contains("xxhash64(_ld_line"),
      s"t17 common-line groupBy should key on xxhash64:\n$opt")
  }

  test("t19/t20/t21: documents scans prune to exactly the used columns") {
    // t19 builds URLs from doc_id alone — text must not be read
    val rs19 = explain(build("t19_url_normalize"))
      .linesIterator.find(_.contains("ReadSchema")).get
    assert(rs19.contains("doc_id") && !rs19.contains("text"), rs19)
    // t20 tokenizes text alone — doc_id must not be read
    val rs20 = explain(build("t20_bigram_merges"))
      .linesIterator.find(_.contains("ReadSchema")).get
    assert(rs20.contains("text") && !rs20.contains("doc_id"), rs20)
    // and its corpus-wide count combines map-side, top-k is bounded
    val phys20 = build("t20_bigram_merges")
      .queryExecution.executedPlan.toString
    assert(phys20.contains("partial_count"), phys20.take(1500))
    assert(phys20.contains("TakeOrderedAndProject"),
      "t20 top-k should be TakeOrdered, not a global sort")
    val schemas21 = explain(build("t21_domain_affinity"))
      .linesIterator.filter(_.contains("ReadSchema")).toList
    assert(schemas21.nonEmpty && schemas21.forall(s =>
      s.contains("doc_id") && s.contains("text") && !s.contains("lang")),
      schemas21.toString)
  }

  test("t15: documents scan prunes to (source, text); one partial aggregate") {
    val df = build("t15_mix_allocation")
    val plan = explain(df)
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("source") && readSchema.contains("text") &&
      !readSchema.contains("doc_id") && !readSchema.contains("lang"),
      s"t15 column pruning failed: $readSchema")
    // the corpus-touching aggregation combines map-side; the global
    // window only ever sees the aggregated per-source frame
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("partial_count") ||
      physical.contains("partial_sum"),
      s"t15 aggregation not partial:\n$physical")
  }

  test("t35/t36: unigram-family scans prune to used columns; corpus aggregates combine map-side") {
    for (q <- Seq("t35_mix_unigram", "t36_unigram_coverage")) {
      val df = build(q)
      val plan = explain(df)
      // the encode reads (doc_id, text), the rollup adds source — a
      // scan of lang/n_chars would be 100 TB of wasted bytes
      val schemas = plan.linesIterator
        .filter(_.contains("ReadSchema")).toList
      assert(schemas.nonEmpty, s"$q: no scans found")
      assert(schemas.forall(s =>
        !s.contains("lang") && !s.contains("n_chars")),
        s"$q column pruning failed: $schemas")
      // the corpus-touching aggregation combines map-side; t35's
      // global rate window only ever sees the per-source frame
      // (t15's stance — the t27/t30 twins inherit it)
      val physical = df.queryExecution.executedPlan.toString
      assert(physical.contains("partial_count") ||
        physical.contains("partial_sum"),
        s"$q aggregation not partial:\n$physical")
    }
  }

  test("s09/t22/t23/c02: documents scans prune to exactly the used columns") {
    // every session-4 text query reads (doc_id, text) or less — a scan
    // of lang/source/n_chars would be 100 TB of wasted bytes
    for (q <- Seq("s09_bm25", "t22_collocations", "t23_freq_spectrum",
        "c02_url_dedup")) {
      val plan = explain(build(q))
      val schemas = plan.linesIterator
        .filter(_.contains("ReadSchema")).toList
      assert(schemas.nonEmpty, s"$q: no scans found")
      assert(schemas.forall(s =>
        !s.contains("lang") && !s.contains("source") &&
          !s.contains("n_chars")),
        s"$q column pruning failed: $schemas")
    }
    // t22/t23 read ONLY text (no id survives into the aggregates)
    for (q <- Seq("t22_collocations", "t23_freq_spectrum")) {
      val plan = explain(build(q))
      val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
      assert(!readSchema.contains("doc_id"),
        s"$q should not read doc_id: $readSchema")
    }
  }

  test("s13/p05/c07/d15: session-3 scans prune to exactly the used columns") {
    // s13/p05 read (doc_id, text) or less; lang/source/n_chars would
    // be wasted bytes at 100 TB
    for (q <- Seq("s13_phrase_search", "p05_length_buckets")) {
      val plan = explain(build(q))
      val schemas = plan.linesIterator
        .filter(_.contains("ReadSchema")).toList
      assert(schemas.nonEmpty, s"$q: no scans found")
      assert(schemas.forall(s =>
        !s.contains("lang") && !s.contains("source") &&
          !s.contains("n_chars")),
        s"$q column pruning failed: $schemas")
    }
    // c07 reads (text, lang, source) — never n_chars or doc_id
    val c07 = explain(build("c07_source_mix")).linesIterator
      .filter(_.contains("ReadSchema")).toList
    assert(c07.nonEmpty && c07.forall(s =>
      !s.contains("n_chars") && !s.contains("doc_id")), c07.toString)
    // d15 reads (vec_id, embedding) — never the label column
    val d15 = explain(build("d15_semdedup")).linesIterator
      .filter(_.contains("ReadSchema")).toList
    assert(d15.nonEmpty && d15.forall(s => !s.contains("label")),
      d15.toString)
  }

  test("s13: anchors and occurrences aggregate map-side, heap partial") {
    // the alignment join's aggregates must emit partials below their
    // exchanges — the shuffle carries per-partition partial counts,
    // never raw (doc, query, position) match rows
    val plan = explain(build("s13_phrase_search"))
    assert(plan.contains("partial_count"),
      s"anchor counting not map-side combined:\n$plan")
    assert(plan.contains("partial_topk_rows"),
      s"topk must aggregate map-side:\n$plan")
  }

  test("e04: the lead window and its filter ride ONE user_id exchange") {
    val plan = build("e04_transitions")
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning(user_id"))
    assert(exchanges == 1,
      s"expected one user_id exchange for the transition window, " +
        s"got $exchanges:\n$plan")
  }

  test("s09: per-term contributions aggregate map-side (partial before exchange)") {
    // the (query, doc) score sum and the topk heap must both emit
    // partials below their exchanges — at 100 TB the shuffle carries
    // per-partition partials, never raw per-term rows
    val plan = explain(build("s09_bm25"))
    assert(plan.contains("partial_topk_rows"),
      s"topk must aggregate map-side:\n$plan")
  }

  test("e06: the path window, its cap filter, and the collect ride ONE exchange") {
    // the row_number cap and the collect_list groupBy share the
    // (user, day) partitioning — a second exchange would mean the cap
    // stopped protecting the aggregation buffer
    val plan = build("e06_top_paths")
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning") &&
        l.contains("user_id"))
    assert(exchanges == 1,
      s"expected one (user, day) exchange, got $exchanges:\n$plan")
    assert(plan.contains("_tp_rn"), s"cap filter missing from plan:\n$plan")
  }

  test("q43: orders-side filters push to the bloom build's scan") {
    val plan = explain(build("q43_bloom_join"))
    assert(plan.contains("EqualTo(o_orderpriority,1-URGENT)") &&
      plan.contains("GreaterThan(o_totalprice"),
      s"build-side pushdown missing:\n$plan")
  }

  test("c01: metric filters below the survivor window; window keys on hash") {
    // Two pins. (1) The quality/repetition predicates evaluate BEFORE
    // the content exchange — filtered-out rows never pay the shuffle.
    // (2) The window partitions on xxhash64(text), so the exchange and
    // its in-partition sort compare 8-byte keys, not full documents —
    // at 100 TB that is the difference between hashing and shipping
    // KB-MB sort keys in the heaviest query of the suite.
    val plan = build("c01_curate").queryExecution.optimizedPlan.toString
    val lines = plan.linesIterator.toVector
    val windowIdx = lines.indexWhere(_.contains("Window ["))
    val metricFilterIdx = lines.indexWhere(l =>
      l.contains("Filter") && l.contains("regexp_replace"))
    assert(windowIdx >= 0 && metricFilterIdx >= 0, plan)
    assert(metricFilterIdx > windowIdx,
      s"metric filter should sit below (print after) the window:\n$plan")
    val windowLine = lines(windowIdx)
    assert(plan.contains("xxhash64(text"),
      s"survivor window should partition on xxhash64(text):\n$plan")
    assert(!windowLine.matches(""".*windowspecdefinition\(text#.*"""),
      s"survivor window must not key on the raw document text:\n$plan")
  }

  test("AQE splits a skewed shuffle-join partition (skew=true in the final plan)") {
    // §4 claims AQE handles join skew at runtime alongside q45's
    // compile-time salting; this pins that the claim actually fires:
    // a 90%-hot key under a forced SortMergeJoin, thresholds lowered
    // to test scale, must execute as SortMergeJoin(skew=true) — the
    // hot partition split across tasks instead of one straggler.
    import org.apache.spark.sql.functions.{col, lit, when}
    import spark.implicits._
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k =>
      k -> scala.util.Try(spark.conf.get(k)).toOption).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32kb")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16kb")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val left = spark.range(200000).select(
        when($"id" % 10 =!= 0, lit(0L)).otherwise($"id").as("k"),
        $"id".as("v"))
      val right = spark.range(1000).select($"id".as("k2"), ($"id" * 2).as("w"))
      val joined = left.join(right, col("k") === col("k2"))
      joined.queryExecution.toRdd.count() // run it: AQE decides at runtime
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q45: salted aggregation aggregates map-side in both phases") {
    val plan = build("q45_salted_agg").queryExecution.executedPlan.toString
    val partials = plan.linesIterator.count(_.contains("partial_sum"))
    assert(partials >= 2,
      s"expected map-side partial aggregation in both salt phases:\n$plan")
  }

  test("c04: per-domain cap is bounded-heap partials, never a corpus row_number window") {
    val phys = build("c04_domain_cap").queryExecution.executedPlan.toString
    // cap winners come from map-side topk heaps (≤cap rows per
    // (domain, input partition) on the exchange); a row_number window
    // here would sort every domain's full document set
    assert(phys.contains("partial_topk_rows"),
      s"domain cap must aggregate map-side heaps:\n$phys")
    assert(!phys.contains("Window"),
      s"unexpected window operator in the cap plan:\n$phys")
  }

  test("d13: window-hash count is map-side partial; islands window is doc-partitioned") {
    val plan = build("d13_substring_dedup").queryExecution.optimizedPlan.toString
    val phys = build("d13_substring_dedup").queryExecution.executedPlan.toString
    // the duplicated-hash set comes from a partial (map-side) count on
    // the 8-byte window hash — the corpus-sized aggregate must combine
    // before its exchange
    assert(phys.contains("partial_count"),
      s"window-hash count is not map-side combined:\n$phys")
    // the span-merge window partitions by doc id — a SinglePartition
    // window here would serialize the corpus through one task
    val windowLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.nonEmpty)
    assert(windowLines.forall(_.contains("doc_id")),
      s"islands window not partitioned by doc:\n${windowLines.mkString("\n")}")
    assert(!phys.contains("SinglePartition"),
      s"unexpected global window/sort:\n$phys")
  }

  test("e08: both aggregates combine map-side; the max-day branch scans ONLY ts") {
    val phys = build("e08_decayed_engagement")
      .queryExecution.executedPlan.toString
    assert(phys.linesIterator.count(_.contains("partial_sum")) >= 2,
      s"daily decimal sum and micro-long sum must both combine map-side:\n$phys")
    // the global-max branch is a second scan BY DESIGN — but pruned to
    // the one ts column (cheaper at 100 TB than a corpus-sized global
    // window over the |users|·|days| daily aggregate)
    val schemas = phys.linesIterator
      .filter(_.contains("ReadSchema")).toList
    assert(schemas.exists(_.contains("struct<ts:")),
      s"max-day branch should prune to a ts-only scan:\n$phys")
  }

  test("c08: banding scans read only (doc_id, text); source joins read only (doc_id, source)") {
    val phys = build("c08_dup_matrix").queryExecution.executedPlan.toString
    // no scan of documents may read n_chars or lang — the matrix
    // touches text (hashing) and source (attribution) only
    assert(!phys.contains("n_chars") && !phys.contains("lang"),
      s"unpruned documents scan:\n$phys")
  }

  test("s14: both ANN paths broadcast the query side; corpus scans never read label") {
    val phys = build("s14_ann_recall").queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastExchange"),
      s"query side should broadcast in both paths:\n$phys")
    val schemas = phys.linesIterator.filter(_.contains("ReadSchema")).toList
    assert(schemas.forall(!_.contains("label")),
      s"recall eval must not read the label column:\n${schemas.mkString("\n")}")
  }

  test("s17: label + cell predicates fuse into one filter below pq_encode; rerank broadcasts; rerank scan skips label") {
    val phys = build("s17_knn_ivfpq_filtered")
      .queryExecution.executedPlan.toString
    val lines = phys.linesIterator.toList
    // single-pass pruning: the optimizer collapses the label
    // predicate and the cell-membership test into ONE Filter (the
    // nearest_centroid kernel rides inside it), and the pq_encode
    // projection sits ABOVE it (parent-first printing ⇒ earlier
    // line) — a dropped row pays one fused predicate, never the
    // encode kernel
    val fi = lines.indexWhere(l => l.contains("Filter") &&
      l.contains("% 2") && l.contains("nearest_centroid"))
    val ei = lines.indexWhere(_.contains("pq_encode"))
    assert(fi >= 0,
      s"label + cell predicates should fuse into one filter:\n$phys")
    assert(ei >= 0 && ei < fi,
      s"pq_encode must evaluate only above the fused filter:\n$phys")
    // bounded candidate set broadcasts into the exact rerank
    assert(phys.contains("BroadcastExchange"),
      s"rerank candidates should broadcast:\n$phys")
    // the rerank-side scan reads (vec_id, embedding) only — label is
    // a coarse-side concern
    val schemas = lines.filter(_.contains("ReadSchema"))
    assert(schemas.exists(!_.contains("label")),
      s"rerank scan should not read label:\n${schemas.mkString("\n")}")
  }

  test("s18: both recall paths broadcast the query side, heap map-side, and never read label") {
    val phys = build("s18_pq_recall").queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastExchange"),
      s"query side should broadcast in both paths:\n$phys")
    assert(phys.contains("partial_topk"),
      s"top-k heaps must aggregate map-side:\n$phys")
    val schemas = phys.linesIterator.filter(_.contains("ReadSchema")).toList
    assert(schemas.forall(!_.contains("label")),
      s"recall eval must not read the label column:\n${schemas.mkString("\n")}")
  }

  test("hammingPairs materializes the sketch once (no per-chunk re-evaluation)") {
    // the sketch expression (decode/hash — the expensive per-row work)
    // is referenced by every chunk extraction on BOTH self-join
    // sides; un-materialized, the optimizer inlines it up to
    // 2·(nChunks+1) times per row (measured 12× for image_dhash
    // before the round-8 fix — and the same duplication had been
    // silently hitting simhash64 since round 4). The persistTracked
    // projection must appear as an InMemoryRelation in the optimized
    // plan, leaving the decode to run once per row at cache build.
    import org.apache.spark.sql.functions.col
    import graft.operators.{Dedup, Multimodal}
    val media = Multimodal.fromDocuments(
        Tables.load(spark, sfDir, "documents").select("doc_id", "text"))
      .where(col("kind") === "image")
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val plan = Multimodal.imageNearDup(media)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("InMemoryRelation"),
      s"sketch projection not materialized before the chunk join:\n$plan")
    Dedup.unpersistAll()
  }

  test("c10: outside the stage caches the corpus is never re-scanned; pack window per-shard; no cartesian") {
    // the capstone's plan contract (round 15 — verdict task 6): the
    // curated survivor frame and the two shingle projections persist
    // once and every later stage reads those caches — so the TOP-LEVEL
    // physical plan (descent stopped at cache boundaries; the nested
    // cache-build prints make string counts meaningless here) must
    // contain ZERO corpus file scans. A regression that re-derived a
    // stage from the parquet would still hash-match at sf0.01 while
    // re-reading 100 TB per stage at scale.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val next = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _: InMemoryTableScanExec => Nil // cache boundary
        case other => other.children
      }
      p +: next.flatMap(flatten)
    }
    spark.catalog.clearCache()
    val df = build("c10_pipeline_capstone")
    df.collect()
    val nodes = flatten(df.queryExecution.executedPlan)
    val caches = nodes.collect { case i: InMemoryTableScanExec => i }
    assert(caches.size >= 3,
      s"pipeline stages no longer share caches (${caches.size} cache reads)")
    val scans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.isEmpty,
      s"a stage re-reads the corpus outside the caches:\n" +
        scans.map(_.toString).mkString("\n"))
    // windows: the pack window rides the shard key; the ONE
    // unpartitioned window is t15's carve-out over the ≤|sources|
    // aggregated rates frame
    val windows = nodes.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.exists(_.partitionSpec.exists(_.toString.contains("shard"))),
      s"pack window lost its shard partitioning:\n${windows.mkString("\n")}")
    val global = windows.filter(_.partitionSpec.isEmpty)
    assert(global.size <= 1 &&
      global.forall(_.toString.contains("_c_nt")),
      s"unexpected global window:\n${global.mkString("\n")}")
    // and no stage degenerates to an unkeyed join
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"),
      "cartesian product in the pipeline composition")
    graft.operators.Dedup.unpersistAll()
  }

  test("corpusChangesSince over a delta range scans ONLY delta trees; base-only reads skip the LWW window — the O(changes) plan pins") {
    // the change feed's 100 TB claim (round 16 — verdict stretch 8):
    // a consumer following delta generations reads O(changes), never
    // the corpus. A regression that resolved changes through
    // snapshotDelta-style diffing would still return the same rows at
    // spec scale while re-reading every base tree per poll — so the
    // physical plan is pinned to the delta directories
    import graft.sources.CorpusStore
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft-pa-feed").toString
    val corpus = (1 to 40).map(i => (i.toLong, s"doc $i body"))
      .toDF("doc_id", "text")
    CorpusStore.writeCorpusCow(corpus, path, "doc_id", numBuckets = 8)
    CorpusStore.appendDeltaToCorpusCow(
      Seq((5L, "five v2"), (41L, "fortyone")).toDF("doc_id", "text"), path)
    CorpusStore.appendDeltaToCorpusCow(
      Seq((42L, "fortytwo")).toDF("doc_id", "text"), path)
    val feed = CorpusStore.corpusChangesSince(spark, path, 0, 2)
    val phys = feed.queryExecution.executedPlan.toString
    assert(phys.contains("/deltas/gen="),
      s"feed lost its delta scans:\n$phys")
    assert(!phys.contains("/parts/gen="),
      s"change feed re-reads base trees — O(corpus) per poll at " +
        s"scale:\n$phys")
    // the fast path: a base-only store's read is the plain multi-dir
    // scan — no LWW window, no exchange beyond the scan
    val plainPath = java.nio.file.Files
      .createTempDirectory("graft-pa-plain").toString
    CorpusStore.writeCorpusCow(corpus, plainPath, "doc_id", numBuckets = 8)
    val plain = CorpusStore.readCorpusSnapshot(spark, plainPath)
      .queryExecution.executedPlan.toString
    assert(!plain.contains("Window") && !plain.contains("Exchange"),
      s"base-only read lost its plain-scan fast path:\n$plain")
    // while a delta-carrying CURRENT pays the merge window ONLY over
    // the delta buckets (the base-only buckets stay a plain scan leg)
    val merged = CorpusStore.readCorpusSnapshot(spark, path)
      .queryExecution.executedPlan.toString
    assert(merged.contains("Window"),
      "delta-carrying read lost its last-writer-wins merge")
  }

  test("d16: all three modality legs are keyed joins — no cartesian anywhere in the composition") {
    // the any-modality report composes three pair-producing joins
    // (band-bucket, two pigeonhole chunk joins); a regression in ANY
    // leg toward a cross product would still hash-match at sf0.01
    // (the verdicts are equality-filtered) while silently going
    // quadratic at corpus scale — so the composed physical plan is
    // pinned free of unkeyed join strategies
    import graft.operators.Multimodal
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")
    val phys = Multimodal.multimodalNearDup(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct") &&
      !phys.contains("BroadcastNestedLoopJoin"),
      s"unkeyed join in the multimodal composition:\n$phys")
    graft.operators.Dedup.unpersistAll()
  }
}
