package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Box-speed CANARY (round 18 — r17 verdict task 5): a fixed
    * calibration workload, pinned ONCE (the top-level "canary" number
    * in the baseline file, outside the "queries" map the gate reads),
    * whose current/pin ratio measures AMBIENT box speed. r17's sweep
    * read a uniform ~15% slower than r16's purely because the box was
    * hotter — every per-query ratio inflated together, p50 drifted,
    * and 13 queries burned adjudication rounds on noise shared by the
    * whole sweep. The canary divides that common mode out: the
    * artifact reports raw headroom AND canary-normalized headroom, so
    * a uniformly hot box reads as canary≈1.15 + normalized≈1.00x
    * instead of 153 queries each reading 1.15x. Diagnostic only — the
    * gate still judges raw values.
    *
    * The workload is pure fixed-shape CPU (range → xxhash64 →
    * min/max/count; no parquet, no shuffle), so it tracks the
    * machine, not the
    * engine. MUST NEVER CHANGE across rounds — it is the unit of
    * measurement the pin is denominated in.
    */
  private[graft] val canaryRows = 4000000000L
  private[graft] val canaryPartitions = 32
  private[graft] val canaryRuns = 3

  /** Pure calibration rule (spec-pinned): current/pin, None without a
    * usable (positive) pin — an absent or degenerate pin must disable
    * normalization, never divide by zero or report a fabricated 1.0.
    */
  private[graft] def canaryRatio(now: Double,
                                 pin: Option[Double]): Option[Double] =
    pin.filter(_ > 0).map(now / _)

  /** Pure normalization rule (spec-pinned): each raw gate ratio
    * divided by the box-speed ratio. Caller passes a canaryRatio
    * result, so the divisor is always positive.
    */
  private[graft] def normalizeRatios(ratios: Seq[(String, Double)],
      canary: Double): Seq[(String, Double)] = {
    require(canary > 0, s"normalizeRatios: canary ratio $canary")
    ratios.map { case (n, r) => (n, r / canary) }
  }
  /** Retry trigger ratio — deliberately BELOW tools/bench_gate.py's
    * 2.0× gate, so anything eating more than half its gate headroom
    * gets re-measured before it can threaten the gate (round 11).
    */
  private[graft] val retryRatio = 1.5

  /** Dispersion alarm (round 19 — r18 verdict task 8): the r18
    * driver sweep read canary 0.84 — box FASTER than at pin time —
    * while one structurally variance-prone query sat at 2.23× its
    * pin. A scalar canary measures the COMMON mode only; these two
    * knobs flag the spread: alarm when p90/p50 of the per-query gate
    * ratios exceeds the band, or when any query's ratio exceeds
    * outlierFactor·p50 while also being slow in absolute terms
    * (ratio > 1) — a fast sweep with one hot query is exactly the
    * failure the canary cannot see. Diagnostic like the canary: the
    * gate still judges raw values.
    */
  private[graft] val dispersionBand = 1.35
  private[graft] val dispersionOutlierFactor = 1.5

  /** Pure dispersion rule (spec-pinned). Input: (name, gateRatio)
    * pairs. Output: (p90/p50, outliers, alarm); None under 5 samples
    * (percentile spread over a handful of ratios is noise, not
    * signal).
    */
  private[graft] def dispersionReport(rs: Seq[(String, Double)])
      : Option[(Double, Seq[(String, Double)], Boolean)] = {
    if (rs.size < 5) return None
    val sorted = rs.sortBy(_._2)
    def pct(p: Double): Double =
      sorted(math.min(sorted.size - 1, (p * sorted.size).toInt))._2
    val p50 = pct(0.5)
    val p90 = pct(0.9)
    if (p50 <= 0) return None
    val spread = p90 / p50
    val outliers = sorted.filter { case (_, r) =>
      r > math.max(1.0, dispersionOutlierFactor * p50) }
    Some((spread, outliers, spread > dispersionBand || outliers.nonEmpty))
  }

  /** Same floor as the gate: sub-second queries, where per-query
    * constants dominate, don't trip retries on scheduler noise.
    */
  private[graft] val gateFloorSec = 0.25

  /** Pure retry-trigger rule (spec-pinned): only a SUCCESSFUL first
    * pass with a usable baseline entry can trip a retry.
    */
  private[graft] def needsRetry(t1: Double, err1: Option[String],
                                baseline: Option[Double]): Boolean =
    err1.isEmpty && baseline.exists(b =>
      t1 > retryRatio * math.max(b, gateFloorSec))

  /** Pure retried-artifact entry (spec-pinned, round 13 — ADVICE):
    * both passes stay auditable, and an ERRORED retry's fast-fail
    * time carries its error string as a third array element so it
    * can never read as a legitimate sub-budget measurement.
    */
  private[graft] def retryArtifactValue(
      t1: Double, t2: Double, err2: Option[String]): String = {
    val tail = err2
      .map(m => "," + SparkEntry.jsonStr("retry_error: " + m.take(200)))
      .getOrElse("")
    "[" + t1 + "," + t2 + tail + "]"
  }

  /** Pure retry adjudication (spec-pinned): an ERRORED retry never
    * replaces the successful first pass it was meant to confirm —
    * the first measurement is valid, and the retry's fast-fail time
    * would otherwise enter the artifact as a fabricated sub-budget
    * result carrying an error for a query that ran. A successful
    * retry reports the min of the two passes.
    */
  private[graft] def adjudicateRetry(t1: Double, t2: Double,
      err2: Option[String]): (Double, Option[String]) =
    if (err2.isDefined) (t1, None) else (math.min(t1, t2), None)

  /** Post-sweep adjudication trigger (round 15 — verdict task 3: the
    * automatic form of the manual BenchAdjudicate protocol that ate a
    * verdict cycle per round on CONTEXT_SENSITIVE queries). A query
    * whose post-retry reading still exceeds 1.3x of max(pin, floor)
    * gets [[adjRounds]] quiet re-runs AFTER the whole sweep — same
    * JVM (JIT/codegen/footer warmth shared, the BenchAdjudicate
    * stance), nothing else running — and the gate judges the
    * adjudicated minimum. 1.3 sits BELOW the retry's 1.5 on purpose:
    * the retry catches mid-sweep ambient bursts immediately; this
    * catches the residual sweep-context tax that two passes inside a
    * busy sweep both pay (c05: three rounds of 1.38x in-sweep
    * readings vs a 1.00x isolated minimum).
    */
  private[graft] val adjRatio = 1.3
  private[graft] val adjRounds = 3

  private[graft] def needsAdjudication(t: Double, err: Option[String],
                                       baseline: Option[Double]): Boolean =
    err.isEmpty && baseline.exists(b =>
      t > adjRatio * math.max(b, gateFloorSec))

  /** Pure adjudicated-value rule (spec-pinned): the minimum of the
    * sweep reading and every SUCCESSFUL quiet run — an errored quiet
    * run contributes nothing (its fast-fail time is not a
    * measurement, the adjudicateRetry stance), and if every quiet
    * run errors the sweep reading stands.
    */
  private[graft] def adjudicateFinal(sweep: Double,
      runs: Seq[(Double, Option[String])]): Double =
    (sweep +: runs.collect { case (t, None) => t }).min

  /** Pure adjudicated-artifact entry (spec-pinned): the sweep reading
    * and EVERY quiet run stay auditable next to the min the gate
    * judges; an errored run appears as a marked string, never as a
    * bare time (the retryArtifactValue stance).
    */
  private[graft] def adjudicatedArtifactValue(sweep: Double,
      runs: Seq[(Double, Option[String])]): String = {
    val rs = runs.map {
      case (t, None) => t.toString
      case (_, Some(m)) =>
        SparkEntry.jsonStr("adj_error: " + m.take(200))
    }.mkString("[", ",", "]")
    s"""{"sweep":$sweep,"runs":$rs,"min":${adjudicateFinal(sweep, runs)}}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: JIT + codegen + parquet footer caches, outside timing —
    // all tables, so no measured query pays first-touch footer reads
    try Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    catch { case _: Throwable => }
    // box-speed canary: min of canaryRuns fixed CPU workloads, right
    // after warm-up so it measures the same JIT-warm machine the
    // sweep gets (see the canary fields above)
    import org.apache.spark.sql.functions.{col, count, lit, max, min, xxhash64}
    def canaryOnce(): Double = {
      val t0 = System.nanoTime()
      // min/max/count, not sum — summing canaryRows (4B) xxhash64
      // longs overflows under ANSI; these still force every hash to
      // be computed. The 4B-row sizing is intentional: ~3s/run on
      // this box, large enough that scheduling noise is <5% of it
      // (a sub-second canary would measure jitter, not the machine)
      spark.range(0L, canaryRows, 1L, canaryPartitions)
        .select(xxhash64(col("id")).as("h"))
        .agg(min(col("h")), max(col("h")), count(lit(1))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    val canarySec =
      try (1 to canaryRuns).map(_ => canaryOnce()).min
      catch { case e: Throwable =>
        System.err.println(s"[bench] canary failed: ${e.getMessage}")
        -1.0
      }
    // noop sink: forces every projected column to be computed —
    // count() would let Catalyst prune the projections and time only
    // the scan+filter skeleton.
    // optional comma-separated name filter for local iteration
    // (unset = the full sweep the driver runs)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // a typo'd name must fail fast, not silently bench zero queries
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY: unknown queries ${unknown.mkString(", ")}")
    }
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }
    def timeOne(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Option[String]) = {
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          Some(Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
        } finally
          // release dedup caches so per-query times stay independent
          // (and memory bounded) across the sweep
          graft.operators.Dedup.unpersistAll()
      ((System.nanoTime() - t0) / 1e9, err)
    }
    // Sweep order (round 13 — context-sensitivity instrumentation):
    // the default name-order is what every recorded sweep ran; an
    // order-randomized sweep (SPARK_GRAFT_BENCH_ORDER=shuffled:<seed>)
    // isolates which queries' in-sweep cost depends on WHAT RAN
    // BEFORE THEM (cache/JIT/GC context) rather than on their own
    // plan — the §4 context-sensitivity protocol. Seeded so a sweep
    // is reproducible; the order string lands in the artifact.
    val orderSpec = sys.env.getOrElse("SPARK_GRAFT_BENCH_ORDER", "name")
    val ordered = {
      val base = selected.toSeq.sortBy(_._1)
      orderSpec.split(":", 2) match {
        case Array("name") => base
        case Array("shuffled") => new scala.util.Random(13L).shuffle(base)
        case Array("shuffled", s) =>
          // a malformed seed must not kill the sweep — fall back loudly
          val seed = s.toLongOption.getOrElse {
            System.err.println(
              s"[bench] unparsable shuffle seed '$s' — using 13")
            13L
          }
          new scala.util.Random(seed).shuffle(base)
        case _ =>
          System.err.println(
            s"[bench] unknown SPARK_GRAFT_BENCH_ORDER '$orderSpec' — " +
              "using name order")
          base
      }
    }
    val firstPass = ordered.map { case (name, fn) =>
      val (t, err) = timeOne(name, fn)
      (name, t, err)
    }
    // Ambient-burst self-retry: a query whose first pass exceeds
    // 1.5x of max(baseline, 0.25s floor) re-runs ONCE after the
    // sweep and reports the min of the two passes. The retry
    // threshold sits BELOW the 2x gate (tools/bench_gate.py's rule)
    // on purpose — round 10 retried only the block that crossed 2x
    // while q03 kept a noisy 1.94x single run, leaving the gate one
    // bad window from red; anything already eating >50% of its gate
    // headroom deserves the second look (round-10 verdict task 1).
    // A plan regression is slow in both passes; a co-tenant burst
    // (round 7: six consecutive queries at 2.4-9.3x that re-measured
    // at ~1x) never survives two passes separated by the rest of the
    // sweep. Baseline missing/unparsable => no retries (first pass
    // stands), so the bench never depends on the file. The rule
    // itself lives in Bench.needsRetry/adjudicateRetry (pure,
    // spec-pinned).
    val baselinePath = sys.env.getOrElse("SPARK_GRAFT_BENCH_BASELINE",
      "BENCH_BASELINE_QUERIES.json")
    val baseline: Map[String, Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(baselinePath)),
          java.nio.charset.StandardCharsets.UTF_8)
        // the baseline is Bench's own flat output: the only
        // quoted-name:number pairs whose name is a bench query are in
        // its "queries" object, so a scoped regex extraction is exact
        """"([A-Za-z0-9_]+)"\s*:\s*([0-9][0-9.eE+-]*)""".r
          .findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble)
          .filter { case (k, _) => selected.contains(k) }
          .toMap
      } catch { case e: Throwable =>
        System.err.println(s"[bench] no usable baseline at $baselinePath " +
          s"(${e.getClass.getSimpleName}) — skipping self-retry")
        Map.empty
      }
    // the canary's pin lives OUTSIDE the "queries" map (the gate and
    // pin tooling own that map; the canary is calibration, not a
    // benched query): a top-level `"canary": <sec>` number
    val canaryPin: Option[Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(baselinePath)),
          java.nio.charset.StandardCharsets.UTF_8)
        """"canary"\s*:\s*([0-9][0-9.eE+-]*)""".r
          .findFirstMatchIn(txt).map(_.group(1).toDouble)
      } catch { case _: Throwable => None }
    val retried =
      scala.collection.mutable.LinkedHashMap[String, (Double, Double, Option[String])]()
    val sweepResults = firstPass.map { case (name, t1, err1) =>
      if (!Bench.needsRetry(t1, err1, baseline.get(name))) (name, t1, err1)
      else {
        System.err.println(f"[bench] $name%s first pass $t1%.2fs over " +
          f"the ${retryRatio}%.1fx retry threshold — retrying once")
        val (t2, err2) = timeOne(name, selected(name))
        retried(name) = (t1, t2, err2)
        val (t, err) = Bench.adjudicateRetry(t1, t2, err2)
        (name, t, err)
      }
    }
    // Post-sweep quiet-box adjudication (round 15): queries still over
    // 1.3x of their pin after the retry re-run adjRounds times at the
    // END of the sweep — the same JVM with nothing else running, which
    // is exactly the manual BenchAdjudicate environment — and the
    // artifact's queries map (what tools/bench_gate.py judges) carries
    // the adjudicated min, with every pass auditable under
    // "adjudicated". Sweep-context noise stops consuming a verdict
    // cycle; a real plan regression is slow in all adjRounds+1
    // readings and still fails the gate.
    val adjudicated = scala.collection.mutable.LinkedHashMap[
      String, (Double, Seq[(Double, Option[String])])]()
    val adjNames = sweepResults.collect {
      case (name, t, err)
          if Bench.needsAdjudication(t, err, baseline.get(name)) => name
    }
    if (adjNames.nonEmpty) {
      System.err.println(s"[bench] adjudicating ${adjNames.mkString(", ")} " +
        s"(${adjRounds} quiet re-runs each)")
      // interleave whole rounds over the flagged set (the
      // BenchAdjudicate stance) rather than back-to-back repeats
      val runs = (1 to adjRounds).map { _ =>
        adjNames.map(n => n -> timeOne(n, selected(n))).toMap
      }
      val sweepT = sweepResults.map { case (n, t, _) => n -> t }.toMap
      adjNames.foreach { n =>
        adjudicated(n) = (sweepT(n), runs.map(_(n)))
      }
    }
    val results = sweepResults.map { case (name, t, err) =>
      adjudicated.get(name) match {
        case Some((sweep, runs)) =>
          (name, Bench.adjudicateFinal(sweep, runs), err)
        case None => (name, t, err)
      }
    }
    def jstr(s: String): String = SparkEntry.jsonStr(s)
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // a failed query must be visible in the JSON, not only on stderr
    val errs = results.collect { case (k, _, Some(m)) =>
      s"${jstr(k)}:${jstr(m.take(300))}"
    }.mkString("{", ",", "}")
    // both passes of every retried query stay visible, so a reader can
    // audit the adjudication instead of trusting the min; errored
    // retries are marked — see [[retryArtifactValue]]
    val retries = retried.map { case (k, (a, b, e2)) =>
      s"\"" + k + "\":" + Bench.retryArtifactValue(a, b, e2)
    }.mkString("{", ",", "}")
    // every adjudicated query's sweep reading + quiet runs + min stay
    // auditable next to the min the gate judges
    val adjJson = adjudicated.map { case (k, (sweep, runs)) =>
      s"\"" + k + "\":" + Bench.adjudicatedArtifactValue(sweep, runs)
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Bench-gate headroom (round 10): the gate is per-query 2x of
    // max(baseline, floor); these summary ratios make drift visible in
    // the artifact itself long before any query threatens the gate —
    // "max" is directly comparable to the 2.0 budget.
    val ratios = results.collect {
      case (name, t, None) if baseline.contains(name) =>
        (name, t / math.max(baseline(name), gateFloorSec))
    }.sortBy(_._2)
    def headroomJson(rs: Seq[(String, Double)]): String =
      if (rs.isEmpty) "{}"
      else {
        def pct(p: Double): Double =
          rs(math.min(rs.size - 1, (p * rs.size).toInt))._2
        val (worstName, worst) = rs.last
        s"""{"p50":${pct(0.5)},"p90":${pct(0.9)},"max":$worst,""" +
          s""""max_query":${jstr(worstName)},"n":${rs.size}}"""
      }
    val headroom = headroomJson(ratios)
    // canary fields (round 18): the box-speed reading, its pin and
    // ratio, and the canary-normalized headroom — the ambient common
    // mode divided out. Diagnostic; the gate judges raw.
    val cRatio = if (canarySec > 0)
      Bench.canaryRatio(canarySec, canaryPin) else None
    val canaryJson = (canarySec, canaryPin, cRatio) match {
      case (s, _, _) if s <= 0 => "{}"
      case (s, Some(p), Some(r)) => s"""{"sec":$s,"pin":$p,"ratio":$r}"""
      case (s, _, _) => s"""{"sec":$s}"""
    }
    val headroomCanary = cRatio
      .map(r => headroomJson(Bench.normalizeRatios(ratios, r)))
      .getOrElse("{}")
    // dispersion alarm (round 19): the spread the scalar canary
    // cannot see — see [[Bench.dispersionReport]]
    val dispJson = Bench.dispersionReport(ratios) match {
      case None => "{}"
      case Some((spread, outliers, alarm)) =>
        val o = outliers.map { case (n, r) => s"${jstr(n)}:$r" }
          .mkString("{", ",", "}")
        s"""{"p90_over_p50":$spread,"band":${Bench.dispersionBand},""" +
          s""""outlier_factor":${Bench.dispersionOutlierFactor},""" +
          s""""outliers":$o,"alarm":$alarm}"""
    }
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"retried":$retries,"adjudicated":$adjJson,"headroom":$headroom,"canary":$canaryJson,"headroom_canary":$headroomCanary,"dispersion":$dispJson,"order":${jstr(orderSpec)},"sf":"$sfDir"}"""
    println(full)
    // Truncation-proofing, twice over: bounded stdout captures have
    // lost the head (round 3) and the per-query tail (round 4) of the
    // full line, so (a) repeat the small summary on its own final line
    // — either capture direction preserves it — and (b) write the full
    // JSON to a FILE next to the bench (like Verify's oracle_sql.json),
    // which no stdout capture can truncate.
    // An unwritable path must not kill the tail (the stdout summary is
    // the fallback the file backs up, not vice versa), and "out" is
    // only reported when the write SUCCEEDED — a consumer must never
    // be pointed at a stale file from a previous run.
    val outName =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_QUERIES.json")
    val written: Option[String] =
      try {
        val p = java.nio.file.Paths.get(outName)
        java.nio.file.Files.write(p,
          full.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        Some(p.toAbsolutePath.toString)
      } catch { case e @ (_: java.io.IOException |
                          _: java.nio.file.InvalidPathException) =>
        System.err.println(s"[bench] could not write $outName: $e")
        None
      }
    val outField = written.map(p => s""","out":${jstr(p)}""").getOrElse("")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries_n":${results.size},"errors":$errs,"headroom":$headroom,"canary":$canaryJson,"headroom_canary":$headroomCanary$outField,"sf":"$sfDir"}""")
    spark.stop()
  }
}
