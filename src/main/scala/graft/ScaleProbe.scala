package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adversarial scale probe for the LSH operators (companion to the
  * round-1 document-dedup probe recorded in SURVEY.md §4): replicate
  * the embeddings table `rep`× with shifted ids, so every vector gains
  * `rep-1` exact twins — the candidate graph is maximally dense — and
  * time candidates+verify end to end. The property under test: runtime
  * tracks the verified-candidate count (linear in collisions), not
  * corpus², and the banding exchange moves (id, band, sig) only.
  *
  * Each arg is `rep` or `rep:bitsPerBand` — the probe demonstrates the
  * operative scaling rule: bitsPerBand must grow ≈ log2(corpus) so the
  * per-band bucket count stays ahead of the corpus, or random
  * collisions (corpus²/2^bits per band) swamp the true candidates.
  *
  * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ScaleProbe [rep[:bits]...]"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs: Seq[(Int, Int)] =
      if (args.nonEmpty) args.toSeq.map { a =>
        a.split(":") match {
          case Array(r) => (r.toInt, 6)
          case Array(r, b) => (r.toInt, b.toInt)
        }
      }
      else Seq((1, 6), (5, 6), (20, 12))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.load(spark, sfDir, "embeddings")
    val n0 = emb.count() // also warms the parquet footer cache

    for ((rep, bits) <- runs) {
      val big = (0 until rep).map { i =>
        emb.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
          col("embedding"))
      }.reduce(_ unionByName _)
      val t0 = System.nanoTime()
      val pairs = operators.Similarity.cosineDuplicates(
        big, "vec_id", "embedding", dim = 64, threshold = 0.4,
        bands = 12, bitsPerBand = bits)
      val nPairs = pairs.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] cosineDuplicates rep=$rep%-3d bits=$bits%-3d " +
        f"vectors=${n0 * rep}%-8d pairs=$nPairs%-9d time=$sec%.1fs")
    }

    // document near-dup probe: every doc gains rep-1 exact twins —
    // maximal candidate density for the minhash banding join
    val docs = Tables.load(spark, sfDir, "documents")
    val d0 = docs.count()
    for (rep <- runs.map(_._1).distinct) {
      val big = (0 until rep).map { i =>
        docs.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          col("text"))
      }.reduce(_ unionByName _)
      val t0 = System.nanoTime()
      val nPairs = operators.Dedup.minhashDuplicates(
        big, "doc_id", "text", shingleK = 3, numHashes = 128,
        bands = 16, threshold = 0.5).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] minhashDuplicates rep=$rep%-3d docs=${d0 * rep}%-8d " +
        f"pairs=$nPairs%-9d time=$sec%.1fs")
    }

    // cross-corpus decontamination probe: replicated train side vs the
    // FIXED eval split — cost must track cross-collisions (linear in
    // rep, since the eval side doesn't grow), not train².
    val evalSplit = docs.where(col("doc_id") % 10 === 0)
    val train1 = docs.where(col("doc_id") % 10 =!= 0)
    for (rep <- runs.map(_._1).distinct) {
      val train = (0 until rep).map { i =>
        train1.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          col("text"))
      }.reduce(_ unionByName _)
      val t0 = System.nanoTime()
      val nPairs = operators.Dedup.decontaminate(
        train, evalSplit, "doc_id", "text").count()
      operators.Dedup.unpersistAll()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] decontaminate rep=$rep%-3d pairs=$nPairs%-9d time=$sec%.1fs")
    }

    // boilerplate-saturated decontamination: one shared header appears
    // 100000× in train and 500× in eval, so ONE (band, bucket) key
    // yields 5·10⁷ signal-free pairs uncapped — the |L|·|R| blowup —
    // while maxBucketSize drops the saturated key on both sides and
    // the probe collapses back to the clean-corpus cost.
    val boiler = "standard legal disclaimer header all rights " +
      "reserved do not distribute this document to anyone"
    val trainSat = train1.select("doc_id", "text").unionByName(spark.range(100000)
      .select((col("id") + 50000000L).as("doc_id"), lit(boiler).as("text")))
    val evalSat = evalSplit.select("doc_id", "text").unionByName(spark.range(500)
      .select((col("id") + 60000000L).as("doc_id"), lit(boiler).as("text")))
    for ((cap, tag) <- Seq(Int.MaxValue -> "uncapped", 8 -> "cap=8")) {
      val t0 = System.nanoTime()
      val nPairs = operators.Dedup.decontaminate(
        trainSat, evalSat, "doc_id", "text", maxBucketSize = cap).count()
      operators.Dedup.unpersistAll()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] decontaminate-saturated $tag%-8s " +
        f"pairs=$nPairs%-9d time=$sec%.1fs")
    }

    // batch-ANN probe: a 5-query batch against the replicated corpus.
    // Brute scores |Q|·|corpus| rows every time; the persisted IVF
    // index pays its assignment pass ONCE (build, timed separately)
    // and each probe then reads only the probed cells' FILES —
    // at local test scale wall-clock is fixed-overhead-dominated, so
    // the probe reports files read (the quantity that scales with
    // corpus size) alongside the times. ∪(5 queries × 4 probes) of 64
    // cells ⇒ ≤ 20/64 of the files; at 100 TB that ratio IS the win.
    val queries5 = emb.orderBy("vec_id").limit(5)
    for ((rep, _) <- runs) {
      val big = (0 until rep).map { i =>
        emb.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
          col("embedding"))
      }.reduce(_ unionByName _)
      val t0 = System.nanoTime()
      val nBrute = operators.Similarity.knnBruteBatch(
        queries5, "vec_id", "embedding",
        big, "vec_id", "embedding", k = 10).count()
      val tBrute = (System.nanoTime() - t0) / 1e9
      val dir = java.nio.file.Files.createTempDirectory("graft-probe-ivf").toString
      val t1 = System.nanoTime()
      operators.Similarity.writeIvfIndex(big, "vec_id", "embedding", dir,
        nCells = 64)
      val tBuild = (System.nanoTime() - t1) / 1e9
      // time INCLUDES the driver-side cell selection (centroid read +
      // probed-cell collect) — every real query batch pays it
      val t2 = System.nanoTime()
      val probeDf = operators.Similarity.knnIvfBatchIndexed(spark, dir,
        queries5, "vec_id", "embedding", k = 10, nProbe = 4)
      val probeFiles = sources.Layout.filesRead(probeDf)
      val tProbe = (System.nanoTime() - t2) / 1e9
      val totalFiles = sources.Layout.filesRead(
        spark.read.parquet(s"$dir/cells").select(count(lit(1))))
      println(f"[probe] batch-ann rep=$rep%-3d vectors=${n0 * rep}%-8d " +
        f"brute=$tBrute%.1fs build=$tBuild%.1fs probe=$tProbe%.1fs " +
        f"files=$probeFiles/$totalFiles brute_rows=$nBrute")
    }
    // bloom runtime-filter probe: a selective orders subset joined to
    // the full lineitem with broadcast disabled (the large-large shape
    // bloom pruning exists for). Wall-clock at local SF is overhead-
    // dominated; the scalable quantity is the SURVIVING-ROW RATIO —
    // the fraction of the fact side that still pays the shuffle after
    // the map-side bloom filter (matches + fpp), which is what the
    // exchange carries at 100 TB.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val li = Tables.load(spark, sfDir, "lineitem")
    val nLi = li.count()
    val sel = Tables.load(spark, sfDir, "orders")
      .where(col("o_orderpriority") === "1-URGENT" &&
        col("o_totalprice") > 250000)
    val nSel = math.max(sel.count(), 1)
    val tp0 = System.nanoTime()
    val plainN = li.join(sel, col("l_orderkey") === col("o_orderkey")).count()
    val tPlain = (System.nanoTime() - tp0) / 1e9
    val nb = operators.BloomPrune.bitsFor(nSel)
    val nh = operators.BloomPrune.hashesFor(nb, nSel)
    // timed INCLUDING the bitset build — the price a real job pays
    val tq0 = System.nanoTime()
    val words = operators.BloomPrune.buildBitset(sel, col("o_orderkey"), nb, nh)
    val prunedSide = li.where(
      operators.BloomPrune.mightContain(col("l_orderkey"), words, nh))
    val prunedN = prunedSide
      .join(sel, col("l_orderkey") === col("o_orderkey")).count()
    val tPruned = (System.nanoTime() - tq0) / 1e9
    val surviving = prunedSide.count()
    require(prunedN == plainN,
      s"bloom prune changed the join result: $prunedN != $plainN")
    println(f"[probe] bloom-join lineitem=$nLi%-9d sel_orders=$nSel%-7d " +
      f"surviving=$surviving (${100.0 * surviving / nLi}%.1f%% of fact side) " +
      f"plain=$tPlain%.1fs pruned=$tPruned%.1fs (incl. build)")
    } finally {
      // restore even if an action or the result-equality require throws,
      // so a failed probe doesn't leave the session with broadcast joins
      // disabled (and always release the JVM's executor threads)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.stop()
    }
  }
}
