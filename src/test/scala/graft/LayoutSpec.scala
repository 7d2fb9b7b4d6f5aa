package graft

import org.apache.spark.sql.functions._

import graft.sources.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-layout").toString

  test("compact collapses a many-tiny-files directory") {
    val dir = tmp()
    val df = Tables.load(spark, sfDir, "lineitem")
    df.repartition(64).write.parquet(s"$dir/tiny")
    val before = new java.io.File(s"$dir/tiny")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(before >= 32, s"expected many input files, got $before")

    Layout.compact(spark, s"$dir/tiny", s"$dir/compacted", targetMB = 512)
    val after = new java.io.File(s"$dir/compacted")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(after <= 2, s"compaction left $after files")
    // content unchanged
    assertSameRows(spark.read.parquet(s"$dir/compacted"), df)
  }

  test("range-sorted layout gives files narrow disjoint value ranges (skippable)") {
    val dir = tmp()
    val df = Tables.load(spark, sfDir, "orders")
    Layout.writeRangeSorted(df, s"$dir/sorted", numFiles = 8, "o_totalprice")
    val files = new java.io.File(s"$dir/sorted")
      .listFiles().filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length == 8, s"expected 8 range files, got ${files.length}")

    // the skip property is in the footers: each file must cover a
    // narrow, essentially disjoint slice of the value space, so a
    // selective predicate intersects ~1 file's [min,max] (readers
    // prune row groups / files from exactly these stats)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("o_totalprice"), max("o_totalprice")).head()
      (r.getDouble(0), r.getDouble(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach { case Array((_, hiA), (loB, _)) =>
      assert(hiA <= loB, s"file ranges overlap: $hiA > $loB")
    }
    val cut = df.selectExpr("percentile(o_totalprice, 0.05)").head().getDouble(0)
    val intersecting = ranges.count { case (lo, _) => lo < cut }
    assert(intersecting <= 1,
      s"a 5%-selective predicate intersects $intersecting of 8 files")

    // unsorted baseline: the same predicate intersects every file
    df.repartition(8).write.parquet(s"$dir/unsorted")
    val unsortedHit = new java.io.File(s"$dir/unsorted")
      .listFiles().filter(_.getName.endsWith(".parquet")).map(_.getPath)
      .count { f =>
        spark.read.parquet(f).agg(min("o_totalprice")).head().getDouble(0) < cut
      }
    assert(unsortedHit >= 6, s"baseline should be unskippable, hit $unsortedHit")

    // scan metrics sanity + correctness
    assert(Layout.filesRead(spark.read.parquet(s"$dir/sorted")) == 8L)
    assertSameRows(
      spark.read.parquet(s"$dir/sorted").where(col("o_totalprice") < lit(cut)),
      df.where(col("o_totalprice") < lit(cut)))

    // filesRead must see through AQE query-stage boundaries: a shuffled
    // plan's scan sits inside a QueryStageExec leaf
    val shuffled = spark.read.parquet(s"$dir/sorted")
      .groupBy("o_orderstatus").count()
    assert(Layout.filesRead(shuffled) == 8L,
      "filesRead lost the scan behind an AQE stage boundary")
  }

  test("z-order layout prunes files for predicates on BOTH dimensions") {
    val dir = tmp()
    // deterministic pseudo-uniform grid: two decorrelated coordinates
    // derived from the id by multiplicative hashing
    val df = spark.range(20000).select(
      col("id"),
      (col("id") * 2654435761L % 65536).as("x"),
      (col("id") * 40503L % 65536).as("y"))
    val nFiles = 16
    Layout.writeZOrdered(df, s"$dir/z", nFiles, "x", "y")
    assert(spark.read.parquet(s"$dir/z").count() == 20000)
    // the skip property is in the FOOTERS (same assertion style as the
    // range-sorted test — vanilla Spark prunes row groups, stats-
    // indexed table formats prune whole files, both from exactly
    // these [min,max] ranges): a z-curve interval is bounded in BOTH
    // dims, so a 1/16-wide band on either column intersects few files
    def fileRanges(path: String, c: String): Array[(Long, Long)] =
      new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map { f =>
          val r = spark.read.parquet(f.getPath).agg(min(c), max(c)).head()
          (r.getLong(0), r.getLong(1))
        }
    val xHit = fileRanges(s"$dir/z", "x").count { case (lo, _) => lo < 4096 }
    val yHit = fileRanges(s"$dir/z", "y").count { case (lo, _) => lo < 4096 }
    // + 2 headroom for range-sample boundary slop (the seed folds in
    // the schedule-dependent rdd.id — see the 3-col test's note)
    assert(xHit <= nFiles / 2 + 2,
      s"x-band intersects $xHit of $nFiles z-ordered files")
    assert(yHit <= nFiles / 2 + 2,
      s"y-band intersects $yHit of $nFiles z-ordered files")
    // baseline: x-range-sorted layout prunes x perfectly but every
    // file spans the whole y domain — y-predicates skip nothing
    Layout.writeRangeSorted(df, s"$dir/xsorted", nFiles, "x")
    val xBase = fileRanges(s"$dir/xsorted", "x").count { case (lo, _) => lo < 4096 }
    assert(xBase <= 2, s"x-sorted baseline: x-band intersects $xBase files")
    val yBase = fileRanges(s"$dir/xsorted", "y").count { case (lo, _) => lo < 4096 }
    assert(yBase == nFiles,
      s"x-sorted baseline unexpectedly bounded y: $yBase of $nFiles")
  }

  test("z-order generalizes to 3 columns: every dimension stays bounded") {
    val dir = tmp()
    // three decorrelated pseudo-uniform coordinates from the id
    val df = spark.range(20000).select(
      col("id"),
      (col("id") * 2654435761L % 65536).as("x"),
      (col("id") * 40503L % 65536).as("y"),
      (col("id") * 2246822519L % 65536).as("w"))
    val nFiles = 16
    Layout.writeZOrdered(df, s"$dir/z3", nFiles, "x", "y", "w")
    assert(spark.read.parquet(s"$dir/z3").count() == 20000)
    def fileRanges(path: String, c: String): Array[(Long, Long)] =
      new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map { f =>
          val r = spark.read.parquet(f.getPath).agg(min(c), max(c)).head()
          (r.getLong(0), r.getLong(1))
        }
    // a 1/16-wide band on ANY of the three columns intersects about
    // half the files (an x-sorted layout would leave y and w bands
    // hitting all 16); the 3-D bound is looser than 2-D because each
    // dim gets a third of the interleaved bits. Headroom note
    // (round 16): repartitionByRange picks boundaries from a SAMPLE
    // whose seed folds in rdd.id (RangePartitioner.sketch:
    // byteswap32(idx ^ (rddId << 16))) — a global counter that
    // depends on how many RDDs concurrently-running suites created
    // first, so boundary slop varies with the suite schedule
    // (observed 11 in-suite vs ≤ 10 standalone). nFiles/2 + 4 keeps
    // the real property — BOUNDED per-dim pruning, decisively under
    // the 16-file unbounded baseline — without pinning the sampler's
    // seed.
    for (c <- Seq("x", "y", "w")) {
      val hit = fileRanges(s"$dir/z3", c).count { case (lo, _) => lo < 4096 }
      assert(hit <= nFiles / 2 + 4,
        s"$c-band intersects $hit of $nFiles 3-col z-ordered files")
    }
  }

  test("compactPartitioned collapses per-partition small files, keeps the layout") {
    val dir = tmp()
    // fragment: 8 writer tasks per partition → ~8 files under each
    // lang=... directory
    val docs = Tables.load(spark, sfDir, "documents")
    docs.repartition(8).write.partitionBy("lang").parquet(s"$dir/frag")
    def filesPerPartition(root: String): Map[String, Int] =
      new java.io.File(root).listFiles().filter(_.isDirectory).map { d =>
        d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))
      }.toMap
    val before = filesPerPartition(s"$dir/frag")
    assert(before.values.forall(_ >= 4), s"baseline not fragmented: $before")

    Layout.compactPartitioned(spark, s"$dir/frag", s"$dir/tidy",
      Seq("lang"), targetMB = 512)
    val after = filesPerPartition(s"$dir/tidy")
    assert(after.keySet == before.keySet, "partition layout changed")
    assert(after.values.forall(_ == 1),
      s"small partitions should collapse to one file each: $after")
    // nothing lost
    assertSameRows(spark.read.parquet(s"$dir/tidy"),
      spark.read.parquet(s"$dir/frag"))
    // in-place refused
    val e = intercept[IllegalArgumentException](
      Layout.compactPartitioned(spark, s"$dir/tidy", s"$dir/tidy", Seq("lang")))
    assert(e.getMessage.contains("staging"))
  }

  test("writeWithBloomFilters: filters land in the footer for the named column only, answer membership") {
    val dir = java.nio.file.Files.createTempDirectory("layout-bloom").toString
    val docs = Tables.load(spark, sfDir, "documents")
    Layout.writeWithBloomFilters(docs, s"$dir/b", Seq("doc_id"), ndv = 1000L)
    val part = new java.io.File(s"$dir/b").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(part.getAbsolutePath),
        spark.sessionState.newHadoopConf()))
    try {
      import scala.jdk.CollectionConverters._
      val rg = reader.getFooter.getBlocks.get(0)
      val byName = rg.getColumns.asScala
        .map(c => c.getPath.toDotString -> c).toMap
      assert(byName("doc_id").getBloomFilterOffset >= 0,
        "doc_id bloom filter missing from the footer")
      assert(byName("text").getBloomFilterOffset < 0,
        "text must NOT carry a bloom filter (only named columns pay)")
      // no false negatives: every present id must be found
      val bf = reader.getBloomFilterDataReader(rg)
        .readBloomFilter(byName("doc_id"))
      assert(bf != null, "stored filter must be loadable")
      val someId = spark.read.parquet(s"$dir/b")
        .select("doc_id").head().getLong(0)
      assert(bf.findHash(bf.hash(someId)),
        s"present id $someId must hit the filter")
    } finally reader.close()
    // and the data itself is untouched
    assertSameRows(spark.read.parquet(s"$dir/b"), docs)
  }

  test("bloom read-path probe: accepted row groups stay O(1) while total row groups grow 10x") {
    // the read-path analog of the BM25 flat-file-count probe: on an
    // UNSORTED high-cardinality key every row group's min/max spans
    // the domain (stats prune nothing), so the bloom filters are the
    // only thing standing between a point lookup and a full scan —
    // measure how many row groups they actually skip, at 1x and 10x
    val root = java.nio.file.Files.createTempDirectory("layout-bloomrg").toString
    val rgOpts = Map("parquet.block.size" -> "131072") // many small groups
    def build(dir: String, n: Long): Unit =
      Layout.writeWithBloomFilters(
        spark.range(n).select(
          org.apache.spark.sql.functions.xxhash64($"id").as("k"),
          ($"id" * 37L).as("payload")),
        dir, Seq("k"), ndv = 20000L, extraOptions = rgOpts)
    def rowGroupStats(dir: String, key: Long): (Int, Int) = {
      import scala.jdk.CollectionConverters._
      var total = 0; var accepted = 0
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).foreach { f =>
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(f.getAbsolutePath),
              spark.sessionState.newHadoopConf()))
          try reader.getFooter.getBlocks.asScala.foreach { rg =>
            total += 1
            val cmd = rg.getColumns.asScala
              .map(c => c.getPath.toDotString -> c).toMap.apply("k")
            val bf = reader.getBloomFilterDataReader(rg).readBloomFilter(cmd)
            // a null filter cannot skip — count it as a forced read
            if (bf == null || bf.findHash(bf.hash(key))) accepted += 1
          } finally reader.close()
        }
      (total, accepted)
    }
    val absentKey = 424242L // xxhash64 outputs won't land here (checked)
    for ((tag, n) <- Seq(("1x", 200000L), ("10x", 2000000L))) {
      val dir = s"$root/$tag"
      build(dir, n)
      assert(spark.read.parquet(dir).where($"k" === absentKey).isEmpty,
        "probe key must be absent for the skip measurement")
      val presentKey = spark.read.parquet(dir).select("k").head().getLong(0)
      val (total, accAbsent) = rowGroupStats(dir, absentKey)
      val (_, accPresent) = rowGroupStats(dir, presentKey)
      info(s"$tag: $total row groups; absent-key accepts $accAbsent, " +
        s"present-key accepts $accPresent")
      assert(total >= (if (tag == "1x") 8 else 80),
        s"$tag corpus did not produce many row groups: $total")
      // absent key: ≥99% of row groups skipped (bloom fpp is the
      // only leak); present key: its own group + fpp noise only
      assert(accAbsent * 100 <= total,
        s"$tag absent-key lookup reads $accAbsent/$total row groups")
      assert(accPresent >= 1 && accPresent <= 2 + total / 20,
        s"$tag present-key lookup reads $accPresent/$total row groups")
    }
  }

  test("compact refuses in-place overwrite (would truncate its own input)") {
    val dir = java.nio.file.Files.createTempDirectory("layout-inplace").toString
    Tables.load(spark, sfDir, "region").write.mode("overwrite")
      .parquet(s"$dir/t")
    val e = intercept[IllegalArgumentException](
      Layout.compact(spark, s"$dir/t", s"$dir/t"))
    assert(e.getMessage.contains("staging"), e.getMessage)
    // input intact
    assert(spark.read.parquet(s"$dir/t").count() > 0)
  }
}
