package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale probe for the RELATIONAL tail — the families ScaleProbe /
  * ScaleProbeXL deliberately do not cover (their salted replication is
  * shaped for dedup/ANN candidate volume; the relational queries need
  * REFERENTIALLY CONSISTENT scaling instead).
  *
  * Why: at sf0.1 most relational queries finish under a second, so
  * per-query constants dominate and a superlinear term (an accidental
  * broadcast of a growing side, a sort that stops fitting its
  * partition, a join key whose group size grows with data) can hide.
  * This probe materializes a `factor`× corpus whose KEYS are shifted
  * per copy — customer/part/supplier/orders/lineitem strides keep
  * every FK pointing into its own copy, events shifts user ids — so
  * per-key group sizes and join fan-outs stay constant (the workload
  * grows, the per-row work does not: linear scaling is the correct
  * null hypothesis, and a failure is a real plan bug, not duplicate-
  * key semantics). region/nation stay 1× — fixed-cardinality dims,
  * exactly like TPC-H scaling.
  *
  * Run: `sbt "runMain graft.RelationalScaleProbe"` (defaults: sf0.1 →
  * /tmp/graft_sfx at 10×). Prints per-query base/scaled times and a
  * verdict line; budget = 1.5 × factor × max(base, 0.3 s) — the floor
  * absorbs per-query overhead on sub-second queries, the 1.5 ambient
  * headroom matches the bench's documented noise band.
  */
object RelationalScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val workDir = if (args.length > 1) args(1) else "/tmp/graft_sfx"
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ── build the factor× referentially consistent corpus ──
    def maxKey(name: String, c: String): Long =
      Tables.load(spark, sfDir, name).agg(max(col(c))).head().getLong(0) + 1
    val oStride = maxKey("orders", "o_orderkey")
    val cStride = maxKey("customer", "c_custkey")
    val pStride = maxKey("part", "p_partkey")
    val sStride = maxKey("supplier", "s_suppkey")
    val uStride = maxKey("events", "user_id")
    val eStride = maxKey("events", "event_id")

    def scaled(df: DataFrame, shifts: (String, Long)*): DataFrame =
      (0 until factor).map { i =>
        shifts.foldLeft(df) { case (d, (c, stride)) =>
          d.withColumn(c, col(c) + lit(i * stride))
        }
      }.reduce(_ unionByName _)

    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$workDir/$name.parquet")

    val t0 = System.nanoTime()
    write(scaled(Tables.load(spark, sfDir, "customer"),
      "c_custkey" -> cStride), "customer")
    write(scaled(Tables.load(spark, sfDir, "supplier"),
      "s_suppkey" -> sStride), "supplier")
    write(scaled(Tables.load(spark, sfDir, "part"),
      "p_partkey" -> pStride), "part")
    write(scaled(Tables.load(spark, sfDir, "orders"),
      "o_orderkey" -> oStride, "o_custkey" -> cStride), "orders")
    write(scaled(Tables.load(spark, sfDir, "lineitem"),
      "l_orderkey" -> oStride, "l_partkey" -> pStride,
      "l_suppkey" -> sStride), "lineitem")
    // events: raw nanos-as-long read so the written parquet keeps the
    // long ts column Tables.events expects to convert
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    write(scaled(spark.read.parquet(s"$sfDir/events.parquet"),
      "event_id" -> eStride, "user_id" -> uStride), "events")
    // fixed-cardinality dims + pipeline tables: copied 1× (any query
    // that touches them sees unchanged data; they are not this
    // probe's subject — ScaleProbeXL owns the dedup/ANN families)
    Seq("region", "nation", "documents", "embeddings").foreach { n =>
      write(spark.read.parquet(s"$sfDir/$n.parquet"), n)
    }
    println(f"[probe-rel] built ${factor}× corpus in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s at $workDir")

    // ── time the relational + events families at 1× and factor× ──
    val names = SparkEntry.queries.keys.toSeq
      .filter(n => n.startsWith("q") || n.startsWith("e")).sorted
    def sweep(dir: String): Map[String, Double] = {
      Tables.names.foreach(n =>
        try Tables.load(spark, dir, n).count() catch { case _: Throwable => })
      names.map { n =>
        val fn = SparkEntry.queries(n)
        val t = System.nanoTime()
        try fn(spark, dir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[probe-rel] $n failed at $dir: ${e.getMessage}")
        } finally graft.operators.Dedup.unpersistAll()
        n -> (System.nanoTime() - t) / 1e9
      }.toMap
    }
    val base = sweep(sfDir)
    val big = sweep(workDir)
    var bad = 0
    names.foreach { n =>
      val b = base(n); val x = big(n)
      val budget = 1.5 * factor * math.max(b, 0.3)
      val flag = if (x > budget) { bad += 1; " <-- SUPERLINEAR" } else ""
      println(f"[probe-rel] $n%-28s base=$b%7.2fs ${factor}x=$x%7.2fs " +
        f"ratio=${x / math.max(b, 1e-9)}%6.1f budget=$budget%7.2fs$flag")
    }
    println(s"[probe-rel] verdict: $bad/${names.size} queries exceeded " +
      s"the 1.5×$factor× budget")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
