package graft

import org.apache.spark.sql.SparkSession

/** Bench-margin adjudication tool (round-10 verdict task 1): run the
  * named queries N times each IN ONE JVM — the "three quiet runs in
  * one session" the baseline re-pin protocol asks for — and print a
  * per-query table of every pass plus the min. One JVM means every
  * pass shares JIT/codegen/footer warmth, so the spread isolates
  * genuine run-to-run variance (scheduling, GC, cache races) from
  * cold-start noise, which is what an adjudication needs to see.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.BenchAdjudicate q23_rollup,c05_topic_clusters 3"
  */
object BenchAdjudicate {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchAdjudicate <q1,q2,...> [rounds]")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val rounds = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val unknown = names.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    try Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    catch { case _: Throwable => }
    def timeOne(name: String): Double = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      finally graft.operators.Dedup.unpersistAll()
      (System.nanoTime() - t0) / 1e9
    }
    // one untimed warm pass over the set (Bench's warm-up stance)
    names.foreach(n => try timeOne(n) catch { case _: Throwable => })
    // interleave whole sweeps rather than back-to-back repeats of one
    // query, matching how the driver's sweep spaces them out
    val obs = Array.fill(rounds)(names.map(n => n -> timeOne(n)).toMap)
    println("query,%s,min".format((1 to rounds).map("run" + _).mkString(",")))
    names.foreach { n =>
      val xs = obs.map(_(n))
      println(f"$n,${xs.map(x => f"$x%.3f").mkString(",")},${xs.min}%.3f")
    }
    spark.stop()
  }
}
