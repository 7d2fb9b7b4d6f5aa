package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table registry for the TPC-H-ish test corpus (see TESTDATA.md).
  *
  * Mirrors the reference's table registration step
  * (reference: datafusion-sqlgen/tests/select.rs:71-95 —
  * `ctx.register_parquet` / `register_csv`): every query addresses
  * tables by name; the engine resolves names to parquet scans so
  * Catalyst sees a declarative relation it can prune and push
  * filters into.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table from a scale-factor directory. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events table's `ts` arrives in two physical forms depending
    * on the generator vintage: parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects outright (read as raw longs via the
    * legacy conf), or native TIMESTAMP(MICROS) with
    * isAdjustedToUTC=false (read as TIMESTAMP_NTZ). Both normalize to
    * ONE logical schema — a microsecond TimestampType column — so
    * every downstream query sees identical types and values:
    *  - long nanos floor-divide with exact integer math: `ts / 1000`
    *    in double would silently lose precision above 2^53 ns, and
    *    `div` truncates toward zero, which rounds pre-epoch
    *    remainders the wrong way (DuckDB's native ns→µs cast of the
    *    same parquet floors) — `(ts - pmod(ts, 1000)) div 1000`
    *    floors for any sign;
    *  - TIMESTAMP_NTZ casts to TimestampType, value-preserving under
    *    the UTC session timezone every entry point pins (and exactly
    *    how DuckDB reads the same column: naive wall-clock = UTC).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case other =>
        // The contract is "both known physical forms normalize to ONE
        // logical schema"; a third generator vintage must fail HERE,
        // at load, not obscurely downstream in a query.
        throw new IllegalStateException(
          s"events.ts has unsupported physical type $other — expected " +
            "LongType (nanos-as-long) or TimestampNTZType; add an " +
            "explicit normalization case for this generator vintage")
    }
  }

  /** Register every table as a temp view named after itself, so both
    * the DataFrame API and `spark.sql` address the same relations.
    * Idempotent; cheap (metadata only).
    */
  def register(spark: SparkSession, sfDir: String): Unit = {
    names.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }
    // The raw (nanos-as-long) events relation under its own name, so
    // SQL regenerated from a plan that embeds the ns→µs conversion
    // (SqlGen) resolves against the unconverted table.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .createOrReplaceTempView("events_raw")
  }
}
