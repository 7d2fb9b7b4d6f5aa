package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface matching the reference's table registration
  * paths (reference: datafusion-sqlgen/tests/select.rs:72-95
  * `register_parquet` / `register_csv`, plus MemTable at :270-273):
  * parquet, CSV (with explicit schema or header inference), JSON
  * lines, and in-memory rows. Writers partition by key columns so
  * downstream scans prune directories — the 100 TB layout contract.
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** CSV with an explicit schema (production path — inference reads
    * the data twice and guesses types).
    *
    * multiLine: quoted fields may span physical lines — without it a
    * text value containing a newline (ubiquitous in the documents
    * corpus) splits into malformed rows. emptyValue "" keeps written
    * empty strings distinct from nulls on the way back in.
    */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true")
      .option("multiLine", "true").option("emptyValue", "")
      .option("nullValue", "\\N")
      .csv(path)

  /** CSV with header + inference (exploration path only). */
  def csvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true")
      .option("multiLine", "true").option("emptyValue", "")
      .option("nullValue", "\\N")
      .csv(path)

  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Permissive JSON-lines read that QUARANTINES malformed records
    * instead of nulling them silently (PERMISSIVE's default) or
    * killing the job (FAILFAST). At 100 TB of scraped JSON a handful
    * of truncated lines is a certainty, not a corner case; the right
    * contract is the classic bad-records pattern: every row lands in
    * the frame, good rows with their columns parsed, bad rows with
    * the RAW line preserved in `_corrupt_record` and everything else
    * null — so `where($"_corrupt_record".isNull)` is the clean set
    * and the quarantine can be written aside for reprocessing, with
    * counts for the ingest report. The caller's schema must NOT
    * declare `_corrupt_record`; it is appended here.
    *
    * Spark caveat: since 2.3 a json scan whose referenced columns
    * reduce to ONLY the corrupt column is disallowed (the parser
    * would run with an empty required schema and report nothing as
    * corrupt). [[splitQuarantine]] therefore keeps ALL columns on the
    * bad side — write it aside or cache it before narrowing to the
    * raw line, exactly as the Spark error message prescribes.
    */
  def jsonLinesQuarantine(
      spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains("_corrupt_record"),
      "jsonLinesQuarantine appends _corrupt_record; the data schema " +
        "must not declare it")
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
  }

  /** Split a quarantine read into (clean rows without the marker
    * column, bad rows with ALL columns — the raw line sits in
    * `_corrupt_record`, the data columns are null). The bad side
    * deliberately keeps every column: projecting it down to the raw
    * line alone would reduce the scan's required schema to the
    * corrupt column only, which Spark rejects (see
    * [[jsonLinesQuarantine]]); write it aside or cache before
    * narrowing.
    */
  def splitQuarantine(df: DataFrame): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.col
    (df.where(col("_corrupt_record").isNull).drop("_corrupt_record"),
     df.where(col("_corrupt_record").isNotNull))
  }

  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true")
      .option("emptyValue", "\"\"").option("nullValue", "\\N")
      .csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC — the other columnar warehouse format Spark ships natively;
    * same pushdown/pruning contract as parquet (predicate pushdown via
    * ORC's row-group stats, column pruning via the reader schema).
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** Raw text lines: one string column `value`, one row per physical
    * line — the ingest shape for undelimited corpora (a writer row
    * containing '\n' therefore reads back as multiple rows; normalize
    * first if roundtripping matters).
    */
  def textLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** Write a single string column as raw text lines. */
  def writeText(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).text(path)
}
