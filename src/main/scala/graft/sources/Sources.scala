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
