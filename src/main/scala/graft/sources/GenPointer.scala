package graft.sources

import org.apache.spark.sql.SparkSession

/** The shared atomic generation-pointer primitive behind the BM25
  * index ([[graft.operators.Retrieval]]) and the corpus store
  * ([[CorpusStore]]): a single `CURRENT` file holding "g" or "g b"
  * (committed generation, oldest retained base), committed by ONE
  * atomic rename. Extracted in round 14 so the crash-safety-critical
  * code — and the fix below — lives once.
  *
  * Read race, fixed here (round-14 review finding): the previous
  * per-module readers fetched the file LENGTH via getFileStatus and
  * then opened the file — a swap landing between the two calls made
  * readFully read the NEW file with the OLD file's length, silently
  * resolving a wrong (possibly vacuumed) generation or throwing EOF.
  * [[read]] opens the file FIRST and reads the opened stream to EOF:
  * the open pins one version of the file (rename replaces the
  * directory entry, not the open handle's data), so a reader always
  * sees one complete pointer value, before or after the swap — never
  * a hybrid.
  */
object GenPointer {

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Whether `path/CURRENT` exists (a store/index with no committed
    * generation has none).
    */
  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new org.apache.hadoop.fs.Path(s"$path/CURRENT"))

  /** The committed (gen, base) pair; base defaults to 0 for the
    * bare-int legacy format.
    */
  def read(spark: SparkSession, path: String): (Int, Int) = {
    val p = new org.apache.hadoop.fs.Path(s"$path/CURRENT")
    val in = fs(spark, path).open(p)
    val buf = new java.io.ByteArrayOutputStream(32)
    try {
      val chunk = new Array[Byte](256) // a pointer is tens of bytes
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
    } finally in.close()
    val parts = new String(buf.toByteArray,
      java.nio.charset.StandardCharsets.UTF_8).trim.split("\\s+")
    (parts(0).toInt, if (parts.length > 1) parts(1).toInt else 0)
  }

  /** Atomically (re)point CURRENT at (gen, base): write CURRENT.tmp,
    * then rename with OVERWRITE via FileContext — the one metadata op
    * HDFS and POSIX both make atomic. A crash before the rename
    * leaves the previous pointer (and thus the previous committed
    * state) fully intact. base=0 writes the bare-int legacy format so
    * never-compacted stores stay readable by pre-compaction code.
    */
  def commit(spark: SparkSession, path: String, gen: Int,
             base: Int = 0): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dst = new org.apache.hadoop.fs.Path(s"$path/CURRENT")
    val tmp = new org.apache.hadoop.fs.Path(s"$path/CURRENT.tmp")
    val out = fs(spark, path).create(tmp, true)
    val text = if (base == 0) gen.toString else s"$gen $base"
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, conf)
      .rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }
}
