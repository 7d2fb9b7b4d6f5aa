package graft.sources

import org.apache.spark.sql.SparkSession

/** Driver-direct parquet I/O for TINY metadata trees (r20
  * optimization — guide §5: the driver may do trivial metadata work;
  * a few-row manifest needs no cluster job). A COW commit's
  * manifest/meta, a graph index's hnswmeta, and every read of those
  * trees previously went through `spark.read.parquet` /
  * `repartition(1).write.parquet` — each one a directory listing, a
  * schema resolve, a query plan and a one-task Spark job, ~40–100 ms
  * of pure fixed cost per call on a stage-latency-bound path. These
  * helpers stream the same files through parquet-java's example
  * Group API on the driver instead.
  *
  * Layout parity is the contract: [[write]] produces what
  * `Seq(tuples).toDF(...).repartition(1).write.parquet` produced —
  * one `part-*.snappy.parquet` plus a `_SUCCESS` marker, physical
  * schema DECLARED by the caller (required int32/int64/boolean
  * fields, same names, same order) — so Spark readers and existing
  * stores interoperate in both directions; [[readGroups]] reads any
  * Spark-written file of these shapes (dictionary pages, optional
  * fields, v1/v2 column sets) because the example reader resolves
  * the footer schema per file.
  */
private[graft] object TinyParquet {

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Overwrite `dir` with one parquet file of `rows` under the given
    * physical schema. Field writes are SCHEMA-driven, not
    * value-class-driven: Scala harmonizes a mixed Int/Long Seq to
    * Seq[Long] (widening the Int elements), so matching on the
    * runtime class would hand a LongValue to an int32 column writer
    * (an UnsupportedOperationException deep in the page writer). The
    * declared field type is the single source of truth; a value the
    * field can't exactly hold fails loudly here instead.
    */
  def write(spark: SparkSession, dir: String,
      parquetSchema: String, rows: Seq[Seq[Any]]): Unit = {
    val f = fs(spark, dir)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    f.delete(dirPath, true)
    f.mkdirs(dirPath)
    writePartFile(spark, dir, parquetSchema, rows)
    f.create(new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS"), true).close()
  }

  /** APPEND `rows` to `dir` as one new uniquely-named part file — the
    * per-batch log-append shape (`write.mode("append")` parity): the
    * directory is created if missing and never cleared, so files from
    * the Spark writer and this one coexist (same declared schema ⇒
    * the by-name union resolves identically). A `null` value is
    * written as an unset OPTIONAL field, matching how the Spark
    * writer lands a None.
    */
  def appendRows(spark: SparkSession, dir: String,
      parquetSchema: String, rows: Seq[Seq[Any]]): Unit = {
    val f = fs(spark, dir)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    if (!f.exists(dirPath)) f.mkdirs(dirPath)
    writePartFile(spark, dir, parquetSchema, rows)
  }

  private def writePartFile(spark: SparkSession, dir: String,
      parquetSchema: String, rows: Seq[Seq[Any]]): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroup
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.hadoop.metadata.CompressionCodecName
    import org.apache.parquet.schema.MessageTypeParser
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.schema.Type.Repetition
    val schema = MessageTypeParser.parseMessageType(parquetSchema)
    val file = new org.apache.hadoop.fs.Path(
      s"$dir/part-00000-${java.util.UUID.randomUUID()}.snappy.parquet")
    val writer = ExampleParquetWriter.builder(file)
      .withConf(spark.sessionState.newHadoopConf())
      .withType(schema)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    val fieldTypes = (0 until schema.getFieldCount).map(i =>
      schema.getType(i).asPrimitiveType().getPrimitiveTypeName)
    try rows.foreach { r =>
      require(r.size == fieldTypes.size,
        s"TinyParquet.write: row arity ${r.size} != schema ${fieldTypes.size}")
      val g = new SimpleGroup(schema)
      r.zipWithIndex.foreach { case (v, i) =>
        (fieldTypes(i), v) match {
          case (_, null) =>
            require(schema.getType(i).isRepetition(Repetition.OPTIONAL),
              s"TinyParquet.write: null for non-optional field $i")
          case (PrimitiveTypeName.INT32, n: Int) => g.add(i, n)
          case (PrimitiveTypeName.INT32, n: Long) if n.isValidInt =>
            g.add(i, n.toInt)
          case (PrimitiveTypeName.INT64, n: Int) => g.add(i, n.toLong)
          case (PrimitiveTypeName.INT64, n: Long) => g.add(i, n)
          case (PrimitiveTypeName.BOOLEAN, b: Boolean) => g.add(i, b)
          case (t, x) => throw new IllegalArgumentException(
            s"TinyParquet.write: value $x does not fit field $i ($t)")
        }
      }
      writer.write(g)
    } finally writer.close()
  }

  /** Every row of every `*.parquet` file under `dir` (non-recursive,
    * name-sorted — the one-file layout both writers produce), as
    * example Groups. Callers test column presence via
    * `g.getType.containsField(name)` and extract with the typed
    * getters — the same by-name access the Spark reader gave them.
    * A missing directory fails loudly (FileNotFoundException), like
    * `spark.read.parquet` did.
    */
  def readGroups(spark: SparkSession, dir: String)
      : Seq[org.apache.parquet.example.data.Group] = {
    val files = fs(spark, dir)
      .listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
    files.flatMap(st => readGroupsFile(spark, st.getPath)).toSeq
  }

  /** Every row of ONE parquet file, as example Groups. */
  def readGroupsFile(spark: SparkSession,
      file: org.apache.hadoop.fs.Path)
      : Seq[org.apache.parquet.example.data.Group] = {
    val reader = org.apache.parquet.hadoop.ParquetReader
      .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(), file)
      .withConf(spark.sessionState.newHadoopConf()).build()
    try Iterator.continually(reader.read()).takeWhile(_ != null).toVector
    finally reader.close()
  }
}
