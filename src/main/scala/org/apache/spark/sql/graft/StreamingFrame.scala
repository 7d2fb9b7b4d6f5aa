package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}

/** Bridge to the `private[sql]` streaming-frame constructor a V1
  * [[org.apache.spark.sql.execution.streaming.Source]] needs: its
  * `getBatch` must return a DataFrame tagged `isStreaming = true`,
  * and the only constructor for that
  * (`SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)`)
  * is sql-package-private — so this one-method object lives inside
  * the sql package tree, the standard custom-connector idiom. No
  * other private API is touched.
  */
object StreamingFrame {
  def asStreaming(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = true)
  }
}
