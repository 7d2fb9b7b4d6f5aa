package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.Tables

/** Typed row models for the corpus + typed loaders. Use these when
  * compile-time safety pays (operator internals, streaming state);
  * stay with DataFrame where schemas are dynamic (generic query
  * surface).
  */
final case class Document(doc_id: Long, text: String, lang: String,
                          source: String, n_chars: Long)

final case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

final case class EventRow(event_id: Long, ts: Timestamp, user_id: Long,
                          event_type: String, value: Double, props: String)

object Typed {
  def documents(spark: SparkSession, sfDir: String): Dataset[Document] = {
    import spark.implicits._
    Tables.load(spark, sfDir, "documents").as[Document]
  }

  def embeddings(spark: SparkSession, sfDir: String): Dataset[Embedding] = {
    import spark.implicits._
    Tables.load(spark, sfDir, "embeddings").as[Embedding]
  }

  def events(spark: SparkSession, sfDir: String): Dataset[EventRow] = {
    import spark.implicits._
    Tables.load(spark, sfDir, "events").as[EventRow]
  }
}
