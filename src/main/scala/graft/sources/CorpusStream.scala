package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** `readCorpusStream` — the COW corpus store as a first-class
  * Structured Streaming SOURCE (round 16, completing the change-feed
  * story): `spark.readStream.format("graft-corpus").option("path", p)
  * .load()` emits each committed generation range as a micro-batch,
  * so index ingest, pack writers, or any other follower ride Spark's
  * OWN offset checkpointing instead of the [[CorpusStore.followCorpus]]
  * pull loop — watermarks, foreachBatch, rate limits and restart
  * recovery all come for free.
  *
  * Offsets ARE generation numbers (the store's atomic commit unit):
  * `getOffset` reads the CURRENT pointer (one metadata read per
  * trigger), and `getBatch(start, end)` is exactly
  * [[CorpusStore.corpusChangesSince]](start, end] — O(changes) for
  * delta generations, the at-least-the-changes re-emission contract
  * for rewrites, deletions never surfacing. The first batch
  * (start = None) bootstraps with the full CURRENT version, same as
  * a fresh follower.
  *
  * Delivery semantics: Spark's checkpoint persists the (start, end]
  * range before the sink commits, so a crash replays the SAME range —
  * at-least-once per row, exactly-once in EFFECT for the idempotent
  * consumers the change-feed contract already requires (index appends
  * that probes distinct away, keyed upserts). Retention contract: a
  * restarted stream's checkpointed offset must still be ≥ the store's
  * vacuum base — [[CorpusStore.corpusChangesSince]] fails fast on a
  * vacuumed end generation rather than silently skipping history, so
  * size `vacuumCorpusSnapshots` retention past the longest expected
  * stream downtime (the same reader contract every vacuum carries).
  *
  * V1 [[Source]] on purpose: `getBatch` returns the change feed's
  * DataFrame directly (manifest-resolved multi-dir parquet scans, the
  * LWW merge only where chains exist), so the stream reads the exact
  * plan the batch feed reads — a DSv2 MicroBatchStream would have to
  * re-implement the scan row-by-row for zero gain on a
  * generation-granular source.
  */
class CorpusStreamProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-corpus"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-corpus source requires .option(\"path\", <cow store>)"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val spark = sqlContext.sparkSession
    val path = pathOf(parameters)
    require(CorpusStore.isCow(spark, path),
      s"graft-corpus source: $path is not a copy-on-write corpus store")
    require(schema.isEmpty,
      "graft-corpus source: the schema is the store's row schema — " +
        "don't pass one")
    (shortName(), CorpusStore.corpusSchema(spark, path))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new CorpusStreamSource(sqlContext.sparkSession, pathOf(parameters))
}

/** One committed generation number as a streaming offset. */
private[sources] case class GenOffset(gen: Int) extends Offset {
  override def json: String = gen.toString
}

private[sources] class CorpusStreamSource(spark: SparkSession,
    path: String) extends Source {

  override val schema: StructType = CorpusStore.corpusSchema(spark, path)

  // an Offset arriving back from the checkpoint log is a
  // SerializedOffset carrying only the json — parse, never pattern
  // match on GenOffset
  private def genOf(o: Offset): Int = o.json.trim.toInt

  override def getOffset: Option[Offset] =
    Some(GenOffset(CorpusStore.currentGen(spark, path)._1))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val batch = CorpusStore.corpusChangesSince(spark, path,
      start.map(genOf).getOrElse(-1), genOf(end))
    // re-tag the change feed's plan as a streaming frame (the V1
    // Source contract): same physical scan, evaluated once for this
    // micro-batch
    org.apache.spark.sql.graft.StreamingFrame.asStreaming(batch)
  }

  override def stop(): Unit = ()
}
