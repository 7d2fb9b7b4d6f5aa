package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Ingest, Takedown}
import graft.operators.Takedown.TakedownTargets
import graft.sources.CorpusStore

/** Cross-store ingest orchestration (round 15 — the admission mirror
  * of TakedownSpec): one foreachBatch body runs admission → COW
  * corpus upsert → LSH append → ledger append, replay-guarded, and
  * the three stores never drift from each other across batches,
  * replays, simulated crash windows, or a takedown-then-recrawl
  * cycle.
  */
class IngestLoopSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def text(i: Long): String =
    (0 until 8).map(j => s"v${i}x$j").mkString(" ")

  test("corpusIngestBatch: admit → corpus → lsh → ledger stay in lockstep across batches, replays and crash windows") {
    val store = tmp("graft-il-store")
    val ledger = tmp("graft-il-led")
    val lsh = tmp("graft-il-lsh")
    // founding state: empty-ish corpus + empty ledger + index over
    // the founding docs
    val founding = (0L to 9L).map(i => (i, text(i))).toDF("doc_id", "text")
    CorpusStore.writeCorpusCow(founding, store, "doc_id", numBuckets = 8)
    Dedup.writeExactLedger(founding, "text", ledger)
    Dedup.writeLshIndex(founding, "doc_id", "text", lsh)
    val ingest = Ingest.corpusIngestBatch(store, ledger,
      lshPath = Some(lsh)) _

    def corpusIds(): Set[Long] =
      CorpusStore.readCorpusSnapshot(spark, store)
        .select("doc_id").as[Long].collect().toSet
    def lshCollides(i: Long): Boolean =
      try Dedup.dedupAgainstLshIndex(
        Seq((900L + i, text(i))).toDF("doc_id", "text"),
        "doc_id", "text", lsh, threshold = 0.5).count() > 0
      finally Dedup.unpersistAll()

    // batch 0: one new doc, one within-batch exact dup pair (min-id
    // survivor), one content-dup of the founding corpus (rejected)
    val b0 = Seq(
      (20L, text(20L)),
      (21L, text(21L)), (22L, text(21L)), // within-batch dup pair
      (23L, text(3L)))                    // already ledgered
      .toDF("doc_id", "text")
    ingest(b0, 0L)
    Dedup.unpersistAll()
    assert(corpusIds() == (0L to 9L).toSet ++ Set(20L, 21L),
      corpusIds().toString)
    assert(lshCollides(20L) && lshCollides(21L),
      "admitted docs must be indexed")
    // ledger re-established for the admitted content: a twin under a
    // fresh id is now rejected
    ingest(Seq((30L, text(20L))).toDF("doc_id", "text"), 1L)
    Dedup.unpersistAll()
    assert(!corpusIds().contains(30L), "ledgered content re-admitted")
    // the empty-admission batch still logged: replaying it is a no-op
    val genAfter = CorpusStore.currentGen(spark, store)._1
    ingest(Seq((30L, text(20L))).toDF("doc_id", "text"), 1L)
    assert(CorpusStore.currentGen(spark, store)._1 == genAfter)
    // replaying batch 0 is a no-op too
    ingest(b0, 0L)
    assert(CorpusStore.currentGen(spark, store)._1 == genAfter)

    // crash-window simulation: everything committed but the log write
    // was lost — the restart replays under a FRESH batch id; the
    // ledger (appended before the crash) rejects all content, a
    // redundant no-data pass logs, and no store moves
    ingest(b0, 7L)
    Dedup.unpersistAll()
    assert(CorpusStore.currentGen(spark, store)._1 == genAfter,
      "post-ledger crash replay must not commit a generation")
    assert(corpusIds() == (0L to 9L).toSet ++ Set(20L, 21L))

    // crash-window simulation, other side: corpus committed but LSH/
    // ledger appends lost. The replay (fresh id) re-admits — because
    // the LEDGER append is the chain's last write — and repeats the
    // writes: corpus gains a redundant content-identical generation,
    // the index gains byte-identical rows both probes distinct away
    val b2 = Seq((40L, text(40L))).toDF("doc_id", "text")
    CorpusStore.upsertIntoCorpusCow(b2, store) // the "crashed" upsert
    val genCrash = CorpusStore.currentGen(spark, store)._1
    ingest(b2, 8L) // replay under its own batch id
    Dedup.unpersistAll()
    assert(CorpusStore.currentGen(spark, store)._1 == genCrash + 1,
      "replay repeats the upsert (redundant, content-identical)")
    assert(corpusIds() == (0L to 9L).toSet ++ Set(20L, 21L, 40L))
    // content-identical across the redundant generation
    assert(CorpusStore.snapshotDelta(spark, store, genCrash,
        genCrash + 1, "doc_id", "text")
      .where(col("status") =!= "unchanged").count() == 0)
    assert(lshCollides(40L), "replayed batch must be indexed")

    // the full circle: takedown then clean recrawl re-admits
    Takedown.takedownEverywhere(spark, Seq(20L).toDF("doc_id"),
      "doc_id", "text", TakedownTargets(
        corpusPath = Some(store), ledgerPath = Some(ledger),
        lshPath = Some(lsh)))
    Dedup.unpersistAll()
    assert(!corpusIds().contains(20L))
    ingest(Seq((50L, text(20L))).toDF("doc_id", "text"), 9L)
    Dedup.unpersistAll()
    assert(corpusIds().contains(50L),
      "taken-down content must re-admit under a fresh id")
    assert(lshCollides(20L), "re-admitted content must be re-indexed")
  }
}
