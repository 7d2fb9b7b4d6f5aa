package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.CorpusStore

/** Cross-store takedown orchestration (round 15): the compliance
  * operation a living corpus actually receives — "these ids must go"
  * — fans out across every store that serves their content, in ONE
  * call with ONE ordering rationale. The per-store takedowns all
  * exist ([[Dedup.deleteFromLshIndex]] / [[Dedup.deleteFromExactLedger]]
  * / [[Retrieval.deleteFromBm25Index]] / [[Similarity.deleteFromIvfIndex]]
  * / [[CorpusStore.deleteFromCorpusCow]]); what composition adds — and
  * what rounds 13–14 proved is where the bugs live — is the
  * cross-store choreography:
  *
  *  1. the doomed rows' TEXT resolves from the CURRENT corpus FIRST
  *     (the ledger is keyed by content hash; after the corpus flip
  *     the text is gone);
  *  2. index tombstones land BEFORE the corpus flip — deleted content
  *     becomes probe/serve-invisible immediately, so a crash mid-way
  *     leaves content still readable in the corpus but never servable
  *     by a probe (the conservative failure mode for a takedown);
  *  3. the ledger entry goes (so a clean future recrawl re-admits —
  *     the LivingCorpusSpec re-admission contract);
  *  4. the corpus COW delete commits LAST — one bucket-local
  *     generation, the atomic pointer flip being the operation's
  *     "done".
  *
  * Idempotent by composition: tombstone appends are idempotent facts
  * (probes distinct), the ledger delete re-appends the same hashes,
  * and a re-run whose ids are already gone skips the corpus commit
  * entirely (nInCorpus = 0 — no redundant generation). Every
  * per-store `maxTombstones` fail-fast guard still applies: a
  * corpus-scale takedown is a rebuild, and this orchestrator refuses
  * it exactly where the individual deletes would.
  */
object Takedown {

  /** Which stores serve the content being taken down. Omitted stores
    * are untouched; `ivfPaths` covers IVF, PQ and IVF-PQ indexes
    * (shared tombstone layout).
    */
  final case class TakedownTargets(
      corpusPath: Option[String] = None,
      ledgerPath: Option[String] = None,
      lshPath: Option[String] = None,
      bm25Path: Option[String] = None,
      ivfPaths: Seq[String] = Nil)

  /** What one takedown did: ids requested (distinct), ids actually
    * present in the CURRENT corpus version (the rows whose text fed
    * the ledger delete), and the corpus generation the removal
    * committed (None when nothing was present — a re-run, or an
    * index-only takedown).
    */
  final case class TakedownReport(
      nRequested: Long, nInCorpus: Long, corpusGen: Option[Int])

  def takedownEverywhere(spark: SparkSession, ids: DataFrame,
      idCol: String, textCol: String, targets: TakedownTargets,
      maxTombstones: Long = Dedup.defaultMaxTombstones): TakedownReport = {
    require(targets.corpusPath.isDefined || targets.ledgerPath.isDefined ||
        targets.lshPath.isDefined || targets.bm25Path.isDefined ||
        targets.ivfPaths.nonEmpty,
      "takedownEverywhere: no targets")
    require(targets.ledgerPath.isEmpty || targets.corpusPath.isDefined,
      "takedownEverywhere: a ledger takedown needs corpusPath — the " +
        "ledger is keyed by content hash and the doomed rows' text " +
        "resolves from the CURRENT corpus")
    // pin the request before anything mutates
    val del = ids.select(col(idCol)).distinct().localCheckpoint()
    val nRequested = del.count()
    require(nRequested > 0, "takedownEverywhere: empty id set")
    // step 1: resolve the doomed rows from the CURRENT corpus while
    // it still holds them
    val doomedRows = targets.corpusPath.map { cp =>
      CorpusStore.readCorpusSnapshot(spark, cp)
        .join(del, Seq(idCol)).select(col(idCol), col(textCol))
        .localCheckpoint()
    }
    val nInCorpus = doomedRows.map(_.count()).getOrElse(0L)
    // step 2: probe-invisibility first — every index tombstones
    // before the corpus flips
    targets.lshPath.foreach(p =>
      Dedup.deleteFromLshIndex(del, idCol, p, maxTombstones))
    targets.bm25Path.foreach(p =>
      Retrieval.deleteFromBm25Index(spark, del, idCol, p, maxTombstones))
    targets.ivfPaths.foreach(p =>
      Similarity.deleteFromIvfIndex(del, idCol, p, maxTombstones))
    // step 3: the ledger entry goes so a clean recrawl re-admits
    if (nInCorpus > 0)
      targets.ledgerPath.foreach(p =>
        Dedup.deleteFromExactLedger(doomedRows.get, textCol, p,
          maxTombstones))
    // step 4: the corpus commit is the operation's "done" — skipped
    // when nothing is present, so re-runs add no redundant generation
    val gen = targets.corpusPath.flatMap { cp =>
      if (nInCorpus == 0) None
      else Some(CorpusStore.deleteFromCorpusCow(del, cp))
    }
    TakedownReport(nRequested, nInCorpus, gen)
  }
}
