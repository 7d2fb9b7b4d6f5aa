package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.CorpusStore

/** Versioned corpus snapshots (round 14 — verdict task 7): the BM25
  * generation-pointer idiom applied to the corpus itself. Pins the
  * full lifecycle — write/commit, time-travel read, CONCURRENT-READER
  * safety across a swap (the verdict's named bar), the snapshotDiff
  * integration, vacuum's atomic-base-then-delete ordering, and the
  * invisibility of uncommitted (crashed-writer) generations.
  */
class CorpusStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def v0 = Seq(
    (1L, "alpha beta gamma"),
    (2L, "delta epsilon zeta"),
    (3L, "eta theta iota")).toDF("doc_id", "text")

  // v1: doc 2 changed, doc 3 removed, doc 4 added
  private def v1 = Seq(
    (1L, "alpha beta gamma"),
    (2L, "delta epsilon CHANGED"),
    (4L, "kappa lambda mu")).toDF("doc_id", "text")

  test("write → read round-trips; versions accumulate; list reads manifests only") {
    val path = tmp("graft-cs")
    assert(CorpusStore.writeCorpusSnapshot(v0, path) == 0)
    assert(CorpusStore.readCorpusSnapshot(spark, path)
      .orderBy("doc_id").collect().toSeq ==
      v0.orderBy("doc_id").collect().toSeq)
    assert(CorpusStore.writeCorpusSnapshot(v1, path) == 1)
    assert(CorpusStore.currentGen(spark, path) == ((1, 0)))
    // CURRENT reads v1; time travel reads v0 bit-identically
    assert(CorpusStore.readCorpusSnapshot(spark, path)
      .orderBy("doc_id").collect().toSeq ==
      v1.orderBy("doc_id").collect().toSeq)
    assert(CorpusStore.readCorpusSnapshotAt(spark, path, 0)
      .orderBy("doc_id").collect().toSeq ==
      v0.orderBy("doc_id").collect().toSeq)
    assert(CorpusStore.listCorpusSnapshots(spark, path)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((0, 3L), (1, 3L)))
  }

  test("concurrent reader resolved before a swap keeps its version; fresh reads see the new one") {
    val path = tmp("graft-cs-swap")
    CorpusStore.writeCorpusSnapshot(v0, path)
    // resolve a reader against CURRENT (gen 0) BEFORE the swap — this
    // is the DataFrame a long-running job would be scanning
    val reader = CorpusStore.readCorpusSnapshot(spark, path)
    CorpusStore.writeCorpusSnapshot(v1, path)
    // the pre-swap reader still sees gen 0, bit-identically
    assert(reader.orderBy("doc_id").collect().toSeq ==
      v0.orderBy("doc_id").collect().toSeq)
    // a fresh resolve sees gen 1
    assert(CorpusStore.readCorpusSnapshot(spark, path)
      .orderBy("doc_id").collect().toSeq ==
      v1.orderBy("doc_id").collect().toSeq)
  }

  test("read-modify-write: next version derives from CURRENT without self-overwrite") {
    val path = tmp("graft-cs-rmw")
    CorpusStore.writeCorpusSnapshot(v0, path)
    val cur = CorpusStore.readCorpusSnapshot(spark, path)
    val gen = CorpusStore.writeCorpusSnapshot(
      cur.where(col("doc_id") =!= 3L), path)
    assert(gen == 1)
    assert(CorpusStore.readCorpusSnapshot(spark, path)
      .select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // the source version is untouched
    assert(CorpusStore.readCorpusSnapshotAt(spark, path, 0).count() == 3)
  }

  test("snapshotDelta matches Dedup.snapshotDiff and reports add/remove/change") {
    val path = tmp("graft-cs-delta")
    CorpusStore.writeCorpusSnapshot(v0, path)
    CorpusStore.writeCorpusSnapshot(v1, path)
    val delta = CorpusStore
      .snapshotDelta(spark, path, 0, 1, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(delta == Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
    val direct = Dedup.snapshotDiff(v0, v1, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(delta == direct)
  }

  test("vacuum moves base atomically before deleting; below-base reads fail fast; idempotent") {
    val path = tmp("graft-cs-vac")
    CorpusStore.writeCorpusSnapshot(v0, path)
    CorpusStore.writeCorpusSnapshot(v1, path)
    CorpusStore.writeCorpusSnapshot(
      v1.withColumn("text", upper(col("text"))), path)
    CorpusStore.vacuumCorpusSnapshots(spark, path, keepLast = 2)
    assert(CorpusStore.currentGen(spark, path) == ((2, 1)))
    // gen 0 data and manifest are gone; reads of it fail fast
    assert(!new java.io.File(s"$path/snapshots/gen=0").exists)
    val e = intercept[IllegalArgumentException] {
      CorpusStore.readCorpusSnapshotAt(spark, path, 0)
    }
    assert(e.getMessage.contains("not retained"))
    // retained gens still read; listing covers exactly base..gen
    assert(CorpusStore.readCorpusSnapshotAt(spark, path, 1).count() == 3)
    assert(CorpusStore.listCorpusSnapshots(spark, path)
      .select("gen").as[Int].collect().toSeq == Seq(1, 2))
    // re-running the vacuum (crash-retry) is a no-op
    CorpusStore.vacuumCorpusSnapshots(spark, path, keepLast = 2)
    assert(CorpusStore.currentGen(spark, path) == ((2, 1)))
  }

  test("a crashed writer's orphan generation is invisible until its commit lands") {
    val path = tmp("graft-cs-crash")
    CorpusStore.writeCorpusSnapshot(v0, path)
    // simulate a writer that materialized gen 1 but died before the
    // CURRENT rename: data exists, pointer still says 0
    v1.write.mode("overwrite").parquet(s"$path/snapshots/gen=1")
    assert(CorpusStore.currentGen(spark, path) == ((0, 0)))
    assert(CorpusStore.readCorpusSnapshot(spark, path).count() == 3)
    val e = intercept[IllegalArgumentException] {
      CorpusStore.readCorpusSnapshotAt(spark, path, 1)
    }
    assert(e.getMessage.contains("not retained"))
    // the retried write overwrites the orphan and commits exactly once
    assert(CorpusStore.writeCorpusSnapshot(v1, path) == 1)
    assert(CorpusStore.readCorpusSnapshot(spark, path)
      .orderBy("doc_id").collect().toSeq ==
      v1.orderBy("doc_id").collect().toSeq)
  }
}
