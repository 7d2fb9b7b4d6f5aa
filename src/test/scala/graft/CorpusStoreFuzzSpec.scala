package graft

import org.apache.spark.sql.functions._

import graft.sources.CorpusStore

/** Model-based fuzz of the COW corpus store (round 15 — the
  * SqlGenFuzzSpec stance applied to the round's newest component):
  * a seeded random schedule of upserts / takedowns / vacuums runs
  * against BOTH the store and a driver-side model (a plain Map per
  * version), and after every operation the store's CURRENT read, a
  * randomly chosen retained historical version, and the meta row
  * counts must all match the model exactly. What a hand-written
  * lifecycle spec can't cover: interleavings — upserts over
  * previously deleted ids, deletes of never-present ids, vacuums
  * landing between arbitrary modification pairs, bucket sharing
  * chains across many generations.
  */
class CorpusStoreFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def toDf(m: Map[Long, String]) =
    m.toSeq.toDF("doc_id", "text")

  private def readAsMap(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    df.select("doc_id", "text").as[(Long, String)].collect().toMap

  test("cow model fuzz: 30 seeded random upserts/deletes/vacuums match the model at every retained version") {
    val rnd = new scala.util.Random(15L)
    val path = tmp("graft-cs-fuzz")
    // id 0 is protected from deletion so the store never empties
    // (the empty-generation refusal is pinned separately)
    var model: Map[Long, String] =
      (0L to 29L).map(i => i -> s"seed doc $i").toMap
    CorpusStore.writeCorpusCow(toDf(model), path, "doc_id",
      numBuckets = 8)
    val history = scala.collection.mutable.Map[Int, Map[Long, String]]()
    history(0) = model
    var gen = 0
    var base = 0

    (1 to 30).foreach { step =>
      rnd.nextInt(10) match {
        case r if r <= 5 =>
          // upsert 1-4 rows: mix of existing ids (rewrite), previously
          // deleted ids (resurrection) and fresh ids (insert)
          val k = 1 + rnd.nextInt(4)
          val ids = Seq.fill(k)(rnd.nextInt(40).toLong).distinct
          val up = ids.map(i => i -> s"step $step text for $i").toMap
          gen = CorpusStore.upsertIntoCorpusCow(toDf(up), path)
          model = model ++ up
          history(gen) = model
        case r if r <= 8 =>
          // delete 1-3 ids: mix of present and never-present, id 0
          // protected so the store never empties
          val k = 1 + rnd.nextInt(3)
          val ids = Seq.fill(k)(1L + rnd.nextInt(45)).distinct
          gen = CorpusStore.deleteFromCorpusCow(
            ids.toDF("doc_id"), path)
          model = model -- ids
          history(gen) = model
        case _ =>
          val keep = 1 + rnd.nextInt(3)
          CorpusStore.vacuumCorpusSnapshots(spark, path, keepLast = keep)
          base = math.max(base, gen - keep + 1)
          history.keys.filter(_ < base).toSeq.foreach(history.remove)
      }
      // CURRENT matches the model after every op
      assert(CorpusStore.currentGen(spark, path) == ((gen, base)),
        s"step $step pointer drift")
      assert(readAsMap(CorpusStore.readCorpusSnapshot(spark, path)) ==
        model, s"step $step CURRENT read diverged from the model")
      // one random retained historical version stays bit-identical
      val probe = base + rnd.nextInt(gen - base + 1)
      assert(readAsMap(
        CorpusStore.readCorpusSnapshotAt(spark, path, probe)) ==
        history(probe),
        s"step $step retained gen $probe diverged from its history")
    }

    // end state: EVERY retained version matches its model snapshot,
    // and the meta rows track the model sizes without scanning
    (base to gen).foreach { i =>
      assert(readAsMap(
        CorpusStore.readCorpusSnapshotAt(spark, path, i)) == history(i),
        s"final sweep: gen $i diverged")
    }
    val meta = CorpusStore.listCorpusSnapshots(spark, path)
      .as[(Int, Long)].collect().toMap
    assert(meta == history.map { case (g, m) => g -> m.size.toLong }.toMap,
      s"meta counts drifted: $meta")
    // the health report agrees with the model at the end
    val h = CorpusStore.cowHealthReport(spark, path)
    assert(h.totalRows == model.size.toLong && h.current == gen &&
      h.base == base && h.orphanDirs == 0, h.toString)
  }

  test("cow delta fuzz: 30 seeded random delta-appends/upserts/deletes/compactions/rebuckets/vacuums match the model at every retained version") {
    // round 16: the same model, now with the delta legs in the
    // schedule — what a hand-written spec can't cover is CHAINS:
    // deltas over deltas over rewritten buckets, compactions landing
    // mid-chain, rebuckets under live delta pressure, vacuums
    // straddling mixed base+delta+rebucketed manifests
    val rnd = new scala.util.Random(16L)
    val path = tmp("graft-cs-dfuzz")
    var model: Map[Long, String] =
      (0L to 29L).map(i => i -> s"seed doc $i").toMap
    CorpusStore.writeCorpusCow(toDf(model), path, "doc_id",
      numBuckets = 8)
    val history = scala.collection.mutable.Map[Int, Map[Long, String]]()
    history(0) = model
    var gen = 0
    var base = 0

    (1 to 30).foreach { step =>
      rnd.nextInt(12) match {
        case r if r <= 3 =>
          // DELTA append 1-4 rows (the round-16 op under fuzz)
          val k = 1 + rnd.nextInt(4)
          val ids = Seq.fill(k)(rnd.nextInt(40).toLong).distinct
          val up = ids.map(i => i -> s"step $step delta for $i").toMap
          gen = CorpusStore.appendDeltaToCorpusCow(toDf(up), path)
          model = model ++ up
          history(gen) = model
        case r if r <= 6 =>
          val k = 1 + rnd.nextInt(4)
          val ids = Seq.fill(k)(rnd.nextInt(40).toLong).distinct
          val up = ids.map(i => i -> s"step $step text for $i").toMap
          gen = CorpusStore.upsertIntoCorpusCow(toDf(up), path)
          model = model ++ up
          history(gen) = model
        case r if r <= 8 =>
          val k = 1 + rnd.nextInt(3)
          val ids = Seq.fill(k)(1L + rnd.nextInt(45)).distinct
          gen = CorpusStore.deleteFromCorpusCow(ids.toDF("doc_id"), path)
          model = model -- ids
          history(gen) = model
        case 9 =>
          // compaction: a no-op returns CURRENT unchanged; otherwise
          // one new generation with the SAME content
          val g2 = CorpusStore.compactCorpusCow(spark, path)
          if (g2 != gen) { gen = g2; history(gen) = model }
        case 10 =>
          // rebucket to a random count: same content, new granularity
          gen = CorpusStore.rebucketCorpusCow(spark, path,
            Seq(4, 8, 16)(rnd.nextInt(3)))
          history(gen) = model
        case _ =>
          val keep = 1 + rnd.nextInt(3)
          CorpusStore.vacuumCorpusSnapshots(spark, path, keepLast = keep)
          base = math.max(base, gen - keep + 1)
          history.keys.filter(_ < base).toSeq.foreach(history.remove)
      }
      assert(CorpusStore.currentGen(spark, path) == ((gen, base)),
        s"step $step pointer drift")
      assert(readAsMap(CorpusStore.readCorpusSnapshot(spark, path)) ==
        model, s"step $step CURRENT read diverged from the model")
      val probe = base + rnd.nextInt(gen - base + 1)
      assert(readAsMap(
        CorpusStore.readCorpusSnapshotAt(spark, path, probe)) ==
        history(probe),
        s"step $step retained gen $probe diverged from its history")
    }

    (base to gen).foreach { i =>
      assert(readAsMap(
        CorpusStore.readCorpusSnapshotAt(spark, path, i)) == history(i),
        s"final sweep: gen $i diverged")
    }
    val meta = CorpusStore.listCorpusSnapshots(spark, path)
      .as[(Int, Long)].collect().toMap
    assert(meta == history.map { case (g, m) => g -> m.size.toLong }.toMap,
      s"meta counts drifted: $meta")
    val h = CorpusStore.cowHealthReport(spark, path)
    assert(h.totalRows == model.size.toLong && h.current == gen &&
      h.base == base && h.orphanDirs == 0, h.toString)
  }

  test("cow tombstone fuzz: 30 seeded random tombstones/deltas/upserts/rewrites/compactions/rebuckets/vacuums match the model at every retained version") {
    // round 16, second schedule extension: tombstones in the mix —
    // what only interleavings cover is kill/resurrect/rekill chains
    // braided with eager rewrites (which must fold markers away),
    // compactions landing on half-dead buckets, rebuckets carrying
    // tombstone history across bucketings, and no-op tombstones of
    // absent or already-dead ids between all of them
    val rnd = new scala.util.Random(1616L)
    val path = tmp("graft-cs-tfuzz")
    var model: Map[Long, String] =
      (0L to 29L).map(i => i -> s"seed doc $i").toMap
    CorpusStore.writeCorpusCow(toDf(model), path, "doc_id",
      numBuckets = 8)
    val history = scala.collection.mutable.Map[Int, Map[Long, String]]()
    history(0) = model
    var gen = 0
    var base = 0

    (1 to 30).foreach { step =>
      rnd.nextInt(14) match {
        case r if r <= 3 =>
          // TOMBSTONE 1-3 ids: mix of live, dead and never-present;
          // id 0 protected; a batch with no live member commits
          // nothing (the returned gen is unchanged)
          val ids = Seq.fill(1 + rnd.nextInt(3))(1L + rnd.nextInt(45))
            .distinct
          val g2 = CorpusStore.appendTombstonesToCorpusCow(
            ids.toDF("doc_id"), path)
          val live = ids.filter(model.contains)
          if (live.isEmpty) assert(g2 == gen,
            s"step $step: no-live tombstone committed a generation")
          else {
            assert(g2 == gen + 1)
            gen = g2
            model = model -- live
            history(gen) = model
          }
        case r if r <= 6 =>
          val ids = Seq.fill(1 + rnd.nextInt(4))(rnd.nextInt(40).toLong)
            .distinct
          val up = ids.map(i => i -> s"step $step delta for $i").toMap
          gen = CorpusStore.appendDeltaToCorpusCow(toDf(up), path)
          model = model ++ up
          history(gen) = model
        case r if r <= 8 =>
          val ids = Seq.fill(1 + rnd.nextInt(4))(rnd.nextInt(40).toLong)
            .distinct
          val up = ids.map(i => i -> s"step $step text for $i").toMap
          gen = CorpusStore.upsertIntoCorpusCow(toDf(up), path)
          model = model ++ up
          history(gen) = model
        case r if r <= 9 =>
          val ids = Seq.fill(1 + rnd.nextInt(3))(1L + rnd.nextInt(45))
            .distinct
          gen = CorpusStore.deleteFromCorpusCow(ids.toDF("doc_id"), path)
          model = model -- ids
          history(gen) = model
        case 10 =>
          val g2 = CorpusStore.compactCorpusCow(spark, path)
          if (g2 != gen) { gen = g2; history(gen) = model }
        case 11 =>
          gen = CorpusStore.rebucketCorpusCow(spark, path,
            Seq(4, 8, 16)(rnd.nextInt(3)))
          history(gen) = model
        case _ =>
          val keep = 1 + rnd.nextInt(3)
          CorpusStore.vacuumCorpusSnapshots(spark, path, keepLast = keep)
          base = math.max(base, gen - keep + 1)
          history.keys.filter(_ < base).toSeq.foreach(history.remove)
      }
      assert(CorpusStore.currentGen(spark, path) == ((gen, base)),
        s"step $step pointer drift")
      assert(readAsMap(CorpusStore.readCorpusSnapshot(spark, path)) ==
        model, s"step $step CURRENT read diverged from the model")
      val probe = base + rnd.nextInt(gen - base + 1)
      assert(readAsMap(
        CorpusStore.readCorpusSnapshotAt(spark, path, probe)) ==
        history(probe),
        s"step $step retained gen $probe diverged from its history")
    }

    (base to gen).foreach { i =>
      assert(readAsMap(
        CorpusStore.readCorpusSnapshotAt(spark, path, i)) == history(i),
        s"final sweep: gen $i diverged")
    }
    val meta = CorpusStore.listCorpusSnapshots(spark, path)
      .as[(Int, Long)].collect().toMap
    assert(meta == history.map { case (g, m) => g -> m.size.toLong }.toMap,
      s"meta counts drifted: $meta")
    val h = CorpusStore.cowHealthReport(spark, path)
    assert(h.totalRows == model.size.toLong && h.current == gen &&
      h.base == base && h.orphanDirs == 0, h.toString)
  }
}
