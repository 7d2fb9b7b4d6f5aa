package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.CorpusStore

/** COW store schema evolution (round 17 — r16 missing item 1): a
  * living 100 TB corpus gains a column WITHOUT a full rewrite.
  * [[CorpusStore.evolveCorpusCowSchema]] commits a metadata-only
  * generation; the pinned contract —
  *
  *  - zero data trees written: every existing tree is shared into the
  *    evolve generation's manifest;
  *  - old generations keep reading in their ORIGINAL shape (time
  *    travel crosses the boundary), new generations read pre-evolve
  *    trees with the added columns filled by the recorded read-time
  *    default or null;
  *  - change frames must carry the evolved shape (the refusal names
  *    the missing columns); type changes stay refused;
  *  - rewrites that happen anyway (upsert / compaction / rebucket)
  *    materialize the evolved shape physically, and vacuum across the
  *    boundary keeps every retained version bit-identical;
  *  - a crashed evolve's leftover schema record is neutralized by the
  *    next commit of its slot;
  *  - the model fuzz gains an evolve op (the CorpusStoreFuzzSpec
  *    stance): random interleavings of the whole op set across the
  *    evolution boundary match a driver-side model at every retained
  *    version.
  */
class CowSchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val nBuckets = 8

  private def corpus = (1 to 40)
    .map(i => (i.toLong, s"document number $i body"))
    .toDF("doc_id", "text")

  private val addCols = StructType(Seq(
    StructField("lang", StringType),
    StructField("score", DoubleType)))

  private def rows3(df: org.apache.spark.sql.DataFrame)
      : Seq[(Long, String, Option[String], Option[Double])] =
    df.select("doc_id", "text", "lang", "score")
      .as[(Long, String, Option[String], Option[Double])]
      .collect().sortBy(_._1).toSeq

  test("evolve is metadata-only: no data trees, old shape below the boundary, defaults/nulls above it") {
    val path = tmp("graft-evo")
    CorpusStore.writeCorpusCow(corpus, path, "doc_id", nBuckets) // gen 0
    val gen = CorpusStore.evolveCorpusCowSchema(spark, path, addCols,
      defaults = Map("lang" -> "'und'"))
    assert(gen == 1)
    // zero data bytes: the evolve generation owns no tree directories
    assert(!new java.io.File(s"$path/parts/gen=1").exists)
    assert(!new java.io.File(s"$path/deltas/gen=1").exists)
    // below the boundary: the original two-column shape
    assert(CorpusStore.readCorpusSnapshotAt(spark, path, 0)
      .columns.toSeq == Seq("doc_id", "text"))
    // at the boundary: every pre-evolve row fills lang='und' (the
    // recorded default) and score=null
    val cur = CorpusStore.readCorpusSnapshot(spark, path)
    assert(cur.columns.toSeq == Seq("doc_id", "text", "lang", "score"))
    val got = rows3(cur)
    assert(got.size == 40)
    assert(got.forall { case (_, _, l, s) => l.contains("und") && s.isEmpty })
    // the streaming-source schema resolves to the evolved shape
    assert(CorpusStore.corpusSchema(spark, path).fieldNames.toSeq ==
      Seq("doc_id", "text", "lang", "score"))
    // meta row counts are untouched by a metadata-only generation
    assert(CorpusStore.listCorpusSnapshots(spark, path)
      .as[(Int, Long)].collect().toMap == Map(0 -> 40L, 1 -> 40L))
  }

  test("change frames must carry the evolved shape; old-shape batches are refused naming the columns; types still can't drift") {
    val path = tmp("graft-evoc")
    CorpusStore.writeCorpusCow(corpus, path, "doc_id", nBuckets)
    CorpusStore.evolveCorpusCowSchema(spark, path, addCols,
      defaults = Map("lang" -> "'und'"))
    val e = intercept[IllegalArgumentException] {
      CorpusStore.appendDeltaToCorpusCow(
        Seq((41L, "new doc")).toDF("doc_id", "text"), path)
    }
    assert(e.getMessage.contains("lang") && e.getMessage.contains("score"),
      e.getMessage)
    // the evolved shape commits as a delta; LWW-merged reads mix
    // explicit values with defaulted pre-evolve rows
    CorpusStore.appendDeltaToCorpusCow(
      Seq((41L, "new doc", "en", 0.9), (5L, "five v2", "fr", 0.5))
        .toDF("doc_id", "text", "lang", "score"), path)
    val got = rows3(CorpusStore.readCorpusSnapshot(spark, path)).toMap2
    assert(got(41L) == (("new doc", Some("en"), Some(0.9))))
    assert(got(5L) == (("five v2", Some("fr"), Some(0.5))))
    assert(got(6L) == ((s"document number 6 body", Some("und"), None)))
    // type drift on an added column is refused like any other
    val e2 = intercept[IllegalArgumentException] {
      CorpusStore.appendDeltaToCorpusCow(
        Seq((42L, "x", "en", 1)).toDF("doc_id", "text", "lang", "score"),
        path)
    }
    assert(e2.getMessage.contains("drift"), e2.getMessage)
  }

  private implicit class Rows3Ops(
      rs: Seq[(Long, String, Option[String], Option[Double])]) {
    def toMap2: Map[Long, (String, Option[String], Option[Double])] =
      rs.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("rewrites materialize the evolved shape: upsert, compaction, rebucket; time travel and vacuum cross the boundary") {
    val path = tmp("graft-evor")
    CorpusStore.writeCorpusCow(corpus, path, "doc_id", nBuckets) // gen 0
    CorpusStore.evolveCorpusCowSchema(spark, path, addCols,
      defaults = Map("lang" -> "'und'"))                         // gen 1
    CorpusStore.appendDeltaToCorpusCow(
      Seq((41L, "new doc", "en", 0.9))
        .toDF("doc_id", "text", "lang", "score"), path)          // gen 2
    val want = rows3(CorpusStore.readCorpusSnapshot(spark, path))
    // compaction folds the delta into an evolved-shape base tree
    val g3 = CorpusStore.compactCorpusCow(spark, path)           // gen 3
    assert(g3 == 3)
    assert(rows3(CorpusStore.readCorpusSnapshot(spark, path)) == want)
    // the folded tree physically carries the new columns
    val folded = spark.read.parquet(s"$path/parts/gen=3")
    assert(folded.columns.contains("lang") &&
      folded.columns.contains("score"))
    // upsert in the evolved shape rewrites its bucket evolved
    CorpusStore.upsertIntoCorpusCow(
      Seq((7L, "seven v2", "de", 0.2))
        .toDF("doc_id", "text", "lang", "score"), path)          // gen 4
    // rebucket carries the evolved view across the bucket boundary
    val g5 = CorpusStore.rebucketCorpusCow(spark, path, 16)      // gen 5
    val got5 = rows3(CorpusStore.readCorpusSnapshot(spark, path)).toMap2
    assert(got5(7L) == (("seven v2", Some("de"), Some(0.2))))
    assert(got5(41L) == (("new doc", Some("en"), Some(0.9))))
    assert(got5(6L)._2.contains("und"))
    // time travel: gen 0 still reads the ORIGINAL two-column shape
    assert(CorpusStore.readCorpusSnapshotAt(spark, path, 0)
      .columns.toSeq == Seq("doc_id", "text"))
    // and a mid-history evolved generation reads evolved
    assert(CorpusStore.readCorpusSnapshotAt(spark, path, 2)
      .columns.toSeq == Seq("doc_id", "text", "lang", "score"))
    // vacuum across the boundary: retained versions stay identical
    CorpusStore.vacuumCorpusSnapshots(spark, path, keepLast = 2)
    assert(CorpusStore.currentGen(spark, path) == ((g5, 4)))
    assert(rows3(CorpusStore.readCorpusSnapshotAt(spark, path, 4)).toMap2
      .apply(6L)._2.contains("und"))
    assert(rows3(CorpusStore.readCorpusSnapshot(spark, path)).toMap2 ==
      got5)
  }

  test("evolve fail-fasts: existing column, empty set, unknown default, malformed default expression") {
    val path = tmp("graft-evof")
    CorpusStore.writeCorpusCow(corpus, path, "doc_id", nBuckets)
    val e1 = intercept[IllegalArgumentException] {
      CorpusStore.evolveCorpusCowSchema(spark, path,
        StructType(Seq(StructField("text", StringType))))
    }
    assert(e1.getMessage.contains("already exist"), e1.getMessage)
    intercept[IllegalArgumentException] {
      CorpusStore.evolveCorpusCowSchema(spark, path, StructType(Nil))
    }
    val e2 = intercept[IllegalArgumentException] {
      CorpusStore.evolveCorpusCowSchema(spark, path,
        StructType(Seq(StructField("lang", StringType))),
        defaults = Map("nope" -> "'x'"))
    }
    assert(e2.getMessage.contains("unknown column"), e2.getMessage)
    // a default that references a column (not a constant) fails the
    // EVOLVE, not every later read
    intercept[Exception] {
      CorpusStore.evolveCorpusCowSchema(spark, path,
        StructType(Seq(StructField("lang", StringType))),
        defaults = Map("lang" -> "text || '!'"))
    }
    // nothing committed by any refusal
    assert(CorpusStore.currentGen(spark, path) == ((0, 0)))
    assert(CorpusStore.readCorpusSnapshot(spark, path)
      .columns.toSeq == Seq("doc_id", "text"))
  }

  test("a crashed evolve's leftover schema record is neutralized when another writer commits the slot") {
    val path = tmp("graft-evox")
    CorpusStore.writeCorpusCow(corpus, path, "doc_id", nBuckets) // gen 0
    CorpusStore.evolveCorpusCowSchema(spark, path, addCols,
      defaults = Map("lang" -> "'und'"))                         // gen 1
    // simulate a SECOND evolve that crashed after writing its record
    // but before the CURRENT swap: schemas/gen=2 exists, uncommitted
    val crashed = new java.io.File(s"$path/schemas/gen=2")
    crashed.mkdirs()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$path/schemas/gen=1/SCHEMA.json"),
      java.nio.file.Paths.get(s"$path/schemas/gen=2/SCHEMA.json"))
    // a normal delta now commits gen 2 — it must DELETE the orphan
    // record rather than let resolution trust a never-committed shape
    CorpusStore.appendDeltaToCorpusCow(
      Seq((41L, "new doc", "en", 0.9))
        .toDF("doc_id", "text", "lang", "score"), path)          // gen 2
    assert(!crashed.exists,
      "the crashed evolve's schema record must not survive the slot's commit")
    assert(rows3(CorpusStore.readCorpusSnapshot(spark, path)).toMap2
      .apply(41L) == (("new doc", Some("en"), Some(0.9))))
  }

  test("drop is metadata-only: gone above the boundary, kept below it, refused for re-add and for the id column") {
    // round 19 — r18 verdict task 6 / missing 4: constant-DEFAULT
    // drops as metadata generations
    val path = tmp("graft-evo-drop")
    CorpusStore.writeCorpusCow(corpus, path, "doc_id", nBuckets) // gen 0
    CorpusStore.evolveCorpusCowSchema(spark, path, addCols,
      defaults = Map("lang" -> "'und'"))                         // gen 1
    CorpusStore.upsertIntoCorpusCow(
      Seq((100L, "late doc", "en", 0.5)).toDF(
        "doc_id", "text", "lang", "score"), path)                // gen 2
    val g = CorpusStore.dropCorpusCowColumns(spark, path, Seq("score"))
    assert(g == 3)
    // metadata-only: the drop generation owns no data trees
    assert(!new java.io.File(s"$path/parts/gen=3").exists)
    // current reads project the column away, on every tree vintage
    val now = CorpusStore.readCorpusSnapshot(spark, path)
    assert(now.columns.toSeq == Seq("doc_id", "text", "lang"),
      now.columns.mkString(", "))
    assert(now.count() == 41)
    assert(now.where(col("doc_id") === 100L).select("lang")
      .as[String].head() == "en")
    // time travel below the drop keeps the full shape
    val at2 = CorpusStore.readCorpusSnapshotAt(spark, path, 2)
    assert(at2.columns.contains("score"), at2.columns.mkString(", "))
    assert(at2.where(col("doc_id") === 100L).select("score")
      .as[Double].head() == 0.5)
    // change frames must arrive WITHOUT the dropped column
    val refused = intercept[IllegalArgumentException] {
      CorpusStore.upsertIntoCorpusCow(
        Seq((101L, "x", "en", 1.0)).toDF(
          "doc_id", "text", "lang", "score"), path)
    }
    assert(refused.getMessage.contains("score"), refused.getMessage)
    // and the NAME retires: re-adding would resurrect old trees'
    // values at read time
    val readd = intercept[IllegalArgumentException] {
      CorpusStore.evolveCorpusCowSchema(spark, path,
        StructType(Seq(StructField("score", DoubleType))))
    }
    assert(readd.getMessage.contains("retired") ||
      readd.getMessage.contains("dropped"), readd.getMessage)
    // the id/bucketing column can never drop
    val idDrop = intercept[IllegalArgumentException] {
      CorpusStore.dropCorpusCowColumns(spark, path, Seq("doc_id"))
    }
    assert(idDrop.getMessage.contains("doc_id"), idDrop.getMessage)
    // a post-drop ingest in the narrowed shape lands cleanly
    CorpusStore.upsertIntoCorpusCow(
      Seq((102L, "post drop", "fr")).toDF("doc_id", "text", "lang"), path)
    assert(CorpusStore.readCorpusSnapshot(spark, path).count() == 42)
  }

  test("rename resolves through the provenance chain: chained renames keep reading every tree vintage; old names retire") {
    val path = tmp("graft-evo-ren")
    CorpusStore.writeCorpusCow(corpus, path, "doc_id", nBuckets) // gen 0
    CorpusStore.renameCorpusCowColumn(spark, path, "text", "body") // gen 1
    val r1 = CorpusStore.readCorpusSnapshot(spark, path)
    assert(r1.columns.toSeq == Seq("doc_id", "body"),
      r1.columns.mkString(", "))
    assert(r1.where(col("doc_id") === 1L).select("body")
      .as[String].head() == "document number 1 body")
    // a row written under the NEW name (gen 2), then a second rename
    CorpusStore.upsertIntoCorpusCow(
      Seq((200L, "mid-epoch doc")).toDF("doc_id", "body"), path)  // gen 2
    CorpusStore.renameCorpusCowColumn(spark, path, "body", "content") // gen 3
    val r2 = CorpusStore.readCorpusSnapshot(spark, path)
    assert(r2.columns.toSeq == Seq("doc_id", "content"))
    // founding trees resolve text→body→content; the gen-2 tree body→content
    assert(r2.where(col("doc_id") === 1L).select("content")
      .as[String].head() == "document number 1 body")
    assert(r2.where(col("doc_id") === 200L).select("content")
      .as[String].head() == "mid-epoch doc")
    // time travel keeps each epoch's own names
    assert(CorpusStore.readCorpusSnapshotAt(spark, path, 0)
      .columns.toSeq == Seq("doc_id", "text"))
    assert(CorpusStore.readCorpusSnapshotAt(spark, path, 2)
      .columns.toSeq == Seq("doc_id", "body"))
    // renaming BACK to an ancestor of the same column is SAFE — the
    // provenance chain already owns the name, so old trees resolve
    // to the same values — but a name retired by a DIFFERENT column
    // stays refused, and so does the id column
    CorpusStore.evolveCorpusCowSchema(spark, path,
      StructType(Seq(StructField("tag", StringType))))            // gen 4
    CorpusStore.dropCorpusCowColumns(spark, path, Seq("tag"))     // gen 5
    val toRetired = intercept[IllegalArgumentException] {
      CorpusStore.renameCorpusCowColumn(spark, path, "content", "tag")
    }
    assert(toRetired.getMessage.contains("retired") ||
      toRetired.getMessage.contains("renamed"), toRetired.getMessage)
    intercept[IllegalArgumentException] {
      CorpusStore.renameCorpusCowColumn(spark, path, "doc_id", "id")
    }
    // compaction materializes the current names physically and reads
    // stay identical
    val before = r2.orderBy("doc_id").collect().map(_.toString).toSeq
    CorpusStore.compactCorpusCow(spark, path)
    val after = CorpusStore.readCorpusSnapshot(spark, path)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(after == before)
  }

  test("a capped stream crosses a DROP boundary: old-epoch batches (with the extra column) conform down to the stream's shape") {
    // round 19: with drops, an older-epoch batch has MORE columns
    // than the stream's fixed schema — the prefix test could not
    // encode direction, the epoch comparison does
    val store = tmp("graft-evo-dropstream")
    val ckpt = tmp("graft-evo-dropstream-ckpt")
    CorpusStore.writeCorpusCow(
      (0L to 9L).map(i => (i, s"doc $i", i.toDouble))
        .toDF("doc_id", "text", "score"),
      store, "doc_id", nBuckets)                                 // gen 0
    CorpusStore.appendDeltaToCorpusCow(
      Seq((20L, "doc 20", 20.0)).toDF("doc_id", "text", "score"),
      store)                                                     // gen 1
    CorpusStore.dropCorpusCowColumns(spark, store, Seq("score"))  // gen 2
    CorpusStore.appendDeltaToCorpusCow(
      Seq((21L, "doc 21")).toDF("doc_id", "text"), store)        // gen 3
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft-corpus")
      .option("path", store)
      .option("maxGenerationsPerTrigger", "1")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        // every batch arrives in the stream's fixed (post-drop) shape
        assert(df.columns.toSeq == Seq("doc_id", "text"),
          df.columns.mkString(", "))
        val rows = df.select("doc_id").as[Long].collect()
        got.synchronized { got ++= rows }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val ids = got.synchronized(got.toSet)
    assert(((0L to 9L).toSet ++ Set(20L, 21L)).subsetOf(ids),
      ids.toSeq.sorted.toString)
  }

  test("evolution fuzz: 24 seeded random ops across the evolve boundary match the model at every retained version") {
    val rnd = new scala.util.Random(17L)
    val path = tmp("graft-evofuzz")
    // model value: (text, lang) — lang is "und" (the recorded
    // default) for every row whose latest write predates the evolve
    var model: Map[Long, (String, String)] =
      (0L to 29L).map(i => i -> ((s"seed doc $i", "und"))).toMap
    CorpusStore.writeCorpusCow(
      model.toSeq.map { case (i, (t, _)) => (i, t) }.toDF("doc_id", "text"),
      path, "doc_id", nBuckets)
    val history =
      scala.collection.mutable.Map[Int, Map[Long, (String, String)]]()
    history(0) = model
    var gen = 0
    var base = 0
    var evolveGen = -1 // not yet evolved

    def upFrame(up: Map[Long, (String, String)]) =
      if (evolveGen < 0)
        up.toSeq.map { case (i, (t, _)) => (i, t) }.toDF("doc_id", "text")
      else up.toSeq.map { case (i, (t, l)) => (i, t, l) }
        .toDF("doc_id", "text", "lang")

    def readAsModel(df: org.apache.spark.sql.DataFrame, g: Int)
        : Map[Long, (String, String)] =
      if (evolveGen < 0 || g < evolveGen)
        df.select("doc_id", "text").as[(Long, String)].collect()
          .map { case (i, t) => i -> ((t, "und")) }.toMap
      else df.select("doc_id", "text", "lang")
        .as[(Long, String, Option[String])].collect()
        .map { case (i, t, l) => i -> ((t, l.getOrElse("null"))) }.toMap

    (1 to 24).foreach { step =>
      rnd.nextInt(14) match {
        case r if r <= 2 && evolveGen < 0 =>
          // THE op under fuzz: evolve once, at a random early point
          gen = CorpusStore.evolveCorpusCowSchema(spark, path,
            StructType(Seq(StructField("lang", StringType))),
            defaults = Map("lang" -> "'und'"))
          evolveGen = gen
          history(gen) = model
        case r if r <= 5 =>
          val ids = Seq.fill(1 + rnd.nextInt(4))(rnd.nextInt(40).toLong)
            .distinct
          val up = ids.map(i =>
            i -> ((s"step $step delta for $i",
              if (evolveGen < 0) "und" else s"l$step"))).toMap
          gen = CorpusStore.appendDeltaToCorpusCow(upFrame(up), path)
          model = model ++ up
          history(gen) = model
        case r if r <= 8 =>
          val ids = Seq.fill(1 + rnd.nextInt(4))(rnd.nextInt(40).toLong)
            .distinct
          val up = ids.map(i =>
            i -> ((s"step $step text for $i",
              if (evolveGen < 0) "und" else s"l$step"))).toMap
          gen = CorpusStore.upsertIntoCorpusCow(upFrame(up), path)
          model = model ++ up
          history(gen) = model
        case r if r <= 9 =>
          val ids = Seq.fill(1 + rnd.nextInt(3))(1L + rnd.nextInt(45))
            .distinct
          val g2 = CorpusStore.appendTombstonesToCorpusCow(
            ids.toDF("doc_id"), path)
          val live = ids.filter(model.contains)
          if (live.isEmpty) assert(g2 == gen)
          else { gen = g2; model = model -- live; history(gen) = model }
        case r if r <= 10 =>
          val ids = Seq.fill(1 + rnd.nextInt(3))(1L + rnd.nextInt(45))
            .distinct
          gen = CorpusStore.deleteFromCorpusCow(ids.toDF("doc_id"), path)
          model = model -- ids
          history(gen) = model
        case 11 =>
          val g2 = CorpusStore.compactCorpusCow(spark, path)
          if (g2 != gen) { gen = g2; history(gen) = model }
        case 12 =>
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
      assert(readAsModel(
        CorpusStore.readCorpusSnapshot(spark, path), gen) == model,
        s"step $step CURRENT read diverged from the model")
      val probe = base + rnd.nextInt(gen - base + 1)
      assert(readAsModel(
        CorpusStore.readCorpusSnapshotAt(spark, path, probe), probe) ==
        history(probe),
        s"step $step retained gen $probe diverged from its history")
    }
    assert(evolveGen >= 0, "the schedule never evolved — reseed")
    (base to gen).foreach { i =>
      assert(readAsModel(
        CorpusStore.readCorpusSnapshotAt(spark, path, i), i) == history(i),
        s"final sweep: gen $i diverged")
    }
    val h = CorpusStore.cowHealthReport(spark, path)
    assert(h.totalRows == model.size.toLong && h.orphanDirs == 0,
      h.toString)
  }
}
