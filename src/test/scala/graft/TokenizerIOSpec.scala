package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.operators.TextAnalysis.{BpeMerge, UnigramPiece}
import graft.sources.TokenizerIO

/** Tokenizer artifact interop (round 14): a TRAINED table must
  * round-trip through its on-disk format and encode row-identically
  * to the in-memory table — the day the tokenizer ships to a
  * training stack, this is the operator the user hits. Malformed
  * files fail fast with their line number.
  */
class TokenizerIOSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String, suffix: String): String =
    java.nio.file.Files.createTempFile(prefix, suffix).toString

  private val docs = Seq(
    (1L, "the theory there then theme other together"),
    (2L, "low lower lowest slow slower following"),
    (3L, "the lower theme follows the slower theory"),
    (4L, "newest widest lowest estimate the best rate"))
    .toDF("doc_id", "text")

  test("bpe: train → save → load → encode row-identical; format is subword-nmt merges.txt") {
    val trained = TextAnalysis.bpeTrain(docs, "text", numMerges = 12)
    val path = tmp("graft-merges", ".txt")
    TokenizerIO.saveBpeMerges(trained, path)

    // format pin: header + one "<left> <right>" per line, rank order
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path))
    assert(lines.get(0) == "#version: 0.2", lines.get(0))
    assert(lines.size >= 2 &&
      lines.get(1).split(" ").length == 2, lines.get(1))

    val mem = trained.collect().map(r =>
      BpeMerge(r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_.rank).toIndexedSeq
    val loaded = TokenizerIO.loadBpeMerges(spark, path)
    // the format drops counts; everything the encoder reads survives
    assert(loaded.map(m => (m.rank, m.left, m.right)) ==
      mem.map(m => (m.rank, m.left, m.right)),
      s"merge table drifted:\n mem: $mem\n load: $loaded")
    assertSameRows(
      TextAnalysis.bpeEncode(docs, "doc_id", "text", mem),
      TextAnalysis.bpeEncode(docs, "doc_id", "text", loaded))
  }

  test("unigram: train → save → load → encode row-identical; logprobs exact to the bit") {
    val trained = TextAnalysis.unigramTrain(docs, "text",
      vocabSize = 40, emIters = 1, seedSize = 64, maxPieceLen = 4)
    val path = tmp("graft-vocab", ".tsv")
    TokenizerIO.saveUnigramVocab(trained, path)
    val mem = trained.collect().map(r =>
      UnigramPiece(r.getString(0), r.getDouble(1))).toIndexedSeq
    val loaded = TokenizerIO.loadUnigramVocab(spark, path)
    // EXACT double equality — Double.toString round-trips IEEE bits,
    // so a near-tie Viterbi decision cannot flip across the file
    assert(loaded == mem, s"piece table drifted:\n mem: $mem\n load: $loaded")
    assertSameRows(
      TextAnalysis.unigramEncode(docs, "doc_id", "text", mem),
      TextAnalysis.unigramEncode(docs, "doc_id", "text", loaded))
  }

  test("bpe load: malformed lines, duplicates and empty tables fail fast") {
    def write(content: String): String = {
      val p = tmp("graft-badmerges", ".txt")
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        content.getBytes("UTF-8"))
      p
    }
    // three fields on line 2 (1-based after the header filter)
    val bad = intercept[IllegalArgumentException] {
      TokenizerIO.loadBpeMerges(spark, write("#version: 0.2\na b c\n"))
    }
    assert(bad.getMessage.contains("line 2"), bad.getMessage)
    // duplicate pair
    val dup = intercept[IllegalArgumentException] {
      TokenizerIO.loadBpeMerges(spark, write("a b\na b\n"))
    }
    assert(dup.getMessage.contains("duplicate"), dup.getMessage)
    // header-only file = no merges
    val empty = intercept[IllegalArgumentException] {
      TokenizerIO.loadBpeMerges(spark, write("#version: 0.2\n"))
    }
    assert(empty.getMessage.contains("no merges"), empty.getMessage)
    // save-side: whitespace inside a symbol cannot ride the format
    val ws = intercept[IllegalArgumentException] {
      TokenizerIO.saveBpeMerges(spark,
        Seq(BpeMerge(1, "a b", "c", 0L)), tmp("graft-ws", ".txt"))
    }
    assert(ws.getMessage.contains("space-delimited"), ws.getMessage)
    // save-side: a rank gap would silently renumber on load
    val gap = intercept[IllegalArgumentException] {
      TokenizerIO.saveBpeMerges(spark,
        Seq(BpeMerge(1, "a", "b", 0L), BpeMerge(3, "ab", "c", 0L)),
        tmp("graft-gap", ".txt"))
    }
    assert(gap.getMessage.contains("contiguous"), gap.getMessage)
  }

  test("unigram load: malformed lines, bad doubles and duplicates fail fast") {
    def write(content: String): String = {
      val p = tmp("graft-badvocab", ".tsv")
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        content.getBytes("UTF-8"))
      p
    }
    val noTab = intercept[IllegalArgumentException] {
      TokenizerIO.loadUnigramVocab(spark, write("ab -1.5\n"))
    }
    assert(noTab.getMessage.contains("line 1"), noTab.getMessage)
    val badD = intercept[IllegalArgumentException] {
      TokenizerIO.loadUnigramVocab(spark, write("ab\tnot-a-number\n"))
    }
    assert(badD.getMessage.contains("unparsable"), badD.getMessage)
    val dup = intercept[IllegalArgumentException] {
      TokenizerIO.loadUnigramVocab(spark, write("ab\t-1.0\nab\t-2.0\n"))
    }
    assert(dup.getMessage.contains("duplicate"), dup.getMessage)
    val inf = intercept[IllegalArgumentException] {
      TokenizerIO.loadUnigramVocab(spark, write("ab\t-Infinity\n"))
    }
    assert(inf.getMessage.contains("non-finite"), inf.getMessage)
  }
}
