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

  test("blank-line policy: trailing blanks tolerated, a mid-file blank fails with its line number") {
    def write(suffix: String, content: String): String = {
      val p = tmp("graft-blank", suffix)
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        content.getBytes("UTF-8"))
      p
    }
    // trailing blanks (including several) still load
    assert(TokenizerIO.loadBpeMerges(spark,
      write(".txt", "#version: 0.2\na b\n\n\n")).size == 1)
    assert(TokenizerIO.loadUnigramVocab(spark,
      write(".tsv", "ab\t-1.5\n\n")).size == 1)
    // a blank line FOLLOWED by content would silently renumber every
    // later rank — the ADVICE finding this pins; the line number names
    // the blank, not the content after it
    val bpe = intercept[IllegalArgumentException] {
      TokenizerIO.loadBpeMerges(spark,
        write(".txt", "#version: 0.2\na b\n\nab c\n"))
    }
    assert(bpe.getMessage.contains("line 3") &&
      bpe.getMessage.contains("blank"), bpe.getMessage)
    val uni = intercept[IllegalArgumentException] {
      TokenizerIO.loadUnigramVocab(spark,
        write(".tsv", "ab\t-1.5\n\ncd\t-2.0\n"))
    }
    assert(uni.getMessage.contains("line 2") &&
      uni.getMessage.contains("blank"), uni.getMessage)
  }

  test("tokenizer.json: train → save → load → merges identical, vocab merge-induced, encode row-identical") {
    val trained = TextAnalysis.bpeTrain(docs, "text", numMerges = 12)
    val path = tmp("graft-tok", ".json")
    TokenizerIO.saveBpeTokenizerJson(trained, path)

    // format pin: deterministic field order, BPE model block
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    assert(text.startsWith(
      """{"version":"1.0","truncation":null,"padding":null,""" +
        """"added_tokens":[],"normalizer":null,"pre_tokenizer":null,""" +
        """"post_processor":null,"decoder":null,"model":{"type":"BPE","vocab":{"""),
      text.take(200))

    val mem = trained.collect().map(r =>
      BpeMerge(r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_.rank).toIndexedSeq
    val (loaded, vocab) = TokenizerIO.loadBpeTokenizerJson(spark, path)
    assert(loaded.map(m => (m.rank, m.left, m.right)) ==
      mem.map(m => (m.rank, m.left, m.right)),
      s"merge table drifted:\n mem: $mem\n load: $loaded")
    // vocab: contiguous ids 0..N-1, alphabet first, then merge
    // products in rank order
    assert(vocab.values.toSeq.sorted == (0 until vocab.size),
      s"ids not contiguous: $vocab")
    val alphaN = vocab.size - mem.size
    mem.iterator.zipWithIndex.foreach { case (m, i) =>
      assert(vocab(m.left + m.right) == alphaN + i,
        s"product '${m.left + m.right}' id ${vocab(m.left + m.right)} " +
          s"!= ${alphaN + i}")
    }
    assertSameRows(
      TextAnalysis.bpeEncode(docs, "doc_id", "text", mem),
      TextAnalysis.bpeEncode(docs, "doc_id", "text", loaded))
  }

  test("tokenizer.json: corpus alphabet beyond the merge symbols gets vocab ids and round-trips") {
    // round-15 review finding: characters that never participate in a
    // merge (digits, rare punctuation) still need ids — bpeEncode
    // emits them as standalone pieces
    val merges = Seq(BpeMerge(1, "a", "b", 0L), BpeMerge(2, "ab", "c", 0L))
    val path = tmp("graft-tokalpha", ".json")
    TokenizerIO.saveBpeTokenizerJson(spark, merges, path,
      alphabet = Seq('7', 'z', 'a' /* overlap is deduped */))
    val (loaded, vocab) = TokenizerIO.loadBpeTokenizerJson(spark, path)
    assert(loaded.map(m => (m.left, m.right)) ==
      merges.map(m => (m.left, m.right)))
    // alphabet sorted by codepoint first ('7' < 'a' < 'b' < 'c' < 'z'),
    // then merge products in rank order
    assert(vocab == Map("7" -> 0, "a" -> 1, "b" -> 2, "c" -> 3,
      "z" -> 4, "ab" -> 5, "abc" -> 6), vocab.toString)
    // whitespace cannot be a token of the format
    val ws = intercept[IllegalArgumentException] {
      TokenizerIO.saveBpeTokenizerJson(spark, merges,
        tmp("graft-tokws", ".json"), alphabet = Seq(' '))
    }
    assert(ws.getMessage.contains("whitespace"), ws.getMessage)
  }

  test("tokenizer.json save/load fail fast on non-BPE tables and drifted files") {
    // a merge whose side was never introduced is not a BPE order
    val foreign = intercept[IllegalArgumentException] {
      TokenizerIO.saveBpeTokenizerJson(spark,
        Seq(BpeMerge(1, "ab", "c", 0L)), tmp("graft-tokf", ".json"))
    }
    assert(foreign.getMessage.contains("not in the vocabulary"),
      foreign.getMessage)
    // two merges producing one string would lose a vocab id
    val collide = intercept[IllegalArgumentException] {
      TokenizerIO.saveBpeTokenizerJson(spark, Seq(
        BpeMerge(1, "a", "b", 0L), BpeMerge(2, "b", "c", 0L),
        BpeMerge(3, "ab", "c", 0L), BpeMerge(4, "a", "bc", 0L)),
        tmp("graft-tokc", ".json"))
    }
    assert(collide.getMessage.contains("collides"), collide.getMessage)
    // load-side: a vocab that disagrees with the merges fails fast
    def write(content: String): String = {
      val p = tmp("graft-tokbad", ".json")
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        content.getBytes("UTF-8"))
      p
    }
    val drift = intercept[IllegalArgumentException] {
      TokenizerIO.loadBpeTokenizerJson(spark, write(
        """{"model":{"type":"BPE","vocab":{"a":0,"b":1,"ab":5},""" +
          """"merges":["a b"]}}"""))
    }
    assert(drift.getMessage.contains("disagrees"), drift.getMessage)
    val notBpe = intercept[IllegalArgumentException] {
      TokenizerIO.loadBpeTokenizerJson(spark, write(
        """{"model":{"type":"Unigram","vocab":{},"merges":[]}}"""))
    }
    assert(notBpe.getMessage.contains("not BPE"), notBpe.getMessage)
  }

  test("unigram tokenizer.json: train → save → load → pieces bit-identical, encode row-identical, unk_id round-trips") {
    // round 16 — verdict task 5: the HF surface the BPE exporter
    // opened, completed for the unigram model
    val trained = TextAnalysis.unigramTrain(docs, "text",
      vocabSize = 40, emIters = 1, seedSize = 64, maxPieceLen = 4)
    val path = tmp("graft-unitok", ".json")
    TokenizerIO.saveUnigramTokenizerJson(trained, path)

    // format pin: deterministic field order, Unigram model block with
    // [piece, logprob] pairs in id order
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    assert(text.startsWith(
      """{"version":"1.0","truncation":null,"padding":null,""" +
        """"added_tokens":[],"normalizer":null,"pre_tokenizer":null,""" +
        """"post_processor":null,"decoder":null,""" +
        """"model":{"type":"Unigram","unk_id":null,"vocab":[["""),
      text.take(250))

    val mem = trained.collect().map(r =>
      UnigramPiece(r.getString(0), r.getDouble(1))).toIndexedSeq
    val (loaded, unk) = TokenizerIO.loadUnigramTokenizerJson(spark, path)
    assert(unk.isEmpty)
    // EXACT double equality — Double.toString round-trips IEEE bits
    // through JSON, so a near-tie Viterbi decision cannot flip
    assert(loaded == mem, s"piece table drifted:\n mem: $mem\n load: $loaded")
    assertSameRows(
      TextAnalysis.unigramEncode(docs, "doc_id", "text", mem),
      TextAnalysis.unigramEncode(docs, "doc_id", "text", loaded))
    // unk_id rides the round trip when set
    val path2 = tmp("graft-unitok2", ".json")
    TokenizerIO.saveUnigramTokenizerJson(spark, mem, path2,
      unkId = Some(0))
    val (loaded2, unk2) = TokenizerIO.loadUnigramTokenizerJson(spark, path2)
    assert(loaded2 == mem && unk2.contains(0))
  }

  test("unigram tokenizer.json save/load fail fast on malformed and drifted files") {
    def write(content: String): String = {
      val p = tmp("graft-unibad", ".json")
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        content.getBytes("UTF-8"))
      p
    }
    // save-side: duplicates, non-finite logprobs, out-of-range unk_id
    val dupS = intercept[IllegalArgumentException] {
      TokenizerIO.saveUnigramTokenizerJson(spark,
        Seq(UnigramPiece("ab", -1.0), UnigramPiece("ab", -2.0)),
        tmp("graft-unidup", ".json"))
    }
    assert(dupS.getMessage.contains("duplicate"), dupS.getMessage)
    val infS = intercept[IllegalArgumentException] {
      TokenizerIO.saveUnigramTokenizerJson(spark,
        Seq(UnigramPiece("ab", Double.NegativeInfinity)),
        tmp("graft-uniinf", ".json"))
    }
    assert(infS.getMessage.contains("non-finite"), infS.getMessage)
    val unkS = intercept[IllegalArgumentException] {
      TokenizerIO.saveUnigramTokenizerJson(spark,
        Seq(UnigramPiece("ab", -1.0)), tmp("graft-uniunk", ".json"),
        unkId = Some(5))
    }
    assert(unkS.getMessage.contains("unk_id"), unkS.getMessage)
    // load-side: a BPE file is not a unigram model
    val notUni = intercept[IllegalArgumentException] {
      TokenizerIO.loadUnigramTokenizerJson(spark, write(
        """{"model":{"type":"BPE","vocab":{},"merges":[]}}"""))
    }
    assert(notUni.getMessage.contains("not Unigram"), notUni.getMessage)
    // a vocab entry that is not a [piece, logprob] pair, named by index
    val badEntry = intercept[IllegalArgumentException] {
      TokenizerIO.loadUnigramTokenizerJson(spark, write(
        """{"model":{"type":"Unigram","unk_id":null,""" +
          """"vocab":[["ab",-1.0],["cd"]]}}"""))
    }
    assert(badEntry.getMessage.contains("vocab[1]"), badEntry.getMessage)
    // duplicates, non-finite logprobs and bad unk_id on load
    val dupL = intercept[IllegalArgumentException] {
      TokenizerIO.loadUnigramTokenizerJson(spark, write(
        """{"model":{"type":"Unigram","unk_id":null,""" +
          """"vocab":[["ab",-1.0],["ab",-2.0]]}}"""))
    }
    assert(dupL.getMessage.contains("duplicate"), dupL.getMessage)
    val unkL = intercept[IllegalArgumentException] {
      TokenizerIO.loadUnigramTokenizerJson(spark, write(
        """{"model":{"type":"Unigram","unk_id":7,""" +
          """"vocab":[["ab",-1.0]]}}"""))
    }
    assert(unkL.getMessage.contains("unk_id"), unkL.getMessage)
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
