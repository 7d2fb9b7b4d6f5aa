package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.TextAnalysis.{BpeMerge, UnigramPiece}

/** Trained-tokenizer artifact interop (round 14 — verdict task 3): a
  * tokenizer that exists only as an in-JVM table cannot serve the
  * training run it was trained for. This module serializes
  * [[graft.operators.TextAnalysis.bpeTrain]] merge tables and
  * [[graft.operators.TextAnalysis.unigramTrain]] piece tables to the
  * text formats the surrounding tooling already speaks, and loads
  * them back for [[graft.operators.TextAnalysis.bpeEncode]] /
  * [[graft.operators.TextAnalysis.unigramEncode]]:
  *
  *  - BPE merges → `merges.txt` (subword-nmt / HuggingFace tokenizer
  *    format): an optional `#version:` header, then one
  *    `<left> <right>` pair per line, rank = line order.
  *  - Unigram pieces → SentencePiece `.vocab`-style TSV: one
  *    `<piece>\t<logprob>` per line. Logprobs are written with
  *    `Double.toString` — exact IEEE round-trip, so a loaded table
  *    encodes bit-identically (SentencePiece itself truncates to six
  *    decimals; exactness wins here and its files still parse).
  *
  * Both formats are driver-scale artifacts (a 32k-merge table is
  * ~300 KB), written/read through the Hadoop FileSystem API so paths
  * work wherever the cluster's storage lives, not just on local disk.
  * Malformed files FAIL FAST with the offending line number — a
  * silently mis-parsed vocabulary would corrupt every token count
  * downstream.
  */
object TokenizerIO {

  private val BpeHeader = "#version: 0.2"

  private def hadoopFs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeText(spark: SparkSession, path: String,
                        text: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val out = hadoopFs(spark, path).create(p, true)
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readLines(spark: SparkSession, path: String): Array[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopFs(spark, path)
    val len = fs.getFileStatus(p).getLen
    require(len <= (1L << 30),
      s"TokenizerIO: $path is ${len} bytes — not a tokenizer artifact")
    val buf = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    new String(buf, java.nio.charset.StandardCharsets.UTF_8)
      .split("\n", -1).map(_.stripSuffix("\r"))
  }

  /** Save a trained BPE merge table as merges.txt. Ranks must be the
    * contiguous 1..N sequence [[graft.operators.TextAnalysis.bpeTrain]]
    * emits (rank IS the line order in this format — a gap would
    * silently renumber on load). Symbols are validated against the
    * format: the space-delimited line cannot carry whitespace inside
    * a symbol. Counts (`n`) are stats, not behavior — the format
    * drops them, and [[loadBpeMerges]] restores 0 (bpeEncode reads
    * only rank/left/right).
    */
  def saveBpeMerges(spark: SparkSession, merges: Seq[BpeMerge],
                    path: String): Unit = {
    require(merges.nonEmpty, "saveBpeMerges: empty merge table")
    val sorted = merges.sortBy(_.rank)
    sorted.iterator.zipWithIndex.foreach { case (m, i) =>
      require(m.rank == i + 1,
        s"saveBpeMerges: ranks must be contiguous 1..N (found rank " +
          s"${m.rank} at position ${i + 1}) — line order IS the rank " +
          "in merges.txt")
      Seq("left" -> m.left, "right" -> m.right).foreach { case (side, s) =>
        require(s.nonEmpty && !s.exists(_.isWhitespace),
          s"saveBpeMerges: $side symbol '$s' (rank ${m.rank}) cannot " +
            "ride a space-delimited merges.txt line")
      }
    }
    writeText(spark, path,
      (BpeHeader +: sorted.map(m => s"${m.left} ${m.right}"))
        .mkString("", "\n", "\n"))
  }

  /** Load a merges.txt file back into [[BpeMerge]] rows (rank = line
    * order, 1-based; counts restored as 0). Tolerates the optional
    * `#version:` header and trailing blank lines; anything else that
    * is not exactly `<left> <right>` fails fast with its line number,
    * as do duplicate pairs (bpeEncode would reject them later with
    * less context).
    */
  def loadBpeMerges(spark: SparkSession, path: String): Seq[BpeMerge] = {
    val lines = readLines(spark, path)
    val body = lines.iterator.zipWithIndex
      .filterNot { case (l, i) =>
        (i == 0 && l.startsWith("#version:")) || l.isEmpty
      }
    val merges = body.zipWithIndex.map { case ((line, lineNo), rank0) =>
      val parts = line.split(" ", -1)
      require(parts.length == 2 && parts.forall(_.nonEmpty),
        s"loadBpeMerges: $path line ${lineNo + 1} is not " +
          s"'<left> <right>': '$line'")
      BpeMerge(rank0 + 1, parts(0), parts(1), 0L)
    }.toVector
    require(merges.nonEmpty, s"loadBpeMerges: no merges in $path")
    val dup = merges.groupBy(m => (m.left, m.right))
      .collectFirst { case (p, ms) if ms.size > 1 => p }
    require(dup.isEmpty,
      s"loadBpeMerges: duplicate merge pair $dup in $path")
    merges
  }

  /** Convenience: save [[graft.operators.TextAnalysis.bpeTrain]]'s
    * (rank, left, right, n) DataFrame directly (bounded collect —
    * merge tables are driver-scale artifacts by construction).
    */
  def saveBpeMerges(merges: DataFrame, path: String): Unit =
    saveBpeMerges(merges.sparkSession,
      merges.select("rank", "left", "right", "n").collect()
        .map(r => BpeMerge(r.getInt(0), r.getString(1), r.getString(2),
          r.getLong(3))).toIndexedSeq,
      path)

  /** Save a trained unigram piece table as a SentencePiece-style
    * `.vocab` TSV (`piece\tlogprob`), one line per piece in the given
    * order. Pieces are validated against the format (no tab/newline —
    * [[graft.operators.TextAnalysis.tokens]]-derived pieces never
    * carry whitespace, but a hand-built table could); logprobs must
    * be finite.
    */
  def saveUnigramVocab(spark: SparkSession, table: Seq[UnigramPiece],
                       path: String): Unit = {
    require(table.nonEmpty, "saveUnigramVocab: empty piece table")
    table.foreach { p =>
      require(p.piece.nonEmpty &&
          !p.piece.exists(c => c == '\t' || c == '\n' || c == '\r'),
        s"saveUnigramVocab: piece '${p.piece}' cannot ride a " +
          "tab-separated line")
      require(!p.logprob.isNaN && !p.logprob.isInfinite,
        s"saveUnigramVocab: non-finite logprob for piece '${p.piece}'")
    }
    require(table.map(_.piece).distinct.size == table.size,
      "saveUnigramVocab: duplicate pieces in table")
    writeText(spark, path,
      table.map(p => s"${p.piece}\t${p.logprob}")
        .mkString("", "\n", "\n"))
  }

  /** Load a `.vocab` TSV back into [[UnigramPiece]] rows (file order
    * preserved). Trailing blank lines are tolerated; a line without
    * exactly one tab, an unparsable or non-finite logprob, or a
    * duplicate piece fails fast with its line number.
    */
  def loadUnigramVocab(spark: SparkSession,
                       path: String): Seq[UnigramPiece] = {
    val pieces = readLines(spark, path).iterator.zipWithIndex
      .filterNot(_._1.isEmpty)
      .map { case (line, lineNo) =>
        val parts = line.split("\t", -1)
        require(parts.length == 2 && parts(0).nonEmpty,
          s"loadUnigramVocab: $path line ${lineNo + 1} is not " +
            s"'<piece>\\t<logprob>': '$line'")
        val lp = parts(1).toDoubleOption.getOrElse(
          throw new IllegalArgumentException(
            s"loadUnigramVocab: $path line ${lineNo + 1} has " +
              s"unparsable logprob '${parts(1)}'"))
        require(!lp.isNaN && !lp.isInfinite,
          s"loadUnigramVocab: $path line ${lineNo + 1} has " +
            s"non-finite logprob")
        UnigramPiece(parts(0), lp)
      }.toVector
    require(pieces.nonEmpty, s"loadUnigramVocab: no pieces in $path")
    val dup = pieces.groupBy(_.piece)
      .collectFirst { case (p, ps) if ps.size > 1 => p }
    require(dup.isEmpty,
      s"loadUnigramVocab: duplicate piece '${dup.get}' in $path")
    pieces
  }

  /** Convenience: save [[graft.operators.TextAnalysis.unigramTrain]]'s
    * (piece, logprob) DataFrame directly (bounded collect — piece
    * tables are driver-scale artifacts by construction).
    */
  def saveUnigramVocab(table: DataFrame, path: String): Unit =
    saveUnigramVocab(table.sparkSession,
      table.select("piece", "logprob").collect()
        .map(r => UnigramPiece(r.getString(0), r.getDouble(1)))
        .toIndexedSeq,
      path)
}
