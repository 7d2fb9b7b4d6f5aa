package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text→hash-set kernels. The composed-builtin pipelines
  * (split → transform(slice/concat_ws) → transform(xxhash64) →
  * array_distinct) allocate a shingle *string* per window and run
  * interpreted lambdas per element; these kernels hash words/chars in
  * place and emit the distinct 64-bit shingle hashes directly —
  * the text never materializes intermediate arrays. Per-row cost is
  * O(len), allocation is one long[] — the shape that survives a
  * 100 TB scan.
  */
object TextKernels {

  // shared by SketchOps.MinHashBandBuckets (bucket hashing must stay
  // in the same hash family as the shingle kernels)
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  /** Exactly the Java regex `\s` class — NOT Character.isWhitespace,
    * which also matches U+2028/U+2029/U+001C–1F and would tokenize
    * differently from the documented `Dedup.shingles` (`split("\\s+")`)
    * contract on such separators.
    */
  private def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  /** FNV-1a over a char range, folding CODEPOINTS: the d03 oracle
    * replays this hash in DuckDB by folding `unicode(ch)` per
    * character, and charNgramHashes already windows codepoints —
    * folding UTF-16 units here would diverge on every non-BMP word.
    * (BMP text: codepoint == unit, identical hashes.)
    */
  private def fnvRange(cs: String, from: Int, until: Int): Long = {
    var h = FnvOffset
    var i = from
    while (i < until) {
      val cp = cs.codePointAt(i)
      h = (h ^ cp) * FnvPrime
      i += Character.charCount(cp)
    }
    h
  }

  // sort-and-dedup on the primitive buffer: no boxing, two arrays
  // total. Output order is SORTED distinct (every consumer —
  // Jaccard set ops, min-hash, sign votes — is order-independent).
  private def distinctSorted(buf: Array[Long], n: Int): ArrayData = {
    java.util.Arrays.sort(buf, 0, n)
    val out = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (m == 0 || buf(i) != out(m - 1)) { out(m) = buf(i); m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  private def grow(a: Array[Long], n: Int): Array[Long] =
    if (n < a.length) a else java.util.Arrays.copyOf(a, a.length * 2)

  /** Distinct hashes of word k-shingles. Same contract as
    * `Dedup.shingleHashes`: whitespace tokenization after trim; fewer
    * than k words hash as one all-words shingle; empty text yields the
    * hash of the empty shingle.
    */
  def tokenShingleHashes(s: UTF8String, k: Int): ArrayData = {
    val str = s.toString
    // word hashes + word boundaries in one scan
    var wordHashes = new Array[Long](16)
    var nw = 0
    var i = 0
    val len = str.length
    while (i < len) {
      while (i < len && isSpace(str.charAt(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isSpace(str.charAt(i))) i += 1
        wordHashes = grow(wordHashes, nw)
        wordHashes(nw) = fnvRange(str, start, i)
        nw += 1
      }
    }
    if (nw == 0) {
      new GenericArrayData(Array(FnvOffset)) // hash of the empty shingle
    } else if (nw < k) {
      var h = FnvOffset
      var j = 0
      while (j < nw) { h = (h ^ wordHashes(j)) * FnvPrime; j += 1 }
      new GenericArrayData(Array(h))
    } else {
      val shingles = new Array[Long](nw - k + 1)
      var w = 0
      while (w + k <= nw) {
        var h = FnvOffset
        var j = 0
        while (j < k) { h = (h ^ wordHashes(w + j)) * FnvPrime; j += 1 }
        shingles(w) = h
        w += 1
      }
      distinctSorted(shingles, shingles.length)
    }
  }

  /** POSITIONAL window hashes: element i = the FNV-1a chain over the
    * word hashes of words [i, i+k) — the same chain
    * tokenShingleHashes folds, but keeping ORDER and DUPLICATES so
    * `posexplode` recovers each window's token offset (what a
    * duplicated-SPAN pass needs; a distinct set can't say WHERE the
    * duplicate sits). Texts with fewer than k words yield an EMPTY
    * array: there is no k-window to match — deliberately unlike the
    * shingle-set contract, which hashes short texts whole so Jaccard
    * never divides by zero.
    */
  def tokenWindowHashes(s: UTF8String, k: Int): ArrayData = {
    val str = s.toString
    var wordHashes = new Array[Long](16)
    var nw = 0
    var i = 0
    val len = str.length
    while (i < len) {
      while (i < len && isSpace(str.charAt(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isSpace(str.charAt(i))) i += 1
        wordHashes = grow(wordHashes, nw)
        wordHashes(nw) = fnvRange(str, start, i)
        nw += 1
      }
    }
    if (nw < k) new GenericArrayData(Array.emptyLongArray)
    else {
      val out = new Array[Long](nw - k + 1)
      var w = 0
      while (w + k <= nw) {
        var h = FnvOffset
        var j = 0
        while (j < k) { h = (h ^ wordHashes(w + j)) * FnvPrime; j += 1 }
        out(w) = h
        w += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Distinct hashes of character n-grams (text shorter than n hashes
    * whole). Windows over CODEPOINTS — matching Spark's
    * `length`/`substr` semantics in `Dedup.charNgrams` — so non-BMP
    * text (emoji, CJK extensions) never yields grams that split a
    * surrogate pair. For BMP-only text the hashes are identical to
    * UTF-16 windowing.
    */
  def charNgramHashes(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val cps = str.codePoints().toArray
    val len = cps.length
    def fnvCp(from: Int, until: Int): Long = {
      var h = FnvOffset
      var i = from
      while (i < until) { h = (h ^ cps(i)) * FnvPrime; i += 1 }
      h
    }
    if (len < n) new GenericArrayData(Array(fnvCp(0, len)))
    else {
      val grams = new Array[Long](len - n + 1)
      var i = 0
      while (i + n <= len) { grams(i) = fnvCp(i, i + n); i += 1 }
      distinctSorted(grams, grams.length)
    }
  }

  /** [[BpeSegmentExpr]]'s evaluation entry (shared by interpreted eval
    * and codegen): delegate to the canonical greedy merge loop in
    * `TextAnalysis.bpeSegment`, wrap the pieces for Catalyst.
    */
  /** FNV-1a of a whole string, folding codepoints — the single-word
    * form of the shingle/window hashes above, exposed for feature
    * hashing ([[graft.operators.Featurize]]) so the bucket hash is
    * DuckDB-replayable with the d03 HUGEINT idiom (`unicode(ch)` fold
    * with mod-2⁶⁴ wraparound), unlike xxhash64.
    */
  def fnvHash64Kernel(s: UTF8String): Long = {
    val str = s.toString
    fnvRange(str, 0, str.length)
  }

  def bpeSegmentKernel(w: UTF8String,
      rank: Map[(String, String), Int]): ArrayData = {
    val pieces = graft.operators.TextAnalysis.bpeSegment(w.toString, rank)
    new GenericArrayData(
      pieces.map(p => UTF8String.fromString(p): Any).toArray)
  }

  /** [[UnigramSegmentExpr]]'s evaluation entry (shared by interpreted
    * eval and codegen): delegate to the canonical Viterbi loop in
    * `TextAnalysis.unigramViterbi`, wrap the pieces for Catalyst.
    */
  def unigramSegmentKernel(w: UTF8String,
      logp: Map[String, Double], maxPieceLen: Int): ArrayData = {
    val pieces = graft.operators.TextAnalysis
      .unigramViterbi(w.toString, logp, maxPieceLen)
    new GenericArrayData(
      pieces.map(p => UTF8String.fromString(p): Any).toArray)
  }

  /** |A∩B| of two SORTED-DISTINCT long arrays (the invariant every
    * hash-set kernel above guarantees via [[distinctSorted]]) in one
    * merge pass — no hash set, no materialized intersection array.
    * |A∪B| follows as |A|+|B|−|A∩B|, so one call prices a whole
    * Jaccard. Unsorted or duplicated input undercounts; callers own
    * the invariant.
    */
  def sortedInterCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }
}

/** Expression wrapper: FNV-1a codepoint hash of a string (see
  * [[TextKernels.fnvHash64Kernel]]).
  */
case class FnvHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"fnv_hash64 expects string, got ${other.simpleString}")
    }

  override def sql: String = s"fnv_hash64(${child.sql})"

  override def nullSafeEval(input: Any): Any =
    TextKernels.fnvHash64Kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kern = TextKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev,
      in => s"${ev.value} = $kern.fnvHash64Kernel($in);")
  }

  override protected def withNewChildInternal(newChild: Expression): FnvHash64 =
    copy(child = newChild)
  override def prettyName: String = "fnv_hash64"
}

/** Expression wrapper: distinct word-k-shingle hashes of a string. */
case class TokenShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_shingle_hashes expects string, got ${other.simpleString}")
    }

  /** Print with k so SqlGen output re-parses through the registered
    * two-argument SQL function.
    */
  override def sql: String = s"token_shingle_hashes(${child.sql}, $k)"

  override def nullSafeEval(input: Any): Any =
    TextKernels.tokenShingleHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kern = TextKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev,
      in => s"${ev.value} = $kern.tokenShingleHashes($in, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenShingleHashes =
    copy(child = newChild)
  override def prettyName: String = "token_shingle_hashes"
}

/** Expression wrapper: positional word-k-window hashes of a string
  * (ordered, duplicates kept, empty below k words).
  */
case class TokenWindowHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_window_hashes expects string, got ${other.simpleString}")
    }

  /** Print with k so SqlGen output re-parses through the registered
    * two-argument SQL function.
    */
  override def sql: String = s"token_window_hashes(${child.sql}, $k)"

  override def nullSafeEval(input: Any): Any =
    TextKernels.tokenWindowHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kern = TextKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev,
      in => s"${ev.value} = $kern.tokenWindowHashes($in, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenWindowHashes =
    copy(child = newChild)
  override def prettyName: String = "token_window_hashes"
}

/** Expression wrapper: distinct char-n-gram hashes of a string. */
case class CharNgramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_ngram_hashes expects string, got ${other.simpleString}")
    }

  /** Print with n so SqlGen output re-parses through the registered
    * two-argument SQL function.
    */
  override def sql: String = s"char_ngram_hashes(${child.sql}, $n)"

  override def nullSafeEval(input: Any): Any =
    TextKernels.charNgramHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kern = TextKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev,
      in => s"${ev.value} = $kern.charNgramHashes($in, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharNgramHashes =
    copy(child = newChild)
  override def prettyName: String = "char_ngram_hashes"
}

/** Jaccard |A∩B| / |A∪B| of two SORTED-DISTINCT `array<bigint>`
  * columns via one sorted-merge pass — the codegen'd replacement for
  * `size(array_intersect(a,b)) / size(array_union(a,b))` on the
  * shingle / char-gram hash sets, which allocates a hash set AND two
  * materialized arrays per pair just to read two lengths. Value
  * equivalence is exact: both counts are the same integers (merge
  * count = |A∩B| for sorted-distinct inputs; |A∪B| = |A|+|B|−|A∩B|),
  * divided by the same IEEE double division; both-empty inputs yield
  * NULL (the builtin's 0/0 divide throws under ANSI — a case no
  * sorted-distinct hash kernel can produce, so the queries never
  * reach it either way). CONTRACT: inputs must
  * be sorted distinct (the [[TextKernels]] output invariant —
  * `distinctSorted`); unsorted input undercounts the intersection.
  */
case class SortedJaccard(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  // both-empty inputs divide 0/0 → NULL even when the children are
  // non-nullable
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_jaccard expects two array<bigint> args, got " +
            s"${l.simpleString} and ${r.simpleString}")
    }

  /** Print as the registered two-argument SQL function so SqlGen
    * output re-parses.
    */
  override def sql: String = s"sorted_jaccard(${left.sql}, ${right.sql})"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val inter = TextKernels.sortedInterCount(a, b)
    val union = a.numElements().toLong + b.numElements() - inter
    if (union == 0L) null else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kern = TextKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val inter = ctx.freshName("inter")
    val union = ctx.freshName("union")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |int $inter = $kern.sortedInterCount($a, $b);
      |long $union = (long) $a.numElements() + $b.numElements() - $inter;
      |if ($union == 0L) { ${ev.isNull} = true; }
      |else { ${ev.value} = $inter / (double) $union; }
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedJaccard =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sorted_jaccard"
}

/** BPE-segment a word against a trained merge table: repeatedly merge
  * the adjacent symbol pair with the best (lowest) merge priority until
  * none applies — op-for-op `TextAnalysis.bpeSegment` (same greedy
  * loop, same leftmost-occurrence [[graft.operators.TextAnalysis
  * .mergeOnce]] rewrite), exposed as a native expression so the encode
  * plan is fully declarative (the reason the BPE queries round-trip
  * through the SQL generator instead of hiding in a typed map stage).
  *
  * The merge table rides as a FOLDABLE `array<string>` child — element
  * i is `"left right"` with priority i (tokens are produced by
  * whitespace splitting, so symbols never contain a space and the
  * single-space join is unambiguous) — which keeps equality structural
  * and `.sql` printable/replayable. Evaluation cost is the same
  * per-WORD loop as before; callers still evaluate it over the
  * DISTINCT-word vocabulary, never per token occurrence.
  */
case class BpeSegmentExpr(word: Expression, merges: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = word
  override def right: Expression = merges

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (word.dataType, merges.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        if (!merges.foldable)
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            "bpe_segment: merge table must be a literal array")
        else
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_segment expects (string, array<string> literal), got " +
            s"${word.dataType.simpleString} and ${merges.dataType.simpleString}")
    }

  @transient private[functions] lazy val rankMap: Map[(String, String), Int] = {
    val arr = merges.eval().asInstanceOf[ArrayData]
    val pairs = (0 until arr.numElements()).map { i =>
      val s = arr.getUTF8String(i).toString
      val sp = s.indexOf(' ')
      require(sp > 0 && sp < s.length - 1 && s.indexOf(' ', sp + 1) < 0,
        s"bpe_segment: malformed merge entry '$s' (want 'left right')")
      ((s.substring(0, sp), s.substring(sp + 1)), i)
    }
    val m = pairs.toMap
    require(m.size == pairs.size,
      "bpe_segment: duplicate (left, right) pairs in merge table")
    m
  }

  override def sql: String = s"bpe_segment(${word.sql}, ${merges.sql})"

  override def nullSafeEval(w: Any, _m: Any): Any =
    TextKernels.bpeSegmentKernel(w.asInstanceOf[UTF8String], rankMap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRank", rankMap,
      "scala.collection.immutable.Map")
    val kern = TextKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev,
      (w, _) => s"${ev.value} = $kern.bpeSegmentKernel($w, $ref);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeSegmentExpr =
    copy(word = newLeft, merges = newRight)

  override def prettyName: String = "bpe_segment"
}

/** Viterbi-segment a word against a trained unigram-LM piece table:
  * maximize the sum of piece logprobs over all tilings of the word
  * (exact ties prefer the longer last piece; unknown single codepoints
  * score `TextAnalysis.UnigramUnkLogp`) — op-for-op
  * `TextAnalysis.unigramViterbi`, exposed as a native expression so
  * the encode plan is fully declarative (the [[BpeSegmentExpr]]
  * stance: the unigram queries round-trip through the SQL generator
  * instead of hiding in a typed map stage).
  *
  * The piece table rides as a FOLDABLE `array<string>` child — each
  * element is `"piece logprob"` (pieces come from whitespace-split
  * tokens so never contain a space; the logprob prints via
  * `java.lang.Double.toString`, which round-trips bit-exactly through
  * `parseDouble`) — keeping equality structural and `.sql`
  * printable/replayable. Callers evaluate it over the DISTINCT-word
  * vocabulary, never per token occurrence.
  */
case class UnigramSegmentExpr(word: Expression, pieces: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = word
  override def right: Expression = pieces

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (word.dataType, pieces.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        if (!pieces.foldable)
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            "unigram_segment: piece table must be a literal array")
        else
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unigram_segment expects (string, array<string> literal), got " +
            s"${word.dataType.simpleString} and ${pieces.dataType.simpleString}")
    }

  @transient private[functions] lazy val logpMap: Map[String, Double] = {
    val arr = pieces.eval().asInstanceOf[ArrayData]
    require(arr != null, "unigram_segment: piece table evaluated to null")
    val entries = (0 until arr.numElements()).map { i =>
      val s = arr.getUTF8String(i).toString
      val sp = s.indexOf(' ')
      require(sp > 0 && sp < s.length - 1,
        s"unigram_segment: malformed entry '$s' (want 'piece logprob')")
      val lp = try java.lang.Double.parseDouble(s.substring(sp + 1))
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"unigram_segment: unparseable logprob in entry '$s'")
      }
      (s.substring(0, sp), lp)
    }
    val m = entries.toMap
    require(m.size == entries.size,
      "unigram_segment: duplicate pieces in table")
    m
  }

  @transient private[functions] lazy val maxPieceLen: Int =
    if (logpMap.isEmpty) 1
    else logpMap.keysIterator.map(p => p.codePointCount(0, p.length)).max

  override def sql: String = s"unigram_segment(${word.sql}, ${pieces.sql})"

  override def nullSafeEval(w: Any, _p: Any): Any =
    TextKernels.unigramSegmentKernel(
      w.asInstanceOf[UTF8String], logpMap, maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramLogp", logpMap,
      "scala.collection.immutable.Map")
    val kern = TextKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev,
      (w, _) => s"${ev.value} = $kern.unigramSegmentKernel($w, $ref, $maxPieceLen);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UnigramSegmentExpr =
    copy(word = newLeft, pieces = newRight)

  override def prettyName: String = "unigram_segment"
}

object TextKernelOps {
  def fnvHash64(text: Column): Column =
    GraftBridge.column(FnvHash64(GraftBridge.expression(text)))
  def tokenShingleHashes(text: Column, k: Int): Column =
    GraftBridge.column(TokenShingleHashes(GraftBridge.expression(text), k))
  def charNgramHashes(text: Column, n: Int): Column =
    GraftBridge.column(CharNgramHashes(GraftBridge.expression(text), n))
  def tokenWindowHashes(text: Column, k: Int): Column =
    GraftBridge.column(TokenWindowHashes(GraftBridge.expression(text), k))
  /** Sorted-merge Jaccard of two sorted-distinct array<bigint>
    * columns (see [[SortedJaccard]] for the contract).
    */
  def sortedJaccard(a: Column, b: Column): Column =
    GraftBridge.column(SortedJaccard(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  /** Codegen'd BPE segmentation; the merge table (rank order) rides as
    * an array-of-"left right" literal.
    */
  def bpeSegment(word: Column,
      merges: Seq[graft.operators.TextAnalysis.BpeMerge]): Column = {
    import org.apache.spark.sql.functions.typedlit
    val entries = merges.sortBy(_.rank).map(m => s"${m.left} ${m.right}")
    GraftBridge.column(BpeSegmentExpr(GraftBridge.expression(word),
      GraftBridge.expression(typedlit(entries))))
  }
  /** Codegen'd unigram-LM Viterbi segmentation; the piece table rides
    * as an array-of-"piece logprob" literal (sorted by piece for a
    * canonical, structurally-comparable literal).
    */
  def unigramSegment(word: Column,
      table: Seq[graft.operators.TextAnalysis.UnigramPiece]): Column = {
    import org.apache.spark.sql.functions.typedlit
    val entries = table.sortBy(_.piece)
      .map(p => s"${p.piece} ${java.lang.Double.toString(p.logprob)}")
    GraftBridge.column(UnigramSegmentExpr(GraftBridge.expression(word),
      GraftBridge.expression(typedlit(entries))))
  }
}
