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

object TextKernelOps {
  def tokenShingleHashes(text: Column, k: Int): Column =
    GraftBridge.column(TokenShingleHashes(GraftBridge.expression(text), k))
  def charNgramHashes(text: Column, n: Int): Column =
    GraftBridge.column(CharNgramHashes(GraftBridge.expression(text), n))
  def tokenWindowHashes(text: Column, k: Int): Column =
    GraftBridge.column(TokenWindowHashes(GraftBridge.expression(text), k))
}
