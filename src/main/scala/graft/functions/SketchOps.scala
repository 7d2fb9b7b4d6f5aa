package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd sketching kernels. The composed builtin forms
  * (`transform`+`array_min` per hash, one `aggregate` per bit) are
  * semantically identical but evaluate interpreted lambdas per
  * element×hash — at 100 TB these kernels run per row on billions of
  * rows, so they get single-pass primitive loops instead
  * (~10× per-row cost reduction measured at sf0.1).
  */

/** All-in-one MinHash signature: for each of k hash functions
  * ((a·h30 + b) mod p over 30-bit-masked hashes — ANSI-overflow-safe,
  * and crucially NON-monotonic: without the mod, min(a·h+b) =
  * a·min(h)+b, i.e. every "permutation" would pick the same element
  * and the whole family degenerates to one hash), the min over the
  * input hash array. One pass over the array, k running mins.
  * Input: array<long> (base hashes); output: array<long> of length k.
  */
case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  require(numHashes >= 1)

  // the standard seeded coefficient family — shared derivation, see
  // MinHashSig.coefficients
  @transient private lazy val coefs: (Array[Long], Array[Long]) = {
    val cs = MinHashSig.coefficients(numHashes, seed)
    (cs.map(_._1).toArray, cs.map(_._2).toArray)
  }
  private def coefsA: Array[Long] = coefs._1
  private def coefsB: Array[Long] = coefs._2
  private val mask = (1L << 30) - 1
  private val prime = MinHashSig.Prime

  /** Print with the deriving parameters so SqlGen output re-parses
    * through the registered `minhash_sig(hashes, k, seed)` function.
    */
  override def sql: String = s"minhash_sig(${child.sql}, $numHashes, ${seed}L)"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<bigint>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val k = coefsA.length
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      val h = arr.getLong(j) & mask
      var i = 0
      while (i < k) {
        val v = (coefsA(i) * h + coefsB(i)) % prime
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("coefsA", coefsA, "long[]")
    val bRef = ctx.addReferenceObj("coefsB", coefsB, "long[]")
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, arr => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val n = ctx.freshName("n")
      s"""
         |long[] $out = new long[${coefsA.length}];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |int $n = $arr.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $arr.getLong($j) & ${mask}L;
         |  for (int $i = 0; $i < ${coefsA.length}; $i++) {
         |    long $v = ($aRef[$i] * $h + $bRef[$i]) % ${MinHashSig.Prime}L;
         |    if ($v < $out[$i]) $out[$i] = $v;
         |  }
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  /** Largest prime below 2^30 — keeps a·h+b < 2^60 overflow-free. */
  final val Prime = 1073741789L

  /** THE seeded (a, b) coefficient family — the one derivation the
    * kernel, the composed-builtin test oracle
    * (Dedup.minhashSignatureHof) and the d17 cross-engine oracle's
    * VALUES table all share (round-14 review: three inline copies of
    * this formula had to stay identical by eyeball).
    */
  def coefficients(numHashes: Int, seed: Long): Seq[(Long, Long)] = {
    val mask = (1L << 30) - 1
    val rnd = new scala.util.Random(seed)
    Seq.fill(numHashes)((rnd.nextLong() & mask | 1L, rnd.nextLong() & mask))
  }
}

/** LSH band buckets of a MinHash signature in one pass: the signature
  * splits into `bands` equal row-groups and each group folds to one
  * 64-bit bucket hash (FNV-1a over the longs). Replaces the composed
  * `xxhash64(slice(sig, …))`×bands form, which copies a sub-array per
  * band per row. The bucket hash only has to be well-mixed — it is a
  * shuffle key, never an output value — so the family differs from
  * xxhash64 without changing any verified pair set.
  * Input: array<long> of length bands·rows; output: array<long> of
  * length bands.
  */
case class MinHashBandBuckets(child: Expression, bands: Int)
    extends UnaryExpression {

  require(bands >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_band_buckets expects array<bigint>, got ${other.simpleString}")
    }

  override def sql: String = s"minhash_band_buckets(${child.sql}, $bands)"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    // SQL callers reach this without the Scala wrapper's divisibility
    // guard; silently dropping trailing hashes would corrupt buckets
    if (arr.numElements() % bands != 0)
      throw new IllegalArgumentException(
        s"minhash_band_buckets: signature length ${arr.numElements()} " +
          s"is not divisible by bands=$bands")
    val rows = arr.numElements() / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = TextKernels.FnvOffset
      var j = b * rows
      val end = j + rows
      while (j < end) {
        h = (h ^ arr.getLong(j)) * TextKernels.FnvPrime
        j += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, arr => {
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val rows = ctx.freshName("rows")
      val end = ctx.freshName("end")
      s"""
         |if ($arr.numElements() % $bands != 0) {
         |  throw new IllegalArgumentException(
         |    "minhash_band_buckets: signature length " + $arr.numElements() +
         |    " is not divisible by bands=" + $bands);
         |}
         |long[] $out = new long[$bands];
         |int $rows = $arr.numElements() / $bands;
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $h = ${TextKernels.FnvOffset}L;
         |  int $end = $b * $rows + $rows;
         |  for (int $j = $b * $rows; $j < $end; $j++) {
         |    $h = ($h ^ $arr.getLong($j)) * ${TextKernels.FnvPrime}L;
         |  }
         |  $out[$b] = $h;
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBandBuckets =
    copy(child = newChild)

  override def prettyName: String = "minhash_band_buckets"
}

/** Single-pass 64-bit SimHash from a feature-hash array: per bit,
  * majority vote over features. Input: array<long>; output: long.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 expects array<bigint>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      j += 1
    }
    var sketch = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sketch |= (1L << i)
      i += 1
    }
    sketch
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val n = ctx.freshName("n")
      val sk = ctx.freshName("sk")
      s"""
         |int[] $votes = new int[64];
         |int $n = $arr.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $arr.getLong($j);
         |  for (int $i = 0; $i < 64; $i++) {
         |    if ((($h >>> $i) & 1L) == 1L) $votes[$i]++; else $votes[$i]--;
         |  }
         |}
         |long $sk = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if ($votes[$i] > 0) $sk |= (1L << $i);
         |}
         |${ev.value} = $sk;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SketchOps {
  /** Column wrapper for [[MinHashSig]] with the standard seeded
    * coefficient family (matches Dedup.minhashSignature semantics).
    */
  def minhashSig(hashes: Column, numHashes: Int, seed: Long = 42L): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(hashes), numHashes, seed))

  def simhash64(features: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(features)))

  /** Band bucket hashes of a MinHash signature (codegen'd kernel). */
  def minhashBandBuckets(sig: Column, bands: Int): Column =
    GraftBridge.column(MinHashBandBuckets(GraftBridge.expression(sig), bands))
}
