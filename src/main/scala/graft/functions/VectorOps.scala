package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the inner loop of every embedding
  * operator: dot product over `array<float>` / `array<double>`.
  *
  * A `zip_with`+`aggregate` composition gives the same result but runs
  * through interpreted higher-order-function lambdas — at 100 TB the
  * dot product is evaluated billions of times, so it gets a real
  * `doGenCode` that compiles to a tight primitive loop inside
  * whole-stage codegen. (Preference order per the build rules:
  * compose > custom Expression > custom plan > mapPartitions; a scalar
  * numeric kernel is exactly the custom-Expression case.)
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if (lt == FloatType || lt == DoubleType) &&
             (rt == FloatType || rt == DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product expects array<float|double> args, got " +
            s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  private def elemIsFloat(dt: DataType): Boolean =
    dt.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    // fail fast: silently truncating to the shorter side would return
    // a plausible-looking but wrong dot product (and a cosine whose
    // norms cover a different span than the products)
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"dot_product: vector length mismatch ${a.numElements()} vs " +
          s"${b.numElements()}")
    val n = a.numElements()
    val af = elemIsFloat(left.dataType)
    val bf = elemIsFloat(right.dataType)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemIsFloat(left.dataType)) "getFloat" else "getDouble"
    val bGet = if (elemIsFloat(right.dataType)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "dot_product: vector length mismatch " + $a.numElements() +
         |    " vs " + $b.numElements());
         |}
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.$aGet($i)) * ((double) $b.$bGet($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

/** All sign-LSH band signatures of a vector in ONE pass: for plane
  * p (band p/bitsPerBand, bit p%bitsPerBand), set the bit when
  * `dot(vec, plane_p) > 0`. Replaces bands×bitsPerBand separate
  * [[DotProduct]] expressions (72 for the default d05 config) with a
  * single kernel looping over a flattened band-major plane matrix —
  * the per-row cost that dominates an LSH indexing scan at 100 TB.
  *
  * Parameterized on (bands, bitsPerBand, dim, seed) — the planes are
  * derived lazily from the seed (band b uses `Random(seed + b)`'s
  * Gaussian stream, same family as `Similarity.planes`), so equality /
  * canonicalization is structural (semanticEquals and subexpression
  * elimination work) and `.sql` prints four scalar literals instead of
  * a bands×bitsPerBand×dim array — same pattern as [[MinHashSig]].
  */
case class HyperplaneSigs(child: Expression, bands: Int,
                          bitsPerBand: Int, dim: Int, seed: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(bands >= 1 && bitsPerBand >= 1 && bitsPerBand <= 62 && dim >= 1)
  @transient private lazy val flatPlanes: Array[Double] =
    HyperplaneSigs.flatPlanes(bands, bitsPerBand, dim, seed)
  private val nPlanes = bands * bitsPerBand
  private val nBands = bands

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(vt, _) if vt == FloatType || vt == DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_sigs expects array<float|double>, got ${other.simpleString}")
    }

  override def sql: String =
    s"hyperplane_sigs(${child.sql}, $bands, $bitsPerBand, $dim, ${seed}L)"

  private def vecIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    // the plane matrix is sized for `dim` exactly — a silent
    // min(dim, len) would sign-hash a truncated (or zero-padded)
    // vector and bucket it wrongly without any error
    if (arr.numElements() != dim)
      throw new IllegalArgumentException(
        s"hyperplane_sigs: vector length ${arr.numElements()} != dim $dim")
    val vf = vecIsFloat
    val sigs = new Array[Long](nBands)
    val n = dim
    var p = 0
    while (p < nPlanes) {
      val base = p * dim
      var acc = 0.0
      var j = 0
      while (j < n) {
        val x = if (vf) arr.getFloat(j).toDouble else arr.getDouble(j)
        acc += flatPlanes(base + j) * x
        j += 1
      }
      if (acc > 0) sigs(p / bitsPerBand) |= 1L << (p % bitsPerBand)
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("planes", flatPlanes, "double[]")
    val get = if (vecIsFloat) "getFloat" else "getDouble"
    val gad = classOf[org.apache.spark.sql.catalyst.util.GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, arr => {
      val sigs = ctx.freshName("sigs")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      s"""
         |if ($arr.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "hyperplane_sigs: vector length " + $arr.numElements() +
         |    " != dim " + $dim);
         |}
         |long[] $sigs = new long[$nBands];
         |int $n = $dim;
         |for (int $p = 0; $p < $nPlanes; $p++) {
         |  int $base = $p * $dim;
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $acc += $flatRef[$base + $j] * ((double) $arr.$get($j));
         |  }
         |  if ($acc > 0) $sigs[$p / $bitsPerBand] |= 1L << ($p % $bitsPerBand);
         |}
         |${ev.value} = new $gad($sigs);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigs =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_sigs"
}

object HyperplaneSigs {
  /** Band-major flattened plane matrix: band b's `bitsPerBand` planes
    * of `dim` dims drawn from `Random(seed + b)`'s Gaussian stream —
    * formula-identical to `Similarity.planes(dim, bitsPerBand, seed+b)`
    * (java.util.Random's Gaussian stream is specified behavior, so the
    * planes are the same constants on every JVM — the property the
    * DuckDB oracles rely on when they inline them as literals).
    */
  def flatPlanes(bands: Int, bitsPerBand: Int, dim: Int, seed: Long): Array[Double] = {
    val out = new Array[Double](bands * bitsPerBand * dim)
    var p = 0
    var b = 0
    while (b < bands) {
      val rnd = new scala.util.Random(seed + b)
      var i = 0
      while (i < bitsPerBand * dim) {
        out(p) = rnd.nextGaussian(); p += 1; i += 1
      }
      b += 1
    }
    out
  }
}

/** PQ-encode a vector against a product-quantization codebook in ONE
  * codegen'd pass: for each of `m` subspaces, the code is the argmin
  * over the subspace's `nCodes` centroids of sequential squared L2
  * (ties → lowest code — the `Similarity.pqEncode` contract, term
  * order left-to-right so a DuckDB `list_reduce` fold replays every
  * rounding step).
  *
  * The codebook rides as a FOLDABLE `array<double>` child — flattened
  * subspace-major (`cb[s·nCodes·subDim + c·subDim + j]`) — so the
  * expression is structural (semanticEquals / subexpression
  * elimination work) and `.sql` prints a replayable
  * `pq_encode(vec, ARRAY(…), m, nCodes)` call: the reason the PQ
  * queries round-trip through the SQL generator instead of hiding in
  * a typed mapPartitions stage. Per-row cost is m·nCodes·subDim flops
  * inside whole-stage codegen — the encode scan that dominates a
  * 100 TB PQ index build.
  */
case class PqEncodeCodes(vec: Expression, codebook: Expression,
                         m: Int, nCodes: Int)
    extends BinaryExpression {

  require(m >= 1 && nCodes >= 1, "pq_encode: m and nCodes must be >= 1")

  override def left: Expression = vec
  override def right: Expression = codebook

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (vec.dataType, codebook.dataType) match {
      case (ArrayType(vt, _), ArrayType(ct, _))
          if (vt == FloatType || vt == DoubleType) &&
             (ct == DoubleType) =>
        if (!codebook.foldable)
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            "pq_encode: codebook must be a literal array")
        else
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode expects (array<float|double>, array<double> literal), " +
            s"got ${vec.dataType.simpleString} and ${codebook.dataType.simpleString}")
    }
  }

  @transient private lazy val flatCb: Array[Double] = {
    val arr = codebook.eval().asInstanceOf[ArrayData]
    val out = new Array[Double](arr.numElements())
    var i = 0
    while (i < out.length) { out(i) = arr.getDouble(i); i += 1 }
    require(out.length % (m * nCodes) == 0,
      s"pq_encode: codebook length ${out.length} not divisible by " +
        s"m·nCodes = ${m * nCodes}")
    out
  }
  @transient private lazy val subDim: Int = flatCb.length / (m * nCodes)

  override def sql: String =
    s"pq_encode(${vec.sql}, ${codebook.sql}, $m, $nCodes)"

  private def vecIsFloat: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any, _cb: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != m * subDim)
      throw new IllegalArgumentException(
        s"pq_encode: vector dim ${arr.numElements()} != ${m}·$subDim")
    val vf = vecIsFloat
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val off = s * subDim
      val cbase = s * nCodes * subDim
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < nCodes) {
        val b2 = cbase + c * subDim
        var acc = 0d
        var j = 0
        while (j < subDim) {
          val x = if (vf) arr.getFloat(off + j).toDouble
                  else arr.getDouble(off + j)
          val d = x - flatCb(b2 + j)
          acc += d * d
          j += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("flatCb", flatCb, "double[]")
    val get = if (vecIsFloat) "getFloat" else "getDouble"
    val gad = classOf[org.apache.spark.sql.catalyst.util.GenericArrayData].getName
    val sd = subDim
    nullSafeCodeGen(ctx, ev, (arr, _) => {
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      val b2 = ctx.freshName("b2")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |if ($arr.numElements() != ${m * sd}) {
         |  throw new IllegalArgumentException(
         |    "pq_encode: vector dim " + $arr.numElements() +
         |    " != ${m}*$sd");
         |}
         |int[] $codes = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $off = $s * $sd;
         |  int $b2 = $s * ${nCodes * sd};
         |  int $best = 0;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $nCodes; $c++) {
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $sd; $j++) {
         |      double $d = ((double) $arr.$get($off + $j))
         |        - $cbRef[$b2 + $c * $sd + $j];
         |      $acc += $d * $d;
         |    }
         |    if ($acc < $bestD) { $bestD = $acc; $best = $c; }
         |  }
         |  $codes[$s] = $best;
         |}
         |${ev.value} = new $gad($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodeCodes =
    copy(vec = newLeft, codebook = newRight)

  override def prettyName: String = "pq_encode"
}

/** Nearest-centroid cell assignment in ONE codegen'd pass: argmax
  * over `nCells` centroids of the sequential dot product (ties →
  * LOWEST cell — the `Similarity.assignCells` contract, scan order
  * ascending with a strict improve test). The centroid table rides as
  * a FOLDABLE `array<double>` child flattened cell-major
  * (`cents[c·dim + j]`), so the expression is structural and `.sql`
  * prints a replayable `nearest_centroid(vec, ARRAY(…), dim)` call —
  * the same kernel-family stance as [[PqEncodeCodes]].
  *
  * Why a kernel and not a `greatest(struct…)` chain: the chain costs
  * O(nCells) EXPRESSION NODES — fine at 16 cells, a codegen explosion
  * at the k ∝ corpus sizes SemDeDup/IVF need (10⁵ clusters at 10⁸
  * docs). Here nCells lives in a data array: per-row cost is
  * nCells·dim flops inside whole-stage codegen with TWO nodes total,
  * at any k. The dot accumulates in the exact [[DotProduct]] order
  * (ascending j, x cast to double first), so swapping the chain for
  * the kernel changes no oracle hash.
  */
case class NearestCentroid(vec: Expression, centroids: Expression,
                           dim: Int)
    extends BinaryExpression {

  require(dim >= 1, "nearest_centroid: dim must be >= 1")

  override def left: Expression = vec
  override def right: Expression = centroids

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (vec.dataType, centroids.dataType) match {
      case (ArrayType(vt, _), ArrayType(ct, _))
          if (vt == FloatType || vt == DoubleType) && ct == DoubleType =>
        if (!centroids.foldable)
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            "nearest_centroid: centroids must be a literal array")
        else
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid expects (array<float|double>, array<double> " +
            s"literal), got ${vec.dataType.simpleString} and " +
            s"${centroids.dataType.simpleString}")
    }
  }

  @transient private lazy val flatCents: Array[Double] = {
    val arr = centroids.eval().asInstanceOf[ArrayData]
    val out = new Array[Double](arr.numElements())
    var i = 0
    while (i < out.length) { out(i) = arr.getDouble(i); i += 1 }
    require(out.length >= dim && out.length % dim == 0,
      s"nearest_centroid: centroid array length ${out.length} not a " +
        s"positive multiple of dim = $dim")
    out
  }
  @transient private lazy val nCells: Int = flatCents.length / dim

  override def sql: String =
    s"nearest_centroid(${vec.sql}, ${centroids.sql}, $dim)"

  private def vecIsFloat: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any, _c: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != dim)
      throw new IllegalArgumentException(
        s"nearest_centroid: vector dim ${arr.numElements()} != $dim")
    val vf = vecIsFloat
    var best = 0
    var bestD = Double.NegativeInfinity
    var c = 0
    while (c < nCells) {
      val base = c * dim
      var acc = 0d
      var j = 0
      while (j < dim) {
        val x = if (vf) arr.getFloat(j).toDouble else arr.getDouble(j)
        acc += x * flatCents(base + j)
        j += 1
      }
      if (acc > bestD) { bestD = acc; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("flatCents", flatCents, "double[]")
    val get = if (vecIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (arr, _) => {
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val acc = ctx.freshName("acc")
      s"""
         |if ($arr.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "nearest_centroid: vector dim " + $arr.numElements() +
         |    " != $dim");
         |}
         |int $best = 0;
         |double $bestD = Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $nCells; $c++) {
         |  int $base = $c * $dim;
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $dim; $j++) {
         |    $acc += ((double) $arr.$get($j)) * $centsRef[$base + $j];
         |  }
         |  if ($acc > $bestD) { $bestD = $acc; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(vec = newLeft, centroids = newRight)

  override def prettyName: String = "nearest_centroid"
}

/** Codegen'd dense mat-vec `y = R·x` over a flattened ROW-MAJOR
  * matrix literal: `y(j) = Σ_i flat(j·n + i)·x(i)`, accumulated
  * left-to-right — the identical IEEE op order as one [[DotProduct]]
  * per output row, so swapping an array-of-dots projection for this
  * kernel changes the expression count (rows kernel nodes → one),
  * never a value (spec-pinned). Built for the OPQ rotation
  * (`Similarity.rotateExpr`): at d=64 the array-of-dots form is 64
  * kernel nodes each carrying its own 64-double row literal; this is
  * one node over one flat array reference, and the whole rotation
  * stays inside whole-stage codegen.
  */
case class MatVec(vec: Expression, mat: Expression, rows: Int)
    extends BinaryExpression {

  require(rows >= 1, "mat_vec: rows must be >= 1")

  override def left: Expression = vec
  override def right: Expression = mat

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (vec.dataType, mat.dataType) match {
      case (ArrayType(vt, _), ArrayType(DoubleType, _))
          if vt == FloatType || vt == DoubleType =>
        if (!mat.foldable)
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            "mat_vec: matrix must be a literal array")
        else
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"mat_vec expects (array<float|double>, array<double> literal), " +
            s"got ${vec.dataType.simpleString} and ${mat.dataType.simpleString}")
    }
  }

  @transient private lazy val flat: Array[Double] = {
    val evaluated = mat.eval()
    if (evaluated == null)
      throw new IllegalArgumentException(
        "mat_vec: matrix literal evaluated to null (e.g. CAST(NULL AS ARRAY<DOUBLE>))")
    val arr = evaluated.asInstanceOf[ArrayData]
    val out = new Array[Double](arr.numElements())
    var i = 0
    while (i < out.length) { out(i) = arr.getDouble(i); i += 1 }
    require(out.length % rows == 0,
      s"mat_vec: matrix length ${out.length} not divisible by rows=$rows")
    out
  }

  private def vecIsFloat: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def sql: String = s"mat_vec(${vec.sql}, ${mat.sql}, $rows)"

  override def nullSafeEval(v: Any, _m: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (flat.length != rows * n)
      throw new IllegalArgumentException(
        s"mat_vec: matrix ${flat.length} != rows*dim = $rows*$n")
    val vf = vecIsFloat
    val out = new Array[Double](rows)
    var j = 0
    while (j < rows) {
      val base = j * n
      var acc = 0d
      var i = 0
      while (i < n) {
        val x = if (vf) arr.getFloat(i).toDouble else arr.getDouble(i)
        acc += flat(base + i) * x
        i += 1
      }
      out(j) = acc
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("matVecFlat", flat, "double[]")
    val get = if (vecIsFloat) "getFloat" else "getDouble"
    val gad = classOf[org.apache.spark.sql.catalyst.util.GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, (arr, _) => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      s"""
         |int $n = $arr.numElements();
         |if ($mRef.length != $rows * $n) {
         |  throw new IllegalArgumentException(
         |    "mat_vec: matrix " + $mRef.length + " != rows*dim = " +
         |    "$rows*" + $n);
         |}
         |double[] $out = new double[$rows];
         |for (int $j = 0; $j < $rows; $j++) {
         |  int $base = $j * $n;
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $mRef[$base + $i] * ((double) $arr.$get($i));
         |  }
         |  $out[$j] = $acc;
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MatVec =
    copy(vec = newLeft, mat = newRight)

  override def prettyName: String = "mat_vec"
}

object VectorOps {
  import org.apache.spark.sql.functions._

  /** Codegen'd dot product of two vector columns (float or double). */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** All sign-LSH band signatures in one codegen'd pass; the planes
    * derive deterministically from (bands, bitsPerBand, dim, seed).
    */
  def hyperplaneSigs(vec: Column, bands: Int, bitsPerBand: Int,
                     dim: Int, seed: Long): Column =
    GraftBridge.column(HyperplaneSigs(GraftBridge.expression(vec),
      bands, bitsPerBand, dim, seed))

  /** Codegen'd PQ encode: `m` subspace codes against a flattened
    * subspace-major codebook literal (ties → lowest code).
    */
  def pqEncodeCodes(vec: Column, flatCb: Array[Double],
                    m: Int, nCodes: Int): Column =
    GraftBridge.column(PqEncodeCodes(GraftBridge.expression(vec),
      GraftBridge.expression(typedlit(flatCb.toSeq)), m, nCodes))

  /** Codegen'd nearest-centroid assignment: argmax-dot cell over a
    * flattened cell-major centroid literal (ties → lowest cell).
    */
  def nearestCentroid(vec: Column, flatCents: Array[Double],
                      dim: Int): Column =
    GraftBridge.column(NearestCentroid(GraftBridge.expression(vec),
      GraftBridge.expression(typedlit(flatCents.toSeq)), dim))

  /** Codegen'd `y = R·x` over a flattened row-major matrix literal
    * (the OPQ rotation kernel).
    */
  def matVec(vec: Column, flat: Array[Double], rows: Int): Column =
    GraftBridge.column(MatVec(GraftBridge.expression(vec),
      GraftBridge.expression(typedlit(flat.toSeq)), rows))

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0d, 0d).otherwise(dot(a, b) / d)
  }
}
