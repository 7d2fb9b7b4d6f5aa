package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The bloom word array as a COMPACT constant expression (r20 — task
  * binary size, guide §2/§5). `lit(Array[Long])` converts to a
  * GenericArrayData of BOXED longs and Java-serializes at ~50 B per
  * element per occurrence — q43's 2048-word filter referenced once
  * per hash probe cost a ~1.1 MiB task binary, re-deserialized by
  * every task. This leaf holds the primitive array (8 B/element on
  * the wire) and evaluates to a cached UnsafeArrayData. A plain
  * `Literal(UnsafeArrayData, ...)` would ship just as compactly but
  * its `.sql` prints the JVM object's toString — unparseable — which
  * breaks the SqlGen roundtrip contract; this node prints the same
  * `ARRAY(..L, ..)` literal text the boxed form printed, so the
  * generated SQL re-parses (to an equivalent CreateArray of
  * literals). Deliberately NOT foldable: constant folding would
  * replace it with exactly that unparseable Literal.
  */
private[operators] case class PackedLongArray(
    words: scala.collection.immutable.ArraySeq[Long])
    extends org.apache.spark.sql.catalyst.expressions.LeafExpression {
  require(words.nonEmpty, "packed_long_array: empty array")

  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = false
  override def foldable: Boolean = false

  @transient private lazy val packed =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(words.toArray)

  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any = packed

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen._
    val ref = ctx.addReferenceObj("packedWords", packed,
      classOf[org.apache.spark.sql.catalyst.util.ArrayData].getName)
    ExprCode.forNonNullValue(JavaCode.global(ref, dataType))
  }

  override def sql: String = words.mkString("ARRAY(", "L, ", "L)")
  override def prettyName: String = "packed_long_array"
}

/** Bloom-filter runtime pruning for large-large joins.
  *
  * A shuffle join of a 100 TB probe side against a selective build side
  * pays the full probe-side exchange even though most probe rows match
  * nothing. The fix every warehouse engine applies is a runtime filter:
  * build a compact bloom filter over the build side's join keys, ship
  * it to the probe scan, and drop non-matching rows BEFORE the
  * exchange — the shuffle then carries only (matches + m-tunable false
  * positives), and the exact equi-join absorbs the false positives, so
  * the result is bit-identical to the unfiltered join.
  *
  * The bitset build is itself distributed: each build row emits its k
  * bit positions, positions reduce to at most `numBits/64` (word,
  * OR-mask) rows via a map-side-combined `bit_or` aggregate, and only
  * that bounded word array is collected (128 B–16 MiB by the bitsFor
  * clamp; warned above 1 MiB) — never the keys. The probe-side test is pure built-in expressions
  * (xxhash64 / shiftleft / element_at on an array literal), so it stays
  * inside whole-stage codegen and costs k hashes + k word probes per
  * row.
  *
  * Sizing: for target false-positive rate p over n keys the classic
  * bound is m ≈ -n·ln(p)/ln(2)², k ≈ (m/n)·ln(2); `bitsFor` rounds m
  * up to a power of two so the position mod is a bit-mask.
  */
object BloomPrune {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Smallest power-of-two bit count for `expectedItems` keys at false
    * positive rate `fpp`, clamped to [2^10, 2^27] (128 B – 16 MiB).
    * The word array rides the plan as a literal shipped with every task
    * binary, so the upper clamp is deliberately tight; sizings above
    * 2^23 bits (1 MiB) log a warning — past that point a real deployment
    * should prefer a semi-join or accept a higher fpp (false positives
    * only cost shuffle bytes, never correctness).
    */
  def bitsFor(expectedItems: Long, fpp: Double = 0.01): Int = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    val m = math.ceil(-expectedItems * math.log(fpp) /
      (math.log(2) * math.log(2)))
    val clamped = math.min(math.max(m, 1L << 10), 1L << 27).toLong
    val bits = java.lang.Long.highestOneBit(clamped - 1) << 1 match {
      case 0 => 1 << 10
      case b => b.toInt
    }
    if (bits > (1 << 23))
      log.warn(s"bloom filter sized to $bits bits (${bits / 8 >> 20} MiB) " +
        s"for $expectedItems keys @ fpp=$fpp — this ships as a plan " +
        "literal with every task; consider a coarser fpp or a semi-join")
    bits
  }

  /** Optimal hash count for a filter of `numBits` over `expectedItems`,
    * clamped to [1, 16] — past ~16 hashes the fpp gain is nil and the
    * per-row probe cost isn't (an over-clamped m for tiny n hits the
    * upper clamp here, not an error).
    */
  def hashesFor(numBits: Int, expectedItems: Long): Int =
    math.min(16, math.max(1,
      math.round(numBits.toDouble / expectedItems * math.log(2)).toInt))

  private def checkParams(numBits: Int, numHashes: Int): Unit = {
    require(numBits >= 64 && Integer.bitCount(numBits) == 1,
      s"numBits must be a power of two >= 64, got $numBits")
    require(numHashes >= 1 && numHashes <= 16,
      s"numHashes must be in [1,16], got $numHashes")
  }

  /** i-th bit position of `key`: xxhash64 with a distinct literal salt
    * per hash, masked to [0, numBits). numBits is a power of two so the
    * mask is exact and sign-safe (pmod on Long.MinValue edge included).
    */
  private def bitPos(key: Column, i: Int, numBits: Int): Column =
    xxhash64(key, lit(i)).bitwiseAND(lit(numBits.toLong - 1))

  /** `1L << (pos & 63)` — the shift amount is a column, so this goes
    * through the SQL `shiftleft` (the Scala `functions.shiftleft`
    * overload only accepts a literal amount).
    */
  private def bitMask(pos: Column): Column =
    call_function("shiftleft", lit(1L), pos.bitwiseAND(lit(63L)).cast("int"))

  /** `pos >> 6` as an int word index (Column `/` on longs is double
    * division, so divide-then-cast would leave codegen'd double math
    * in the hot path).
    */
  private def wordIdx(pos: Column): Column =
    shiftright(pos, 6).cast("int")

  /** Distributed bloom build: the ONLY driver-side data is the bounded
    * `numBits/64`-element word array (an action — call once and reuse;
    * [[pruneJoin]] does). Null keys are skipped (SQL equi-join never
    * matches null anyway).
    */
  def buildBitset(
      build: DataFrame, key: Column,
      numBits: Int, numHashes: Int): Array[Long] = {
    checkParams(numBits, numHashes)
    val positions = (0 until numHashes).map(i => bitPos(key, i, numBits))
    val words = build
      .where(key.isNotNull)
      .select(explode(array(positions: _*)).as("_bp_pos"))
      .select(wordIdx(col("_bp_pos")).as("_bp_word"),
        bitMask(col("_bp_pos")).as("_bp_mask"))
      .groupBy("_bp_word").agg(bit_or(col("_bp_mask")).as("_bp_bits"))
      .collect()
    val arr = new Array[Long](numBits / 64)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Membership test against a built bitset — true for every inserted
    * key, true with probability ~fpp for absent keys. All built-in
    * expressions: codegen'd, no UDF, the word array rides the plan as
    * one array literal (broadcast with the task binary).
    */
  def mightContain(key: Column, words: Array[Long], numHashes: Int): Column = {
    val numBits = words.length * 64
    checkParams(numBits, numHashes)
    // ships 8 B/element instead of lit(...)'s ~50 B/boxed element per
    // occurrence, and still prints replayable SQL — see
    // [[PackedLongArray]]
    val wordsLit = org.apache.spark.sql.GraftBridge.column(
      PackedLongArray(
        scala.collection.immutable.ArraySeq.unsafeWrapArray(words.clone())))
    // xxhash64 hashes a NULL input to the seed value (it is null-
    // TOLERANT, not null-propagating), so without the explicit guard a
    // null key could false-positive through the filter; equi-join
    // semantics say null never matches, so reject it here and keep the
    // pruned row set a strict subset of the join's probe rows.
    (key.isNotNull +: (0 until numHashes).map { i =>
      val pos = bitPos(key, i, numBits)
      // getItem(Column) is 0-based GetArrayItem — no off-by-one shim
      val word = wordsLit(wordIdx(pos))
      word.bitwiseAND(bitMask(pos)) =!= 0L
    }).reduce(_ && _)
  }

  /** Exact equi-join with the probe side bloom-pruned before its
    * exchange. `expectedBuildRows` sizes the filter; results are
    * bit-identical to `probe.join(build, probeKey === buildKey)` for
    * ANY sizing (false positives only cost shuffle bytes).
    *
    * Runs one bounded action (the bitset build) at call time, like the
    * IVF centroid collect — construct once, reuse the returned plan.
    */
  def pruneJoin(
      probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      expectedBuildRows: Long, fpp: Double = 0.01): DataFrame = {
    val numBits = bitsFor(expectedBuildRows, fpp)
    val numHashes = hashesFor(numBits, expectedBuildRows)
    val words = buildBitset(build, build(buildKey), numBits, numHashes)
    // keys bound to their source frames so resolution stays exact even
    // when probeKey == buildKey or a name appears on both sides
    probe
      .where(mightContain(probe(probeKey), words, numHashes))
      .join(build, probe(probeKey) === build(buildKey))
  }

  /** [[pruneJoin]] with the filter auto-sized from a count of the build
    * side. The count is one extra action over the side that is by
    * premise already small and filtered (that's why it's the build
    * side); cache `build` if the recompute matters. Sizing from the true
    * cardinality keeps the measured fpp at the target instead of
    * trusting a caller estimate that drifts as upstream filters change.
    */
  def pruneJoinAuto(
      probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      fpp: Double = 0.01): DataFrame = {
    val n = math.max(build.where(build(buildKey).isNotNull).count(), 1L)
    pruneJoin(probe, build, probeKey, buildKey, n, fpp)
  }
}
