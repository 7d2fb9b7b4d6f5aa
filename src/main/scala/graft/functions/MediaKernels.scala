package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Media decode/feature kernels as native expressions (round 8
  * session 2; formerly typed mapPartitions stages). The per-row work
  * is library decode (javax.imageio / javax.sound) with deterministic
  * stub fallbacks — decode-dominated, so the win here is NOT inner-
  * loop codegen but PLAN SHAPE: no MediaRecord encoder round-trip per
  * row, and a fully declarative (SerializeFromObject-free) plan, which
  * is what lets every multimodal query render through the SQL
  * generator. All three evaluate through the same `Multimodal` core
  * helpers the typed stages used, so outputs are bit-identical.
  */

/** 64-bit perceptual difference hash of an image payload: real
  * ImageIO decode → 9×8 grayscale → delta-sign bits; undecodable
  * payloads take the deterministic codepoint-grid stub
  * (`Multimodal.stubGrid`), keeping the hash oracle-replayable on
  * synthetic corpora.
  */
case class ImageDHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"image_dhash expects binary, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    graft.operators.Multimodal.dHashOf(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = graft.operators.Multimodal.getClass.getName
      .stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $helper.dHashOf($in);")
  }

  override protected def withNewChildInternal(newChild: Expression): ImageDHash =
    copy(child = newChild)

  override def prettyName: String = "image_dhash"
}

/** 64-bit audio energy signature: real javax.sound decode → 65
  * window means → 64 delta-sign bits for `kind = 'audio'` payloads
  * the JDK can parse; everything else takes the deterministic
  * codepoint stub (`Multimodal.stubAudioSig`).
  */
case class AudioEnergySig(kind: Expression, bytes: Expression)
    extends BinaryExpression {

  override def left: Expression = kind
  override def right: Expression = bytes

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (kind.dataType, bytes.dataType) match {
      case (StringType, BinaryType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"audio_energy_sig expects (string, binary), got " +
            s"${kind.dataType.simpleString} and ${bytes.dataType.simpleString}")
    }

  override def nullSafeEval(k: Any, b: Any): Any =
    graft.operators.Multimodal.audioSigOf(
      k.asInstanceOf[UTF8String].toString, b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = graft.operators.Multimodal.getClass.getName
      .stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (k, b) =>
      s"${ev.value} = $helper.audioSigOf($k.toString(), $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AudioEnergySig =
    copy(kind = newLeft, bytes = newRight)

  override def prettyName: String = "audio_energy_sig"
}

/** The full decode-features struct: real image decode, else real
  * audio decode, else the deterministic stub (`Multimodal
  * .featureCore` verbatim). (targetW, targetH) are scalar parameters
  * printed in `.sql` so the call replays through the SQL registry.
  */
case class MediaFeaturesExpr(kind: Expression, bytes: Expression,
    widthExpr: Expression, heightExpr: Expression,
    durationMs: Expression, targetW: Int, targetH: Int)
    extends Expression {

  override def children: Seq[Expression] =
    Seq(kind, bytes, widthExpr, heightExpr, durationMs)

  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)

  override def dataType: DataType = StructType(Seq(
    StructField("byte_len", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("out_width", IntegerType, nullable = false),
    StructField("out_height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val want = Seq(StringType, BinaryType, IntegerType, IntegerType, LongType)
    if (children.map(_.dataType) == want)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "media_features expects (string, binary, int, int, bigint), got " +
          children.map(_.dataType.simpleString).mkString("(", ", ", ")"))
  }

  override def sql: String =
    s"media_features(${children.map(_.sql).mkString(", ")}, $targetW, $targetH)"

  override def eval(input: InternalRow): Any = {
    val k = kind.eval(input)
    val b = bytes.eval(input)
    val w = widthExpr.eval(input)
    val h = heightExpr.eval(input)
    val d = durationMs.eval(input)
    if (k == null || b == null || w == null || h == null || d == null) null
    else MediaKernels.featureRow(k.asInstanceOf[UTF8String],
      b.asInstanceOf[Array[Byte]], w.asInstanceOf[Int],
      h.asInstanceOf[Int], d.asInstanceOf[Long], targetW, targetH)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ks = children.map(_.genCode(ctx))
    val helper = MediaKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val irow = classOf[InternalRow].getName
    ev.copy(code =
      code"""
        |${ks(0).code}
        |${ks(1).code}
        |${ks(2).code}
        |${ks(3).code}
        |${ks(4).code}
        |boolean ${ev.isNull} = ${ks(0).isNull} || ${ks(1).isNull} ||
        |  ${ks(2).isNull} || ${ks(3).isNull} || ${ks(4).isNull};
        |$irow ${ev.value} = null;
        |if (!${ev.isNull}) {
        |  ${ev.value} = $helper.featureRow(${ks(0).value}, ${ks(1).value},
        |    ${ks(2).value}, ${ks(3).value}, ${ks(4).value},
        |    $targetW, $targetH);
        |}
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MediaFeaturesExpr =
    copy(kind = newChildren(0), bytes = newChildren(1),
      widthExpr = newChildren(2), heightExpr = newChildren(3),
      durationMs = newChildren(4))

  override def prettyName: String = "media_features"
}

object MediaKernels {
  /** Shared eval entry for [[MediaFeaturesExpr]] (interpreted and
    * generated code): run the decode core, wrap as an InternalRow.
    */
  def featureRow(kind: UTF8String, bytes: Array[Byte], width: Int,
      height: Int, durationMs: Long, targetW: Int,
      targetH: Int): InternalRow = {
    val (bl, cs, ow, oh, nf) = graft.operators.Multimodal.featureCore(
      kind.toString, bytes, width, height, durationMs, targetW, targetH)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bl, cs, ow, oh, nf))
  }
}

object MediaKernelOps {
  /** Codegen'd perceptual dHash of an image payload. */
  def imageDHash(bytes: Column): Column =
    GraftBridge.column(ImageDHash(GraftBridge.expression(bytes)))

  /** Codegen'd audio energy signature (stub fallback included). */
  def audioEnergySig(kind: Column, bytes: Column): Column =
    GraftBridge.column(AudioEnergySig(
      GraftBridge.expression(kind), GraftBridge.expression(bytes)))

  /** Codegen'd full decode-features struct. */
  def mediaFeatures(kind: Column, bytes: Column, width: Column,
      height: Column, durationMs: Column, targetW: Int,
      targetH: Int): Column =
    GraftBridge.column(MediaFeaturesExpr(
      GraftBridge.expression(kind), GraftBridge.expression(bytes),
      GraftBridge.expression(width), GraftBridge.expression(height),
      GraftBridge.expression(durationMs), targetW, targetH))
}
