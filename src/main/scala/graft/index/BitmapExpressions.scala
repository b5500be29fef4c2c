package graft.index

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expressions over serialized roaring bitmaps — the codegen
  * path for the index layer (SURVEY §7.3: "a native Catalyst `Expression`
  * (with `doGenCode`) beats a Scala UDF"). These run inside whole-stage
  * codegen via a static call, so index-serving plans ([[graft.plans.IndexRewrite]])
  * have no UDF/serialization overhead on top of the bitmap math itself.
  */
object BitmapExpressions {
  // static entry points referenced from generated code
  def cardinality(b: Array[Byte]): Long = Bitmap.deserialize(b).getLongCardinality
  def andCardinality(a: Array[Byte], b: Array[Byte]): Long = {
    val x = Bitmap.deserialize(a); x.and(Bitmap.deserialize(b)); x.getLongCardinality
  }
  def orCardinality(a: Array[Byte], b: Array[Byte]): Long = {
    val x = Bitmap.deserialize(a); x.or(Bitmap.deserialize(b)); x.getLongCardinality
  }
}

/** `bitmap_cardinality(bm)` — |bm| (the reference's per-row bitmap Count,
  * `reference/executor.go:5839`, served from a stored fragment). */
case class BitmapCardinality(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_cardinality"
  override protected def nullSafeEval(input: Any): Any =
    BitmapExpressions.cardinality(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.index.BitmapExpressions.cardinality($c)")
  override protected def withNewChildInternal(newChild: Expression): BitmapCardinality =
    copy(child = newChild)
}

/** `bitmap_and_cardinality(a, b)` — |a ∩ b| (reference Count(Intersect)). */
case class BitmapAndCardinality(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_and_cardinality"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitmapExpressions.andCardinality(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.index.BitmapExpressions.andCardinality($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitmapAndCardinality =
    copy(left = l, right = r)
}

/** `bitmap_or_cardinality(a, b)` — |a ∪ b| (reference Count(Union)). */
case class BitmapOrCardinality(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_or_cardinality"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitmapExpressions.orCardinality(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.index.BitmapExpressions.orCardinality($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitmapOrCardinality =
    copy(left = l, right = r)
}
