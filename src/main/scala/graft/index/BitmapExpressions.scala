package graft.index

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.roaringbitmap.longlong.Roaring64NavigableMap

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
  def andNotCardinality(a: Array[Byte], b: Array[Byte]): Long = {
    val x = Bitmap.deserialize(a); x.andNot(Bitmap.deserialize(b)); x.getLongCardinality
  }
  def xorCardinality(a: Array[Byte], b: Array[Byte]): Long = {
    val x = Bitmap.deserialize(a); x.xor(Bitmap.deserialize(b)); x.getLongCardinality
  }
}

/** `bitmap_build(idExpr)` — native aggregate building a roaring bitmap of a
  * LONG column. The aggregation buffer is the live bitmap object, and its
  * SHUFFLE encoding is roaring's own compact serialization
  * (`Bitmap.serialize`) — not Java object serialization, which is both ~4×
  * larger on the wire and far slower to write (the partial-bitmap exchange is
  * the only shuffle in an index build, so its encoding is the build's
  * bottleneck at scale). */
case class BitmapBuildAgg(child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Roaring64NavigableMap] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Roaring64NavigableMap = new Roaring64NavigableMap()
  override def update(b: Roaring64NavigableMap, row: InternalRow): Roaring64NavigableMap = {
    val v = child.eval(row)
    if (v != null) b.addLong(v.asInstanceOf[Long])
    b
  }
  override def merge(a: Roaring64NavigableMap, b: Roaring64NavigableMap): Roaring64NavigableMap = {
    a.or(b); a
  }
  override def eval(b: Roaring64NavigableMap): Any = Bitmap.serialize(b)
  override def serialize(b: Roaring64NavigableMap): Array[Byte] = Bitmap.serialize(b)
  override def deserialize(bytes: Array[Byte]): Roaring64NavigableMap = Bitmap.deserialize(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_build"
  override def withNewMutableAggBufferOffset(offset: Int): BitmapBuildAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BitmapBuildAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): BitmapBuildAgg =
    copy(child = newChild)
}

/** `bitmap_or_agg(bm)` — native aggregate OR-merging SERIALIZED bitmaps
  * (vs [[BitmapBuildAgg]], which builds from raw ids). This is the
  * reference's cross-shard row-bitmap union reduce (`reference/
  * executor.go:5382` union merged at the coordinator): it lets a query
  * combine pre-built index rows — e.g. a global count-distinct over several
  * segment bitmaps — without touching the fact table. Buffer is the live
  * bitmap; shuffle encoding is roaring's compact serialization. */
case class BitmapOrAgg(child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Roaring64NavigableMap] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Roaring64NavigableMap = new Roaring64NavigableMap()
  override def update(b: Roaring64NavigableMap, row: InternalRow): Roaring64NavigableMap = {
    val v = child.eval(row)
    if (v != null) b.or(Bitmap.deserialize(v.asInstanceOf[Array[Byte]]))
    b
  }
  override def merge(a: Roaring64NavigableMap, b: Roaring64NavigableMap): Roaring64NavigableMap = {
    a.or(b); a
  }
  override def eval(b: Roaring64NavigableMap): Any = Bitmap.serialize(b)
  override def serialize(b: Roaring64NavigableMap): Array[Byte] = Bitmap.serialize(b)
  override def deserialize(bytes: Array[Byte]): Roaring64NavigableMap = Bitmap.deserialize(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_or_agg"
  override def withNewMutableAggBufferOffset(offset: Int): BitmapOrAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BitmapOrAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): BitmapOrAgg =
    copy(child = newChild)
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

/** `bitmap_andnot_cardinality(a, b)` — |a \ b| (reference Count(Difference),
  * `reference/executor.go` difference over row bitmaps). */
case class BitmapAndNotCardinality(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_andnot_cardinality"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitmapExpressions.andNotCardinality(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.index.BitmapExpressions.andNotCardinality($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitmapAndNotCardinality =
    copy(left = l, right = r)
}

/** `bitmap_xor_cardinality(a, b)` — |a Δ b| (reference Count(Xor)). */
case class BitmapXorCardinality(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_xor_cardinality"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitmapExpressions.xorCardinality(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.index.BitmapExpressions.xorCardinality($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitmapXorCardinality =
    copy(left = l, right = r)
}
