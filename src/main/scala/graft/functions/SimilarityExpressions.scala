package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd vector math for the similarity surface. The interpreted
  * `aggregate`/`zip_with`/`transform` HOF formulation is semantically
  * identical but runs the lambda interpreter per element per row — on a
  * 100 TB embedding corpus that interpreter IS the query cost. These
  * expressions compile to a tight primitive loop inside whole-stage codegen.
  *
  * Arithmetic is kept BIT-IDENTICAL to the HOF version (and to DuckDB's
  * `list_cosine_similarity(::DOUBLE[], ::DOUBLE[])`, which the correctness
  * oracles replay): each element cast float→double exactly, products and
  * left-to-right accumulation in IEEE double. Array elements must be
  * non-null (embedding vectors are dense).
  */
object SimilarityExpressions {
  // static entry points referenced from generated code; aF/bF flag float
  // (vs double) element types, resolved at plan time
  def cosine(a: ArrayData, aF: Boolean, b: ArrayData, bF: Boolean): Double = {
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def dot(a: ArrayData, aF: Boolean, b: ArrayData, bF: Boolean): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  private[functions] def isFloat(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other => sys.error(s"vector expression over non-float array: $other")
  }
}

/** `cosine_similarity(a, b)` — one fused pass: dot, |a|², |b|². */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"
  private lazy val aF = SimilarityExpressions.isFloat(left.dataType)
  private lazy val bF = SimilarityExpressions.isFloat(right.dataType)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SimilarityExpressions.cosine(a.asInstanceOf[ArrayData], aF,
      b.asInstanceOf[ArrayData], bF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SimilarityExpressions.cosine($a, $aF, $b, $bF)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** `vector_dot(a, b)` — left-to-right double dot product. */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"
  private lazy val aF = SimilarityExpressions.isFloat(left.dataType)
  private lazy val bF = SimilarityExpressions.isFloat(right.dataType)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SimilarityExpressions.dot(a.asInstanceOf[ArrayData], aF,
      b.asInstanceOf[ArrayData], bF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SimilarityExpressions.dot($a, $aF, $b, $bF)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VectorDot =
    copy(left = l, right = r)
}
