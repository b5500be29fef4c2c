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

  /** PQ code word of `v`: per subspace the argmin-distance centroid index
    * (ties lowest), one byte each. */
  def pqCodes(v: ArrayData, vF: Boolean,
              cbs: Array[Array[Array[Double]]]): Array[Byte] = {
    val m = cbs.length
    val out = new Array[Byte](m)
    var off = 0
    var i = 0
    while (i < m) {
      val cb = cbs(i)
      val sub = cb(0).length
      var best = 0
      var bd = Double.PositiveInfinity
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var acc = 0.0
        var j = 0
        while (j < sub) {
          val x = if (vF) v.getFloat(off + j).toDouble else v.getDouble(off + j)
          val d = x - cent(j)
          acc += d * d
          j += 1
        }
        if (acc < bd) { bd = acc; best = c }
        c += 1
      }
      out(i) = best.toByte
      off += sub
      i += 1
    }
    out
  }

  /** ADC: Σᵢ tablesᵢ(codeᵢ). */
  def adcScore(code: Array[Byte], tables: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < code.length) { s += tables(i)(code(i) & 0xFF); i += 1 }
    s
  }

  /** The `m` nearest centroid indices of `v` by Euclidean distance, via
    * argmax of (v·c − |c|²/2). Ties resolve to the lowest cell index. */
  def nearestCells(v: ArrayData, vF: Boolean, cents: Array[Array[Double]],
                   halfNorms: Array[Double], m: Int): ArrayData = {
    val k = cents.length
    val dim = v.numElements()
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = cents(c)
      var acc = 0.0
      var j = 0
      while (j < dim) {
        val x = if (vF) v.getFloat(j).toDouble else v.getDouble(j)
        acc += x * cent(j)
        j += 1
      }
      scores(c) = acc - halfNorms(c)
      c += 1
    }
    val out = new Array[Int](m)
    val taken = new Array[Boolean](k)
    var s = 0
    while (s < m) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < k) {
        if (!taken(i) && scores(i) > bestScore) { best = i; bestScore = scores(i) }
        i += 1
      }
      taken(best) = true
      out(s) = best
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
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

/** `nearest_cells(v)` — indices of the `m` nearest centroids (IVF
  * multi-assignment). The centroid matrix rides the plan as ONE reference
  * object (k·dim doubles of data), not k·dim literal expression nodes — at
  * SemDeDup-scale k a literal formulation would blow up plan construction
  * before any task ran. Scoring is a primitive loop inside codegen. */
case class NearestCells(child: Expression, centroids: Array[Array[Double]], m: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(m >= 1 && m <= centroids.length,
    s"m=$m out of range for ${centroids.length} centroids")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"
  private lazy val vF = SimilarityExpressions.isFloat(child.dataType)
  @transient private lazy val halfNorms: Array[Double] =
    centroids.map(c => c.map(x => x * x).sum / 2)
  override protected def nullSafeEval(v: Any): Any =
    SimilarityExpressions.nearestCells(v.asInstanceOf[ArrayData], vF,
      centroids, halfNorms, m)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val nRef = ctx.addReferenceObj("halfNorms", halfNorms, "double[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.SimilarityExpressions.nearestCells($v, $vF, $cRef, $nRef, $m)")
  }
  override protected def withNewChildInternal(c: Expression): NearestCells =
    copy(child = c)
}

/** `pq_codes(v)` — the PQ code word: per subspace the argmin-distance
  * centroid index (ties to the lowest index), packed ONE BYTE each (k ≤
  * 256). The codebook tensor rides the plan as a single reference object;
  * scoring is a primitive loop inside codegen — no per-subspace slice
  * allocation, no per-element lambda. */
case class PqCodes(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(cb => cb.nonEmpty && cb.length <= 256),
    "PQ codebooks must be non-empty with k <= 256 (one byte per code)")
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "pq_codes"
  private lazy val vF = SimilarityExpressions.isFloat(child.dataType)
  override protected def nullSafeEval(v: Any): Any =
    SimilarityExpressions.pqCodes(v.asInstanceOf[ArrayData], vF, codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.SimilarityExpressions.pqCodes($v, $vF, $cRef)")
  }
  override protected def withNewChildInternal(c: Expression): PqCodes =
    copy(child = c)
}

/** `adc_score(code)` — asymmetric distance computation: Σᵢ tableᵢ(codeᵢ),
  * the query-side dot-product tables as one reference object. */
case class AdcScore(child: Expression, tables: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "adc_score"
  override protected def nullSafeEval(b: Any): Any =
    SimilarityExpressions.adcScore(b.asInstanceOf[Array[Byte]], tables)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("adcTables", tables, "double[][]")
    defineCodeGen(ctx, ev, b =>
      s"graft.functions.SimilarityExpressions.adcScore($b, $tRef)")
  }
  override protected def withNewChildInternal(c: Expression): AdcScore =
    copy(child = c)
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
