package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd text hashing. The HOF formulation
  * (`aggregate(split(s, ""), ...)`) runs the lambda interpreter once per
  * CHARACTER per row — it is the whole cost of fingerprinting/simhashing a
  * corpus. This is one primitive loop, bit-identical to the HOF (and to
  * the DuckDB `list_reduce` replay the oracles use): per code point,
  * `acc = (acc*31 + cp) % FpMod`. */
object TextExpressions {

  /** Occurrence count of the most frequent whitespace token — one pass and
    * one hash map. The HOF formulation (`transform(distinct ws, w ->
    * size(filter(ws, _ = w)))`) is O(distinct × total) AND re-evaluates the
    * tokenize expression inside the lambda per element. */
  def topTokenCount(s: UTF8String): Long = {
    val raw = s.toString.split(" ")
    val counts = new java.util.HashMap[String, Int](raw.length * 2)
    var max = 0
    var i = 0
    while (i < raw.length) {
      if (!raw(i).isEmpty) {
        val c = counts.merge(raw(i), 1, (a, b) => a + b)
        if (c > max) max = c
      }
      i += 1
    }
    max.toLong
  }

  def polyHash(s: UTF8String, mod: Long): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }
}

/** `top_token_count(s)` — max token frequency, codegen'd. */
case class TopTokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "top_token_count"
  override protected def nullSafeEval(s: Any): Any =
    TextExpressions.topTokenCount(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.TextExpressions.topTokenCount($s)")
  override protected def withNewChildInternal(c: Expression): TopTokenCount =
    copy(child = c)
}

/** `poly_hash(s)` — the engine's 48-bit rolling hash ([[Text.FpMod]]). */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"
  override protected def nullSafeEval(s: Any): Any =
    TextExpressions.polyHash(s.asInstanceOf[UTF8String], Text.FpMod)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.TextExpressions.polyHash($s, ${Text.FpMod}L)")
  override protected def withNewChildInternal(c: Expression): PolyHash =
    copy(child = c)
}
