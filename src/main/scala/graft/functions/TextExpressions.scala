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
