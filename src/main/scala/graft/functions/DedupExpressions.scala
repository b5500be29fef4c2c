package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native shingling for the dedup hot path.
  *
  * The round-1 posting-list builder ran tokenize → posexplode → window
  * `lead` → distinct: correct, but it paid a shuffle+sort (the window) plus
  * a second shuffle (distinct) just to assemble adjacent-word n-grams that
  * are a purely LOCAL property of each document. This expression emits each
  * document's distinct shingle set in one pass inside whole-stage codegen,
  * so the posting list becomes `select(id, explode(word_shingles(text)))` —
  * a narrow map with ZERO shuffles. At 100 TB that removes the largest
  * all-corpus exchange in the MinHash pipeline (the first groupBy-id for
  * signatures is then the only full shuffle left).
  *
  * Tokenization is bit-compatible with `Text.tokens` (split on single
  * space, drop empties), so `dd_jaccard`/`dd_minhash` DuckDB oracles replay
  * unchanged.
  */
object DedupExpressions {

  /** Distinct word n-gram shingles of `text`, first-occurrence order. */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val raw = text.toString.split(" ") // single-char split: Java fast path
    val words = new Array[String](raw.length)
    var m = 0
    var w = 0
    while (w < raw.length) {
      if (!raw(w).isEmpty) { words(m) = raw(w); m += 1 }
      w += 1
    }
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]((m - n + 1) * 2)
    var i = 0
    while (i + n <= m) {
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

/** `word_shingles(text, n)` — distinct n-gram shingle array, codegen'd. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"
  override protected def nullSafeEval(t: Any): Any =
    DedupExpressions.shingles(t.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DedupExpressions.shingles($c, $n)")
  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}
