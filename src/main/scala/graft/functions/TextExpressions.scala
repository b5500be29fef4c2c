package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd text hashing. The HOF formulation
  * (`aggregate(split(s, ""), ...)`) runs the lambda interpreter once per
  * CHARACTER per row — it is the whole cost of fingerprinting/simhashing a
  * corpus. This is one primitive loop, bit-identical to the HOF (and to
  * the DuckDB `list_reduce` replay the oracles use): per code point,
  * `acc = (acc*31 + cp) % FpMod`. */
object TextExpressions {

  /** See [[NormalizeText]]; the whitespace set here is deliberately the
    * exact set the oracle's regex replays. */
  def normalizeText(s: UTF8String): UTF8String = {
    val n = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFC)
    def ws(c: Char): Boolean =
      c == ' ' || (c >= 0x09 && c <= 0x0D) || (c >= 0x1C && c <= 0x1F)
    def dropped(c: Char): Boolean =
      c <= 0x08 || (c >= 0x0E && c <= 0x1B) || c == 0x7F
    val sb = new java.lang.StringBuilder(n.length)
    var pendingSpace = false
    var i = 0
    while (i < n.length) {
      val c = n.charAt(i)
      if (ws(c)) { if (sb.length > 0) pendingSpace = true }
      else if (!dropped(c)) {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Whitespace tokens (split on single space, drop empties) in one native
    * pass — value-identical to `filter(split(text, " "), w => w =!= "")`
    * (Java's limit-0 split drops only TRAILING empties, which the filter
    * drops anyway; interior/leading empties are dropped here explicitly),
    * but without the interpreted per-element lambda or the regex engine.
    * See [[Tokens]]. */
  def tokens(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val raw = s.toString.split(" ")
    var m = 0
    var i = 0
    while (i < raw.length) { if (!raw(i).isEmpty) m += 1; i += 1 }
    val out = new Array[Any](m)
    var k = 0
    i = 0
    while (i < raw.length) {
      if (!raw(i).isEmpty) { out(k) = UTF8String.fromString(raw(i)); k += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

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

  def bpeApply(w: UTF8String, enc: BpeEncoder):
      org.apache.spark.sql.catalyst.util.ArrayData =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      enc.encode(w.toString).map(UTF8String.fromString))

  private lazy val bpePretokenRe =
    java.util.regex.Pattern.compile(Text.BpePattern)
  private lazy val nonWsRe = java.util.regex.Pattern.compile("\\S")

  def bpeEncodeText(text: UTF8String, enc: BpeEncoder):
      org.apache.spark.sql.catalyst.util.ArrayData = {
    val out = Array.newBuilder[UTF8String]
    val m = bpePretokenRe.matcher(text.toString)
    while (m.find()) {
      val tok = m.group()
      if (nonWsRe.matcher(tok).find()) {
        val enc0 = enc.encode(tok)
        var i = 0
        while (i < enc0.length) { out += UTF8String.fromString(enc0(i)); i += 1 }
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.result())
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

/** `normalize_text(s)` — NFC unicode normalization, then one pass that
  * drops non-whitespace ISO control characters (0x00-0x08, 0x0E-0x1B,
  * 0x7F), collapses ASCII-whitespace runs (space, 0x09-0x0D, and the
  * 0x1C-0x1F separators — exactly the set the DuckDB oracle replays; wide
  * unicode spaces pass through untouched) to one space, and trims. The
  * standard pre-tokenization cleanup, fused into one codegen'd call. */
case class NormalizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"
  override protected def nullSafeEval(s: Any): Any =
    TextExpressions.normalizeText(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.TextExpressions.normalizeText($s)")
  override protected def withNewChildInternal(c: Expression): NormalizeText =
    copy(child = c)
}

/** `graft_tokens(s)` — whitespace tokens, codegen'd single pass (see
  * [[TextExpressions.tokens]]). */
case class Tokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"
  override protected def nullSafeEval(s: Any): Any =
    TextExpressions.tokens(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.TextExpressions.tokens($s)")
  override protected def withNewChildInternal(c: Expression): Tokens =
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

/** Stateful, thread-safe BPE word encoder applying a trained merge list
  * ([[Text.bpeTrain]] output) in rank order, greedy left-to-right per rank
  * — exactly the transformation training applied to its vocabulary, so
  * encoding the training corpus reproduces the trained vocab.
  *
  * Implementation is the classic min-rank loop (repeatedly merge the
  * lowest-rank pair present) rather than a literal scan over all R ranks:
  * equivalent because a rule consuming a merged token is always learned
  * AFTER the rule that created it (its rank is strictly greater), so
  * processing the lowest present rank first can never miss an
  * earlier-rank match — and the loop is O(pairs·merges-applied) instead of
  * O(R·len) for the 32k-merge vocabularies real tokenizers carry
  * (PipelineSpec differential-checks it against the naive rank scan).
  *
  * A per-THREAD bounded LRU memo (word → tokens) makes repeated words
  * O(1): Zipf corpora re-encode the same few thousand words billions of
  * times, and the thread-local keeps the map unsynchronized while tasks
  * share the deserialized expression in one executor JVM. */
final class BpeEncoder(val merges: Array[(String, String)]) extends Serializable {
  // the min-rank loop's equivalence to the naive rank scan REQUIRES a
  // training-ordered merge list: every rule's sides must be base characters
  // or products of strictly lower-rank rules. An arbitrary caller-supplied
  // list violating that (e.g. [(ab,c),(a,b)] on "abc") would silently
  // diverge from the documented rank-scan semantics, so refuse it here.
  locally {
    val products = new java.util.HashSet[String]
    def ok(t: String): Boolean =
      (t.nonEmpty && t.length == Character.charCount(t.codePointAt(0))) ||
        products.contains(t)
    for (((l, r), i) <- merges.zipWithIndex) {
      require(ok(l) && ok(r),
        s"BpeEncoder: merge rank $i ($l,$r) references a token that is " +
          "neither a base character nor the product of a lower-rank rule; " +
          "merges must be bpeTrain-ordered")
      products.add(l + r)
    }
  }
  // key is length-prefixed so pairs can't collide (pretokens may contain
  // any character, including the would-be separator)
  private def key(l: String, r: String): String = l.length + ":" + l + r
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    for (((l, r), i) <- merges.zipWithIndex)
      m.putIfAbsent(key(l, r), Int.box(i))
    m
  }
  @transient private lazy val cache:
      ThreadLocal[java.util.LinkedHashMap[String, Array[String]]] =
    ThreadLocal.withInitial(() =>
      new java.util.LinkedHashMap[String, Array[String]](1024, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Array[String]]): Boolean =
          size() > 65536
      })

  /** Code-point split (matches DuckDB `string_split(w, '')`). */
  private def chars(w: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.result()
  }

  def encode(w: String): Array[String] = {
    val c = cache.get()
    val hit = c.get(w)
    if (hit != null) return hit
    var toks = chars(w)
    var done = toks.length < 2 || merges.isEmpty
    while (!done) {
      // lowest-rank adjacent pair present
      var best = Int.MaxValue
      var i = 0
      while (i < toks.length - 1) {
        val r = rank.get(key(toks(i), toks(i + 1)))
        if (r != null && r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (l, r) = merges(best)
        val m = l + r
        val out = Array.newBuilder[String]
        var j = 0
        while (j < toks.length) {
          if (j < toks.length - 1 && toks(j) == l && toks(j + 1) == r) {
            out += m; j += 2 // greedy left-to-right, non-overlapping
          } else { out += toks(j); j += 1 }
        }
        toks = out.result()
        if (toks.length < 2) done = true
      }
    }
    c.put(w, toks)
    toks
  }
}

/** `bpe_encode_text(text)` — the whole tokenizer-application pass fused
  * into ONE codegen'd expression: pretokenize with the GPT-2 split pattern
  * ([[Text.BpePattern]], the same java.util.regex semantics
  * `regexp_extract_all` uses), drop all-whitespace pretokens (the `\S`
  * filter of [[Text.bpeTokens]]), encode each pretoken through the
  * [[BpeEncoder]] memo, emit the flat token stream. The HOF formulation
  * (`flatten(transform(filter(regexp_extract_all(...))))`) keeps the
  * project out of whole-stage codegen and interprets four lambdas per
  * pretoken; this is one matcher and one memo lookup. */
case class BpeEncodeText(child: Expression, encoder: BpeEncoder)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "bpe_encode_text"
  override protected def nullSafeEval(s: Any): Any =
    TextExpressions.bpeEncodeText(s.asInstanceOf[UTF8String], encoder)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncoder", encoder,
      classOf[BpeEncoder].getName)
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.TextExpressions.bpeEncodeText($s, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): BpeEncodeText =
    copy(child = c)
}

/** `bpe_apply(word)` — tokens of one pretoken under the trained merges
  * (the merge table is plan data via a reference object, like
  * [[NearestCells]]' centroid matrix). */
case class BpeApply(child: Expression, encoder: BpeEncoder)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "bpe_apply"
  override protected def nullSafeEval(s: Any): Any =
    TextExpressions.bpeApply(s.asInstanceOf[UTF8String], encoder)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncoder", encoder,
      classOf[BpeEncoder].getName)
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.TextExpressions.bpeApply($s, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): BpeApply =
    copy(child = c)
}
