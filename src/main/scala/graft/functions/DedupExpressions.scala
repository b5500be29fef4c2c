package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.ImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
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

  /** n-token gram hashes with 1-based start positions (see [[GramHashes]]):
    * per start i, the 48-bit poly hash of tokens i..i+n-1 joined by the US
    * separator (code point 31) — bit-identical to
    * `polyHash(concat_ws("", slice(ts, i, n)), FpMod)` but each
    * token's UTF-8 decodes to code points ONCE per document (not once per
    * covering gram), and no per-gram slice array / joined string / lambda
    * interpreter frame is allocated. Null tokens are skipped exactly as
    * concat_ws skips them (no separator contribution). */
  def gramHashes(ts: ArrayData, n: Int, mod: Long): ArrayData = {
    val m = ts.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    // decode every token once; null tokens decode to null (skipped below)
    val cps = new Array[Array[Int]](m)
    var i = 0
    while (i < m) {
      if (!ts.isNullAt(i)) {
        val s = ts.getUTF8String(i).toString
        val arr = new Array[Int](s.codePointCount(0, s.length))
        var k = 0
        var j = 0
        while (j < s.length) {
          val cp = s.codePointAt(j)
          arr(k) = cp; k += 1
          j += Character.charCount(cp)
        }
        cps(i) = arr
      }
      i += 1
    }
    val cnt = m - n + 1
    val out = new Array[Any](cnt)
    var st = 0
    while (st < cnt) {
      var acc = 0L
      var first = true
      var t = 0
      while (t < n) {
        val a = cps(st + t)
        if (a != null) { // concat_ws skips nulls AND their separator
          if (!first) acc = (acc * 31 + 31) % mod // '' is cp 31
          first = false
          var j = 0
          while (j < a.length) { acc = (acc * 31 + a(j)) % mod; j += 1 }
        }
        t += 1
      }
      out(st) = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](st + 1, acc))
      st += 1
    }
    new GenericArrayData(out)
  }

  /** Packed band bucket keys of a k-long signature (see [[BandKeys]]). */
  def bandKeys(sig: ArrayData, bands: Int, rows: Int): ArrayData = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0x9e3779b97f4a7c15L
      var r = 0
      while (r < rows) {
        h = (h ^ sig.getLong(b * rows + r)) * 0xbf58476d1ce4e5b9L
        h ^= (h >>> 27)
        r += 1
      }
      h *= 0x94d049bb133111ebL
      h ^= (h >>> 31)
      out(b) = (b.toLong << 32) | (h & 0xffffffffL)
      b += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** Space-joined tokens whose 1-based positions are absent from the
    * sorted `cov` int array — one forward merge of two sorted sequences
    * (see [[RemoveCovered]]). */
  def removeCovered(ts: ArrayData, cov: ArrayData): UTF8String = {
    val n = ts.numElements()
    val m = cov.numElements()
    val kept = new java.util.ArrayList[UTF8String](n)
    var i = 0
    var j = 0
    while (i < n) {
      val pos = i + 1
      while (j < m && cov.getInt(j) < pos) j += 1
      if (!(j < m && cov.getInt(j) == pos)) kept.add(ts.getUTF8String(i))
      i += 1
    }
    UTF8String.concatWs(UTF8String.fromString(" "),
      kept.toArray(new Array[UTF8String](kept.size())): _*)
  }
}

/** `band_keys(sig)` — the LSH band bucket keys of a packed signature
  * array, one 8-byte key per band: band index in the high 32 bits, a mixed
  * hash of the band's signature rows in the low 32. One primitive loop
  * over the array — the unpacked formulation (130-column projection + 64
  * inline hash expressions) generated a method past the JIT's limits and
  * ran ~4× slower at 32M output rows. The mixer is free to be anything
  * uniform: no oracle replays band hashes (dd_minhash verifies exactly;
  * only collision STRUCTURE matters, and two docs collide in a band iff
  * their band rows are identical, mixer-independent). */
case class BandKeys(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression {
  require(bands >= 1 && rows >= 1, s"bad banding: $bands x $rows")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_keys"
  override protected def nullSafeEval(s: Any): Any =
    DedupExpressions.bandKeys(s.asInstanceOf[ArrayData], bands, rows)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.DedupExpressions.bandKeys($s, $bands, $rows)")
  override protected def withNewChildInternal(c: Expression): BandKeys =
    copy(child = c)
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

/** `gram_hashes(tokens)` — array<struct<pos:int, gh:bigint>> of n-token
  * gram hashes, codegen'd. The HOF formulation (`transform(sequence(...),
  * i => struct(i, poly_hash(concat_ws(slice(ts, i, n)))))`) allocates a
  * slice array + a joined string per gram and runs the lambda interpreter
  * per gram; this is one primitive pass per document with each token
  * decoded once (see [[DedupExpressions.gramHashes]]). */
case class GramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"gram width must be >= 1, got $n")
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("gh", LongType,
        nullable = false))),
    containsNull = false)
  override def prettyName: String = "gram_hashes"
  override protected def nullSafeEval(ts: Any): Any =
    DedupExpressions.gramHashes(ts.asInstanceOf[ArrayData], n, Text.FpMod)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DedupExpressions.gramHashes($c, $n, ${Text.FpMod}L)")
  override protected def withNewChildInternal(c: Expression): GramHashes =
    copy(child = c)
}

/** `remove_covered(tokens, cov)` — rebuild a document from the tokens whose
  * 1-based positions are NOT in the sorted covered-position array, joined by
  * single spaces. One merge-scan of two sorted sequences, O(tokens +
  * covered): the HOF formulation (`filter` + `array_contains`) re-scans the
  * covered array per token — O(tokens × covered) per document, ~10^10
  * comparisons on one core for a fully-duplicated 100k-token doc — and no
  * higher-order fold can express the linear merge without per-step array
  * copies. */
case class RemoveCovered(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "remove_covered"
  override protected def nullSafeEval(ts: Any, cov: Any): Any =
    DedupExpressions.removeCovered(
      ts.asInstanceOf[ArrayData], cov.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DedupExpressions.removeCovered($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): RemoveCovered = copy(left = l, right = r)
}

/** `simhash_agg(h)` — the [[Dedup.SimHashBits]]-bit SimHash as ONE
  * imperative aggregate: per token hash, each bit position votes ±1 into
  * `bits` int slots; eval assembles the majority bits into the final
  * long directly. The declarative form (48 separate `sum(CASE ...)`
  * aggregates + a 48-term assembly expression) is the same
  * wide-generated-method shape that hurt the minhash signature aggregate.
  *
  * Fixed-width [[ImperativeAggregate]] (not TypedImperative): the vote
  * counters live as `bits` int fields INSIDE the operator's UnsafeRow
  * aggregation buffer — see [[MinHashSigAgg]] for why (HashAggregateExec's
  * paged map instead of per-group heap objects). */
case class SimHashAgg(child: Expression, bits: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends ImperativeAggregate with UnaryLike[Expression] {
  require(bits >= 1 && bits <= 63, s"bad simhash width: $bits")

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    (0 until bits).map(b => AttributeReference(s"v$b", IntegerType,
      nullable = false)())
  override lazy val inputAggBufferAttributes: Seq[AttributeReference] =
    aggBufferAttributes.map(_.newInstance())
  override def aggBufferSchema: StructType =
    StructType((0 until bits).map(b =>
      StructField(s"v$b", IntegerType, nullable = false)))

  override def initialize(buf: InternalRow): Unit = {
    var b = 0
    while (b < bits) { buf.setInt(mutableAggBufferOffset + b, 0); b += 1 }
  }
  override def update(buf: InternalRow, row: InternalRow): Unit = {
    val v = child.eval(row)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val off = mutableAggBufferOffset
      var b = 0
      while (b < bits) {
        buf.setInt(off + b,
          buf.getInt(off + b) + (if (((h >> b) & 1L) == 1L) 1 else -1))
        b += 1
      }
    }
  }
  override def merge(buf: InternalRow, in: InternalRow): Unit = {
    val off = mutableAggBufferOffset
    val inOff = inputAggBufferOffset
    var b = 0
    while (b < bits) {
      buf.setInt(off + b, buf.getInt(off + b) + in.getInt(inOff + b))
      b += 1
    }
  }
  override def eval(buf: InternalRow): Any = {
    var out = 0L
    var b = 0
    while (b < bits) {
      if (buf.getInt(mutableAggBufferOffset + b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_agg"
  override def withNewMutableAggBufferOffset(offset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SimHashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): SimHashAgg =
    copy(child = c)
}

/** `minhash_sig(h, k)` — the k-minima MinHash signature as ONE imperative
  * aggregate over k long slots, replacing k separate declarative
  * `min(...)` aggregates.
  *
  * Why imperative here when the engine otherwise prefers codegen'd
  * declarative aggregates: k=128 min-aggregates generate 128 independent
  * update expressions — a generated method so large the JIT never
  * optimizes it well (and past the codegen field guard it silently falls
  * back to interpreted evaluation, measured 1.7× worse). The entire hash
  * family is instead one tight primitive loop — no boxing inside the
  * loop, no per-field codegen — with a merge that is an elementwise min,
  * so map-side partial aggregation still bounds the shuffle at one row of
  * (id, k longs) per document.
  *
  * Why a fixed-width [[ImperativeAggregate]] and not TypedImperative (the
  * r15 shape): a TypedImperativeAggregate plans as ObjectHashAggregate
  * whose map holds one HEAP OBJECT per group — at the 5M-doc rehearsal
  * that is 5M long[128] buffers (~5 GB of ~1 KB objects) surviving into
  * the old generation per aggregation pass, plus a 1 KB byte[] per group
  * to serialize partial buffers into the exchange. The driver's r15 runs
  * recorded up to ~1260 s of aggregate executor GC on this block. With
  * the buffer declared as k LongType fields, the planner picks
  * HashAggregateExec and the k minima live INSIDE the operator's paged
  * UnsafeRow map (zero per-group objects, partial rows ARE the buffer —
  * no serialize step, spill goes through the Unsafe external sorter).
  * Update/merge math is unchanged, so signatures stay bit-identical and
  * the DuckDB oracle replays unchanged.
  *
  * Input must already be reduced mod P (non-negative); parameters come from
  * the same splitmix64 family as [[Dedup.hashParams]].
  */
case class MinHashSigAgg(child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends ImperativeAggregate with UnaryLike[Expression] {
  require(k >= 1, s"signature width must be >= 1, got $k")

  private val P = 2147483647L // 2^31 - 1, matches Dedup.P
  @transient private lazy val (pa, pb) = {
    val ps = Dedup.hashParams(k)
    (ps.map(_._1).toArray, ps.map(_._2).toArray)
  }

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    (0 until k).map(i => AttributeReference(s"m$i", LongType,
      nullable = false)())
  override lazy val inputAggBufferAttributes: Seq[AttributeReference] =
    aggBufferAttributes.map(_.newInstance())
  override def aggBufferSchema: StructType =
    StructType((0 until k).map(i =>
      StructField(s"m$i", LongType, nullable = false)))

  override def initialize(buf: InternalRow): Unit = {
    var i = 0
    while (i < k) { buf.setLong(mutableAggBufferOffset + i, P); i += 1 }
  }
  override def update(buf: InternalRow, row: InternalRow): Unit = {
    val v = child.eval(row)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val a = pa; val b = pb
      val off = mutableAggBufferOffset
      var i = 0
      while (i < k) {
        val m = (h * a(i) + b(i)) % P
        if (m < buf.getLong(off + i)) buf.setLong(off + i, m)
        i += 1
      }
    }
  }
  override def merge(buf: InternalRow, in: InternalRow): Unit = {
    val off = mutableAggBufferOffset
    val inOff = inputAggBufferOffset
    var i = 0
    while (i < k) {
      val y = in.getLong(inOff + i)
      if (y < buf.getLong(off + i)) buf.setLong(off + i, y)
      i += 1
    }
  }
  override def eval(buf: InternalRow): Any = {
    // unboxed result array — one per document in the signature hot path
    val out = new Array[Long](k)
    var i = 0
    while (i < k) { out(i) = buf.getLong(mutableAggBufferOffset + i); i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_sig"
  override def withNewMutableAggBufferOffset(offset: Int): MinHashSigAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashSigAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): MinHashSigAgg =
    copy(child = c)
}
