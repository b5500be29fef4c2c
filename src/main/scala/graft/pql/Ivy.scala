package graft.pql

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One result cell of an ivy Apply evaluation: a typed scalar positioned at
  * (shard, idx) in the concatenated result vector. kind: 0 = int, 1 = float,
  * 2 = string. */
final case class IvyCell(shard: Long, idx: Long, kind: Int, i: Long, f: Double, s: String)

/** Interpreter for the ivy-language subset the reference's `Apply()` runs
  * (`reference/apply.go:36-46` runs robpike.io/ivy programs; per-shard map at
  * `reference/apply.go:194-257` binds the shard's dataframe columns as
  * vectors and reads the result register `_`; shard results concatenate with
  * ivy `,` and an optional reduce program runs at the coordinator,
  * `reference/apply.go:50-120`).
  *
  * Semantics implemented (the public ivy/APL core the reference exposes):
  * right-to-left evaluation, all binary operators at equal precedence and
  * right-associative; unary operators take the whole expression to their
  * right; index origin 1; comparison/logical results are 0/1 integers;
  * scalar↔vector broadcasting with equal-length elementwise vector ops;
  * reductions `op/` fold right (APL semantics: `-/1 2 3` = 1-(2-3));
  * statements one per line, the last evaluated expression lands in `_`.
  *
  * Deliberate divergence (documented): ivy's exact big-rational arithmetic is
  * approximated with int64 + double — integer division stays exact when it
  * divides evenly and goes to double otherwise.
  */
object Ivy {

  // ------------------------------------------------------------------ values

  sealed trait V
  final case class IN(v: Long) extends V
  final case class FN(v: Double) extends V
  final case class SV(v: String) extends V
  final case class Vec(vs: IndexedSeq[V]) extends V

  final class IvyError(msg: String) extends RuntimeException(msg)
  private def err(msg: String): Nothing = throw new IvyError(msg)

  // --------------------------------------------------------------------- AST

  sealed trait Expr
  private final case class Lit(v: V) extends Expr
  private final case class Ref(name: String) extends Expr
  private final case class VecLit(items: Seq[Expr]) extends Expr
  private final case class Un(op: String, e: Expr) extends Expr
  private final case class Bin(op: String, l: Expr, r: Expr) extends Expr
  private final case class Reduce(op: String, e: Expr) extends Expr
  private final case class Index(e: Expr, idx: Expr) extends Expr
  private final case class Assign(name: String, e: Expr) extends Expr

  private val binOps = Set("+", "-", "*", "/", "**", "mod", "div", "max", "min",
    "==", "!=", "<", "<=", ">", ">=", "and", "or", "xor", ",", "rho", "take", "drop")
  private val unOps = Set("-", "+", "not", "abs", "iota", "rho", "floor", "ceil",
    "sgn", "rev", "sqrt", "log", "exp", "up", "down")

  // ------------------------------------------------------------------ parser

  private final case class Tok(kind: String, text: String) // num, str, id, op

  private def scan(line: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = line.length
    while (i < n) {
      val c = line.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit || (c == '.' && i + 1 < n && line.charAt(i + 1).isDigit)) {
        val j = i
        while (i < n && (line.charAt(i).isDigit || line.charAt(i) == '.')) i += 1
        if (i < n && (line.charAt(i) == 'e' || line.charAt(i) == 'E')) {
          i += 1
          if (i < n && (line.charAt(i) == '+' || line.charAt(i) == '-')) i += 1
          while (i < n && line.charAt(i).isDigit) i += 1
        }
        out += Tok("num", line.substring(j, i))
      } else if (c.isLetter || c == '_') {
        val j = i
        while (i < n && (line.charAt(i).isLetterOrDigit || line.charAt(i) == '_')) i += 1
        out += Tok("id", line.substring(j, i))
      } else if (c == '\'' || c == '"') {
        val q = c; val j = i + 1; i += 1
        while (i < n && line.charAt(i) != q) i += 1
        if (i >= n) err("unterminated string")
        out += Tok("str", line.substring(j, i)); i += 1
      } else {
        val two = if (i + 1 < n) line.substring(i, i + 2) else ""
        if (Set("**", "==", "!=", "<=", ">=").contains(two)) { out += Tok("op", two); i += 2 }
        else if ("+-*/%,()[]=<>".indexOf(c) >= 0) { out += Tok("op", c.toString); i += 1 }
        else err(s"unexpected character '$c'")
      }
    }
    out.result()
  }

  private final class P(toks: Vector[Tok]) {
    private var pos = 0
    private def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    def atEnd: Boolean = pos >= toks.length

    private def isBinOp(t: Tok): Boolean =
      (t.kind == "op" && binOps(t.text)) || (t.kind == "id" && binOps(t.text))
    private def isUnOp(t: Tok): Boolean =
      (t.kind == "op" && unOps(t.text)) || (t.kind == "id" && unOps(t.text))

    def parseStmt(): Expr = {
      // assignment: IDENT = expr (single '=', not '==')
      if (pos + 1 < toks.length && toks(pos).kind == "id" && !binOps(toks(pos).text) &&
        !unOps(toks(pos).text) && toks(pos + 1) == Tok("op", "=")) {
        val name = next().text; next()
        Assign(name, parseExpr())
      } else parseExpr()
    }

    def parseExpr(): Expr = {
      val left = parseUnary()
      peek match {
        case Some(t) if isBinOp(t) =>
          // `op/` here means a reduction applied to the rest — only valid in
          // unary position, so a binop followed by '/' at operand boundary is
          // handled in parseUnary; reaching here the op is genuinely binary.
          next()
          Bin(t.text, left, parseExpr())
        case _ => left
      }
    }

    private def parseUnary(): Expr = peek match {
      case Some(t) if isBinOp(t) && pos + 1 < toks.length && toks(pos + 1) == Tok("op", "/") =>
        next(); next() // op, '/'
        Reduce(t.text, parseExpr())
      case Some(t) if isUnOp(t) && !isOperandStartAfterBinaryUse(t) =>
        next()
        Un(t.text, parseExpr())
      case _ => parseOperand()
    }

    /** `rho` is both unary and binary; in unary position it always applies to
      * the rest. (- and + likewise: at operand start they are unary.) */
    private def isOperandStartAfterBinaryUse(t: Tok): Boolean = false

    private def parseOperand(): Expr = {
      val atoms = Seq.newBuilder[Expr]
      var count = 0
      var continue = true
      while (continue) {
        peek match {
          case Some(Tok("num", s)) => next(); atoms += Lit(num(s)); count += 1
          case Some(Tok("str", s)) => next(); atoms += Lit(SV(s)); count += 1
          case Some(Tok("id", s)) if !binOps(s) && !unOps(s) =>
            next()
            var e: Expr = Ref(s)
            while (peek.contains(Tok("op", "["))) {
              next(); val ix = parseExpr()
              if (!peek.contains(Tok("op", "]"))) err("expected ]")
              next(); e = Index(e, ix)
            }
            atoms += e; count += 1
          case Some(Tok("op", "(")) =>
            next(); val e0 = parseExpr()
            if (!peek.contains(Tok("op", ")"))) err("expected )")
            next()
            var e = e0
            while (peek.contains(Tok("op", "["))) {
              next(); val ix = parseExpr()
              if (!peek.contains(Tok("op", "]"))) err("expected ]")
              next(); e = Index(e, ix)
            }
            atoms += e; count += 1
          case _ => continue = false
        }
        // juxtaposition continues only across literal/ref/paren atoms
      }
      val got = atoms.result()
      got.size match {
        case 0 => err(s"expected operand${peek.map(t => s" at '${t.text}'").getOrElse("")}")
        case 1 => got.head
        case _ => VecLit(got)
      }
    }

    private def num(s: String): V =
      if (s.contains('.') || s.contains('e') || s.contains('E')) FN(s.toDouble)
      else IN(s.toLong)
  }

  /** Parse a program: statements one per line (blank lines skipped). */
  def parse(program: String): Seq[Expr] =
    program.split('\n').map(_.trim).filter(_.nonEmpty).toSeq.map { line =>
      val p = new P(scan(line))
      val e = p.parseStmt()
      if (!p.atEnd) err(s"trailing tokens in '$line'")
      e
    }

  /** Free identifiers of a parsed program (candidates for column binding). */
  def freeIdents(stmts: Seq[Expr]): Set[String] = {
    val bound = collection.mutable.Set[String]()
    val free = collection.mutable.Set[String]()
    def walk(e: Expr): Unit = e match {
      case Ref(n) => if (!bound(n)) free += n
      case VecLit(items) => items.foreach(walk)
      case Un(_, x) => walk(x)
      case Bin(_, l, r) => walk(l); walk(r)
      case Reduce(_, x) => walk(x)
      case Index(x, ix) => walk(x); walk(ix)
      case Assign(n, x) => walk(x); bound += n
      case Lit(_) =>
    }
    stmts.foreach(walk)
    free.toSet
  }

  // ------------------------------------------------------------------- eval

  def run(stmts: Seq[Expr], env0: Map[String, V]): V = {
    val env = collection.mutable.Map[String, V](env0.toSeq: _*)
    stmts.foreach {
      case Assign(n, e) => env(n) = eval(e, env)
      case e            => env("_") = eval(e, env)
    }
    env.getOrElse("_", err("no result: program assigns but never evaluates"))
  }

  private def eval(e: Expr, env: collection.mutable.Map[String, V]): V = e match {
    case Lit(v) => v
    case Ref(n) => env.getOrElse(n, err(s"undefined: $n"))
    case VecLit(items) =>
      Vec(items.flatMap(x => eval(x, env) match {
        case Vec(vs) => vs
        case s       => Seq(s)
      }).toIndexedSeq)
    case Un(op, x) => unary(op, eval(x, env))
    case Bin(op, l, r) => binary(op, eval(l, env), eval(r, env))
    case Reduce(op, x) => reduce(op, eval(x, env))
    case Index(x, ix) => index(eval(x, env), eval(ix, env))
    case Assign(_, _) => err("assignment is a statement, not an expression")
  }

  private def unary(op: String, v: V): V = (op, v) match {
    case (_, Vec(vs)) if !Set("iota", "rho", "rev", "up", "down")(op) =>
      Vec(vs.map(unary(op, _)))
    case ("-", IN(a)) => IN(-a)
    case ("-", FN(a)) => FN(-a)
    case ("+", x) => x
    case ("not", IN(a)) => IN(if (a == 0) 1 else 0)
    case ("not", FN(a)) => IN(if (a == 0) 1 else 0)
    case ("abs", IN(a)) => IN(math.abs(a))
    case ("abs", FN(a)) => FN(math.abs(a))
    case ("floor", IN(a)) => IN(a)
    case ("floor", FN(a)) => IN(math.floor(a).toLong)
    case ("ceil", IN(a)) => IN(a)
    case ("ceil", FN(a)) => IN(math.ceil(a).toLong)
    case ("sgn", IN(a)) => IN(java.lang.Long.signum(a).toLong)
    case ("sgn", FN(a)) => IN(math.signum(a).toLong)
    case ("iota", IN(n)) =>
      if (n < 0 || n > 50000000L) err(s"iota $n out of range")
      Vec((1L to n).map(IN(_)).toIndexedSeq) // origin 1 (apply.go getDefaultConfig)
    case ("rho", Vec(vs)) => IN(vs.length.toLong)
    case ("rho", _) => Vec(IndexedSeq.empty) // scalar has empty shape
    case ("rev", Vec(vs)) => Vec(vs.reverse)
    case ("rev", s) => s
    case ("sqrt", x) =>
      val d = toD(x); if (d < 0) err("sqrt of negative") else FN(math.sqrt(d))
    case ("log", x) =>
      val d = toD(x); if (d <= 0) err("log of non-positive") else FN(math.log(d))
    case ("exp", x) => FN(math.exp(toD(x)))
    // grade up/down: origin-1 index permutation that sorts the vector
    // (stable — ties keep original order), the APL `x[up x]` sort idiom
    case ("up", Vec(vs)) =>
      Vec(vs.zipWithIndex.sortBy { case (x, i) => (sortKey(x), i) }
        .map { case (_, i) => IN(i + 1L) })
    case ("down", Vec(vs)) =>
      Vec(vs.zipWithIndex.sortBy { case (x, i) => (-sortKey(x), i) }
        .map { case (_, i) => IN(i + 1L) })
    case ("up", s) => IN(1)
    case ("down", s) => IN(1)
    case _ => err(s"unary $op undefined on ${tn(v)}")
  }

  private def binary(op: String, l: V, r: V): V = (op, l, r) match {
    case (",", _, _) =>
      def items(v: V): IndexedSeq[V] = v match { case Vec(vs) => vs; case s => IndexedSeq(s) }
      Vec(items(l) ++ items(r))
    case ("rho", IN(n), x) => // n rho x: cycle x to length n
      val src = x match { case Vec(vs) => vs; case s => IndexedSeq(s) }
      if (src.isEmpty) err("rho of empty")
      if (n < 0 || n > 50000000L) err(s"rho $n out of range")
      Vec((0L until n).map(i => src((i % src.length).toInt)).toIndexedSeq)
    case ("take", IN(n), Vec(vs)) =>
      if (n >= 0) Vec(vs.take(n.toInt)) else Vec(vs.takeRight((-n).toInt))
    case ("drop", IN(n), Vec(vs)) =>
      if (n >= 0) Vec(vs.drop(n.toInt)) else Vec(vs.dropRight((-n).toInt))
    case (_, Vec(ls), Vec(rs)) =>
      if (ls.length != rs.length) err(s"length mismatch ${ls.length} vs ${rs.length}")
      Vec(ls.lazyZip(rs).map((a, b) => binary(op, a, b)).toIndexedSeq)
    case (_, Vec(ls), s) => Vec(ls.map(binary(op, _, s)))
    case (_, s, Vec(rs)) => Vec(rs.map(binary(op, s, _)))
    case _ => scalarBin(op, l, r)
  }

  private def tn(v: V): String = v match {
    case IN(_) => "int"; case FN(_) => "float"; case SV(_) => "string"; case Vec(_) => "vector"
  }

  private def scalarBin(op: String, l: V, r: V): V = (l, r) match {
    case (SV(a), SV(b)) => op match {
      case "==" => IN(if (a == b) 1 else 0)
      case "!=" => IN(if (a != b) 1 else 0)
      case "+"  => SV(a + b)
      case "<"  => IN(if (a < b) 1 else 0)
      case "<=" => IN(if (a <= b) 1 else 0)
      case ">"  => IN(if (a > b) 1 else 0)
      case ">=" => IN(if (a >= b) 1 else 0)
      case "max" => SV(if (a >= b) a else b)
      case "min" => SV(if (a <= b) a else b)
      case _ => err(s"$op undefined on strings")
    }
    case (SV(_), _) | (_, SV(_)) => err(s"$op: mixed string/number")
    case (IN(a), IN(b)) => op match {
      case "+" => IN(Math.addExact(a, b))
      case "-" => IN(Math.subtractExact(a, b))
      case "*" => IN(Math.multiplyExact(a, b))
      case "/" => // exact when divisible (ivy rationals), else double
        if (b == 0) err("division by zero")
        else if (a % b == 0) IN(a / b) else FN(a.toDouble / b)
      case "div" => if (b == 0) err("division by zero") else IN(Math.floorDiv(a, b))
      case "mod" => if (b == 0) err("division by zero") else IN(Math.floorMod(a, b))
      case "**" =>
        // Squaring, not an O(b) loop: `1 ** 999999999999` must not spin a
        // core. |base|<=1 fast-paths (the only bases where a huge exponent
        // doesn't overflow anyway); any other base overflows multiplyExact
        // within 63 steps, bounding the loop.
        if (b >= 0) {
          if (a == 0L) IN(if (b == 0) 1L else 0L)
          else if (a == 1L) IN(1L)
          else if (a == -1L) IN(if ((b & 1L) == 0L) 1L else -1L)
          else {
            var acc = 1L; var base = a; var e = b
            while (e > 0) {
              if ((e & 1L) == 1L) acc = Math.multiplyExact(acc, base)
              e >>= 1
              if (e > 0) base = Math.multiplyExact(base, base)
            }
            IN(acc)
          }
        } else FN(math.pow(a.toDouble, b.toDouble))
      case "max" => IN(math.max(a, b))
      case "min" => IN(math.min(a, b))
      case "==" => IN(if (a == b) 1 else 0)
      case "!=" => IN(if (a != b) 1 else 0)
      case "<" => IN(if (a < b) 1 else 0)
      case "<=" => IN(if (a <= b) 1 else 0)
      case ">" => IN(if (a > b) 1 else 0)
      case ">=" => IN(if (a >= b) 1 else 0)
      case "and" => IN(if (a != 0 && b != 0) 1 else 0)
      case "or" => IN(if (a != 0 || b != 0) 1 else 0)
      case "xor" => IN(if ((a != 0) != (b != 0)) 1 else 0)
      case _ => err(s"unknown operator $op")
    }
    case _ =>
      val (a, b) = (toD(l), toD(r))
      op match {
        case "+" => FN(a + b)
        case "-" => FN(a - b)
        case "*" => FN(a * b)
        case "/" => if (b == 0) err("division by zero") else FN(a / b)
        case "div" => if (b == 0) err("division by zero") else IN(math.floor(a / b).toLong)
        case "mod" => if (b == 0) err("division by zero") else FN(a - b * math.floor(a / b))
        case "**" => FN(math.pow(a, b))
        case "max" => FN(math.max(a, b))
        case "min" => FN(math.min(a, b))
        case "==" => IN(if (a == b) 1 else 0)
        case "!=" => IN(if (a != b) 1 else 0)
        case "<" => IN(if (a < b) 1 else 0)
        case "<=" => IN(if (a <= b) 1 else 0)
        case ">" => IN(if (a > b) 1 else 0)
        case ">=" => IN(if (a >= b) 1 else 0)
        case "and" => IN(if (a != 0 && b != 0) 1 else 0)
        case "or" => IN(if (a != 0 || b != 0) 1 else 0)
        case "xor" => IN(if ((a != 0) != (b != 0)) 1 else 0)
        case _ => err(s"unknown operator $op")
      }
  }

  private def toD(v: V): Double = v match {
    case IN(a) => a.toDouble; case FN(a) => a; case _ => err("number expected")
  }

  private def sortKey(v: V): Double = v match {
    case IN(a) => a.toDouble; case FN(a) => a
    case _ => err("grade of non-numeric vector")
  }

  /** APL right-fold reduction: op/x1 x2 x3 = x1 op (x2 op x3). */
  def reduce(op: String, v: V): V = v match {
    case Vec(vs) =>
      if (vs.isEmpty) op match {
        case "+" | "-" | "or" | "xor" => IN(0)
        case "*" | "and" => IN(1)
        case _ => err(s"$op/ of empty vector")
      }
      else vs.reduceRight((a, b) => binary(op, a, b))
    case s => s // reduce of scalar is the scalar (APL)
  }

  private def index(v: V, ix: V): V = (v, ix) match {
    case (Vec(vs), IN(i)) =>
      if (i < 1 || i > vs.length) err(s"index $i out of range [1,${vs.length}]")
      vs((i - 1).toInt) // origin 1
    case (Vec(vs), Vec(is)) => Vec(is.map(i => index(Vec(vs), i)))
    case _ => err("indexing requires a vector and integer indices")
  }

  // --------------------------------------------------- Spark execution path

  private val ShardWidth: Long = 1L << 20

  private val reducePeephole = "^\\s*(\\+|\\*|max|min|and|or|,)\\s*/\\s*_\\s*$".r

  /** True when the program parses as ivy AND every free identifier resolves
    * to a column of `schema` (or the `_ID` alias) — the eligibility gate for
    * the real-ivy path; anything else falls back to the documented
    * Spark-SQL-projection mode. */
  def eligible(program: String, schema: StructType): Boolean =
    try {
      val stmts = parse(program)
      val cols = schema.fieldNames.toSet + "_ID"
      freeIdents(stmts).forall(cols)
    } catch { case _: IvyError | _: NumberFormatException => false }

  /** Execute an ivy Apply: the program runs once per shard (records grouped
    * by `_id / 2^20`, rows in `_id` order — `reference/apply.go:194-257`),
    * shard result vectors concatenate in shard order, and the reduce program
    * runs over the concatenation with `_` bound
    * (`reference/apply.go:50-120`; default reduce is `_`).
    *
    * Scale shape: the per-shard map is embarrassingly parallel
    * (flatMapSortedGroups — one shuffle by shard, ≤2^20 rows per group, same
    * bound as the reference's per-shard Arrow table). Identity reduce stays
    * fully distributed; associative `op/_` reduces shard-side and combines
    * O(shards) scalars at the driver; only a general reduce program
    * materializes the concatenation at the driver — exactly the reference's
    * coordinator-reduce cost. */
  def applyIvy(base: DataFrame, program: String, reduceProg: Option[String]): DataFrame = {
    val spark = base.sparkSession
    val schema = base.schema
    val nCols = schema.length
    val idIdx = schema.fieldIndex("_id")
    require(schema(idIdx).dataType == LongType, "Apply(ivy): integer record ids required")
    val stmts = parse(program)
    val reduceCode = reduceProg.map(_.trim).filterNot(_.isEmpty).getOrElse("_")
    // validate the reduce program's parse + idents up front (fail fast like
    // the reference's ivy error propagation, before running the map jobs)
    val reduceStmts = parse(reduceCode)
    val badIdents = freeIdents(reduceStmts) - "_"
    if (badIdents.nonEmpty) err(s"reduce: undefined: ${badIdents.mkString(", ")}")
    val partialOp: Option[String] = reduceCode match {
      case reducePeephole(op) => Some(op)
      case _ if reduceCode == "_" => None
      case _ => None
    }
    val generalReduce = reduceCode != "_" && partialOp.isEmpty

    val fieldMeta: Array[(String, DataType)] =
      schema.fields.map(f => (f.name, f.dataType))

    implicit val cellEnc = Encoders.product[IvyCell]
    implicit val longEnc = Encoders.scalaLong

    val cells = base
      .groupByKey((r: Row) => r.getLong(idIdx) / ShardWidth)
      .flatMapSortedGroups(col("_id")) { (shard: Long, rows: Iterator[Row]) =>
        // gather columns as ivy vectors (the per-shard Arrow table stand-in)
        val buf = Array.fill(nCols)(IndexedSeq.newBuilder[V])
        rows.foreach { r =>
          var c = 0
          while (c < nCols) {
            buf(c) += toIvy(r, c, fieldMeta(c)._2)
            c += 1
          }
        }
        val env = Map.newBuilder[String, V]
        var c = 0
        var idVec: V = Vec(IndexedSeq.empty)
        while (c < nCols) {
          val vec = Vec(buf(c).result())
          env += fieldMeta(c)._1 -> vec
          if (c == idIdx) idVec = vec
          c += 1
        }
        env += "_ID" -> idVec
        val out = run(stmts, env.result())
        val items = out match { case Vec(vs) => vs; case s => IndexedSeq(s) }
        val reduced = partialOp match {
          case Some(op) if items.nonEmpty => // shard-side partial (associative)
            reduce(op, Vec(items)) match { case Vec(vs) => vs; case s => IndexedSeq(s) }
          case Some(_) => IndexedSeq.empty[V]
          case None => items
        }
        reduced.iterator.zipWithIndex.map { case (v, i) => toCell(shard, i.toLong, v) }
      }

    if (generalReduce) {
      // coordinator reduce, same as the reference (`apply.go:100-115`) —
      // which also concatenates every shard's result on one node. That
      // parity shape is driver-bounded BY CONSTRUCTION only for queries
      // whose per-shard output is small; guard the collect with an explicit
      // row bound so a corpus-sized general reduce fails with an error that
      // names the associative path (which combines shard-side and stays
      // distributed) instead of an opaque driver OOM.
      val bound = math.min(Int.MaxValue - 1L,
        spark.conf.getOption("graft.ivy.maxReduceRows")
          .map(_.toLong).getOrElse(10000000L)).toInt
      // limit(bound+1) makes the probe part of the one collect (no extra
      // count job); one row past the bound proves the overflow
      val all = cells.orderBy("shard", "idx").limit(bound + 1).collect()
      require(all.length <= bound,
        s"ivy general reduce would collect more than $bound rows to the " +
          "coordinator (conf graft.ivy.maxReduceRows); use an associative " +
          "reduce ('+/_', 'min/_', ...) which combines shard-side, or " +
          "raise the bound")
      val vec = Vec(all.map(fromCell).toIndexedSeq)
      val res = run(reduceStmts, Map("_" -> vec))
      vecToDf(spark, res)
    } else if (partialOp.isDefined) {
      val partials = cells.orderBy("shard", "idx").collect().map(fromCell)
      if (partials.isEmpty) vecToDf(spark, Vec(IndexedSeq.empty))
      else vecToDf(spark, partials.toIndexedSeq.reduceRight((a, b) => binary(partialOp.get, a, b)))
    } else {
      // identity reduce: stay distributed. Global result positions come from
      // per-shard counts (O(shards) driver state, broadcast back) — NOT a
      // global row_number window, which would funnel the whole result
      // through one partition. One pass also reads the max kind for the
      // output column type. Materialize.stable (not persist): persist pins
      // blocks in persistentRdds until an explicit unpersist that no caller
      // here could issue, so a long-lived server accumulated one cached
      // cells copy per Apply query; checkpoint blocks are freed by
      // ContextCleaner once the returned DataFrame is dropped — and stable
      // additionally survives executor loss (replicated / reliable tiers).
      val persisted = graft.core.Materialize.stable(cells.toDF(),
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val stats = persisted.groupBy("shard")
        .agg(count(lit(1)).as("n"), max(col("kind")).as("k"))
        .collect().sortBy(_.getLong(0))
      val kmax = if (stats.isEmpty) 0 else stats.map(_.getInt(2)).max
      var acc = 0L
      val offRows = stats.map { r =>
        val o = acc; acc += r.getLong(1); Row(r.getLong(0), o)
      }
      val offDf = spark.createDataFrame(
        java.util.Arrays.asList(offRows: _*),
        StructType(Seq(StructField("shard", LongType), StructField("off", LongType))))
      val valueCol = kmax match {
        case 2 => when(col("kind") === 2, col("s"))
          .when(col("kind") === 1, col("f").cast(StringType))
          .otherwise(col("i").cast(StringType))
        case 1 => when(col("kind") === 1, col("f")).otherwise(col("i").cast(DoubleType))
        case _ => col("i")
      }
      persisted.join(broadcast(offDf), "shard")
        .select((col("off") + col("idx") + 1L).as("idx"), valueCol.as("value"))
        .orderBy("idx")
    }
  }

  private def toIvy(r: Row, c: Int, dt: DataType): V =
    if (r.isNullAt(c)) dt match { // arrow sidecar has no nulls; unset = zero value
      case StringType => SV("")
      case DoubleType | FloatType | _: DecimalType => FN(0.0)
      case _ => IN(0L)
    } else dt match {
      case LongType => IN(r.getLong(c))
      case IntegerType => IN(r.getInt(c).toLong)
      case ShortType => IN(r.getShort(c).toLong)
      case DoubleType => FN(r.getDouble(c))
      case FloatType => FN(r.getFloat(c).toDouble)
      case StringType => SV(r.getString(c))
      case BooleanType => IN(if (r.getBoolean(c)) 1L else 0L)
      case _: DecimalType => FN(r.getDecimal(c).doubleValue())
      case TimestampType => IN(java.time.Instant.from(
        r.get(c) match {
          case i: java.time.Instant => i
          case t: java.sql.Timestamp => t.toInstant
        }).getEpochSecond)
      case other => err(s"Apply(ivy): unsupported column type $other")
    }

  private def toCell(shard: Long, idx: Long, v: V): IvyCell = v match {
    case IN(a) => IvyCell(shard, idx, 0, a, 0.0, null)
    case FN(a) => IvyCell(shard, idx, 1, 0L, a, null)
    case SV(s) => IvyCell(shard, idx, 2, 0L, 0.0, s)
    case Vec(_) => err("nested vector result unsupported")
  }

  private def fromCell(c: IvyCell): V = c.kind match {
    case 0 => IN(c.i); case 1 => FN(c.f); case _ => SV(c.s)
  }

  private def vecToDf(spark: SparkSession, v: V): DataFrame = {
    val items = v match { case Vec(vs) => vs; case s => IndexedSeq(s) }
    val kinds = items.map { case IN(_) => 0; case FN(_) => 1; case SV(_) => 2; case Vec(_) => err("nested vector") }
    val kmax = if (kinds.isEmpty) 0 else kinds.max
    import scala.jdk.CollectionConverters._
    kmax match {
      case 2 =>
        val rows = items.zipWithIndex.map { case (x, i) => Row((i + 1).toLong, x match {
          case SV(s) => s; case IN(a) => a.toString; case FN(f) => f.toString; case _ => null
        }) }
        spark.createDataFrame(rows.asJava, StructType(Seq(
          StructField("idx", LongType), StructField("value", StringType))))
      case 1 =>
        val rows = items.zipWithIndex.map { case (x, i) => Row((i + 1).toLong, toD(x)) }
        spark.createDataFrame(rows.asJava, StructType(Seq(
          StructField("idx", LongType), StructField("value", DoubleType))))
      case _ =>
        val rows = items.zipWithIndex.map { case (x, i) => Row((i + 1).toLong, x match {
          case IN(a) => a; case _ => 0L
        }) }
        spark.createDataFrame(rows.asJava, StructType(Seq(
          StructField("idx", LongType), StructField("value", LongType))))
    }
  }
}
