package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedAttribute, UnresolvedFunction, UnresolvedHaving, UnresolvedRelation, UnresolvedStar, UnresolvedSubqueryColumnAliases}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reference's expression type checker, run on Spark's *unresolved* parse
  * tree before analysis (`reference/sql3/planner/expressionanalyzer.go:397-770`
  * `analyzeBinaryExpression`/`analyzeUnaryExpression`/`analyzeRangeExpression`,
  * type matrices `expressiontypes.go:117-851`).
  *
  * Spark itself would happily coerce most of what the reference rejects
  * (int = string, bool + 1, …), so type parity has to be checked up front; it
  * also produces the reference's exact error wording (`reference/sql3/
  * errors.go:345-430`), which the golden corpus (sql3/test/defs — 900+
  * expected-error cases) asserts verbatim.
  *
  * The checker is deliberately fail-open: any type it cannot resolve
  * (functions it doesn't know, subqueries, complex shapes) becomes `None` and
  * exempts the surrounding checks — Spark's analyzer remains the backstop.
  * Only [[TypeCheck.RefError]] escapes; machinery errors are swallowed.
  */
object TypeCheck {

  /** Reference expression type (`reference/sql3/parser/astdatatype.go:10-26`).
    * DECIMAL carries only a scale. */
  final case class RT(base: String, scale: Int = 0) {
    def desc: String = if (base == "decimal") s"decimal($scale)" else base
  }
  private val TId = RT("id"); private val TInt = RT("int")
  private val TBool = RT("bool"); private val TStr = RT("string")
  private val TTs = RT("timestamp"); private val TIdSet = RT("idset")
  private val TStrSet = RT("stringset")

  final class RefError(msg: String) extends RuntimeException(msg)
  private def fail(msg: String): Nothing = throw new RefError(msg)

  /** Reference errors carry `[line:col]` positions (1-based col —
    * `sql3/errors.go` templates); evaluation-time errors print `[0:0]`. */
  private def failAt(e: Expression, msg: String): Nothing =
    (e.origin.line, e.origin.startPosition) match {
      case (Some(l), Some(c)) => fail(s"[$l:${c + 1}] $msg")
      case _                  => fail(msg)
    }
  private def failAtEnd(e: Expression, msg: String): Nothing =
    (e.origin.line, e.origin.stopIndex) match {
      case (Some(l), Some(c)) => fail(s"[$l:${c + 1}] $msg")
      case _                  => fail(msg)
    }
  private def failEval(msg: String): Nothing = fail(s"[0:0] $msg")

  /** First source character of an expression (distinguishes `!x` from
    * `NOT x`, both of which parse to Not). */
  private def srcChar(e: Expression): Option[Char] =
    for (t <- e.origin.sqlText; i <- e.origin.startIndex if i < t.length)
      yield t.charAt(i)

  // ------------------------------------------------- matrices (expressiontypes.go)
  private val logicalOk    = Set("id", "int", "bool") // :117
  private val equalityOk   = Set("id", "int", "decimal", "bool", "string", "timestamp", "idset", "stringset") // :127
  private val comparisonOk = Set("id", "int", "decimal", "timestamp") // :140
  private val bitwiseOk    = Set("id", "int") // :229
  private val rangeOk      = Set("id", "int", "timestamp", "decimal") // :373
  private def arithmeticOk(t: RT, op: String): Boolean = t.base match { // :150
    case "id" | "int" => true
    case "decimal"    => op != "%"
    case _            => false
  }
  private val numeric = Set("id", "int", "decimal")
  private def comparable(l: RT, r: RT): Boolean = // typesAreComparable :560
    (numeric(l.base) && numeric(r.base)) ||
      (l.base == r.base && Set("bool", "timestamp", "idset", "string", "stringset")(l.base))

  /** typesCanBeCast (`expressiontypes.go:781-851`). */
  private def castOk(src: RT, tgt: RT): Boolean = src.base match {
    case "int"       => Set("int", "bool", "decimal", "id", "string", "timestamp")(tgt.base)
    case "bool"      => Set("bool", "int", "string")(tgt.base)
    case "decimal"   => (tgt.base == "decimal" && tgt.scale >= src.scale) || tgt.base == "string"
    case "id"        => Set("int", "bool", "decimal", "id", "string")(tgt.base)
    case "idset"     => Set("idset", "string")(tgt.base)
    case "string"    => Set("int", "bool", "decimal", "id", "string", "timestamp")(tgt.base)
    case "stringset" => Set("stringset", "string")(tgt.base)
    case "timestamp" => Set("int", "timestamp", "string")(tgt.base)
    case _           => false
  }

  /** typesCoercedForArithmeticOperator (`expressiontypes.go:632`) — note the
    * asymmetry: decimal⊕id coerces, id⊕decimal is a type mismatch. */
  private def arithCoerce(l: RT, r: RT): RT = (l.base, r.base) match {
    case ("int", "int") | ("int", "id")          => TInt
    case ("int", "decimal")                      => r
    case ("id", "id") | ("id", "int")            => r
    case ("decimal", "int") | ("decimal", "id")  => l
    case ("decimal", "decimal")                  => if (l.scale > r.scale) l else r
    case _ =>
      fail(s"types '${l.desc}' and '${r.desc}' do not match")
  }

  // ---------------------------------------------------------------- literals
  /** Go `StringLit.ConvertToTimestamp` (`reference/sql3/parser/ast.go:1838`):
    * RFC3339Nano, RFC3339 or bare date. */
  private def tsParseable(s: String): Boolean =
    scala.util.Try(java.time.OffsetDateTime.parse(s)).isSuccess ||
      scala.util.Try(java.time.LocalDate.parse(s)).isSuccess

  private def stringLitValue(e: Expression): Option[String] = e match {
    case Literal(v: UTF8String, StringType) => Some(v.toString)
    case Literal(v: String, StringType)     => Some(v)
    case _                                  => None
  }

  // ------------------------------------------------------------ schema source
  private[sql] def parseRT(s: String): RT = {
    val DecRe = raw"decimal\((\d+)\)".r
    s match {
      case DecRe(sc) => RT("decimal", sc.toInt)
      case "decimal" => RT("decimal", 0)
      case other     => RT(other)
    }
  }

  private def inferRT(name: String, dt: DataType): Option[RT] = dt match {
    case _ if name == "_id"                  => Some(TId)
    case LongType | IntegerType | ShortType  => Some(TInt)
    case BooleanType                         => Some(TBool)
    case StringType                          => Some(TStr)
    case TimestampType                       => Some(TTs)
    case d: DecimalType                      => Some(RT("decimal", d.scale))
    case a: ArrayType if Ddl.isSetq(a) =>
      Some(if (a.elementType.asInstanceOf[StructType]("value").dataType == StringType)
        RT("stringsetq") else RT("idsetq"))
    case ArrayType(StringType, _)            => Some(TStrSet)
    case ArrayType(LongType | IntegerType, _) => Some(TIdSet)
    case _                                   => None
  }

  private def tableTypes(spark: SparkSession, name: String): Map[String, RT] =
    Ddl.declaredTypes.get(name.toLowerCase)
      .map(_.map { case (c, s) => c -> parseRT(s) })
      .getOrElse {
        scala.util.Try(spark.table(graft.core.Idents.q(name)).schema).toOption
          .map(_.fields.flatMap(f =>
            inferRT(f.name.toLowerCase, f.dataType).map(f.name.toLowerCase -> _)).toMap)
          .getOrElse(Map.empty)
      }

  // ------------------------------------------------------------------- entry
  /** Check one already-rewritten (Spark-parseable) statement. `castTargets`
    * is the reference cast-target list collected during [[GraftSql.rewrite]],
    * in textual `AS <type>` order (= Cast-node `origin.stopIndex` order) —
    * it disambiguates `id` vs `int`, which share BIGINT after the rewrite. */
  def check(spark: SparkSession, sparkSql: String, castTargets: List[RT] = Nil): Unit = {
    val plan =
      try spark.sessionState.sqlParser.parsePlan(sparkSql)
      catch { case _: Throwable => return } // parser errors surface elsewhere
    // pair Cast nodes with their reference target types
    val castMap = new java.util.IdentityHashMap[Cast, RT]()
    if (castTargets.nonEmpty) {
      val casts = scala.collection.mutable.ArrayBuffer[Cast]()
      plan.foreach(_.expressions.foreach(_.foreach {
        case c: Cast => casts += c
        case _       => ()
      }))
      val ordered = casts.distinct.sortBy(_.origin.stopIndex.getOrElse(Int.MaxValue))
      if (ordered.size == castTargets.size)
        ordered.zip(castTargets).foreach { case (c, t) => castMap.put(c, t) }
    }
    try walk(spark, plan, castMap)
    catch {
      case e: RefError  => throw e
      case _: Throwable => () // fail open — Spark's analyzer is the backstop
    }
    ()
  }

  // ------------------------------------------------------------------- plans
  private type Env = Map[String, RT]

  private def walk(spark: SparkSession, plan: LogicalPlan,
      casts: java.util.IdentityHashMap[Cast, RT]): Env = plan match {
    case UnresolvedRelation(parts, _, _) =>
      val base = tableTypes(spark, parts.last)
      base ++ base.map { case (c, t) => s"${parts.last.toLowerCase}.$c" -> t }
    case SubqueryAlias(id, child) =>
      val env = walk(spark, child, casts)
      env ++ env.filterNot(_._1.contains('.'))
        .map { case (c, t) => s"${id.name.toLowerCase}.$c" -> t }
    case UnresolvedSubqueryColumnAliases(names, child) =>
      val env = walk(spark, child, casts)
      env // aliased column names unknown positionally — keep child env
    case Project(list, child) =>
      val env = walk(spark, child, casts)
      list.flatMap(outType(spark, _, env, casts)).toMap
    case Filter(cond, child) =>
      val env = walk(spark, child, casts)
      typeOf(spark, cond, env, casts); env
    case UnresolvedHaving(cond, child) =>
      val env = walk(spark, child, casts)
      typeOf(spark, cond, env, casts); env
    case Aggregate(group, aggs, child, _) =>
      val env = walk(spark, child, casts)
      // the reference's GroupBy pushdown supports COUNT/SUM/AVG only —
      // MIN/MAX/PERCENTILE in a grouped query are rejected
      // (`defs_groupby.go:212-224` wording)
      if (group.nonEmpty) aggs.foreach(_.foreach {
        case f: UnresolvedFunction
            if Set("min", "max", "percentile")(f.nameParts.last.toLowerCase) =>
          fail(s"aggregate '${f.nameParts.last.toUpperCase}()' not allowed in GROUP BY")
        case _ => ()
      })
      group.foreach(typeOf(spark, _, env, casts))
      aggs.flatMap(outType(spark, _, env, casts)).toMap
    case Sort(order, _, child, _) =>
      val env = walk(spark, child, casts)
      order.foreach(o => typeOf(spark, o.child, env, casts)); env
    case Join(l, r, _, cond, _) =>
      val env = walk(spark, l, casts) ++ walk(spark, r, casts)
      cond.foreach(typeOf(spark, _, env, casts)); env
    case Distinct(child)       => walk(spark, child, casts)
    case GlobalLimit(_, child) => walk(spark, child, casts)
    case LocalLimit(_, child)  => walk(spark, child, casts)
    case Offset(_, child)      => walk(spark, child, casts)
    case _: OneRowRelation     => Map.empty
    case other =>
      other.children.foldLeft(Map.empty: Env)((acc, c) => acc ++ walk(spark, c, casts))
  }

  private def outType(spark: SparkSession, e: Expression, env: Env,
      casts: java.util.IdentityHashMap[Cast, RT]): Seq[(String, RT)] = e match {
    case UnresolvedStar(_) => env.toSeq
    case Alias(child, name) =>
      typeOf(spark, child, env, casts).map(name.toLowerCase -> _).toSeq
    case UnresolvedAlias(child, _) =>
      val t = typeOf(spark, child, env, casts)
      child match {
        case u: UnresolvedAttribute => t.map(u.nameParts.last.toLowerCase -> _).toSeq
        case _                      => Seq.empty
      }
    case u: UnresolvedAttribute =>
      typeOf(spark, u, env, casts).map(u.nameParts.last.toLowerCase -> _).toSeq
    case other =>
      typeOf(spark, other, env, casts); Seq.empty
  }

  // ------------------------------------------------------------- expressions
  private def opDesc(e: Expression): String = e match {
    case _: EqualTo            => "="
    case _: LessThan           => "<"
    case _: LessThanOrEqual    => "<="
    case _: GreaterThan        => ">"
    case _: GreaterThanOrEqual => ">="
    case _: Add                => "+"
    case _: Subtract           => "-"
    case _: Multiply           => "*"
    case _: Divide             => "/"
    case _: Remainder          => "%"
    case _: BitwiseAnd         => "&"
    case _: BitwiseOr          => "|"
    case _: ShiftLeft          => "<<"
    case _: ShiftRight         => ">>"
    case _: And                => "AND"
    case _: Or                 => "OR"
    case _                     => "?"
  }

  private def typeOf(spark: SparkSession, e: Expression, env: Env,
      casts: java.util.IdentityHashMap[Cast, RT]): Option[RT] = {
    def t(x: Expression): Option[RT] = typeOf(spark, x, env, casts)

    /** Apply the reference's string-literal→timestamp conversion
      * (`expressionanalyzer.go:447-458`): only when the other side is a
      * timestamp and the literal parses. */
    def converted(other: Option[RT], lit: Expression, litT: Option[RT]): Option[RT] =
      if (other.exists(_.base == "timestamp") && litT.exists(_.base == "string") &&
          stringLitValue(lit).exists(tsParseable)) Some(TTs)
      else litT

    e match {
      // `a != b` parses as Not(EqualTo) sharing the origin span — render '!='
      case n @ Not(eq: EqualTo) if n.origin.startIndex.isDefined &&
          n.origin.startIndex == eq.origin.startIndex =>
        equality(spark, eq, "!=", env, casts)
      case eq: EqualTo => equality(spark, eq, "=", env, casts)

      // `a NOT LIKE p` parses as Not(Like) on the same span — op 'NOTLIKE'
      case n @ Not(lk: Like) if n.origin.startIndex.isDefined &&
          n.origin.startIndex == lk.origin.startIndex =>
        likeCheck(spark, lk, "NOTLIKE", env, casts)

      // reference `!x`: scanner maps '!' to BITNOT — id/int only, and the
      // evaluator negates (`defs_unops.go:35-44`: !11 = -11). `NOT x` (the
      // keyword) is left to Spark's boolean semantics.
      case n @ Not(child) if srcChar(n).contains('!') =>
        val ct = t(child)
        ct.filterNot(x => bitwiseOk(x.base)).foreach(x =>
          fail(s"operator '!' incompatible with type '${x.desc}'"))
        ct

      case cmp @ (_: LessThan | _: LessThanOrEqual | _: GreaterThan | _: GreaterThanOrEqual) =>
        val b = cmp.asInstanceOf[BinaryComparison]
        val op = opDesc(cmp)
        val lt = t(b.left)
        lt.filterNot(x => comparisonOk(x.base)).foreach(x =>
          fail(s"operator '$op' incompatible with type '${x.desc}'"))
        val rt0 = t(b.right)
        val rt = converted(lt, b.right, rt0)
        rt.filterNot(x => comparisonOk(x.base)).foreach(x =>
          fail(s"operator '$op' incompatible with type '${x.desc}'"))
        for (l <- lt; r <- rt) if (!comparable(l, r))
          fail(s"types '${l.desc}' and '${r.desc}' are not equatable")
        Some(TBool)

      case logic @ (_: And | _: Or) =>
        val b = logic.asInstanceOf[BinaryOperator]
        val op = opDesc(logic)
        t(b.left).filterNot(x => logicalOk(x.base)).foreach(x =>
          fail(s"operator '$op' incompatible with type '${x.desc}'"))
        t(b.right).filterNot(x => logicalOk(x.base)).foreach(x =>
          fail(s"operator '$op' incompatible with type '${x.desc}'"))
        Some(TBool)

      case arith @ (_: Add | _: Subtract | _: Multiply | _: Divide | _: Remainder) =>
        val b = arith.asInstanceOf[BinaryArithmetic]
        val op = opDesc(arith)
        val lt = t(b.left); val rt = t(b.right)
        lt.filterNot(arithmeticOk(_, op)).foreach(x =>
          fail(s"operator '$op' incompatible with type '${x.desc}'"))
        rt.filterNot(arithmeticOk(_, op)).foreach(x =>
          fail(s"operator '$op' incompatible with type '${x.desc}'"))
        // literal-zero divisor (`reference/sql3/planner/expression.go:419-434`
        // evaluation wording, asserted by `defs_binops.go` DivideByZero cases)
        if (op == "/" || op == "%") b.right match {
          case Literal(v, _) if v != null && BigDecimal(v.toString) == 0 =>
            fail("divisor is equal to zero")
          case _ => ()
        }
        for (l <- lt; r <- rt) yield arithCoerce(l, r)

      case bit @ (_: BitwiseAnd | _: BitwiseOr | _: ShiftLeft | _: ShiftRight) =>
        val (l, r) = bit match {
          case b: BinaryOperator => (b.left, b.right)
          case ShiftLeft(x, y)   => (x, y)
          case ShiftRight(x, y)  => (x, y)
        }
        val op = opDesc(bit)
        t(l).filterNot(x => bitwiseOk(x.base)).foreach(x =>
          fail(s"operator '$op' incompatible with type '${x.desc}'"))
        t(r).filterNot(x => bitwiseOk(x.base)).foreach(x =>
          fail(s"operator '$op' incompatible with type '${x.desc}'"))
        Some(TInt)

      case Concat(children) if children.size == 2 => // `a || b` (parser-level)
        children.foreach { c =>
          t(c).filterNot(_.base == "string").foreach(x =>
            fail(s"operator '||' incompatible with type '${x.desc}'"))
        }
        Some(TStr)

      case like: Like => likeCheck(spark, like, "LIKE", env, casts)

      case In(value, list) =>
        val lt = t(value)
        list.foreach { elem =>
          val et = converted(lt, elem, t(elem))
          for (l <- lt; r <- et) if (!comparable(l, r))
            fail(s"types '${l.desc}' and '${r.desc}' are not equatable")
        }
        Some(TBool)

      case UnaryMinus(child, _) =>
        val ct = t(child)
        ct.filterNot(arithmeticOk(_, "-")).foreach(x =>
          fail(s"operator '-' incompatible with type '${x.desc}'"))
        ct
      case UnaryPositive(child) =>
        val ct = t(child)
        ct.filterNot(arithmeticOk(_, "+")).foreach(x =>
          fail(s"operator '+' incompatible with type '${x.desc}'"))
        ct
      case BitwiseNot(child) =>
        val ct = t(child)
        ct.filterNot(x => bitwiseOk(x.base)).foreach(x =>
          fail(s"operator '~' incompatible with type '${x.desc}'"))
        ct

      case Not(child)      => t(child); Some(TBool)
      case IsNull(child)   => t(child); Some(TBool)
      case IsNotNull(child) => t(child); Some(TBool)

      case c: Cast =>
        val st = t(c.child)
        val tgt = Option(casts.get(c)).orElse(sparkTargetRT(c.dataType))
        for (s <- st; g <- tgt) {
          if (!castOk(s, g))
            fail(s"'${s.desc}' cannot be cast to '${g.desc}'")
        }
        tgt

      case f: UnresolvedFunction =>
        val name = f.nameParts.last.toLowerCase
        name match {
          case "between" if f.arguments.size == 3 =>
            between(spark, f.arguments(0), f.arguments(1), f.arguments(2), env, casts)
          case "array" =>
            // reference set literal (`sql3/errors.go:306-313` wording)
            if (f.arguments.isEmpty)
              fail("set literal must contain at least one member")
            val ts = f.arguments.map(a => (a, t(a)))
            if (ts.exists { case (a, rt) =>
                a.isInstanceOf[Literal] &&
                  a.asInstanceOf[Literal].dataType == NullType ||
                  rt.exists(x => !numeric(x.base) && x.base != "string") })
              fail("set literal must contain ints or strings")
            if (ts.forall(_._2.exists(x => numeric(x.base)))) Some(TIdSet)
            else if (ts.forall(_._2.exists(_.base == "string"))) Some(TStrSet)
            else None
          case _ =>
            val argTs = f.arguments.map(t).toList
            checkCall(f, f.nameParts.last, name, f.arguments.toList, argTs)
        }

      case CaseWhen(branches, elseValue) =>
        branches.foreach { case (c, v) => t(c); t(v) }
        elseValue.foreach(t)
        branches.view.map(b => t(b._2))
          .collectFirst { case Some(x) if x.base != "void" => x }

      case s: SubqueryExpression =>
        walk(spark, s.plan, casts); None

      case u: UnresolvedAttribute =>
        val parts = u.nameParts.map(_.toLowerCase)
        env.get(parts.mkString(".")).orElse(env.get(parts.last))

      case Literal(_, dt) => dt match {
        case IntegerType | LongType | ShortType => Some(TInt)
        case StringType                         => Some(TStr)
        case BooleanType                        => Some(TBool)
        case d: DecimalType                     => Some(RT("decimal", d.scale))
        case DoubleType | FloatType             => Some(RT("decimal", 2))
        case TimestampType                      => Some(TTs)
        case NullType                           => Some(RT("void"))
        case _                                  => None
      }

      case Alias(child, _)          => t(child)
      case UnresolvedAlias(child, _) => t(child)

      case other =>
        other.children.foreach(t)
        None
    }
  }

  private def likeCheck(spark: SparkSession, like: Like, op: String, env: Env,
      casts: java.util.IdentityHashMap[Cast, RT]): Option[RT] = {
    def t(x: Expression) = typeOf(spark, x, env, casts)
    t(like.left).filterNot(_.base == "string").foreach(x =>
      fail(s"operator '$op' incompatible with type '${x.desc}'"))
    t(like.right).filterNot(_.base == "string").foreach(x =>
      fail(s"operator '$op' incompatible with type '${x.desc}'"))
    Some(TBool)
  }

  private def equality(spark: SparkSession, eq: EqualTo, op: String, env: Env,
      casts: java.util.IdentityHashMap[Cast, RT]): Option[RT] = {
    def t(x: Expression) = typeOf(spark, x, env, casts)
    val lt = t(eq.left)
    lt.filterNot(x => equalityOk(x.base)).foreach(x =>
      fail(s"operator '$op' incompatible with type '${x.desc}'"))
    val rt0 = t(eq.right)
    rt0.filterNot(x => equalityOk(x.base)).foreach(x =>
      fail(s"operator '$op' incompatible with type '${x.desc}'"))
    val rt =
      if (lt.exists(_.base == "timestamp") && rt0.exists(_.base == "string") &&
          stringLitValue(eq.right).exists(tsParseable)) Some(TTs)
      else rt0
    for (l <- lt; r <- rt) if (!comparable(l, r))
      fail(s"types '${l.desc}' and '${r.desc}' are not equatable")
    Some(TBool)
  }

  /** BETWEEN (`expressionanalyzer.go:732-748` + `analyzeRangeExpression`
    * `:772-820`): bounds are checked as range subscripts first, then the
    * operand against the range's subscript type. */
  private def between(spark: SparkSession, input: Expression, lower: Expression,
      upper: Expression, env: Env,
      casts: java.util.IdentityHashMap[Cast, RT]): Option[RT] = {
    def t(x: Expression) = typeOf(spark, x, env, casts)
    def conv(b: Expression, bt: Option[RT]): Option[RT] =
      if (bt.exists(_.base == "string") && stringLitValue(b).exists(tsParseable)) Some(TTs)
      else bt
    val lo = conv(lower, t(lower))
    val hi = conv(upper, t(upper))
    lo.filterNot(x => rangeOk(x.base)).foreach(x =>
      fail(s"type '${x.desc}' cannot be used as a range subscript"))
    hi.filterNot(x => rangeOk(x.base)).foreach(x =>
      fail(s"type '${x.desc}' cannot be used as a range subscript"))
    // typesOfRangeBoundsAreTheSame (`expressiontypes.go:383-430`)
    val sub: Option[RT] = (lo, hi) match {
      case (Some(l), Some(h)) => (l.base, h.base) match {
        case ("int", "int") | ("int", "id")         => Some(l)
        case ("int", "decimal")                     => Some(h)
        case ("id", "id") | ("id", "int")           => Some(l)
        case ("timestamp", "timestamp")             => Some(l)
        case ("decimal", "decimal")                 => Some(if (l.scale > h.scale) l else h)
        case ("decimal", "int") | ("decimal", "id") => Some(l)
        case _ =>
          fail(s"incompatible types '${l.desc}' and '${h.desc}' used as range subscripts")
      }
      case _ => None
    }
    val xt = t(input)
    // typesAreRangeComparable (`expressiontypes.go:172-210`)
    for (x <- xt; s <- sub) s.base match {
      case "timestamp" =>
        if (x.base != "timestamp")
          fail(s"operator 'BETWEEN' incompatible with type '${x.desc}'")
      case "int" | "id" =>
        if (!numeric(x.base))
          fail(s"operator 'BETWEEN' incompatible with type '${x.desc}'")
      case "decimal" =>
        if (x.base != "decimal")
          fail(s"operator 'BETWEEN' incompatible with type '${x.desc}'")
      case _ => ()
    }
    Some(TBool)
  }

  /** Spark cast-target type → reference type (post-rewrite fallback when the
    * positional cast-target list is unavailable; ID collapses to INT). */
  private def sparkTargetRT(dt: DataType): Option[RT] = dt match {
    case LongType | IntegerType   => Some(TInt)
    case BooleanType              => Some(TBool)
    case StringType               => Some(TStr)
    case TimestampType            => Some(TTs)
    case d: DecimalType           => Some(RT("decimal", d.scale))
    case ArrayType(LongType, _)   => Some(TIdSet)
    case ArrayType(StringType, _) => Some(TStrSet)
    case _                        => None
  }

  // ------------------------------------------------- function signatures
  /** typesAreAssignmentCompatible (`expressiontypes.go:240-360`). */
  private[sql] def assignOk(param: RT, src: RT): Boolean = src.base == "void" || (param.base match {
    case "int"       => src.base == "int"
    case "bool"      => src.base == "bool"
    case "id"        => Set("int", "id")(src.base)
    case "stringset" => src.base == "stringset"
    case "idset"     => src.base == "idset"
    case "decimal"   => (src.base == "decimal" && param.scale >= src.scale) || src.base == "int"
    case "timestamp" => Set("timestamp", "string", "int")(src.base)
    case "string"    => src.base == "string"
    case _           => false
  })

  private def countErr(at: Expression, display: String, formal: Int, actual: Int): Nothing =
    failAtEnd(at, s"'$display': count of formal parameters ($formal) does not " +
      s"match count of actual parameters ($actual)")

  private def paramErr(src: RT, param: RT): Nothing =
    fail(s"an expression of type '${src.desc}' cannot be passed to a " +
      s"parameter of type '${param.desc}'")

  private def assignCheck(param: RT, src: Option[RT]): Unit =
    src.filterNot(assignOk(param, _)).foreach(paramErr(_, param))

  /** Interval/timeunit literal-value validation (raised at evaluation by the
    * reference — `inbuiltfunctionsdate.go:271,392,622` — but statically
    * checkable for literals, which is what the corpus exercises). */
  private val validIntervals =
    Set("YY", "YD", "M", "D", "W", "WK", "HH", "MI", "S", "MS", "US", "NS")
  private val validTimeUnits = Set("s", "ms", "us", "µs", "ns") // field.go:2551
  private def litCheck(arg: Expression, valid: String => Boolean, pname: String): Unit =
    stringLitValue(arg).filterNot(valid).foreach(v =>
      fail(s"invalid value '$v' for parameter '$pname'"))

  /** Per-function arity + parameter checks of the reference's 37 scalar
    * functions and aggregates (`sql3/planner/expressionanalyzercall.go:25-335`,
    * `inbuiltfunctions{string,date,set}.go`). Returns the reference result
    * type; unknown functions return None (checks exempted). */
  /** Static literal value of a (possibly folded) string argument —
    * `char(<int literal>)` folds so `ascii(char(255))` can be checked like
    * the reference's evaluator does. */
  private def foldedString(e: Expression): Option[String] = e match {
    case Literal(v: UTF8String, StringType) => Some(v.toString)
    case f: UnresolvedFunction if f.nameParts.last.equalsIgnoreCase("char") =>
      f.arguments match {
        case Seq(Literal(i: Int, IntegerType)) => Some(i.toChar.toString)
        case Seq(Literal(i: Long, LongType))   => Some(i.toChar.toString)
        case _                                 => None
      }
    case _ => None
  }

  private def longLitValue(e: Expression): Option[Long] = e match {
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Long, LongType)   => Some(v)
    case UnaryMinus(inner, _)         => longLitValue(inner).map(-_)
    case _                            => None
  }

  private def checkCall(fn: Expression, display: String, name: String,
      args: List[Expression], argTs: List[Option[RT]]): Option[RT] = {
    val n = args.size
    def arity(formal: Int, min: Int, max: Int): Unit =
      if (n < min || n > max) countErr(fn, display, formal, n)
    def strParam(i: Int): Unit = argTs(i).filterNot(x =>
      x.base == "string" || x.base == "void").foreach(_ =>
      failAt(args(i), "string expression expected"))
    def intParam(i: Int): Unit = argTs(i).filterNot(x =>
      Set("int", "id", "void")(x.base)).foreach(_ =>
      failAt(args(i), "integer expression expected"))
    def outOfRange(v: Long): Nothing = failEval(s"value '$v' out of range")
    def setParam(i: Int): RT = argTs(i) match {
      case Some(x) if Set("idset", "stringset", "idsetq", "stringsetq")(x.base) => x
      case Some(_) => fail("set expression expected")
      case None    => RT("?")
    }
    def member(set: RT): RT = set.base match {
      case "idset" | "idsetq"         => TId
      case "stringset" | "stringsetq" => TStr
      case _                          => RT("?")
    }
    def aggArg(allowed: Set[String], wording: String): Unit = {
      arity(1, 1, 1)
      argTs.head.filterNot(x => allowed(x.base)).foreach(_ => fail(wording))
    }
    name match {
      case "lower" | "upper" | "trim" | "ltrim" | "rtrim" | "reverse" =>
        arity(1, 1, 1); strParam(0); Some(TStr)
      case "char" =>
        arity(1, 1, 1); intParam(0)
        // ascii range [0,255] (`inbuiltfunctionsstring.go:326-328`)
        longLitValue(args.head).filter(v => v < 0 || v > 255).foreach(outOfRange)
        Some(TStr)
      case "ascii" =>
        arity(1, 1, 1); strParam(0)
        // `inbuiltfunctionsstring.go:334` — one BYTE required (Go len())
        foldedString(args.head)
          .filter(_.getBytes("UTF-8").length != 1).foreach(v =>
            failEval(s"value '$v' should be of the length 1"))
        Some(TInt)
      case "substring" =>
        arity(2, 2, 3); strParam(0); (1 until n).foreach(intParam)
        // `inbuiltfunctionsstring.go:385-413` index rules, literals only
        for (s <- foldedString(args.head); st <- longLitValue(args(1))) {
          if (st < 0 || st >= s.length) outOfRange(st)
          else if (n == 3) longLitValue(args(2)).foreach { ln =>
            val end = st + ln
            if (end < st || end > s.length) outOfRange(end)
          }
        }
        Some(TStr)
      case "stringsplit" =>
        arity(2, 2, 3); strParam(0); strParam(1); if (n == 3) intParam(2); Some(TStr)
      case "replaceall" =>
        arity(3, 3, 3); (0 until 3).foreach(strParam); Some(TStr)
      case "prefix" | "suffix" =>
        arity(2, 2, 2); strParam(0); intParam(1)
        // 0 ≤ n ≤ len(s) (`inbuiltfunctionsstring.go:586,618`)
        for (s <- foldedString(args.head); v <- longLitValue(args(1)))
          if (v < 0 || v > s.length) outOfRange(v)
        Some(TStr)
      case "replicate" =>
        arity(2, 2, 2); strParam(0); intParam(1)
        longLitValue(args(1)).filter(_ < 0).foreach(outOfRange)
        Some(TStr)
      case "space" =>
        arity(1, 1, 1); intParam(0); Some(TStr)
      case "len" =>
        arity(1, 1, 1); strParam(0); Some(TInt)
      case "format" =>
        arity(1, 1, Int.MaxValue); strParam(0)
        args.drop(1).foreach {
          case l: Literal if l.dataType == NullType =>
            failAt(l, "null literal not allowed")
          case _ => ()
        }
        Some(TStr)
      case "charindex" =>
        arity(3, 2, 3); strParam(0); strParam(1)
        if (n == 3) {
          intParam(2)
          // 0 ≤ pos < len(input) (`inbuiltfunctionsstring.go:774-779`)
          for (s <- foldedString(args(1)); p <- longLitValue(args(2)))
            if (p < 0 || p >= s.length) outOfRange(p)
        }
        Some(TInt)
      case "str" =>
        arity(1, 1, 3)
        assignCheck(RT("decimal", 4), argTs.head)
        args.drop(1).foreach {
          case l: Literal if l.dataType == NullType => fail("null literal not allowed")
          case _ => ()
        }
        (1 until n).foreach(intParam)
        Some(TStr)
      case "datetimepart" | "datetimename" =>
        arity(2, 2, 2)
        assignCheck(TStr, argTs(0)); litCheck(args(0), s => validIntervals(s.toUpperCase), "interval")
        assignCheck(TTs, argTs(1))
        Some(if (name == "datetimepart") TInt else TStr)
      case "date_trunc" =>
        arity(2, 2, 2)
        // reference codes AND Spark builtin units (the hybrid alias in
        // Functions serves both — reference codes string-cut, Spark names
        // the builtin truncation)
        val sparkUnits = Set("YEAR", "YYYY", "MON", "MONTH", "MM", "DAY", "DD",
          "HOUR", "MINUTE", "SECOND", "WEEK", "QUARTER", "MILLISECOND", "MICROSECOND")
        assignCheck(TStr, argTs(0))
        litCheck(args(0),
          s => validIntervals(s.toUpperCase) || sparkUnits(s.toUpperCase), "interval")
        assignCheck(TTs, argTs(1)); Some(TStr)
      case "totimestamp" =>
        arity(2, 1, 2)
        assignCheck(TInt, argTs(0))
        if (n == 2) {
          assignCheck(TStr, argTs(1))
          litCheck(args(1), validTimeUnits, "timeunit")
        }
        Some(TTs)
      case "datetimeadd" =>
        arity(3, 3, 3)
        assignCheck(TStr, argTs(0)); litCheck(args(0), s => validIntervals(s.toUpperCase), "timeunit")
        assignCheck(TInt, argTs(1)); assignCheck(TTs, argTs(2))
        tsLitConvertible(args(2))
        Some(TTs)
      case "datetimediff" =>
        arity(3, 3, 3)
        assignCheck(TStr, argTs(0)); litCheck(args(0), s => validIntervals(s.toUpperCase), "timeunit")
        assignCheck(TTs, argTs(1)); assignCheck(TTs, argTs(2))
        tsLitConvertible(args(1)); tsLitConvertible(args(2))
        Some(TInt)
      case "datetimefromparts" =>
        arity(7, 7, 7); argTs.foreach(assignCheck(TInt, _))
        // isValidDateTimeParts (`inbuiltfunctionsdate.go:311-350`), literal args
        val lits = args.map(longLitValue)
        if (lits.forall(_.isDefined)) {
          val p = lits.map(_.get)
          def bad(v: Long): Nothing = failEval(s"not a valid datetimepart $v")
          if (p(0) < 0 || p(0) > 9999) bad(p(0))
          if (p(1) < 1 || p(1) > 12) bad(p(1))
          val leap = p(0) % 4 == 0 && p(0) % 100 != 0 || p(0) % 400 == 0
          val maxDay = p(1) match {
            case 1 | 3 | 5 | 7 | 8 | 10 | 12 => 31
            case 2                           => if (leap) 29 else 28
            case _                           => 30
          }
          // reference checks 29 as the Feb cap, then rejects 29 on non-leap
          if (p(1) == 2 && (p(2) < 1 || p(2) > 29)) bad(p(2))
          if (p(2) < 1 || p(2) > maxDay) bad(p(2))
          if (p(3) < 0 || p(3) > 23) bad(p(3))
          if (p(4) < 0 || p(4) > 59) bad(p(4))
          if (p(5) < 0 || p(5) > 59) bad(p(5))
          if (p(6) < 0 || p(6) > 999) bad(p(6))
        }
        Some(TTs)
      case "setcontains" =>
        arity(2, 2, 2)
        val s = setParam(0)
        for (m <- Some(member(s)) if m.base != "?"; r <- argTs(1))
          if (!comparable(m, r))
            fail(s"types '${s.desc}' and '${r.desc}' are not equatable")
        Some(TBool)
      case "setcontainsall" | "setcontainsany" =>
        arity(2, 2, 2)
        val s1 = setParam(0); val s2 = setParam(1)
        val (m1, m2) = (member(s1), member(s2))
        if (m1.base != "?" && m2.base != "?" && !comparable(m1, m2))
          fail(s"types '${m1.desc}' and '${m2.desc}' are not equatable")
        Some(TBool)
      case "rangeq" =>
        arity(3, 2, 3)
        argTs.head.filterNot(x => Set("idsetq", "stringsetq")(x.base))
          .foreach(_ => fail("time quantum expression expected"))
        Some(TBool)
      case "sum" | "avg" =>
        aggArg(Set("int", "id", "decimal"), "integer or decimal expression expected")
        if (name == "avg") Some(RT("decimal", 4)) else argTs.head
      case "min" | "max" =>
        aggArg(Set("int", "id", "decimal", "timestamp", "string"),
          "integer, decimal, timestamp or string expression expected")
        argTs.head
      case "var" =>
        aggArg(Set("int", "id", "decimal", "timestamp"),
          "integer, decimal or timestamp expression expected")
        Some(RT("decimal", 6))
      case "corr" =>
        arity(2, 2, 2)
        argTs.foreach(_.filterNot(x => Set("int", "id", "decimal", "timestamp")(x.base))
          .foreach(_ => fail("integer, decimal or timestamp expression expected")))
        Some(RT("decimal", 6))
      case "count" =>
        if (n > 1) countErr(fn, display, 1, n)
        Some(TInt)
      case _ => None
    }
  }

  /** A string literal bound to a timestamp parameter must parse
    * (`sql3/planner/expression.go:3005-3013` wording). */
  private def tsLitConvertible(arg: Expression): Unit =
    stringLitValue(arg).filterNot(tsParseable).foreach(v =>
      failEval(s"unable to convert '$v' to type 'timestamp'"))
}
