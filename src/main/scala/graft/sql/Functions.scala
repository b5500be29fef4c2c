package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Cast, Expression, If, IsNull, Literal, TimestampAdd, TimestampDiff}
import org.apache.spark.sql.types.{DecimalType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The reference's 37 scalar SQL functions (`reference/sql3/planner/
  * expressionanalyzercall.go:25-335`, evaluators in
  * `inbuiltfunctions{string,date,set,quantum}.go`) registered as Catalyst
  * expression-builder aliases over Spark built-ins.
  *
  * Every alias expands to built-in expressions at analysis time, so the whole
  * surface stays inside whole-stage codegen — no UDF call overhead, full
  * pushdown/pruning, exactly what a 100 TB scan needs.
  *
  * Semantics notes (divergences are deliberate and documented):
  *  - SUBSTRING/STRINGSPLIT/CHARINDEX are 0-based in the reference
  *    (`inbuiltfunctionsstring.go:363,457,727`); aliases shift to Spark's
  *    1-based builtins.
  *  - Reference raises on out-of-range SUBSTRING/PREFIX/SUFFIX indexes; Spark
  *    clamps. We keep Spark's clamping (total functions scale better than
  *    row-level errors on 100 TB inputs).
  */
object Functions {

  /** Build a call to a Spark BUILT-IN function. Resolved against the static
    * builtin registry so aliases that shadow a builtin of the same name
    * (REVERSE, SUBSTRING, …) don't resolve back to themselves. */
  private def fn(name: String, args: Expression*): Expression =
    org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin
      .lookupFunctionBuilder(FunctionIdentifier(name)) match {
      case Some(b) => b(args)
      case None    => UnresolvedFunction(Seq(name), args, isDistinct = false)
    }

  private def lit(v: Any): Expression = Literal(v)

  private val integralTypes = Set[org.apache.spark.sql.types.DataType](
    org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
    org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)

  /** name → builder over the raw argument expressions */
  private val aliases: Map[String, Seq[Expression] => Expression] = Map(
    // Internal: every `/` in reference-dialect SQL is swapped to this call
    // at PARSE time ([[GraftSql.dialectPlan]]). The reference's INT ÷ INT is
    // int64 division (`sql3/planner/expression.go:419-423`); Spark's `/`
    // coerces to double, which both mis-types anything downstream of the
    // division (int expected, double produced — e.g. `(a/b) & c` fails
    // analysis outright) and loses the truncating semantics. Builders run
    // once operands are RESOLVED, so the true operand types are visible
    // here; non-integral operands fall through to Spark's Divide and the
    // usual coercion + decimal-truncation fixups.
    "GRAFT_DIV" -> (a => {
      val bothInt = scala.util.Try(
        integralTypes(a(0).dataType) && integralTypes(a(1).dataType))
        .getOrElse(false)
      if (bothInt)
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(a(0), a(1))
      else org.apache.spark.sql.catalyst.expressions.Divide(a(0), a(1))
    }),
    // --- set functions (`inbuiltfunctionsset.go:10-160`) ---
    "SETCONTAINS" -> (a => fn("array_contains", a(0), a(1))),
    "SETCONTAINSALL" -> (a =>
      // all members of a(1) present in a(0)
      fn("=", fn("size", fn("array_except", a(1), a(0))), lit(0))),
    "SETCONTAINSANY" -> (a => fn("arrays_overlap", a(0), a(1))),

    // FIRST/LAST (`expressionagg.go:1283,1255`) are NOT registered here:
    // Spark's parser special-cases those keywords straight into its builtin
    // First/Last expressions, bypassing the function registry — the rewrite
    // to deterministic _id-order semantics happens on the analyzed plan in
    // [[GraftSql.dialectFix]].

    // --- string functions (`inbuiltfunctionsstring.go:257-830`) ---
    "REVERSE" -> (a => fn("reverse", a(0))),
    "LOWER"   -> (a => fn("lower", a(0))),
    "UPPER"   -> (a => fn("upper", a(0))),
    "CHAR"    -> (a => fn("char", a(0))),
    "ASCII"   -> (a => fn("ascii", a(0))),
    "SUBSTRING" -> (a =>
      if (a.size >= 3) fn("substring", a(0), fn("+", a(1), lit(1)), a(2))
      else fn("substring", a(0), fn("+", a(1), lit(1)), lit(Int.MaxValue))),
    "REPLACEALL" -> (a => fn("replace", a(0), a(1), a(2))),
    "STRINGSPLIT" -> (a => {
      // reference: 0-based position, pos<=0 → first part, overflow → "",
      // NULL position → NULL (`inbuiltfunctionsstring.go` eval returns nil)
      val pos = if (a.size >= 3) a(2) else lit(0L)
      val split = fn("split_part", a(0), a(1),
        fn("+", fn("greatest", pos, lit(0L)), lit(1L)))
      if (a.size >= 3) If(IsNull(a(2)), Literal(null, StringType), split)
      else split
    }),
    "TRIM"  -> (a => fn("trim", a(0))),
    "RTRIM" -> (a => fn("rtrim", a(0))),
    "LTRIM" -> (a => fn("ltrim", a(0))),
    "PREFIX" -> (a => fn("left", a(0), a(1))),
    "SUFFIX" -> (a => fn("right", a(0), a(1))),
    "SPACE" -> (a => fn("space", a(0))),
    "LEN"   -> (a => fn("length", a(0))),
    "REPLICATE" -> (a => fn("repeat", a(0), a(1))),
    // FORMAT uses Go fmt verbs (`inbuiltfunctionsstring.go` EvaluateFormat —
    // fmt.Sprintf): translate %t/%v to Java-formatter equivalents when the
    // format string is a literal; other verbs map 1:1.
    "FORMAT" -> (a => a.head match {
      case Literal(f: UTF8String, StringType) =>
        val verbs = "%[a-zA-Z]".r.findAllIn(f.toString).toList
        val newFmt = f.toString.replace("%t", "%s").replace("%v", "%s")
        val newArgs = a.drop(1).zip(verbs).map {
          case (arg, "%t" | "%v") => fn("string", arg)
          case (arg, _)           => arg
        }
        fn("format_string", lit(newFmt) +: newArgs: _*)
      case _ => fn("format_string", a: _*)
    }),
    // CHARINDEX(sub, str[, start]) → 0-based index, -1 when absent,
    // NULL start → NULL
    "CHARINDEX" -> (a => {
      val start = if (a.size >= 3) a(2) else lit(0L)
      // locate(sub, str, pos1based) is 1-based; 0 when absent
      val loc = fn("locate", a(0), a(1), fn("+", fn("int", start), lit(1)))
      val res = fn("-", loc, lit(1))
      if (a.size >= 3) If(IsNull(a(2)), Literal(null, LongType), fn("bigint", res))
      else res
    }),
    // STR(num [,len [,dec]]): SQL-Server-style right-justified fixed-point
    // rendering; overflow → all '*' (`inbuiltfunctionsstring.go:812-868`)
    "STR" -> (a => {
      val len = if (a.size >= 2) a(1) else lit(10L)
      val dec = if (a.size >= 3) a(2) else lit(0L)
      val fmt = fn("concat", lit("%"), fn("string", len), lit("."),
        fn("string", dec), lit("f"))
      val s = fn("format_string", fmt, fn("double", a(0)))
      If(IsNull(a(0)), Literal(null, StringType),
        If(org.apache.spark.sql.catalyst.expressions.GreaterThan(
            fn("length", s), fn("int", len)),
          fn("repeat", lit("*"), fn("int", len)), s))
    }),

    // --- date functions (`inbuiltfunctionsdate.go:194-720`) ---
    // timestamp params accept ints (epoch seconds) and strings via cast —
    // typesAreAssignmentCompatible's timestamp case (`expressiontypes.go:340`)
    "DATETIMEPART" -> (a => dateTimePart(a(0), asLtz(a(1)))),
    "DATETIMENAME" -> (a => dateTimeName(a(0), asLtz(a(1)))),
    "DATETIMEFROMPARTS" -> (a => {
      // y, m, d, hh, mm, ss, ms (`inbuiltfunctionsdate.go:277`)
      val frac = fn("+", fn("double", a(5)), fn("/", fn("double", a(6)), lit(1000.0)))
      def mk(y: Expression) =
        fn("make_timestamp", y, a(1), a(2), a(3), a(4), frac)
      // Go time.Date accepts proleptic year 0 (`defs_date_functions.go:360`
      // DateTimeFromPartsAllZeros) but Spark's make_timestamp requires
      // year >= 1 — so build 0-M-D as 4-M-D minus the exact 1461 days
      // between them (years 0 and 4 are both leap, 1-3 are not; UTC, so no
      // DST wrinkles)
      CaseWhen(Seq((fn("=", a(0), lit(0)),
        TimestampAdd("DAY", lit(-1461), mk(lit(4))))), Some(mk(a(0))))
    }),
    // DATETIMEADD(unit, n, ts) / DATETIMEDIFF(unit, ts1, ts2) with the
    // reference's unit codes (`inbuiltfunctionsdate.go:13-24,478-720`)
    "DATETIMEADD" -> (a => byUnit(a(0), u =>
      if (u == "NS") TimestampAdd("MICROSECOND", fn("div", a(1), lit(1000L)), asLtz(a(2)))
      else TimestampAdd(sparkUnit(u), a(1), asLtz(a(2))))),
    "DATETIMEDIFF" -> (a => byUnit(a(0), u =>
      if (u == "NS") fn("*", TimestampDiff("MICROSECOND", asLtz(a(1)), asLtz(a(2))), lit(1000L))
      else TimestampDiff(sparkUnit(u), asLtz(a(1)), asLtz(a(2))))),
    // reference DATE_TRUNC returns a STRING cut of the RFC3339 rendering
    // (`inbuiltfunctionsdate.go:564-660` — Go Format layouts per unit)
    "DATE_TRUNC" -> (a => {
      val ts = asLtz(a(1))
      def f(pat: String) = fn("date_format", ts, lit(pat))
      CaseWhen(Seq(
        (fn("=", fn("upper", a(0)), lit("YY")), f("yyyy")),
        (fn("=", fn("upper", a(0)), lit("M")), f("yyyy-MM")),
        (fn("=", fn("upper", a(0)), lit("D")), f("yyyy-MM-dd")),
        (fn("=", fn("upper", a(0)), lit("HH")), f("yyyy-MM-dd'T'HH")),
        (fn("=", fn("upper", a(0)), lit("MI")), f("yyyy-MM-dd'T'HH:mm")),
        (fn("=", fn("upper", a(0)), lit("S")), f("yyyy-MM-dd'T'HH:mm:ss")),
        (fn("=", fn("upper", a(0)), lit("MS")), f("yyyy-MM-dd'T'HH:mm:ss.SSS")),
        (fn("=", fn("upper", a(0)), lit("US")), f("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")),
        (fn("=", fn("upper", a(0)), lit("NS")), f("yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSS"))),
        // non-reference unit names (hour, day, month, …) fall through to the
        // Spark builtin as strings, so DataFrame-API pipelines sharing the
        // session registry keep Spark semantics
        Some(fn("string", fn("date_trunc", a(0), a(1)))))
    }),
    // VAR (`expressionagg.go:1111` — population variance, decimal(6) result,
    // float→decimal conversion truncates like pql.Decimal)
    "VAR" -> (a => truncDec(fn("var_pop", fn("double", a(0))) match {
      case f: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction =>
        f.toAggregateExpression()
      case other => other
    }, 6)),
    // TOTIMESTAMP(n [, unit]) — epoch number with unit s/ms/us/ns
    // (`inbuiltfunctionsdate.go:352`)
    "TOTIMESTAMP" -> (a => {
      val unit = if (a.size >= 2) a(1) else lit("s")
      CaseWhen(Seq(
        (fn("=", unit, lit("s")), fn("timestamp_seconds", a(0))),
        (fn("=", unit, lit("ms")), fn("timestamp_millis", a(0))),
        (fn("=", unit, lit("us")), fn("timestamp_micros", a(0))),
        (fn("=", unit, lit("µs")), fn("timestamp_micros", a(0))), // field.go TimeUnitUSeconds
        (fn("=", unit, lit("ns")), fn("timestamp_micros", fn("div", a(0), lit(1000L))))),
        Some(Literal(null)))
    }),

    // --- quantum functions (`inbuiltfunctionsquantum.go:43`) ---
    // RANGEQ(quantumSetCol, from, to): any member timestamp in the range,
    // bounds snapped outward to the quantum's finest unit (SURVEY §1.2;
    // PQL lowering `reference/sql3/planner/expressionpql.go:99-160`).
    "RANGEQ" -> (a => {
      if (a.length != 3)
        sys.error("'rangeq': count of formal parameters (3) does not match " +
          s"count of actual parameters (${a.length})")
      rangeq(a(0), a(1), a(2))
    }),
  )

  private def rangeq(setCol: Expression, from: Expression, to: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{And, GreaterThanOrEqual, LambdaFunction, LessThan, UnresolvedNamedLambdaVariable}
    import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
    // either bound may be NULL for an open range; both-null is the
    // reference's error (its own wording, typo included —
    // `sql3/planner/inbuiltfunctionsquantum.go` via defs_timequantum.go:127)
    def ldt(e: Expression) = e match {
      case Literal(null, _)       => None
      case Literal(v, StringType) => Some(graft.core.Quantum.parseLdt(v.toString))
      case other => sys.error(s"RANGEQ: from/to must be string literals, got $other")
    }
    val (fOpt, tOpt) = (ldt(from), ldt(to))
    if (fOpt.isEmpty && tOpt.isEmpty)
      sys.error("calling ranqeq() 'from' and 'to' parameters cannot both be null")
    // snap whichever bounds exist outward to the quantum's finest unit; an
    // open side simply contributes no predicate
    val m = UnresolvedNamedLambdaVariable(Seq("m"))
    val ts = asLtz(UnresolvedExtractValue(m, Literal("ts")))
    val preds = Seq(
      fOpt.map { f =>
        val (lo, _) = graft.core.Quantum.quantizeRange(f, f, "YMDH")
        GreaterThanOrEqual(ts, Literal(graft.core.Quantum.utc(lo)))
      },
      tOpt.map { t =>
        val (_, hi) = graft.core.Quantum.quantizeRange(t, t, "YMDH")
        LessThan(ts, Literal(graft.core.Quantum.utc(hi)))
      }).flatten
    val body = preds.reduce[Expression]((x, y) => And(x, y))
    fn("exists", setCol, LambdaFunction(body, Seq(m)))
  }

  /** The reference's interval codes (`inbuiltfunctionsdate.go:13-24`):
    * YY year, YD day-of-year, M month, D day, W weekDAY, WK iso week,
    * HH, MI, S, MS, US, NS. */
  private val unitCodes = Seq("YY", "YD", "M", "D", "W", "WK", "HH", "MI", "S", "MS", "US", "NS")

  private def sparkUnit(u: String): String = u match {
    case "YY" => "YEAR"; case "M" => "MONTH"; case "D" => "DAY"
    case "HH" => "HOUR"; case "MI" => "MINUTE"; case "S" => "SECOND"
    case "MS" => "MILLISECOND"; case "US" => "MICROSECOND"
    case other => other
  }

  /** Dispatch on a (usually-literal) unit-code argument. Constant folding
    * collapses the CaseWhen to the single taken branch at optimization time. */
  private def byUnit(unit: Expression, build: String => Expression): Expression =
    CaseWhen(
      unitCodes.map(u => (fn("=", fn("upper", unit), lit(u)), build(u))),
      Some(Literal(null)))

  /** DATETIMEPART values (`inbuiltfunctionsdate.go:194-275`); Go Weekday is
    * 0=Sunday, Spark dayofweek is 1=Sunday → shift. */
  private def dateTimePart(interval: Expression, ts: Expression): Expression =
    byUnit(interval, u => fn("bigint", u match { // reference returns int64
      case "YY" => fn("year", ts)
      case "YD" => fn("dayofyear", ts)
      case "M"  => fn("month", ts)
      case "D"  => fn("day", ts)
      case "W"  => fn("-", fn("dayofweek", ts), lit(1))
      case "WK" => fn("weekofyear", ts)
      case "HH" => fn("hour", ts)
      case "MI" => fn("minute", ts)
      case "S"  => fn("second", ts)
      // sub-second parts = fraction of the second (`date.Nanosecond()/k`);
      // Spark extract has no MICROSECOND field, so derive from unix_micros
      // (cast: unix_micros rejects TIMESTAMP_NTZ, which parquet ms-timestamps
      // load as; session TZ is UTC so the cast is value-preserving)
      case "MS" => fn("div", fn("mod", fn("unix_micros", asLtz(ts)), lit(1000000L)), lit(1000L))
      case "US" => fn("mod", fn("unix_micros", asLtz(ts)), lit(1000000L))
      case "NS" => fn("*", fn("mod", fn("unix_micros", asLtz(ts)), lit(1000000L)), lit(1000L))
    }))

  private def asLtz(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.types.TimestampType)

  /** Truncate (toward zero) to `scale` decimal places and fix the result
    * type — the reference's float→pql.Decimal conversion and DivideDecimal
    * both TRUNCATE rather than round (`reference/pql/decimal.go:150-160`).
    * Implemented as exact decimal remainder subtraction (codegen-friendly,
    * no UDF). */
  private[sql] def truncDec(e: Expression, scale: Int): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Remainder, Subtract}
    val wide = Cast(e, DecimalType(38, math.min(scale + 6, 37)))
    val step = Literal(java.math.BigDecimal.ONE.movePointLeft(scale))
    Cast(Subtract(wide, Remainder(wide, step)), DecimalType(38, scale))
  }

  /** DATETIMENAME: month/weekday return their English names, other parts the
    * numeric value as a string (`inbuiltfunctionsdate.go:399-477`). */
  private def dateTimeName(interval: Expression, ts: Expression): Expression = {
    val up = fn("upper", interval)
    CaseWhen(Seq(
      (fn("=", up, lit("M")), fn("date_format", ts, lit("MMMM"))),
      (fn("=", up, lit("W")), fn("date_format", ts, lit("EEEE")))),
      Some(fn("string", dateTimePart(interval, ts))))
  }

  /** Register all reference-dialect functions on the session (idempotent;
    * memoized — replacing a registered function logs a session-wide WARN per
    * function per call otherwise). */
  private val registered = new graft.core.SessionMemo[java.lang.Boolean]

  def register(spark: SparkSession): Unit =
    registered.runIfChanged(spark, java.lang.Boolean.TRUE) {
      val registry = spark.sessionState.functionRegistry
      aliases.foreach { case (name, builder) =>
        registry.createOrReplaceTempFunction(name.toLowerCase, builder, "built-in")
      }
    }
}
