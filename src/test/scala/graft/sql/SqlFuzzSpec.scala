package graft.sql

import graft.SparkSpec

/** Differential fuzzing of the SQL surface — the sibling of
  * `pql.EngineFuzzSpec`: hundreds of randomly generated reference-dialect
  * SELECT statements run through the full GraftSql pipeline (textual rewrite
  * → type check → Catalyst → dialect fixups) and compared row-for-row
  * against a NAIVE evaluator written directly from the reference's
  * expression semantics, sharing no code with the engine:
  *
  *  - three-valued logic (`sql3/planner/expression.go` binOp null checks:
  *    any null operand → null; AND/OR are Kleene)
  *  - INT ÷ INT is int64 division, Go truncation (`expression.go:419-423`)
  *  - `%`, `&`, `|` are Go int64 ops (sign of dividend, two's complement)
  *  - LIKE is case-insensitive with `%` → `.*` and `_` → `.+` — one OR
  *    MORE, not SQL's exactly-one (`expression.go:2991-3001`)
  *  - SETCONTAINS on stringsets is case-insensitive (strings.EqualFold,
  *    `inbuiltfunctionsset.go:166-168`); null set or value → null
  *  - BETWEEN/IN expand to comparisons under the same 3VL
  *
  * Aggregates (count/sum/min/max, grouped and not) are checked against
  * direct recomputation over the matching rows. Results compare as
  * multisets, so the engine's implicit ordering is irrelevant here.
  */
class SqlFuzzSpec extends SparkSpec {

  private case class R(id: Long, i1: Option[Long], i2: Option[Long],
      s1: Option[String], ss1: Option[Seq[String]], b1: Option[Boolean])

  private val strDomain = Vector("alpha", "Beta", "GAMMA", "delta", "Ep")
  private val tagDomain = Vector("Red", "green", "BLUE", "cyan")

  private lazy val recs: Seq[R] = {
    val rnd = new scala.util.Random(7)
    (0L until 150L).map { id =>
      R(id,
        if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(60).toLong - 20),
        if (rnd.nextInt(6) == 0) None else Some(rnd.nextInt(400).toLong - 100),
        if (rnd.nextInt(5) == 0) None else Some(strDomain(rnd.nextInt(strDomain.size))),
        if (rnd.nextInt(7) == 0) None
        else Some(Seq.fill(1 + rnd.nextInt(3))(tagDomain(rnd.nextInt(tagDomain.size))).distinct),
        if (rnd.nextInt(4) == 0) None else Some(rnd.nextBoolean()))
    }
  }

  /** Join dimension: k overlaps i1's domain, with duplicate keys (fan-out)
    * and nulls (never join-equal under 3VL). */
  private case class D(id: Long, k: Option[Long], name: Option[String])
  private lazy val dims: Seq[D] = {
    val rnd = new scala.util.Random(11)
    (0L until 40L).map { id =>
      D(id,
        if (rnd.nextInt(6) == 0) None else Some(rnd.nextInt(50).toLong - 20),
        if (rnd.nextInt(5) == 0) None else Some(s"n${rnd.nextInt(8)}"))
    }
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftSql.statement(spark,
      "CREATE TABLE IF NOT EXISTS fz (_id ID, i1 INT, i2 INT, s1 STRING, ss1 STRINGSET, b1 BOOL)")
    GraftSql.statement(spark,
      "CREATE TABLE IF NOT EXISTS fzd (_id ID, k INT, name STRING)")
    GraftSql.statement(spark,
      "INSERT INTO fzd (_id, k, name) VALUES " + dims.map(d =>
        s"(${d.id}, ${d.k.map(_.toString).getOrElse("NULL")}, " +
          s"${d.name.map("'" + _ + "'").getOrElse("NULL")})").mkString(", "))
    def lit(r: R): String = {
      def s(o: Option[String]) = o.map("'" + _ + "'").getOrElse("NULL")
      def l(o: Option[Long]) = o.map(_.toString).getOrElse("NULL")
      def ss(o: Option[Seq[String]]) =
        o.map(_.map("'" + _ + "'").mkString("[", ",", "]")).getOrElse("NULL")
      def b(o: Option[Boolean]) = o.map(_.toString).getOrElse("NULL")
      s"(${r.id}, ${l(r.i1)}, ${l(r.i2)}, ${s(r.s1)}, ${ss(r.ss1)}, ${b(r.b1)})"
    }
    recs.grouped(50).foreach { chunk =>
      GraftSql.statement(spark,
        "INSERT INTO fz (_id, i1, i2, s1, ss1, b1) VALUES " +
          chunk.map(lit).mkString(", "))
    }
  }

  override def afterAll(): Unit = {
    try {
      GraftSql.statement(spark, "DROP TABLE IF EXISTS fz")
      GraftSql.statement(spark, "DROP TABLE IF EXISTS fzd")
    } finally super.afterAll()
  }

  // ------------------------------------------------------------ expr model
  private sealed trait IE // int-valued
  private case object I1 extends IE
  private case object I2 extends IE
  private case class ILit(v: Long) extends IE
  private case class Bin(op: String, a: IE, b: IE) extends IE // + - * / % & |
  private case class Neg(a: IE) extends IE

  private sealed trait BE // bool-valued
  private case class Cmp(op: String, a: IE, b: IE) extends BE
  private case class SEq(v: String) extends BE          // s1 = 'v'
  private case class SLike(p: String) extends BE        // s1 like 'p'
  private case object B1 extends BE
  private case class IsNullE(col: String, not: Boolean) extends BE
  private case class InList(vs: Seq[Long]) extends BE   // i1 in (...)
  private case class Between(a: Long, b: Long) extends BE // i1 between a and b
  private case class SetHas(v: String) extends BE       // setcontains(ss1, 'v')
  private case class AndOr(or: Boolean, a: BE, b: BE) extends BE
  private case class NotE(a: BE) extends BE

  private case class StrFn(fn: String) extends IE // len(s1) | charindex('x', s1)

  private def genI(rnd: scala.util.Random, depth: Int): IE =
    if (depth == 0) rnd.nextInt(6) match {
      case 0 => I1
      case 1 => I2
      case 2 => StrFn("len")
      case 3 => StrFn("charindex")
      case _ => ILit(rnd.nextInt(19).toLong - 9)
    }
    else rnd.nextInt(8) match {
      case 0 => Neg(genI(rnd, depth - 1))
      case 1 => Bin("/", genI(rnd, depth - 1), ILit(1 + rnd.nextInt(7).toLong))
      case 2 => Bin("%", genI(rnd, depth - 1), ILit(1 + rnd.nextInt(7).toLong))
      case 3 => Bin("&", genI(rnd, depth - 1), genI(rnd, depth - 1))
      case 4 => Bin("|", genI(rnd, depth - 1), genI(rnd, depth - 1))
      case 5 => Bin("*", genI(rnd, depth - 1), ILit(rnd.nextInt(5).toLong - 2))
      case _ => Bin(if (rnd.nextBoolean()) "+" else "-",
        genI(rnd, depth - 1), genI(rnd, depth - 1))
    }

  private val likePats = Vector("a%", "%a%", "%A", "_lpha", "be_a", "%e%a%", "g%a", "d_lta", "%")

  private def genB(rnd: scala.util.Random, depth: Int): BE =
    if (depth == 0) rnd.nextInt(8) match {
      case 0 => Cmp(Seq("=", "!=", "<", "<=", ">", ">=")(rnd.nextInt(6)),
        genI(rnd, 1), genI(rnd, 1))
      case 1 => SEq((if (rnd.nextBoolean()) strDomain else
        Vector("ALPHA", "beta", "zzz"))(rnd.nextInt(3)))
      case 2 => B1
      case 3 => IsNullE(Seq("i1", "i2", "s1", "b1", "ss1")(rnd.nextInt(5)), rnd.nextBoolean())
      case 4 => InList(Seq.fill(1 + rnd.nextInt(4))(rnd.nextInt(40).toLong - 15))
      case 5 => Between(rnd.nextInt(30).toLong - 15, rnd.nextInt(40).toLong - 10)
      case 6 => SetHas((tagDomain ++ Vector("RED", "blue", "nope"))(rnd.nextInt(7)))
      case _ => SLike(likePats(rnd.nextInt(likePats.size)))
    }
    else rnd.nextInt(4) match {
      case 0 => NotE(genB(rnd, depth - 1))
      case 1 | 2 => AndOr(rnd.nextBoolean(), genB(rnd, depth - 1), genB(rnd, depth - 1))
      case _ => genB(rnd, 0)
    }

  // ------------------------------------------------------------ rendering
  private def sqlI(e: IE): String = e match {
    case I1 => "i1"
    case I2 => "i2"
    case StrFn("len") => "len(s1)"
    case StrFn(_) => "charindex('a', s1)" // 0-based, -1 when absent
    case ILit(v) => if (v < 0) s"(0 - ${-v})" else v.toString
    case Bin(op, a, b) => s"(${sqlI(a)} $op ${sqlI(b)})"
    case Neg(a) => s"(0 - ${sqlI(a)})" // avoids `--` comment ambiguity
  }

  private def sqlB(e: BE): String = e match {
    case Cmp(op, a, b) => s"(${sqlI(a)} $op ${sqlI(b)})"
    case SEq(v) => s"(s1 = '$v')"
    case SLike(p) => s"(s1 like '$p')"
    case B1 => "(b1 = true)"
    case IsNullE(c, true) => s"($c is not null)"
    case IsNullE(c, false) => s"($c is null)"
    case InList(vs) => s"(i1 in (${vs.mkString(", ")}))"
    case Between(a, b) => s"(i1 between $a and $b)"
    case SetHas(v) => s"(setcontains(ss1, '$v'))"
    case AndOr(or, a, b) => s"(${sqlB(a)} ${if (or) "or" else "and"} ${sqlB(b)})"
    case NotE(a) => s"(not ${sqlB(a)})"
  }

  // ------------------------------------------------------------ evaluator
  private def evalI(e: IE, r: R): Option[Long] = e match {
    case I1 => r.i1
    case I2 => r.i2
    case StrFn("len") => r.s1.map(_.length.toLong)
    // reference CHARINDEX is Go strings.Index: 0-based, case-sensitive,
    // -1 when absent (`inbuiltfunctionsstring.go:727`) — Java indexOf
    case StrFn(_) => r.s1.map(_.indexOf("a").toLong)
    case ILit(v) => Some(v)
    case Neg(a) => evalI(a, r).map(0L - _)
    case Bin(op, a, b) =>
      for (x <- evalI(a, r); y <- evalI(b, r)) yield op match {
        case "+" => x + y
        case "-" => x - y
        case "*" => x * y
        case "/" => x / y // Go int64 division == JVM: trunc toward zero
        case "%" => x % y // Go == JVM: sign of dividend
        case "&" => x & y
        case "|" => x | y
      }
  }

  private def evalB(e: BE, r: R): Option[Boolean] = e match {
    case Cmp(op, a, b) =>
      for (x <- evalI(a, r); y <- evalI(b, r)) yield op match {
        case "=" => x == y;  case "!=" => x != y
        case "<" => x < y;   case "<=" => x <= y
        case ">" => x > y;   case ">=" => x >= y
      }
    case SEq(v) => r.s1.map(_ == v)
    case SLike(p) =>
      val re = ("(?i)^" + p.replace("%", ".*").replace("_", ".+") + "$").r
      r.s1.map(s => re.findFirstIn(s).isDefined)
    case B1 => r.b1.map(_ == true)
    case IsNullE(c, not) =>
      val isNull = c match {
        case "i1" => r.i1.isEmpty
        case "i2" => r.i2.isEmpty
        case "s1" => r.s1.isEmpty
        case "b1" => r.b1.isEmpty
        case "ss1" => r.ss1.isEmpty
      }
      Some(isNull != not)
    case InList(vs) => r.i1.map(vs.contains)
    case Between(a, b) => r.i1.map(x => x >= a && x <= b)
    case SetHas(v) => r.ss1.map(_.exists(_.equalsIgnoreCase(v)))
    case AndOr(false, a, b) => (evalB(a, r), evalB(b, r)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true))            => Some(true)
      case _                                   => None
    }
    case AndOr(true, a, b) => (evalB(a, r), evalB(b, r)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false))        => Some(false)
      case _                                 => None
    }
    case NotE(a) => evalB(a, r).map(!_)
  }

  // ------------------------------------------------------------ harness
  private def canon(v: Any): Any = v match {
    case d: java.math.BigDecimal if d.stripTrailingZeros.scale <= 0 =>
      d.longValueExact
    case d: java.math.BigDecimal => d.doubleValue
    case i: java.lang.Integer => i.longValue
    case x => x
  }

  private def collectRows(q: String): Seq[Seq[Any]] =
    GraftSql.statement(spark, q).collect()
      .map(_.toSeq.map(canon)).toSeq

  private def asMultiset(rows: Seq[Seq[Any]]): Map[Seq[Any], Int] =
    rows.groupBy(identity).map { case (k, v) => k -> v.size }

  test("differential fuzz: 420 generated SQL statements vs naive evaluator") {
    val n = sys.env.getOrElse("SPARK_GRAFT_SQL_FUZZ_N", "420").toInt
    val rnd = new scala.util.Random(
      sys.env.get("SPARK_GRAFT_SQL_FUZZ_SEED").map(_.toLong)
        .getOrElse(20260814L))
    var rowQ = 0; var aggQ = 0; var grpQ = 0
    (1 to n).foreach { k =>
      val pred = genB(rnd, 1 + rnd.nextInt(2))
      val matches = recs.filter(r => evalB(pred, r).contains(true))
      def ctx[T](q: String)(f: => T): T =
        try f catch { case e: Throwable =>
          throw new AssertionError(s"#$k over: $q\n$e", e) }
      rnd.nextInt(10) match {
        case 6 => // INNER/LEFT join on int keys (nested-loop semantics,
          // `opnestedloops.go:15` — nulls never join-equal, LEFT null-extends)
          rowQ += 1
          val left = rnd.nextBoolean()
          val kind = if (left) "left" else "inner"
          val q = s"select fz._id as fid, fzd.name as nm from fz " +
            s"$kind join fzd on fz.i1 = fzd.k where ${sqlB(pred)}"
          ctx(q) {
            val got = asMultiset(collectRows(q))
            val want = asMultiset(matches.flatMap { r =>
              val ds = r.i1.toSeq.flatMap(v => dims.filter(_.k.contains(v)))
              if (ds.nonEmpty) ds.map(d => Seq[Any](r.id, d.name.orNull))
              else if (left) Seq(Seq[Any](r.id, null))
              else Nil
            })
            assert(got == want, s"#$k join mismatch for: $q")
          }
        case 7 => // join + grouped aggregate over the dimension attribute
          grpQ += 1
          val q = "select fzd.name as nm, count(*) as c from fz " +
            s"inner join fzd on fz.i1 = fzd.k where ${sqlB(pred)} " +
            "and (fzd.name is not null) group by fzd.name"
          ctx(q) {
            val got = asMultiset(collectRows(q))
            val want = asMultiset(matches.flatMap { r =>
              r.i1.toSeq.flatMap(v => dims.filter(_.k.contains(v))).flatMap(_.name)
            }.groupBy(identity).toSeq.map { case (nm, xs) =>
              Seq[Any](nm, xs.size.toLong)
            })
            assert(got == want, s"#$k join-group mismatch for: $q")
          }
        case 9 => // ORDER BY + TOP through the full pipeline, compared as
          // an ORDERED list (null keys filtered out so the comparison is
          // total without modeling the reference's null placement)
          rowQ += 1
          val desc = rnd.nextBoolean()
          val dir = if (desc) "desc" else "asc"
          val q = s"select top(10) _id, i1 from fz where (i1 is not null) " +
            s"and (${sqlB(pred)}) order by i1 $dir, _id asc"
          ctx(q) {
            val got = collectRows(q)
            val base = matches.filter(_.i1.isDefined)
            val sorted =
              if (desc) base.sortBy(r => (-r.i1.get, r.id))
              else base.sortBy(r => (r.i1.get, r.id))
            val want = sorted.take(10).map(r => Seq[Any](r.id, r.i1.get))
            assert(got == want, s"#$k order-by mismatch for: $q")
          }
        case 8 => // DISTINCT projection
          rowQ += 1
          val q = s"select distinct s1, b1 from fz where ${sqlB(pred)}"
          ctx(q) {
            val got = asMultiset(collectRows(q))
            val want = asMultiset(matches
              .map(r => Seq[Any](r.s1.orNull, r.b1.map(Boolean.box).orNull))
              .distinct)
            assert(got == want, s"#$k distinct mismatch for: $q")
          }
        case 5 => // string functions + CASE WHEN (3VL: null pred → ELSE)
          rowQ += 1
          val bp = genB(rnd, 1)
          val q = "select _id, upper(s1) as u, reverse(s1) as rv, " +
            "replaceall(s1, 'a', 'z') as rp, " +
            s"(case when ${sqlB(bp)} then 'T' else 'F' end) as c " +
            s"from fz where ${sqlB(pred)}"
          ctx(q) {
            val got = asMultiset(collectRows(q))
            val want = asMultiset(matches.map { r =>
              Seq[Any](r.id,
                r.s1.map(_.toUpperCase).orNull,
                r.s1.map(_.reverse).orNull,
                r.s1.map(_.replace("a", "z")).orNull,
                if (evalB(bp, r).contains(true)) "T" else "F")
            })
            assert(got == want, s"#$k string-fn mismatch for: $q")
          }
        case 0 | 1 => // row-wise projection
          rowQ += 1
          val proj = genI(rnd, 1 + rnd.nextInt(2))
          val q = s"select _id, ${sqlI(proj)} as v from fz where ${sqlB(pred)}"
          ctx(q) {
            val got = asMultiset(collectRows(q))
            val want = asMultiset(matches.map(r =>
              Seq[Any](r.id, evalI(proj, r).map(Long.box).orNull)))
            assert(got == want, s"#$k rows mismatch for: $q")
          }
        case 2 => // row-wise boolean projection
          rowQ += 1
          val bp = genB(rnd, 1)
          val q = s"select _id, ${sqlB(bp)} as v from fz where ${sqlB(pred)}"
          ctx(q) {
            val got = asMultiset(collectRows(q))
            val want = asMultiset(matches.map(r =>
              Seq[Any](r.id, evalB(bp, r).map(Boolean.box).orNull)))
            assert(got == want, s"#$k rows mismatch for: $q")
          }
        case 3 => // ungrouped aggregates
          aggQ += 1
          val e = genI(rnd, 1)
          val q = s"select count(*) as c, sum(${sqlI(e)}) as s, " +
            s"min(${sqlI(e)}) as mn, max(${sqlI(e)}) as mx " +
            s"from fz where ${sqlB(pred)}"
          ctx(q) {
            val got = collectRows(q)
            val vals = matches.flatMap(r => evalI(e, r))
            val want = Seq(Seq[Any](matches.size.toLong,
              if (vals.isEmpty) null else Long.box(vals.sum),
              if (vals.isEmpty) null else Long.box(vals.min),
              if (vals.isEmpty) null else Long.box(vals.max)))
            assert(got == want, s"#$k agg mismatch for: $q\n got $got\n want $want")
          }
        case _ => // grouped aggregates over s1, sometimes with HAVING
          grpQ += 1
          val e = genI(rnd, 1)
          val minC = if (rnd.nextInt(3) == 0) Some(1 + rnd.nextInt(20)) else None
          val having = minC.map(c => s" having count(*) >= $c").getOrElse("")
          val q = s"select s1 as g, count(*) as c, sum(${sqlI(e)}) as s " +
            s"from fz where ${sqlB(pred)} and (s1 is not null) group by s1$having"
          ctx(q) {
            val got = asMultiset(collectRows(q))
            val want = asMultiset(
              matches.filter(_.s1.isDefined).groupBy(_.s1.get).toSeq
                .filter { case (_, rs) => minC.forall(rs.size >= _) }
                .map { case (g, rs) =>
                  val vals = rs.flatMap(r => evalI(e, r))
                  Seq[Any](g, rs.size.toLong,
                    if (vals.isEmpty) null else Long.box(vals.sum))
                })
            assert(got == want, s"#$k grouped mismatch for: $q")
          }
      }
    }
    info(s"fuzzed $rowQ row-wise, $aggQ aggregate, $grpQ grouped statements")
  }
}
