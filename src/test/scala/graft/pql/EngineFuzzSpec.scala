package graft.pql

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Differential fuzzing of the ENGINE (not just the wire codec —
  * ProtoPropertySpec covers that): hundreds of randomly generated PQL
  * programs run through parser + compiler + Catalyst, and every result is
  * checked against a NAIVE in-memory interpreter written directly from the
  * reference's semantics (`reference/executor.go` —
  * `executeRowShard`/`executeCount`/`executeSum`/bitmap algebra). The
  * interpreter shares no code with the compiler, so agreement is evidence of
  * semantic correctness, not of consistent bugs.
  *
  * Semantics encoded independently here:
  *  - Row(f=v) misses null cells; set fields match by membership
  *  - Not(a) = existing ∧ ¬a; All() = every existing record
  *  - Difference = a ∧ ¬b (left-anchored over the record space)
  *  - Sum/Min/Max aggregate the field over matching records, skipping null
  *    field values, and carry the reference's (value, count) shape
  */
class EngineFuzzSpec extends SparkSpec {

  private case class Rec(id: Long, i: Option[Long], j: Option[Long],
      s: Option[String], ss: Seq[String], b: Option[Boolean])

  // deterministic 240-record fixture: nulls, skew, empty sets, negatives
  private lazy val recs: Seq[Rec] = {
    val rnd = new scala.util.Random(42)
    (0L until 240L).map { id =>
      Rec(id,
        if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(40).toLong - 10),
        if (rnd.nextInt(7) == 0) None else Some(rnd.nextInt(1000).toLong),
        if (rnd.nextInt(6) == 0) None else Some("v" + rnd.nextInt(8)),
        Seq.fill(rnd.nextInt(4))("t" + rnd.nextInt(6)).distinct,
        if (rnd.nextInt(4) == 0) None else Some(rnd.nextBoolean()))
    }
  }

  private lazy val df = {
    val schema = StructType(Seq(
      StructField("_id", LongType, nullable = false),
      StructField("i", LongType), StructField("j", LongType),
      StructField("s", StringType),
      StructField("ss", ArrayType(StringType), nullable = false),
      StructField("b", BooleanType)))
    val rows = recs.map(r => Row(r.id, r.i.map(Long.box).orNull,
      r.j.map(Long.box).orNull, r.s.orNull, r.ss, r.b.map(Boolean.box).orNull))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema).cache()
  }

  // ---------------------------------------------------- program model
  private sealed trait P
  private case class RowEq(f: String, v: String) extends P
  private case class RowCmp(f: String, op: String, v: Long) extends P
  private case class RowBetween(f: String, lo: Long, hi: Long) extends P
  private case class RowNull(f: String, isNull: Boolean) extends P
  private case class BoolOp(op: String, args: Seq[P]) extends P
  private case class NotP(a: P) extends P
  private case object AllP extends P

  private def genP(rnd: scala.util.Random, depth: Int): P =
    if (depth == 0) rnd.nextInt(6) match {
      case 0 => RowEq("s", "'v" + rnd.nextInt(9) + "'")
      case 1 => RowEq("ss", "'t" + rnd.nextInt(7) + "'")
      case 2 => RowCmp("i", Seq(">", ">=", "<", "<=", "=")(rnd.nextInt(5)),
        rnd.nextInt(40).toLong - 10)
      case 3 => RowBetween("i", rnd.nextInt(20).toLong - 10,
        rnd.nextInt(30).toLong)
      case 4 => RowNull(Seq("i", "s", "b")(rnd.nextInt(3)), rnd.nextBoolean())
      case _ => RowEq("b", rnd.nextBoolean().toString)
    }
    else rnd.nextInt(4) match {
      case 0 => genP(rnd, 0)
      case 1 => NotP(genP(rnd, depth - 1))
      case 2 => AllP
      case _ =>
        val op = Seq("Intersect", "Union", "Difference", "Xor")(rnd.nextInt(4))
        BoolOp(op, Seq(genP(rnd, depth - 1), genP(rnd, depth - 1)))
    }

  private def pqlOf(p: P): String = p match {
    case RowEq(f, v)          => s"Row($f=$v)"
    case RowCmp(f, "=", v)    => s"Row($f == $v)"
    case RowCmp(f, op, v)     => s"Row($f $op $v)"
    case RowBetween(f, lo, hi) => s"Row($f >< [$lo, $hi])"
    case RowNull(f, true)     => s"Row($f=null)"
    case RowNull(f, false)    => s"Row($f!=null)"
    case BoolOp(op, args)     => s"$op(${args.map(pqlOf).mkString(", ")})"
    case NotP(a)              => s"Not(${pqlOf(a)})"
    case AllP                 => "All()"
  }

  /** The naive interpreter — straight from the reference's bitmap rules. */
  private def eval(p: P, r: Rec): Boolean = p match {
    case RowEq("s", v)  => r.s.contains(v.stripPrefix("'").stripSuffix("'"))
    case RowEq("ss", v) => r.ss.contains(v.stripPrefix("'").stripSuffix("'"))
    case RowEq("b", v)  => r.b.contains(v.toBoolean)
    case RowEq(f, v)    => sys.error(s"leaf $f")
    case RowCmp("i", op, v) => r.i.exists(x => op match {
      case ">" => x > v; case ">=" => x >= v; case "<" => x < v
      case "<=" => x <= v; case "=" => x == v
    })
    case RowCmp(f, _, _) => sys.error(s"leaf $f")
    case RowBetween("i", lo, hi) => r.i.exists(x => x >= lo && x <= hi)
    case RowBetween(f, _, _) => sys.error(s"leaf $f")
    case RowNull("i", n) => r.i.isEmpty == n
    case RowNull("s", n) => r.s.isEmpty == n
    case RowNull("b", n) => r.b.isEmpty == n
    case RowNull(f, _)   => sys.error(s"leaf $f")
    case BoolOp("Intersect", a)  => a.forall(eval(_, r))
    case BoolOp("Union", a)      => a.exists(eval(_, r))
    case BoolOp("Difference", a) => eval(a.head, r) && !a.tail.exists(eval(_, r))
    case BoolOp("Xor", Seq(a, b)) => eval(a, r) ^ eval(b, r)
    case BoolOp(op, _)           => sys.error(s"op $op")
    case NotP(a)                 => !eval(a, r)
    case AllP                    => true
  }

  private def compile(q: String) =
    new Compiler(df).run(Parser.parseOne(q))

  test("differential fuzz: 520 generated PQL programs vs naive interpreter") {
    val rnd = new scala.util.Random(
      sys.env.get("SPARK_GRAFT_PQL_FUZZ_SEED").map(_.toLong)
        .getOrElse(20260814L))
    val nFuzz = sys.env.getOrElse("SPARK_GRAFT_PQL_FUZZ_N", "520").toInt
    var counts = 0; var sums = 0; var aggs = 0
    (1 to nFuzz).foreach { k =>
      val p = genP(rnd, 1 + rnd.nextInt(3))
      val matches = recs.filter(eval(p, _))
      def ctx[T](f: => T): T =
        try f catch { case e: Throwable =>
          throw new AssertionError(s"#$k over ${pqlOf(p)}: $e", e) }
      ctx {
      rnd.nextInt(12) match {
        case 9 => // Limit: ids in _id order, paged
          val off = rnd.nextInt(4)
          val lim = 1 + rnd.nextInt(6)
          val want = matches.map(_.id).sorted.slice(off, off + lim)
          val got = compile(s"Limit(${pqlOf(p)}, limit=$lim, offset=$off)")
            .collect().map(_.getLong(0)).toSeq
          assert(got == want, s"#$k Limit($lim,$off): got $got want $want")
        case 10 => // Sort by BSI field: (_id, i) by (value, _id), Spark null
          // convention (asc nulls first / desc nulls last), optional limit
          val desc = rnd.nextBoolean()
          val lim = 1 + rnd.nextInt(8)
          // asc = nulls first (None < Some); desc = full reverse of that =
          // values descending, nulls last — Spark's orderBy convention
          val key: Ordering[(Option[Long], Long)] =
            Ordering.Tuple2(
              if (desc) Ordering.Option(Ordering.Long).reverse
              else Ordering.Option(Ordering.Long),
              Ordering.Long)
          val want = matches.map(r => (r.i, r.id)).sorted(key)
            .take(lim).map { case (i, id) => (id, i.map(Long.box).orNull) }
          val got = compile(
            s"Sort(${pqlOf(p)}, field=i, sort-desc=$desc, limit=$lim)")
            .collect().map(r => (r.getLong(0),
              if (r.isNullAt(1)) null else Long.box(r.getLong(1)))).toSeq
          assert(got == want, s"#$k Sort(desc=$desc,lim=$lim): got $got want $want")
        case 11 => // FieldValue point read
          val id = rnd.nextInt(recs.size + 5).toLong
          val want = recs.find(_.id == id).flatMap(_.i)
          val rows = compile(s"FieldValue(field=i, column=$id)").collect()
          val got = rows.headOption.filterNot(_.isNullAt(0)).map(_.getLong(0))
          assert(got == want, s"#$k FieldValue($id): got $got want $want")
        case 7 => // GroupBy over a scalar field: (group, cnt)
          val got = compile(s"GroupBy(Rows(s), filter=${pqlOf(p)})")
            .collect().map(r => (r.getString(0), r.getLong(1))).toSet
          val want = matches.flatMap(_.s).groupBy(identity)
            .map { case (v, vs) => (v, vs.size.toLong) }.toSet
          assert(got == want, s"#$k GroupBy(s): got $got want $want")
        case 8 => // GroupBy over a SET field with Sum: (group, cnt, sum)
          val got = compile(
            s"GroupBy(Rows(ss), filter=${pqlOf(p)}, aggregate=Sum(field=j))")
            .collect().map(r => (r.getString(0), r.getLong(1),
              if (r.isNullAt(2)) null else Long.box(r.getLong(2)))).toSet
          val want = matches.flatMap(r => r.ss.map(_ -> r)).groupBy(_._1)
            .map { case (tag, prs) =>
              val js = prs.map(_._2).flatMap(_.j)
              (tag, prs.size.toLong,
                if (js.isEmpty) null else Long.box(js.sum))
            }.toSet
          assert(got == want, s"#$k GroupBy(ss, Sum(j)): got $got want $want")
        case 4 => // Distinct over a scalar or set field
          val (f, want0) =
            if (rnd.nextBoolean()) ("s", matches.flatMap(_.s))
            else ("ss", matches.flatMap(_.ss))
          val want = want0.distinct.sorted
          val got = compile(s"Distinct(${pqlOf(p)}, field=$f)")
            .collect().map(_.getString(0)).toSeq
          assert(got == want, s"#$k Distinct($f): got $got want $want")
        case 5 => // TopN with filter (exact counts, (cnt desc, val asc) order)
          val n = 1 + rnd.nextInt(4)
          val (f, data) =
            if (rnd.nextBoolean()) ("s", matches.flatMap(_.s))
            else ("ss", matches.flatMap(_.ss))
          val want = data.groupBy(identity).toSeq
            .map { case (v, vs) => (v, vs.size.toLong) }
            .sortBy { case (v, c) => (-c, v) }.take(n)
          val got = compile(s"TopN(${pqlOf(p)}, $f, n=$n)")
            .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
          assert(got == want, s"#$k TopN($f, n=$n): got $got want $want")
        case 6 => // Extract: (_id, i, s) for matching records, _id order
          val want = matches.sortBy(_.id).map(r =>
            (r.id, r.i.map(Long.box).orNull, r.s.orNull))
          val got = compile(s"Extract(${pqlOf(p)}, Rows(i), Rows(s))")
            .collect().map(r => (r.getLong(0),
              if (r.isNullAt(1)) null else Long.box(r.getLong(1)),
              if (r.isNullAt(2)) null else r.getString(2))).toSeq
          assert(got == want, s"#$k Extract: got ${got.take(5)}… want ${want.take(5)}…")
        case m => m match {
        case 0 | 1 => // Count
          counts += 1
          val got = compile(s"Count(${pqlOf(p)})").collect()(0).getLong(0)
          assert(got == matches.size,
            s"#$k Count(${pqlOf(p)}): got $got want ${matches.size}")
        case 2 => // Sum over j
          sums += 1
          val want = matches.flatMap(_.j)
          val rows = compile(s"Sum(${pqlOf(p)}, field=j)").collect()
          // an all-null/empty aggregate may answer no row or a null row
          val got = rows.headOption.filterNot(_.isNullAt(0))
            .map(r => (r.getLong(0), r.getLong(1)))
          val expect = if (want.isEmpty) None else Some((want.sum, want.size.toLong))
          assert(got == expect,
            s"#$k Sum(${pqlOf(p)}, field=j): got $got want $expect")
        case _ => // Min or Max over i
          aggs += 1
          val (call, pick) =
            if (rnd.nextBoolean()) ("Min", (xs: Seq[Long]) => xs.min)
            else ("Max", (xs: Seq[Long]) => xs.max)
          val want = matches.flatMap(_.i)
          val rows = compile(s"$call(${pqlOf(p)}, field=i)").collect()
          val got = rows.headOption.filterNot(_.isNullAt(0))
            .map(r => (r.getLong(0), r.getLong(1)))
          val expect =
            if (want.isEmpty) None
            else { val v = pick(want); Some((v, want.count(_ == v).toLong)) }
          assert(got == expect,
            s"#$k $call(${pqlOf(p)}): got $got want $expect")
      }
      }
      }
    }
    info(s"fuzzed $counts Count, $sums Sum, $aggs Min/Max programs")
  }
}
