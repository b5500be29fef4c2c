package graft.sql

import graft.SparkSpec
import graft.sql.GoldenDefs._
import scala.collection.mutable

/** Executes the parsed golden corpus against the engine, replicating the
  * reference runner's semantics (`sql3/sql_test.go:34-160`): one shared
  * engine session, TableTests in registry order (later tests query earlier
  * tests' tables), per-case compare modes exactOrdered / exactUnordered /
  * includedIn / comparePartial, expected-error containment matching. */
object GoldenRunner {

  case class CaseResult(table: String, name: String, sql: String,
      category: String, detail: String) {
    def ok: Boolean = category == "pass"
    def key: String = s"$table/$name/${sql.take(120)}"
  }

  // ------------------------------------------------------------- value compare
  private def numEq(a: Double, b: Double): Boolean =
    a == b || math.abs(a - b) <= 1e-9 * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  private def toLongOpt(act: Any): Option[Long] = act match {
    case l: Long  => Some(l)
    case i: Int   => Some(i.toLong)
    case s: Short => Some(s.toLong)
    case b: Byte  => Some(b.toLong)
    case _        => None
  }

  private def micros(act: Any): Option[Long] = act match {
    case t: java.sql.Timestamp =>
      Some(t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L)
    case i: java.time.Instant =>
      Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    case l: java.time.LocalDateTime =>
      val i = l.toInstant(java.time.ZoneOffset.UTC)
      Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    case _ => None
  }

  def valEq(exp: V, act: Any): Boolean = (exp, act) match {
    case (VNull, null) => true
    case (VNull, _)    => false
    case (_, null)     => false
    case (VLong(e), a) => toLongOpt(a) match {
      case Some(l) => e == l
      case None => a match {
        case d: java.math.BigDecimal => d.compareTo(java.math.BigDecimal.valueOf(e)) == 0
        case d: Double               => numEq(e.toDouble, d)
        case _                       => false
      }
    }
    case (VDouble(e), a) => a match {
      case d: Double               => numEq(e, d)
      case f: Float                => numEq(e, f.toDouble)
      case d: java.math.BigDecimal => numEq(e, d.doubleValue)
      case _                       => toLongOpt(a).exists(l => numEq(e, l.toDouble))
    }
    case (VDec(u, s), a) =>
      val e = new java.math.BigDecimal(new java.math.BigInteger(u.toString), s)
      a match {
        case d: java.math.BigDecimal => d.compareTo(e) == 0
        case d: Double               => numEq(e.doubleValue, d)
        case _                       => toLongOpt(a).exists(l => e.compareTo(java.math.BigDecimal.valueOf(l)) == 0)
      }
    case (VStr(e), s: String)   => e == s
    case (VBool(e), b: Boolean) => e == b
    case (VTime(ns), a) =>
      val actMicros = micros(a).orElse(a match {
        // reference timestamps sometimes surface as RFC3339 strings
        case s: String => scala.util.Try(java.time.OffsetDateTime.parse(s).toInstant)
          .toOption.map(i => i.getEpochSecond * 1000000L + i.getNano / 1000L)
        case _ => None
      })
      actMicros.contains((ns / 1000L).toLong)
    case (VLongs(es), s: scala.collection.Seq[_]) =>
      val actL = s.flatMap(toLongOpt).sorted
      actL.size == s.size && es.sorted == actL.toList
    case (VStrs(es), s: scala.collection.Seq[_]) =>
      s.forall(_.isInstanceOf[String]) &&
        es.sorted == s.map(_.asInstanceOf[String]).sorted.toList
    case _ => false
  }

  def rowEq(exp: List[V], act: Seq[Any]): Boolean =
    exp.size == act.size && exp.zip(act).forall { case (e, a) => valEq(e, a) }

  /** exactUnordered: greedy multiset bipartite match (rows are small). */
  private def multisetMatch(exp: List[List[V]], act: Seq[Seq[Any]]): Boolean = {
    if (exp.size != act.size) return false
    val used = Array.fill(act.size)(false)
    exp.forall { e =>
      val i = act.indices.find(i => !used(i) && rowEq(e, act(i)))
      i.foreach(used(_) = true)
      i.isDefined
    }
  }

  // ---------------------------------------------------------------- execution
  private def errText(t: Throwable): String = {
    val b = new StringBuilder
    var cur: Throwable = t
    var depth = 0
    while (cur != null && depth < 8) {
      b ++= cur.toString; b += '\n'
      cur = cur.getCause; depth += 1
    }
    b.toString
  }

  def runCase(spark: org.apache.spark.sql.SparkSession, tt: TableTest,
      c: SqlCase, sql: String): CaseResult = {
    def res(cat: String, detail: String) = CaseResult(tt.varName, c.name, sql, cat, detail)
    val attempt = scala.util.Try {
      val df = GraftSql.statement(spark, sql)
      (df.columns.toSeq, df.collect().map(_.toSeq).toSeq)
    }
    (attempt, c.expErr) match {
      case (scala.util.Failure(t), Some(err)) =>
        if (errText(t).contains(err)) res("pass", "")
        else res("err-text", s"expected <$err> got <${errText(t).linesIterator.take(3).mkString(" | ").take(400)}>")
      case (scala.util.Success(_), Some(err)) =>
        res("err-missing", s"expected error <$err>, statement succeeded")
      case (scala.util.Failure(t), None) =>
        res("unexpected-error", errText(t).linesIterator.take(3).mkString(" | ").take(400))
      case (scala.util.Success((cols, rows)), None) =>
        val expRowsOpt = c.rows.orElse(c.rowsPlus1.headOption)
        expRowsOpt match {
          case None => res("pass", "") // nothing to compare (DDL ack etc.)
          case Some(exp0) =>
            // accept any of the ExpRowsPlus1 variants too
            val variants = (c.rows.toList ++ c.rowsPlus1).distinct match {
              case Nil => List(exp0)
              case vs  => vs
            }
            val expNames = c.hdrs.map(_.name).filter(_.nonEmpty)
            val missing = expNames.filterNot(n => cols.exists(_.equalsIgnoreCase(n)))
            val hdrProblem =
              if (c.hdrs.nonEmpty && c.hdrs.size != cols.size)
                Some(s"expected ${c.hdrs.size} columns ${c.hdrs.map(_.name)}, got ${cols.size} $cols")
              else if (missing.nonEmpty) Some(s"missing columns $missing in $cols")
              else None
            // Reference runner reorders expected cells into the result's
            // column order by header name before comparing
            def reorder(exp: List[List[V]]): List[List[V]] = {
              if (c.hdrs.isEmpty || c.hdrs.size != cols.size) exp
              else {
                val names = c.hdrs.map(_.name)
                if (names.exists(_.isEmpty) || names.distinct.size != names.size) exp
                else if (!names.forall(n => cols.exists(_.equalsIgnoreCase(n)))) exp
                else {
                  val perm = cols.map(cn => names.indexWhere(_.equalsIgnoreCase(cn))).toList
                  if (perm.sorted == names.indices.toList)
                    exp.map(r => perm.map(i => if (i < r.size) r(i) else VNull))
                  else exp
                }
              }
            }
            def cmp(exp: List[List[V]]): Option[String] = c.compare match {
              case "CompareExactOrdered" =>
                if (exp.size != rows.size) Some(s"row count ${rows.size} != expected ${exp.size}")
                else exp.zip(rows).zipWithIndex.collectFirst {
                  case ((e, a), i) if !rowEq(e, a) => s"row $i: expected $e got $a"
                }
              case "CompareIncludedIn" =>
                val cnt = c.expRowCount.getOrElse(exp.size)
                if (rows.size != cnt) Some(s"row count ${rows.size} != expected $cnt")
                else rows.collectFirst {
                  case a if !exp.exists(e => rowEq(e, a)) => s"unexpected row $a"
                }
              case "ComparePartial" =>
                if (exp.size > rows.size) Some(s"row count ${rows.size} < expected ${exp.size}")
                else exp.collectFirst {
                  case e if !rows.exists(a => e.zip(a).forall {
                    case (VNull, _) => true
                    case (ev, av)   => valEq(ev, av)
                  }) => s"no row matching partial $e"
                }
              case _ => // CompareExactUnordered (default)
                if (exp.size != rows.size) Some(s"row count ${rows.size} != expected ${exp.size}")
                else if (multisetMatch(exp, rows)) None
                else Some(s"multiset mismatch: expected ${exp.take(3)}... got ${rows.take(3)}...")
            }
            val rowProblem = {
              val outcomes = variants.map(v => cmp(reorder(v)))
              if (outcomes.contains(None)) None else outcomes.head
            }
            (hdrProblem, rowProblem) match {
              case (None, None)    => res("pass", "")
              case (Some(h), None) => res("hdr", h)
              case (_, Some(r))    => res("rows", r.take(400))
            }
        }
    }
  }

  /** PQLTests run through the PQL compiler against the same session catalog
    * (cross-index resolution via `spark.table`). */
  def runPqlCase(spark: org.apache.spark.sql.SparkSession, tt: TableTest,
      c: PqlCase, pql: String): CaseResult = {
    def res(cat: String, detail: String) =
      CaseResult(tt.varName, c.name, pql, cat, detail)
    val attempt = scala.util.Try {
      val df = new graft.pql.Compiler(spark.table(c.table),
          resolve = n => spark.table(n))
        .run(graft.pql.Parser.parseOne(pql))
      df.collect().map(_.toSeq).toSeq
    }
    (attempt, c.expErr) match {
      case (scala.util.Failure(t), Some(err)) =>
        if (errText(t).contains(err)) res("pass", "")
        else res("err-text", s"expected <$err> got <${errText(t).linesIterator.take(2).mkString(" | ").take(300)}>")
      case (scala.util.Success(_), Some(err)) =>
        res("err-missing", s"expected error <$err>")
      case (scala.util.Failure(t), None) =>
        res("unexpected-error", errText(t).linesIterator.take(2).mkString(" | ").take(300))
      case (scala.util.Success(rows), None) =>
        c.rows match {
          case None => res("pass", "")
          case Some(exp) =>
            if (multisetMatch(exp, rows)) res("pass", "")
            else res("rows", s"expected $exp got ${rows.take(5)}")
        }
    }
  }

  def runAll(tests: List[TableTest], filter: Option[String], verbose: Boolean,
      spark0: org.apache.spark.sql.SparkSession = null): List[CaseResult] = {
    val spark = if (spark0 != null) spark0 else SparkSpec.session
    val results = mutable.ListBuffer[CaseResult]()
    for (tt <- tests if filter.forall(f => tt.varName.contains(f) || tt.name.contains(f))) {
      val fixtureOk = tt.fixture match {
        case Some(fx) =>
          scala.util.Try {
            GraftSql.statement(spark, fx.createTable)
            if (fx.rowSets.nonEmpty && fx.rowSets.head.nonEmpty)
              GraftSql.statement(spark, fx.insertInto(0))
          } match {
            case scala.util.Success(_) => true
            case scala.util.Failure(t) =>
              results += CaseResult(tt.varName, "<fixture>", fx.createTable,
                "fixture-error", errText(t).linesIterator.take(3).mkString(" | ").take(400))
              false
          }
        case None => true
      }
      if (fixtureOk) {
        for (c <- tt.sqlTests; sql <- c.sqls)
          results += runCase(spark, tt, c, sql)
        for (c <- tt.pqlTests; pql <- c.pqls)
          results += runPqlCase(spark, tt, c, pql)
      } else
        for (c <- tt.sqlTests; sql <- c.sqls)
          results += CaseResult(tt.varName, c.name, sql, "fixture-skip", "")
    }
    val rs = results.toList
    if (verbose) report(rs)
    rs
  }

  def report(rs: List[CaseResult]): Unit = {
    val byCat = rs.groupBy(_.category).view.mapValues(_.size).toMap
    println(s"TOTAL ${rs.size}: " + byCat.toList.sortBy(-_._2).map { case (k, v) => s"$k=$v" }.mkString(", "))
    val out = new java.io.PrintWriter("target/golden_triage.txt")
    try {
      for ((cat, cases) <- rs.filterNot(_.ok).groupBy(_.category)) {
        out.println(s"===== $cat (${cases.size})")
        for (c <- cases) out.println(s"[${c.table}/${c.name}] ${c.sql}\n    -> ${c.detail}")
      }
    } finally out.close()
    println("details: target/golden_triage.txt")
  }
}
