package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, Divide, IntegralDivide}
import org.apache.spark.sql.types.{DoubleType, ByteType, ShortType, IntegerType, LongType}
import graft.core.Tables

/** SQL surface (SURVEY.md §2.2): the reference's sql3 dialect on top of Spark
  * SQL. Spark's analyzer/optimizer subsumes the reference's entire planner
  * (`reference/sql3/planner/planoptimizer.go:29-66` — pushdown, pruning,
  * top-pushdown are all Catalyst built-ins), so the shim is:
  *   1. the reference's scalar functions registered as Catalyst aliases
  *      ([[Functions]]);
  *   2. dialect rewrites for syntax Spark lacks: `SELECT TOP(n)` / `TOPN(n)`
  *      (`reference/sql3/parser/ast.go:3871-3977`; the reference has no LIMIT
  *      keyword — TOP is its only row cap).
  * Joins: the reference supports only INNER/LEFT via nested loops
  * (`opnestedloops.go:15`); Spark runs the same queries with
  * broadcast/hash/sort-merge — strictly superior, nothing to shim.
  */
object GraftSql {

  /** TOP(n) / TOPN(n) immediately after SELECT [DISTINCT]. */
  private val TopRe =
    raw"(?i)(\bSELECT\b)(\s+DISTINCT\b)?\s+TOPN?\s*\(\s*(\d+)\s*\)".r

  /** Rewrite reference-dialect SQL to Spark SQL. */
  def rewrite(query: String): String = {
    val q = bracketsToArray(query)
    TopRe.findFirstMatchIn(q) match {
      case Some(m) =>
        val n = m.group(3)
        val stripped = TopRe.replaceFirstIn(
          q, m.group(1) + Option(m.group(2)).getOrElse(""))
        s"$stripped LIMIT $n"
      case None => q
    }
  }

  /** `[a, b]` set literals (`reference/sql3/parser/parser.go` SetLiteralExpr)
    * → `array(a, b)`; quote-aware (brackets inside strings untouched). The
    * reference dialect has no other bracket syntax. */
  private def bracketsToArray(q: String): String = {
    val b = new StringBuilder
    var quote: Char = 0
    q.foreach { c =>
      if (quote != 0) { b += c; if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' => quote = c; b += c
        case '['        => b ++= "array("
        case ']'        => b += ')'
        case _          => b += c
      }
    }
    b.toString
  }

  private val integral = Set[org.apache.spark.sql.types.DataType](
    ByteType, ShortType, IntegerType, LongType)

  /** Reference INT ÷ INT is integer division (Go int64 `/`,
    * `reference/sql3/planner/expression.go:419-423`); Spark's `/` is double.
    * Spark's analyzer has already wrapped integral operands in Cast(double),
    * so unwrap and swap in IntegralDivide (result LONG, ANSI
    * divide-by-zero error matches the reference's). */
  private def dialectFix(spark: SparkSession, df: DataFrame): DataFrame = {
    val fixed = df.queryExecution.analyzed.transformAllExpressions {
      case Divide(Cast(l, DoubleType, _, _), Cast(r, DoubleType, _, _), _)
          if integral(l.dataType) && integral(r.dataType) =>
        IntegralDivide(l, r)
    }
    org.apache.spark.sql.graftshim.Shim.ofRows(spark, fixed)
  }

  /** Run one reference-dialect SQL query against the tables in `dir`. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    Tables.registerAll(spark, dir)
    Functions.register(spark)
    if (query.toLowerCase.contains("fb_")) SystemTables.register(spark)
    if (Ddl.handles(query)) Ddl.run(spark, query)
    else dialectFix(spark, spark.sql(rewrite(query)))
  }

  /** Run a statement with no table dir (DDL-driven sessions). */
  def statement(spark: SparkSession, query: String): DataFrame = {
    Functions.register(spark)
    if (query.toLowerCase.contains("fb_")) SystemTables.register(spark)
    if (Ddl.handles(query)) Ddl.run(spark, query)
    else dialectFix(spark, spark.sql(rewrite(query)))
  }
}
