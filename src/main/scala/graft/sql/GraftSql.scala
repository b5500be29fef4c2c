package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    TopRe.findFirstMatchIn(query) match {
      case Some(m) =>
        val n = m.group(3)
        val stripped = TopRe.replaceFirstIn(
          query, m.group(1) + Option(m.group(2)).getOrElse(""))
        s"$stripped LIMIT $n"
      case None => query
    }
  }

  /** Run one reference-dialect SQL query against the tables in `dir`. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    Tables.registerAll(spark, dir)
    Functions.register(spark)
    if (Ddl.handles(query)) Ddl.run(spark, query)
    else spark.sql(rewrite(query))
  }

  /** Run a statement with no table dir (DDL-driven sessions). */
  def statement(spark: SparkSession, query: String): DataFrame = {
    Functions.register(spark)
    if (Ddl.handles(query)) Ddl.run(spark, query)
    else spark.sql(rewrite(query))
  }
}
