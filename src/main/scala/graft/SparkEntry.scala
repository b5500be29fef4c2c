package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pql.Pql
import graft.core.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry exercises one operator from SURVEY.md §2 (PQL call,
  * SQL construct, or training-pipeline op); `oracleSql` carries the DuckDB
  * equivalent the driver hash-compares against on sf0.01.
  *
  * DuckDB-side record id (`_id`) convention, mirroring
  * [[graft.core.Tables.idExpr]]: lineitem = l_orderkey*8+l_linenumber,
  * orders = o_orderkey, documents = doc_id, events = event_id, etc.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Shape mirrors the reference's own perf benchmark: multi-field GroupBy
    * with a Sum aggregate (`reference/qa/scripts/perf/able/
    * highcardinalitygroupby.js:9`). */
  def entry(spark: SparkSession): DataFrame =
    Pql.run(spark, "/root/testdata/sf0.001", "lineitem",
      "GroupBy(Rows(l_returnflag), Rows(l_linestatus), aggregate=Sum(field=l_quantity))")

  private def pqlQ(tbl: String, q: String): (SparkSession, String) => DataFrame =
    (s, dir) => Pql.run(s, dir, tbl, q)

  // ------------------------------------------------------------------ PQL ops

  private val pqlQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pql_count_row_eq" -> pqlQ("lineitem", "Count(Row(l_returnflag='R'))"),
    "pql_count_row_gt" -> pqlQ("lineitem", "Count(Row(l_quantity > 30))"),
    "pql_count_between" -> pqlQ("lineitem", "Count(Row(l_quantity >< [10, 20]))"),
    "pql_intersect" -> pqlQ("lineitem",
      "Count(Intersect(Row(l_returnflag='R'), Row(l_quantity > 30)))"),
    "pql_union" -> pqlQ("lineitem",
      "Count(Union(Row(l_returnflag='R'), Row(l_linestatus='O')))"),
    "pql_difference" -> pqlQ("lineitem",
      "Count(Difference(Row(l_returnflag='R'), Row(l_quantity > 30)))"),
    "pql_xor" -> pqlQ("lineitem",
      "Count(Xor(Row(l_returnflag='R'), Row(l_quantity > 30)))"),
    "pql_not" -> pqlQ("lineitem", "Count(Not(Row(l_returnflag='R')))"),
    "pql_all" -> pqlQ("lineitem", "Count(All())"),
    "pql_constrow" -> pqlQ("lineitem",
      "Count(ConstRow(columns=[9, 17, 25, 9999999]))"),
    "pql_unionrows" -> pqlQ("lineitem",
      "Count(UnionRows(Rows(l_returnflag), Rows(l_linestatus)))"),
    "pql_limit" -> pqlQ("orders",
      "Extract(Limit(Row(o_orderstatus='F'), limit=10, offset=5), Rows(o_totalprice))"),
    "pql_extract" -> pqlQ("orders",
      "Extract(Row(o_totalprice > 250000), Rows(o_orderstatus), Rows(o_orderpriority))"),
    "pql_sort" -> pqlQ("orders",
      "Sort(Row(o_orderstatus='O'), field=o_totalprice, sort-desc=true, limit=20)"),
    "pql_sum" -> pqlQ("lineitem", "Sum(Row(l_returnflag='A'), field=l_quantity)"),
    "pql_min" -> pqlQ("part", "Min(field=p_size)"),
    "pql_max" -> pqlQ("part", "Max(field=p_size)"),
    "pql_minrow" -> pqlQ("lineitem", "MinRow(field=l_returnflag)"),
    "pql_maxrow" -> pqlQ("lineitem", "MaxRow(field=l_returnflag)"),
    "pql_distinct" -> pqlQ("orders", "Distinct(field=o_orderpriority)"),
    "pql_rows_like" -> pqlQ("orders", "Rows(o_orderpriority, like='%U%')"),
    "pql_topk" -> pqlQ("documents", "TopK(words, k=10)"),
    "pql_groupby" -> pqlQ("lineitem",
      "GroupBy(Rows(l_returnflag), Rows(l_linestatus), aggregate=Sum(field=l_quantity))"),
    "pql_groupby_having" -> pqlQ("orders",
      "GroupBy(Rows(o_orderpriority), having=Condition(count > 2000))"),
    "pql_groupby_set" -> pqlQ("documents",
      "GroupBy(Rows(lang), Rows(words), filter=Row(source='src0'), sort=\"count desc\", limit=15)"),
    "pql_percentile" -> pqlQ("part", "Percentile(field=p_size, nth=50)"),
    "pql_fieldvalue" -> pqlQ("orders", "FieldValue(field=o_totalprice, column=7)"),
    "pql_includescolumn" -> pqlQ("orders",
      "IncludesColumn(Row(o_orderstatus='F'), column=3)"),
    "pql_row_time" -> pqlQ("events",
      "Count(Row(event_type='purchase', from='2024-01-05T00:00', to='2024-01-20T00:00'))"),
    "pql_shift" -> pqlQ("orders",
      "Count(Intersect(Shift(Row(o_orderstatus='F'), n=1), All()))"),
  )

  /** DuckDB oracle for reference-semantics Percentile (`reference/executor.go:
    * 1296-1600`): replays the value-domain bisection as a recursive CTE —
    * including the Go midpoint formula and floor()'d rank targets. */
  private def percentileOracle(tbl: String, col: String, nth: Int, where: String = "TRUE"): String = {
    val mid = s"($col IS NOT NULL AND $where)"
    s"""WITH RECURSIVE
 params AS (
   SELECT count(*) AS total, min($col)::BIGINT AS mn, max($col)::BIGINT AS mx,
     CAST(floor(count(*)*$nth.0/100.0) AS BIGINT) AS dl,
     CAST(floor(count(*)*(100-$nth.0)/100.0) AS BIGINT) AS dg
   FROM $tbl WHERE $mid),
 bisect(lo, hi, v, done) AS (
   SELECT mn, mx, CASE WHEN dg=0 THEN mx ELSE mn END,
          (dg=0) OR (dl=0) OR (mn>=mx) FROM params
   UNION ALL
   SELECT CASE WHEN less > dl THEN lo ELSE m+1 END,
          CASE WHEN less > dl THEN m-1 ELSE hi END,
          m,
          (less <= dl AND greater <= dg)
            OR (CASE WHEN less > dl THEN lo ELSE m+1 END)
               >= (CASE WHEN less > dl THEN m-1 ELSE hi END)
   FROM (
     SELECT lo, hi, done, dl, dg,
       (lo//2 + hi//2 + ((lo%2 + hi%2)//2)) AS m,
       (SELECT count(*) FROM $tbl WHERE $mid AND $col < (lo//2 + hi//2 + ((lo%2 + hi%2)//2))) AS less,
       (SELECT count(*) FROM $tbl WHERE $mid AND $col > (lo//2 + hi//2 + ((lo%2 + hi%2)//2))) AS greater
     FROM bisect, params WHERE NOT done) s
 )
SELECT v AS val FROM bisect WHERE done""".replace("\n", " ")
  }

  private val pqlOracles: Map[String, String] = Map(
    "pql_percentile" -> percentileOracle("part", "p_size", 50),
    "pql_count_row_eq" -> "SELECT count(*) AS cnt FROM lineitem WHERE l_returnflag='R'",
    "pql_count_row_gt" -> "SELECT count(*) AS cnt FROM lineitem WHERE l_quantity > 30",
    "pql_count_between" -> "SELECT count(*) AS cnt FROM lineitem WHERE l_quantity BETWEEN 10 AND 20",
    "pql_intersect" -> "SELECT count(*) AS cnt FROM lineitem WHERE l_returnflag='R' AND l_quantity > 30",
    "pql_union" -> "SELECT count(*) AS cnt FROM lineitem WHERE l_returnflag='R' OR l_linestatus='O'",
    "pql_difference" -> "SELECT count(*) AS cnt FROM lineitem WHERE l_returnflag='R' AND NOT (l_quantity > 30)",
    "pql_xor" -> "SELECT count(*) AS cnt FROM lineitem WHERE (l_returnflag='R') <> (l_quantity > 30)",
    "pql_not" -> "SELECT count(*) AS cnt FROM lineitem WHERE NOT (l_returnflag='R')",
    "pql_all" -> "SELECT count(*) AS cnt FROM lineitem",
    "pql_constrow" -> ("SELECT count(*) AS cnt FROM lineitem " +
      "WHERE (l_orderkey*8 + l_linenumber) IN (9, 17, 25, 9999999)"),
    "pql_unionrows" -> ("SELECT count(*) AS cnt FROM lineitem " +
      "WHERE l_returnflag IS NOT NULL OR l_linestatus IS NOT NULL"),
    "pql_limit" -> ("SELECT o_orderkey AS _id, o_totalprice FROM orders WHERE o_orderstatus='F' " +
      "ORDER BY o_orderkey LIMIT 10 OFFSET 5"),
    "pql_extract" -> ("SELECT o_orderkey AS _id, o_orderstatus, o_orderpriority FROM orders " +
      "WHERE o_totalprice > 250000 ORDER BY o_orderkey"),
    "pql_sort" -> ("SELECT o_orderkey AS _id, o_totalprice FROM orders WHERE o_orderstatus='O' " +
      "ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"),
    "pql_sum" -> ("SELECT sum(l_quantity) AS sum, count(l_quantity) AS cnt " +
      "FROM lineitem WHERE l_returnflag='A'"),
    "pql_min" -> "SELECT p_size AS val, count(*) AS cnt FROM part GROUP BY 1 ORDER BY val ASC LIMIT 1",
    "pql_max" -> "SELECT p_size AS val, count(*) AS cnt FROM part GROUP BY 1 ORDER BY val DESC LIMIT 1",
    "pql_minrow" -> ("SELECT l_returnflag AS val, count(*) AS cnt FROM lineitem " +
      "GROUP BY 1 ORDER BY val ASC LIMIT 1"),
    "pql_maxrow" -> ("SELECT l_returnflag AS val, count(*) AS cnt FROM lineitem " +
      "GROUP BY 1 ORDER BY val DESC LIMIT 1"),
    "pql_distinct" -> "SELECT DISTINCT o_orderpriority AS val FROM orders ORDER BY val",
    "pql_rows_like" -> ("SELECT DISTINCT o_orderpriority AS val FROM orders " +
      "WHERE o_orderpriority LIKE '%U%' ORDER BY val"),
    "pql_topk" -> ("SELECT w AS val, count(*) AS cnt FROM (SELECT unnest(list_distinct(" +
      "list_filter(string_split(text, ' '), x -> x <> ''))) AS w FROM documents) " +
      "GROUP BY 1 ORDER BY cnt DESC, val ASC LIMIT 10"),
    "pql_groupby" -> ("SELECT l_returnflag, l_linestatus, count(*) AS cnt, " +
      "sum(l_quantity) AS agg FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"),
    "pql_groupby_having" -> ("SELECT o_orderpriority, count(*) AS cnt FROM orders " +
      "GROUP BY 1 HAVING count(*) > 2000 ORDER BY 1"),
    "pql_groupby_set" -> ("SELECT lang, w AS words, count(*) AS cnt FROM (SELECT lang, " +
      "unnest(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS w " +
      "FROM documents WHERE source='src0') GROUP BY 1, 2 " +
      "ORDER BY cnt DESC, lang ASC, words ASC LIMIT 15"),
    "pql_fieldvalue" -> "SELECT o_totalprice AS val FROM orders WHERE o_orderkey=7",
    "pql_includescolumn" -> ("SELECT (count(*) > 0) AS includes FROM orders " +
      "WHERE o_orderstatus='F' AND o_orderkey=3"),
    "pql_row_time" -> ("SELECT count(*) AS cnt FROM events WHERE event_type='purchase' " +
      "AND ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'"),
    "pql_shift" -> ("SELECT count(*) AS cnt FROM (SELECT o_orderkey+1 AS id FROM orders " +
      "WHERE o_orderstatus='F') s WHERE id IN (SELECT o_orderkey FROM orders)"),
  )

  // ------------------------------------------------- SQL surface (SURVEY §2.2)

  private def sqlQ(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => graft.sql.GraftSql.sql(s, dir, q)

  private val sqlQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_top" -> sqlQ(
      "SELECT TOP(5) o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey"),
    "sql_setcontains" -> sqlQ(
      "SELECT count(*) AS cnt FROM documents WHERE SETCONTAINS(words, 'spark')"),
    "sql_setcontainsall" -> sqlQ(
      "SELECT count(*) AS cnt FROM documents WHERE SETCONTAINSALL(words, array('spark', 'data'))"),
    "sql_setcontainsany" -> sqlQ(
      "SELECT count(*) AS cnt FROM documents WHERE SETCONTAINSANY(words, array('spark', 'data'))"),
    "sql_stringfuncs" -> sqlQ(
      """SELECT p_partkey, UPPER(p_name) AS un, REVERSE(p_brand) AS rb,
        |SUBSTRING(p_type, 0, 5) AS st, REPLACEALL(p_name, ' ', '_') AS rn,
        |LEN(p_name) AS ln, PREFIX(p_type, 3) AS pf, SUFFIX(p_type, 3) AS sf,
        |CHARINDEX('a', p_name) AS ci, STRINGSPLIT(p_type, ' ', 1) AS sp
        |FROM part ORDER BY p_partkey""".stripMargin),
    "sql_datefuncs" -> sqlQ(
      """SELECT o_orderkey, DATETIMEPART('YY', o_orderdate) AS y,
        |DATETIMEPART('M', o_orderdate) AS m, DATETIMEPART('D', o_orderdate) AS d,
        |DATETIMEPART('W', o_orderdate) AS wd, DATETIMENAME('M', o_orderdate) AS mn
        |FROM orders ORDER BY o_orderkey""".stripMargin),
    "sql_datetimeadd" -> sqlQ(
      """SELECT o_orderkey, DATETIMEADD('D', 30, o_orderdate) AS plus30d,
        |DATETIMEDIFF('D', o_orderdate, TIMESTAMP '1998-01-01 00:00:00') AS days_to_98
        |FROM orders ORDER BY o_orderkey""".stripMargin),
    "sql_join_inner" -> sqlQ(
      """SELECT n_name, count(*) AS cnt, round(sum(o_totalprice), 2) AS rev
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin),
    "sql_join_left" -> sqlQ(
      """SELECT c_custkey, count(o_orderkey) AS cnt
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin),
    "sql_agg" -> sqlQ(
      """SELECT count(*) AS cnt, count(DISTINCT l_partkey) AS ndp,
        |round(avg(l_quantity), 4) AS avg_qty, min(l_quantity) AS min_qty,
        |max(l_quantity) AS max_qty, round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem""".stripMargin),
    "sql_corr" -> sqlQ(
      "SELECT round(corr(l_quantity, l_extendedprice), 6) AS c FROM lineitem"),
    "sql_var" -> sqlQ( // reference VAR = population variance @ scale 6
      "SELECT round(var_pop(l_quantity), 6) AS v FROM lineitem"),
    "sql_groupby_having" -> sqlQ(
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev
        |FROM lineitem WHERE l_quantity > 5 GROUP BY l_returnflag, l_linestatus
        |HAVING count(*) > 100 ORDER BY l_returnflag, l_linestatus""".stripMargin),
    "sql_subquery" -> sqlQ(
      """SELECT round(avg(t.total), 2) AS avg_order FROM
        |(SELECT o_custkey, sum(o_totalprice) AS total FROM orders GROUP BY o_custkey) t""".stripMargin),
    "sql_predicates" -> sqlQ(
      """SELECT count(*) AS cnt,
        |sum(CASE WHEN p_size BETWEEN 10 AND 20 THEN 1 ELSE 0 END) AS n_between,
        |sum(CASE WHEN p_brand IN ('Brand#11', 'Brand#22') THEN 1 ELSE 0 END) AS n_in,
        |sum(CASE WHEN p_type LIKE '%BRASS%' THEN 1 ELSE 0 END) AS n_like,
        |sum(CAST(p_size AS BIGINT)) AS sum_size
        |FROM part""".stripMargin),
    "sql_distinct" -> sqlQ(
      "SELECT DISTINCT o_orderstatus FROM orders ORDER BY o_orderstatus"),
  )

  private val sqlOracles: Map[String, String] = Map(
    "sql_top" -> ("SELECT o_orderkey, o_totalprice FROM orders " +
      "ORDER BY o_totalprice DESC, o_orderkey LIMIT 5"),
    "sql_setcontains" -> ("SELECT count(*) AS cnt FROM documents " +
      "WHERE list_contains(string_split(text, ' '), 'spark')"),
    "sql_setcontainsall" -> ("SELECT count(*) AS cnt FROM documents " +
      "WHERE list_has_all(string_split(text, ' '), ['spark', 'data'])"),
    "sql_setcontainsany" -> ("SELECT count(*) AS cnt FROM documents " +
      "WHERE list_has_any(string_split(text, ' '), ['spark', 'data'])"),
    "sql_stringfuncs" -> ("SELECT p_partkey, upper(p_name) AS un, reverse(p_brand) AS rb, " +
      "substring(p_type, 1, 5) AS st, replace(p_name, ' ', '_') AS rn, " +
      "length(p_name) AS ln, left(p_type, 3) AS pf, right(p_type, 3) AS sf, " +
      "strpos(p_name, 'a') - 1 AS ci, coalesce(string_split(p_type, ' ')[2], '') AS sp " +
      "FROM part ORDER BY p_partkey"),
    "sql_datefuncs" -> ("SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m, " +
      "day(o_orderdate) AS d, dayofweek(o_orderdate) AS wd, monthname(o_orderdate) AS mn " +
      "FROM orders ORDER BY o_orderkey"),
    "sql_datetimeadd" -> ("SELECT o_orderkey, o_orderdate + INTERVAL 30 DAY AS plus30d, " +
      "date_diff('day', o_orderdate, TIMESTAMP '1998-01-01 00:00:00') AS days_to_98 " +
      "FROM orders ORDER BY o_orderkey"),
    "sql_join_inner" -> ("SELECT n_name, count(*) AS cnt, round(sum(o_totalprice), 2) AS rev " +
      "FROM orders JOIN customer ON o_custkey = c_custkey " +
      "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name ORDER BY n_name"),
    "sql_join_left" -> ("SELECT c_custkey, count(o_orderkey) AS cnt " +
      "FROM customer LEFT JOIN orders ON c_custkey = o_custkey " +
      "GROUP BY c_custkey ORDER BY c_custkey"),
    "sql_agg" -> ("SELECT count(*) AS cnt, count(DISTINCT l_partkey) AS ndp, " +
      "round(avg(l_quantity), 4) AS avg_qty, min(l_quantity) AS min_qty, " +
      "max(l_quantity) AS max_qty, round(sum(l_extendedprice), 2) AS sum_price " +
      "FROM lineitem"),
    "sql_corr" -> "SELECT round(corr(l_quantity, l_extendedprice), 6) AS c FROM lineitem",
    "sql_var" -> "SELECT round(var_pop(l_quantity), 6) AS v FROM lineitem",
    "sql_groupby_having" -> ("SELECT l_returnflag, l_linestatus, count(*) AS cnt, " +
      "round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev " +
      "FROM lineitem WHERE l_quantity > 5 GROUP BY l_returnflag, l_linestatus " +
      "HAVING count(*) > 100 ORDER BY l_returnflag, l_linestatus"),
    "sql_subquery" -> ("SELECT round(avg(t.total), 2) AS avg_order FROM " +
      "(SELECT o_custkey, sum(o_totalprice) AS total FROM orders GROUP BY o_custkey) t"),
    "sql_predicates" -> ("SELECT count(*) AS cnt, " + // DuckDB sum(int)=HUGEINT → cast
      "CAST(sum(CASE WHEN p_size BETWEEN 10 AND 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_between, " +
      "CAST(sum(CASE WHEN p_brand IN ('Brand#11', 'Brand#22') THEN 1 ELSE 0 END) AS BIGINT) AS n_in, " +
      "CAST(sum(CASE WHEN p_type LIKE '%BRASS%' THEN 1 ELSE 0 END) AS BIGINT) AS n_like, " +
      "CAST(sum(CAST(p_size AS BIGINT)) AS BIGINT) AS sum_size FROM part"),
    "sql_distinct" -> "SELECT DISTINCT o_orderstatus FROM orders ORDER BY o_orderstatus",
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    pqlQueries ++ sqlQueries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = pqlOracles ++ sqlOracles
}
