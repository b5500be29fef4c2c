package graft.sql

import graft.SparkSpec

class GraftSqlSpec extends SparkSpec {

  private def one(q: String): Any =
    GraftSql.sql(spark, sfDir, q).collect()(0).get(0)

  test("TOP(n) rewrite") {
    assert(GraftSql.rewrite("SELECT TOP(5) a FROM t ORDER BY a")
      == "SELECT a FROM t ORDER BY a LIMIT 5")
    assert(GraftSql.rewrite("select distinct topn(3) a FROM t")
      == "select distinct a FROM t LIMIT 3")
    val n = GraftSql.sql(spark, sfDir,
      "SELECT TOP(5) o_orderkey FROM orders ORDER BY o_orderkey").count()
    assert(n == 5)
  }

  test("string functions match reference semantics") {
    assert(one("SELECT REVERSE('abc')") == "cba")
    assert(one("SELECT CHAR(65)") == "A")
    assert(one("SELECT ASCII('A')") == 65)
    // reference SUBSTRING is 0-based (inbuiltfunctionsstring.go:363)
    assert(one("SELECT SUBSTRING('hello world', 0, 5)") == "hello")
    assert(one("SELECT SUBSTRING('hello world', 6)") == "world")
    assert(one("SELECT REPLACEALL('aXbXc', 'X', '-')") == "a-b-c")
    // 0-based STRINGSPLIT; out of range → ""
    assert(one("SELECT STRINGSPLIT('a,b,c', ',', 1)") == "b")
    assert(one("SELECT STRINGSPLIT('a,b,c', ',')") == "a")
    assert(one("SELECT STRINGSPLIT('a,b,c', ',', 9)") == "")
    assert(one("SELECT PREFIX('hello', 2)") == "he")
    assert(one("SELECT SUFFIX('hello', 2)") == "lo")
    assert(one("SELECT SPACE(3)") == "   ")
    assert(one("SELECT LEN('hello')") == 5)
    assert(one("SELECT REPLICATE('ab', 3)") == "ababab")
    assert(one("SELECT FORMAT('%s=%d', 'x', 7)") == "x=7")
    // CHARINDEX(sub, str) 0-based, -1 when absent
    assert(one("SELECT CHARINDEX('lo', 'hello')") == 3)
    assert(one("SELECT CHARINDEX('zz', 'hello')") == -1)
    assert(one("SELECT CHARINDEX('l', 'hello', 3)") == 3)
    // STR is SQL-Server-style: right-justified in a default width of 10
    // (`inbuiltfunctionsstring.go:812-868`; corpus StrIntValue)
    assert(one("SELECT STR(42)") == "        42")
    assert(one("SELECT STR(12345.678, 8, 2)") == "12345.68")
    assert(one("SELECT STR(12345, 3)") == "***")
    assert(one("SELECT TRIM('  x  ')") == "x")
  }

  test("set functions") {
    assert(one("SELECT SETCONTAINS(array('a','b'), 'a')") == true)
    assert(one("SELECT SETCONTAINS(array('a','b'), 'z')") == false)
    assert(one("SELECT SETCONTAINSALL(array('a','b','c'), array('a','c'))") == true)
    assert(one("SELECT SETCONTAINSALL(array('a','b'), array('a','z'))") == false)
    assert(one("SELECT SETCONTAINSANY(array('a','b'), array('z','b'))") == true)
    assert(one("SELECT SETCONTAINSANY(array('a','b'), array('z'))") == false)
    // string membership is case-INSENSITIVE (reference strings.EqualFold,
    // `sql3/planner/inbuiltfunctionsset.go:166-168`)
    assert(one("SELECT SETCONTAINS(array('Foo','Bar'), 'fOO')") == true)
    assert(one("SELECT SETCONTAINSALL(array('Foo','Bar'), array('bar','FOO'))") == true)
    assert(one("SELECT SETCONTAINSANY(array('Foo','Bar'), array('z','BAR'))") == true)
    assert(one("SELECT SETCONTAINSANY(array('Foo'), array('z'))") == false)
  }

  test("datetimefromparts accepts proleptic year 0 like Go time.Date " +
    "(defs_date_functions.go:360)") {
    // compared through the engine's own string cast: collect() would rebase
    // a year-0 java.sql.Timestamp into the hybrid Julian calendar
    assert(one("SELECT CAST(DATETIMEFROMPARTS(0, 1, 1, 0, 0, 0, 0) AS STRING)")
      == "0000-01-01T00:00:00Z")
    // and ordinary years are untouched
    assert(one("SELECT CAST(DATETIMEFROMPARTS(2024, 3, 15, 10, 30, 45, 0) AS STRING)")
      == "2024-03-15T10:30:45Z")
  }

  test("date functions match reference unit codes") {
    val ts = "TIMESTAMP '2024-03-15 10:30:45.123456'"
    assert(one(s"SELECT DATETIMEPART('YY', $ts)") == 2024)
    assert(one(s"SELECT DATETIMEPART('M', $ts)") == 3)
    assert(one(s"SELECT DATETIMEPART('D', $ts)") == 15)
    assert(one(s"SELECT DATETIMEPART('YD', $ts)") == 75)
    // 2024-03-15 is a Friday: Go Weekday=5
    assert(one(s"SELECT DATETIMEPART('W', $ts)") == 5)
    assert(one(s"SELECT DATETIMEPART('WK', $ts)") == 11)
    assert(one(s"SELECT DATETIMEPART('HH', $ts)") == 10)
    assert(one(s"SELECT DATETIMEPART('MI', $ts)") == 30)
    assert(one(s"SELECT DATETIMEPART('S', $ts)") == 45)
    assert(one(s"SELECT DATETIMEPART('MS', $ts)") == 123L)
    assert(one(s"SELECT DATETIMEPART('US', $ts)") == 123456L)
    assert(one(s"SELECT DATETIMENAME('M', $ts)") == "March")
    assert(one(s"SELECT DATETIMENAME('W', $ts)") == "Friday")
    assert(one(s"SELECT DATETIMEADD('D', 1, $ts)").toString.startsWith("2024-03-16"))
    assert(one(s"SELECT DATETIMEDIFF('D', TIMESTAMP '2024-03-10 00:00:00', $ts)") == 5)
    assert(one("SELECT TOTIMESTAMP(86400)").toString.startsWith("1970-01-02"))
    assert(one("SELECT TOTIMESTAMP(1500, 'ms')").toString.contains("00:00:01.5"))
    assert(one(s"SELECT DATETIMEFROMPARTS(2024, 3, 15, 10, 30, 45, 500)")
      .toString.contains("2024-03-15 10:30:45.5"))
    // reference codes return the formatted-string cut
    // (`inbuiltfunctionsdate.go:564-660`); Spark unit names still reach the
    // builtin so DataFrame-API pipelines sharing the session are unaffected
    assert(one(s"SELECT DATE_TRUNC('HH', $ts)") == "2024-03-15T10")
    assert(one(s"SELECT DATE_TRUNC('M', $ts)") == "2024-03")
    assert(one(s"SELECT DATE_TRUNC('HOUR', $ts)").toString.contains("10:00:00"))
  }

  test("FIRST/LAST aggregates: first/last non-null in _id order") {
    GraftSql.statement(spark, "CREATE TABLE fl (_id ID, v STRING)")
    GraftSql.statement(spark,
      "INSERT INTO fl (_id, v) VALUES (1, NULL), (2, 'b'), (3, 'c'), (4, NULL)")
    val r = GraftSql.statement(spark,
      "SELECT FIRST(v) AS f, LAST(v) AS l FROM fl").collect()(0)
    assert(r.getString(0) == "b" && r.getString(1) == "c") // nulls skipped
    // grouped FIRST/LAST also deterministic
    val g = GraftSql.sql(spark, sfDir,
      "SELECT l_returnflag, FIRST(l_linestatus) AS f FROM lineitem " +
        "GROUP BY l_returnflag ORDER BY l_returnflag")
    assert(g.count() == 3)
  }

  test("PERCENTILE pushdown shape and reference error otherwise") {
    val v = one("SELECT PERCENTILE(p_size, 50) AS val FROM part")
    val direct = graft.pql.Pql.run(spark, sfDir, "part",
      "Percentile(field=p_size, nth=50)").collect()(0).getLong(0)
    assert(v == direct)
    // grouped percentile gets the GROUP BY wording (`defs_groupby.go:212`);
    // a non-lowerable WHERE gets the can't-push-down wording
    // (`defs_aggregate.go:501`)
    val e = intercept[RuntimeException](GraftSql.sql(spark, sfDir,
      "SELECT p_brand, PERCENTILE(p_size, 50) FROM part GROUP BY p_brand"))
    assert(e.getMessage.contains("aggregate 'PERCENTILE()' not allowed in GROUP BY"))
    val e2 = intercept[RuntimeException](GraftSql.sql(spark, sfDir,
      "SELECT PERCENTILE(p_size, 50) FROM part WHERE p_brand != 'Brand#1'"))
    assert(e2.getMessage.contains("can't be pushed down"))
  }

  test("join-grouped first-appearance order sorts the REDUCED output, not the input") {
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = GraftSql.sql(spark, sfDir,
        "select n_regionkey, sum(s_acctbal) from supplier s " +
          "inner join nation n on s.s_nationkey = n.n_nationkey " +
          "group by n_regionkey")
      // semantic check: group keys appear in first-encounter order of the
      // driving (supplier) scan in _id order
      val keys = df.collect().map(_.getAs[Number](0).longValue).toSeq
      val nk = GraftSql.sql(spark, sfDir,
        "select s_nationkey from supplier order by _id").collect()
        .map(_.getAs[Number](0).longValue)
      val region = GraftSql.sql(spark, sfDir,
        "select n_nationkey, n_regionkey from nation").collect()
        .map(r => r.getAs[Number](0).longValue -> r.getAs[Number](1).longValue).toMap
      val want = nk.map(region).distinct.toSeq
      assert(keys == want, s"got $keys want $want")
      // plan check: every Sort sits ABOVE the final aggregate — the
      // first-appearance order costs a sort of the reduced output, never
      // of the join input
      val plan = df.queryExecution.executedPlan
      val sorts = plan.collect { case s: SortExec => s }
      assert(sorts.nonEmpty, "expected the first-appearance output sort")
      assert(sorts.forall(s =>
          s.collectFirst { case a: HashAggregateExec => a }.isDefined),
        s"a Sort has no aggregate beneath it (it would sort the input):\n$plan")
      // a group key ABSENT from the SELECT list must not break the sort
      // rewrite (the tie-break may only reference aggregate OUTPUT attrs)
      val hidden = GraftSql.sql(spark, sfDir,
        "select sum(s_acctbal) from supplier s " +
          "inner join nation n on s.s_nationkey = n.n_nationkey " +
          "group by n_regionkey")
      assert(hidden.collect().length == 5)
      // an ALIASED group key still tie-breaks (sorts by the alias)
      val aliased = GraftSql.sql(spark, sfDir,
        "select n_regionkey as rk, sum(s_acctbal) from supplier s " +
          "inner join nation n on s.s_nationkey = n.n_nationkey " +
          "group by n_regionkey")
      assert(aliased.collect().map(_.getAs[Number](0).longValue).toSeq == want)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
