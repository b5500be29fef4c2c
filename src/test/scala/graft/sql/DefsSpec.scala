package graft.sql

import graft.SparkSpec

/** Miniature port of the reference's golden SQL corpus
  * (`reference/sql3/test/defs/` — 34 defs files, 1,827 cases; framework
  * `types.go:120-131`): a fixture table in the reference's own DDL/INSERT
  * dialect, then (SQL → expected rows) cases with unordered compare, covering
  * the semantics areas most likely to diverge: BETWEEN (`defs_between.go`),
  * null/existence (`defs_null.go`), IN (`defs_in.go`), unary/binary operators
  * (`defs_unops.go`, `defs_binops.go`), LIKE (`defs_like.go`), bool
  * (`defs_bool.go`), negative-value min/max (`defs_minmaxnegative.go`),
  * CASE/CAST (`defs_cast.go`).
  */
class DefsSpec extends SparkSpec {

  private def run(q: String) = GraftSql.statement(spark, q)

  private def rowsOf(q: String): Set[Seq[Any]] =
    run(q).collect().map(_.toSeq.map {
      case d: java.math.BigDecimal => d.doubleValue
      case a: scala.collection.Seq[_] => a.toList
      case x => x
    }).toSet

  private def check(q: String, expected: Set[Seq[Any]]): Unit =
    assert(rowsOf(q) == expected, s"for: $q")

  override def beforeAll(): Unit = {
    super.beforeAll()
    run("""CREATE TABLE at (_id ID, i1 INT MIN -1000 MAX 1000, b1 BOOL,
          | d1 DECIMAL(2), s1 STRING, ss1 STRINGSET, ids1 IDSET,
          | t1 TIMESTAMP)""".stripMargin)
    run("INSERT INTO at (_id, i1, b1, d1, s1, ss1, ids1, t1) VALUES " +
      "(1, 1000, true, 12.34, 'foo', ['101','102'], [101, 102], '2024-03-15T10:30:00'), " +
      "(2, -5, false, -1.50, 'bar', ['201'], [201], '2024-01-01T00:00:00'), " +
      "(3, NULL, NULL, NULL, NULL, NULL, NULL, NULL)")
  }

  test("quantum insert property: rangeq matches a naive model of the " +
      "reference's shared per-row write time") {
    // the reference's fbbatch Row.Time is ONE per inserted row: walking the
    // statement's columns, a {ts,[..]} tuple sets it, a plain idset literal
    // sets the batch time, a plain stringset leaves it — every quantum
    // member in the row is stored at the FINAL value. Differential check:
    // 40 random inserts, naive Scala model vs the engine, on three rangeq
    // windows.
    run("""CREATE TABLE tqprop (_id ID, ss STRINGSETQ TIMEQUANTUM 'YMD',
          | ids IDSETQ TIMEQUANTUM 'YMD')""".stripMargin)
    val rnd = new scala.util.Random(42)
    val days = (1 to 9).map(d => f"2022-02-0$d%dT00:00:00Z")
    // model: member -> set of write instants (epoch day is enough here)
    val mSs = scala.collection.mutable.Map.empty[String, Set[String]]
      .withDefaultValue(Set.empty)
    val mIds = scala.collection.mutable.Map.empty[Long, Set[String]]
      .withDefaultValue(Set.empty)
    val FUTURE = "9999-01-01T00:00:00Z" // stands in for "now" (batch time)
    for (_ <- 1 to 40) {
      val ssTuple = rnd.nextBoolean()
      val idTuple = rnd.nextBoolean()
      val ssTs = days(rnd.nextInt(days.size))
      val idTs = days(rnd.nextInt(days.size))
      val ssVals = Seq.fill(1 + rnd.nextInt(2))("m" + rnd.nextInt(6))
      val idVals = Seq.fill(1 + rnd.nextInt(2))(rnd.nextInt(6).toLong)
      val ssLit =
        if (ssTuple) s"{'$ssTs', [${ssVals.map("'" + _ + "'").mkString(",")}]}"
        else s"[${ssVals.map("'" + _ + "'").mkString(",")}]"
      val idLit =
        if (idTuple) s"{'$idTs', [${idVals.mkString(",")}]}"
        else s"[${idVals.mkString(",")}]"
      run(s"INSERT INTO tqprop (_id, ss, ids) VALUES (1, $ssLit, $idLit)")
      // row time: ss column processed first, ids second; ids wins
      val rowTime =
        if (idTuple) idTs
        else FUTURE // plain idset literal = batch time (now >> any window)
      ssVals.foreach(v => mSs(v) = mSs(v) + rowTime)
      idVals.foreach(v => mIds(v) = mIds(v) + rowTime)
    }
    for ((from, to) <- Seq(
        ("'2022-02-03T00:00:00Z'", "null"),
        ("null", "'2022-02-06T00:00:00Z'"),
        ("'2022-02-02T00:00:00Z'", "'2022-02-08T00:00:00Z'"))) {
      def in(ts: String): Boolean =
        (from == "null" || ts >= from.drop(1).dropRight(1)) &&
          (to == "null" || ts < to.drop(1).dropRight(1))
      val wantSs = mSs.filter(_._2.exists(in)).keySet.toSet
      val wantIds = mIds.filter(_._2.exists(in)).keySet.toSet
      val gotSs = rowsOf(s"SELECT ss FROM tqprop WHERE rangeq(ss, $from, $to)")
        .flatMap(_.head.asInstanceOf[List[_]].map(_.asInstanceOf[String]))
      val gotIds = rowsOf(s"SELECT ids FROM tqprop WHERE rangeq(ids, $from, $to)")
        .flatMap(_.head.asInstanceOf[List[_]].map(_.asInstanceOf[Long]))
      assert(gotSs == wantSs, s"ss rangeq($from,$to)")
      assert(gotIds == wantIds, s"ids rangeq($from,$to)")
    }
  }

  test("between — defs_between.go semantics") {
    check("SELECT _id, _id BETWEEN 1 AND 10 FROM at",
      Set(Seq(1L, true), Seq(2L, true), Seq(3L, true)))
    check("SELECT _id, i1 BETWEEN 1 AND 10 FROM at",
      Set(Seq(1L, false), Seq(2L, false), Seq(3L, null)))
    check("SELECT _id, d1 BETWEEN 10 AND 15 FROM at",
      Set(Seq(1L, true), Seq(2L, false), Seq(3L, null)))
    check("SELECT _id, i1 NOT BETWEEN 1 AND 10 FROM at",
      Set(Seq(1L, true), Seq(2L, true), Seq(3L, null)))
    check("SELECT _id FROM at WHERE i1 BETWEEN -10 AND 10",
      Set(Seq(2L)))
  }

  test("null / existence — defs_null.go semantics") {
    check("SELECT _id, i1 IS NULL FROM at",
      Set(Seq(1L, false), Seq(2L, false), Seq(3L, true)))
    check("SELECT _id, ss1 IS NOT NULL FROM at",
      Set(Seq(1L, true), Seq(2L, true), Seq(3L, false)))
    check("SELECT _id FROM at WHERE _id IS NULL", Set.empty)
    check("SELECT count(*) AS c FROM at WHERE b1 IS NULL", Set(Seq(1L)))
    // null propagation through arithmetic and comparison
    check("SELECT _id, i1 + 1 FROM at WHERE _id = 3", Set(Seq(3L, null)))
    check("SELECT _id, i1 = 5 FROM at WHERE _id = 3", Set(Seq(3L, null)))
  }

  test("in — defs_in.go semantics") {
    check("SELECT _id FROM at WHERE i1 IN (1000, -5)", Set(Seq(1L), Seq(2L)))
    check("SELECT _id FROM at WHERE s1 IN ('foo')", Set(Seq(1L)))
    check("SELECT _id FROM at WHERE i1 NOT IN (1000)", Set(Seq(2L)))
    check("SELECT _id FROM at WHERE _id IN (SELECT _id FROM at WHERE b1)",
      Set(Seq(1L)))
  }

  test("unary and binary operators — defs_unops/binops.go") {
    check("SELECT -i1 FROM at WHERE _id = 2", Set(Seq(5L)))
    check("SELECT ~_id FROM at WHERE _id = 1", Set(Seq(-2L)))
    check("SELECT i1 % 7 FROM at WHERE _id = 1", Set(Seq(6L)))
    check("SELECT i1 & 3, i1 | 3 FROM at WHERE _id = 1", Set(Seq(0L, 1003L)))
    check("SELECT _id << 2, _id >> 1 FROM at WHERE _id = 2", Set(Seq(8L, 1L)))
    check("SELECT s1 || '!' FROM at WHERE _id = 1", Set(Seq("foo!")))
    check("SELECT i1 / 3, i1 * 2 FROM at WHERE _id = 1", Set(Seq(333L, 2000L)))
  }

  test("like — defs_like.go semantics") {
    check("SELECT _id FROM at WHERE s1 LIKE 'f%'", Set(Seq(1L)))
    check("SELECT _id FROM at WHERE s1 LIKE '_ar'", Set(Seq(2L)))
    check("SELECT _id FROM at WHERE s1 NOT LIKE 'f%'", Set(Seq(2L)))
  }

  test("bool columns — defs_bool.go semantics") {
    check("SELECT _id FROM at WHERE b1", Set(Seq(1L)))
    check("SELECT _id FROM at WHERE b1 = false", Set(Seq(2L)))
    check("SELECT _id FROM at WHERE NOT b1", Set(Seq(2L)))
  }

  test("negative min/max — defs_minmaxnegative.go") {
    check("SELECT min(i1) AS mn, max(i1) AS mx FROM at", Set(Seq(-5L, 1000L)))
    check("SELECT min(d1) AS mn FROM at", Set(Seq(-1.5)))
    check("SELECT sum(i1) AS s FROM at", Set(Seq(995L)))
    check("SELECT avg(i1) AS a FROM at", Set(Seq(497.5)))
  }

  test("case and cast — defs_cast.go shapes") {
    check("SELECT CASE WHEN i1 > 0 THEN 'pos' WHEN i1 < 0 THEN 'neg' ELSE 'null' END " +
      "FROM at WHERE _id IN (1, 2)", Set(Seq("pos"), Seq("neg")))
    check("SELECT CAST(i1 AS STRING) FROM at WHERE _id = 1", Set(Seq("1000")))
    // decimal narrows only to string or a wider decimal — `defs_cast.go:345`
    expectErr("SELECT CAST(d1 AS INT) FROM at WHERE _id = 1",
      "'decimal(2)' cannot be cast to 'int'")
    check("SELECT CAST('42' AS INT) + 1 FROM at WHERE _id = 1", Set(Seq(43L)))
    // decimal cast matrix (defs_cast.go:58,166,453,660): DECIMAL(s) is
    // scale-only; int→decimal, id→decimal, string→decimal widen exactly
    check("SELECT CAST(1 AS DECIMAL(2)) FROM at WHERE _id = 1", Set(Seq(1.0)))
    check("SELECT CAST(i1 AS DECIMAL(2)) FROM at WHERE _id = 1", Set(Seq(1000.0)))
    check("SELECT CAST(_id AS DECIMAL(2)) FROM at WHERE _id = 2", Set(Seq(2.0)))
    check("SELECT CAST('12.34' AS DECIMAL(2)) FROM at WHERE _id = 1", Set(Seq(12.34)))
    check("SELECT CAST(d1 AS DECIMAL(2)) FROM at WHERE _id = 2", Set(Seq(-1.5)))
    check("SELECT CAST(d1 AS STRING) FROM at WHERE _id = 1", Set(Seq("12.34")))
    // decimal arithmetic stays exact (no float round-trip)
    check("SELECT d1 + CAST('0.66' AS DECIMAL(2)) FROM at WHERE _id = 1",
      Set(Seq(13.0)))
  }

  test("set columns in predicates — defs_set_functions.go") {
    check("SELECT _id FROM at WHERE SETCONTAINS(ss1, '101')", Set(Seq(1L)))
    check("SELECT _id FROM at WHERE SETCONTAINSANY(ids1, [101, 201])",
      Set(Seq(1L), Seq(2L)))
    check("SELECT _id FROM at WHERE SETCONTAINSALL(ss1, ['101', '102'])",
      Set(Seq(1L)))
  }

  test("order by — NULLS FIRST on asc, like the reference") {
    // reference nullOrdering zero-value = nullOrderingFirst
    // (`reference/sql3/planner/oporderby.go:26-30`); Spark matches; DuckDB
    // defaults NULLS LAST — oracle SQL sorting nullable columns must say
    // NULLS FIRST explicitly.
    val got = run("SELECT _id FROM at ORDER BY i1").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L, 2L, 1L))
    val desc = run("SELECT _id FROM at ORDER BY i1 DESC").collect().map(_.getLong(0)).toSeq
    assert(desc == Seq(1L, 2L, 3L))
  }

  test("timestamp literals — defs_timestamp_literals.go") {
    // literals must be RFC3339 (offset required) or a bare date —
    // `parser/ast.go:1838` ConvertToTimestamp; a zoneless datetime does NOT
    // convert and the string comparison is then a type error
    check("SELECT _id FROM at WHERE t1 > '2024-02-01T00:00:00Z'", Set(Seq(1L)))
    check("SELECT count(*) AS c FROM at WHERE t1 >= '2024-01-01'",
      Set(Seq(2L)))
    expectErr("SELECT _id FROM at WHERE t1 > '2024-02-01T00:00:00'",
      "operator '>' incompatible with type 'string'")
  }

  private def expectErr(q: String, msg: String): Unit = {
    val e = intercept[Exception](run(q).collect())
    assert(e.getMessage.contains(msg), s"for: $q got: ${e.getMessage}")
  }

  test("aggregate type checking — defs_aggregate.go error semantics") {
    // COUNT takes a column or `*`, never a literal (defs_aggregate.go:36-44)
    expectErr("SELECT COUNT(1) AS c FROM at", "column reference expected")
    check("SELECT COUNT(*) AS c FROM at", Set(Seq(3L)))
    check("SELECT COUNT(_id) AS c FROM at", Set(Seq(3L)))
    // `*` is COUNT-only (defs_aggregate.go:236,326)
    expectErr("SELECT sum(*) AS s FROM at", "column reference expected")
    expectErr("SELECT avg(*) AS a FROM at", "column reference expected")
    // _id is the record key, not a value (defs_aggregate.go:245,334,789,852)
    expectErr("SELECT sum(_id) AS s FROM at",
      "_id column cannot be used in aggregate function 'sum'")
    expectErr("SELECT avg(_id) AS a FROM at",
      "_id column cannot be used in aggregate function 'avg'")
    expectErr("SELECT corr(_id, i1) AS c FROM at",
      "_id column cannot be used in aggregate function 'corr'")
    // ...but sum over a literal and count over a column are legal
    check("SELECT sum(1) AS s FROM at", Set(Seq(3L)))
    check("SELECT count(i1) AS c FROM at", Set(Seq(2L)))
    // aggregate over a non-numeric column (defs_aggregate.go:346)
    expectErr("SELECT avg(s1) AS a FROM at",
      "integer or decimal expression expected")
  }

  test("flatten query hint — defs_groupby.go:284-463") {
    // DISTINCT per-member: each set member becomes a singleton set row
    check("SELECT DISTINCT ss1 FROM at WITH (FLATTEN(ss1))",
      Set(Seq(List("101")), Seq(List("102")), Seq(List("201"))))
    // GROUP BY per-member
    check("SELECT count(*) AS c, ss1 FROM at WITH (FLATTEN(ss1)) GROUP BY ss1",
      Set(Seq(1L, List("101")), Seq(1L, List("102")), Seq(1L, List("201"))))
    // unflattened baseline unchanged
    check("SELECT DISTINCT ss1 FROM at WHERE ss1 IS NOT NULL",
      Set(Seq(List("101", "102")), Seq(List("201"))))
    // hint errors, reference wording
    expectErr("SELECT DISTINCT ss1 FROM at WITH (FLATTER(foo))",
      "unknown query hint 'flatter'")
    expectErr("SELECT DISTINCT ss1 FROM at WITH (FLATTEN(foo))",
      "column 'foo' not found")
    expectErr("SELECT DISTINCT ss1 FROM at WITH (FLATTEN(ss1, ids1))",
      "query hint 'flatten' expected 1 parameter(s) (column name), got 2 parameters")
  }

  test("time-quantum tuple literals — defs_timequantum.go") {
    run("""CREATE TABLE tq (_id ID, i1 INT MIN 0 MAX 1000,
          | ss1 STRINGSETQ TIMEQUANTUM 'YMD',
          | ids1 IDSETQ TIMEQUANTUM 'YMD')""".stripMargin)
    // plain set literals bind at batch time (defs_timequantum.go:15-21)
    run("INSERT INTO tq (_id, i1, ss1, ids1) VALUES (1, 1, ['1'], [1])")
    // epoch-seconds and ISO-string tuple timestamps (defs_timequantum.go:71-118)
    run("INSERT INTO tq (_id, i1, ss1, ids1) VALUES " +
      "(1, 3, {1676649734, ['test2']}, {1676649734, [2]})")
    run("INSERT INTO tq (_id, i1, ss1, ids1) VALUES " +
      "(1, 3, {'2022-01-01T00:00:00Z', ['test3']}, {'2022-01-01T00:00:00Z', [3]})")
    // SETQ accumulates across INSERTs to one _id; scalar fields replace
    val r = run("SELECT i1, ss1, ids1 FROM tq WHERE _id = 1").collect()(0)
    assert(r.getAs[Long]("i1") == 3)
    assert(r.getSeq[org.apache.spark.sql.Row](1).map(_.getString(0)).toSet ==
      Set("1", "test2", "test3"))
    assert(r.getSeq[org.apache.spark.sql.Row](2).map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L))
    // rangeq with an open end filters rows AND scopes the projected set to
    // the member VALUES in range — bare deduped values, not (value, ts)
    // structs, the reference's Extract row-key surface
    // (defs_timequantum.go:144-171 expected rows are the range-filtered
    // value sets; 1676649734 = 2023-02-17Z, member 1 = batch time)
    assert(rowsOf("SELECT ids1 FROM tq WHERE rangeq(ids1, '2023-01-01T00:00:00Z', null)")
      .map(_.map { case l: List[_] => l.map(_.asInstanceOf[Long]).toSet }) ==
      Set(Seq(Set(1L, 2L))))
    assert(rowsOf("SELECT _id FROM tq WHERE rangeq(ids1, null, '2022-06-01T00:00:00Z')")
      == Set(Seq(1L)))
    assert(rowsOf("SELECT _id FROM tq WHERE rangeq(ids1, '2030-01-01T00:00:00Z', null)")
      == Set.empty[Seq[Any]])
    // rangeq outside WHERE is a usage error (defs_timequantum.go:139-142)
    expectErr("SELECT _id, rangeq(ss1, '2022-01-02T00:00:00Z', null) FROM tq",
      "calling ranqeq() usage invalid")
    // type-checker wording (defs_timequantum.go:23-69)
    expectErr("INSERT INTO tq (_id, i1, ss1, ids1) VALUES (1, 1, {['1']}, [1])",
      "an expression of type 'tuple(stringset)' cannot be assigned to type 'stringsetq'")
    expectErr("INSERT INTO tq (_id, i1, ss1, ids1) VALUES (1, 1, ['1'], {[1]})",
      "an expression of type 'tuple(idset)' cannot be assigned to type 'idsetq'")
    expectErr("INSERT INTO tq (_id, i1, ss1, ids1) VALUES " +
      "(1, 1, {'notatimestamp', ['1']}, [1])",
      "unable to convert 'notatimestamp' to type 'timestamp'")
    expectErr("INSERT INTO tq (_id, i1, ss1, ids1) VALUES " +
      "(1, 1, {'2022-01-01T00:00:00Z', [1]}, {[1]})",
      "an expression of type 'tuple(string, idset)' cannot be assigned to type 'stringsetq'")
    expectErr("INSERT INTO tq (_id, i1, ss1, ids1) VALUES " +
      "(1, 1, ['1'], {'2022-01-01T00:00:00Z', ['1']})",
      "an expression of type 'tuple(string, stringset)' cannot be assigned to type 'idsetq'")
    expectErr("INSERT INTO tq (_id, i1, ss1, ids1) VALUES (1, 1, '1', {[1]})",
      "an expression of type 'string' cannot be assigned to type 'stringsetq'")
    expectErr("INSERT INTO tq (_id, i1, ss1, ids1) VALUES (1, 1, ['1'], 1)",
      "an expression of type 'int' cannot be assigned to type 'idsetq'")
    // rangeq errors (defs_timequantum.go:119-143)
    expectErr("SELECT _id FROM tq WHERE rangeq(ss1, '2022-01-02T00:00:00Z')",
      "'rangeq': count of formal parameters (3) does not match count of actual parameters (2)")
    expectErr("SELECT _id FROM tq WHERE rangeq(ss1, null, null)",
      "calling ranqeq() 'from' and 'to' parameters cannot both be null")
  }

  test("keyed tables — defs_keyed.go / defs_keyed_insert.go") {
    run("""CREATE TABLE testkeyedinsert (_id STRING, a INT MIN 0 MAX 1000,
          | b INT MIN 0 MAX 1000, s STRING, bl BOOL, d DECIMAL(2),
          | event STRINGSET, ievent IDSET)""".stripMargin)
    run("INSERT INTO testkeyedinsert (_id, a, b, s, bl, d, event, ievent) " +
      "VALUES ('four', 40, 400, 'foo', false, 10.12, ['A', 'B', 'C'], [1, 2, 3])")
    check("SELECT _id, a, b, s, bl FROM testkeyedinsert",
      Set(Seq("four", 40L, 400L, "foo", false)))
    // string keys upsert like integer ids (key translation is implicit —
    // `reference/translate.go`; Spark string joins need no translation layer)
    run("INSERT INTO testkeyedinsert (_id, a, s) VALUES ('four', 44, 'bar'), ('five', 5, 'baz')")
    check("SELECT _id, a, s FROM testkeyedinsert",
      Set(Seq("four", 44L, "bar"), Seq("five", 5L, "baz")))
    check("SELECT _id FROM testkeyedinsert WHERE setcontains(event, 'A') OR a = 5",
      Set(Seq("five")))
    run("DELETE FROM testkeyedinsert WHERE _id = 'five'")
    check("SELECT count(*) AS c FROM testkeyedinsert", Set(Seq(1L)))
  }

  test("views lifecycle — defs_views.go") {
    run("CREATE TABLE viewtable (_id ID, a_string STRING, a_int INT MIN 0 MAX 100)")
    run("INSERT INTO viewtable (_id, a_string, a_int) VALUES " +
      "(1, 'str1', 10), (2, 'str1', 20), (3, 'str2', 30)")
    expectErr("CREATE VIEW viewtable AS SELECT _id, a_string, a_int FROM viewtable",
      "table or view 'viewtable' already exists")
    run("CREATE VIEW viewonviewtable AS SELECT _id, a_string, a_int FROM viewtable")
    expectErr("CREATE VIEW viewonviewtable AS SELECT _id FROM viewtable",
      "view 'viewonviewtable' already exists")
    run("CREATE VIEW IF NOT EXISTS viewonviewtable AS SELECT _id FROM viewtable")
    check("SELECT count(*) AS c FROM viewonviewtable", Set(Seq(3L)))
    // ALTER VIEW redefines (defs_views.go:81-108)
    run("ALTER VIEW viewonviewtable AS SELECT _id, a_string, a_int FROM viewtable WHERE a_int > 20")
    check("SELECT _id FROM viewonviewtable", Set(Seq(3L)))
    expectErr("ALTER VIEW missingview AS SELECT 1", "view 'missingview' not found")
    run("DROP VIEW viewonviewtable")
    run("DROP VIEW IF EXISTS viewonviewtable")
    expectErr("DROP VIEW viewonviewtable", "view 'viewonviewtable' not found")
    expectErr("SELECT * FROM viewonviewtable",
      "table or view 'viewonviewtable' not found")
  }

  test("identifier and TOP/LIMIT errors — defs_sql1.go:536-556, defs_top.go:121") {
    expectErr("SELECT * FROM index_not_found",
      "table or view 'index_not_found' not found")
    expectErr("SELECT field_not_found FROM at",
      "column 'field_not_found' not found")
    expectErr("SELECT TOP(1) count(*) AS c FROM at LIMIT 1",
      "TOP and LIMIT cannot cannot be used at the same time")
    // LIMIT alone is legal (defs_top.go:41-116)
    check("SELECT count(*) AS c FROM at LIMIT 1", Set(Seq(3L)))
    // aggregates are not grouping keys (defs_groupby.go:212-224)
    expectErr("SELECT count(*) AS c FROM at GROUP BY min(i1)",
      "aggregate 'MIN()' not allowed in GROUP BY")
  }

  test("filter predicates across types — defs_filterpredicates.go") {
    run("""CREATE TABLE filter_predicates (_id ID, i1 INT, b1 BOOL, id1 ID,
          | ids1 IDSET, d1 DECIMAL(2), s1 STRING, ss1 STRINGSET,
          | ts1 TIMESTAMP)""".stripMargin)
    run("INSERT INTO filter_predicates VALUES " +
      "(1, 10, false, 1, [10,20,30], 10.00, '10', ['10','20','30'], '2001-11-01T22:08:41+00:00')," +
      "(2, 20, true,  2, [11,21,31], 20.00, '20', ['11','21','31'], '2002-11-01T22:08:41+00:00')," +
      "(3, 30, false, 3, [12,22,32], 30.00, '30', ['12','22','32'], '2003-11-01T22:08:41+00:00')," +
      "(4, 40, false, 4, [10,20,30], 40.00, '40', ['10','20','30'], '2004-11-01T22:08:41+00:00')," +
      "(5, 50, true,  5, [11,21,31], 50.00, '50', ['11','21','31'], '2005-11-01T22:08:41+00:00')," +
      "(6, 60, false, 6, [12,22,32], 60.00, '60', ['12','22','32'], '2006-11-01T22:08:41+00:00')")
    def ids(q: String) = rowsOf(q).map(_.head)
    assert(ids("SELECT _id FROM filter_predicates WHERE _id != 1") == Set(2L, 3L, 4L, 5L, 6L))
    assert(ids("SELECT _id FROM filter_predicates WHERE id1 >= 5") == Set(5L, 6L))
    assert(ids("SELECT _id FROM filter_predicates WHERE i1 <= 20") == Set(1L, 2L))
    assert(ids("SELECT _id FROM filter_predicates WHERE b1 = true") == Set(2L, 5L))
    assert(ids("SELECT _id FROM filter_predicates WHERE d1 > 50.00") == Set(6L))
    assert(ids("SELECT _id FROM filter_predicates WHERE s1 != '10'") == Set(2L, 3L, 4L, 5L, 6L))
    // timestamp-vs-string comparisons with explicit offsets (':314-391')
    assert(ids("SELECT _id FROM filter_predicates WHERE ts1 < '2002-11-01T22:08:41Z'") == Set(1L))
    assert(ids("SELECT _id FROM filter_predicates WHERE ts1 <= '2002-11-01T22:08:41+00:00'") == Set(1L, 2L))
    assert(ids("SELECT _id FROM filter_predicates WHERE ts1 != '2001-11-01T22:08:41+00:00'") ==
      Set(2L, 3L, 4L, 5L, 6L))
  }

  test("insert validation chain — defs_inserts.go:64-153") {
    run("""CREATE TABLE testinsert (_id ID, a INT MIN 0 MAX 1000,
          | b INT MIN 0 MAX 1000, s STRING, bl BOOL,
          | d DECIMAL(2) MIN 0 MAX 1000, event STRINGSET,
          | ievent IDSET)""".stripMargin)
    run("INSERT INTO testinsert (_id, a, b, s, bl, d, event, ievent) VALUES " +
      "(4, 40, 400, 'foo', false, 10.12, ['A','B','C'], [1,2,3])")
    // expressions in VALUES (`:55-62`)
    run("INSERT INTO testinsert (_id, a, b, s, bl, d, event, ievent) VALUES " +
      "(7, 40*10, 400+1, 'foo' || 'bar', 1 > 2, 10.12 + 3.1, ['A'], [1])")
    check("SELECT a, b, s FROM testinsert WHERE _id = 7",
      Set(Seq(400L, 401L, "foobar")))
    expectErr("INSERT INTO ifoo (a, b) VALUES (1, 2)", "table 'ifoo' not found")
    expectErr("INSERT INTO testinsert (c, b) VALUES (1, 2)",
      "column 'c' not found")
    expectErr("INSERT INTO testinsert (a, a, b) VALUES (1, 2)",
      "duplicate column 'a'")
    expectErr("INSERT INTO testinsert (_id, a, b) VALUES (1)",
      "mismatch in the count of expressions and target columns")
    expectErr("INSERT INTO testinsert VALUES (4, 40, 400)",
      "mismatch in the count of expressions and target columns")
    expectErr("INSERT INTO testinsert (a, b) VALUES (1, 2)",
      "insert column list must have '_id' column specified")
    expectErr("INSERT INTO testinsert (_id) VALUES (1)",
      "insert column list must have at least one non '_id' column specified")
    expectErr("INSERT INTO testinsert (_id, a, event) VALUES (4, 40, [101, 150])",
      "an expression of type 'idset' cannot be assigned to type 'stringset'")
    expectErr("INSERT INTO testinsert (_id, a, ievent) VALUES (4, 40, ['POST', 'GET'])",
      "an expression of type 'stringset' cannot be assigned to type 'idset'")
    expectErr("INSERT INTO testinsert (_id, a) VALUES (400, -1)",
      "inserting value into column 'a', row 1, value '-1' out of range")
    expectErr("INSERT INTO testinsert (_id, a) VALUES (400, 1001)",
      "inserting value into column 'a', row 1, value '1001' out of range")
    expectErr("INSERT INTO testinsert (_id, d) VALUES (400, -1.00)",
      "inserting value into column 'd', row 1, value '-1' out of range")
    expectErr("INSERT INTO testinsert (_id, d) VALUES (400, 1001.00)",
      "inserting value into column 'd', row 1, value '1001' out of range")
    // second tuple's row number is reported (`opinsert.go:229-257`)
    expectErr("INSERT INTO testinsert (_id, a) VALUES (400, 5), (401, 2000)",
      "inserting value into column 'a', row 2, value '2000' out of range")
  }

  test("join restrictions — defs_join.go:229-256") {
    run("CREATE TABLE jusers (_id ID, name STRING, age INT)")
    run("CREATE TABLE jorders (_id ID, userid INT, price DECIMAL(2))")
    run("INSERT INTO jusers VALUES (1,'a',21),(2,'c',28),(3,'b',31)")
    run("INSERT INTO jorders VALUES (1,1,9.99),(2,2,3.99),(3,1,14.99)")
    expectErr("SELECT u._id, o.userid FROM jusers u JOIN jorders o ON u.name = o.userid",
      "types 'string' and 'int' are not equatable")
    expectErr("SELECT u._id, o.userid FROM jusers u FULL JOIN jorders o ON o.userid = u._id",
      "FULL join types are not supported")
    expectErr("SELECT u._id, o.userid FROM jusers u RIGHT JOIN jorders o ON o.userid = u._id",
      "RIGHT join types are not supported")
    // comma join with a subquery alias (`:257-274`)
    check("SELECT u._id, u.name, u2._id AS u2_id FROM jusers u, " +
      "(SELECT * FROM jusers WHERE _id = 2) u2 WHERE u._id = u2._id",
      Set(Seq(2L, "c", 2L)))
  }

  test("order by restrictions — defs_orderby.go:24-37, defs_groupby.go:33-38") {
    expectErr("SELECT * FROM at ORDER BY ss1 ASC",
      "unable to sort a column of type 'stringset'")
    expectErr("SELECT * FROM at ORDER BY ids1 ASC",
      "unable to sort a column of type 'idset'")
    expectErr("SELECT COUNT(*) AS c, i1 FROM at GROUP BY i1 ORDER BY COUNT(*) ASC",
      "column reference, alias reference or column position expected")
    // position and alias remain legal (`defs_groupby.go:39-60`)
    check("SELECT COUNT(*) AS c, b1 FROM at WHERE b1 IS NOT NULL GROUP BY b1 ORDER BY 2 ASC",
      Set(Seq(1L, false), Seq(1L, true)))
  }

  test("having — defs_having.go") {
    run("""CREATE TABLE having_test (_id ID, an_int INT MIN 0 MAX 100,
          | an_id_set IDSET, an_id ID, a_string STRING,
          | a_string_set STRINGSET, a_decimal DECIMAL(2))""".stripMargin)
    run("INSERT INTO having_test VALUES " +
      "(1, 11, [11,12,13], 101, 'str1', ['a1','b1','c1'], 123.45)," +
      "(2, 22, [21,22,23], 201, 'str2', ['a2','b2','c2'], 234.56)," +
      "(3, 33, [31,32,33], 301, 'str3', ['a3','b3','c3'], 345.67)," +
      "(4, 44, [41,42,43], 401, 'str4', ['a4','b4','c4'], 456.78)," +
      "(5, 11, [11,12,13], 101, 'str1', ['a5','b5','c5'], 567.89)")
    check("SELECT count(an_int) AS c, an_int FROM having_test GROUP BY an_int HAVING count(an_int) = 1",
      Set(Seq(1L, 22L), Seq(1L, 33L), Seq(1L, 44L)))
    check("SELECT an_int FROM having_test GROUP BY an_int HAVING count(an_int) = 1",
      Set(Seq(22L), Seq(33L), Seq(44L)))
    check("SELECT count(*) AS c, an_int FROM having_test GROUP BY an_int HAVING count(*) > 1",
      Set(Seq(2L, 11L)))
    check("SELECT an_int FROM having_test GROUP BY an_int HAVING count(*) > 1",
      Set(Seq(11L)))
    check("SELECT sum(a_decimal) AS s, an_int FROM having_test GROUP BY an_int HAVING sum(a_decimal) < 250.00",
      Set(Seq(234.56, 22L)))
    check("SELECT sum(an_int) AS s, an_int FROM having_test GROUP BY an_int HAVING sum(an_int) < 25",
      Set(Seq(22L, 11L), Seq(22L, 22L)))
    check("SELECT a_string, count(*) AS c FROM having_test GROUP BY a_string HAVING count(*) > 1",
      Set(Seq("str1", 2L)))
  }

  test("distinct across types incl. sets — defs_distinct.go") {
    run("""CREATE TABLE distinct_test (_id ID, i1 INT, b1 BOOL, id1 ID,
          | ids1 IDSET, d1 DECIMAL(2), s1 STRING, ss1 STRINGSET)""".stripMargin)
    run("INSERT INTO distinct_test VALUES " +
      "(1, 10, false, 1, [10,20,30], 10.00, '10', ['10','20','30'])," +
      "(2, 20, true,  2, [11,21,31], 20.00, '20', ['11','21','31'])," +
      "(3, 30, false, 3, [12,22,32], 30.00, '30', ['12','22','32'])," +
      "(4, 10, false, 1, [10,20,30], 10.00, '10', ['10','20','30'])," +
      "(5, 20, true,  2, [11,21,31], 20.00, '20', ['11','21','31'])," +
      "(6, 30, false, 3, [12,22,32], 30.00, '30', ['12','22','32'])")
    check("SELECT DISTINCT i1, b1, id1 FROM distinct_test",
      Set(Seq(10L, false, 1L), Seq(20L, true, 2L), Seq(30L, false, 3L)))
    check("SELECT DISTINCT b1 FROM distinct_test", Set(Seq(false), Seq(true)))
    check("SELECT DISTINCT d1 FROM distinct_test",
      Set(Seq(10.0), Seq(20.0), Seq(30.0)))
    // distinct over whole set values — member-set identity, not membership
    check("SELECT DISTINCT ids1 FROM distinct_test",
      Set(Seq(List(10L, 20L, 30L)), Seq(List(11L, 21L, 31L)), Seq(List(12L, 22L, 32L))))
    check("SELECT DISTINCT ss1 FROM distinct_test",
      Set(Seq(List("10", "20", "30")), Seq(List("11", "21", "31")), Seq(List("12", "22", "32"))))
  }

  test("subquery aggregates — defs_subquery.go") {
    run("CREATE TABLE subquerytable (_id ID, a_string STRING)")
    run("INSERT INTO subquerytable VALUES (1,'str1'),(2,'str1'),(3,'str2'),(4,'str2'),(5,'str3')")
    check("SELECT sum(mycount) AS thecount FROM (SELECT count(a_string) AS mycount, a_string " +
      "FROM subquerytable GROUP BY a_string)", Set(Seq(5L)))
    check("SELECT sum(mycount) AS thecount FROM (SELECT count(DISTINCT a_string) AS mycount, a_string " +
      "FROM subquerytable GROUP BY a_string)", Set(Seq(3L)))
  }

  // -------------------------------------------------------------- SQL1
  // Legacy SQL1 compat corpus (`defs_sql1.go`): the statements existing
  // FeatureBase apps issue against the old `sql/` translator, answered with
  // sql3 semantics (the reference runs this corpus through sql3 too — e.g.
  // the INNER JOIN count expects the true join-pair count 10, not the old
  // PQL Distinct-Intersect's 8). Legacy-created indexes store fields
  // ALPHABETICALLY, which is why `select *` yields _id + sorted columns; the
  // fixtures are created in that stored order.

  private lazy val sql1Fixtures: Unit = {
    run("""CREATE TABLE grouper (_id ID, age INT MIN 0 MAX 100, color STRING,
          | height INT MIN 0 MAX 1000, score INT MIN -1000 MAX 1000,
          | timestamp TIMESTAMP)""".stripMargin)
    run("INSERT INTO grouper (_id, age, color, height, score, timestamp) VALUES " +
      "(1, 27, 'blue', 20, -10, '2011-04-02T12:32:00Z')," +
      "(2, 16, 'blue', 30, -8, '2011-01-02T12:32:00Z')," +
      "(3, 19, 'red', 40, 6, '2012-01-02T12:32:00Z')," +
      "(4, 27, 'green', 50, 0, '2013-09-02T12:32:00Z')," +
      "(5, 16, 'blue', 60, -2, '2014-01-02T12:32:00Z')," +
      "(6, 34, 'blue', 70, 100, '2010-05-02T12:32:00Z')," +
      "(7, 27, 'blue', 80, 0, '2016-08-02T12:32:00Z')," +
      "(8, 16, NULL, 90, -13, '2020-01-02T12:32:00Z')," + // color is the only null
      "(9, 16, 'red', 100, 80, '2000-03-02T12:32:00Z')," +
      "(10, 31, 'red', 110, -2, '2018-01-02T12:32:00Z')")
    run("CREATE TABLE joiner (_id ID, grouperid INT MIN 0 MAX 1000, " +
      "jointype INT MIN -1000 MAX 1000)")
    run("INSERT INTO joiner VALUES (1,1,1),(2,2,1),(3,5,1),(4,6,1),(5,7,1)," +
      "(6,3,2),(7,8,2),(8,9,2),(9,1,3),(10,2,3)")
  }

  test("sql1 — projection and star expansion (defs_sql1.go:88-148)") {
    sql1Fixtures
    val ages = run("select age from grouper;")
    assert(ages.columns.toSeq == Seq("age"))
    assert(ages.orderBy().collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(16L, 16L, 16L, 16L, 19L, 27L, 27L, 27L, 31L, 34L))
    val star = run("select * from grouper where _id=2;")
    assert(star.columns.toSeq ==
      Seq("_id", "age", "color", "height", "score", "timestamp"))
    val r = star.collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 16L && r.getString(2) == "blue" &&
      r.getLong(3) == 30L && r.getLong(4) == -8L &&
      r.getTimestamp(5).toInstant == java.time.Instant.parse("2011-01-02T12:32:00Z"))
    assert(run("select * from grouper;").count() == 10)
  }

  test("sql1 — joins with aliases and qualified filters (defs_sql1.go:149-193,505-535)") {
    sql1Fixtures
    check("select count(*) from grouper g INNER JOIN joiner j ON g._id = j.grouperid;",
      Set(Seq(10L)))
    check("select distinct _id from grouper g INNER JOIN joiner j ON g._id = j.grouperid;",
      Set(Seq(1L), Seq(2L), Seq(3L), Seq(5L), Seq(6L), Seq(7L), Seq(8L), Seq(9L)))
    check("select _id from grouper g INNER JOIN joiner j ON g._id = j.grouperid " +
      "where g.color = 'red';", Set(Seq(3L), Seq(9L)))
    check("select _id from grouper g INNER JOIN joiner j ON g._id = j.grouperid " +
      "where g.color = 'red' and j.jointype = 2;", Set(Seq(3L), Seq(9L)))
    // the three AndExpr association orders from extract.go all mean the same
    for (conds <- Seq(
      "g.color = 'red' and j.jointype = 2 and g.age = 16",
      "j.jointype = 2 and g.color = 'red' and g.age = 16",
      "g.color = 'red' and g.age = 16 and j.jointype = 2"))
      check("select _id from grouper g INNER JOIN joiner j ON g._id = j.grouperid " +
        s"where $conds;", Set(Seq(9L)))
  }

  test("sql1 — distinct, order by, group by (defs_sql1.go:194-306,383-396)") {
    sql1Fixtures
    val asc = run("select distinct score from grouper order by score asc;")
      .collect().map(_.getLong(0)).toSeq
    assert(asc == Seq(-13L, -10L, -8L, -2L, 0L, 6L, 80L, 100L))
    val desc = run("select distinct score from grouper order by score desc;")
      .collect().map(_.getLong(0)).toSeq
    assert(desc == asc.reverse)
    check("select distinct height from grouper;",
      (2 to 11).map(h => Seq(h * 10L)).toSet)
    check("select age as yrs, count(*) as cnt from grouper group by age;",
      Set(Seq(16L, 4L), Seq(19L, 1L), Seq(27L, 3L), Seq(31L, 1L), Seq(34L, 1L)))
  }

  test("sql1 — time-bounded filters (defs_sql1.go:384-437)") {
    sql1Fixtures
    check("select age, height from grouper where timestamp > '2017-09-02T12:32:00Z' " +
      "and height > 40 group by age, height;", Set(Seq(16L, 90L), Seq(31L, 110L)))
    check("select age, height from grouper where timestamp > '2017-09-02T12:32:00Z' " +
      "or height > 90;", Set(Seq(16L, 90L), Seq(16L, 100L), Seq(31L, 110L)))
    check("select age, height from grouper where timestamp > '2017-09-02T12:32:00Z' " +
      "and timestamp < '2019-09-02T12:32:00Z';", Set(Seq(31L, 110L)))
    check("select age, height from grouper where (timestamp > '2017-09-02T12:32:00Z' " +
      "and timestamp < '2019-09-02T12:32:00Z');", Set(Seq(31L, 110L)))
    check("select distinct age from grouper where timestamp > '2019-09-02T12:32:00Z';",
      Set(Seq(16L)))
  }

  test("sql1 — show statements and error wordings (defs_sql1.go:438-558)") {
    sql1Fixtures
    expectErr("select age from grouper where ();", "expected expression, found")
    val tables = run("show tables;").collect().map(_.getAs[String]("name")).toSet
    assert(Set("grouper", "joiner").subsetOf(tables))
    val cols = run("show columns from grouper;")
      .collect().map(r => (r.getAs[String]("name"), r.getAs[String]("type"))).toSet
    assert(Set(("age", "int"), ("color", "string"), ("height", "int"),
      ("score", "int"), ("timestamp", "timestamp")).subsetOf(cols))
    expectErr("select * from index_not_found;",
      "table or view 'index_not_found' not found")
    expectErr("select field_not_found from grouper;",
      "column 'field_not_found' not found")
    expectErr("select _id, age, field_not_found from grouper;",
      "column 'field_not_found' not found")
    expectErr("select age, color, count(*) as c from grouper group by field_not_found, age, color;",
      "column 'field_not_found' not found")
    expectErr("select count(*) from grouper inner join joiner on grouper._id = joiner.field_not_found;",
      "column 'field_not_found' not found")
  }

  test("percentile argument shapes — defs_aggregate.go:460-501") {
    expectErr("SELECT percentile(10, i1) AS p FROM at",
      "column reference expected")
    expectErr("SELECT percentile(_id, 50) AS p FROM at",
      "_id column cannot be used in aggregate function 'percentile'")
    expectErr("SELECT percentile(i1, d1) AS p FROM at",
      "literal expression expected")
    expectErr("SELECT percentile(s1, 50) AS p FROM at",
      "integer, decimal or timestamp expression expected")
  }

  // `defs_select.go:50-70`: star-plus-extra-column projection keeps the
  // full schema and appends the alias
  test("select *, col AS alias appends to the star expansion (defs_select.go:50-70)") {
    run("CREATE TABLE selx (_id ID, an_int INT MIN 0 MAX 100, a_string STRING)")
    run("INSERT INTO selx VALUES (1, 11, 'str1'), (2, 22, 'str2')")
    val df = run("select *, an_int AS foo from selx where _id = 1")
    assert(df.columns.toSeq == Seq("_id", "an_int", "a_string", "foo"))
    val r = df.collect()(0)
    assert(r.getLong(0) == 1L && r.getLong(1) == 11L &&
      r.getString(2) == "str1" && r.getLong(3) == 11L)
    run("DROP TABLE selx")
  }

  // `parser/scanner.go:338-339`: '-' is an identifier character, so
  // `un-keyed` is one token (`defs_select.go` fixture) — and by the same
  // lexing rule unspaced `i1-1` is an unknown-column reference, not
  // subtraction.
  test("hyphenated identifiers — scanner.go:338-339 / defs_select.go") {
    run("CREATE TABLE un-keyed (_id ID, an_int INT MIN 0 MAX 100)")
    run("INSERT INTO un-keyed VALUES (1, 11), (2, 22)")
    check("select * from un-keyed", Set(Seq(1L, 11L), Seq(2L, 22L)))
    check("select _id, an_int AS foo from un-keyed where _id = 2",
      Set(Seq(2L, 22L)))
    check("select an_int - 1 from un-keyed where _id = 1", Set(Seq(10L)))
    expectErr("select an_int-1 from un-keyed",
      "column 'an_int-1' not found")
    run("DROP TABLE un-keyed")
  }
}
