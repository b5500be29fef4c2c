package graft.pql

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** The ivy (APL-dialect) interpreter behind Apply()
  * (`reference/apply.go:36-46,194-257` — per-shard robpike.io/ivy programs
  * over the Arrow sidecar columns, `_` result register, coordinator reduce).
  * Unit-tests the language core, then runs the reference's own
  * `dataframe_test.go` Apply shapes end-to-end. */
class IvySpec extends SparkSpec {

  import Ivy._

  private def ev(prog: String, env: Map[String, V] = Map.empty): V =
    Ivy.run(Ivy.parse(prog), env)

  // ------------------------------------------------------------ interpreter

  test("scalars, vectors, right-associative equal precedence") {
    assert(ev("2+3") == IN(5))
    // ivy/APL: 2*3+4 = 2*(3+4), not (2*3)+4
    assert(ev("2*3+4") == IN(14))
    assert(ev("10-4-3") == IN(9)) // 10-(4-3)
    assert(ev("1 2 3 + 10 20 30") == Vec(IndexedSeq(IN(11), IN(22), IN(33))))
    assert(ev("2 * 1 2 3") == Vec(IndexedSeq(IN(2), IN(4), IN(6))))
    assert(ev("(2*3)+4") == IN(10))
  }

  test("division: exact when divisible, double otherwise (documented rational divergence)") {
    assert(ev("10/2") == IN(5))
    assert(ev("7/2") == FN(3.5))
    assert(ev("7 div 2") == IN(3))
    assert(ev("7 mod 3") == IN(1))
    assert(ev("2**10") == IN(1024))
  }

  test("** is squaring with overflow check, not an O(exponent) loop") {
    // |base|<=1 with a huge exponent must return instantly (was a spin loop)
    val t0 = System.nanoTime()
    assert(ev("1 ** 999999999999") == IN(1))
    assert(ev("0 ** 999999999999") == IN(0))
    assert(ev("0 ** 0") == IN(1))
    assert(ev("5 ** 0") == IN(1))
    assert(ev("3 ** 1") == IN(3))
    assert(ev("(0-1) ** 999999999999") == IN(-1))
    assert(ev("(0-1) ** 999999999998") == IN(1))
    assert((System.nanoTime() - t0) < 2e9, "|a|<=1 fast path must not loop")
    assert(ev("2 ** 62") == IN(1L << 62))
    assert(ev("3 ** 5") == IN(243))
    assert(ev("(0-2) ** 3") == IN(-8))
    // any |base|>=2 overflows within 63 squarings — error, not a hang
    intercept[Exception](ev("2 ** 64"))
    intercept[Exception](ev("2 ** 999999999999"))
  }

  test("iota, rho, take, drop, rev, indexing at origin 1") {
    assert(ev("iota 5") == Vec((1L to 5).map(IN(_)).toIndexedSeq))
    assert(ev("rho iota 5") == IN(5))
    assert(ev("3 rho 7") == Vec(IndexedSeq(IN(7), IN(7), IN(7))))
    assert(ev("5 rho 1 2") == Vec(IndexedSeq(IN(1), IN(2), IN(1), IN(2), IN(1))))
    assert(ev("2 take iota 5") == Vec(IndexedSeq(IN(1), IN(2))))
    assert(ev("(-2) take iota 5") == Vec(IndexedSeq(IN(4), IN(5))))
    // unary minus takes the whole expression right (APL: no negative literals)
    assert(ev("-2 take iota 5") == Vec(IndexedSeq(IN(-1), IN(-2))))
    assert(ev("2 drop iota 4") == Vec(IndexedSeq(IN(3), IN(4))))
    assert(ev("rev iota 3") == Vec(IndexedSeq(IN(3), IN(2), IN(1))))
    assert(ev("x[2]", Map("x" -> Vec(IndexedSeq(IN(10), IN(20), IN(30))))) == IN(20))
    assert(ev("x[3 1]", Map("x" -> Vec(IndexedSeq(IN(10), IN(20), IN(30)))))
      == Vec(IndexedSeq(IN(30), IN(10))))
    assertThrows[IvyError](ev("x[0]", Map("x" -> Vec(IndexedSeq(IN(1))))))
  }

  test("reductions fold right; comparisons and logicals yield 0/1") {
    assert(ev("+/iota 100") == IN(5050))
    assert(ev("-/1 2 3") == IN(2)) // 1-(2-3), APL right fold
    assert(ev("max/3 9 4") == IN(9))
    assert(ev("*/1 2 3 4") == IN(24))
    assert(ev("+/ 0 0 0 0") == IN(0))
    assert(ev("2 < 3") == IN(1))
    assert(ev("1 2 3 == 1 9 3") == Vec(IndexedSeq(IN(1), IN(0), IN(1))))
    assert(ev("+/ 1 2 3 > 1 1 9") == IN(1))
    assert(ev("1 and 0") == IN(0))
    assert(ev("not 0 1 5") == Vec(IndexedSeq(IN(1), IN(0), IN(0))))
  }

  test("sqrt/log/exp and grade up/down (the x[up x] sort idiom)") {
    assert(ev("sqrt 16") == FN(4.0))
    assert(ev("floor exp log 7") == IN(6) || ev("floor exp log 7") == IN(7))
    assert(ev("up 30 10 20") == Vec(IndexedSeq(IN(2), IN(3), IN(1))))
    assert(ev("down 30 10 20") == Vec(IndexedSeq(IN(1), IN(3), IN(2))))
    assert(ev("x[up x]", Map("x" -> Vec(IndexedSeq(IN(3), IN(1), IN(2)))))
      == Vec(IndexedSeq(IN(1), IN(2), IN(3))))
    // stable grade: ties keep original order
    assert(ev("up 5 5 1") == Vec(IndexedSeq(IN(3), IN(1), IN(2))))
  }

  test("assignment statements; `_` is the last evaluated expression") {
    assert(ev("x = iota 4\n+/x*x") == IN(30))
    assert(ev("x = 2\ny = 3\nx**y") == IN(8))
  }

  test("concatenation and strings") {
    assert(ev("1 2 , 3 4") == Vec(IndexedSeq(IN(1), IN(2), IN(3), IN(4))))
    assert(ev("'ab' == 'ab'") == IN(1))
    assert(ev("'a' + 'b'") == SV("ab"))
  }

  test("errors: undefined names, length mismatch, division by zero") {
    assertThrows[IvyError](ev("barf"))
    assertThrows[IvyError](ev("1 2 + 1 2 3"))
    assertThrows[IvyError](ev("1/0"))
  }

  test("eligibility gate: ivy vs Spark-SQL projection programs") {
    val schema = Tables.load(spark, sfDir, "part").schema
    assert(Ivy.eligible("_ID + p_size", schema))
    assert(Ivy.eligible("+/p_size", schema))
    assert(!Ivy.eligible("p_partkey + p_size AS v", schema)) // SQL mode
    assert(!Ivy.eligible("upper(p_name)", schema))           // SQL mode
    assert(Ivy.eligible("barf", schema) == false)            // unknown ident
  }

  // ---------------------------------------------------- end-to-end Apply()

  private def apply_(tbl: String, q: String) = Pql.run(spark, sfDir, tbl, q)

  test("Apply('_ID','_') returns the id vector (reference dataframe_test.go:91)") {
    val got = apply_("region", "Apply('_ID', '_')").collect()
    val ids = Tables.load(spark, sfDir, "region").select("_id")
      .orderBy("_id").collect().map(_.getLong(0)).toSeq
    assert(got.map(_.getLong(1)).toSeq == ids)
    assert(got.map(_.getLong(0)).toSeq == (1L to ids.length).toSeq) // idx
  }

  test("Apply with filter child (reference dataframe_test.go:110)") {
    val got = apply_("nation", "Apply(ConstRow(columns=[2,4,6]), '_ID+0', '_')")
      .collect().map(_.getLong(1)).toSeq
    assert(got == Seq(2L, 4L, 6L))
  }

  test("Apply map error and reduce error propagate (dataframe_test.go:125-132)") {
    assertThrows[Exception](apply_("region", "Apply('barf', '_')").collect())
    assertThrows[Exception](apply_("region", "Apply('_ID', 'barfo')").collect())
  }

  test("associative reduce combines shard partials: +/_") {
    val got = apply_("part", "Apply(Row(p_size > 40), 'p_size', '+/_')")
      .collect()
    val want = Tables.load(spark, sfDir, "part").filter(col("p_size") > 40)
      .agg(sum("p_size")).collect()(0).getLong(0)
    assert(got.length == 1 && got(0).getLong(1) == want)
  }

  test("general reduce program runs over the concatenation") {
    // average via a non-peephole reduce: (+/_) / rho _
    val got = apply_("part", "Apply('p_size', '(+/_) / rho _')").collect()
    val df = Tables.load(spark, sfDir, "part")
    val (s, c) = (df.agg(sum("p_size")).collect()(0).getLong(0), df.count())
    val want = if (s % c == 0) IN(s / c) else FN(s.toDouble / c)
    want match {
      case IN(v) => assert(got(0).getLong(1) == v)
      case FN(v) => assert(math.abs(got(0).getDouble(1) - v) < 1e-9)
      case _ => fail()
    }
  }

  test("general reduce refuses an over-bound coordinator collect, " +
      "naming the associative path") {
    // the parity shape (apply.go:100-115) concatenates every shard's rows
    // on the coordinator; past the configurable bound that must fail with
    // a useful error, not an opaque driver OOM
    spark.conf.set("graft.ivy.maxReduceRows", "5")
    try {
      val e = intercept[Exception] {
        apply_("part", "Apply('p_size', '(+/_) / rho _')").collect()
      }
      assert(e.getMessage.contains("associative"), e.getMessage)
      assert(e.getMessage.contains("graft.ivy.maxReduceRows"), e.getMessage)
    } finally spark.conf.unset("graft.ivy.maxReduceRows")
    // associative reduces combine shard-side — unaffected by the bound
    spark.conf.set("graft.ivy.maxReduceRows", "1")
    try {
      val got = apply_("part", "Apply('p_size', '+/_')").collect()
      assert(got.length == 1)
    } finally spark.conf.unset("graft.ivy.maxReduceRows")
  }

  test("empty filter yields empty result") {
    assert(apply_("region", "Apply(ConstRow(columns=[999999]), '_ID', '_')").count() == 0)
  }

  test("expression program over multiple columns matches SQL") {
    // right-associative: 2 * _ID + p_size = 2 * (_ID + p_size)
    val got = apply_("part", "Apply(Row(p_size > 45), '2 * _ID + p_size', '_')")
      .collect().map(_.getLong(1)).toSeq
    val want = Tables.load(spark, sfDir, "part").filter(col("p_size") > 45)
      .orderBy("_id").select((col("_id") + col("p_size")) * 2)
      .collect().map(_.getLong(0)).toSeq
    assert(got == want)
  }

  test("SQL-projection fallback mode still works (documented extension)") {
    val got = apply_("part", "Apply(Row(p_size > 40), 'p_partkey + p_size AS v')")
    assert(got.columns.toSeq == Seq("_id", "v") && got.count() > 0)
  }

  test("differential fuzz: random ivy programs, distributed vs driver-side eval " +
      "(count/seed via SPARK_GRAFT_IVY_FUZZ_N/_SEED)") {
    // sf0.001 ids all fall in shard 0, so the per-shard map equals a
    // whole-corpus evaluation — the distributed path must agree exactly
    // with Ivy.run over the collected column vectors.
    val df = Tables.load(spark, sfDir, "part").select("_id", "p_size")
    val rows = df.orderBy("_id").collect()
    val env = Map[String, V](
      "_ID" -> Vec(rows.map(r => IN(r.getAs[Number](0).longValue)).toIndexedSeq),
      "p_size" -> Vec(rows.map(r => IN(r.getAs[Number](1).longValue)).toIndexedSeq))
    val nFuzz = sys.env.getOrElse("SPARK_GRAFT_IVY_FUZZ_N", "150").toInt
    val rnd = new scala.util.Random(
      sys.env.get("SPARK_GRAFT_IVY_FUZZ_SEED").map(_.toLong).getOrElse(42L))
    val atoms = Vector("_ID", "p_size", "2", "3", "7")
    val ops = Vector("+", "-", "*", "max", "min")
    def gen(depth: Int): String =
      if (depth == 0) atoms(rnd.nextInt(atoms.size))
      else rnd.nextInt(6) match {
        case 0 => s"(- ${gen(depth - 1)})"
        case 1 => s"(${Vector("+", "max", "min")(rnd.nextInt(3))}/ ${gen(depth - 1)})"
        case _ => s"(${gen(depth - 1)} ${ops(rnd.nextInt(ops.size))} ${gen(depth - 1)})"
      }
    var ran = 0
    (1 to nFuzz).foreach { k =>
      val prog = gen(1 + rnd.nextInt(3))
      val want = try Some(Ivy.run(Ivy.parse(prog), env)) catch {
        case _: ArithmeticException => None // overflow: both paths throw
      }
      want.foreach { w =>
        ran += 1
        val items = w match { case Vec(vs) => vs; case s => IndexedSeq(s) }
        val got = Ivy.applyIvy(df, prog, None).orderBy("idx")
          .collect().map(_.getLong(1)).toSeq
        val wantL = items.map { case IN(v) => v; case other => fail(s"#$k non-int $other") }
        assert(got == wantL, s"#$k mismatch for program: $prog")
      }
    }
    info(s"fuzzed $ran ivy programs (of $nFuzz generated; overflowing ones skipped)")
  }
}
