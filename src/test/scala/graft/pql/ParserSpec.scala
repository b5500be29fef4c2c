package graft.pql

import org.scalatest.funsuite.AnyFunSuite

class ParserSpec extends AnyFunSuite {
  test("simple row call") {
    val c = Parser.parseOne("Row(f=5)")
    assert(c == Call("Row", Seq(KV("f", "=", LongV(5)))))
  }
  test("string values, both quote styles") {
    assert(Parser.parseOne("Row(f='x y')") == Call("Row", Seq(KV("f", "=", StrV("x y")))))
    assert(Parser.parseOne("Row(f=\"x\\\"y\")") == Call("Row", Seq(KV("f", "=", StrV("x\"y")))))
  }
  test("condition operators") {
    assert(Parser.parseOne("Row(a > 5)") == Call("Row", Seq(KV("a", ">", LongV(5)))))
    assert(Parser.parseOne("Row(a >= -5)") == Call("Row", Seq(KV("a", ">=", LongV(-5)))))
    assert(Parser.parseOne("Row(a != null)") == Call("Row", Seq(KV("a", "!=", NullV))))
    assert(Parser.parseOne("Row(a >< [1, 10])") ==
      Call("Row", Seq(KV("a", "><", ListV(Seq(LongV(1), LongV(10)))))))
  }
  test("nested calls") {
    val c = Parser.parseOne("Count(Intersect(Row(a=1), Row(b>2.5)))")
    assert(c.name == "Count")
    val inter = c.children.head
    assert(inter.name == "Intersect" && inter.children.size == 2)
    assert(inter.children(1).args == Seq(KV("b", ">", DoubleV(2.5))))
  }
  test("named call args and bare-field sugar") {
    val c = Parser.parseOne(
      "GroupBy(Rows(age), filter=Row(x=1), aggregate=Sum(field=v), sort=\"count desc\", limit=10)")
    assert(c.children.map(_.name) == Seq("Rows"))
    assert(c.children.head.fieldArg.contains("age"))
    assert(c.namedCall("filter").exists(_.name == "Row"))
    assert(c.namedCall("aggregate").exists(_.fieldArg.contains("v")))
    assert(c.str("sort").contains("count desc"))
    assert(c.long("limit").contains(10L))
  }
  test("lists, bools, floats, dashed keys") {
    val c = Parser.parseOne("ConstRow(columns=[1, 2, 3])")
    assert(c.named("columns").contains(ListV(Seq(LongV(1), LongV(2), LongV(3)))))
    val s = Parser.parseOne("Sort(All(), field=x, sort-desc=true)")
    assert(s.bool("sort-desc").contains(true))
  }
  test("multiple top-level calls") {
    assert(Parser.parse("Count(All()) Count(All())").size == 2)
  }
  test("parse errors are reported") {
    intercept[ParseError](Parser.parseOne("Row(f=)"))
    intercept[ParseError](Parser.parseOne("Row('unterminated"))
  }
}
