package graft.pql

/** PQL AST — models the reference grammar (`reference/pql/pql.peg:8-22`):
  * a Lisp-ish call tree `Name(child1, child2, key=value, field <op> value)`.
  */
sealed trait Value
case object NullV extends Value
final case class LongV(v: Long) extends Value
final case class DoubleV(v: Double) extends Value
final case class StrV(v: String) extends Value
final case class BoolV(v: Boolean) extends Value
final case class ListV(vs: Seq[Value]) extends Value

sealed trait Arg
/** Positional child call: Intersect(Row(..), Row(..)) */
final case class Child(call: Call) extends Arg
/** Positional literal: the record-id slot of write calls — Set(10, f=v)
  * (`reference/pql/pql.peg:10-12` Set/Clear grammar). */
final case class Pos(v: Value) extends Arg
/** key=Call argument: GroupBy(..., aggregate=Sum(field=x), filter=Row(..)) */
final case class NamedCall(key: String, call: Call) extends Arg
/** key <op> value — covers both named options (limit=10) and field
  * conditions (qty > 5, qty >< [1,10]); the compiler disambiguates by call
  * semantics, mirroring the reference where condition keys are field names
  * (`reference/pql/ast.go` Call.Args). Op ∈ = != < <= > >= ><
  */
final case class KV(key: String, op: String, v: Value) extends Arg

final case class Call(name: String, args: Seq[Arg]) {
  def children: Seq[Call] = args.collect { case Child(c) => c }
  def named(key: String): Option[Value] =
    args.collectFirst { case KV(k, "=", v) if k == key => v }
  def namedCall(key: String): Option[Call] =
    args.collectFirst { case NamedCall(k, c) if k == key => c }
  def long(key: String): Option[Long] = named(key).collect { case LongV(v) => v }
  def str(key: String): Option[String] = named(key).collect { case StrV(v) => v }
  def bool(key: String): Option[Boolean] = named(key).collect { case BoolV(v) => v }
  /** Field-name argument: Sum(field=x) or bare-identifier sugar Rows(x). */
  def fieldArg: Option[String] =
    str("field").orElse(str("_field"))
  /** Positional literals in order: Set(10, f=v) → Seq(LongV(10)). */
  def positional: Seq[Value] = args.collect { case Pos(v) => v }
  /** First `field=value` pair whose key is not a reserved option — the
    * (field, value) of write calls like Set(10, fruit='apple'). */
  def fieldValue(reserved: Set[String]): Option[(String, String, Value)] =
    args.collectFirst { case KV(k, op, v) if !reserved(k) && k != "_field" => (k, op, v) }
}
