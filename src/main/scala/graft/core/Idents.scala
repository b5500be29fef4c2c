package graft.core

/** Reference identifiers may contain `-`: the scanner's isUnquotedIdent
  * (`reference/sql3/parser/scanner.go:338-339`) admits alpha, digit, `_`
  * AND `-`, so `un-keyed` is ONE identifier and subtraction requires
  * spaces. Spark's name-parsing APIs (createOrReplaceTempView,
  * spark.table, catalog.tableExists) need such names backtick-quoted;
  * `catalog.dropTempView` takes the RAW name (it does not parse).
  */
object Idents {
  private val Plain = "[A-Za-z_][A-Za-z0-9_]*".r

  /** Quote a table/view name for Spark's name-PARSING APIs when it isn't a
    * plain identifier. Idempotent on already-plain names. */
  def q(name: String): String =
    if (Plain.matches(name)) name else "`" + name.replace("`", "``") + "`"
}
