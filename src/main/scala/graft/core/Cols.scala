package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Literal, TruncTimestamp}
import org.apache.spark.sql.graftshim.Shim

/** Registry-bypassing Column builders for internal pipelines.
  *
  * `functions.date_trunc` resolves BY NAME through the session function
  * registry, where the reference dialect registers its own DATE_TRUNC
  * (string-returning, reference unit codes — `graft.sql.Functions`). Internal
  * DataFrame pipelines that want Spark's builtin semantics must build the
  * Catalyst expression directly. */
object Cols {
  /** Spark-builtin `date_trunc` (timestamp result), immune to the dialect
    * registry override. */
  def dateTrunc(fmt: String, c: Column): Column =
    Shim.column(TruncTimestamp(Literal(fmt), Shim.expression(c)))
}
