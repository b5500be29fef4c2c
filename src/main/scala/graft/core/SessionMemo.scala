package graft.core

import org.apache.spark.sql.SparkSession

/** Per-session registration memo: `runIfChanged` executes the body only
  * when the stored marker differs from `marker`, then records it. Weak keys
  * so stopped sessions don't pin memory. Shared by catalog-view and
  * function registration (one idiom to fix if the check-then-act semantics
  * ever need tightening). */
final class SessionMemo[V] {
  private val map = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, V]())

  def runIfChanged(spark: SparkSession, marker: V)(body: => Unit): Unit =
    if (map.get(spark) != marker) { body; map.put(spark, marker) }

  def clear(spark: SparkSession): Unit = { map.remove(spark); () }
}
