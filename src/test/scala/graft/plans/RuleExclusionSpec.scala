package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the engine-wide `InferFiltersFromGenerate` exclusion boundary
  * (EngineConf, r15): the exclusion exists because inferred
  * `isnotnull/size>0` conjuncts re-evaluated derived set columns 3× per
  * row; its only correctness surface is explode semantics over
  * null/empty/nullable arrays, which must stay IDENTICAL to the
  * rule-enabled plans. A future OUTER-explode or nullable-array source
  * regressing here should fail at test time, not at 100 TB (r15 VERDICT
  * item 8). */
class RuleExclusionSpec extends SparkSpec {

  private val Rule =
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"

  private def withRuleEnabled[T](f: => T): T = {
    val prev = spark.conf.getOption("spark.sql.optimizer.excludedRules")
    spark.conf.set("spark.sql.optimizer.excludedRules", "")
    try f finally prev match {
      case Some(v) => spark.conf.set("spark.sql.optimizer.excludedRules", v)
      case None    => spark.conf.unset("spark.sql.optimizer.excludedRules")
    }
  }

  test("exclusion is active in the engine session") {
    assert(spark.conf.get("spark.sql.optimizer.excludedRules", "")
      .contains(Rule))
  }

  test("inner and outer explode over null/empty/nullable arrays match " +
      "the rule-enabled results exactly") {
    val p = java.nio.file.Files
      .createTempDirectory("graft-ruleexcl").toString + "/t"
    // null array, empty array, array with a null element, plain arrays
    spark.createDataFrame(Seq(
      (1L, Seq("a", "b")), (2L, Seq.empty[String]), (3L, Seq("b"))))
      .toDF("id", "arr")
      .unionByName(spark.sql(
        "SELECT 4L AS id, CAST(NULL AS ARRAY<STRING>) AS arr")
        .unionByName(spark.sql(
          "SELECT 5L AS id, ARRAY('x', CAST(NULL AS STRING)) AS arr")))
      .write.mode("overwrite").parquet(p)
    val df = spark.read.parquet(p)
    def innerQ = df.select(col("id"), explode(col("arr")).as("e"))
      .groupBy("e").agg(count(lit(1)).as("n")).orderBy(asc_nulls_first("e"))
    def outerQ = df.select(col("id"), explode_outer(col("arr")).as("e"))
      .orderBy(col("id"), asc_nulls_first("e"))
    val (innerExcluded, outerExcluded) =
      (innerQ.collect().toSeq, outerQ.collect().toSeq)
    val (innerEnabled, outerEnabled) = withRuleEnabled {
      (innerQ.collect().toSeq, outerQ.collect().toSeq)
    }
    assert(innerExcluded == innerEnabled)
    assert(outerExcluded == outerEnabled)
    // outer explode must keep the null-array and empty-array rows
    assert(outerExcluded.count(r => r.isNullAt(1)) == 3)
  }

  test("plan pin: no inferred size()>0 filter under an explode of a " +
      "DERIVED set column (the 3x-tokenize shape the exclusion removes)") {
    val docs = spark.createDataFrame(Seq(
      (1L, "a b c"), (2L, "b c"), (3L, "")))
      .toDF("doc_id", "text")
    val q = docs
      .select(col("doc_id"),
        explode(graft.functions.Text.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("size("),
      s"inferred size() filter re-appeared below the explode:\n$optimized")
  }
}
