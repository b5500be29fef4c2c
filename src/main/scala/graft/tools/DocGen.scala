package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic document corpus for dedup scale rehearsals: ~40 words per doc
  * drawn from a hash-derived vocabulary, fully deterministic in `doc_id`,
  * generated DISTRIBUTED from `spark.range(n)` as pure expressions (no
  * UDFs, no shuffle, no driver materialization — the same construction as
  * [[AbleGen]]).
  *
  * Every 97th doc reuses its predecessor's word seed, planting exact
  * near-duplicate pairs (Jaccard 1) at a ~1% rate so the MinHash pipeline
  * has real work: candidate generation, bucket joins, and verify all see
  * the density they'd see on a crawl corpus. */
object DocGen {

  def frame(spark: SparkSession, n: Long, wordsPerDoc: Int = 40,
            vocab: Long = 5000L, parts: Int = 0): DataFrame = {
    // duplicate planting: doc 97k copies doc 97k-1 verbatim
    val seed = when(pmod(col("id"), lit(97)) === 0 && col("id") > 0,
      col("id") - 1).otherwise(col("id"))
    (if (parts > 0) spark.range(0, n, 1, parts) else spark.range(n)).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until wordsPerDoc).map(j =>
        concat(lit("w"), pmod(xxhash64(seed, lit(j)), lit(vocab)))): _*)
        .as("text"))
  }

  def ensure(spark: SparkSession, n: Long, path: String): String =
    GenCache.ensure(spark, n, path)(parts => frame(spark, n, parts = parts))
}
