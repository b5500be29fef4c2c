package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Idempotent parquet materialization for generated rehearsal corpora:
  * `_SUCCESS` marks a complete build, reused across bench rounds. One
  * definition for all generators so cache-validity/partitioning fixes
  * apply everywhere. */
private[tools] object GenCache {
  /** `frame` receives the target partition count so the generator can build
    * `spark.range(0, n, 1, parts)` directly — a `repartition(parts)` here
    * would round-robin SHUFFLE every generated row (at the 10^9-row point
    * that's tens of GB moved for nothing), where range partitioning costs
    * zero and writes id-ordered files, the layout a cluster ingest would
    * produce. */
  def ensure(spark: SparkSession, n: Long, path: String)
            (frame: Int => DataFrame): String = {
    val done = new java.io.File(path, "_SUCCESS")
    if (!done.exists()) {
      val parts = math.max(spark.sparkContext.defaultParallelism,
        (n / 1000000L).toInt)
      frame(parts).write.mode("overwrite").parquet(path)
    }
    path
  }
}
