package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Idempotent parquet materialization for generated rehearsal corpora:
  * `_SUCCESS` marks a complete build, reused across bench rounds. One
  * definition for all generators so cache-validity/partitioning fixes
  * apply everywhere. */
private[tools] object GenCache {
  def ensure(spark: SparkSession, n: Long, path: String)
            (frame: => DataFrame): String = {
    val done = new java.io.File(path, "_SUCCESS")
    if (!done.exists()) {
      val parts = math.max(spark.sparkContext.defaultParallelism,
        (n / 1000000L).toInt)
      frame.repartition(parts).write.mode("overwrite").parquet(path)
    }
    path
  }
}
