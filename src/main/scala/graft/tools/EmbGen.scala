package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic embedding corpus for ANN scale rehearsals: dim-`dim` float
  * vectors with hash-derived uniform [-1, 1) components, fully
  * deterministic in `vec_id`, generated DISTRIBUTED from `spark.range` as
  * pure expressions (same construction as [[AbleGen]]/[[DocGen]]).
  * Unstructured vectors are PQ/IVF's WORST case (nothing to quantize), so
  * recall measured here lower-bounds what a real embedding corpus gets. */
object EmbGen {

  def frame(spark: SparkSession, n: Long, dim: Int = 64,
            parts: Int = 0): DataFrame =
    (if (parts > 0) spark.range(0, n, 1, parts) else spark.range(n)).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), j =>
        (pmod(xxhash64(col("id"), j), lit(2000000L)).cast("double")
          / 1000000.0 - 1.0).cast("float")).as("embedding"))

  def ensure(spark: SparkSession, n: Long, path: String): String =
    GenCache.ensure(spark, n, path)(p => frame(spark, n, parts = p))
}
