package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generator for the reference's `able` perf-test profile
  * (`reference/qa/scripts/perf/able/able.yaml:2-60`,
  * `reference/idk/datagen/`): a customer-360-shaped table with sequential
  * ids, uniform ints with a null chance, zipfian-distributed categorical
  * strings, zipfian string-sets (1-6 domains, 0-4 hobbies), an increasing
  * timestamp, and a uniform float — the workload shape FeatureBase's own
  * perf harness benchmarks segmentation queries against.
  *
  * Everything is generated DISTRIBUTED from `spark.range(n)`: a column is a
  * pure expression of `id`, so a 10^9-row generation is an embarrassingly
  * parallel map with no shuffle and no driver materialization. Randomness
  * is hash-of-(id, salt) rather than `rand()` — deterministic across runs
  * (stable benchmarks) and safe inside higher-order functions.
  */
object AbleGen {

  /** Uniform double in [0,1) from (id, salt) — xxhash64 spreads low bits. */
  private def u(salt: Int, extra: Column*): Column =
    (pmod(xxhash64((col("id") +: lit(salt) +: extra).toIndexedSeq: _*), lit(1000000L))
      .cast("double") / 1000000.0)

  /** Zipfian pick over `values` via inverse CDF: weight(i) ∝ 1/(v+i)^s
    * (the datagen's s/v parameterization). The CDF is a literal array and
    * the rank is `size(filter(cdf, c -> c < u))` — whole-stage codegen,
    * no UDF. */
  private def zipf(values: Seq[String], s: Double, v: Double, salt: Int,
                   extra: Column*): Column = {
    val uu = u(salt, extra: _*)
    if (values.size <= 64) {
      val w = values.indices.map(i => 1.0 / math.pow(v + i, s))
      val total = w.sum
      val cdf = w.scanLeft(0.0)(_ + _).tail.map(_ / total)
      element_at(
        array(values.map(lit): _*),
        size(filter(array(cdf.map(lit): _*), c => c < uu)) + 1)
    } else {
      // large value sets: the exact-CDF form scans a |values|-element
      // literal array PER MEMBER (the 1000-domain set cost ~6k compares per
      // row — 50M-row generation was minutes of pure CDF scanning). Invert
      // the continuous zipf CDF analytically instead: W(r) ∝ ((v+r)^(1-s) -
      // v^(1-s)), so rank = (v^(1-s) + u·(W_N))^(1/(1-s)) - v — O(1) per
      // member, same skew shape (this is a rehearsal generator, not an
      // oracle surface).
      val n = values.size
      val p1 = 1.0 - s
      val w0 = math.pow(v, p1)
      val wN = math.pow(v + n, p1) - w0
      val rank = least(lit(n - 1), greatest(lit(0),
        (pow(lit(w0) + uu * wN, lit(1.0 / p1)) - v).cast("int")))
      element_at(array(values.map(lit): _*), rank + 1)
    }
  }

  /** Zipfian string-set of uniform size in [minN, maxN] (able.yaml
    * `string-set` fields): per-element salt keeps members independent;
    * `array_distinct` applies set semantics like the reference's SetField. */
  private def zipfSet(values: Seq[String], s: Double, v: Double,
                      minN: Int, maxN: Int, salt: Int): Column = {
    val k = (lit(minN) + (u(salt) * (maxN - minN + 1)).cast("int"))
    val members = transform(sequence(lit(1), k), i => zipf(values, s, v, salt + 1, i))
    when(k <= 0, array().cast("array<string>"))
      .otherwise(array_distinct(members))
  }

  /** Epoch micros of the able.yaml min_date (2006-01-02T15:04:05Z). */
  val BaseMicros: Long =
    java.time.Instant.parse("2006-01-02T15:04:05Z").toEpochMilli * 1000L

  private val educations = Seq("high_school", "bachelors", "masters", "doctorate",
    "associates", "vocational", "some_college", "none")
  private val genders    = Seq("female", "male", "nonbinary")
  private val incomes    = Seq("0-25k", "25-50k", "50-100k", "100-200k", "200k+")
  private val parties    = Seq("independent", "democrat", "republican",
    "green", "libertarian", "other")
  private val domains    = (0 until 1000).map(i => s"domain$i.example")
  private val hobbies    = (0 until 24).map(i => s"hobby_$i")

  /** The able-shaped DataFrame, n rows. `parts <= 0` keeps the session's
    * default range partitioning; a positive count makes generation an
    * embarrassingly parallel map over that many range partitions (no
    * shuffle at any n). */
  def frame(spark: SparkSession, n: Long, parts: Int = 0): DataFrame =
    (if (parts > 0) spark.range(0, n, 1, parts) else spark.range(n)).select(
      col("id").as("_id"),                                       // sequential uint
      when(u(1) < 0.01, lit(null))                               // null_chance .01
        .otherwise((lit(15) + (u(2) * 92).cast("int")).cast("long")).as("age"),
      zipf(educations, 1.1, 5.1, 3).as("education_level"),
      element_at(array(genders.map(lit): _*),                    // fixed rotation
        (pmod(col("id"), lit(3)) + 1).cast("int")).as("gender"),
      zipf(incomes, 1.0, 1.0, 4).as("income_bracket"),
      zipfSet(domains, 1.5, 4.3, 1, 6, 5).as("domain"),
      // increasing ts: base + id·50ms in pure integer micros — exactly
      // replayable by an oracle (float-second intervals round differently
      // across engines)
      timestamp_micros(lit(BaseMicros) + col("id") * 50000L).as("timestamp"),
      zipf(parties, 1.0001, 1.0001, 6).as("political_party"),
      (lit(0.2) + u(7) * 1499.8).as("ltv"),
      zipfSet(hobbies, 1.2, 2.0, 0, 4, 8).as("hobby"))

  /** Generate to parquet (idempotent: returns immediately when the target
    * exists with a _SUCCESS marker). Partition count scales with n so the
    * layout matches what a cluster writer would produce. */
  def ensure(spark: SparkSession, n: Long, path: String): String =
    GenCache.ensure(spark, n, path)(parts => frame(spark, n, parts))

  /** CLI: `runMain graft.tools.AbleGen <nRows> <outPath>`. */
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val out = args.lift(1).getOrElse(s"/tmp/graft-able-$n")
    val spark = graft.core.EngineConf(SparkSession.builder().master("local[*]")
      .appName("graft-ablegen")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ensure(spark, n, out)
    println(s"[ablegen] $n rows -> $out")
    spark.stop()
  }
}
