package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot reproduction of the reference's OWN published perf workload at
  * its OWN scale: the `able` profile is 10^9 records
  * (`reference/qa/scripts/perf/able/able.yaml:2-8`) and the benchmark query
  * is the high-cardinality multi-Rows GroupBy
  * (`reference/qa/scripts/perf/able/highcardinalitygroupby.js:9-10`):
  *
  * `GroupBy(Rows(education_level), Rows(gender), Rows(political_party),
  * Rows(domain), aggregate=Sum(field=age))`
  *
  * This main generates the full 1B-record dataset to parquet (shuffle-free,
  * embarrassingly parallel from `spark.range`), then runs the benchmark
  * query — VERBATIM, through our PQL compiler — plus a segmentation count
  * and the roaring segment-index build/serve path, and prints one JSON line.
  * It is not part of the per-round bench (generation alone is tens of
  * minutes); its results are recorded in SURVEY §8.5.
  *
  * `runMain graft.tools.AbleBillion [nRows] [timedRuns]`
  */
object AbleBillion {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000000L)
    val timed = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.core.EngineConf(SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .appName("graft-able-billion")
      // 1B-row shuffles: AQE coalesces small reduce sides; 128 initial
      // reduce partitions keeps per-task sort buffers bounded on the
      // explode-groupby (144k groups, partial agg does nearly all the work
      // map-side)
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = System.getProperty("java.io.tmpdir")
    val t0 = System.nanoTime()
    val path = AbleGen.ensure(spark, n, s"$tmp/graft-able-v5-$n")
    val genSec = (System.nanoTime() - t0) / 1e9
    val bytes = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum else f.length()
      walk(new java.io.File(path))
    }
    val df = spark.read.parquet(path)

    val queries = Seq(
      // the reference's k6 benchmark body, byte-for-byte
      "hc_groupby" -> ("GroupBy(Rows(education_level), Rows(gender), " +
        "Rows(political_party), Rows(domain), aggregate=Sum(field=age))"),
      // the signature segmentation count (bitmap AND in the reference)
      "seg_count" -> ("Count(Intersect(Row(education_level='high_school'), " +
        "Row(age >< [25, 40]), Row(domain='domain0.example')))"))
    def run1(pql: String): Double = {
      val t = System.nanoTime()
      new graft.pql.Compiler(df).run(graft.pql.Parser.parseOne(pql))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t) / 1e9
    }
    def num(d: Double, p: Int = 3): String = {
      val f = java.text.NumberFormat.getInstance(java.util.Locale.ROOT)
        .asInstanceOf[java.text.DecimalFormat]
      f.applyPattern("0." + "#" * p); f.format(d)
    }
    val perQ = queries.map { case (name, pql) =>
      val runs = (0 to timed).map(_ => run1(pql)) // warm +: timed
      System.err.println(s"[able1b] $name: ${runs.map(num(_)).mkString(", ")}")
      name -> runs
    }

    // roaring segment index at 1B: build once (timed), serve a count
    val idxPath = s"$tmp/graft-able-idx5-$n"
    val tb = System.nanoTime()
    graft.index.Bitmap.segmentIndex(df, "education_level", "_id")
      .write.mode("overwrite").parquet(idxPath)
    val idxBuildSec = (System.nanoTime() - tb) / 1e9
    val idxServe = (0 to timed).map { _ =>
      val t = System.nanoTime()
      spark.read.parquet(idxPath).filter(col("seg") === "high_school")
        .select(graft.index.Bitmap.bitmapCount(col("bm")).as("cnt"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t) / 1e9
    }

    def arr(ts: Seq[Double]) = ts.map(num(_)).mkString("[", ",", "]")
    println(s"""{"tool":"able_billion","rows":$n,""" +
      s""""gen_sec":${num(genSec, 1)},"parquet_bytes":$bytes,""" +
      s""""runs_warm_then_timed":{${perQ.map { case (k, v) =>
          "\"" + k + "\":" + arr(v) }.mkString(",")}},""" +
      s""""idx_build_sec":${num(idxBuildSec, 1)},""" +
      s""""idx_serve_runs":${arr(idxServe)}}""")
    spark.stop()
  }
}
