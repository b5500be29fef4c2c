package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-timing probe for [[graft.plans.IndexRegistry.refoldMutation]] on
  * the able profile — exists because the r14 1B `gidx_urefold_sec` read
  * ~6× the plain rebuild aggregation and the phase boundary could not be
  * seen from the bench's single number. Runs at any N (50M reproduces the
  * 1B shape 20× cheaper):
  *
  *   runMain graft.tools.UrefoldProbe [n] [touchedN]
  *
  * Times, separately: the plain 4-key rebuild aggregation (the baseline
  * the refold must not exceed), the refold itself, and the refold's
  * sub-phases re-run standalone (combo derivation, pruned-scan
  * aggregation, splice write). */
object UrefoldProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(50000000L)
    val touchedN = args.lift(1).map(_.toLong).getOrElse(1000L)
    val spark = graft.core.EngineConf(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = System.getProperty("java.io.tmpdir")
    val p = AbleGen.ensure(spark, n, s"$tmp/graft-able-v5-$n")
    val df = spark.read.parquet(p)
    val gCols = Seq("education_level", "gender", "political_party", "domain")
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"UREFOLD $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val gidxPath = s"$tmp/graft-uref-probe-gidx-$n"
    timed("gidx build (rebuild baseline)") {
      graft.index.GroupIndex.buildTo(df, gCols, Seq("age"), gidxPath)
    }
    // the bench probe's exact shape: throwaway warehouse, durable
    // registration, 1000-row touched set
    val wh = java.nio.file.Files.createTempDirectory("graft-uref-wh").toString
    spark.conf.set("spark.graft.warehouse", wh)
    graft.plans.IndexRegistry.registerGroupDurable(spark, p, gCols,
      Set("domain"), Seq("age"), gidxPath)
    val touched = AbleGen.frame(spark, touchedN, 1)
    timed("refoldMutation (end to end)") {
      val r = graft.plans.IndexRegistry.refoldMutation(spark, p, touched)
      require(r.nonEmpty && r.forall(_._2), r.toString)
    }
    // sub-phases, standalone
    val combos = touched.select(gCols.map {
        case "domain" => explode(col("domain")).as("domain")
        case c        => col(c)
      }: _*).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("combos distinct+count") { println(s"  combos=${combos.count()}") }
    val scal = Seq("education_level", "gender", "political_party")
    val pruned = scal.foldLeft(df) { (acc, k) =>
      val vals = combos.select(col(k)).distinct().collect().map(_.getString(0)).toSeq
      acc.filter(col(k).isin(vals: _*))
    }
    val prepared = pruned.select(col("age") +: gCols.map {
        case "domain" => explode(col("domain")).as("domain")
        case c        => col(c)
      }: _*)
    timed("pruned-scan aggregation (delta, no semi-join)") {
      graft.index.GroupIndex.build(prepared, gCols, Seq("age"))
        .write.format("noop").mode("overwrite").save()
    }
    // the lazily-composed variant: PushDownLeftSemiAntiJoin rewrites the
    // combo cut back BELOW the aggregate (probe per exploded fact row) —
    // the r14 273-s-at-1B trap, kept timed as the regression canary
    val pushed = graft.index.GroupIndex.build(prepared, gCols, Seq("age"))
      .as("f").join(broadcast(combos.as("t")),
        gCols.map(k => col(s"f.`$k`") <=> col(s"t.`$k`")).reduce(_ && _),
        "left_semi")
    println("PLAN lazily-composed semi-join (note the join UNDER the agg):\n"
      + pushed.queryExecution.executedPlan
        .toString.linesIterator.map(_.take(100)).take(12).mkString("\n"))
    timed("agg + semi-join, lazily composed (rule pushes join below agg)") {
      pushed.write.format("noop").mode("overwrite").save()
    }
    timed("agg MATERIALIZED, then semi-join (as shipped)") {
      val deltaAll = graft.index.GroupIndex.build(prepared, gCols, Seq("age"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        deltaAll.count()
        deltaAll.as("f").join(broadcast(combos.as("t")),
            gCols.map(k => col(s"f.`$k`") <=> col(s"t.`$k`")).reduce(_ && _),
            "left_semi")
          .write.format("noop").mode("overwrite").save()
      } finally deltaAll.unpersist(): Unit
    }
    timed("splice (anti-join + union + write)") {
      val old = spark.read.parquet(gidxPath)
      val delta = graft.index.GroupIndex.build(prepared, gCols, Seq("age"))
        .as("f").join(broadcast(combos.as("t")),
          gCols.map(k => col(s"f.`$k`") <=> col(s"t.`$k`")).reduce(_ && _),
          "left_semi")
      old.as("o").join(broadcast(combos.as("t")),
          gCols.map(k => col(s"o.`$k`") <=> col(s"t.`$k`")).reduce(_ && _),
          "left_anti")
        .unionByName(delta.select(old.schema.fields.toIndexedSeq.map(fd =>
          col(fd.name).cast(fd.dataType).as(fd.name)): _*))
        .write.mode("overwrite").parquet(s"$gidxPath.probe")
    }
    spark.stop()
  }
}
