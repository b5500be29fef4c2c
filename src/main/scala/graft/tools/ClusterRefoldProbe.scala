package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what the r16 opt-in clustered fact layout
  * (`spark.graft.layout.clusterBy.<table>`, applied by TableLog base
  * compaction) buys a SCALAR-key delta refold: the same
  * `IndexRegistry.refoldMutation` against (a) the default id-ordered able
  * layout and (b) a copy clustered by `education_level` — the layout the
  * IndexAdvisor's hint names. The touched set is confined to ONE education
  * value, the selective-mutation shape where the refold's pushed
  * `education_level IN (…)` prune can actually skip row groups (a
  * touched set spanning every key value is a full rescan on ANY layout —
  * that structural bound is the bench's gidx_urefold number).
  *
  *   runMain graft.tools.ClusterRefoldProbe [n] [touchedN]
  */
object ClusterRefoldProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(50000000L)
    val touchedN = args.lift(1).map(_.toLong).getOrElse(1000L)
    val spark = graft.core.EngineConf(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = System.getProperty("java.io.tmpdir")
    val p = AbleGen.ensure(spark, n, s"$tmp/graft-able-v5-$n")
    val clustered = s"$tmp/graft-able-clu-$n"
    if (!new java.io.File(clustered, "_SUCCESS").exists()) {
      val t0 = System.nanoTime()
      // the exact layout TableLog.mat produces under
      // spark.graft.layout.clusterBy.<table> = education_level
      spark.read.parquet(p)
        .repartitionByRange(col("education_level"), col("_id"))
        .sortWithinPartitions(col("education_level"), col("_id"))
        .write.mode("overwrite").parquet(clustered)
      println(f"CLUREF clustered copy written ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val gCols = Seq("education_level", "gender", "political_party", "domain")
    // selective mutation: every touched row in ONE education value
    val touched = AbleGen.frame(spark, touchedN, 1)
      .withColumn("education_level", lit("high_school"))
    def refoldOn(label: String, basePath: String): Unit = {
      val gidxPath = s"$tmp/graft-cluref-gidx-$label-$n"
      if (!new java.io.File(gidxPath, "_SUCCESS").exists())
        graft.index.GroupIndex.buildTo(
          spark.read.parquet(basePath), gCols, Seq("age"), gidxPath)
      val wh = java.nio.file.Files.createTempDirectory("graft-cluref-wh").toString
      spark.conf.set("spark.graft.warehouse", wh)
      try {
        graft.plans.IndexRegistry.registerGroupDurable(spark, basePath, gCols,
          Set("domain"), Seq("age"), gidxPath)
        (1 to 2).foreach { leg =>
          val t0 = System.nanoTime()
          val r = graft.plans.IndexRegistry.refoldMutation(spark, basePath, touched)
          require(r.nonEmpty && r.forall(_._2), r.toString)
          println(f"CLUREF $label leg=$leg refold ${(System.nanoTime() - t0) / 1e9}%.2f s")
          // drop the published version so the next leg refolds the same state
          new java.io.File(s"$gidxPath.v$leg").listFiles() match {
            case null => ()
            case fs => // keep: versions accumulate, next leg refolds .v<leg>
          }
        }
      } finally spark.conf.unset("spark.graft.warehouse")
    }
    refoldOn("unclustered", p)
    refoldOn("clustered", clustered)
    spark.stop()
  }
}
