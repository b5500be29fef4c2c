package graft.plans

import graft.SparkSpec
import graft.index.GroupIndex
import org.apache.spark.sql.functions._

/** Randomized equivalence sweep for the delta refold: a SEQUENCE of random
  * mutations — sum-column updates, key moves (including moves to NULL),
  * set-member edits, and non-key row deletes — each refolded through
  * [[IndexRegistry.refoldMutation]], must leave the index byte-equivalent
  * (values; bitmaps by cardinality) to a FRESH rebuild of the final facts.
  * Exercises what the directed DeltaRefoldSpec cases cannot: interactions
  * across consecutive refolds (each reads the previous `.v<N>` version
  * through the durable registry — the chaining a real serving process
  * does), and mutation shapes no hand-written case picked.
  *
  * Seeded; boost via SPARK_GRAFT_REFOLD_FUZZ_N/_SEED like the other
  * property sweeps. */
class DeltaRefoldPropertySpec extends SparkSpec {

  test("randomized mutation sequence: every step refolds, final index " +
    "equals a fresh rebuild (cnt/sum/min/max exact, bitmaps by " +
    "cardinality, null and exploded keys included)") {
    val rounds = sys.env.getOrElse("SPARK_GRAFT_REFOLD_FUZZ_N", "6").toInt
    val seed = sys.env.getOrElse("SPARK_GRAFT_REFOLD_FUZZ_SEED", "20260816").toLong
    val rnd = new scala.util.Random(seed)
    val s = spark.newSession()
    val wh = java.nio.file.Files.createTempDirectory("graft-drefp-wh").toString
    s.conf.set("spark.graft.warehouse", wh)
    val root = graft.streaming.Ingest.scratch("delta_refold_prop")
    val fact = s"$root/fact"

    // base table: nullable scalar key, set key, hourly ts, long value.
    // Kept as an in-memory frame so each mutated generation can overwrite
    // the fact dir without reading from it.
    val kVals = Seq("a", "b", "c", "d")
    val tagVals = Seq("t0", "t1", "t2", "t3")
    val n = 600
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("tags",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType), nullable = true),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType, nullable = false),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType, nullable = false)))
    // mutable row state the mutations rewrite
    final case class R(id: Long, var k: String, var tags: Seq[String],
                       ts: java.sql.Timestamp, var v: Long)
    val base = (0L until n).map { id =>
      R(id,
        if (id % 7 == 0) null else kVals((id % 4).toInt),
        (0 until (id % 4).toInt).map(j => tagVals(((id + j) % 4).toInt)),
        new java.sql.Timestamp(1704067200000L + (id % 72) * 3600000L),
        id % 50)
    }
    var rows = scala.collection.mutable.ArrayBuffer(base: _*)
    def toDf(rs: Seq[R]) = s.createDataFrame(
      rs.map(r => org.apache.spark.sql.Row(
        r.id, r.k, r.tags, r.ts, r.v)).asJava, schema)
    toDf(rows.toSeq).write.mode("overwrite").parquet(fact)

    val qt = GroupIndex.Quantum("ts", "day")
    val gCols = Seq("k", "tags", qt.name)
    GroupIndex.buildTo(GroupIndex.withQuantums(s.read.parquet(fact), Seq(qt)),
      gCols, Seq("v"), s"$root/g", distinctCols = Seq("_id"))
    val tz = s.sessionState.conf.sessionLocalTimeZone
    IndexRegistry.registerGroupDurable(s, fact, gCols, Set("tags"),
      Seq("v"), s"$root/g", distinctCols = Seq("_id"),
      quantums = Map(qt.name -> tz))

    for (step <- 1 to rounds) {
      val pick = rnd.nextInt(4)
      val m = 2 + rnd.nextInt(5)
      val r0 = rnd.nextInt(m)
      val hit = (r: R) => r.id % m == r0
      val preRows = rows.filter(hit).map(r => r.copy()).toSeq
      val deleted = pick == 3
      pick match {
        case 0 => // sum-column update inside combos
          rows.filter(hit).foreach(r => r.v = r.v + 100 + rnd.nextInt(50))
        case 1 => // key move, sometimes to NULL
          val nk = if (rnd.nextBoolean()) null
                   else kVals(rnd.nextInt(kVals.length))
          rows.filter(hit).foreach(_.k = nk)
        case 2 => // set-member edit (exploded key churn)
          val nt = tagVals(rnd.nextInt(tagVals.length))
          rows.filter(hit).foreach(r =>
            r.tags = (r.tags :+ nt).distinct.drop(rnd.nextInt(2)))
        case 3 => // row-level delete on a NON-key shape
          rows = rows.filterNot(hit)
      }
      val postRows = if (deleted) Nil
                     else rows.filter(hit).map(r => r.copy()).toSeq
      toDf(rows.toSeq).write.mode("overwrite").parquet(fact)
      val touched = toDf(preRows ++ postRows)
      val res = IndexRegistry.refoldMutation(s, fact, touched)
      assert(res.length == 1 && res.head._2,
        s"step $step (shape $pick) did not refold: $res")
    }

    // the registered index after the chain = the durable record's path
    val recs = org.json4s.jackson.JsonMethods.parse(
      java.nio.file.Files.readString(
        java.nio.file.Paths.get(wh, "_indexes.json")))
    val idxPath = (for {
      org.json4s.JArray(xs) <- Seq(recs)
      e <- xs if e \ "kind" == org.json4s.JString("group")
    } yield e \ "indexPath" match {
      case org.json4s.JString(p) => p
      case _ => ""
    }).head
    assert(idxPath.endsWith(s".v$rounds"), idxPath)

    val refolded = s.read.parquet(idxPath)
    val fresh = IndexRewrite.suppress {
      GroupIndex.build(
        GroupIndex.withQuantums(s.read.parquet(fact), Seq(qt)),
        gCols, Seq("v"), Seq("_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    try IndexRewrite.suppress {
      assert(refolded.count() == fresh.count(),
        s"${refolded.count()} vs ${fresh.count()} combos")
      val joinCond = gCols.map(k =>
        col(s"a.`$k`") <=> col(s"b.`$k`")).reduce(_ && _)
      val joined = refolded.as("a").join(fresh.as("b"), joinCond)
      assert(joined.count() == fresh.count(), "combo sets differ")
      val bad = joined.filter(
        col("a.cnt") =!= col("b.cnt") ||
          col("a.sum_v") =!= col("b.sum_v") ||
          col("a.cntv_v") =!= col("b.cntv_v") ||
          col("a.min_v") =!= col("b.min_v") ||
          col("a.max_v") =!= col("b.max_v") ||
          graft.index.Bitmap.bitmapCount(col("a.bm__id")) =!=
            graft.index.Bitmap.bitmapCount(col("b.bm__id")))
      assert(bad.count() == 0, bad.collect().take(3).mkString("\n"))
    } finally fresh.unpersist(): Unit
    IndexCatalog.clear()
  }
}
