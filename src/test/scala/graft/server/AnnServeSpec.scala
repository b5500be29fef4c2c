package graft.server

import graft.SparkSpec
import graft.functions.Similarity
import org.apache.spark.sql.functions._

/** ANN serving registry semantics: concurrent appends both land (the r11
  * read-modify-write race), duplicate appends are no-ops, the drift
  * statistic rises under synthetic distribution drift while exhaustive
  * recall stays exact, and registrations survive a process bounce via the
  * durable warehouse record. */
class AnnServeSpec extends SparkSpec {

  private def emb = graft.core.Tables.load(spark, sfDir, "embeddings")

  private def queryVec: Seq[Float] =
    emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0)

  /** Exhaustive serve (nProbe=all, shortlist ≥ corpus) — must equal brute
    * force over the entry's corpus. */
  private def exhaustive(name: String, k: Int): Seq[(Long, Double)] =
    AnnServe.query(spark, name, queryVec, k, nProbe = 0,
      shortlist = 10000000, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  private def brute(corpus: org.apache.spark.sql.DataFrame, k: Int): Seq[Long] =
    Similarity.cosineTopK(corpus, "vec_id", "embedding", queryVec, k, Some(0L))
      .collect().map(_.getLong(0)).toSeq

  test("two concurrent appends both land — no lost rerank-side update") {
    emb.filter(col("vec_id") % 3 === 0).createOrReplaceTempView("ann_c_base")
    emb.filter(col("vec_id") % 3 === 1).createOrReplaceTempView("ann_c_a")
    emb.filter(col("vec_id") % 3 === 2).createOrReplaceTempView("ann_c_b")
    try {
      AnnServe.build(spark, "annspec_conc", "ann_c_base", "vec_id",
        "embedding", 64, 4, 8, 16)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        val fa = pool.submit(() =>
          AnnServe.append(spark, "annspec_conc", "ann_c_a"): java.lang.Long)
        val fb = pool.submit(() =>
          AnnServe.append(spark, "annspec_conc", "ann_c_b"): java.lang.Long)
        assert(fa.get() > 0L && fb.get() > 0L)
      } finally pool.shutdown()
      // exhaustive == brute over the FULL union: if either append's rows
      // had vanished from the rerank side, its shortlisted candidates
      // would drop out of the join and this comparison would fail
      assert(exhaustive("annspec_conc", 20).map(_._1) == brute(emb, 20))
      val e = AnnServe.stats("annspec_conc").get
      assert(e.sources.map(_.table).toSet ==
        Set("ann_c_base", "ann_c_a", "ann_c_b"), e.sources)
    } finally Seq("ann_c_base", "ann_c_a", "ann_c_b")
      .foreach(spark.catalog.dropTempView(_))
  }

  test("a duplicate append is a no-op: ids already indexed are skipped " +
    "and top-k never lists an id twice") {
    emb.createOrReplaceTempView("ann_d_all")
    try {
      AnnServe.build(spark, "annspec_dup", "ann_d_all", "vec_id",
        "embedding", 64, 4, 8, 16)
      // whole-corpus re-append: every id already present
      assert(AnnServe.append(spark, "annspec_dup", "ann_d_all") == 0L)
      val got = exhaustive("annspec_dup", 20)
      assert(got.map(_._1).distinct.size == got.size, s"dup ids in $got")
      assert(got.map(_._1) == brute(emb, 20))
    } finally spark.catalog.dropTempView("ann_d_all")
  }

  test("drift statistic rises under synthetic distribution drift; " +
    "exhaustive recall stays exact") {
    emb.createOrReplaceTempView("ann_drift_base")
    // drifted batch: shifted far from the fitted centroids, fresh ids
    val maxId = emb.agg(max("vec_id")).head().getLong(0)
    val drifted = emb.select(
      (col("vec_id") + maxId + 1).as("vec_id"),
      transform(col("embedding"), x => x + lit(3.0f)).as("embedding"))
    drifted.createOrReplaceTempView("ann_drift_batch")
    try {
      AnnServe.build(spark, "annspec_drift", "ann_drift_base", "vec_id",
        "embedding", 64, 4, 8, 16)
      val buildNorm = AnnServe.stats("annspec_drift").get.residualNormBuild
      assert(buildNorm > 0.0)
      assert(AnnServe.append(spark, "annspec_drift", "ann_drift_batch") ==
        emb.count())
      val e = AnnServe.stats("annspec_drift").get
      val lastNorm = e.residualNormLastAppend.get
      // the stat is the operator's retrain signal: well above build-time
      assert(lastNorm > 1.5 * buildNorm, s"$lastNorm !> 1.5×$buildNorm")
      // …while the exhaustive configuration stays exact over the union
      val union = emb.select("vec_id", "embedding")
        .unionByName(drifted)
      assert(exhaustive("annspec_drift", 20).map(_._1) == brute(union, 20))
    } finally Seq("ann_drift_base", "ann_drift_batch")
      .foreach(spark.catalog.dropTempView(_))
  }

  test("registrations survive a bounce: clear() + IndexRegistry.restore " +
    "replays the quantizer and sources from the warehouse record") {
    val s = spark.newSession()
    val wh = java.nio.file.Files.createTempDirectory("graft-ann-wh").toString
    s.conf.set("spark.graft.warehouse", wh)
    graft.core.Tables.load(s, sfDir, "embeddings")
      .filter(col("vec_id") % 2 === 0).createOrReplaceTempView("ann_r_base")
    graft.core.Tables.load(s, sfDir, "embeddings")
      .createOrReplaceTempView("ann_r_all")
    AnnServe.build(s, "annspec_dur", "ann_r_base", "vec_id",
      "embedding", 64, 4, 8, 16)
    AnnServe.append(s, "annspec_dur", "ann_r_all",
      Some("vec_id % 2 = 1"))
    val before = AnnServe.query(s, "annspec_dur", queryVec, 20, 0,
      10000000, Some(0L)).collect().map(_.getLong(0)).toSeq
    val statBefore = AnnServe.statsJson("annspec_dur")
    // bounce: the in-memory registry empties; restore replays from disk
    AnnServe.clear()
    intercept[RuntimeException](
      AnnServe.query(s, "annspec_dur", queryVec, 5, 0, 100, None))
    graft.plans.IndexRegistry.restore(s)
    val after = AnnServe.query(s, "annspec_dur", queryVec, 20, 0,
      10000000, Some(0L)).collect().map(_.getLong(0)).toSeq
    assert(after == before, s"$after vs $before")
    // drift telemetry survived the bounce too
    assert(AnnServe.statsJson("annspec_dur") == statBefore)
  }

  test("two names coexist: building a second index never touches the " +
    "first's code table (per-name scratch), including across a bounce") {
    val s = spark.newSession()
    val wh = java.nio.file.Files.createTempDirectory("graft-ann-wh2").toString
    s.conf.set("spark.graft.warehouse", wh)
    graft.core.Tables.load(s, sfDir, "embeddings")
      .filter(col("vec_id") % 2 === 0).createOrReplaceTempView("ann_x_even")
    graft.core.Tables.load(s, sfDir, "embeddings")
      .filter(col("vec_id") % 2 === 1).createOrReplaceTempView("ann_x_odd")
    AnnServe.build(s, "annspec_two_a", "ann_x_even", "vec_id",
      "embedding", 64, 4, 8, 16)
    // durable session → codes root under the WAREHOUSE, not /tmp scratch
    // (a tmp-clean must not orphan a surviving registration)
    assert(AnnServe.stats("annspec_two_a").get.codesPath.startsWith(wh),
      AnnServe.stats("annspec_two_a").get.codesPath)
    val aBefore = AnnServe.query(s, "annspec_two_a", queryVec, 10, 0,
      10000000, Some(0L)).collect().map(_.getLong(0)).toSeq
    // the r12 defect: this second build wiped annspec_two_a's codes
    AnnServe.build(s, "annspec_two_b", "ann_x_odd", "vec_id",
      "embedding", 64, 4, 8, 16)
    val aAfter = AnnServe.query(s, "annspec_two_a", queryVec, 10, 0,
      10000000, Some(0L)).collect().map(_.getLong(0)).toSeq
    assert(aAfter == aBefore, "second build destroyed first index's codes")
    val bGot = AnnServe.query(s, "annspec_two_b", queryVec, 10, 0,
      10000000, None).collect().map(_.getLong(0)).toSeq
    assert(bGot.nonEmpty && bGot.forall(_ % 2 == 1))
    // both names survive a bounce together
    AnnServe.clear()
    graft.plans.IndexRegistry.restore(s)
    assert(AnnServe.query(s, "annspec_two_a", queryVec, 10, 0,
      10000000, Some(0L)).collect().map(_.getLong(0)).toSeq == aBefore)
    assert(AnnServe.query(s, "annspec_two_b", queryVec, 10, 0,
      10000000, None).collect().map(_.getLong(0)).toSeq == bGot)
  }

  test("restore DEREGISTERS a record whose code table is gone: warns, " +
    "drops it from _indexes.json, and other names keep serving") {
    val s = spark.newSession()
    val wh = java.nio.file.Files.createTempDirectory("graft-ann-wh3").toString
    s.conf.set("spark.graft.warehouse", wh)
    graft.core.Tables.load(s, sfDir, "embeddings")
      .createOrReplaceTempView("ann_g_all")
    AnnServe.build(s, "annspec_dead", "ann_g_all", "vec_id",
      "embedding", 64, 4, 8, 16)
    AnnServe.build(s, "annspec_live", "ann_g_all", "vec_id",
      "embedding", 64, 4, 8, 16)
    val deadPath = AnnServe.stats("annspec_dead").get.codesPath
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(deleteRec)
      f.delete(): Unit
    }
    deleteRec(new java.io.File(deadPath))
    AnnServe.clear()
    graft.plans.IndexRegistry.restore(s)
    assert(AnnServe.stats("annspec_dead").isEmpty,
      "dead registration should have been dropped")
    assert(AnnServe.stats("annspec_live").isDefined)
    // the record is gone from the durable file too: a SECOND restore of a
    // fresh registry no longer sees it
    val json = java.nio.file.Files.readString(
      java.nio.file.Paths.get(wh, "_indexes.json"))
    assert(!json.contains("annspec_dead"), json)
    assert(json.contains("annspec_live"))
  }

  test("registry file stays compact: N appends leave exactly ONE ann " +
    "record per name (quantizer serialized once, not once per append)") {
    val s = spark.newSession()
    val wh = java.nio.file.Files.createTempDirectory("graft-ann-wh4").toString
    s.conf.set("spark.graft.warehouse", wh)
    val e = graft.core.Tables.load(s, sfDir, "embeddings")
    e.filter(col("vec_id") % 4 === 0).createOrReplaceTempView("ann_k_0")
    e.filter(col("vec_id") % 4 === 1).createOrReplaceTempView("ann_k_1")
    e.filter(col("vec_id") % 4 === 2).createOrReplaceTempView("ann_k_2")
    e.filter(col("vec_id") % 4 === 3).createOrReplaceTempView("ann_k_3")
    AnnServe.build(s, "annspec_cpt", "ann_k_0", "vec_id",
      "embedding", 64, 4, 8, 16)
    (1 to 3).foreach(i => AnnServe.append(s, "annspec_cpt", s"ann_k_$i"))
    import org.json4s._
    val records = org.json4s.jackson.JsonMethods.parse(
      java.nio.file.Files.readString(
        java.nio.file.Paths.get(wh, "_indexes.json"))) match {
      case JArray(xs) => xs; case _ => Nil
    }
    assert(records.count(r => r \ "name" == JString("annspec_cpt")) == 1,
      s"expected one record, got ${records.length}")
    // and that one record carries all four sources
    AnnServe.clear()
    graft.plans.IndexRegistry.restore(s)
    assert(AnnServe.stats("annspec_cpt").get.sources.map(_.table).toSet ==
      Set("ann_k_0", "ann_k_1", "ann_k_2", "ann_k_3"))
  }

  test("an append that finds nothing fresh still merges+persists its " +
    "source (crash-replay closes the rerank gap instead of losing it)") {
    val s = spark.newSession()
    val wh = java.nio.file.Files.createTempDirectory("graft-ann-wh5").toString
    s.conf.set("spark.graft.warehouse", wh)
    graft.core.Tables.load(s, sfDir, "embeddings")
      .createOrReplaceTempView("ann_n0_all")
    AnnServe.build(s, "annspec_n0", "ann_n0_all", "vec_id",
      "embedding", 64, 4, 8, 16)
    // same corpus under a DIFFERENT source spec: 0 fresh rows, but the
    // (table, where) source must still register — a replayed append after
    // a crash-between-codes-and-persist lands here
    assert(AnnServe.append(s, "annspec_n0", "ann_n0_all",
      Some("vec_id >= 0")) == 0L)
    val srcs = AnnServe.stats("annspec_n0").get.sources
    assert(srcs.contains(AnnServe.Source("ann_n0_all", Some("vec_id >= 0"))),
      srcs.toString)
    // and it persisted: the source survives a bounce
    AnnServe.clear()
    graft.plans.IndexRegistry.restore(s)
    assert(AnnServe.stats("annspec_n0").get.sources.contains(
      AnnServe.Source("ann_n0_all", Some("vec_id >= 0"))))
    // statsJson with a where carrying quotes/backslashes parses as JSON
    AnnServe.append(s, "annspec_n0", "ann_n0_all",
      Some("""vec_id >= 0 OR 'a"b' = '\\'"""))
    org.json4s.jackson.JsonMethods.parse(AnnServe.statsJson("annspec_n0")): Unit
  }

  test("same-name rebuild publishes a NEW .v<N> version — queries racing " +
    "the rebuild never scan overwritten files, the previous version " +
    "survives until the next swap, and the durable registry keeps ONE " +
    "record for the name") {
    val s = spark.newSession()
    val wh = java.nio.file.Files.createTempDirectory("graft-ann-wh6").toString
    s.conf.set("spark.graft.warehouse", wh)
    graft.core.Tables.load(s, sfDir, "embeddings")
      .createOrReplaceTempView("ann_v_all")
    AnnServe.build(s, "annspec_ver", "ann_v_all", "vec_id",
      "embedding", 64, 4, 8, 16)
    val p1 = AnnServe.stats("annspec_ver").get.codesPath
    assert(p1.endsWith(".v1"), p1)
    // query loop racing a same-name rebuild: with overwrite-in-place this
    // raced deleted part files; with versioned publish every query reads
    // whichever REGISTERED version it planned against
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failed = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val pool = java.util.concurrent.Executors.newSingleThreadExecutor()
    val racer = pool.submit(new Runnable {
      override def run(): Unit =
        try while (!stop.get()) {
          val hits = AnnServe.query(s, "annspec_ver", queryVec, 5,
            nProbe = 0, shortlist = 10000000, excludeId = Some(0L)).collect()
          assert(hits.length == 5)
        } catch { case t: Throwable => failed.set(t) }
    })
    try {
      AnnServe.build(s, "annspec_ver", "ann_v_all", "vec_id",
        "embedding", 64, 4, 8, 16)
    } finally {
      stop.set(true)
      racer.get()
      pool.shutdown()
    }
    assert(failed.get() == null, s"racing query failed: ${failed.get()}")
    val p2 = AnnServe.stats("annspec_ver").get.codesPath
    assert(p2.endsWith(".v2") && p2 != p1, p2)
    // previous version kept for in-flight readers…
    assert(new java.io.File(p1).isDirectory, s"$p1 reaped too early")
    // …and reaped after the NEXT swap (disk bounded to ≤ 2 versions)
    AnnServe.build(s, "annspec_ver", "ann_v_all", "vec_id",
      "embedding", 64, 4, 8, 16)
    assert(AnnServe.stats("annspec_ver").get.codesPath.endsWith(".v3"))
    assert(!new java.io.File(p1).exists(), s"$p1 not reaped after next swap")
    assert(new java.io.File(p2).isDirectory, s"$p2 (previous) reaped early")
    // durable registry: rebuilds supersede by NAME — one record, pointing
    // at the live version (a codesPath-keyed supersede would have left a
    // stale record per rebuild for restore to replay)
    val recs = org.json4s.jackson.JsonMethods.parse(
      java.nio.file.Files.readString(
        java.nio.file.Paths.get(wh, "_indexes.json"))) match {
      case org.json4s.JArray(xs) => xs.filter(e =>
        e \ "kind" == org.json4s.JString("ann") &&
          e \ "key" == org.json4s.JString("annspec_ver"))
      case _ => Nil
    }
    assert(recs.size == 1, s"${recs.size} ann records after 3 builds")
    assert((recs.head \ "basePath") == org.json4s.JString(
      AnnServe.stats("annspec_ver").get.codesPath))
    // exhaustive exactness preserved through the rebuilds (queried on the
    // warehouse session — the temp view lives there)
    assert(AnnServe.query(s, "annspec_ver", queryVec, 20, nProbe = 0,
      shortlist = 10000000, excludeId = Some(0L))
      .collect().map(_.getLong(0)).toSeq == brute(emb, 20))
    s.catalog.dropTempView("ann_v_all"): Unit
  }

  test("name guard rejects path traversal: '.', '..', and dot-run names " +
    "can never aim the build at the warehouse/scratch root") {
    emb.createOrReplaceTempView("ann_g_all")
    try Seq(".", "..", "a..b", ".a", "a.", "../x", "a/b").foreach { bad =>
      val ex = intercept[IllegalArgumentException] {
        AnnServe.build(spark, bad, "ann_g_all", "vec_id", "embedding",
          64, 4, 8, 16)
      }
      assert(ex.getMessage.contains("dot-separated"), s"$bad: ${ex.getMessage}")
    } finally spark.catalog.dropTempView("ann_g_all")
  }
}
