package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skew rehearsal for the one big-big join in the dedup stack.
  *
  * At crawl scale, `substringDedup`'s position join-back
  * (`grams ⋈ duplicated-gram-keys` on the 48-bit gram hash) is the join
  * that skews: boilerplate n-grams ("click here to subscribe …") occur in
  * millions of documents, so a handful of gram hashes own most of the
  * probe side. When the duplicated-key side outgrows the broadcast
  * threshold (the Lee-2021 regime — most of a crawl IS duplicated), the
  * join becomes a shuffled join keyed by gram hash and the boilerplate
  * keys pile onto single reducers.
  *
  * The 100-TB answer is AQE's skew split (SURVEY §4.2 "watch skew at
  * 100 TB"): this spec plants exactly that shape, disables broadcast to
  * force the shuffled-join path, and asserts (a) results stay correct and
  * (b) the EXECUTED plan really split the skewed partition — evidence the
  * declarative shape leaves Spark free to re-plan skew at runtime, which
  * a hand-scheduled join would forfeit.
  */
class SkewSpec extends SparkSpec {

  test("substringDedup gram join-back under boilerplate skew: AQE " +
      "skew-split fires and results stay exact (forced non-broadcast)") {
    val s = spark
    import s.implicits._
    // ONE dominant gram: 18k docs are exactly the same 5-token boilerplate
    // (one gram each, all the same hash — the hot key), 2k docs are long
    // and fully unique (the even background load on the other partitions).
    // Many hot keys would hash-spread back to uniform; real crawl skew is
    // a handful of boilerplate grams, and one is the adversarial case.
    val nBoiler = 18000
    val nUnique = 2000
    val docs = (
      (1 to nBoiler).map(i =>
        (i.toLong, "click here to subscribe now")) ++
      (1 to nUnique).map { i =>
        val id = (nBoiler + i).toLong
        (id, (1 to 24).map(k => s"u${i}w$k").mkString(" "))
      }).toDF("doc_id", "text")

    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // test-scale thresholds: the planted skew is ~MBs, not GBs, and the
      // hot partition's identical rows compress hard in the shuffle files
      // (partition sizes are COMPRESSED bytes)
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1024",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1024",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // force the shuffled-join path (the real trigger at scale is the
      // duplicated-key side outgrowing the broadcast threshold)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // inspect the SAME Dataset that runs: AQE finalizes the plan inside
      // this QueryExecution at collect time
      val out = Dedup.substringDedup(docs, "doc_id", "text", 5)
        .select("id", "n_spans", "n_removed")
      val rows = out.collect()
      assert(rows.length == nBoiler + nUnique)
      // every boilerplate doc is cut whole; unique docs untouched
      rows.foreach { r =>
        if (r.getLong(0) <= nBoiler)
          assert(r.getLong(1) == 1L && r.getLong(2) == 5L, r.toString)
        else
          assert(r.getLong(1) == 0L && r.getLong(2) == 0L, r.toString)
      }
      // the finalized adaptive plan must show the skew handling actually
      // happened on the gram join (OptimizeSkewedJoin marks the join
      // skew=true / the shuffle read prints its skewed split count)
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        "no skew split in executed plan:\n" + plan.take(5000))
    } finally prev.foreach { case (k, v) =>
      v match {
        case Some(x) => spark.conf.set(k, x)
        case None    => spark.conf.unset(k)
      }
    }
  }

  test("minhash verify join under a giant-document regime: pairs stay " +
      "exact and the plan bounds the skew by construction (plan-proof)") {
    val s = spark
    import s.implicits._
    // the verify join's skew shape: `cand ⋈ posting` on ida is probe-heavy
    // on a DOCUMENT with a huge shingle count — one giant near-dup pair
    // owns almost the whole posting side while background docs spread
    // evenly. (Boilerplate SHINGLES don't skew this join: its keys are doc
    // ids / (id, hash) composites.)
    //
    // Why the assertion is a plan-proof and not skew=true: AQE's
    // OptimizeSkewedJoin splits oversized SHUFFLE-READ partitions, but the
    // posting side of this join deliberately rides the doc-partitioned
    // layoutById exchange with the shingle explode ABOVE it — the giant
    // document is ONE pre-shuffle row, so there is no oversized shuffle
    // partition to split; the skew only comes into existence inside the
    // task, bounded by that document's own shingle count (the same bound
    // as any map task that scans the document). The place the
    // pairs×shingles PRODUCT lands — the real quadratic risk — is the
    // join's output exchange, and that is keyed (idb, hs): the 64-bit
    // shingle hash in the key spreads a hot doc's product rows across all
    // reducers by construction. Re-shuffling the posting by ida to make
    // the join AQE-splittable was measured in r8 as ~2/3 of the candidate
    // stage (the eager-checkpoint regression this pipeline removed); the
    // per-doc bound plus the composite-key spread is the 100-TB answer.
    val giantA = (1 to 30000).map(k => s"g$k").mkString(" ")
    val giantB = (1 to 30000).map(k => if (k % 97 == 0) s"x$k" else s"g$k")
      .mkString(" ")
    val docs = (Seq((1L, giantA), (2L, giantB)) ++
      (1 to 3000).map { i =>
        val group = (i + 1) / 2 // two docs per group → one dup pair each
        ((i + 2).toLong, (1 to 12).map(k => s"d${group}w$k").mkString(" "))
      }).toDF("doc_id", "text")

    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1024",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1024",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val out = Dedup.minhashPairs(
        Dedup.shingledPosting(docs, "doc_id", "text", layoutById = true), 0.5)
      val rows = out.collect()
      // the giant pair verifies as a near-dup; background dups too
      assert(rows.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
        s"giant pair missing from ${rows.length} pairs")
      assert(rows.length > 100, s"background dup pairs missing: ${rows.length}")
      val plan = out.queryExecution.executedPlan.toString
      // (a) the posting probe side keeps the explode ABOVE the doc
      // exchange (one row per doc crosses the wire; per-task skew is
      // bounded by a document's own size)
      assert(plan.contains("word_shingles"), plan.take(3000))
      val exploded = "(?s)Generate explode\\(word_shingles[^\\n]*\\n[^\\n]*" +
        "Exchange hashpartitioning\\(doc_id"
      assert(exploded.r.findFirstIn(plan).isDefined,
        "shingle explode is no longer above the doc-partitioned exchange " +
          "(giant docs would now cross the wire as shingle rows):\n" +
          plan.take(8000))
      // (b) the join output re-exchanges on the composite (idb, hs) key,
      // hash-spreading a hot doc's pairs×shingles product
      assert("hashpartitioning\\(idb#\\d+L, hs#\\d+L".r
          .findFirstIn(plan).isDefined,
        "verify-join output no longer spreads on (idb, hs):\n" +
          plan.take(8000))
    } finally prev.foreach { case (k, v) =>
      v match {
        case Some(x) => spark.conf.set(k, x)
        case None    => spark.conf.unset(k)
      }
    }
  }

  test("small duplicated-key side broadcasts (no shuffle to skew) — the " +
      "default regime") {
    val s = spark
    import s.implicits._
    val docs = (1 to 500).map { i =>
      (i.toLong, s"shared prefix tokens here now unique t$i w${i * 3}")
    }.toDF("doc_id", "text")
    val out = Dedup.substringDedup(docs, "doc_id", "text", 5)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "expected the dup-key side broadcast:\n" + plan.take(3000))
  }
}
