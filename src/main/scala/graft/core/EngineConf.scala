package graft.core

import org.apache.spark.sql.SparkSession

/** Engine-level SQL conf every graft session needs, applied in ONE place so
  * tools/facades/specs can't drift apart (an Explain session that misses one
  * of these profiles a different plan than the Bench session it's meant to
  * explain). */
object EngineConf {
  val settings: Seq[(String, String)] = Seq(
    // the minhash pipeline's ~130-column signature unpack/band projection
    // exceeds the default codegen field guard (100); past it, whole-stage
    // codegen silently degrades (measured ~1.7× on the signature stage)
    "spark.sql.codegen.maxFields" -> "256",
    // TypedImperativeAggregates (minhash signatures, roaring bitmap build,
    // bounded collect) plan as ObjectHashAggregate, whose in-memory map
    // falls back to SORT-based aggregation after only 128 distinct keys per
    // partition — a hidden O(n log n) sort of the whole posting list on any
    // real corpus. 128Ki keys × ~1.1 KB signature buffer ≈ 140 MB bounds
    // the per-partition memory
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "131072",
    // the driver-generated parquet stores event times as timestamp[us]
    // WITHOUT isAdjustedToUTC, which Spark 4 infers as TIMESTAMP_NTZ; the
    // engine's event-time surface (watermarks, time quantum, Row(from=/to=))
    // is built on TIMESTAMP, and session tz is pinned UTC everywhere, so the
    // naive reading is identical. Conf-level (not a cast) keeps parquet
    // filter pushdown on ts intact.
    "spark.sql.parquet.inferTimestampNTZ.enabled" -> "false",
    // Spark's default parquet timestamp encoding is INT96 (Hive compat),
    // which carries NO usable column statistics — parquet deprecated INT96
    // min/max ordering, so writers emit none — and predicate pushdown on
    // INT96 is impossible. Measured on the 1B able table: a one-day
    // `ts >= lo AND ts < hi` filter read ALL row groups (48 s, a full
    // scan) because every file's timestamp stats were `None`. INT64
    // micros carries stats and pushes down, so retention scans,
    // time-bounded fact queries, and the delta refold's quantum-key prune
    // read only the matching row groups on a ts-clustered layout. Spark
    // timestamps are micros internally — no precision change.
    "spark.sql.parquet.outputTimestampType" -> "TIMESTAMP_MICROS",
    // the reference dialect treats double-quoted tokens as IDENTIFIERS
    // (`select x as "yy"` — sql3/parser; string literals are single-quoted
    // throughout), matching ANSI; Spark's default reads them as strings
    "spark.sql.ansi.doubleQuotedIdentifiers" -> "true",
    // aggregations that RIDE a join's output partitioning (a groupBy on a
    // superset of the join keys needs no exchange of its own — common in
    // the SQL surface and the dedup verify shapes) make OptimizeSkewedJoin
    // refuse by default: splitting the skewed partition would break the
    // downstream co-location, and the rule may not introduce the repair
    // shuffle. This conf permits that trade at RUNTIME only: plans are
    // unchanged when no skew is detected, and a detected straggler
    // partition is split at the cost of re-shuffling the rider's input —
    // on a 1000-executor cluster a straggler pinning a stage costs more
    // than the exchange it saves. (The minhash verify join's own skew is
    // bounded by construction instead — explode-above-exchange plus a
    // composite-key output spread, plan-asserted in SkewSpec — because
    // its posting side rides a reused non-shuffle child no splitter can
    // act on.)
    "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
    // Parquet IN pushdown: above this many values Spark degrades an
    // In/InSet predicate to a [min, max] range before handing it to
    // parquet — useless for point-lookup sets spread across the id space
    // (the ANN rerank's shortlist ids, refold touched-key lists). As an
    // or-chain, parquet's row-group stats and page column index prune the
    // scan to the pages actually holding the candidates. 4096 bounds the
    // left-deep or-chain parquet visitors recurse over (default 10).
    "spark.sql.parquet.pushdown.inFilterThreshold" -> "4096",
    // InferFiltersFromGenerate adds `isnotnull(arr) AND size(arr) > 0`
    // below every explode of a plain attribute. For an inner (non-outer)
    // explode those predicates are REDUNDANT — the Generate itself emits
    // nothing for null/empty arrays — and when the attribute is a DERIVED
    // column (documents.words = distinct-tokens-of-text, the engine's
    // STRINGSET surface) predicate pushdown inlines the derivation into the
    // inferred filter, so the tokenize expression runs THREE times per row
    // (twice in the filter, once in the projection) instead of once —
    // measured as the dominant per-row cost of every set-field GroupBy/
    // TopK/Rows over documents. Excluding the rule drops only those
    // inferred conjuncts (user-written predicates are untouched), and
    // IndexRewrite never depended on them (impliedByExplode exists to DROP
    // them when matching). The lost upside — pushing IsNotNull on a real
    // parquet array column into the scan — prunes only all-null row
    // groups, which none of the engine's set columns produce.
    "spark.sql.optimizer.excludedRules" ->
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
    // Materialize.stable's reliable tier writes Dataset.checkpoint files
    // under spark.graft.checkpointDir on the serving path (bm25, Ivy,
    // Compiler, TableLog); Spark never deletes reliable checkpoint data on
    // its own — without this conf a long-lived server leaks one checkpoint
    // tree per query until the shared FS fills. With it, the
    // ContextCleaner removes each checkpoint dir once the referencing RDD
    // is garbage-collected
    "spark.cleaner.referenceTracking.cleanCheckpoints" -> "true")

  /** Apply to a builder: `EngineConf(SparkSession.builder()...)`. */
  def apply(b: SparkSession.Builder): SparkSession.Builder =
    settings.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }

  /** Master selection shared by every main/spec, honoring
    * `SPARK_GRAFT_MASTER` — the multi-JVM gate. `local-cluster[n,c,memMB]`
    * launches n REAL worker-spawned executor JVMs (the mode Spark's own
    * suites use for distribution bugs local[] structurally hides:
    * classloading of custom codegen'd expressions, serialization of
    * imperative-aggregate buffers and closures across process boundaries).
    *
    * local-cluster executors are fresh JVMs with only the Spark
    * distribution on their classpath (`SPARK_HOME=/opt/spark`, set for
    * forked JVMs in build.sbt), so graft's own classes must be handed to
    * them explicitly: `spark.executor.extraClassPath` gets the sbt
    * classes dirs (always present when running under sbt; override with
    * SPARK_GRAFT_EXECUTOR_CP for a packaged-jar deployment). Executor
    * memory follows the worker grant from the master string — the default
    * 1g would waste the worker and spill every rehearsal sort.
    */
  def master(b: SparkSession.Builder, defaultMaster: String): SparkSession.Builder = {
    val m = sys.env.getOrElse("SPARK_GRAFT_MASTER", defaultMaster)
    val bb = b.master(m)
    if (!m.startsWith("local-cluster")) bb
    else {
      val cp = sys.env.getOrElse("SPARK_GRAFT_EXECUTOR_CP",
        Seq("target/scala-2.13/classes", "target/scala-2.13/test-classes")
          .map(p => new java.io.File(p).getAbsolutePath)
          .mkString(java.io.File.pathSeparator))
      val mem = "local-cluster\\[\\s*\\d+\\s*,\\s*\\d+\\s*,\\s*(\\d+)".r
        .findFirstMatchIn(m).map(_.group(1).toInt).getOrElse(1024)
      bb.config("spark.executor.extraClassPath", cp)
        .config("spark.executor.memory", s"${mem}m")
    }
  }
}
