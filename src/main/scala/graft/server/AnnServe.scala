package graft.server

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import graft.functions.Similarity

/** ANN index serving for the HTTP facade — surfaces the library's
  * recall/latency dials (`nProbe`, `shortlist`) to facade users, who until
  * round 11 could only reach them from Scala.
  *
  * `POST /ann/{name}/build` builds a residual IVF-PQ index
  * ([[Similarity.ivfPqIndex]]) over a registered table's embedding column
  * and materializes the code table to scratch parquet; `POST
  * /ann/{name}/query` answers top-k with per-request dials:
  *
  *  - `nProbe` (default = nCells, exhaustive): how many coarse cells to
  *    scan. Cost is linear in nProbe — a cell-partitioned layout reads
  *    ~|corpus|·nProbe/nCells code rows; recall falls as nProbe shrinks
  *    because out-of-cell neighbors are forfeited by design.
  *  - `shortlist` (default 500): how many ADC-approximate candidates get
  *    the exact rerank against the original vectors. Cost is one broadcast
  *    join of `shortlist` rows; recall rises with it because ADC
  *    quantization error can rank a true neighbor just past k but rarely
  *    past a few hundred. `shortlist ≥ corpus` AND `nProbe = nCells`
  *    degenerates to exact brute force (recall 1) — the oracle-verified
  *    configuration.
  *
  * Registrations are DURABLE when `spark.graft.warehouse` is set: the
  * quantizer (centroids + codebooks — small arrays) and the rerank-side
  * sources persist to `warehouse/_indexes.json` next to the grouped/segment
  * index registrations, and [[graft.plans.IndexRegistry.restore]] (run by
  * `graft.sql.Ddl.restoreSession`) replays them — a bounced facade resumes
  * serving `/ann/{name}` without a rebuild, the same restart contract the
  * grouped indexes have. The code-table parquet persists itself.
  *
  * Concurrency: build/append/stat transitions for one name run under a
  * per-name lock — two concurrent appends each fold into the CURRENT entry
  * (a lost update on the rerank-side source list would silently break the
  * documented 'exhaustive == brute force' exactness invariant). Queries
  * take the registry snapshot lock-free.
  */
object AnnServe {

  /** One rerank-side input: rows of `table` (optionally `where`-filtered).
    * The durable form of the original-vector union — tables re-resolve on
    * restore, so the entry survives a process bounce as long as the table
    * does. */
  final case class Source(table: String, where: Option[String])

  final case class Entry(codesPath: String, sources: Seq[Source],
                         idCol: String, vecCol: String, dim: Int,
                         centroids: Array[Array[Double]],
                         codebooks: Array[Array[Array[Double]]],
                         residualNormBuild: Double,
                         residualNormLastAppend: Option[Double])

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]
  private def lockFor(name: String): Object =
    locks.computeIfAbsent(name, _ => new Object)

  def clear(): Unit = registry.clear()

  /** The rerank-side original vectors: union of the entry's sources,
    * resolved against the CURRENT session catalog (restore-safe). */
  private def originalDf(spark: SparkSession, e: Entry): DataFrame =
    e.sources.map { s =>
      val t = spark.table(s.table)
      s.where.map(w => t.filter(expr(w))).getOrElse(t)
        .select(e.idCol, e.vecCol)
    }.reduce(_ unionByName _)

  private val Versioned = "(.*)\\.v(\\d+)$".r

  /** The per-name code-table ROOT: warehouse-rooted when durable (a durable
    * registration must not point into /tmp scratch, which a tmp-cleaner
    * empties while the registry survives — r12 defect), scratch otherwise.
    * Versions publish as `<root>.v<N>` sibling directories. */
  private def rootFor(spark: SparkSession, name: String): String =
    scala.util.Try(spark.conf.get("spark.graft.warehouse"))
      .toOption.map { wh =>
        new java.io.File(s"$wh/_ann").mkdirs()
        s"$wh/_ann/$name"
      }.getOrElse {
        val parent = new java.io.File("/tmp/graft_stream/ann_serve")
        parent.mkdirs()
        s"${parent.getAbsolutePath}/$name"
      }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete(): Unit
  }

  /** Build + register: one distributed assignment/encode pass over the
    * table; codes land in cell-partitioned parquet (m+8 bytes/vector). Also
    * stores the build-time mean residual norm — the baseline the append
    * path's drift statistic is read against. Returns (nCells, code rows).
    *
    * A rebuild publishes to the NEXT `.v<N+1>` VERSION of the per-name
    * root and swaps the registration — never `mode("overwrite")` onto the
    * path lock-free queries are scanning (the grouped indexes' versioned-
    * publish discipline, [[graft.index.GroupIndex.appendDelta]]): a query
    * mid-scan during a same-name rebuild would otherwise hit deleted
    * files. The PREVIOUS version is kept (in-flight readers planned
    * against it finish their scans); versions older than that reap after
    * the swap, bounding disk to ≤ 2 versions. */
  def build(spark: SparkSession, name: String, table: String, idCol: String,
            vecCol: String, dim: Int, nCells: Int, m: Int, k: Int): (Int, Long) =
    lockFor(name).synchronized {
      // the location is PER-NAME (a shared tag once let any second name's
      // build destroy every other name's code table, r12 defect). Dots are
      // allowed INSIDE a segment but a name must never BE a path
      // traversal: '.'/'..' (or 'a..b' resolving games) would make the
      // per-name path escape the _ann/scratch root — POST /ann/../build
      // would aim the write (and the version reaping) at the warehouse
      // root itself, reachable unauthenticated when auth is off
      require(name.matches("[A-Za-z0-9_-]+(?:[.][A-Za-z0-9_-]+)*"),
        s"ann index name '$name' must be dot-separated [A-Za-z0-9_-] " +
          "segments (no leading/trailing/consecutive dots)")
      val df = spark.table(table)
      val (codes, centroids, codebooks) =
        Similarity.ivfPqIndex(df, idCol, vecCol, dim, nCells, m, k)
      val root = rootFor(spark, name)
      val curVer = Option(registry.get(name)).map(_.codesPath).collect {
        case Versioned(stem, v) if stem == root => v.toLong
      }.getOrElse(0L)
      val path = s"$root.v${curVer + 1}"
      // cell-partitioned layout: the query's nProbe filter becomes PHYSICAL
      // partition pruning (PipelineSpec asserts ≤ nProbe partitions touched)
      codes.write.partitionBy("cell").mode("overwrite").parquet(path)
      val buildNorm = Similarity.meanResidualNorm(
        df.select(idCol, vecCol), idCol, vecCol, centroids)
      val e = Entry(path, Seq(Source(table, None)), idCol, vecCol, dim,
        centroids, codebooks, buildNorm, None)
      registry.put(name, e)
      persist(spark, name, e)
      // reap AFTER the swap: anything older than the previous version, plus
      // the pre-versioning bare root dir once a versioned previous exists
      (1L until curVer).foreach(v => deleteRec(new java.io.File(s"$root.v$v")))
      if (curVer >= 1L) deleteRec(new java.io.File(root))
      (centroids.length, spark.read.parquet(path).count())
    }

  /** Incremental ingest into a BUILT index (FAISS `add()` semantics): the
    * new rows are assigned to their nearest EXISTING cells and
    * residual-encoded with the EXISTING codebooks — no quantizer refit, no
    * corpus re-encode — and their codes land as appended files in the
    * cell-partitioned layout (each query re-lists the code path, so the
    * next query sees them). The rerank side gains the (table, where) source
    * so exactness at the exhaustive configuration is preserved. Ids already
    * in the index are SKIPPED (anti-join against the code table's id
    * column — one column-pruned scan), so a replayed/duplicate append is a
    * no-op rather than a corpus corruption. `where` is an optional SQL
    * predicate selecting which of the table's rows to append.
    *
    * Drift telemetry: the appended batch's mean residual norm against the
    * BUILD-time centroids is stored on the entry (read it back via
    * [[stats]] / `GET /ann/{name}`). A ratio drifting above ~1 of the
    * build-time figure says the arriving distribution has wandered from
    * the fitted coarse quantizer: partial-probe (`nProbe < nCells`) recall
    * degrades and a re-`build` re-trains; exhaustive queries stay exact
    * regardless (AnnServeSpec demonstrates both halves).
    *
    * Returns the appended row count (0 when every id was already
    * present). */
  def append(spark: SparkSession, name: String, table: String,
             where: Option[String] = None): Long = lockFor(name).synchronized {
    val e = Option(registry.get(name)).getOrElse(
      sys.error(s"ann index '$name' not built"))
    val rows0 = spark.table(table)
    val rows = where.map(w => rows0.filter(expr(w))).getOrElse(rows0)
      .select(e.idCol, e.vecCol)
    // dedupe against the authoritative already-indexed id set (the code
    // table), not the source list — a crashed append may have published
    // codes before registering its source. Persisted: the anti-join's
    // corpus-side id scan would otherwise re-run for each of the three
    // downstream actions (count, drift sample, encode+write).
    val fresh = rows.join(
        spark.read.parquet(e.codesPath).select(e.idCol),
        Seq(e.idCol), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = fresh.count()
      // register the rerank-side source BEFORE writing codes (idempotent —
      // persist supersedes by name): if the process dies between the code
      // write and a trailing persist, a REPLAYED append would find nothing
      // fresh (anti-join) and return 0 — without this ordering the encoded
      // ids would sit in the shortlist path forever but never rerank
      // (the inner join with originalDf drops them), silently breaking the
      // exhaustive==brute-force exactness invariant. Extra source rows not
      // yet encoded are harmless: they are simply never shortlisted.
      val src = Source(table, where)
      val withSrc =
        if (e.sources.contains(src)) e
        else e.copy(sources = e.sources :+ src)
      if (withSrc ne e) { registry.put(name, withSrc); persist(spark, name, withSrc) }
      if (n == 0L) 0L
      else {
        val batchNorm = Similarity.meanResidualNorm(
          fresh, e.idCol, e.vecCol, e.centroids)
        Similarity.ivfPqEncode(
            Similarity.assignCells(fresh, e.vecCol, e.centroids),
            e.idCol, e.vecCol, e.dim, e.centroids, e.codebooks)
          .write.partitionBy("cell").mode("append").parquet(e.codesPath)
        val updated = withSrc.copy(residualNormLastAppend = Some(batchNorm))
        registry.put(name, updated)
        persist(spark, name, updated)
        n
      }
    } finally fresh.unpersist(): Unit
  }

  /** Query a registered index with per-request dials; `nProbe <= 0` means
    * exhaustive (all cells). Returns (id, sim) rows, sim rounded to 6
    * places like the library surface. */
  def query(spark: SparkSession, name: String, q: Seq[Float], k: Int,
            nProbe: Int, shortlist: Int,
            excludeId: Option[Long]): DataFrame = {
    val e = Option(registry.get(name)).getOrElse(
      sys.error(s"ann index '$name' not built"))
    require(q.length == e.dim,
      s"query dim ${q.length} != index dim ${e.dim}")
    val probe = if (nProbe <= 0) e.centroids.length else nProbe
    Similarity.ivfPqTopK(spark.read.parquet(e.codesPath),
      originalDf(spark, e), e.idCol, e.vecCol, e.centroids, e.codebooks,
      q, k, probe, shortlist, excludeId)
  }

  /** Operational stats for `GET /ann/{name}`: dims plus the drift
    * telemetry an operator reads to decide WHEN to re-`build` (the
    * documented retrain path for append-degraded partial-probe recall). */
  def stats(name: String): Option[Entry] = Option(registry.get(name))

  /** [[stats]] rendered as the facade's JSON body. Every string field goes
    * through the same escaper — a table/index name carrying a quote or
    * backslash must still yield valid JSON from `GET /ann/{name}`. */
  def statsJson(name: String): String = {
    val e = stats(name).getOrElse(sys.error(s"ann index '$name' not built"))
    def esc(s: String): String =
      s.flatMap {
        case '\\' => "\\\\"
        case '"'  => "\\\""
        case c if c < ' ' => "\\u%04x".format(c.toInt)
        case c    => c.toString
      }
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.6f", Double.box(v))
    val drift = e.residualNormLastAppend
      .map(l => num(l / math.max(e.residualNormBuild, 1e-12)))
      .getOrElse("null")
    val srcs = e.sources.map(s =>
      s"""{"table":"${esc(s.table)}"""" + s.where.map(w =>
        s""","where":"${esc(w)}"""").getOrElse("") + "}")
      .mkString("[", ",", "]")
    s"""{"name":"${esc(name)}","cells":${e.centroids.length},"dim":${e.dim},""" +
      s""""m":${e.codebooks.length},"sources":$srcs,""" +
      s""""residual_norm_build":${num(e.residualNormBuild)},""" +
      s""""residual_norm_last_append":${e.residualNormLastAppend.map(num).getOrElse("null")},""" +
      s""""drift_ratio":$drift}"""
  }

  private def persist(spark: SparkSession, name: String, e: Entry): Unit =
    graft.plans.IndexRegistry.registerAnnDurable(spark, name, e.codesPath,
      e.idCol, e.vecCol, e.dim, e.centroids, e.codebooks,
      e.sources.map(s => (s.table, s.where)), e.residualNormBuild,
      e.residualNormLastAppend)

  /** Replay one durable registration into the in-memory registry (called
    * by [[graft.plans.IndexRegistry.restore]]; does NOT re-persist). */
  private[graft] def restoreEntry(name: String, codesPath: String,
      idCol: String, vecCol: String, dim: Int,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      sources: Seq[(String, Option[String])], residualNormBuild: Double,
      residualNormLastAppend: Option[Double]): Unit =
    registry.put(name, Entry(codesPath,
      sources.map(s => Source(s._1, s._2)), idCol, vecCol, dim, centroids,
      codebooks, residualNormBuild, residualNormLastAppend)): Unit
}
