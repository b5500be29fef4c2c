package graft.streaming

import graft.index.GroupIndex
import graft.plans.{IndexCatalog, IndexRewrite, IndexRegistry}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.hadoop.fs.{FileSystem, Path}
import java.util.concurrent.atomic.AtomicReference

/** Online grouped-index maintenance under streaming ingest — the Spark
  * analogue of the reference folding imported bits into live fragments per
  * consumed batch (`reference/fragment.go:1498` bulkImport, fed by
  * `reference/batch/batch.go:83`): every micro-batch is (1) appended to the
  * fact table's parquet directory and (2) folded into the grouped index with
  * [[GroupIndex.merge]], after which the durable registration swaps to the
  * new version — grouped queries stay index-served, fresh to the last
  * committed batch, without ever rescanning the corpus.
  *
  * Idempotence: foreachBatch is at-least-once, and an aggregate fold is NOT
  * naturally idempotent (a replayed batch would double every count). Both
  * writes are therefore keyed by batchId:
  *  - fact append: the batch stages into a dot-prefixed dir (invisible to
  *    Spark's file listing), any prior replay's `b<id>-*` files are removed,
  *    then the staged files publish under batch-unique names — the same
  *    add-files-with-unique-names commit Delta/Iceberg make, minus the
  *    manifest;
  *  - index fold: the merged index writes to `<stem>.b<id>`; a replay that
  *    finds that version already committed (`_SUCCESS`) skips the fold and
  *    only re-registers.
  * The reference gets the same at-least-once safety from bit-set writes
  * being idempotent (`reference/idk/interfaces.go:46` Commit()); grouped
  * sums are not, hence the version marker.
  *
  * Restart/resume: [[start]] recovers the latest COMMITTED `<stem>.b<N>`
  * version from storage before streaming begins — the standard Structured
  * Streaming recovery path (restart against an existing checkpoint, or a
  * second AvailableNow run picking up new files) must fold on top of the
  * committed index, not restart from a fresh delta. Without this, a resumed
  * stream's first batch would register a delta-only index for the whole
  * fact dir and reclamation would delete the versions holding all prior
  * batches — silently wrong aggregates the freshness guard cannot catch
  * (registration re-fingerprints the facts at registration time). An
  * explicit `initialIndexPath` is only honored when NO committed version
  * exists (it describes the pre-stream index; committed versions fold on
  * top of it and so always supersede it).
  *
  * All storage IO routes through Hadoop [[FileSystem]] resolved from the
  * path, so factDir/indexStem may live on HDFS/S3A as well as local disk —
  * with one caveat: publish uses rename, which is atomic-per-file on
  * HDFS/posix but copy-based on S3A (a crash mid-publish can leave a
  * partial batch visible until the replay republishes it).
  *
  * 100-TB shape: per-batch cost is one grouped aggregation over the BATCH
  * plus a combo-cardinality-sized merge — independent of the fact table's
  * size. Serving queries read the index version, never the accreting facts;
  * the previous version is kept (one-deep) so in-flight queries planned
  * against the prior registration finish, older versions are reclaimed.
  */
object IndexMaintain {

  final class State(initialIndexPath: Option[String]) {
    private[IndexMaintain] val current =
      new AtomicReference[Option[String]](initialIndexPath)
    /** The index version currently registered/serving (None until the first
      * batch commits when starting from scratch). */
    def currentIndexPath: Option[String] = current.get()
  }

  private def fsFor(spark: SparkSession, p: String): (FileSystem, Path) = {
    val path = new Path(p)
    (path.getFileSystem(spark.sessionState.newHadoopConf()), path)
  }

  /** The latest committed (`_SUCCESS`-marked) `<stem>.b<N>` version on
    * storage, if any — the resume point for a restarted maintenance
    * stream. */
  def latestCommitted(spark: SparkSession, indexStem: String): Option[String] = {
    val (fs, stem) = fsFor(spark, indexStem)
    val parent = stem.getParent
    val base = stem.getName
    val Versioned = java.util.regex.Pattern.quote(base) + "\\.b(\\d+)"
    if (parent == null || !fs.exists(parent)) None
    else fs.listStatus(parent).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val m = st.getPath.getName
        val mm = java.util.regex.Pattern.compile(Versioned).matcher(m)
        if (mm.matches() && fs.exists(new Path(st.getPath, "_SUCCESS")))
          Some(mm.group(1).toLong)
        else None
      }
      // return in the CALLER's path style (not the fs-qualified URI) so
      // state paths stay comparable with the ones foldBatch writes
      .sorted.lastOption.map(n => s"$indexStem.b$n")
  }

  /** Fold ONE micro-batch: publish the batch's rows into `factDir`, merge
    * them into the grouped index, re-register durably, reclaim versions
    * older than the previous. Public so specs can drive replay directly.
    *
    * `quantums` maintains TIME-QUANTUM group keys online — the reference's
    * time views are built per import, not per query
    * (`reference/time.go:74-117` viewsByTimeInto on ingest): the reserved
    * `__q_<unit>_<ts>` columns are derived on the BATCH before the fold
    * (the published facts keep only raw columns; the key derives), and the
    * registration carries the fold session's timezone so serving queries
    * with a skewed tz decline. `groupCols` must already include each
    * quantum's `.name`. */
  def foldBatch(batch: DataFrame, batchId: Long, factDir: String,
                indexStem: String, groupCols: Seq[String],
                sumCols: Seq[String], distinctCols: Seq[String],
                state: State,
                quantums: Seq[GroupIndex.Quantum] = Nil): Unit =
    // the WHOLE publish→fold→register→reap sequence holds the per-table
    // maintenance lock (r14 VERDICT #1): an operator refoldMutation racing
    // this fold would otherwise clobber the same next version — or land
    // between the fact publish and the fold, recompute the touched combos
    // from facts that already include the batch, and have the fold add the
    // batch AGAIN. Serialized, the two algebras compose.
    IndexRegistry.maintLock(factDir) {
    val spark = batch.sparkSession
    publishFactBatch(batch, batchId, factDir)
    val withQ = GroupIndex.withQuantums(batch, quantums)
    val next = s"$indexStem.b$batchId"
    val (fs, nextPath) = fsFor(spark, next)
    // reconcile with the durable registry INSIDE the lock: an external
    // maintainer (refoldMutation/refoldDelete after a mutation) publishes
    // `.b<id>.v<k>` versions this stream's own State chain never sees —
    // folding onto the stale State base would silently drop its
    // corrections, and re-registering would bless the loss as fresh
    val registryCur = IndexRegistry.currentIndexPath(spark, factDir, groupCols)
    val stateCur = state.current.get()
    val committed = fs.exists(new Path(nextPath, "_SUCCESS"))
    if (committed && registryCur.exists(rc =>
        rc != next && rc.startsWith(next + "."))) {
      // replay of a batch that was folded AND then refolded on top: the
      // registry version is fresher and already contains this batch — adopt
      state.current.set(registryCur)
    } else {
      val mergeBase = registryCur.orElse(stateCur)
      if (!committed) {
        // thread-local suppression (foreachBatch plans on this thread):
        // concurrent serving queries keep the rewrite; no shared conf race
        graft.plans.IndexRewrite.suppress {
          val delta = GroupIndex.build(withQ, groupCols, sumCols, distinctCols)
          mergeBase match {
            case Some(cur) =>
              GroupIndex.merge(spark.read.parquet(cur), delta, groupCols,
                sumCols, distinctCols).write.mode("overwrite").parquet(next)
            case None =>
              delta.write.mode("overwrite").parquet(next)
          }
        }
      } else if (registryCur.isDefined && registryCur != stateCur) {
        // CRASH CORNER: this batch committed its fold, but an external
        // maintainer published since the fold's base was read (crash
        // between commit and registration) — the committed version may
        // lack the external corrections and there is no record of which
        // base it folded from. Facts are the unambiguous truth: rebuild
        // this version from them. Paid only on this (restart + lost-race)
        // corner, never in steady state.
        graft.plans.IndexRewrite.suppress {
          GroupIndex.build(
            GroupIndex.withQuantums(spark.read.parquet(factDir), quantums),
            groupCols, sumCols, distinctCols)
            .write.mode("overwrite").parquet(next)
        }
      }
      val prev = state.current.getAndSet(Some(next))
      // ONE post-publish fact listing serves both the catalog's freshness
      // fingerprint and the durable record (registerGroupDurable would
      // otherwise re-list per batch — measurable at high fact-file counts)
      val tz = spark.sessionState.conf.sessionLocalTimeZone
      IndexRegistry.registerGroupDurable(spark, factDir, groupCols,
        GroupIndex.explodedCols(withQ, groupCols), sumCols, next, distinctCols,
        quantums = quantums.map(q => q.name -> tz).toMap,
        factSig = IndexCatalog.factSignatureFast(spark, factDir),
        expectPrev = registryCur)
      IndexRewrite.install(spark)
      // keep current + previous (which may be an externally refolded
      // `.b<k>.v<j>` adopted above); reclaim anything older (posix: files
      // already open to an in-flight query stay readable until close)
      val stemPath = new Path(indexStem)
      val parent = stemPath.getParent
      val base = stemPath.getName
      val keep = Set(Some(next), prev, registryCur).flatten
        .map(p => new Path(p).getName)
      if (parent != null && fs.exists(parent))
        fs.listStatus(parent).toSeq
          .filter(st => st.getPath.getName.startsWith(base + ".b") &&
            !keep(st.getPath.getName))
          .foreach(st => fs.delete(st.getPath, true))
    }
  }

  /** Stage-then-publish the batch's rows into the flat fact parquet dir
    * under `b<batchId>-` names; replay-safe (prior partial publish of the
    * same batch is removed first). */
  private def publishFactBatch(batch: DataFrame, batchId: Long,
                               factDir: String): Unit = {
    val spark = batch.sparkSession
    val (fs, dir) = fsFor(spark, factDir)
    val staging = new Path(dir, s".staging_b$batchId")
    batch.write.mode("overwrite").parquet(staging.toString)
    if (fs.exists(dir))
      fs.listStatus(dir).toSeq
        .filter(_.getPath.getName.startsWith(s"b$batchId-"))
        .foreach(st => fs.delete(st.getPath, false))
    fs.listStatus(staging).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
      .zipWithIndex.foreach { case (st, i) =>
        require(fs.rename(st.getPath, new Path(dir, s"b$batchId-$i.parquet")),
          s"publish failed for ${st.getPath}")
      }
    fs.delete(staging, true): Unit
  }

  /** Start maintained ingest: stream → foreachBatch { publish facts, fold
    * index, re-register }. `initialIndexPath` is a pre-built
    * [[GroupIndex.buildTo]] table over `factDir`'s existing rows (None when
    * starting empty); a committed `<stem>.b<N>` version recovered from
    * storage supersedes it (see the restart note above). Returns the query
    * plus the live [[State]]. */
  def start(stream: DataFrame, factDir: String, checkpointDir: String,
            indexStem: String, groupCols: Seq[String], sumCols: Seq[String],
            distinctCols: Seq[String] = Nil,
            initialIndexPath: Option[String] = None,
            quantums: Seq[GroupIndex.Quantum] = Nil): (StreamingQuery, State) = {
    val spark = stream.sparkSession
    val (fs, dir) = fsFor(spark, factDir)
    fs.mkdirs(dir)
    // install on the CALLER's session here: foreachBatch runs on a session
    // CLONE whose ExperimentalMethods are a copy, so the install inside
    // foldBatch reaches the clone only — serving queries run on this one
    IndexRewrite.install(spark)
    val state = new State(
      latestCommitted(spark, indexStem).orElse(initialIndexPath))
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: DataFrame, id: Long) =>
        foldBatch(b, id, factDir, indexStem, groupCols, sumCols,
          distinctCols, state, quantums))
      .trigger(Trigger.AvailableNow())
      .start()
    (q, state)
  }
}
