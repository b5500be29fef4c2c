package graft.streaming

import graft.index.GroupIndex
import graft.plans.{IndexRewrite, IndexRegistry}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import java.io.File
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

  /** Fold ONE micro-batch: publish the batch's rows into `factDir`, merge
    * them into the grouped index, re-register durably, reclaim versions
    * older than the previous. Public so specs can drive replay directly. */
  def foldBatch(batch: DataFrame, batchId: Long, factDir: String,
                indexStem: String, groupCols: Seq[String],
                sumCols: Seq[String], distinctCols: Seq[String],
                state: State): Unit = {
    val spark = batch.sparkSession
    publishFactBatch(batch, batchId, factDir)
    val next = s"$indexStem.b$batchId"
    if (!new File(next, "_SUCCESS").exists()) {
      val prevConf = spark.conf.getOption("spark.graft.indexRewrite")
      spark.conf.set("spark.graft.indexRewrite", "false")
      try {
        val delta = GroupIndex.build(batch, groupCols, sumCols, distinctCols)
        state.current.get() match {
          case Some(cur) =>
            GroupIndex.merge(spark.read.parquet(cur), delta, groupCols,
              sumCols, distinctCols).write.mode("overwrite").parquet(next)
          case None =>
            delta.write.mode("overwrite").parquet(next)
        }
      } finally prevConf match {
        case Some(v) => spark.conf.set("spark.graft.indexRewrite", v)
        case None    => spark.conf.unset("spark.graft.indexRewrite")
      }
    }
    val prev = state.current.getAndSet(Some(next))
    IndexRegistry.registerGroupDurable(spark, factDir, groupCols,
      GroupIndex.explodedCols(batch, groupCols), sumCols, next, distinctCols)
    IndexRewrite.install(spark)
    // keep current + previous; reclaim anything older (posix: files already
    // open to an in-flight query stay readable until its handles close)
    val stemFile = new File(indexStem)
    val parent = stemFile.getParentFile
    val base = stemFile.getName
    val keep = Set(Some(next), prev).flatten.map(p => new File(p).getName)
    Option(parent.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(base + ".b") && !keep(f.getName))
      .foreach(deleteRec)
  }

  /** Stage-then-publish the batch's rows into the flat fact parquet dir
    * under `b<batchId>-` names; replay-safe (prior partial publish of the
    * same batch is removed first). */
  private def publishFactBatch(batch: DataFrame, batchId: Long,
                               factDir: String): Unit = {
    val staging = new File(factDir, s".staging_b$batchId")
    batch.write.mode("overwrite").parquet(staging.getAbsolutePath)
    val dir = new File(factDir)
    Option(dir.listFiles((_, n) => n.startsWith(s"b$batchId-")))
      .getOrElse(Array.empty).foreach(_.delete())
    Option(staging.listFiles((_, n) => n.endsWith(".parquet")))
      .getOrElse(Array.empty).zipWithIndex.foreach { case (f, i) =>
        require(f.renameTo(new File(dir, s"b$batchId-$i.parquet")),
          s"publish failed for $f")
      }
    deleteRec(staging)
  }

  /** Start maintained ingest: stream → foreachBatch { publish facts, fold
    * index, re-register }. `initialIndexPath` is a pre-built
    * [[GroupIndex.buildTo]] table over `factDir`'s existing rows (None when
    * starting empty). Returns the query plus the live [[State]]. */
  def start(stream: DataFrame, factDir: String, checkpointDir: String,
            indexStem: String, groupCols: Seq[String], sumCols: Seq[String],
            distinctCols: Seq[String] = Nil,
            initialIndexPath: Option[String] = None): (StreamingQuery, State) = {
    new File(factDir).mkdirs()
    // install on the CALLER's session here: foreachBatch runs on a session
    // CLONE whose ExperimentalMethods are a copy, so the install inside
    // foldBatch reaches the clone only — serving queries run on this one
    IndexRewrite.install(stream.sparkSession)
    val state = new State(initialIndexPath)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: DataFrame, id: Long) =>
        foldBatch(b, id, factDir, indexStem, groupCols, sumCols,
          distinctCols, state))
      .trigger(Trigger.AvailableNow())
      .start()
    (q, state)
  }

  private def deleteRec(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    if (f.exists()) { f.delete(); () }
  }
}
