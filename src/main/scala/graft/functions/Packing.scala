package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training pipelines: concatenate documents into
  * fixed token-budget training sequences (greedy, in-order), the standard
  * pre-training batch-assembly step. A 100-TB corpus packs embarrassingly
  * parallel BY SHARD: each shard's docs pack independently in one linear
  * scan, so the whole operator is one exchange (group docs by shard) + a
  * sort + an O(1)-state pass — no joins, no iteration. Cross-shard boundary
  * waste is at most one under-full sequence per shard, negligible when
  * shards hold millions of documents.
  *
  * Semantics (deterministic, DuckDB-replayable with a recursive CTE):
  * within a shard (`id % nShards`), docs are taken in id order; a doc joins
  * the open sequence unless that would exceed `budget` tokens, in which
  * case the sequence closes and a new one opens. A doc longer than the
  * budget occupies a sequence alone (truncation is the trainer's policy
  * decision, not the packer's).
  */
object Packing {

  /** Pack into token-budget sequences; one summary row per (shard, seq):
    * document count and token total. `nShards` is the parallelism dial —
    * at corpus scale set it so a shard's docs fit one task comfortably. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    budget: Long, nShards: Int = 8): DataFrame =
    packSequencesByCount(
      df.select(col(idCol), Text.tokenCount(col(textCol)).cast("long").as("__n")),
      idCol, "__n", budget, nShards)

  /** [[packSequences]] over a PRECOMPUTED per-doc token count (e.g. BPE
    * token totals from [[Text.bpeEncode]] instead of whitespace counts). */
  def packSequencesByCount(df: DataFrame, idCol: String, nCol: String,
                           budget: Long, nShards: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(
        pmod(col(idCol), lit(nShards.toLong)).as("shard"),
        col(idCol).cast("long").as("id"),
        col(nCol).cast("long").as("n"))
      .as[(Long, Long, Long)]
    rows
      // hash-partition by shard: a shard's rows land wholly in one task
      // (multiple shards may share a task — the scan resets at boundaries)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("id"))
      .mapPartitions(packScan(_, budget))
      .toDF("shard", "seq", "n_docs", "tokens")
      .orderBy("shard", "seq")
  }

  /** Streaming linear scan over (shard, id, n) sorted by (shard, id):
    * emits one (shard, seq, n_docs, tokens) row per closed sequence.
    * O(1) state — never buffers the partition. */
  private[functions] def packScan(it: Iterator[(Long, Long, Long)], budget: Long)
      : Iterator[(Long, Long, Long, Long)] =
    new Iterator[(Long, Long, Long, Long)] {
      private var shard = 0L
      private var seqNo = 0L
      private var docs = 0L
      private var toks = 0L
      private var out: (Long, Long, Long, Long) = _
      private var ready = false
      private def fill(): Unit = {
        while (!ready && it.hasNext) {
          val (s, _, n) = it.next()
          if (docs == 0) { shard = s; seqNo = 0; docs = 1; toks = n }
          else if (s != shard) {
            out = (shard, seqNo, docs, toks); ready = true
            shard = s; seqNo = 0; docs = 1; toks = n
          } else if (toks + n > budget) {
            out = (shard, seqNo, docs, toks); ready = true
            seqNo += 1; docs = 1; toks = n
          } else { docs += 1; toks += n }
        }
        if (!ready && docs > 0 && !it.hasNext) {
          out = (shard, seqNo, docs, toks); ready = true; docs = 0
        }
      }
      override def hasNext: Boolean = { fill(); ready }
      override def next(): (Long, Long, Long, Long) = {
        fill()
        if (!ready) throw new NoSuchElementException("packScan exhausted")
        ready = false
        out
      }
    }
}
