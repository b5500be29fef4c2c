package graft.server

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * The registry is serving-process state (like the facade's statement
  * caches), NOT durable: a restarted facade rebuilds or re-registers; the
  * code table parquet itself is reusable.
  */
object AnnServe {

  final case class Entry(codesPath: String, original: DataFrame,
                         idCol: String, vecCol: String, dim: Int,
                         centroids: Array[Array[Double]],
                         codebooks: Array[Array[Array[Double]]])

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]

  def clear(): Unit = registry.clear()

  /** Build + register: one distributed assignment/encode pass over the
    * table; codes land in scratch parquet (m+8 bytes/vector). Returns
    * (nCells, code rows). */
  def build(spark: SparkSession, name: String, table: String, idCol: String,
            vecCol: String, dim: Int, nCells: Int, m: Int, k: Int): (Int, Long) = {
    val df = spark.table(table)
    val (codes, centroids, codebooks) =
      Similarity.ivfPqIndex(df, idCol, vecCol, dim, nCells, m, k)
    val path = graft.streaming.Ingest.scratch("ann_serve") + s"/$name"
    // cell-partitioned layout: the query's nProbe filter becomes PHYSICAL
    // partition pruning (PipelineSpec asserts ≤ nProbe partitions touched)
    codes.write.partitionBy("cell").mode("overwrite").parquet(path)
    registry.put(name,
      Entry(path, df, idCol, vecCol, dim, centroids, codebooks))
    (centroids.length, spark.read.parquet(path).count())
  }

  /** Incremental ingest into a BUILT index (FAISS `add()` semantics): the
    * new rows are assigned to their nearest EXISTING cells and
    * residual-encoded with the EXISTING codebooks — no quantizer refit, no
    * corpus re-encode — and their codes land as appended files in the
    * cell-partitioned layout (each query re-lists the code path, so the
    * next query sees them). The rerank side unions the new (id, vec) rows
    * so exactness at the exhaustive configuration is preserved; recall at
    * partial probes degrades only as far as the vector distribution drifts
    * from the fitted centroids (re-`build` when it matters). `where` is an
    * optional SQL predicate selecting which of the table's rows to append.
    * Returns the appended row count. */
  def append(spark: SparkSession, name: String, table: String,
             where: Option[String] = None): Long = {
    val e = Option(registry.get(name)).getOrElse(
      sys.error(s"ann index '$name' not built"))
    val rows0 = spark.table(table)
    val rows = where.map(w =>
      rows0.filter(org.apache.spark.sql.functions.expr(w))).getOrElse(rows0)
    val n = rows.count()
    Similarity.ivfPqEncode(
        Similarity.assignCells(rows, e.vecCol, e.centroids),
        e.idCol, e.vecCol, e.dim, e.centroids, e.codebooks)
      .write.partitionBy("cell").mode("append").parquet(e.codesPath)
    registry.put(name, e.copy(original =
      e.original.select(e.idCol, e.vecCol)
        .unionByName(rows.select(e.idCol, e.vecCol))))
    n
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
    Similarity.ivfPqTopK(spark.read.parquet(e.codesPath), e.original,
      e.idCol, e.vecCol, e.centroids, e.codebooks, q, k, probe, shortlist,
      excludeId)
  }
}
