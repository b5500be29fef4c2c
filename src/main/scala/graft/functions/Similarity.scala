package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Cosine math is done in DOUBLE with strict left-to-right accumulation
  * (`aggregate` over `zip_with`) — bit-identical to DuckDB's
  * `list_cosine_similarity(::DOUBLE[], ::DOUBLE[])`, which makes the results
  * oracle-verifiable with no tolerance games.
  *
  * Scale paths: brute-force top-k is one broadcast + map + partial top-k per
  * partition (TakeOrderedAndProject — no full sort, no shuffle of the corpus).
  * The LSH path (random-hyperplane signatures + band buckets) bounds the
  * rerank set for corpus-×-corpus workloads at 100 TB.
  */
object Similarity {

  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = {
    val (da, db) = (asDouble(a), asDouble(b))
    dot(da, db) / (norm(da) * norm(db))
  }

  /** Brute-force exact top-k by cosine against one query vector. */
  def cosineTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                 query: Seq[Float], k: Int, excludeId: Option[Long] = None): DataFrame = {
    val q = array(query.map(lit): _*)
    val base = excludeId.map(e => embeddings.filter(col(idCol) =!= e))
      .getOrElse(embeddings)
    base.select(col(idCol),
        round(cosine(col(vecCol), q), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** All pairs with cosine ≥ threshold. Exact (block-nested-loop via cross
    * join) — the verification path; use [[annCandidates]] + rerank at scale. */
  def cosinePairs(embeddings: DataFrame, idCol: String, vecCol: String,
                  threshold: Double): DataFrame = {
    val e = embeddings.select(col(idCol).as("id"), col(vecCol).as("v"))
    e.as("a").join(e.as("b"), col("a.id") < col("b.id"))
      .withColumn("sim", cosine(col("a.v"), col("b.v")))
      .filter(col("sim") >= threshold)
      .select(col("a.id").as("a"), col("b.id").as("b"),
        round(col("sim"), 6).as("sim"))
      .orderBy("a", "b")
  }

  /** Deterministic pseudo-random hyperplanes (splitmix64-seeded, fixed). */
  private def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits, dim)(rnd.nextGaussian())
  }

  /** Random-hyperplane LSH signature (nBits-bit integer). */
  def rhpSignature(vec: Column, nBits: Int, dim: Int): Column = {
    val planes = hyperplanes(nBits, dim)
    val dv = asDouble(vec)
    (0 until nBits).map { i =>
      val plane = array(planes(i).map(lit): _*)
      when(dot(dv, plane) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** LSH-bucketed approximate top-k: candidates = vectors sharing any
    * band of the signature with the query, reranked exactly. At corpus scale
    * the bucket join replaces the full scan; recall is tunable via
    * nBits/bands. */
  def annTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              query: Seq[Float], k: Int, nBits: Int = 16, bandBits: Int = 4,
              excludeId: Option[Long] = None): DataFrame = {
    val dim = query.length
    val base = excludeId.map(e => embeddings.filter(col(idCol) =!= e))
      .getOrElse(embeddings)
    val sigged = base.withColumn("sig", rhpSignature(col(vecCol), nBits, dim))

    val spark = embeddings.sparkSession
    import spark.implicits._
    val qSig = spark.range(1).select(
      rhpSignature(array(query.map(lit): _*), nBits, dim).as("sig"))
      .as[Long].head()

    val bands = nBits / bandBits
    val mask = (1L << bandBits) - 1
    val bandMatch = (0 until bands).map { b =>
      (shiftright(col("sig"), b * bandBits).bitwiseAND(mask)
        === lit((qSig >> (b * bandBits)) & mask))
    }.reduce(_ || _)

    sigged.filter(bandMatch)
      .select(col(idCol),
        round(cosine(col(vecCol), array(query.map(lit): _*)), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  // -------------------------------------------------------------------- IVF

  /** IVF index build: k-means coarse quantizer; every vector is assigned to
    * its nearest centroid cell (the `cell` column). The billion-scale ANN
    * layout: the assignment is a one-time distributed job, cells become the
    * partition/pruning key, and a query touches ~|corpus|·nProbe/nCells rows
    * instead of the full scan. Returns (assigned corpus, centroids). */
  def ivfIndex(embeddings: DataFrame, idCol: String, vecCol: String,
               nCells: Int, seed: Long = 42L): (DataFrame, Array[Array[Double]]) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feat = embeddings.withColumn("__feat", array_to_vector(asDouble(col(vecCol))))
    val model = new KMeans().setK(nCells).setSeed(seed)
      .setFeaturesCol("__feat").setPredictionCol("cell").fit(feat)
    val assigned = model.transform(feat).drop("__feat")
    (assigned, model.clusterCenters.map(_.toArray))
  }

  /** IVF query: rank cells by centroid distance on the driver (centroid set
    * is tiny), probe the nProbe nearest, exact-cosine rerank inside them.
    * nProbe = nCells degenerates to exhaustive search (recall 1). */
  def ivfTopK(assigned: DataFrame, centroids: Array[Array[Double]],
              idCol: String, vecCol: String, query: Seq[Float], k: Int,
              nProbe: Int, excludeId: Option[Long] = None): DataFrame = {
    val q = query.map(_.toDouble).toArray
    def dist2(c: Array[Double]): Double =
      c.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
    val probeCells = centroids.zipWithIndex
      .sortBy { case (c, i) => (dist2(c), i) }
      .take(nProbe).map(_._2)
    val base = excludeId.map(e => assigned.filter(col(idCol) =!= e))
      .getOrElse(assigned)
    base.filter(col("cell").isin(probeCells.toIndexedSeq: _*))
      .select(col(idCol),
        round(cosine(col(vecCol), array(query.map(lit): _*)), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }
}
