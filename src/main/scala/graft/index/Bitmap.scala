package graft.index

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.roaringbitmap.longlong.Roaring64NavigableMap

/** Roaring-bitmap acceleration layer — the one genuinely custom piece
  * (SURVEY.md §7.3): reproduces the reference's signature capability of
  * fast segmentation counts over compressed record-id bitmaps
  * (`reference/fragment.go:83`, `reference/rbf/rbf.go:3-29`) on top of Spark.
  *
  * Shape at 100 TB: ONE shuffle builds a per-segment bitmap of record ids
  * (map-side partial bitmaps merged by OR — the aggregation buffer is the
  * compressed bitmap itself, so shuffle volume is bitmap bytes, not row
  * count). Every pairwise/cross-segment combination afterwards is pure
  * bitmap algebra on the (tiny) aggregated table — the reference's
  * Count(Intersect(...)) across segments without rescanning the fact table.
  */
object Bitmap {

  def serialize(b: Roaring64NavigableMap): Array[Byte] = {
    b.runOptimize()
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    b.serialize(dos)
    dos.close()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Roaring64NavigableMap = {
    val b = new Roaring64NavigableMap()
    b.deserialize(new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes)))
    b
  }

  /** bitmap_build aggregate over a SQL expression: the native
    * [[BitmapBuildAgg]] (roaring-serialized shuffle buffer — not Java object
    * serialization), registered per session and invoked through the parser
    * (Spark 4 Columns no longer expose a Catalyst constructor). */
  def bitmapBuild(spark: SparkSession, sqlExpr: String): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bitmap_build", args => BitmapBuildAgg(args.head), "built-in")
    expr(s"graft_bitmap_build($sqlExpr)")
  }

  /** bitmap_or_agg over a SQL expression: OR-merge SERIALIZED bitmaps — the
    * cross-shard row-bitmap union reduce ([[BitmapOrAgg]]). */
  def bitmapOrAgg(spark: SparkSession, sqlExpr: String): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bitmap_or_agg", args => BitmapOrAgg(args.head), "built-in")
    expr(s"graft_bitmap_or_agg($sqlExpr)")
  }

  // Scalar bitmap algebra — ONE surface: the codegen'd native expressions
  // ([[BitmapCardinality]] et al. in BitmapExpressions.scala). The helpers
  // here are just Column wrappers; the former duplicate `udf()` path is
  // gone (two surfaces for one operation invited drift).
  private def nat(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.graftshim.Shim.column(e)
  private def ex(c: Column) = org.apache.spark.sql.graftshim.Shim.expression(c)
  val bitmapCount: Column => Column =
    c => nat(BitmapCardinality(ex(c)))
  val bitmapAndCount: (Column, Column) => Column =
    (a, b) => nat(BitmapAndCardinality(ex(a), ex(b)))
  val bitmapOrCount: (Column, Column) => Column =
    (a, b) => nat(BitmapOrCardinality(ex(a), ex(b)))
  val bitmapAndNotCount: (Column, Column) => Column =
    (a, b) => nat(BitmapAndNotCardinality(ex(a), ex(b)))
  val bitmapXorCount: (Column, Column) => Column =
    (a, b) => nat(BitmapXorCardinality(ex(a), ex(b)))

  /** Segment index: one bitmap of `idCol` per distinct `segCol` value. */
  def segmentIndex(df: DataFrame, segCol: String, idCol: String): DataFrame =
    df.groupBy(col(segCol).as("seg"))
      .agg(bitmapBuild(df.sparkSession, s"CAST(`$idCol` AS BIGINT)").as("bm"))

  /** Pairwise segment overlap counts (|A ∩ B| for every segment pair a < b)
    * — the reference's cross-segment Count(Intersect(Row(a), Row(b))) served
    * from the index without touching the fact table again. */
  def segmentOverlap(index: DataFrame): DataFrame =
    index.as("a").join(index.as("b"), col("a.seg") < col("b.seg"))
      .select(col("a.seg").as("seg_a"), col("b.seg").as("seg_b"),
        bitmapAndCount(col("a.bm"), col("b.bm")).as("cnt"))
      .orderBy("seg_a", "seg_b")
}
