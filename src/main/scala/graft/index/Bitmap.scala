package graft.index

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
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

  /** Aggregator building a 64-bit roaring bitmap from a LONG column.
    * Roaring64NavigableMap is Externalizable → java-serialization encoder. */
  class BitmapBuild extends Aggregator[java.lang.Long, Roaring64NavigableMap, Array[Byte]] {
    override def zero: Roaring64NavigableMap = new Roaring64NavigableMap()
    override def reduce(b: Roaring64NavigableMap, v: java.lang.Long): Roaring64NavigableMap = {
      if (v != null) b.addLong(v)
      b
    }
    override def merge(a: Roaring64NavigableMap, b: Roaring64NavigableMap): Roaring64NavigableMap = {
      a.or(b); a
    }
    override def finish(b: Roaring64NavigableMap): Array[Byte] = serialize(b)
    override def bufferEncoder: Encoder[Roaring64NavigableMap] =
      Encoders.javaSerialization[Roaring64NavigableMap]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

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

  /** bitmap_build aggregate as a Column (use inside groupBy().agg()). */
  def bitmapBuild(c: Column): Column = udaf(new BitmapBuild).apply(c)

  // Scalar bitmap algebra (applied to the aggregated segment table, which is
  // orders of magnitude smaller than the fact table — UDF cost is irrelevant
  // there; the fact-table side stays pure codegen).
  val bitmapCount: Column => Column = {
    val f = udf((a: Array[Byte]) => deserialize(a).getLongCardinality)
    c => f(c)
  }
  val bitmapAndCount: (Column, Column) => Column = {
    val f = udf { (a: Array[Byte], b: Array[Byte]) =>
      val x = deserialize(a); x.and(deserialize(b)); x.getLongCardinality
    }
    (a, b) => f(a, b)
  }
  val bitmapOrCount: (Column, Column) => Column = {
    val f = udf { (a: Array[Byte], b: Array[Byte]) =>
      val x = deserialize(a); x.or(deserialize(b)); x.getLongCardinality
    }
    (a, b) => f(a, b)
  }
  val bitmapAndNotCount: (Column, Column) => Column = {
    val f = udf { (a: Array[Byte], b: Array[Byte]) =>
      val x = deserialize(a); x.andNot(deserialize(b)); x.getLongCardinality
    }
    (a, b) => f(a, b)
  }

  /** Segment index: one bitmap of `idCol` per distinct `segCol` value. */
  def segmentIndex(df: DataFrame, segCol: String, idCol: String): DataFrame =
    df.groupBy(col(segCol).as("seg"))
      .agg(bitmapBuild(col(idCol).cast("long")).as("bm"))

  /** Pairwise segment overlap counts (|A ∩ B| for every segment pair a < b)
    * — the reference's cross-segment Count(Intersect(Row(a), Row(b))) served
    * from the index without touching the fact table again. */
  def segmentOverlap(index: DataFrame): DataFrame =
    index.as("a").join(index.as("b"), col("a.seg") < col("b.seg"))
      .select(col("a.seg").as("seg_a"), col("b.seg").as("seg_b"),
        bitmapAndCount(col("a.bm"), col("b.bm")).as("cnt"))
      .orderBy("seg_a", "seg_b")
}
