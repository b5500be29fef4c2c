package graft.functions

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.deriveMedia(Tables.load(spark, sfDir, "documents")).cache()

  test("derived media table has the declared schema and sane metadata") {
    val sch = media.schema
    assert(sch("bytes").dataType == org.apache.spark.sql.types.BinaryType)
    assert(sch("meta").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    val r = media.filter(col("_id") === 0).select(
      col("kind"), col("meta.n_bytes"), col("meta.width"), col("meta.height")).collect()(0)
    assert(r.getString(0) == "image")
    val n = r.getLong(1); val w = r.getInt(2); val h = r.getInt(3)
    assert(w == math.ceil(math.sqrt(n.toDouble)).toInt)
    assert(w.toLong * h >= n && (h - 1).toLong * w < n)
  }

  test("decodeFeatures: stub codec byte stats, batched per partition") {
    val doc0 = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") === 0).select("text").collect()(0).getString(0)
    val bytes = doc0.getBytes("UTF-8").map(_ & 0xff)
    val r = Multimodal.decodeFeatures(media)
      .filter(col("_id") === 0).collect()(0)
    assert(r.getLong(4) == bytes.length)
    assert(r.getInt(2) == bytes.min && r.getInt(3) == bytes.max)
    assert(math.abs(r.getDouble(1) - bytes.sum.toDouble / bytes.length) < 1e-3)
  }

  test("frameSample explodes video rows only, at the sampling interval") {
    val frames = Multimodal.frameSample(media, everyMs = 100)
    // only kind=video (_id % 3 == 2)
    assert(frames.filter(col("_id") % 3 =!= 2).count() == 0)
    val one = media.filter(col("kind") === "video")
      .select(col("_id"), col("meta.duration_ms")).collect()(0)
    val expect = ((one.getLong(1) + 99) / 100)
    assert(frames.filter(col("_id") === one.getLong(0)).count() == expect)
    // frame_idx contiguous from 0
    val idx = frames.filter(col("_id") === one.getLong(0))
      .orderBy("frame_idx").collect().map(_.getLong(1)).toSeq
    assert(idx == (0L until expect))
  }

  test("resizeMeta is blob-free column math") {
    val rs = Multimodal.resizeMeta(media, 224, 224)
    val r = rs.filter(col("_id") === 0).collect()(0)
    assert(r.getInt(4) == 224 && r.getInt(5) == 224)
    assert(math.abs(r.getDouble(6) - r.getInt(2).toDouble / 224) < 1e-3)
    // on an uncached source, column pruning must drop blob production
    // entirely (metadata ops never touch the bytes)
    val fresh = Multimodal.resizeMeta(
      Multimodal.deriveMedia(
        Tables.load(spark, sfDir, "documents").limit(7)), 224, 224)
    assert(!fresh.queryExecution.optimizedPlan.toString.contains("encode("))
  }

  test("duplicate clusters and keep-one-per-cluster") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val clusters = Dedup.duplicateClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    val corpus = (1L to 12L).toDF("doc_id")
    val kept = Dedup.dedupKeepOne(corpus, "doc_id",
      Dedup.duplicateClusters(pairs)).collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 5L, 6L, 7L, 8L, 9L, 10L, 12L))
  }

  test("embed produces fixed-dim vectors usable by the ANN surface") {
    val e = Multimodal.embed(media, dims = 4)
    assert(e.schema("vec").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType, containsNull = false))
    val v = e.filter(col("_id") === 0).collect()(0).getSeq[Double](1)
    assert(v.length == 4 && v.forall(x => x >= 0 && x <= 255))
  }

  test("empty media blobs survive every operator (no executor crash)") {
    import spark.implicits._
    // doc_id 2 % 3 == 2 → 'video' row with an EMPTY text → 0-byte blob
    val empty = Multimodal.deriveMedia(
      Seq((2L, "")).toDF("doc_id", "text"))
    val meta = empty.select(col("meta.n_bytes"), col("meta.width"),
      col("meta.height"), col("meta.duration_ms")).collect()(0)
    assert(meta.getLong(0) == 0 && meta.getInt(1) == 0 && meta.getInt(2) == 0)
    val feats = Multimodal.decodeFeatures(empty).collect()(0)
    assert(feats.isNullAt(feats.fieldIndex("mean_sample")) &&
      feats.getAs[Long]("n_samples") == 0L)
    assert(Multimodal.frameSample(empty, everyMs = 100).count() == 0)
    assert(Multimodal.resizeMeta(empty, 224, 224).count() == 1)
  }

  test("WAV round-trips through the real javax.sound codec, sample-exact") {
    // 16-bit PCM is lossless: encode → decode must reproduce every sample,
    // including the extremes
    val samples = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345)
    val bytes = Multimodal.encodeWav(8000, samples)
    // RIFF/WAVE magic — a real file, not a stub container
    assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    val (rate, back) = Multimodal.decodeWav(bytes)
    assert(rate == 8000 && back.toSeq == samples.toSeq)
  }

  test("JPEG decodes through the same ImageIO path as PNG (lossy-tolerant)") {
    // flat-gray JPEGs: lossy compression preserves a uniform field almost
    // exactly, so decode asserts dims exactly and samples within tolerance
    import spark.implicits._
    val jpegs = Seq((1L, 60), (2L, 128), (3L, 200)).toDF("_id", "gray")
      .as[(Long, Int)]
      .mapPartitions(_.map { case (id, g) =>
        val img = new java.awt.image.BufferedImage(
          8, 6, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val r = img.getRaster
        for (y <- 0 until 6; x <- 0 until 8) r.setSample(x, y, 0, g)
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        (id, g, bos.toByteArray)
      }).toDF("_id", "gray", "bytes")
    val feats = Multimodal.imageFeatures(jpegs.select("_id", "bytes"))
      .join(jpegs.select("_id", "gray"), "_id")
    val rows = feats.collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Int]("w") == 8 && r.getAs[Int]("h") == 6)
      val mean = r.getAs[Double]("mean_px")
      val g = r.getAs[Int]("gray")
      assert(math.abs(mean - g) <= 3.0, s"jpeg mean $mean vs $g")
    }
  }

  test("animated GIF round-trips frame-exact through the real ImageIO codec") {
    // indexed gray palette => stored palette index == sample value, so the
    // encode->decode round trip must be EXACT per frame
    val frames = Seq(
      Array.tabulate(12)(i => (i * 20) % 256),
      Array.tabulate(12)(i => 255 - i),
      Array.tabulate(12)(_ => 7))
    val bytes = Multimodal.encodeGif(4, 3, frames)
    val got = Multimodal.decodeGifFrames(bytes)
    assert(got.length == 3)
    got.zip(frames).zipWithIndex.foreach { case (((idx, w, h, s), want), i) =>
      assert(idx == i && w == 4 && h == 3)
      assert(s.toSeq == want.toSeq, s"frame $i bytes differ")
    }
    // distributed: fixtures encode on executors, features explode per frame
    val docs = spark.range(0, 7).toDF("doc_id")
    val feats = Multimodal.gifFrameFeatures(Multimodal.gifFixtures(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    // doc d has d%3+2 frames; frame f mean = avg((d*31 + f*97 + i) % 256)
    (0L until 7L).foreach { d =>
      val nf = (d % 3 + 2).toInt
      val mine = feats.filter(_._1 == d)
      assert(mine.length == nf, s"doc $d frame count")
      (0 until nf).foreach { f =>
        val want = (0 until 12).map(i => ((d * 31 + f * 97 + i) % 256).toDouble)
          .sum / 12
        val got = mine.find(_._2 == f).get._3
        assert(math.abs(got - want) < 1e-3, s"doc $d frame $f mean")
      }
    }
  }
}
