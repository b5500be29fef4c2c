package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque `BinaryType` columns with typed metadata, plus the decode /
  * feature-extract / resize / frame-sample operators over them.
  *
  * The reference has no media support (its closest analogue is the Arrow
  * dataframe sidecar of raw values, `reference/apply.go:14-34`); this module
  * is part of the 100 TB pipeline surface the engine adds on top.
  *
  * Execution shape — designed for scale:
  *   - media rows are wide (MBs of bytes); `spark.sql.files.maxPartitionBytes`
  *     governs scan parallelism, and all operators here are narrow
  *     (per-partition, no shuffle) so 100 TB of media fans out embarrassingly;
  *   - decode runs batched per partition via `mapPartitions` (the JVM analogue
  *     of `mapInPandas`): the iterator is consumed in fixed-size batches so a
  *     real codec can amortize setup (GPU transfer, JNI handle) across a
  *     batch, and peak memory is bounded by batch size × frame size, not
  *     partition size;
  *   - metadata-only operators (resize bookkeeping, frame indexing) are pure
  *     column expressions — codegen'd, never touching the blob.
  *
  * DECODE IS A STUB: [[decodeBytes]] stands in for a real codec (libjpeg /
  * ffmpeg / soundfile behind JNI or a sidecar service). It is a deterministic
  * fake — "samples" are the raw bytes — so specs and the DuckDB oracle can
  * verify the surrounding plumbing (schema, batching, partitioning,
  * explode shapes) exactly. Swapping in a real codec changes only the body of
  * `decodeBytes`; every signature stays.
  */
object Multimodal {

  val BatchSize = 64

  /** media schema: one row per asset. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("_id", LongType, nullable = false),
    StructField("kind", StringType),       // image | audio | video
    StructField("format", StringType),     // png | wav | mp4 (opaque tag)
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(    // typed metadata, queryable without decode
      StructField("n_bytes", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Derive a deterministic media table from `documents` (TESTDATA has no
    * binary fixtures; text bytes play the blob). Metadata formulas are fixed
    * so the oracle can recompute them: width = ceil(sqrt(n)),
    * height = ceil(n/width), 1 byte ≙ 1 ms. */
  def deriveMedia(documents: DataFrame): DataFrame = {
    val n = octet_length(col("text")).cast(LongType)
    val w = ceil(sqrt(n.cast(DoubleType))).cast(IntegerType)
    documents.select(
      col("doc_id").cast(LongType).as("_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast(IntegerType)).as("kind"),
      element_at(array(lit("png"), lit("wav"), lit("mp4")),
        (col("doc_id") % 3 + 1).cast(IntegerType)).as("format"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        n.as("n_bytes"), w.as("width"),
        // empty blob: width 0 would make this 0/0 → NaN → ANSI cast error
        when(n === 0, lit(0)).otherwise(
          ceil(n.cast(DoubleType) / w.cast(DoubleType)).cast(IntegerType)).as("height"),
        lit(3).as("channels"), lit(16000).as("sample_rate"),
        n.as("duration_ms")).as("meta"))
  }

  // ---------------------------------------------------------------- decode

  /** STUB CODEC — deterministic fake decode: the "sample stream" is the raw
    * bytes as unsigned ints. A real deployment replaces this body with the
    * actual codec call; callers never see the difference in shape. */
  private def decodeBytes(bytes: Array[Byte]): Array[Int] =
    bytes.map(b => b & 0xff)

  /** Batched per-partition decode → fixed-width feature vector per asset
    * (mean/min/max sample + length). Narrow op: no shuffle; batch-at-a-time
    * so codec setup amortizes and memory stays bounded. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val out = media.select(col("_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          // one codec invocation per batch in a real impl
          batch.map { case (id, bytes) =>
            val s = decodeBytes(bytes)
            if (s.isEmpty) // zero-length blob: null features, don't throw
              (id, None: Option[Double], None: Option[Int], None: Option[Int], 0L)
            else
              (id, Some(s.map(_.toDouble).sum / s.length), Some(s.min),
                Some(s.max), s.length.toLong)
          }
        }
      }
    out.toDF("_id", "mean_sample", "min_sample", "max_sample", "n_samples")
      .withColumn("mean_sample", round(col("mean_sample"), 4))
  }

  /** Resize bookkeeping: recompute target metadata as pure column math (no
    * blob access — codegen'd); the pixel resample itself is the stub codec's
    * job and here keeps the bytes opaque. */
  def resizeMeta(media: DataFrame, targetW: Int, targetH: Int): DataFrame =
    media.select(col("_id"), col("kind"),
      col("meta.width").as("src_w"), col("meta.height").as("src_h"),
      lit(targetW).as("dst_w"), lit(targetH).as("dst_h"),
      round(col("meta.width").cast(DoubleType) / targetW, 4).as("scale_x"),
      round(col("meta.height").cast(DoubleType) / targetH, 4).as("scale_y"))

  /** Frame sampling for video rows: one output row per sampled frame at
    * `everyMs` intervals across duration_ms. Pure generator expression
    * (sequence + explode) — the per-frame byte slice stays a lazy pointer
    * (offset math), so 100 TB of video explodes without copying blobs. */
  def frameSample(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("kind") === "video" && col("meta.duration_ms") > 0)
      .select(col("_id"),
        explode(sequence(lit(0L),
          col("meta.duration_ms") - 1, lit(everyMs))).as("ts_ms"))
      .withColumn("frame_idx", (col("ts_ms") / everyMs).cast(LongType))
      .select(col("_id"), col("frame_idx"), col("ts_ms"))

  // ------------------------------------------------------------ real codec

  /** REAL image codec (`javax.imageio`, PNG/JPEG) — the non-stub path. The
    * stub [[decodeBytes]] remains the deterministic default only for kinds
    * the JDK cannot decode (compressed audio and video need ffmpeg-class
    * natives not present here; WAV/PCM audio has its own real path,
    * [[decodeWav]]); images go through the actual ImageIO reader on
    * executors.
    * Grayscale band 0 is the sample stream; multi-band images read their
    * first band (luma-ish for YCbCr JPEG, red for RGB — documented, cheap). */
  def decodeImage(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "ImageIO could not decode payload (not PNG/JPEG/GIF/BMP?)")
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out(y * w + x) = raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    (w, h, out)
  }

  /** Lossless grayscale PNG encode — the write side of the real codec. */
  def encodePng(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, pixels(y * width + x)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 256-entry gray palette: GIF stores palette INDICES, so writing indexed
    * images through this model makes the encode→decode round trip exact
    * (sample in = index stored = sample out) — a TYPE_BYTE_GRAY source
    * would leave exactness to the writer's quantizer. */
  private def grayPalette: java.awt.image.IndexColorModel = {
    val g = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, g, g, g)
  }

  /** REAL animated-GIF encode (`javax.imageio` write sequence): one
    * grayscale-indexed frame per element of `frames`. */
  def encodeGif(width: Int, height: Int,
      frames: Seq[Array[Int]]): Array[Byte] = {
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    // interlace OFF: the writer's default is interlaced frames, which the
    // platform reader reassembles wrong for heights below the pass stride
    // (rows land on pass boundaries, gaps zero-fill)
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    frames.foreach { px =>
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
      val raster = img.getRaster
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { raster.setSample(x, y, 0, px(y * width + x)); x += 1 }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), param)
    }
    writer.endWriteSequence()
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  /** REAL animated-GIF frame extraction: every stored frame decoded through
    * the actual ImageIO GIF reader. Returns (frameIdx, w, h, samples). */
  def decodeGifFrames(bytes: Array[Byte]): Seq[(Int, Int, Int, Array[Int])] = {
    val reader = javax.imageio.ImageIO
      .getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      (0 until n).map { i =>
        val img = reader.read(i)
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        val out = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { out(y * w + x) = raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
        (i, w, h, out)
      }
    } finally { reader.dispose(); iis.close() }
  }

  /** Deterministic REAL-GIF fixture table: doc d is an animated GIF of
    * (d%3+2) frames on a 4×3 grid, frame f pixel i = (d·31 + f·97 + i) mod
    * 256 — encoded through the actual GIF writer on executors, replayable
    * by the oracle as arithmetic. */
  def gifFixtures(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id").cast(LongType)).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val nf = (id % 3 + 2).toInt
          val frames = (0 until nf).map(f =>
            Array.tabulate(12)(i => ((id * 31 + f * 97 + i) % 256).toInt))
          (id, encodeGif(4, 3, frames))
        }
      }.toDF("_id", "bytes")
  }

  /** Per-frame stats through the REAL GIF reader — one output row per
    * stored frame (video-style frame sampling with an actual codec).
    * Narrow map + explode of a per-doc-bounded list: no shuffle, blobs
    * never leave their partition. */
  def gifFrameFeatures(gifs: DataFrame): DataFrame = {
    val spark = gifs.sparkSession
    import spark.implicits._
    val out = gifs.select(col("_id"), col("bytes")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { case (id, bytes) =>
            decodeGifFrames(bytes).map { case (f, w, h, s) =>
              (id, f.toLong, w, h,
                s.map(_.toDouble).sum / s.length, s.min.toLong, s.max.toLong)
            }
          }
        }
      }
    out.toDF("_id", "frame_idx", "w", "h", "mean_px", "min_px", "max_px")
      .withColumn("mean_px", round(col("mean_px"), 4))
  }

  /** Deterministic REAL-PNG fixture table: pixel (row-major index i) of doc d
    * is (d·31 + i) mod 256 on a (d%5+3) × (d%4+2) grayscale grid, encoded
    * through the actual PNG writer ON EXECUTORS (narrow map — fixture bytes
    * never sit on the driver). The formula is what lets DuckDB oracle the
    * decoded stats without a codec of its own. */
  def pngFixtures(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id").cast(LongType)).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (id % 5 + 3).toInt
          val h = (id % 4 + 2).toInt
          val px = Array.tabulate(w * h)(i => ((id * 31 + i) % 256).toInt)
          (id, encodePng(w, h, px))
        }
      }.toDF("_id", "bytes")
  }

  /** Per-image stats through the REAL decoder — same batched narrow shape as
    * [[decodeFeatures]], but the bytes go through ImageIO, so this is an
    * encode→decode round trip when fed [[pngFixtures]]. */
  def imageFeatures(images: DataFrame): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    val out = images.select(col("_id"), col("bytes")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val (w, h, s) = decodeImage(bytes)
            (id, w, h, s.map(_.toDouble).sum / s.length, s.min.toLong, s.max.toLong)
          }
        }
      }
    out.toDF("_id", "w", "h", "mean_px", "min_px", "max_px")
      .withColumn("mean_px", round(col("mean_px"), 4))
  }

  /** REAL resize: decode → nearest-neighbor resample (src = ⌊tgt·src/tgt⌋,
    * the mapping the oracle replays in SQL) → re-encode PNG → decode AGAIN →
    * stats. The double round trip is deliberate: it proves the encoder and
    * decoder agree, not just that the resample loop ran. Narrow op, no
    * shuffle; a GPU/JNI codec swaps in per batch without shape changes. */
  def imageResizeNN(images: DataFrame, tw: Int, th: Int): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    val out = images.select(col("_id"), col("bytes")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val (w, h, s) = decodeImage(bytes)
            val res = Array.tabulate(tw * th) { i =>
              val (tx, ty) = (i % tw, i / tw)
              s((ty * h / th) * w + (tx * w / tw))
            }
            val (_, _, s2) = decodeImage(encodePng(tw, th, res))
            (id, s2.map(_.toDouble).sum / s2.length, s2.min.toLong, s2.max.toLong)
          }
        }
      }
    out.toDF("_id", "mean_px", "min_px", "max_px")
      .withColumn("mean_px", round(col("mean_px"), 4))
  }

  /** REAL audio codec (`javax.sound.sampled`, WAV/PCM) — the JDK ships a
    * WAVE reader/writer, so 16-bit mono PCM round-trips through the actual
    * codec like PNG/JPEG do above; only compressed audio (mp3/aac) and
    * video remain on the documented deterministic stub (no JDK codec).
    * Encode: samples → RIFF/WAVE little-endian PCM. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(
      AudioFormat.Encoding.PCM_SIGNED, sampleRate.toFloat, 16, 1, 2,
      sampleRate.toFloat, false) // little-endian
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode WAV → (sampleRate, 16-bit samples) through the real reader. */
  def decodeWav(bytes: Array[Byte]): (Int, Array[Short]) = {
    import javax.sound.sampled._
    val ais = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
      s"expected 16-bit mono PCM, got $fmt")
    val pcm = ais.readAllBytes()
    val out = new Array[Short](pcm.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) =
        if (fmt.isBigEndian)
          (((pcm(2 * i) & 0xff) << 8) | (pcm(2 * i + 1) & 0xff)).toShort
        else (((pcm(2 * i + 1) & 0xff) << 8) | (pcm(2 * i) & 0xff)).toShort
      i += 1
    }
    (fmt.getSampleRate.toInt, out)
  }

  /** Deterministic REAL-WAV fixture table: sample i of doc d is
    * ((d·37 + i·11) mod 65536) − 32768 over n = (d mod 50 + 20) samples at
    * 8 kHz, encoded through the actual WAVE writer ON EXECUTORS — the
    * formula lets DuckDB oracle the decoded stats without a codec. */
  def wavFixtures(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id").cast(LongType)).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val n = (id % 50 + 20).toInt
          val s = Array.tabulate(n)(i =>
            (((id * 37 + i.toLong * 11) % 65536) - 32768).toShort)
          (id, encodeWav(8000, s))
        }
      }.toDF("_id", "bytes")
  }

  /** Per-clip stats through the REAL WAV decoder — encode→decode round
    * trip when fed [[wavFixtures]], same batched narrow shape as the image
    * path. */
  def audioFeatures(audio: DataFrame): DataFrame = {
    val spark = audio.sparkSession
    import spark.implicits._
    val out = audio.select(col("_id"), col("bytes")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val (rate, s) = decodeWav(bytes)
            (id, rate, s.length.toLong,
              s.map(_.toDouble).sum / s.length, s.min.toLong, s.max.toLong)
          }
        }
      }
    out.toDF("_id", "sample_rate", "n_samples", "mean_s", "min_s", "max_s")
      .withColumn("mean_s", round(col("mean_s"), 4))
  }

  /** Decode-then-embed: stub feature vector reused by the ANN/similarity
    * surface ([[Similarity]]) — mean byte per fixed-stride bucket. */
  def embed(media: DataFrame, dims: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val out = media.select(col("_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val s = decodeBytes(bytes)
            val vec = Array.tabulate(dims) { d =>
              val slice = s.indices.filter(_ % dims == d).map(s(_))
              if (slice.isEmpty) 0.0
              else BigDecimal(slice.sum.toDouble / slice.size)
                .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
            }
            (id, vec)
          }
        }
      }
    out.toDF("_id", "vec")
  }
}
