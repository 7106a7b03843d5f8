package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio treated as opaque `BINARY` columns
  * with typed metadata. The Spark-side plumbing — schema, batched
  * mapPartitions (the Scala analogue of a Pandas UDF over mapInPandas),
  * partition sizing, output shape — is real and tested; the actual
  * codec decode is STUBBED with a deterministic fake header parser
  * (no image/audio libraries exist in this container). The stub is the
  * single seam to swap for javacv/ffmpeg on a real cluster.
  */
object Multimodal {

  /** Synthetic "image" blob: 16-byte fake header (magic, width, height,
    * channels) + deterministic payload. Stands in for a real JPEG. */
  def fakeImage(id: Long, width: Int, height: Int): Array[Byte] = {
    val header = java.nio.ByteBuffer.allocate(16)
    header.putInt(0x46414b45) // "FAKE"
    header.putInt(width)
    header.putInt(height)
    header.putInt(3)
    val payloadLen = 64 // stand-in for compressed pixels
    val rng = new graft.pipeline.Rng(id ^ 0x1337beefL)
    val payload = Array.fill[Byte](payloadLen)((rng.nextLong() & 0xff).toByte)
    header.array() ++ payload
  }

  // ---- REAL decode path: uncompressed 24-bit BMP (pure JVM) ----
  // The BMP container needs no codec library, so this path decodes REAL
  // pixel data end to end — the declared stub seam now carries one fully
  // real format (compressed codecs remain the seam). The pixel formula
  // is re-derivable in SQL, so the oracle checks the DECODE itself: the
  // query's dimensions and channel means come from parsing the bytes,
  // the oracle's from the generator formula — they agree only if the
  // header parse, bottom-up row order, BGR order and padding are right.

  /** Encode a 24-bit bottom-up BMP (rows padded to 4 bytes). */
  def encodeBmp(width: Int, height: Int,
      rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowSize = (width * 3 + 3) / 4 * 4
    val dataSize = rowSize * height
    val fileSize = 54 + dataSize
    val b = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
    b.putInt(fileSize); b.putInt(0); b.putInt(54)
    b.putInt(40); b.putInt(width); b.putInt(height)
    b.putShort(1); b.putShort(24)
    b.putInt(0); b.putInt(dataSize)
    b.putInt(2835); b.putInt(2835); b.putInt(0); b.putInt(0)
    var y = height - 1 // bottom-up storage
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val (r, g, bl) = rgb(x, y)
        b.put(bl.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var pad = rowSize - width * 3
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      y -= 1
    }
    b.array()
  }

  /** Decoded BMP: top-down row-major packed 0xRRGGBB pixels. */
  final case class BmpPixels(width: Int, height: Int, pixels: Array[Int])

  /** REAL decode of an uncompressed 24-bit BMP. */
  def decodeBmp(bytes: Array[Byte]): BmpPixels = {
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(b.get() == 'B'.toByte && b.get() == 'M'.toByte, "not a BMP")
    b.position(10); val dataOffset = b.getInt()
    b.position(18); val width = b.getInt(); val height = b.getInt()
    b.position(28); val bpp = b.getShort()
    require(bpp == 24, s"unsupported bpp $bpp")
    val rowSize = (width * 3 + 3) / 4 * 4
    val px = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val srcRow = dataOffset + (height - 1 - y) * rowSize
      var x = 0
      while (x < width) {
        val i = srcRow + x * 3
        val bl = bytes(i) & 0xff
        val g = bytes(i + 1) & 0xff
        val r = bytes(i + 2) & 0xff
        px(y * width + x) = (r << 16) | (g << 8) | bl
        x += 1
      }
      y += 1
    }
    BmpPixels(width, height, px)
  }

  /** REAL nearest-neighbor resize over decoded pixels: output (x, y)
    * samples source (x·w÷outW, y·h÷outH) — the standard decimation. */
  def resizeNearest(img: BmpPixels, outW: Int, outH: Int): BmpPixels = {
    val px = new Array[Int](outW * outH)
    var y = 0
    while (y < outH) {
      val sy = y * img.height / outH
      var x = 0
      while (x < outW) {
        val sx = x * img.width / outW
        px(y * outW + x) = img.pixels(sy * img.width + sx)
        x += 1
      }
      y += 1
    }
    BmpPixels(outW, outH, px)
  }

  /** REAL decode → REAL resize → channel means of the RESIZED pixels
    * (fixed outW×outH so the oracle can re-derive the sampled source
    * coordinates). */
  def bmpResizedMeans(df: DataFrame, outW: Int, outH: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    df.select(col("img_id").cast("long"), col("bmp"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val d = resizeNearest(decodeBmp(bytes), outW, outH)
        var sr = 0.0; var sg = 0.0; var sb = 0.0
        var i = 0
        while (i < d.pixels.length) {
          val p = d.pixels(i)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          i += 1
        }
        val n = d.pixels.length.toDouble
        (id, d.width, d.height, r4(sr / n), r4(sg / n), r4(sb / n))
      })
      .toDF("img_id", "out_w", "out_h", "mean_r", "mean_g", "mean_b")
  }

  /** Deterministic BMP corpus: image id has w = 4 + id%5, h = 3 + id%4
    * and pixel (x, y) = (r, g, b) =
    * ((x·7 + y·13 + id) % 256, (x·3 + y·5 + 2id) % 256,
    *  (x·11 + y + 3id) % 256) — the formula the oracle re-derives. */
  def bmpImages(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, 32).map { id =>
      val w = (4 + id % 5).toInt
      val h = (3 + id % 4).toInt
      val bytes = encodeBmp(w, h, (x, y) => (
        ((x * 7 + y * 13 + id) % 256).toInt,
        ((x * 3 + y * 5 + 2 * id) % 256).toInt,
        ((x * 11 + y + 3 * id) % 256).toInt))
      (id, bytes)
    }.toDF("img_id", "bmp")
  }

  /** REAL decode → per-channel means: dimensions and means computed
    * from the PARSED pixels (one narrow mapPartitions pass). */
  def bmpChannelMeans(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    df.select(col("img_id").cast("long"), col("bmp"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val d = decodeBmp(bytes)
        var sr = 0.0; var sg = 0.0; var sb = 0.0
        var i = 0
        while (i < d.pixels.length) {
          val p = d.pixels(i)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          i += 1
        }
        val n = d.pixels.length.toDouble
        (id, d.width, d.height, r4(sr / n), r4(sg / n), r4(sb / n))
      })
      .toDF("img_id", "width", "height", "mean_r", "mean_g", "mean_b")
  }

  final case class ImageRow(img_id: Long, image: Array[Byte], label: String)
  final case class DecodedImage(img_id: Long, width: Int, height: Int,
      channels: Int, n_bytes: Int, label: String)
  final case class ImageFeatures(img_id: Long, features: Array[Float])

  /** Deterministic corpus of fake images. */
  def images(spark: SparkSession, n: Long): Dataset[ImageRow] = {
    import spark.implicits._
    spark.range(0, n, 1, 32).map { id =>
      val rng = new graft.pipeline.Rng(id * 31L + 7L)
      ImageRow(id, fakeImage(id, 64 + rng.nextInt(1024), 64 + rng.nextInt(1024)),
        if (id % 3 == 0) "photo" else "diagram")
    }
  }

  /** STUB decode: parse the fake header. On a real cluster this is the
    * only function to replace (javax.imageio / javacv decode). Batched
    * per partition like a Pandas UDF batch. */
  def decode(images: Dataset[ImageRow]): Dataset[DecodedImage] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.mapPartitions { it =>
      it.map { r =>
        val buf = java.nio.ByteBuffer.wrap(r.image)
        val magic = buf.getInt()
        require(magic == 0x46414b45, s"bad magic for ${r.img_id}")
        DecodedImage(r.img_id, buf.getInt(), buf.getInt(), buf.getInt(),
          r.image.length, r.label)
      }
    }
  }

  /** STUB resize: metadata-level resize preserving aspect ratio. */
  def resizeMeta(decoded: Dataset[DecodedImage], maxSide: Int): DataFrame = {
    decoded.toDF
      .withColumn("scale",
        when(greatest(col("width"), col("height")) > maxSide,
          lit(maxSide) / greatest(col("width"), col("height")).cast("double"))
          .otherwise(lit(1.0)))
      .withColumn("out_width", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", floor(col("height") * col("scale")).cast("int"))
      .drop("scale")
  }

  // ---- video: opaque binary + frame sampling ----

  /** Synthetic "video" blob: 20-byte fake header (magic, width, height,
    * n_frames, fps_x100) + payload. Stands in for a real container. */
  def fakeVideo(id: Long, width: Int, height: Int, nFrames: Int, fpsX100: Int): Array[Byte] = {
    val header = java.nio.ByteBuffer.allocate(20)
    header.putInt(0x56494445) // "VIDE"
    header.putInt(width)
    header.putInt(height)
    header.putInt(nFrames)
    header.putInt(fpsX100)
    val rng = new graft.pipeline.Rng(id ^ 0xfeedbeefL)
    header.array() ++ Array.fill[Byte](32)((rng.nextLong() & 0xff).toByte)
  }

  final case class VideoRow(video_id: Long, video: Array[Byte], label: String)
  final case class DecodedVideo(video_id: Long, width: Int, height: Int,
      n_frames: Int, fps_x100: Int, label: String)

  def videos(spark: SparkSession, n: Long): Dataset[VideoRow] = {
    import spark.implicits._
    spark.range(0, n, 1, 32).map { id =>
      val rng = new graft.pipeline.Rng(id * 131L + 11L)
      VideoRow(id,
        fakeVideo(id, 320 + 16 * rng.nextInt(80), 240 + 16 * rng.nextInt(60),
          30 + rng.nextInt(3600), 2400 + 600 * rng.nextInt(4)),
        if (id % 2 == 0) "clip" else "film")
    }
  }

  /** STUB decode: parse the fake container header (the javacv/ffmpeg
    * seam on a real cluster). */
  def decodeVideo(vs: Dataset[VideoRow]): Dataset[DecodedVideo] = {
    val spark = vs.sparkSession
    import spark.implicits._
    vs.mapPartitions(_.map { r =>
      val buf = java.nio.ByteBuffer.wrap(r.video)
      require(buf.getInt() == 0x56494445, s"bad magic for ${r.video_id}")
      DecodedVideo(r.video_id, buf.getInt(), buf.getInt(), buf.getInt(),
        buf.getInt(), r.label)
    })
  }

  /** Frame sampling: one row per sampled frame at a fixed stride —
    * pure relational explosion over the decoded metadata (the frame
    * PIXEL fetch is the stubbed decode's job; the sampling plan — which
    * frames, their timestamps — is exact and oracle-checked). Sampled
    * frames are 0, stride, 2*stride, … < n_frames; ts_ms from fps. */
  def frameSample(decoded: Dataset[DecodedVideo], stride: Int): DataFrame = {
    decoded.toDF
      // a real decoder can emit n_frames = 0 (corrupt container);
      // sequence(0, -1, +stride) throws, so zero-frame rows are dropped
      // rather than detonating the job (ADVICE r02)
      .filter(col("n_frames") > 0)
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .withColumn("ts_ms", floor(col("frame_idx") * lit(100000L) / col("fps_x100")))
      .select(col("video_id"), col("frame_idx"), col("ts_ms"),
        col("width"), col("height"), col("label"))
  }

  // ---- audio: opaque binary + fixed-length segmentation ----

  /** Synthetic "audio" blob: 16-byte fake header (magic, sample_rate,
    * n_samples, channels) + payload — stands in for a real codec. */
  def fakeAudio(id: Long, sampleRate: Int, nSamples: Int, channels: Int): Array[Byte] = {
    val header = java.nio.ByteBuffer.allocate(16)
    header.putInt(0x41554449) // "AUDI"
    header.putInt(sampleRate)
    header.putInt(nSamples)
    header.putInt(channels)
    val rng = new graft.pipeline.Rng(id ^ 0x5eedf00dL)
    header.array() ++ Array.fill[Byte](32)((rng.nextLong() & 0xff).toByte)
  }

  final case class AudioRow(audio_id: Long, audio: Array[Byte], label: String)
  final case class DecodedAudio(audio_id: Long, sample_rate: Int,
      n_samples: Int, channels: Int, label: String)

  def audios(spark: SparkSession, n: Long): Dataset[AudioRow] = {
    import spark.implicits._
    spark.range(0, n, 1, 32).map { id =>
      val rng = new graft.pipeline.Rng(id * 257L + 3L)
      val rate = Vector(16000, 22050, 44100)(rng.nextInt(3))
      AudioRow(id, fakeAudio(id, rate, rate + rng.nextInt(rate * 29), 1 + rng.nextInt(2)),
        if (id % 4 == 0) "speech" else "music")
    }
  }

  /** STUB decode: parse the fake audio header (the real-codec seam). */
  def decodeAudio(as: Dataset[AudioRow]): Dataset[DecodedAudio] = {
    val spark = as.sparkSession
    import spark.implicits._
    as.mapPartitions(_.map { r =>
      val buf = java.nio.ByteBuffer.wrap(r.audio)
      require(buf.getInt() == 0x41554449, s"bad magic for ${r.audio_id}")
      DecodedAudio(r.audio_id, buf.getInt(), buf.getInt(), buf.getInt(), r.label)
    })
  }

  /** Fixed-length segmentation: one row per `segSeconds`-second window,
    * last segment ragged — the shape ASR/feature pipelines consume.
    * Pure relational explosion over decoded metadata (sample fetch is
    * the stub seam); segment count = ceil(n_samples / seg_samples). */
  def segment(decoded: Dataset[DecodedAudio], segSeconds: Int): DataFrame = {
    decoded.toDF
      .withColumn("seg_samples", col("sample_rate") * segSeconds)
      .withColumn("seg_idx", explode(sequence(lit(0),
        floor((col("n_samples") - 1) / col("seg_samples")).cast("int"))))
      .select(col("audio_id"), col("seg_idx"),
        (col("seg_idx") * col("seg_samples")).as("start_sample"),
        least(col("seg_idx") * col("seg_samples") + col("seg_samples"),
          col("n_samples")).as("end_sample"),
        col("sample_rate"), col("channels"), col("label"))
  }

  /** STUB feature extraction: byte histogram → 16-dim float vector
    * (stands in for a CNN embedding; same shape/partitioning). */
  def features(images: Dataset[ImageRow]): Dataset[ImageFeatures] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.mapPartitions { it =>
      it.map { r =>
        val hist = new Array[Float](16)
        r.image.foreach(b => hist((b & 0xff) >> 4) += 1f)
        val n = r.image.length.toFloat
        ImageFeatures(r.img_id, hist.map(_ / n))
      }
    }
  }
}
