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
