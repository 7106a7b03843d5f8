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
