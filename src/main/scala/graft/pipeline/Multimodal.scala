package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by batched `mapPartitions`.
  *
  * The actual media decode is STUBBED (this container ships no image/audio
  * codecs): `fakeDecode` below is a deterministic stand-in marked clearly.
  * Everything around it — schema, partition-parallel batching, feature
  * shapes, frame-sampling fan-out — is the real distributed plumbing a
  * decoder would plug into (swap `fakeDecode` for an actual JNI/library
  * call; the Python equivalent would be mapInPandas with batch columns).
  */
final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
    width: Int, height: Int, n_frames: Int)

final case class MediaFeature(media_id: Long, kind: String,
    feature: Array[Float], n_bytes: Int)

final case class FrameRow(media_id: Long, frame_idx: Int, frame: Array[Byte])

object Multimodal {

  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic synthetic media table (payload = opaque bytes). */
  def synth(spark: SparkSession, n: Long, parts: Int, seed: Long = 11L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0L, n, 1L, parts).map { i =>
      val r = mix(seed ^ mix(i))
      val kinds = Array("image", "audio", "video")
      val kind = kinds((r & 0x7fffffff).toInt % 3)
      val len = 64 + ((r >>> 8) % 1024).toInt
      val payload = new Array[Byte](len)
      var j = 0
      var s = r
      while (j < len) { s = mix(s); payload(j) = (s & 0xff).toByte; j += 1 }
      MediaRow(i, kind, payload, 32 + (r % 64).toInt.abs, 32 + ((r >>> 16) % 64).toInt.abs,
        if (kind == "video") 8 + ((r >>> 24) % 24).toInt.abs else 1)
    }
  }

  /** ??? decode stand-in ??? — a real implementation would decode the
    * payload with an image/audio library here. This fake derives a
    * deterministic feature vector from the payload bytes so the pipeline
    * shape (batching, schema, partitioning) is fully testable.
    */
  private def fakeDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < payload.length) {
      h = (h * 0x100000001b3L) ^ (payload(i) & 0xffL)
      out(i % dim) += ((h >>> 40) & 0xffff) / 65536.0f - 0.5f
      i += 1
    }
    out
  }

  /** Feature extraction: batched per-partition decode → fixed-dim vector.
    * Narrow (no shuffle); at cluster scale the decoder amortizes init cost
    * per partition, exactly like a mapInPandas batch would.
    */
  def extractFeatures(ds: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeature] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder init would go here (model load, codec ctx)
      it.map(m => MediaFeature(m.media_id, m.kind, fakeDecode(m.payload, dim), m.payload.length))
    }
  }

  /** Frame sampling fan-out for videos: one row per sampled frame. The
    * frame extraction itself is the same stub; the fan-out shape
    * (explode-by-generator inside mapPartitions) is real.
    */
  def frameSample(ds: Dataset[MediaRow], everyN: Int = 4): Dataset[FrameRow] = {
    import ds.sparkSession.implicits._
    ds.filter(_.kind == "video").flatMap { m =>
      (0 until m.n_frames by everyN).map { f =>
        // ??? real frame decode goes here ???
        val bytes = java.util.Arrays.copyOfRange(m.payload, 0,
          math.min(16, m.payload.length))
        FrameRow(m.media_id, f, bytes)
      }
    }
  }

  /** Resize metadata transform (payload passthrough; a real resize would
    * re-encode the payload in the same map).
    */
  def resize(ds: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import ds.sparkSession.implicits._
    ds.map(m => m.copy(width = w, height = h))
  }
}
