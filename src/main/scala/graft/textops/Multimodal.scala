package graft.textops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Hashing

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, batch-shaped decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The decode step is a DETERMINISTIC STUB (clearly marked below): the
  * container ships no image/audio codecs, so `decodeStub` computes a byte
  * histogram instead of real pixels. Everything around it — the schema, the
  * binary payload handling, per-partition batching (the Scala analog of a
  * pandas-batched UDF: amortize per-batch setup, process rows in blocks),
  * and the partitioned write shape — is real and tested, so swapping in a
  * real codec is a one-function change.
  */
object Multimodal {

  final case class MediaMeta(
      width: Int,
      height: Int,
      sampleRate: Int,
      durationMs: Int,
      format: String
  )

  final case class MediaRow(
      mediaId: Long,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      meta: MediaMeta
  )

  /** Deterministic synthetic media row for id `i` — the single source of
    * truth shared by [[mediaTable]] (the distributed table) and the
    * generated-VALUES oracle in SparkEntry (which replays the same rows
    * driver-side to pin the stub features cross-engine).
    */
  def mediaRow(i: Long): MediaRow = {
    val kind = (i % 3) match {
      case 0 => "image"; case 1 => "audio"; case _ => "video"
    }
    val len = 256 + (Hashing.mix(i, 7L) & 0x3ffL).toInt
    val bytes = new Array[Byte](len)
    var j = 0
    var h = Hashing.mix(i, 13L)
    while (j < len) {
      bytes(j) = (h & 0xff).toByte
      h = Hashing.mix(h)
      j += 1
    }
    val meta = kind match {
      case "image" => MediaMeta(64 + (i % 512).toInt, 64 + (i % 384).toInt, 0, 0, "png")
      case "audio" => MediaMeta(0, 0, 16000, 1000 + (i % 9000).toInt, "wav")
      case _       => MediaMeta(320, 240, 0, 2000 + (i % 28000).toInt, "mp4")
    }
    MediaRow(i, kind, bytes, meta)
  }

  /** Deterministic synthetic media table: payload bytes derive from the id. */
  def mediaTable(spark: SparkSession, n: Long, partitions: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(i => mediaRow(i))
  }

  final val FeatureDim = 16

  /** Integer 16-bin byte histogram — the exact (un-normalized) counts behind
    * [[decodeStub]]; exposed so the generated-VALUES oracle can pin the stub
    * features in integer space (the float normalization round-trips exactly:
    * round((c/t)·t) = c for counts ≤ 2^23).
    */
  def byteHistogram(bytes: Array[Byte]): Array[Int] = {
    val hist = new Array[Int](FeatureDim)
    if (bytes == null) return hist
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) >>> 4) += 1
      i += 1
    }
    hist
  }

  /** ==== STUB ==== stands in for a real image/audio decoder (no codec libs
    * in this container): 16-bin byte histogram, L1-normalized. Deterministic;
    * replace with a real decode to productionize.
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    if (bytes == null || bytes.isEmpty) return out
    val hist = byteHistogram(bytes)
    val total = bytes.length.toFloat
    var b = 0
    while (b < FeatureDim) { out(b) = hist(b) / total; b += 1 }
    out
  }

  /** ==== STUB ==== resize: recomputes target dims preserving aspect ratio;
    * payload untouched (a real implementation would transcode).
    */
  def resizeDims(w: Int, h: Int, maxSide: Int): (Int, Int) = {
    if (w <= 0 || h <= 0 || math.max(w, h) <= maxSide) (w, h)
    else if (w >= h) (maxSide, math.max(1, math.round(h.toFloat * maxSide / w)))
    else (math.max(1, math.round(w.toFloat * maxSide / h)), maxSide)
  }

  /** ==== STUB ==== frame sampling: returns the byte offsets a real decoder
    * would seek to for `n` uniformly-spaced frames.
    */
  def frameOffsets(durationMs: Int, n: Int): Seq[Int] =
    if (durationMs <= 0 || n <= 0) Seq.empty
    else (0 until n).map(k => (durationMs.toLong * k / n).toInt)

  /** Batched feature extraction — the mapPartitions shape of a vectorized
    * (pandas-style) UDF: per-partition setup once, rows processed in blocks
    * of `batchSize`, feature column emitted alongside pruned metadata.
    */
  def extractFeatures(
      media: Dataset[MediaRow],
      batchSize: Int = 64
  ): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition setup would open the codec once here
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val feat = decodeStub(m.bytes)
          val (rw, rh) = resizeDims(m.meta.width, m.meta.height, 256)
          (m.mediaId, m.kind, m.bytes.length, feat, rw, rh,
            frameOffsets(m.meta.durationMs, 4))
        }
      }
    }.toDF("media_id", "kind", "n_bytes", "features", "resized_w",
      "resized_h", "frame_offsets")
  }
}
