package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, processed in
  * partition-sized batches.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): [[decodeStub]] derives deterministic fake dimensions and
  * features from the payload bytes. Everything around it — schema,
  * typed Dataset plumbing, `mapPartitions` batch shape, partition-local
  * processing with no shuffle — is the real production structure: swap
  * `fakeDecode` for a JNI/codec call (or a Pandas UDF over
  * `mapInArrow` in PySpark) and nothing else changes.
  */
object Multimodal {

  /** Typed media record: id + opaque payload + container metadata. */
  final case class MediaRecord(media_id: Long, format: String, payload: Array[Byte])

  /** Decoded result: dimensions/channels plus a small feature vector. */
  final case class DecodedMedia(
      media_id: Long,
      format: String,
      width: Int,
      height: Int,
      channels: Int,
      size_bytes: Long,
      features: Array[Float]
  )

  /** Wrap a string column as a fake payload (UTF-8 bytes) so the
    * pipeline can run against the `documents` fixture; a real ingest
    * would read binary files/blobs directly.
    */
  def asMedia(df: DataFrame, idCol: String, textCol: String, format: String = "img/fake"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(format).as("format"),
      col(textCol).cast("binary").as("payload")
    )

  /** STUB decode: deterministic pseudo-decode from payload bytes. A real
    * implementation calls the image/audio codec here — per partition,
    * streaming, no driver involvement, which is exactly what this
    * plumbing exercises.
    */
  private def fakeDecode(r: MediaRecord): DecodedMedia = {
    val bytes = if (r.payload == null) Array.emptyByteArray else r.payload
    var h = 1125899906842597L // deterministic FNV-style roll over the payload
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    val width = 64 + math.floorMod(h, 1024).toInt
    val height = 64 + math.floorMod(h >> 10, 1024).toInt
    val channels = 1 + math.floorMod(h >> 20, 4).toInt
    val features = Array.tabulate(8) { j =>
      val hj = h * (j + 1)
      (math.floorMod(hj, 1000) / 1000.0f)
    }
    DecodedMedia(r.media_id, r.format, width, height, channels, bytes.length.toLong, features)
  }

  /** Decode a media DataFrame partition-by-partition. Batch shape: the
    * iterator is consumed lazily, one record in flight per row — a
    * codec batching N frames would buffer inside the iterator without
    * changing the operator contract.
    */
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map(fakeDecode))
  }

  /** "Resize": scale decoded dimensions so the longer side is at most
    * `maxDim`, preserving aspect ratio — metadata-only here (the stub
    * has no pixels), but the column math and schema are exactly what a
    * real resize step maintains alongside the re-encoded payload.
    */
  def resizeMeta(decoded: DataFrame, maxDim: Int): DataFrame = {
    val longSide = greatest(col("width"), col("height"))
    val scale = when(longSide > maxDim, lit(maxDim).cast("double") / longSide.cast("double"))
      .otherwise(lit(1.0))
    decoded
      .withColumn("resized_width", floor(col("width") * scale).cast("int"))
      .withColumn("resized_height", floor(col("height") * scale).cast("int"))
  }

  /** "Frame sampling": split the payload into `n` equal byte chunks
    * (standing in for video frame extraction) — pure column functions,
    * stays in codegen.
    */
  def frameSample(media: DataFrame, n: Int): DataFrame = {
    val len = greatest(length(col("payload")), lit(1))
    val chunk = ceil(len.cast("double") / n).cast("int")
    media.withColumn(
      "frames",
      filter(
        transform(sequence(lit(0), lit(n - 1)), i => col("payload").substr(i * chunk + 1, chunk)),
        f => length(f) > 0
      )
    )
  }
}
