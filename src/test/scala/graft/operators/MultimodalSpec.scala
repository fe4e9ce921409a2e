package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** TEST-scope decode stub: a deterministic fake codec exercising the
  * production mapPartitions shape ([[Multimodal.MediaRecord]] in, typed
  * decoded rows out, partition-local, no shuffle). A real deployment
  * swaps `fakeDecode` for a JNI/codec call (or a Pandas UDF over
  * `mapInArrow` in PySpark) and nothing else changes — which is why the
  * plumbing is tested here even though the library ships no codec.
  */
object MultimodalDecodeStub {
  import Multimodal.MediaRecord

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

  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map(fakeDecode))
  }
}

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val media = Multimodal.asMedia(docs, "doc_id", "text").cache()

  test("asMedia produces (media_id, format, payload binary) schema") {
    assert(media.schema.map(f => (f.name, f.dataType.simpleString)) == Seq(
      ("media_id", "bigint"), ("format", "string"), ("payload", "binary")))
  }

  test("decodeStub is deterministic and preserves row count") {
    val d1 = MultimodalDecodeStub.decodeStub(spark, media).collect().sortBy(_.media_id)
    val d2 = MultimodalDecodeStub.decodeStub(spark, media).collect().sortBy(_.media_id)
    assert(d1.length == docs.count())
    assert(d1.map(_.width).toSeq == d2.map(_.width).toSeq)
    assert(d1.forall(m => m.width >= 64 && m.height >= 64 && m.channels >= 1 && m.features.length == 8))
  }

  test("decoded size_bytes equals payload length") {
    val sizes = MultimodalDecodeStub.decodeStub(spark, media)
      .select($"media_id", $"size_bytes")
      .join(media.select($"media_id", length($"payload").cast("long").as("plen")), "media_id")
      .where($"size_bytes" =!= $"plen")
    assert(sizes.count() == 0)
  }

  test("resizeMeta caps the long side at maxDim preserving aspect ratio") {
    val decoded = MultimodalDecodeStub.decodeStub(spark, media).toDF()
    val resized = Multimodal.resizeMeta(decoded, maxDim = 256)
    val bad = resized.where(
      greatest($"resized_width", $"resized_height") > 256 ||
        ($"width" <= 256 && $"height" <= 256 &&
          ($"resized_width" =!= $"width" || $"resized_height" =!= $"height")))
    assert(bad.count() == 0)
  }

  test("decodeHeaders round-trips synthesized PNG/GIF/JPEG containers") {
    val synth = Multimodal.synthesizeContainers(docs, "doc_id", "text")
    val got = Multimodal.decodeHeaders(synth)
      .select($"media_id", $"format", $"width", $"height", $"channels")
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    docs.select($"doc_id").collect().map(_.getLong(0)).foreach { id =>
      val fmt = (id % 3) match { case 0 => "png"; case 1 => "gif"; case _ => "jpeg" }
      val ch = if (id % 3 == 0 && id % 2 == 1) 1 else 3
      assert(got(id) == ((fmt, 64 + (id % 512).toInt, 64 + ((id * 7) % 512).toInt, ch)), s"id=$id")
    }
  }

  test("decodeHeaders JPEG segment walk skips APPn/COM runs before SOF0") {
    def hexBytes(h: String): Array[Byte] =
      h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // SOI, APP1 (len 8), COM (len 4), SOF0 1024x768, 3 components
    val jpeg = hexBytes(
      "FFD8" + "FFE10008AABBCCDDEEFF" + "FFFE0004AAAA" +
        "FFC0001108" + "0300" + "0400" + "03012200021101031101")
    // bare GIF87a 10x20 and a non-image payload
    val gif87 = hexBytes("474946383761" + "0A00" + "1400" + "F70000")
    val junk = "not an image".getBytes("UTF-8")
    val df = spark.createDataFrame(Seq((1L, jpeg), (2L, gif87), (3L, junk)))
      .toDF("media_id", "payload")
    val out = Multimodal.decodeHeaders(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "jpeg" && out(1L).getInt(2) == 1024 &&
      out(1L).getInt(3) == 768 && out(1L).getInt(4) == 3)
    assert(out(2L).getString(1) == "gif" && out(2L).getInt(2) == 10 && out(2L).getInt(3) == 20)
    assert(out(3L).getString(1) == "unknown" && out(3L).isNullAt(2))
  }

  test("decodeAvHeaders round-trips synthesized WAV/MP4 containers") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Multimodal
      .decodeAvHeaders(Multimodal.synthesizeAvContainers(docs, "doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val rates = Seq(8000, 16000, 22050, 44100, 48000)
    out.foreach { case (id, r) =>
      if (id % 2 == 0) {
        assert(r.getString(1) == "wav")
        assert(r.getInt(2) == 1 + ((id % 4) / 2).toInt, s"channels for $id")
        assert(r.getInt(3) == rates((id % 5).toInt), s"rate for $id")
        assert(r.getInt(4) == (16 - 8 * ((id % 8) / 4)).toInt, s"bits for $id")
      } else {
        assert(r.getString(1) == "mp4" && r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
        val timescale = Seq(600L, 1000L, 1400L)((id % 3).toInt)
        assert(r.getLong(5) == (id * 37 % 100000) * 1000 / timescale, s"duration for $id")
      }
    }
    // a WAV whose fmt chunk sits behind a LIST chunk exercises the walk
    assert(out.keys.exists(id => id % 4 == 0))
  }

  test("decodeAvHeaders flags non-AV payloads as unknown") {
    val junk = spark.createDataFrame(Seq((1L, "just text".getBytes("UTF-8"))))
      .toDF("media_id", "payload")
    val r = Multimodal.decodeAvHeaders(junk).collect().head
    assert(r.getString(1) == "unknown" && r.isNullAt(2) && r.isNullAt(5))
  }

  test("frameSample chunks reassemble the payload") {
    val framed = Multimodal.frameSample(media, 4)
      .select($"media_id", $"payload", concat($"frames"(0), $"frames"(1), $"frames"(2), $"frames"(3)).as("reassembled"))
      .where(length($"payload") >= 4)
    assert(framed.where($"payload" =!= $"reassembled").count() == 0)
  }
}
