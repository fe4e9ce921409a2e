package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

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
    val d1 = Multimodal.decodeStub(spark, media).collect().sortBy(_.media_id)
    val d2 = Multimodal.decodeStub(spark, media).collect().sortBy(_.media_id)
    assert(d1.length == docs.count())
    assert(d1.map(_.width).toSeq == d2.map(_.width).toSeq)
    assert(d1.forall(m => m.width >= 64 && m.height >= 64 && m.channels >= 1 && m.features.length == 8))
  }

  test("decoded size_bytes equals payload length") {
    val sizes = Multimodal.decodeStub(spark, media)
      .select($"media_id", $"size_bytes")
      .join(media.select($"media_id", length($"payload").cast("long").as("plen")), "media_id")
      .where($"size_bytes" =!= $"plen")
    assert(sizes.count() == 0)
  }

  test("resizeMeta caps the long side at maxDim preserving aspect ratio") {
    val decoded = Multimodal.decodeStub(spark, media).toDF()
    val resized = Multimodal.resizeMeta(decoded, maxDim = 256)
    val bad = resized.where(
      greatest($"resized_width", $"resized_height") > 256 ||
        ($"width" <= 256 && $"height" <= 256 &&
          ($"resized_width" =!= $"width" || $"resized_height" =!= $"height")))
    assert(bad.count() == 0)
  }

  test("frameSample chunks reassemble the payload") {
    val framed = Multimodal.frameSample(media, 4)
      .select($"media_id", $"payload", concat($"frames"(0), $"frames"(1), $"frames"(2), $"frames"(3)).as("reassembled"))
      .where(length($"payload") >= 4)
    assert(framed.where($"payload" =!= $"reassembled").count() == 0)
  }
}
