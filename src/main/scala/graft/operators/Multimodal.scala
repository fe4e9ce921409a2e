package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, processed in
  * partition-sized batches.
  *
  * The codec integration point (a typed `Dataset.mapPartitions` over
  * `MediaRecord`s — per partition, streaming, no driver involvement) is
  * exercised in MultimodalSpec with a deterministic fake decode kept in
  * TEST scope; this container has no image/audio libraries, and the
  * library itself ships only what needs no codec: real PNG/GIF/JPEG and
  * WAV/MP4 HEADER decode as codegen'd byte arithmetic, resize metadata,
  * and frame sampling.
  */
object Multimodal {

  /** Typed media record: id + opaque payload + container metadata — the
    * input contract of a partition-local codec step (see MultimodalSpec's
    * decodeStub for the mapPartitions shape a JNI/codec call drops into).
    */
  final case class MediaRecord(media_id: Long, format: String, payload: Array[Byte])

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

  // ---------------------------------------------------------------------
  // Real header decode: PNG IHDR / GIF logical screen / JPEG SOF0 parsed
  // with pure byte arithmetic on the binary column (substr + hex + conv,
  // all codegen'd built-ins — no UDF, no codec library). This is the part
  // of image decode that needs no codec at all, and it is what a catalog
  // pass over 100 TB of crawled media actually runs first: dimensions,
  // channel count and container type straight from the leading bytes.
  // ---------------------------------------------------------------------

  private def u8(c: Column): Column = unhex(lpad(hex(c), 2, "0"))
  private def be32(c: Column): Column = unhex(lpad(hex(c), 8, "0"))
  private def be16(c: Column): Column = unhex(lpad(hex(c), 4, "0"))
  private def le16(c: Column): Column =
    unhex(concat(lpad(hex(pmod(c, lit(256))), 2, "0"), lpad(hex((c / 256).cast("int")), 2, "0")))

  /** Read `len` bytes at 1-based `pos` (literal or column) as a big-endian
    * unsigned int. conv(hex(bytes), 16, 10) keeps the whole read inside
    * whole-stage codegen.
    */
  private def beInt(p: Column, pos: Column, len: Int): Column =
    conv(hex(p.substr(pos, lit(len))), 16, 10).cast("int")
  private def leInt16(p: Column, pos: Int): Column =
    (beInt(p, lit(pos), 1) + beInt(p, lit(pos + 1), 1) * 256).cast("int")

  /** Synthesize VALID container bytes (PNG / GIF89a / baseline JPEG) so the
    * decoder has real headers to parse: fixture stand-in for binary ingest,
    * with dimensions derived deterministically from the id so an external
    * oracle can verify the encode→parse round trip exactly.
    * PNG: 8-byte signature + IHDR chunk (len, type, 13-byte data, CRC).
    * GIF: "GIF89a" + little-endian logical-screen width/height + packed.
    * JPEG: SOI + 16-byte APP0/JFIF + SOF0 (precision, BE height/width, 3
    * components) — the SOF0 sits after a variable-length APP0 so the
    * decoder must genuinely walk segments to find it.
    */
  def synthesizeContainers(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol).cast("long")
    val w = (lit(64) + pmod(id, lit(512))).cast("int")
    val h = (lit(64) + pmod(id * 7, lit(512))).cast("int")
    val body = col(textCol).cast("binary")
    val pngColorType = when(pmod(id, lit(2)) === 0, lit(2)).otherwise(lit(0)) // truecolor | greyscale
    val png = concat(
      unhex(lit("89504E470D0A1A0A")),              // signature
      unhex(lit("0000000D")), unhex(lit("49484452")), // IHDR length + type
      be32(w), be32(h),
      unhex(lit("08")), u8(pngColorType),           // bit depth, color type
      unhex(lit("000000")),                          // compression, filter, interlace
      unhex(lit("00000000")),                        // CRC (not validated here)
      body)
    val gif = concat(
      unhex(lit("474946383961")),                    // "GIF89a"
      le16(w), le16(h),
      unhex(lit("F70000")),                          // packed fields, bg color, aspect
      body)
    val jpeg = concat(
      unhex(lit("FFD8")),                            // SOI
      unhex(lit("FFE000104A46494600010100004800480000")), // APP0/JFIF, len 0x10
      unhex(lit("FFC0001108")),                      // SOF0, len 0x11, precision 8
      be16(h), be16(w),
      unhex(lit("03012200021101031101")),            // 3 components
      body)
    df.select(
      id.as("media_id"),
      when(pmod(id, lit(3)) === 0, png).when(pmod(id, lit(3)) === 1, gif).otherwise(jpeg).as("payload"))
  }

  /** Number of segment-walk steps the JPEG branch unrolls: enough for SOI +
    * APPn/COM runs before SOF0 in typical files; headers further in resolve
    * to NULL (exactly what a bounded production scanner does).
    */
  private val JpegWalkDepth = 6

  /** Decode container headers from the leading bytes of `payload`:
    * format sniffed from the magic number, dimensions/channels parsed
    * per-format, JPEG via a real bounded segment walk to SOF0/SOF2.
    * Pure codegen'd column arithmetic — scales as a projection.
    *
    * The JPEG walk offsets are staged as named intermediate COLUMNS for
    * the same reason [[decodeAvHeaders]] stages its chunk/box walks:
    * each step references its predecessor twice (advance + LE size
    * read), so expression-chaining copies every step's tree into the
    * next — ~2^depth growth that Catalyst then re-analyzes inside the
    * sofPos fold and again inside each of width/height/channels. The
    * staged offsets are gated on the JPEG magic so non-JPEG rows
    * null-propagate out of the walk instead of parsing garbage
    * (matching the old per-row profile, where the walk sat under
    * `when(fmt === "jpeg", ...)`).
    */
  def decodeHeaders(media: DataFrame): DataFrame = {
    val p = col("payload")
    val fmt = when(hex(p.substr(lit(1), lit(8))) === "89504E470D0A1A0A", "png")
      .when(hex(p.substr(lit(1), lit(6))).isin("474946383961", "474946383761"), "gif")
      .when(hex(p.substr(lit(1), lit(2))) === "FFD8", "jpeg")
      .otherwise("unknown")

    // PNG IHDR: width/height BE at 17/21, bit depth 25, color type 26
    val pngW = beInt(p, lit(17), 4)
    val pngH = beInt(p, lit(21), 4)
    val pngChannels = {
      val ct = beInt(p, lit(26), 1)
      when(ct === 0, 1).when(ct === 2, 3).when(ct === 3, 1)
        .when(ct === 4, 2).when(ct === 6, 4)
    }

    // GIF logical screen: LE u16 at 7/9
    val gifW = leInt16(p, 7)
    val gifH = leInt16(p, 9)

    // JPEG: walk segments from offset 3 (after SOI) until an SOF marker.
    // Each non-SOF segment is FF <marker> <len BE16 incl itself>; the next
    // segment starts at pos + 2 + len. Unrolled JpegWalkDepth times into
    // staged columns (see scaladoc), handles any APPn/COM run.
    val sofMarkers = Seq("FFC0", "FFC1", "FFC2") // baseline, ext. sequential, progressive
    def isSof(pos: Column): Column = hex(p.substr(pos, lit(2))).isin(sofMarkers: _*)
    var staged = media.withColumn("__jp0", when(fmt === "jpeg", lit(3)).cast("int"))
    (0 until JpegWalkDepth - 1).foreach { i =>
      val pos = col(s"__jp$i")
      staged = staged.withColumn(s"__jp${i + 1}", (pos + lit(2) + beInt(p, pos + 2, 2)).cast("int"))
    }
    val offsets = (0 until JpegWalkDepth).map(i => col(s"__jp$i"))
    val sofPos = offsets.reverse.foldLeft(lit(null).cast("int")) { (acc, pos) =>
      when(isSof(pos), pos.cast("int")).otherwise(acc)
    }
    staged = staged.withColumn("__sof", sofPos)
    val jpegH = beInt(p, col("__sof") + 5, 2)
    val jpegW = beInt(p, col("__sof") + 7, 2)
    val jpegChannels = beInt(p, col("__sof") + 9, 1)

    staged.select(
      col("media_id"),
      fmt.as("format"),
      when(fmt === "png", pngW).when(fmt === "gif", gifW).when(fmt === "jpeg", jpegW).as("width"),
      when(fmt === "png", pngH).when(fmt === "gif", gifH).when(fmt === "jpeg", jpegH).as("height"),
      when(fmt === "png", pngChannels).when(fmt === "gif", 3).when(fmt === "jpeg", jpegChannels).as("channels"),
      length(p).cast("long").as("size_bytes"))
  }

  // ---------------------------------------------------------------------
  // Audio/video containers: WAV (RIFF chunk walk to `fmt `/`data`) and
  // MP4 (box walk to moov/mvhd) — the same no-codec header pass, extended
  // to the audio/video side of a crawled-media catalog: channel count,
  // sample rate, bit depth and duration straight from the leading bytes.
  // ---------------------------------------------------------------------

  private def le32(c: Column): Column =
    unhex(concat(
      lpad(hex(pmod(c, lit(256))), 2, "0"),
      lpad(hex(pmod((c / 256).cast("long"), lit(256))), 2, "0"),
      lpad(hex(pmod((c / 65536).cast("long"), lit(256))), 2, "0"),
      lpad(hex(pmod((c / 16777216).cast("long"), lit(256))), 2, "0")))

  /** Little-endian reads at a column-valued 1-based position. */
  private def leIntC(p: Column, pos: Column, len: Int): Column =
    (0 until len).map(i => beInt(p, pos + lit(i), 1).cast("long") * (1L << (8 * i)))
      .reduce(_ + _)

  /** Synthesize VALID audio/video container bytes: WAV (RIFF/WAVE with a
    * genuine chunk list — ids divisible by 4 carry a LIST chunk BEFORE
    * `fmt `, so the decoder must really walk) and MP4 (ftyp + optional
    * free box + moov/mvhd, version 0). All parameters derive
    * deterministically from the id so an external oracle can verify the
    * encode→parse round trip exactly.
    */
  def synthesizeAvContainers(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol).cast("long")
    val body = col(textCol).cast("binary")
    val bodyLen = length(body).cast("long")

    // WAV parameters from the id (WAV ids are even, so derive channel and
    // bit-depth variety from id%4 / id%8, not id%2)
    val ch = (lit(1) + (pmod(id, lit(4)) / 2).cast("int")).cast("int")
    val rate = element_at(
      array(lit(8000), lit(16000), lit(22050), lit(44100), lit(48000)),
      (pmod(id, lit(5)) + 1).cast("int")).cast("int")
    val bits = (lit(16) - lit(8) * (pmod(id, lit(8)) / 4).cast("int")).cast("int")
    val blockAlign = (ch * bits / lit(8)).cast("int")
    val byteRate = (rate.cast("long") * blockAlign).cast("long")
    val listChunk = concat(unhex(lit("4C495354")), le32(lit(4)), unhex(lit("494E464F"))) // LIST size=4 "INFO"
    val hasList = pmod(id, lit(4)) === 0
    val fmtChunk = concat(
      unhex(lit("666D7420")), le32(lit(16)),          // "fmt " size 16 (PCM)
      le16(lit(1)), le16(ch),                          // audio format, channels
      le32(rate), le32(byteRate),
      le16(blockAlign), le16(bits))
    val dataChunk = concat(unhex(lit("64617461")), le32(bodyLen), body)
    val riffSize = lit(4) + when(hasList, 12).otherwise(0) + lit(24) + lit(8) + bodyLen
    val wav = concat(
      unhex(lit("52494646")), le32(riffSize), unhex(lit("57415645")), // RIFF size WAVE
      when(hasList, listChunk).otherwise(lit(Array.emptyByteArray)),
      fmtChunk, dataChunk)

    // MP4 parameters from the id
    val timescale = element_at(
      array(lit(600), lit(1000), lit(1400)),
      (pmod(id, lit(3)) + 1).cast("int")).cast("long")
    val duration = pmod(id * 37, lit(100000)).cast("long")
    val ftyp = concat(be32(lit(16)), unhex(lit("66747970")), unhex(lit("69736F6D")), be32(lit(0)))
    val freeBox = concat(be32(lit(16)), unhex(lit("66726565")), unhex(lit("0000000000000000")))
    val mvhd = concat(
      be32(lit(108)), unhex(lit("6D766864")),          // size, "mvhd"
      unhex(lit("00000000")),                           // version 0 + flags
      be32(lit(0)), be32(lit(0)),                       // creation, modification
      be32(timescale.cast("int")), be32(duration.cast("int")),
      unhex(lit("0" * 160)))                            // rate..next_track_id (80 zero bytes)
    val moov = concat(be32(lit(116)), unhex(lit("6D6F6F76")), mvhd)
    val mp4 = concat(ftyp, when(pmod(id, lit(3)) === 0, freeBox).otherwise(lit(Array.emptyByteArray)), moov, body)

    df.select(
      id.as("media_id"),
      when(pmod(id, lit(2)) === 0, wav).otherwise(mp4).as("payload"))
  }

  /** Chunk/box-walk steps unrolled for the WAV and MP4 header scans. */
  private val AvWalkDepth = 4

  /** Decode audio/video container headers: WAV via a real RIFF chunk walk
    * to `fmt ` (channels / sample rate / bit depth) and `data` (duration
    * from byte rate), MP4 via a box walk to moov then mvhd (duration from
    * timescale). Pure codegen'd column arithmetic — scales as a
    * projection, like [[decodeHeaders]].
    *
    * Each walk offset is materialized as an intermediate COLUMN, not
    * chained expressions: the LE chunk-size read references its offset
    * several times, so expression-chaining the walk (as the single-read
    * JPEG walk safely does) would copy each step's tree ~9× into the
    * next — exponential in walk depth. Named columns keep the tree
    * linear; CollapseProject leaves multiply-referenced non-cheap
    * aliases in place.
    */
  def decodeAvHeaders(media: DataFrame): DataFrame = {
    val p = col("payload")
    val fmt = when(
      hex(p.substr(lit(1), lit(4))) === "52494646" &&
        hex(p.substr(lit(9), lit(4))) === "57415645", "wav")
      .when(hex(p.substr(lit(5), lit(4))) === "66747970", "mp4")
      .otherwise("unknown")

    // WAV: chunks from byte 13; each is id(4) + LE32 size + data,
    // padded to even length (RIFF rule — honored even though the
    // synthesized chunks are all even-sized)
    var df = media.withColumn("__wp0", lit(13L))
    (0 until AvWalkDepth - 1).foreach { i =>
      val sz = leIntC(p, col(s"__wp$i") + 4, 4)
      df = df.withColumn(s"__wsz$i", sz)
      df = df.withColumn(s"__wp${i + 1}",
        col(s"__wp$i") + lit(8L) + col(s"__wsz$i") + pmod(col(s"__wsz$i"), lit(2L)))
    }
    val wavOffsets = (0 until AvWalkDepth).map(i => col(s"__wp$i"))
    def findChunk(idHex: String): Column =
      wavOffsets.reverse.foldLeft(lit(null).cast("long")) { (acc, pos) =>
        when(hex(p.substr(pos, lit(4))) === idHex, pos.cast("long")).otherwise(acc)
      }
    df = df.withColumn("__fmtPos", findChunk("666D7420"))
    df = df.withColumn("__dataPos", findChunk("64617461"))
    val fmtPos = col("__fmtPos")
    val wavCh = leIntC(p, fmtPos + 10, 2).cast("int")
    val wavRate = leIntC(p, fmtPos + 12, 4).cast("int")
    val wavByteRate = leIntC(p, fmtPos + 16, 4)
    val wavBits = leIntC(p, fmtPos + 22, 2).cast("int")
    val wavDurMs = (leIntC(p, col("__dataPos") + 4, 4) * 1000L / wavByteRate).cast("long")

    // MP4: top-level boxes are BE32 size + type; walk to moov, then its
    // first children to mvhd (bounded, like the JPEG segment walk)
    df = df.withColumn("__bp0", lit(1L))
    (0 until AvWalkDepth - 1).foreach { i =>
      df = df.withColumn(s"__bp${i + 1}", col(s"__bp$i") + beInt(p, col(s"__bp$i"), 4).cast("long"))
    }
    def findBox(offsets: Seq[Column], typeHex: String): Column =
      offsets.reverse.foldLeft(lit(null).cast("long")) { (acc, pos) =>
        when(hex(p.substr(pos + 4, lit(4))) === typeHex, pos.cast("long")).otherwise(acc)
      }
    df = df.withColumn("__moov", findBox((0 until AvWalkDepth).map(i => col(s"__bp$i")), "6D6F6F76"))
    df = df.withColumn("__cp0", col("__moov") + 8L)
    (0 until AvWalkDepth - 1).foreach { i =>
      df = df.withColumn(s"__cp${i + 1}", col(s"__cp$i") + beInt(p, col(s"__cp$i"), 4).cast("long"))
    }
    df = df.withColumn("__mvhd", findBox((0 until AvWalkDepth).map(i => col(s"__cp$i")), "6D766864"))
    val timescale = beInt(p, col("__mvhd") + 20, 4).cast("long")
    val mp4Duration = beInt(p, col("__mvhd") + 24, 4).cast("long")
    val mp4DurMs = (mp4Duration * 1000L / timescale).cast("long")

    df.select(
      col("media_id"),
      fmt.as("format"),
      when(fmt === "wav", wavCh).as("channels"),
      when(fmt === "wav", wavRate).as("sample_rate"),
      when(fmt === "wav", wavBits).as("bits_per_sample"),
      when(fmt === "wav", wavDurMs).when(fmt === "mp4", mp4DurMs).as("duration_ms"),
      length(p).cast("long").as("size_bytes"))
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
