package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-seeding hygiene: the driver regenerates `/root/testdata`
  * between rounds and has already changed `events.ts`'s physical type
  * once (int64 TIMESTAMP(NANOS) → timestamp[us]), which silently took
  * out every gate that seeds the in-memory store. These specs pin
  * `GraftTables.eventsWithMicros` to decode every plausible physical
  * type to the same epoch-µs value, so the next regeneration cannot
  * re-break 40+ gates.
  */
class GraftTablesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // one event at a fixed, sub-second-bearing epoch microsecond instant
  private val BaseUs = 1600000000123456L

  private def writeVariant(dir: String, tsCol: org.apache.spark.sql.Column): Unit =
    spark
      .range(1)
      .select(
        lit(7L).as("event_id"),
        tsCol.as("ts"),
        lit(42L).cast("int").as("user_id"), // narrower int: getAs must not care
        lit("view").as("event_type"),
        lit(1.5f).cast("float").as("value"), // narrower float: same
        lit("{}").as("props"))
      .write
      .mode("overwrite")
      .parquet(dir)

  private def decodedTs(dir: String): (Long, Long, String, Double) = {
    val rows = GraftTables.eventsWithMicros(spark, dir)
    assert(rows.length == 1)
    val r = rows.head
    (r.getAs[Long]("ts_us"), r.getAs[Long]("user_id"),
      r.getAs[String]("event_type"), r.getAs[Double]("value"))
  }

  test("eventsWithMicros decodes int64 nanos, timestamp[us] and timestamp_ntz[us] to the same epoch micros") {
    val root = java.nio.file.Files.createTempDirectory("graft-tsvariants").toString

    // 1) plain int64 nanoseconds (the shape the legacy TIMESTAMP(NANOS)
    //    fixture takes once nanosAsLong strips its annotation)
    writeVariant(s"$root/nanos", lit(BaseUs * 1000L))

    // 2) timestamp[us], isAdjustedToUTC=true (Spark's TimestampType with
    //    TIMESTAMP_MICROS output)
    val prevOut = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try writeVariant(s"$root/tsutc", timestamp_micros(lit(BaseUs)))
    finally prevOut match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None    => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }

    // 3) timestamp[us] naive (isAdjustedToUTC=false — what a pandas/
    //    pyarrow generator writes; Spark reads it as TIMESTAMP_NTZ)
    writeVariant(s"$root/tsntz",
      timestamp_micros(lit(BaseUs)).cast(org.apache.spark.sql.types.TimestampNTZType))

    // 4) timestamp[ms] — millis-precision generators; sub-ms digits drop
    //    at write, so use the ms-truncated instant for this variant only
    val prevMs = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
    try writeVariant(s"$root/tsms", timestamp_micros(lit(BaseUs - BaseUs % 1000)))
    finally prevMs match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None    => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
    val (msTs, _, _, _) = decodedTs(s"$root/tsms")
    assert(msTs == BaseUs - BaseUs % 1000, s"timestamp[ms] decoded $msTs")

    for (variant <- Seq("nanos", "tsutc", "tsntz")) {
      val (tsUs, userId, eventType, value) = decodedTs(s"$root/$variant")
      assert(tsUs == BaseUs, s"variant=$variant decoded ts_us=$tsUs, want $BaseUs")
      assert(userId == 42L && eventType == "view" && value == 1.5d,
        s"variant=$variant canonical casts broke: ($userId, $eventType, $value)")
    }
  }

  test("eventsWithMicros on the driver's current fixture matches the oracle's epoch_us reading") {
    // ties the decode to the real testdata: every ts must be a sane
    // epoch-µs value (year 2000..2100), and the count must match the file
    val rows = GraftTables.eventsWithMicros(spark, "/root/testdata/sf0.001/events.parquet")
    val n = spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
    assert(rows.length.toLong == n)
    val (lo, hi) = (946684800000000L, 4102444800000000L) // 2000-01-01 .. 2100-01-01, µs
    assert(rows.forall { r => val t = r.getAs[Long]("ts_us"); t >= lo && t <= hi },
      "decoded ts_us outside a plausible epoch-microsecond range — wrong unit branch?")
  }

  test("eventsWithMicros fails loudly on a wrong-unit int64 fixture instead of seeding 1000x-off timestamps") {
    // unannotated int64 carrying MICROseconds: the nanos branch would
    // silently decode it 1000x too small — the guard must throw
    val dir = java.nio.file.Files.createTempDirectory("graft-wrongunit").toString
    writeVariant(s"$dir/usAsLong", lit(BaseUs))
    val e = intercept[IllegalArgumentException] {
      GraftTables.eventsWithMicros(spark, s"$dir/usAsLong")
    }
    assert(e.getMessage.contains("outside 2000..2100"), e.getMessage)
  }

  test("eventsWithMicros int64-nanos branch uses floor division for pre-epoch instants") {
    // -1 ns is in 1969, so the plausibility guard rejects it — but the
    // failure message carries the decoded value, which must be the
    // floor (-1), not the toward-zero truncation (0). Pins the ADVICE
    // fix without weakening the guard.
    val dir = java.nio.file.Files.createTempDirectory("graft-floordiv").toString
    writeVariant(s"$dir/neg", lit(-1L))
    val e = intercept[IllegalArgumentException] {
      GraftTables.eventsWithMicros(spark, s"$dir/neg")
    }
    assert(e.getMessage.contains("ts_us=-1 "), e.getMessage)
  }

  test("ensure seeds a full synthesized fixture dir whose events.ts is timestamp[us]") {
    // end-to-end: regenerate a tiny fixture dir in the timestamp[us]
    // shape the driver now produces and run the real seeding path on it
    val dir = java.nio.file.Files.createTempDirectory("graft-fixdir").toString
    val sf = "/root/testdata/sf0.001"
    for (t <- Seq("nation", "orders", "documents"))
      spark.read.parquet(s"$sf/$t.parquet").write.parquet(s"$dir/$t.parquet")
    val decoded = GraftTables.eventsWithMicros(spark, s"$sf/events.parquet")
    val events = spark.createDataFrame(
      spark.sparkContext.parallelize(decoded.toIndexedSeq, 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("ts_us", org.apache.spark.sql.types.LongType))))
    events
      .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("event_type"), col("value"))
      .write.parquet(s"$dir/events.parquet")

    GraftTables.ensure(spark, dir)
    val gotVersions = GraftTables.eventsAllVersions(spark, dir)
      .where(col("u_key").between("000000", "999989"))
      .count()
    val wantVersions = events.select(col("user_id"), col("ts_us")).distinct().count()
    assert(gotVersions == wantVersions,
      s"connector read back $gotVersions version rows, seeded $wantVersions distinct (user, ts) cells")
  }
}
