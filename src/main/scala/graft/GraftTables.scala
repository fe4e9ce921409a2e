package graft

import graft.model.{BtCell, CellCodec}
import graft.store.{BigtableStores, InMemoryBigtable}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Seeds the in-memory Bigtable store from the driver's parquet test
  * tables (TESTDATA.md) so connector-level queries are checkable
  * against a DuckDB oracle running on the same parquet.
  *
  * Key layouts (FIXTURES.md §2 convention; reference type system is
  * {Int64 big-endian, Utf8} with floats stored as strings,
  * datasource.rs:188-189, execute_plan.rs:286-302):
  *
  *   - `nation`  → key `lpad(n_nationkey, 4, '0')`; quals n_name (utf8),
  *     n_regionkey (int64)
  *   - `orders`  → composite key `o_orderstatus # o_orderpriority #
  *     lpad(o_orderkey, 10, '0')`; quals o_custkey (int64),
  *     o_totalprice (double-as-string)
  *   - `events`  → key `lpad(user_id, 6, '0')`; quals event_type (utf8),
  *     value (double-as-string); cell timestamp = event ts in µs —
  *     a genuinely multi-version table (one version per event).
  *
  * Seeding collects the parquet to the driver: this populates the test
  * emulator only (a real deployment reads from the Bigtable service,
  * which is seeded out-of-band exactly as the reference does it via
  * scripts, insert_rows.py).
  */
object GraftTables {
  private val seeded = scala.collection.mutable.Set.empty[String]
  val FixedTs = 1600000000000000L // 2020-09-13T12:26:40Z, µs
  /** Stream step used by the gated streaming queries; the second flush
    * sentinel sits exactly one step after the first so it forms its own
    * final micro-batch.
    */
  val FlushStepMicros = 8000000000000L

  def storeName(sfDir: String): String = s"graft-store-$sfDir"

  def ensure(spark: SparkSession, sfDir: String): Unit = synchronized {
    if (seeded(sfDir)) return
    val name = storeName(sfDir)
    if (!BigtableStores.contains(name)) {
      val b = new InMemoryBigtable.Builder

      spark.read.parquet(s"$sfDir/nation.parquet").collect().foreach { r =>
        val key = f"${r.getAs[Int]("n_nationkey")}%04d"
        b.put("nation", key, BtCell("f", "n_name", FixedTs, CellCodec.encodeString(r.getAs[String]("n_name"))))
        b.put("nation", key, BtCell("f", "n_regionkey", FixedTs, CellCodec.encodeLong(r.getAs[Int]("n_regionkey").toLong)))
        // multi-family variant: same data, one family per qualifier
        b.put("nation_mf", key, BtCell("meta", "n_name", FixedTs, CellCodec.encodeString(r.getAs[String]("n_name"))))
        b.put("nation_mf", key, BtCell("stats", "n_regionkey", FixedTs, CellCodec.encodeLong(r.getAs[Int]("n_regionkey").toLong)))
      }

      spark.read.parquet(s"$sfDir/orders.parquet").collect().foreach { r =>
        val key = s"${r.getAs[String]("o_orderstatus")}#${r.getAs[String]("o_orderpriority")}#" +
          f"${r.getAs[Long]("o_orderkey")}%010d"
        b.put("orders", key, BtCell("f", "o_custkey", FixedTs, CellCodec.encodeLong(r.getAs[Long]("o_custkey"))))
        b.put("orders", key, BtCell("f", "o_totalprice", FixedTs,
          CellCodec.encodeString(r.getAs[Double]("o_totalprice").toString)))
      }

      // events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
      // reader rejects; read it as raw nanos and truncate to Bigtable's
      // microsecond cell-timestamp resolution.
      val prevNanos = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      try {
        var maxMicros = 0L
        spark.read.parquet(s"$sfDir/events.parquet").collect().foreach { r =>
          val key = f"${r.getAs[Long]("user_id")}%06d"
          val micros = math.floorDiv(r.getAs[Long]("ts"), 1000L)
          maxMicros = math.max(maxMicros, micros)
          b.put("events", key, BtCell("f", "event_type", micros, CellCodec.encodeString(r.getAs[String]("event_type"))))
          b.put("events", key, BtCell("f", "value", micros, CellCodec.encodeString(r.getAs[Double]("value").toString)))
          // flush variant: same data + two watermark-advancing sentinels,
          // for streaming operators that must drain event-time state at
          // end-of-replay (stream_sessionize)
          b.put("events_flush", key, BtCell("f", "event_type", micros, CellCodec.encodeString(r.getAs[String]("event_type"))))
          b.put("events_flush", key, BtCell("f", "value", micros, CellCodec.encodeString(r.getAs[Double]("value").toString)))
        }
        // Sentinels (user keys >= 999990, filtered out of results): the
        // first advances the watermark past every real session's timeout
        // (end + gap); the second lands one stream step later so one more
        // batch runs and the event-time timers actually fire.
        Seq(("999991", maxMicros + 3600000000L), ("999992", maxMicros + 3600000000L + FlushStepMicros))
          .foreach { case (key, ts) =>
            b.put("events_flush", key, BtCell("f", "event_type", ts, CellCodec.encodeString("flush")))
            b.put("events_flush", key, BtCell("f", "value", ts, CellCodec.encodeString("0.0")))
          }
      } finally {
        prevNanos match {
          case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
          case None    => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        }
      }

      // documents as a change stream: one cell per doc, timestamps spread
      // over 8 one-second slots so the micro-batch replay steps through 8
      // arrival batches at any scale factor (stream_doc_near_dup)
      spark.read.parquet(s"$sfDir/documents.parquet").collect().foreach { r =>
        val docId = r.getAs[Long]("doc_id")
        val key = f"$docId%08d"
        val ts = FixedTs + (docId % 8) * 1000000L
        b.put("documents", key, BtCell("f", "text", ts, CellCodec.encodeString(r.getAs[String]("text"))))
      }

      BigtableStores.register(name, b.build())
    }
    seeded += sfDir
  }

  private def reader(spark: SparkSession, sfDir: String) = {
    ensure(spark, sfDir)
    spark.read.format("bigtable").option("store", storeName(sfDir))
  }

  /** nation over the connector: key n_key = lpad(n_nationkey, 4, '0'). */
  def nation(spark: SparkSession, sfDir: String): DataFrame =
    reader(spark, sfDir)
      .option("table", "nation")
      .option("columnFamily", "f")
      .option("partitionCols", "n_key")
      .option("qualifiers", "n_name:string,n_regionkey:long")
      .load()

  /** nation split across two column families (multi-family extension):
    * n_name in `meta`, n_regionkey in `stats`.
    */
  def nationMultiFamily(spark: SparkSession, sfDir: String): DataFrame =
    reader(spark, sfDir)
      .option("table", "nation_mf")
      .option("columnFamily", "meta")
      .option("partitionCols", "n_key")
      .option("qualifiers", "meta:n_name:string,stats:n_regionkey:long")
      .load()

  /** orders over the connector: composite (o_orderstatus, o_orderpriority, o_key). */
  def orders(spark: SparkSession, sfDir: String): DataFrame =
    reader(spark, sfDir)
      .option("table", "orders")
      .option("columnFamily", "f")
      .option("partitionCols", "o_orderstatus,o_orderpriority,o_key")
      .option("separator", "#")
      .option("qualifiers", "o_custkey:long,o_totalprice:double")
      .load()

  /** events over the connector, all cell versions: one row per (u_key, ts). */
  def eventsAllVersions(spark: SparkSession, sfDir: String): DataFrame =
    reader(spark, sfDir)
      .option("table", "events")
      .option("columnFamily", "f")
      .option("partitionCols", "u_key")
      .option("qualifiers", "event_type:string,value:double")
      .option("onlyReadLatest", "false")
      .load()

  /** events over the connector, latest version per column only (A11). */
  def eventsLatest(spark: SparkSession, sfDir: String): DataFrame =
    reader(spark, sfDir)
      .option("table", "events")
      .option("columnFamily", "f")
      .option("partitionCols", "u_key")
      .option("qualifiers", "event_type:string,value:double")
      .option("onlyReadLatest", "true")
      .load()
}
