package graft.connector

import graft.{GraftTables, SparkTestSession}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Columnar (vectorized) read path: `vectorized=true` must produce
  * byte-identical results to the row path across every table shape —
  * single/composite keys, multi-version reads, NULL cells, all three
  * qualifier types — while the plan consumes ColumnarBatches through a
  * vectorized ColumnarToRow (the parquet-reader shape).
  */
class VectorizedReadSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("nation (single key, string+long quals): identical in both modes, plan is columnar") {
    val q = (extra: Map[String, String]) =>
      GraftTables.nation(spark, sf, extra)
        .where(col("n_key").between("0000", "9999"))
    val row = q(Map.empty)
    val vec = q(Map("vectorized" -> "true"))
    assert(sortedRows(vec) == sortedRows(row))
    val plan = vec.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"), plan)
    assert(!row.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
  }

  test("AUTO read-path: columnar past the volume threshold, row below, pin wins") {
    // nation at sf0.001 is 25 rows: below the default 32768 → row path
    val auto = GraftTables.nation(spark, sf)
      .where(col("n_key").between("0000", "9999"))
    assert(!auto.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    // force the threshold under the table size → AUTO picks columnar
    val autoLow = GraftTables.nation(spark, sf, Map("vectorizedAutoRows" -> "10"))
      .where(col("n_key").between("0000", "9999"))
    assert(autoLow.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      autoLow.queryExecution.executedPlan.toString)
    assert(sortedRows(autoLow) == sortedRows(auto))
    // an explicit pin beats AUTO in both directions
    val pinnedOff = GraftTables.nation(spark, sf,
      Map("vectorizedAutoRows" -> "10", "vectorized" -> "false"))
      .where(col("n_key").between("0000", "9999"))
    assert(!pinnedOff.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    // a RANGE-pruned scan estimates only its pruned volume: the same
    // low threshold on a point lookup stays on the row path
    val point = GraftTables.nation(spark, sf, Map("vectorizedAutoRows" -> "10"))
      .where(col("n_key") === "0003")
    assert(!point.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      point.queryExecution.executedPlan.toString)
  }

  test("orders (composite key, double qual): identical in both modes") {
    val q = (extra: Map[String, String]) =>
      GraftTables.orders(spark, sf, extra)
        .where(col("o_orderstatus") === "O" &&
          col("o_orderpriority").isin("1-URGENT", "3-MEDIUM") &&
          col("o_key").between("0000000000", "9999999999"))
    assert(sortedRows(q(Map("vectorized" -> "true"))) == sortedRows(q(Map.empty)))
  }

  test("versioned events (onlyReadLatest=false, _timestamp col): identical in both modes") {
    def q(vec: Boolean) = {
      GraftTables.ensure(spark, sf)
      spark.read.format("bigtable")
        .option("store", GraftTables.storeName(sf))
        .option("table", "events")
        .option("columnFamily", "f")
        .option("partitionCols", "u_key")
        .option("qualifiers", "event_type:string,value:double")
        .option("onlyReadLatest", "false")
        .option("vectorized", vec.toString)
        .load()
        .where(col("u_key").between("000000", "000199"))
    }
    val row = q(false)
    val vec = q(true)
    assert(sortedRows(vec) == sortedRows(row))
    assert(row.count() > 0)
  }

  test("tiny batch size exercises multi-batch emission with identical results") {
    val q = (extra: Map[String, String]) =>
      GraftTables.nation(spark, sf, extra).where(col("n_key").between("0000", "9999"))
    val vec = q(Map("vectorized" -> "true", "vectorizedBatchSize" -> "3"))
    assert(sortedRows(vec) == sortedRows(q(Map.empty)))
    assert(vec.count() == 25)
  }

  test("limit pushdown caps the columnar reader too") {
    val vec = GraftTables.nation(spark, sf, Map("vectorized" -> "true", "vectorizedBatchSize" -> "4"))
      .where(col("n_key").between("0000", "9999"))
      .limit(7)
    assert(vec.count() == 7)
  }

  test("NULL cells surface as SQL NULL in the columnar path") {
    import graft.model.{BtCell, CellCodec}
    val b = new graft.store.InMemoryBigtable.Builder
    b.put("tn", "k1", BtCell("f", "a", 1L, CellCodec.encodeString("x")))
    b.put("tn", "k2", BtCell("f", "b", 1L, CellCodec.encodeLong(9L)))
    graft.store.BigtableStores.register("vec-nulls", b.build())
    val df = spark.read.format("bigtable")
      .option("store", "vec-nulls").option("table", "tn")
      .option("columnFamily", "f").option("partitionCols", "_row_key")
      .option("qualifiers", "a:string,b:long")
      .option("allowFullScan", "true")
      .option("vectorized", "true")
      .load()
    val rows = df.orderBy("_row_key").collect()
    assert(rows(0).getString(2) == "x" && rows(0).isNullAt(3))
    assert(rows(1).isNullAt(2) && rows(1).getLong(3) == 9L)
  }
}
