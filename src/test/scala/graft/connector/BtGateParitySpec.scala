package graft.connector

import graft.{GraftTables, SparkEntry}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Dual-configuration certification of the whole connector gate suite:
  * every `bt_*` query in the SparkEntry registry must return identical
  * results with the vectorized (ColumnarBatch) reader as with the
  * incremental row reader. The flip is the session conf
  * `spark.graft.bigtable.vectorizedDefault` — no gate code changes —
  * which `BigtableConfig.fromOptions` consults whenever a reader does
  * not pin `vectorized` explicitly. Same discipline as the `*_join`
  * dual-plan gates: one registry, two physical configurations, equal
  * answers everywhere (VERDICT r11 item 5).
  *
  * The conf-flip itself is proven effective on a probe query (plan gains
  * a vectorized ColumnarToRow), so the suite cannot silently run the row
  * path twice.
  */
class BtGateParitySpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def withVectorizedDefault[A](on: Boolean)(body: => A): A = {
    val key = BigtableConfig.VectorizedDefaultConf
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, on.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  private lazy val btGates: Seq[String] =
    SparkEntry.queries.keys.filter(_.startsWith("bt_")).toSeq.sorted

  test("session default actually flips the read path (probe plan shape)") {
    GraftTables.ensure(spark, sf)
    def probe() = GraftTables.nation(spark, sf)
      .where(org.apache.spark.sql.functions.col("n_key").between("0000", "9999"))
    val rowPlan = withVectorizedDefault(on = false)(probe().queryExecution.executedPlan.toString)
    val vecPlan = withVectorizedDefault(on = true)(probe().queryExecution.executedPlan.toString)
    assert(!rowPlan.contains("ColumnarToRow"), rowPlan)
    assert(vecPlan.contains("ColumnarToRow"), vecPlan)
    // an explicit reader option still wins over the session default
    val pinned = withVectorizedDefault(on = true) {
      GraftTables.nation(spark, sf, Map("vectorized" -> "false"))
        .where(org.apache.spark.sql.functions.col("n_key").between("0000", "9999"))
        .queryExecution.executedPlan.toString
    }
    assert(!pinned.contains("ColumnarToRow"), pinned)
  }

  test("every bt_* gate returns identical results under both readers") {
    assert(btGates.size >= 30, s"gate surface shrank? $btGates")
    val failures = btGates.flatMap { name =>
      val fn = SparkEntry.queries(name)
      val row = withVectorizedDefault(on = false)(sortedRows(fn(spark, sf)))
      val vec = withVectorizedDefault(on = true)(sortedRows(fn(spark, sf)))
      if (row == vec) None
      else Some(s"$name: row=${row.size} rows, vec=${vec.size} rows, " +
        s"first diff=${row.zipAll(vec, "<missing>", "<missing>").find(p => p._1 != p._2)}")
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
