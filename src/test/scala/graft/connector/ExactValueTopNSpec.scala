package graft.connector

import graft.{GraftTables, SparkTestSession}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 pushdown breadth: AVG (rewritten by Catalyst to SUM/COUNT
  * under partial pushdown, SPARK-37839), aggregates composing with
  * exactly-pushed VALUE predicates (post-pivot re-check in the reader,
  * [[ValuePredicate]]), and top-k pushdown on the reported key order
  * (SupportsPushDownTopN). Every case is certified two ways: plan shape
  * (what pushed) and result parity with the unpushed plan.
  */
class ExactValueTopNSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val sub = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case other                    => other.children
    }
    p +: sub.flatMap(allNodes)
  }

  private def scanDesc(df: DataFrame): String =
    allNodes(df.queryExecution.executedPlan).collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan.description()
    }.getOrElse("")

  private def hasNode(df: DataFrame, simpleName: String): Boolean =
    allNodes(df.queryExecution.executedPlan).exists(_.getClass.getSimpleName == simpleName)

  // ---------------------------------------------------------------- AVG

  test("AVG pushes as SUM/COUNT partials and matches the unpushed plan") {
    val exact = GraftTables.eventsAllVersions(spark, sf, Map("exactFilterPushdown" -> "true"))
      .where(col("u_key").between("000000", "000100"))
      .agg(avg(col("value")).as("avg_value"))
    val plain = GraftTables.eventsAllVersions(spark, sf)
      .where(col("u_key").between("000000", "000100"))
      .agg(avg(col("value")).as("avg_value"))
    assert(exact.collect()(0) == plain.collect()(0))
    val desc = scanDesc(exact)
    assert(desc.contains("SUM(value)") && desc.contains("COUNT(value)"), desc)
  }

  // ------------------------------------------- exact value predicates

  test("exactly-pushed value predicate leaves no residual filter and matches") {
    val exact = GraftTables.eventsLatest(spark, sf)
      .where(col("u_key").between("000000", "000100") && col("event_type") === "click")
    val exactDf = spark.read.format("bigtable")
      .option("store", GraftTables.storeName(sf))
      .option("table", "events").option("columnFamily", "f")
      .option("partitionCols", "u_key")
      .option("qualifiers", "event_type:string,value:double")
      .option("onlyReadLatest", "true")
      .option("exactFilterPushdown", "true")
      .load()
      .where(col("u_key").between("000000", "000100") && col("event_type") === "click")
      .select(col("u_key"), col("event_type"), col("value"))
    val plain = exact.select(col("u_key"), col("event_type"), col("value"))
    assert(exactDf.collect().map(_.toString).sorted.toSeq ==
      plain.collect().map(_.toString).sorted.toSeq)
    assert(!hasNode(exactDf, "FilterExec"),
      "exactly-pushed value predicate should drop the residual FilterExec")
    assert(hasNode(plain, "FilterExec"))
    assert(scanDesc(exactDf).contains("EqualTo(event_type,click)"), scanDesc(exactDf))
  }

  test("value predicates on longs and doubles are exact (incl. null semantics)") {
    // n_regionkey is a long qualifier; doubles ride the same decoded
    // post-pivot comparison (SQLOrderingUtil semantics)
    val exact = GraftTables.nation(spark, sf, Map("exactFilterPushdown" -> "true"))
      .where(col("n_key").between("0000", "9999") && col("n_regionkey") >= 2L && col("n_regionkey") < 4L)
      .select(col("n_key"), col("n_regionkey"))
    val plain = GraftTables.nation(spark, sf)
      .where(col("n_key").between("0000", "9999") && col("n_regionkey") >= 2L && col("n_regionkey") < 4L)
      .select(col("n_key"), col("n_regionkey"))
    assert(exact.collect().map(_.toString).sorted.toSeq ==
      plain.collect().map(_.toString).sorted.toSeq)
    assert(!hasNode(exact, "FilterExec"), "long range should push exactly")

    val dbl = GraftTables.eventsAllVersions(spark, sf, Map("exactFilterPushdown" -> "true"))
      .where(col("u_key").between("000000", "000100") && col("value") > 0.5)
      .select(col("u_key"), col("value"))
    val dblPlain = GraftTables.eventsAllVersions(spark, sf)
      .where(col("u_key").between("000000", "000100") && col("value") > 0.5)
      .select(col("u_key"), col("value"))
    assert(dbl.collect().map(_.toString).sorted.toSeq ==
      dblPlain.collect().map(_.toString).sorted.toSeq)
    assert(!hasNode(dbl, "FilterExec"), "double predicate should push exactly (post-pivot)")
  }

  test("aggregate pushdown composes with an exactly-pushed value predicate") {
    val exact = GraftTables.eventsAllVersions(spark, sf, Map("exactFilterPushdown" -> "true"))
      .where(col("u_key").between("000000", "000100") && col("event_type") === "click")
      .agg(count("*").as("cnt"), sum(col("value")).as("sum_value"))
    val plain = GraftTables.eventsAllVersions(spark, sf)
      .where(col("u_key").between("000000", "000100") && col("event_type") === "click")
      .agg(count("*").as("cnt"), sum(col("value")).as("sum_value"))
    assert(exact.collect()(0) == plain.collect()(0))
    val desc = scanDesc(exact)
    assert(desc.contains("agg=[COUNT(*), SUM(value)]"), desc)
    assert(desc.contains("EqualTo(event_type,click)"), desc)
    assert(!hasNode(exact, "FilterExec"))
  }

  // ------------------------------------------------------------- top-k

  test("ORDER BY key LIMIT k pushes as topN; no Sort of scan output; results match") {
    val exact = GraftTables.nation(spark, sf, Map("exactFilterPushdown" -> "true"))
      .where(col("n_key").between("0000", "9999"))
      .select(col("n_key"), col("n_name"))
      .orderBy(col("n_key"))
      .limit(4)
    val plain = GraftTables.nation(spark, sf)
      .where(col("n_key").between("0000", "9999"))
      .select(col("n_key"), col("n_name"))
      .orderBy(col("n_key"))
      .limit(4)
    assert(exact.collect().toSeq == plain.collect().toSeq)
    val desc = scanDesc(exact)
    assert(desc.contains("topN=4"), desc)
    assert(!hasNode(exact, "SortExec"),
      "top-k pushdown should leave no full Sort of scan output")
  }

  test("top-k is NOT pushed for DESC order or composite keys") {
    val desc1 = scanDesc(
      GraftTables.nation(spark, sf, Map("exactFilterPushdown" -> "true"))
        .where(col("n_key").between("0000", "9999"))
        .select(col("n_key"), col("n_name"))
        .orderBy(col("n_key").desc)
        .limit(3))
    assert(!desc1.contains("topN="), desc1)
    val desc2 = scanDesc(
      GraftTables.orders(spark, sf, Map("exactFilterPushdown" -> "true"))
        .where(col("o_orderstatus") === "O" && col("o_orderpriority") === "1-URGENT" &&
          col("o_key").isin("0000000020", "0000000026"))
        .orderBy(col("o_key"))
        .limit(2))
    assert(!desc2.contains("topN="), desc2)
  }

  test("topN respects rows dropped by an exact value predicate (filter before cap)") {
    val exact = GraftTables.nation(spark, sf, Map("exactFilterPushdown" -> "true"))
      .where(col("n_key").between("0000", "9999") && col("n_regionkey") === 2L)
      .select(col("n_key"), col("n_regionkey"))
      .orderBy(col("n_key"))
      .limit(3)
    val plain = GraftTables.nation(spark, sf)
      .where(col("n_key").between("0000", "9999") && col("n_regionkey") === 2L)
      .select(col("n_key"), col("n_regionkey"))
      .orderBy(col("n_key"))
      .limit(3)
    assert(exact.collect().toSeq == plain.collect().toSeq)
  }
}
