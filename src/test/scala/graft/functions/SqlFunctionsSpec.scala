package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SqlFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = {
    SqlFunctions.register(spark)
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d.createOrReplaceTempView("sqlfn_docs")
    d
  }

  test("scalar SQL functions agree with the Column API on the fixture corpus") {
    val viaSql = docs.sparkSession.sql(
      """SELECT doc_id, quality_score(text) AS q, token_count(text) AS n,
                graft_simhash64(text) AS sh, fingerprint64(text) AS fp,
                lang_guess(text) AS lg
         FROM sqlfn_docs ORDER BY doc_id""").collect()
    val viaCols = docs.select(
      col("doc_id"),
      TextFunctions.qualityScore(col("text")).as("q"),
      TextFunctions.tokenCount(col("text")).as("n"),
      TextFunctions.simhash64(col("text")).as("sh"),
      TextFunctions.fingerprint64(col("text")).as("fp"),
      TextFunctions.langGuess(col("text")).as("lg"))
      .orderBy(col("doc_id")).collect()
    assert(viaSql.sameElements(viaCols), "SQL and Column paths diverged")
  }

  test("scalar SQL functions are expression builders, not UDFs (stay in codegen)") {
    val plan = docs.sparkSession
      .sql("SELECT quality_score(text) AS q FROM sqlfn_docs WHERE token_count(text) > 3")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF") && !plan.contains("ScalaUDF"),
      s"scalar function lowered to a UDF:\n$plan")
  }

  test("sketch aggregators run in SQL GROUP BY and are exact below size") {
    val bySql = docs.sparkSession.sql(
      """SELECT lang, kmv_distinct(fingerprint64(text)) AS nd
         FROM sqlfn_docs GROUP BY lang ORDER BY lang""").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = docs.groupBy($"lang").agg(countDistinct($"text").as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySql == exact, s"KMV below k must be exact: $bySql vs $exact")
    val kll = docs.sparkSession.sql(
      "SELECT kll_quantiles(CAST(doc_id AS DOUBLE)) AS q FROM sqlfn_docs").collect()
    assert(kll.head.getSeq[Double](0).length == 3)
    val hh = docs.sparkSession.sql(
      "SELECT heavy_hitters(lang) AS h FROM sqlfn_docs").collect()
    assert(hh.head.getSeq[org.apache.spark.sql.Row](0).nonEmpty)
  }

  test("redact_pii in SQL matches the Column form") {
    val sqlOut = docs.sparkSession.sql(
      "SELECT redact_pii('mail me@example.com or visit https://x.io now') AS r")
      .head().getString(0)
    assert(sqlOut == "mail <EMAIL> or visit <URL> now")
  }
}
