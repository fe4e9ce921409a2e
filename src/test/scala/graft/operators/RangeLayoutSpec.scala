package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves the point of [[Sink.writeRangeLayout]]: files carry DISJOINT
  * key ranges, and a range predicate over the layout key reads a
  * fraction of the rows an unclustered layout pays for (parquet footer
  * min/max row-group skipping — the gated doc_range_layout query proves
  * the VALUES, this spec proves the pruning).
  */
class RangeLayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  private def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
    // collect() executes THIS df's physical plan (count() would build a
    // separate QueryExecution whose metrics we can't see from here)
    df.collect()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan).map(_.metrics("numOutputRows").value).sum
  }

  test("files carry disjoint doc_id ranges") {
    val out = java.nio.file.Files.createTempDirectory("graft-rl1").toString
    Sink.writeRangeLayout(
      spark.read.parquet(s"$dir/documents.parquet"), out,
      rangeBy = Seq("doc_id"), nRanges = 8)
    val perFile = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .orderBy(col("lo"))
      .collect()
    assert(perFile.length >= 4, s"expected several range files, got ${perFile.length}")
    perFile.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi") < b.getAs[Long]("lo"),
          s"overlapping file ranges: $a vs $b")
      case _ =>
    }
  }

  test("range predicate on the layout key skips most row groups") {
    // sf0.1 (5000 docs): the 100-row selection sits inside one of 8
    // range files, so the skip ratio is unambiguous
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val clustered = java.nio.file.Files.createTempDirectory("graft-rl2").toString
    // small row groups so skipping is visible even in a small fixture
    Sink.writeRangeLayout(docs, clustered, Seq("doc_id"), nRanges = 8,
      rowGroupBytes = 64 * 1024)
    val unclustered = java.nio.file.Files.createTempDirectory("graft-rl3").toString
    // same file/row-group geometry, rows dealt round-robin: every file
    // spans the whole key range, so min/max stats can't skip anything
    docs.repartition(8).write.mode("overwrite")
      .option("parquet.block.size", 64 * 1024).parquet(unclustered)

    def filtered(path: String) =
      spark.read.parquet(path).where(col("doc_id").between(100, 199))
    val total = docs.count()
    val selected = filtered(clustered).count()
    assert(selected == 100)

    val rowsClustered = scanOutputRows(filtered(clustered))
    val rowsUnclustered = scanOutputRows(filtered(unclustered))
    assert(rowsUnclustered > total / 2,
      s"unclustered layout should scan most rows, scanned $rowsUnclustered of $total")
    assert(rowsClustered <= rowsUnclustered / 3,
      s"range layout should skip most row groups: clustered=$rowsClustered unclustered=$rowsUnclustered")
  }

  test("gated query equals the direct filter on the source table") {
    val got = graft.SparkEntry.queries("doc_range_layout")(spark, dir).collect()
    val want = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id").between(100, 199))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy(col("lang"))
      .collect()
    assert(got.sameElements(want))
  }
}
