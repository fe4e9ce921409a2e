package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves the point of [[Sink.writeZOrder]]: row groups cover small
  * hyper-rectangles, so footer min/max stats prune selective reads on
  * EITHER z column — the property single-key range layout can't give.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan).map(_.metrics("numOutputRows").value).sum
  }

  test("zOrderValue interleaves bits as a Morton code") {
    // mins=0, maxs=3, bits=2: rank == value; x=3 (11), y=2 (10)
    // z = x0<<0 | y0<<1 | x1<<2 | y1<<3 = 1 + 0 + 4 + 8 = 13
    val z = Seq((3L, 2L)).toDF("x", "y")
      .select(Sink.zOrderValue(Seq($"x", $"y"), Seq(0L, 0L), Seq(3L, 3L), 2).as("z"))
      .as[Long].head()
    assert(z == 13L)
    // adjacent cells differ in few low bits: (0,0) -> 0, (1,1) -> 3
    val z2 = Seq((0L, 0L), (1L, 1L), (3L, 3L)).toDF("x", "y")
      .select(Sink.zOrderValue(Seq($"x", $"y"), Seq(0L, 0L), Seq(3L, 3L), 2).as("z"))
      .as[Long].collect().toSeq
    assert(z2 == Seq(0L, 3L, 15L))
  }

  test("selective predicates on EITHER dimension skip most row groups") {
    // 256x256 grid; both coordinates uniform
    val grid = spark.range(65536)
      .select(($"id" % 256).as("x"), ($"id" / 256).cast("long").as("y"))
    val zdir = java.nio.file.Files.createTempDirectory("graft-zo1").toString
    Sink.writeZOrder(grid, zdir, Seq("x", "y"), nRanges = 16, bits = 8,
      rowGroupBytes = 16 * 1024)

    def q(c: String) = spark.read.parquet(zdir).where(col(c).between(0, 15))
    assert(q("x").count() == 16 * 256 && q("y").count() == 16 * 256)
    val total = 65536L
    val sx = scanOutputRows(q("x"))
    val sy = scanOutputRows(q("y"))
    assert(sx <= total / 3, s"x-filter scanned $sx of $total — no z pruning on x")
    assert(sy <= total / 3, s"y-filter scanned $sy of $total — no z pruning on y")
  }

  test("z-ordered read-back equals the source under combined filters") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val zdir = java.nio.file.Files.createTempDirectory("graft-zo2").toString
    Sink.writeZOrder(docs, zdir, Seq("doc_id", "n_chars"), nRanges = 8,
      rowGroupBytes = 64 * 1024)
    def filt(d: org.apache.spark.sql.DataFrame) =
      d.where($"doc_id".between(50, 449) && $"n_chars" > 200)
        .select($"doc_id", $"lang", $"n_chars").orderBy($"doc_id")
    val got = filt(spark.read.parquet(zdir)).collect()
    val want = filt(docs).collect()
    assert(got.sameElements(want) && want.nonEmpty)
  }
}
