package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("withTokenOffsets equals the single-partition global prefix sum") {
    val df = spark.range(1000)
      .select($"id", (($"id" * 37) % 90 + 10).as("toks")) // 10..99 tokens
    val got = Pack.withTokenOffsets(df, "id", "toks", numPartitions = 7)
      .select($"id", $"token_offset").as[(Long, Long)].collect().toMap
    val rows = df.select($"id", $"toks").as[(Long, Long)].collect().sortBy(_._1)
    var acc = 0L
    val want = rows.map { case (id, t) => val o = (id, acc); acc += t; o }.toMap
    assert(got == want)
  }

  test("concatChunks marks straddling documents and never skips a chunk") {
    val df = Seq((1L, 300L), (2L, 300L), (3L, 100L), (4L, 600L), (5L, 24L))
      .toDF("id", "toks")
    val out = Pack.concatChunks(df, "id", "toks", budget = 512, numPartitions = 2)
      .select($"id", $"token_offset", $"first_chunk", $"last_chunk", $"n_chunks")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // offsets: 0, 300, 600, 700, 1300
    assert(out.map(_._2).toSeq == Seq(0L, 300L, 600L, 700L, 1300L))
    // doc 2 straddles the 512 cut; doc 4 spans 700..1299 (chunks 1..2)
    assert(out(1) == ((2L, 300L, 0L, 1L, 2L)))
    assert(out(3) == ((4L, 700L, 1L, 2L, 2L)))
    assert(out(4)._5 == 1L)
  }

  test("greedyPack matches the hand-walked example") {
    val df = Seq((0L, 300L), (1L, 300L), (2L, 100L), (3L, 600L), (4L, 512L))
      .toDF("id", "toks")
    val out = Pack.greedyPack(df, "id", "toks", budget = 512, blockSize = 1000)
      .select($"id", $"bin").as[(Long, Int)].collect().sortBy(_._1).map(_._2)
    // 300 -> bin0; +300 overflows -> bin1; +100 fits -> bin1;
    // 600 oversized -> own bin2; 512 -> bin3
    assert(out.toSeq == Seq(0, 1, 1, 2, 3))
  }

  test("greedyPack invariants: bins fit the budget unless a single oversized doc") {
    val df = spark.range(2000)
      .select($"id", (($"id" * 131) % 400 + 1).as("toks"))
    val packed = Pack.greedyPack(df, "id", "toks", budget = 512, blockSize = 128)
      .join(df, "id")
    val perBin = packed.groupBy($"block", $"bin")
      .agg(sum($"toks").as("fill"), count(lit(1)).as("n"))
      .as[(Long, Int, Long, Long)].collect()
    assert(perBin.forall { case (_, _, fill, n) => fill <= 512 || n == 1 })
    // bins are contiguous from 0 within every block
    val binSeq = packed.select($"block", $"bin").distinct()
      .as[(Long, Int)].collect().groupBy(_._1).values
    assert(binSeq.forall { s => val bs = s.map(_._2).sorted; bs.head == 0 && bs.last == bs.length - 1 })
  }

  test("packing output is independent of input partitioning") {
    val df = spark.range(500).select($"id", (($"id" * 13) % 200 + 1).as("toks"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Pack.greedyPack(d, "id", "toks", 256, 64)
        .select($"id", $"block", $"bin").as[(Long, Long, Int)].collect().sortBy(_._1).toSeq
    assert(run(df.repartition(13)) == run(df.coalesce(1)))
    def runC(d: org.apache.spark.sql.DataFrame, p: Int) =
      Pack.concatChunks(d, "id", "toks", 256, p)
        .select($"id", $"token_offset").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(runC(df.repartition(13), 5) == runC(df.coalesce(1), 1))
  }

  test("chunkWindows: coverage, overlap, and short-final-chunk semantics") {
    val df = Seq(
      (1L, (1 to 50).map(i => s"t$i")),   // 50 tokens -> chunks at 0, 24 (win 32)
      (2L, (1 to 10).map(i => s"s$i")),   // shorter than one window -> 1 chunk
      (3L, (1 to 32).map(i => s"u$i"))    // exactly one window -> 1 chunk
    ).toDF("id", "toks")
    val out = Pack.chunkWindows(df, "id", "toks", window = 32, stride = 24)
      .select($"id", $"chunk_idx", $"start_tok", $"n_tokens")
      .as[(Long, Int, Int, Int)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      (1L, 0, 0, 32), (1L, 1, 24, 26),
      (2L, 0, 0, 10),
      (3L, 0, 0, 32)))
    // every token is covered: union of [start, start+n) == [0, len)
    val covered = out.filter(_._1 == 1L).flatMap(c => c._3 until (c._3 + c._4)).toSet
    assert(covered == (0 until 50).toSet)
    // chunk text is the exact token slice
    val texts = Pack.chunkWindows(df.where($"id" === 1L), "id", "toks", 32, 24)
      .select($"chunk_idx", $"chunk_text").as[(Int, String)].collect().toMap
    assert(texts(1) == (25 to 50).map(i => s"t$i").mkString(" "))
  }
}
