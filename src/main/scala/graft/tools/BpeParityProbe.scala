package graft.tools

import graft.operators.Bpe

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe proving the DISTRIBUTED BPE merge loop at production step
  * counts (VERDICT r16 #4): `doc_bpe_collapse` trains the driver path to
  * full vocabulary collapse and `doc_bpe_merges_dist` pins distributed ==
  * driver at 8 steps — this probe runs BOTH paths of [[Bpe.learn]] to
  * `steps` (default 1000) merges over the same corpus and asserts the
  * complete artifacts agree:
  *
  *   - the ordered merge list, element for element (step, lft, rgt,
  *     merged, pairCount) — selection order (count desc, pair asc in
  *     UTF-8) is a total order, so any divergence is a bug, not a tie;
  *   - the final word→segmentation table, row for row.
  *
  * Records wall seconds per path and the per-step rate. Output: one JSON
  * line on stdout (committed as BPE_PARITY_r<N>.json by the round).
  *
  * Usage: runMain graft.tools.BpeParityProbe [sfDir] [steps]
  */
object BpeParityProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val steps = args.drop(1).headOption.map(_.toInt).getOrElse(1000)

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the documents fixture alone has a 31-word vocabulary at every sf
    // (merge schedule collapses at ~89 steps); widen with customer names
    // exactly like the doc_bpe_collapse gate so 1k+ steps exist (vocab
    // 15k word types at sf0.1 — each numeric id is its own type)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select(col("text"))
      .unionAll(spark.read.parquet(s"$sfDir/customer.parquet").select(col("c_name").as("text")))

    def run(maxDriverWords: Long): (graft.operators.BpeModel, Double) = {
      val t0 = System.nanoTime()
      val m = Bpe.learn(docs, "text", steps, minCount = 1L, maxDriverWords = maxDriverWords)
      (m, (System.nanoTime() - t0) / 1e9)
    }
    // driver path: vocab always under the ceiling; distributed path:
    // ceiling 0 forces the DataFrame merge loop regardless of vocab size
    val (driverModel, driverSec) = run(Long.MaxValue)
    val (distModel, distSec) = run(0L)

    val mergesEqual = driverModel.merges == distModel.merges
    def tokensSorted(m: graft.operators.BpeModel) = m.wordTokens
      .select(col("word"), col("cnt"), concat_ws("", col("syms")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val wordTokensEqual = tokensSorted(driverModel) == tokensSorted(distModel)

    val n = driverModel.merges.size
    println(
      s"""{"probe":"bpe_parity","sfDir":"$sfDir","stepsRequested":$steps,""" +
      s""""stepsRun":$n,"distStepsRun":${distModel.merges.size},""" +
      s""""mergesEqual":$mergesEqual,"wordTokensEqual":$wordTokensEqual,""" +
      s""""driverSec":${f"$driverSec%.1f"},"distributedSec":${f"$distSec%.1f"},""" +
      s""""distSecPerStep":${f"${distSec / math.max(1, distModel.merges.size)}%.3f"}}""")
    spark.stop()
    if (!(mergesEqual && wordTokensEqual)) sys.exit(1)
  }
}
