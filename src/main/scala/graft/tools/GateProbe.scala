package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: run one registry gate at a given scale dir and show its
  * result — spot-checking a new gate against its DuckDB oracle without
  * a full Verify pass. Usage: runMain graft.tools.GateProbe <name> [dir]
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.show(20, truncate = false)
    println(s"[probe] rows=${df.count()}")
    spark.stop()
  }
}

/** Registry size probe (dev aid): counts queries/oracles. */
object GateCount {
  def main(args: Array[String]): Unit =
    println(s"[count] queries=${graft.SparkEntry.queries.size} oracles=${graft.SparkEntry.oracleSql.size}")
}
