package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry routes through the Bigtable DSv2 connector
  * (the engine under test) over stores seeded from the same parquet the
  * DuckDB oracle reads (GraftTables), so the driver's hash-compare
  * exercises provider → pushdown → composer → reader → Spark SQL.
  * Queries are ordered deterministically (ORDER BY on unique keys) on
  * both sides.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0.
    * Connector scan (key-range pushdown) + broadcast join + aggregation.
    */
  def entry(spark: SparkSession): DataFrame = {
    val sfDir = "/root/testdata/sf0.001"
    val nation = GraftTables.nation(spark, sfDir)
      .where(col("n_key").between("0000", "9999"))
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    nation
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count("*").as("n_nations"))
      .orderBy(col("r_name"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- §2A A4: partition pruning, equality (composer.rs:163-192) ---
    "bt_key_eq" -> ((s, dir) =>
      GraftTables.nation(s, dir)
        .where(col("n_key") === "0007")
        .select(col("n_key"), col("n_name"), col("n_regionkey"))),

    // --- §2A A5: partition pruning, IN list (composer.rs:194-222) ---
    "bt_key_in" -> ((s, dir) =>
      GraftTables.nation(s, dir)
        .where(col("n_key").isin("0002", "0011", "0019", "0023"))
        .select(col("n_key"), col("n_name"), col("n_regionkey"))
        .orderBy(col("n_key"))),

    // --- §2A A6/A7: tail BETWEEN → closed range (composer.rs:224-248) ---
    "bt_key_between" -> ((s, dir) =>
      GraftTables.nation(s, dir)
        .where(col("n_key").between("0005", "0012"))
        .select(col("n_key"), col("n_name"), col("n_regionkey"))
        .orderBy(col("n_key"))),

    // --- §2A A7: composite key, = + IN + tail BETWEEN cartesian merge ---
    "bt_composite" -> ((s, dir) =>
      GraftTables.orders(s, dir)
        .where(col("o_orderstatus") === "O" &&
          col("o_orderpriority").isin("1-URGENT", "3-MEDIUM") &&
          col("o_key").between("0000000100", "0000000900"))
        .select(col("o_orderstatus"), col("o_orderpriority"), col("o_key"),
          col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_key"))),

    // --- §2B ORDER BY over the connector ---
    "bt_orderby" -> ((s, dir) =>
      GraftTables.nation(s, dir)
        .where(col("n_key").between("0000", "9999"))
        .select(col("n_key"), col("n_name"))
        .orderBy(col("n_name").desc, col("n_key"))),

    // --- §2B aggregation / GROUP BY over the connector ---
    "bt_groupby_agg" -> ((s, dir) =>
      GraftTables.nation(s, dir)
        .where(col("n_key").between("0000", "9999"))
        .groupBy(col("n_regionkey"))
        .agg(count("*").as("cnt"), min(col("n_name")).as("min_name"), max(col("n_name")).as("max_name"))
        .orderBy(col("n_regionkey"))),

    // --- §2B join: connector scan ⋈ broadcast parquet dim ---
    "bt_join" -> ((s, dir) => {
      val nation = GraftTables.nation(s, dir).where(col("n_key").between("0000", "9999"))
      val region = s.read.parquet(s"$dir/region.parquet")
      nation
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count("*").as("n_nations"))
        .orderBy(col("r_name"))
    }),

    // --- §2B window function over the connector ---
    "bt_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("n_regionkey")).orderBy(col("n_name"))
      GraftTables.nation(s, dir)
        .where(col("n_key").between("0000", "9999"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 2)
        .select(col("n_regionkey"), col("n_name"), col("rn"))
        .orderBy(col("n_regionkey"), col("rn"))
    }),

    // --- §2B set operation (UNION distinct) over two key ranges ---
    "bt_union" -> ((s, dir) => {
      val a = GraftTables.nation(s, dir).where(col("n_key").between("0000", "0005")).select(col("n_key"))
      val b = GraftTables.nation(s, dir).where(col("n_key").between("0003", "0008")).select(col("n_key"))
      a.union(b).distinct().orderBy(col("n_key"))
    }),

    // --- §2A A13 version explosion: onlyReadLatest=false (execute_plan.rs:223-271) ---
    "bt_versions" -> ((s, dir) =>
      GraftTables.eventsAllVersions(s, dir)
        .where(col("u_key").isin("000003", "000007", "000011"))
        .select(col("u_key"), col("event_type"), col("value"))
        .orderBy(col("u_key"), col("event_type"), col("value"))),

    // --- §2A A11 latest-version filter (CellsPerColumnLimit(1)) ---
    "bt_latest" -> ((s, dir) =>
      GraftTables.eventsLatest(s, dir)
        .where(col("u_key").between("000000", "000050"))
        .select(col("u_key"), col("event_type"), col("value"))
        .orderBy(col("u_key"))),

    // --- §2A A8 relaxed: explicit full scan feeding a whole-table agg ---
    "bt_full_scan_agg" -> ((s, dir) => {
      GraftTables.ensure(s, dir)
      s.read.format("bigtable")
        .option("store", GraftTables.storeName(dir))
        .option("table", "nation")
        .option("columnFamily", "f")
        .option("partitionCols", "n_key")
        .option("qualifiers", "n_name:string,n_regionkey:long")
        .option("allowFullScan", "true")
        .load()
        .agg(count("*").as("n"), sum(col("n_regionkey")).as("sum_rk"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "bt_key_eq" ->
      """SELECT lpad(CAST(n_nationkey AS VARCHAR), 4, '0') AS n_key, n_name,
         CAST(n_regionkey AS BIGINT) AS n_regionkey
         FROM nation WHERE n_nationkey = 7""",
    "bt_key_in" ->
      """SELECT lpad(CAST(n_nationkey AS VARCHAR), 4, '0') AS n_key, n_name,
         CAST(n_regionkey AS BIGINT) AS n_regionkey
         FROM nation WHERE n_nationkey IN (2, 11, 19, 23) ORDER BY n_key""",
    "bt_key_between" ->
      """SELECT lpad(CAST(n_nationkey AS VARCHAR), 4, '0') AS n_key, n_name,
         CAST(n_regionkey AS BIGINT) AS n_regionkey
         FROM nation WHERE n_nationkey BETWEEN 5 AND 12 ORDER BY n_key""",
    "bt_composite" ->
      """SELECT o_orderstatus, o_orderpriority,
         lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS o_key, o_custkey, o_totalprice
         FROM orders
         WHERE o_orderstatus = 'O' AND o_orderpriority IN ('1-URGENT', '3-MEDIUM')
           AND o_orderkey BETWEEN 100 AND 900
         ORDER BY o_key""",
    "bt_orderby" ->
      """SELECT lpad(CAST(n_nationkey AS VARCHAR), 4, '0') AS n_key, n_name
         FROM nation ORDER BY n_name DESC, n_key""",
    "bt_groupby_agg" ->
      """SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey, count(*) AS cnt,
         min(n_name) AS min_name, max(n_name) AS max_name
         FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    "bt_join" ->
      """SELECT r_name, count(*) AS n_nations
         FROM nation JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",
    "bt_window" ->
      """SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey, n_name, rn FROM (
           SELECT n_regionkey, n_name,
                  CAST(row_number() OVER (PARTITION BY n_regionkey ORDER BY n_name) AS INT) AS rn
           FROM nation) t
         WHERE rn <= 2 ORDER BY n_regionkey, rn""",
    "bt_union" ->
      """SELECT lpad(CAST(n_nationkey AS VARCHAR), 4, '0') AS n_key
         FROM nation WHERE n_nationkey BETWEEN 0 AND 5
         UNION
         SELECT lpad(CAST(n_nationkey AS VARCHAR), 4, '0') AS n_key
         FROM nation WHERE n_nationkey BETWEEN 3 AND 8
         ORDER BY n_key""",
    "bt_versions" ->
      """SELECT lpad(CAST(user_id AS VARCHAR), 6, '0') AS u_key, event_type, value
         FROM events WHERE user_id IN (3, 7, 11)
         ORDER BY u_key, event_type, value""",
    "bt_latest" ->
      """SELECT u_key, event_type, value FROM (
           SELECT lpad(CAST(user_id AS VARCHAR), 6, '0') AS u_key, event_type, value,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) AS rn
           FROM events WHERE user_id BETWEEN 0 AND 50) t
         WHERE rn = 1 ORDER BY u_key""",
    "bt_full_scan_agg" ->
      """SELECT count(*) AS n, CAST(sum(n_regionkey) AS BIGINT) AS sum_rk FROM nation"""
  )
}
