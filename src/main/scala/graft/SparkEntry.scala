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
    }),

    // ================= LLM-data-pipeline tier (SURVEY.md §7.4) =========

    // --- text analysis: token / punctuation / length stats ---
    "doc_token_stats" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .select(
          col("doc_id"),
          graft.functions.TextFunctions.tokenCount(col("text")).as("n_tokens"),
          regexp_count(col("text"), lit("[.,!?;:]")).as("n_punct"),
          length(col("text")).as("len_chars"))
        .orderBy(col("doc_id"))),

    // --- exact dedup: duplicate groups (keeper id + copy count) ---
    "doc_exact_dedup" -> ((s, dir) =>
      graft.operators.Dedup
        .duplicateGroups(s.read.parquet(s"$dir/documents.parquet"), Seq("text"), "doc_id")
        .select(col("keeper_id"), col("n_copies"))
        .orderBy(col("keeper_id"))),

    // --- exact dedup: surviving rows ---
    "doc_exact_dedup_rows" -> ((s, dir) =>
      graft.operators.Dedup
        .exact(s.read.parquet(s"$dir/documents.parquet"), Seq("text"), "doc_id")
        .select(col("doc_id"))
        .orderBy(col("doc_id"))),

    // --- MinHash-LSH near-dup with exact jaccard verification ---
    "doc_near_dup" -> ((s, dir) =>
      graft.operators.Dedup
        .nearDuplicates(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", threshold = 0.9)
        .orderBy(col("id1"), col("id2"))),

    // --- SimHash near-dup (rows-only: no 64-bit simhash in DuckDB) ---
    "doc_simhash_near_dup" -> ((s, dir) =>
      graft.operators.Dedup
        .simhashNearDuplicates(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", maxHamming = 6)
        .orderBy(col("id1"), col("id2"))),

    // --- text quality / language-ID / fingerprint (rows-only) ---
    "doc_quality" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .select(
          col("doc_id"),
          graft.functions.TextFunctions.langGuess(col("text")).as("lang_guess"),
          graft.functions.TextFunctions.qualityScore(col("text")).as("quality"),
          graft.functions.TextFunctions.fingerprint64(col("text")).as("fingerprint"))
        .orderBy(col("doc_id"))),

    // --- ANN: brute-force cosine top-k (bounded top-k aggregate) ---
    "emb_knn" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      graft.operators.Similarity
        .bruteForceTopK(emb, emb.where(col("vec_id") < 5), "vec_id", "embedding", 10)
        .select(col("qid"), col("nid"), col("rank"))
        .orderBy(col("qid"), col("rank"))
    }),

    // --- ANN: IVF bucketed variant (rows-only; approximate by design) ---
    "emb_knn_ivf" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      graft.operators.Similarity
        .ivfTopK(emb, emb.where(col("vec_id") < 5), "vec_id", "embedding", 10, nCentroids = 16, nProbe = 6)
        .select(col("qid"), col("nid"), col("rank"))
        .orderBy(col("qid"), col("rank"))
    }),

    // --- embedding-cosine near-dup via hyperplane LSH (rows-only) ---
    "emb_near_dup" -> ((s, dir) =>
      graft.operators.Dedup
        .embeddingNearDuplicates(
          s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding", dim = 64, threshold = 0.99)
        .orderBy(col("id1"), col("id2"))),

    // --- multimodal plumbing: stub decode over binary payloads ---
    "mm_decode" -> ((s, dir) => {
      val media = graft.operators.Multimodal.asMedia(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
      graft.operators.Multimodal.decodeStub(s, media)
        .toDF()
        .select(col("media_id"), col("width"), col("height"), col("channels"), col("size_bytes"))
        .orderBy(col("media_id"))
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
      """SELECT count(*) AS n, CAST(sum(n_regionkey) AS BIGINT) AS sum_rk FROM nation""",
    "doc_token_stats" ->
      """SELECT doc_id,
         CAST(length(regexp_extract_all(text, '\S+')) AS INT) AS n_tokens,
         CAST(length(regexp_extract_all(text, '[.,!?;:]')) AS INT) AS n_punct,
         CAST(length(text) AS INT) AS len_chars
         FROM documents ORDER BY doc_id""",
    "doc_exact_dedup" ->
      """SELECT min(doc_id) AS keeper_id, count(*) AS n_copies
         FROM documents GROUP BY text ORDER BY keeper_id""",
    "doc_exact_dedup_rows" ->
      """SELECT min(doc_id) AS doc_id FROM documents GROUP BY text ORDER BY doc_id""",
    "doc_near_dup" ->
      """WITH s AS (
           SELECT doc_id,
                  list_distinct(list_transform(range(1, greatest(length(text)-4, 1) + 1),
                                i -> text[i:i+4])) AS sh
           FROM documents)
         SELECT a.doc_id AS id1, b.doc_id AS id2,
                round(CAST(length(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                      greatest(length(list_distinct(a.sh || b.sh)), 1), 6) AS jaccard
         FROM s a JOIN s b ON a.doc_id < b.doc_id
         WHERE CAST(length(list_intersect(a.sh, b.sh)) AS DOUBLE) /
               greatest(length(list_distinct(a.sh || b.sh)), 1) >= 0.9
         ORDER BY id1, id2""",
    "emb_knn" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
         scored AS (
           SELECT q.qid, e.vec_id AS nid,
                  list_cosine_similarity(q.qv, e.embedding) AS sim
           FROM q JOIN embeddings e ON e.vec_id <> q.qid),
         ranked AS (
           SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
           FROM scored)
         SELECT qid, nid, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 10
         ORDER BY qid, rank"""
  )
}
