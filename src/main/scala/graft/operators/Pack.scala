package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.{Column, DataFrame}

/** Sequence packing: arrange a tokenized corpus into fixed-budget training
  * sequences (context windows). Two standard shapes:
  *
  *  1. [[concatChunks]] — concat-and-chunk: documents are concatenated in
  *     a deterministic order and the token stream is cut every `budget`
  *     tokens; a document may straddle two or more chunks. This needs each
  *     document's GLOBAL token offset — a prefix sum over the whole
  *     corpus. A naive `Window.orderBy(id)` computes it on ONE partition
  *     (the classic global-window scale-killer), so [[withTokenOffsets]]
  *     does the distributed version: range-partition by id, per-partition
  *     token totals (one row per partition) to the driver, prefix them,
  *     and broadcast the partition offsets back — the corpus itself is
  *     never collected and never leaves its partitions after the one
  *     range shuffle.
  *
  *  2. [[greedyPack]] — documents stay atomic: walk documents in id order
  *     and open a new sequence whenever the next document would overflow
  *     the budget (an oversized document gets a sequence of its own).
  *     A sequential walk doesn't distribute, so packing is done within
  *     deterministic id-blocks (`blockSize` documents each): blocks are
  *     independent, embarrassingly parallel, and the per-block walk is a
  *     single Catalyst `aggregate` over a bounded collect_list — no UDF,
  *     no driver loop, deterministic output at any parallelism.
  */
object Pack {

  /** Adds `token_offset`: the number of tokens strictly before this row in
    * `idCol` order, computed as a distributed prefix sum (see class doc).
    * Only one row per partition is ever collected to the driver.
    */
  def withTokenOffsets(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      numPartitions: Int = 0
  ): DataFrame = {
    val spark = df.sparkSession
    val p =
      if (numPartitions > 0) numPartitions else spark.sparkContext.defaultParallelism
    // localCheckpoint (not persist): the partition-sum pass and the
    // offset-apply pass must see the SAME sampled range boundaries and
    // __pid assignment, so the partitioned frame is materialized once.
    // A persist() would pin it in the CacheManager until someone calls
    // unpersist/clearCache — a leak when the result outlives this call —
    // while a local checkpoint's blocks are released by the context
    // cleaner as soon as the returned frame is garbage-collected.
    // (Local checkpoints don't survive executor loss; a restarted job
    // simply recomputes from the source — acceptable for a two-pass
    // prefix sum.)
    val parted = df
      .repartitionByRange(p, col(idCol))
      .sortWithinPartitions(col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val sums = parted
      .groupBy(col("__pid"))
      .agg(sum(col(tokensCol)).as("__psum"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    var acc = 0L
    val offsets = sums.keys.toSeq.sorted.map { pid =>
      val o = (pid, acc); acc += sums(pid); o
    }
    import spark.implicits._
    val offDf = broadcast(offsets.toDF("__pid", "__poff"))
    val win = Window.partitionBy(col("__pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    parted
      .join(offDf, "__pid")
      .withColumn("token_offset", col("__poff") + coalesce(sum(col(tokensCol)).over(win), lit(0L)))
      .drop("__pid", "__poff")
  }

  /** Concat-and-chunk assignment: for each document, its global token
    * offset and the first/last chunk index (chunks of `budget` tokens) it
    * lands in. `n_chunks` > 1 means the document straddles a cut.
    */
  def concatChunks(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      budget: Long,
      numPartitions: Int = 0
  ): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    withTokenOffsets(df, idCol, tokensCol, numPartitions)
      .withColumn("first_chunk", floor(col("token_offset") / budget))
      .withColumn("last_chunk",
        floor((col("token_offset") + greatest(col(tokensCol), lit(1L)) - 1) / budget))
      .withColumn("n_chunks", col("last_chunk") - col("first_chunk") + 1)
  }

  /** Overlapping token windows — the chunking step of a RAG/indexing
    * pipeline: chunk i covers tokens [i*stride, i*stride + window),
    * `window - stride` tokens of overlap, the final chunk shortened to
    * the document end; `1 + ceil(max(len - window, 0) / stride)` chunks
    * per document. A pure projection + explode over an
    * already-materialized token array (the HOF staging rule applies) —
    * no shuffle, each document expands independently at any scale.
    * Returns (idCol, chunk_idx, start_tok, n_tokens, chunk_text).
    */
  def chunkWindows(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      window: Int,
      stride: Int
  ): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride=$stride <= window=$window")
    val ts = col(tokensCol)
    val nChunks =
      lit(1) + ceil(greatest(size(ts) - window, lit(0)).cast("double") / stride).cast("int")
    df.select(col(idCol), ts.as("__ts"), posexplode(sequence(lit(1), nChunks)).as(Seq("__i", "__x")))
      .select(
        col(idCol),
        col("__i").as("chunk_idx"),
        (col("__i") * stride).as("start_tok"),
        slice(col("__ts"), col("__i") * stride + 1, lit(window)).as("__chunk"))
      .select(
        col(idCol), col("chunk_idx"), col("start_tok"),
        size(col("__chunk")).as("n_tokens"),
        concat_ws(" ", col("__chunk")).as("chunk_text"))
  }

  private def packStateType = StructType(Seq(
    StructField("bin", IntegerType, nullable = false),
    StructField("fill", LongType, nullable = false),
    StructField("out", ArrayType(StructType(Seq(
      StructField("id", LongType), StructField("bin", IntegerType)))))))

  /** Greedy atomic-document packing within id-blocks: documents ordered by
    * id inside `block = floor(id / blockSize)`; a new bin opens when the
    * next document would overflow `budget` (an oversized document gets its
    * own bin). Returns (idCol, tokensCol, block, bin).
    */
  def greedyPack(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      budget: Long,
      blockSize: Long
  ): DataFrame = {
    require(budget >= 1 && blockSize >= 1, s"budget=$budget and blockSize=$blockSize must be >= 1")
    val zero = struct(
      lit(0).as("bin"), lit(0L).as("fill"),
      array().cast(packStateType("out").dataType).as("out"))
    val walked = df
      .groupBy(floor(col(idCol) / blockSize).as("block"))
      .agg(sort_array(collect_list(struct(col(idCol).cast("long").as("id"),
        col(tokensCol).cast("long").as("t")))).as("__docs"))
      .withColumn("__packed",
        aggregate(
          col("__docs"),
          zero,
          (st, d) => {
            val over = st.getField("fill") + d.getField("t") > budget && st.getField("fill") > 0L
            val bin = when(over, st.getField("bin") + 1).otherwise(st.getField("bin"))
            struct(
              bin.as("bin"),
              when(over, d.getField("t"))
                .otherwise(st.getField("fill") + d.getField("t")).as("fill"),
              concat(st.getField("out"),
                array(struct(d.getField("id").as("id"), bin.as("bin")))).as("out"))
          },
          st => st.getField("out")))
      .select(col("block"), explode(col("__packed")).as("__d"))
    walked.select(
      col("__d.id").as(idCol),
      col("block"),
      col("__d.bin").as("bin"))
  }
}
