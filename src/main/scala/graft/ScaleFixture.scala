package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-proof fixture generator: replicate an existing fixture dir N×
  * with shifted keys so the whole gate registry and bench can run at a
  * scale factor the driver doesn't ship (e.g. sf0.1 ×10 = sf1). The
  * goal is catching superlinear or driver-bound behavior, so the
  * replicas are de-correlated where correlation would distort the
  * operator under test:
  *
  *   - keys shift by `i * stride(domain)` per replica, where the stride
  *     of a key DOMAIN is `max+1` computed once from its OWNING table
  *     (customer for custkey, orders for orderkey, part/supplier for
  *     part/suppkey). Foreign keys shift by the owner's stride — not
  *     their own per-table max — so a replica's orders reference exactly
  *     that replica's customers even when not every customer has an
  *     order (max(o_custkey) < max(c_custkey) in TPC-H);
  *   - document text gets a replica marker token every 8 tokens for
  *     i>0 — shingle/minhash similarity across replicas drops below
  *     near-dup thresholds, keeping near-dup pair density linear in the
  *     corpus instead of quadratic in the replica count;
  *   - embeddings rotate by i positions — replicas don't collapse onto
  *     their originals in cosine space (ANN bucket geometry stays
  *     realistic).
  *
  * Usage: runMain graft.ScaleFixture <srcDir> <outDir> <factor>
  * Writes one `<table>.parquet` DIRECTORY of part files per table —
  * Spark reads it natively, DuckDB via a glob over the part files
  * (tools/check_correctness.py handles both layouts). The replicas
  * write in parallel; nothing funnels through a coalesce(1) straggler,
  * so sf10+ generation stays minutes, not hours.
  */
object ScaleFixture {
  def main(args: Array[String]): Unit = {
    val Array(src, out, factorStr) = args
    val factor = factorStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))

    def writeOne(df: DataFrame, name: String): Unit = {
      val dst = s"$out/$name.parquet"
      // delete a stale single-FILE layout so overwrite-as-directory works
      val f = new java.io.File(dst)
      if (f.isFile) java.nio.file.Files.delete(f.toPath)
      df.write.mode("overwrite").parquet(dst)
    }

    // One stride per key DOMAIN, from the domain's owning table. A
    // foreign key must shift by its OWNER's stride: in TPC-H not every
    // customer places orders, so max(o_custkey)+1 != max(c_custkey)+1,
    // and a per-column stride would point replica-i orders at dangling
    // or wrong-replica customers.
    def ownerStride(table: String, keyCol: String): Long =
      spark.read.parquet(s"$src/$table.parquet")
        .agg(max(col(keyCol))).collect()(0).getLong(0) + 1L
    val stride: Map[String, Long] = Map(
      "c_custkey" -> ownerStride("customer", "c_custkey"),
      "s_suppkey" -> ownerStride("supplier", "s_suppkey"),
      "p_partkey" -> ownerStride("part", "p_partkey"),
      "o_orderkey" -> ownerStride("orders", "o_orderkey"),
      "event_id" -> ownerStride("events", "event_id"),
      "user_id" -> ownerStride("events", "user_id"),
      "doc_id" -> ownerStride("documents", "doc_id"),
      "vec_id" -> ownerStride("embeddings", "vec_id")
    )
    // column -> its key domain's stride (FKs resolve to the owner's)
    val colStride: Map[String, Long] = stride ++ Map(
      "o_custkey" -> stride("c_custkey"),
      "l_orderkey" -> stride("o_orderkey"),
      "l_partkey" -> stride("p_partkey"),
      "l_suppkey" -> stride("s_suppkey")
    )

    def replicate(name: String, shiftCols: Seq[String])(
        transform: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val reps = (0 until factor).map { i =>
        val shifted = shiftCols.foldLeft(base) { (d, c) =>
          d.withColumn(c, (col(c) + lit(i * colStride(c))).cast("long"))
        }
        transform(shifted, i)
      }
      writeOne(reps.reduce(_ unionByName _), name)
      println(s"[scale] $name x$factor done")
    }
    def copy(name: String): Unit = {
      writeOne(spark.read.parquet(s"$src/$name.parquet"), name)
      println(s"[scale] $name copied")
    }

    // fixed dims: same content at every TPC-H scale factor
    copy("region"); copy("nation")

    replicate("customer", Seq("c_custkey"))((d, _) => d)
    replicate("supplier", Seq("s_suppkey"))((d, _) => d)
    replicate("part", Seq("p_partkey"))((d, _) => d)
    replicate("orders", Seq("o_orderkey", "o_custkey"))((d, _) => d)
    replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))((d, _) => d)
    replicate("events", Seq("event_id", "user_id"))((d, _) => d)

    // documents: salt replica text so cross-replica similarity drops
    // below near-dup thresholds (marker token every 8 tokens), and keep
    // n_chars true to the new text
    replicate("documents", Seq("doc_id")) { (d, i) =>
      if (i == 0) d
      else {
        val salted = d.withColumn("text",
          array_join(
            zip_with(
              split(col("text"), " "),
              sequence(lit(0), size(split(col("text"), " ")) - 1),
              (tok, idx) => when(idx % 8 === 7, concat(tok, lit(s" r${i}x"))).otherwise(tok)),
            " "))
        salted.withColumn("n_chars", length(col("text")).cast("long"))
      }
    }

    // embeddings: distinct orthogonal transform per replica so replicas
    // never collapse onto each other in cosine space — rotate by
    // i mod dim, and for i >= dim additionally flip the sign of odd
    // dims (rotation alone wraps at dim=64, so factor > 64 would alias
    // replica i onto replica i-64). Composition stays distinct up to
    // 2*dim = 128 replicas; past that, extend the flip pattern.
    replicate("embeddings", Seq("vec_id")) { (d, i) =>
      if (i == 0) d
      else {
        val dim = size(col("embedding"))
        val rot = pmod(lit(i), dim)
        val rotated = concat(
          slice(col("embedding"), rot + 1, dim - rot),
          slice(col("embedding"), lit(1), rot))
        val flipOdd = zip_with(rotated, sequence(lit(0), dim - 1),
          (x, idx) => when(idx % 2 === 1, -x).otherwise(x))
        d.withColumn("embedding",
          when(lit(i) >= dim, flipOdd).otherwise(rotated))
      }
    }

    println(s"[scale] wrote $out at ${factor}x $src")
    spark.stop()
  }
}
