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
  *   - entity keys shift by `i * (max+1)` per replica — joins stay
  *     key-consistent (an order's lineitems move with it);
  *   - document text gets a replica marker token every 8 tokens for
  *     i>0 — shingle/minhash similarity across replicas drops below
  *     near-dup thresholds, keeping near-dup pair density linear in the
  *     corpus instead of quadratic in the replica count;
  *   - embeddings rotate by i positions — replicas don't collapse onto
  *     their originals in cosine space (ANN bucket geometry stays
  *     realistic).
  *
  * Usage: runMain graft.ScaleFixture <srcDir> <outDir> <factor>
  * Writes one `<table>.parquet` FILE per table (DuckDB-globbable, same
  * layout as the driver's fixtures).
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
      val tmp = s"$out/.tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file for $name"))
      val dst = java.nio.file.Paths.get(s"$out/$name.parquet")
      java.nio.file.Files.deleteIfExists(dst)
      java.nio.file.Files.move(part.toPath, dst)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }

    def replicate(name: String, shiftCols: Seq[String])(
        transform: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val strides = shiftCols.map { c =>
        c -> (base.agg(max(col(c))).collect()(0).getLong(0) + 1L)
      }.toMap
      val reps = (0 until factor).map { i =>
        val shifted = shiftCols.foldLeft(base) { (d, c) =>
          d.withColumn(c, (col(c) + lit(i * strides(c))).cast("long"))
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

    // embeddings: rotate each vector by i so replicas don't collapse
    // onto their originals in cosine space
    replicate("embeddings", Seq("vec_id")) { (d, i) =>
      if (i == 0) d
      else {
        val dim = size(col("embedding"))
        d.withColumn("embedding",
          concat(slice(col("embedding"), lit(i + 1), dim - i), slice(col("embedding"), lit(1), lit(i))))
      }
    }

    println(s"[scale] wrote $out at ${factor}x $src")
    spark.stop()
  }
}
