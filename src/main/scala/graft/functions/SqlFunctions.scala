package graft.functions

import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.{Column, Encoders, SparkSession}

/** SQL registration for the stable text/sketch functions, so a pipeline
  * step can be written ENTIRELY in SQL — the reference's whole user
  * surface is `ctx.sql(...)` (/root/reference/README.md:25), and a
  * Scala-only function library would leave SQL users without the
  * text-analysis tier.
  *
  * Two tiers, different mechanics on purpose:
  *
  *  - Scalar functions register as Catalyst expression BUILDERS (via
  *    [[ColumnBridge.registerExpressionFunction]]), not UDFs: the SQL
  *    call composes the same expression tree the Column API builds, so
  *    it stays inside whole-stage codegen with zero serialization
  *    overhead — `WHERE quality_score(text) >= 0.5` plans byte-identical
  *    to the DataFrame form.
  *  - Sketch AGGREGATORS register through `udaf(...)` (the public typed-
  *    Aggregator bridge). SQL cannot pass constructor parameters, so
  *    each registers a fixed, documented configuration; callers needing
  *    other parameters use the Scala API.
  *
  * Registration is session-scoped (like temp views) and idempotent —
  * call once per session, e.g. right after building it.
  */
object SqlFunctions {

  /** KMV size for `kmv_distinct`: estimates are exact below 1024
    * distinct values per group, ±3% above.
    */
  val KmvK = 1024

  /** KLL size and quantiles for `kll_quantiles`: exact below 256 values
    * per group; returns [p25, p50, p75].
    */
  val KllK = 256
  val KllQs: Seq[Double] = Seq(0.25, 0.5, 0.75)

  /** Misra-Gries capacity for `heavy_hitters`: any item above n/16 of
    * its group is guaranteed present.
    */
  val MgK = 16

  def register(spark: SparkSession): Unit = {
    def expr1(name: String)(f: Column => Column): Unit =
      ColumnBridge.registerExpressionFunction(spark, name, { cols =>
        require(cols.length == 1, s"$name expects 1 argument, got ${cols.length}")
        f(cols.head)
      })
    expr1("quality_score")(TextFunctions.qualityScore)
    expr1("token_count")(TextFunctions.tokenCount)
    expr1("bpe_token_count")(TextFunctions.bpeTokenCountApprox)
    expr1("lang_guess")(TextFunctions.langGuess)
    expr1("graft_simhash64")(TextFunctions.simhash64)
    expr1("fingerprint64")(TextFunctions.fingerprint64)
    expr1("redact_pii")(TextFunctions.redactPii)
    expr1("pii_counts")(TextFunctions.piiCounts)

    spark.udf.register("kmv_distinct", udaf(new KmvDistinct(KmvK), Encoders.scalaLong))
    spark.udf.register("kll_quantiles",
      udaf(new KllQuantiles.Sketch(KllK, KllQs), Encoders.scalaDouble))
    spark.udf.register("heavy_hitters",
      udaf(new FrequentItems.MisraGries(MgK), Encoders.STRING))
  }
}
