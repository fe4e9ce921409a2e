package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Keep-latest snapshot maintenance — the batch MERGE/upsert a CDC
  * pipeline needs: fold a change set (inserts, updates, deletes) into a
  * base snapshot, where a change beats the base row for its key and the
  * highest `versionCol` wins among changes.
  *
  * Shape for 100 TB: ONE hash shuffle of base ∪ changes on the key,
  * resolved with a `max_by` AGGREGATION — map-side partials collapse
  * each partition to one candidate per key BEFORE the exchange, so the
  * shuffle carries winners, not history. (Spark plans a struct-valued
  * max_by as SortAggregate — a partition-local sort by the group key —
  * but never the window row_number() idiom, which shuffles every
  * version of every row and sorts by (key, prio, version) just to throw
  * the losers away after.) With the base maintained bucketed on the key
  * ([[Sink.writeBucketed]]) even that shuffle disappears on the base
  * side. Determinism requires (`versionCol`) to be unique per key
  * WITHIN the change set — the normal CDC contract (a log offset /
  * commit timestamp).
  *
  * Deletes: rows in `changes` with `deleteCol` = true win their key like
  * any other change, then the winner is dropped — so a delete followed
  * by a higher-version re-insert correctly resurrects the key.
  *
  * Two conflict orders, chosen by `versionDominates`:
  *  - `false` (default, the one-shot MERGE): a change beats the base row
  *    regardless of version — the base is a prior snapshot whose versions
  *    are not comparable to the change set's.
  *  - `true` (snapshot maintenance across micro-batches): base rows carry
  *    their ORIGINAL versions, so the highest version wins across base
  *    and changes and `__prio` only breaks exact-version ties (a re-run
  *    of the same batch stays idempotent). Without this, a late-arriving
  *    lower-version change would overwrite a newer snapshot row or
  *    resurrect a tombstone.
  */
object Upsert {

  def mergeLatest(
      base: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      versionCol: String,
      deleteCol: Option[String] = None,
      versionDominates: Boolean = false
  ): DataFrame = {
    require(keys.nonEmpty, "keys must name at least one column")
    val dataCols = base.columns
    require(changes.columns.sameElements(dataCols),
      s"changes schema ${changes.columns.mkString(",")} must match base ${dataCols.mkString(",")}")
    val tagged = base.withColumn("__prio", lit(0))
      .unionByName(changes.withColumn("__prio", lit(1)))
    val order =
      if (versionDominates) struct(col(versionCol), col("__prio"))
      else struct(col("__prio"), col(versionCol))
    val merged = tagged
      .groupBy(keys.map(col): _*)
      .agg(max_by(struct(dataCols.map(col): _*), order).as("__w"))
      .select(col("__w.*"))
    deleteCol match {
      case Some(d) => merged.where(!col(d)).drop(d)
      case None => merged
    }
  }
}
