package graft.connector

import graft.{GraftTables, SparkEntry}
import graft.store.{BigtableStores, SocketBigtableServer}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Process-boundary certification of the whole connector gate suite:
  * every `bt_*` query in the SparkEntry registry must return identical
  * results when the fixture store is resolved through a
  * [[graft.store.SocketBigtableStore]] — every `readRows` /
  * `sampleRowKeys` / `estimateSize` crossing a real localhost TCP hop —
  * as when it is the in-JVM emulator. The swap is a registry
  * re-registration under the SAME store name, so no gate code changes:
  * whatever the gate plans (range pruning, server-side filters, DPP
  * narrowing, aggregate pushdown, streaming reads), the store behind it
  * is remote. This is the offline equivalent of pointing the reference
  * connector at a real Bigtable endpoint instead of the emulator.
  *
  * Gates that build their OWN stores (write roundtrips, retry
  * injection) keep them — the suite proves the shared fixture path;
  * their store wiring is their own test subject.
  */
class SocketGateParitySpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private lazy val btGates: Seq[String] =
    SparkEntry.queries.keys.filter(_.startsWith("bt_")).toSeq.sorted

  /** Run `body` with the shared fixture store served over a socket:
    * the registry entry for `storeName(sf)` is swapped to the
    * socket-backed client and restored afterwards (other suites in this
    * JVM must keep seeing the in-JVM store).
    */
  private def withSocketStore[A](body: => A): A = {
    GraftTables.ensure(spark, sf)
    val name = GraftTables.storeName(sf)
    val original = BigtableStores.get(name)
    val server = new SocketBigtableServer(original)
    BigtableStores.register(name, server.clientStore)
    try body
    finally {
      BigtableStores.register(name, original)
      server.close()
    }
  }

  test("every bt_* gate returns identical results through the socket transport") {
    assert(btGates.size >= 30, s"gate surface shrank? $btGates")
    // baseline first (in-JVM store), then the same registry through the wire
    val baseline = btGates.map { name =>
      name -> sortedRows(SparkEntry.queries(name)(spark, sf))
    }.toMap
    val failures = withSocketStore {
      btGates.flatMap { name =>
        val remote = sortedRows(SparkEntry.queries(name)(spark, sf))
        if (remote == baseline(name)) None
        else Some(s"$name: in-jvm=${baseline(name).size} rows, socket=${remote.size} rows, " +
          s"first diff=${baseline(name).zipAll(remote, "<missing>", "<missing>")
            .find(p => p._1 != p._2)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
