package graft.store

import graft.model._
import org.scalatest.funsuite.AnyFunSuite

class RetryingStoreSpec extends AnyFunSuite {
  private def cell(q: String, ts: Long, v: String) = BtCell("f", q, ts, CellCodec.encodeString(v))

  private def freshStore = {
    val b = new InMemoryBigtable.Builder
    Seq("a", "ab", "a\u0001", "b", "c", "d", "e").foreach { k =>
      b.put("t", k, cell("q1", 100L, s"v$k"))
    }
    b.build()
  }
  // "a\u0001" sits between "a" and its +NUL successor's neighbours — a
  // resume right after "a" must not skip it
  private val allKeys = Seq("a", "a\u0001", "ab", "b", "c", "d", "e") // UTF-8 byte order

  private def retrying(inner: BigtableStore, maxAttempts: Int = 5) = {
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    (new RetryingStore(inner, maxAttempts = maxAttempts, sleep = slept += _), slept)
  }

  test("mid-stream fault resumes exactly after the last delivered key (no dup, no skip)") {
    for (failAfter <- 0 to 6) {
      val (store, _) = retrying(new FaultInjectingStore(freshStore, failAfterRows = failAfter, callFaults = false))
      val keys = store.readRows("t", Seq(RowRange.full), Nil).map(_.rowKey).toSeq
      assert(keys == allKeys, s"failAfter=$failAfter")
    }
  }

  test("resume clamps multi-range reads correctly") {
    val ranges = Seq(RowRange.closed("a", "ab"), RowRange.closed("c", "e"))
    val (store, _) = retrying(new FaultInjectingStore(freshStore, failAfterRows = 2, callFaults = false))
    val keys = store.readRows("t", ranges, Nil).map(_.rowKey).toSeq
    assert(keys == Seq("a", "a\u0001", "ab", "c", "d", "e"))
  }

  test("call-level faults on sampleRowKeys/estimateSize are retried with backoff") {
    val (store, slept) = retrying(new FaultInjectingStore(freshStore, callFaults = true))
    assert(store.sampleRowKeys("t") == freshStore.sampleRowKeys("t"))
    assert(store.estimateSize("t", Seq(RowRange.full)) == freshStore.estimateSize("t", Seq(RowRange.full)))
    assert(slept.nonEmpty && slept.forall(_ >= 10L))
  }

  test("permanent faults surface after maxAttempts, with exponential backoff between tries") {
    val broken = new BigtableStore {
      override def readRows(t: String, r: Seq[RowRange], f: Seq[RowFilter]): Iterator[BtRow] =
        throw new TransientStoreException("always down")
    }
    val (store, slept) = retrying(broken, maxAttempts = 4)
    intercept[TransientStoreException] {
      store.readRows("t", Seq(RowRange.full), Nil)
    }
    assert(slept.toSeq == Seq(10L, 20L, 40L))
  }

  test("non-transient faults are NOT retried") {
    val broken = new BigtableStore {
      override def readRows(t: String, r: Seq[RowRange], f: Seq[RowFilter]): Iterator[BtRow] =
        throw new IllegalArgumentException("bad request")
    }
    val (store, slept) = retrying(broken)
    intercept[IllegalArgumentException] {
      store.readRows("t", Seq(RowRange.full), Nil)
    }
    assert(slept.isEmpty)
  }

  test("a connector query through a flaky store returns correct results") {
    val spark = graft.SparkTestSession.spark
    val name = "retrying-spec-store"
    BigtableStores.register(name,
      new RetryingStore(new FaultInjectingStore(freshStore, failAfterRows = 1, maxFaults = 3), sleep = _ => ()))
    val df = spark.read.format("bigtable")
      .option("store", name)
      .option("table", "t")
      .option("columnFamily", "f")
      .option("partitionCols", "k")
      .option("qualifiers", "q1:string")
      .option("allowFullScan", "true")
      .load()
    assert(df.count() == 7)
    assert(df.where(org.apache.spark.sql.functions.col("k") === "c").count() == 1)
  }
}
