package graft.store

import graft.model._
import org.scalatest.funsuite.AnyFunSuite

/** Emulator + codec unit coverage (ADVICE.md round 1): range
  * boundaries, overlapping-range dedup, filter-chain order,
  * multi-version limits, cell ordering, codec edge cases.
  */
class BigtableStoreSpec extends AnyFunSuite {
  private def cell(q: String, ts: Long, v: String, fam: String = "f") =
    BtCell(fam, q, ts, CellCodec.encodeString(v))

  private val store = {
    val b = new InMemoryBigtable.Builder
    Seq("a", "b", "c", "d", "e").zipWithIndex.foreach { case (k, i) =>
      b.put("t", k, cell("q1", 100L + i, s"v$k"))
      b.put("t", k, cell("q1", 50L, s"old$k"))
      b.put("t", k, cell("q2", 100L + i, s"w$k"))
      b.put("t", k, cell("q2", 100L + i, s"x$k", fam = "other"))
    }
    b.build()
  }

  test("closed-closed range includes both endpoints") {
    val keys = store.readRows("t", Seq(RowRange.closed("b", "d")), Nil).map(_.rowKey).toSeq
    assert(keys == Seq("b", "c", "d"))
  }

  test("closed-open range excludes the end key") {
    val keys = store.readRows("t", Seq(RowRange.closedOpen("b", "d")), Nil).map(_.rowKey).toSeq
    assert(keys == Seq("b", "c"))
  }

  test("unbounded range scans to the end") {
    val keys = store.readRows("t", Seq(RowRange("c", None, endInclusive = false)), Nil).map(_.rowKey).toSeq
    assert(keys == Seq("c", "d", "e"))
  }

  test("overlapping ranges dedup and stay key-ordered") {
    val keys = store
      .readRows("t", Seq(RowRange.closed("c", "e"), RowRange.closed("a", "d"), RowRange.point("b")), Nil)
      .map(_.rowKey)
      .toSeq
    assert(keys == Seq("a", "b", "c", "d", "e"))
  }

  test("empty ranges are rejected (full scan must be explicit)") {
    intercept[IllegalArgumentException] { store.readRows("t", Nil, Nil) }
  }

  test("full scan sentinel reads everything") {
    assert(store.readRows("t", Seq(RowRange.full), Nil).size == 5)
  }

  test("family filter then qualifier filter then version limit (chain order, execute_plan.rs:175-180)") {
    val filters = Seq(
      RowFilter.FamilyNameRegex("\\Qf\\E"),
      RowFilter.CellsPerColumnLimit(1),
      RowFilter.ColumnQualifierRegex("\\Qq1\\E"))
    val row = store.readRows("t", Seq(RowRange.point("a")), filters).next()
    assert(row.cells.map(c => (c.family, c.qualifier, new String(c.value))) == Seq(("f", "q1", "va")))
  }

  test("CellsPerColumnLimit keeps the newest N versions per (family, qualifier)") {
    val row = store
      .readRows("t", Seq(RowRange.point("a")), Seq(RowFilter.CellsPerColumnLimit(1)))
      .next()
    val q1 = row.cells.filter(c => c.family == "f" && c.qualifier == "q1")
    assert(q1.map(_.timestampMicros) == Seq(100L))
  }

  test("cells ordered by (family, qualifier, timestamp desc) — Bigtable cell order") {
    val row = store.readRows("t", Seq(RowRange.point("a")), Nil).next()
    val order = row.cells.map(c => (c.family, c.qualifier, c.timestampMicros))
    assert(order == order.sortBy(t => (t._1, t._2, -t._3)))
  }

  test("rows with no surviving cells are not emitted") {
    val rows = store
      .readRows("t", Seq(RowRange.point("a")), Seq(RowFilter.ColumnQualifierRegex("\\Qnope\\E")))
      .toSeq
    assert(rows.isEmpty)
  }

  test("sampleRowKeys returns interior keys in key order") {
    val samples = store.sampleRowKeys("t")
    assert(samples.forall(s => Seq("a", "b", "c", "d", "e").contains(s)))
    assert(samples == samples.sorted)
  }

  test("codec: long round-trip is big-endian (execute_plan.rs:287-293)") {
    val bytes = CellCodec.encodeLong(94558L)
    assert(bytes.length == 8 && bytes(0) == 0 && CellCodec.decodeLong(bytes).contains(94558L))
    assert(CellCodec.decodeLong(Array.emptyByteArray).isEmpty)
    assert(CellCodec.decodeLong(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("RowRange.normalize merges overlap and keeps disjoint ranges") {
    val n = RowRange.normalize(Seq(
      RowRange.closed("k", "p"), RowRange.closed("a", "c"), RowRange.closed("b", "d"),
      RowRange.point("z")))
    assert(n == Vector(RowRange.closed("a", "d"), RowRange.closed("k", "p"), RowRange.point("z")))
  }

  test("RowRange.normalize merges adjacent closed-open + closed ranges") {
    val n = RowRange.normalize(Seq(RowRange.closedOpen("a", "c"), RowRange.closed("c", "e")))
    assert(n == Vector(RowRange.closed("a", "e")))
  }
}
