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

  test("RowRange.normalize tolerates many duplicate unbounded ranges (strict-weak ordering)") {
    // 33+ equal (None, None) ranges exercise TimSort's contract check
    val dup = Vector.fill(40)(RowRange("k", None, endInclusive = false)) :+ RowRange.full
    val n = RowRange.normalize(dup)
    assert(n == Vector(RowRange("", None, endInclusive = false)))
  }

  test("QualifierValueRange drops only the target qualifier's failing cells") {
    val f = RowFilter.QualifierValueRange(
      "f", "q1", Some(CellCodec.encodeString("va")), loInclusive = true,
      hi = Some(CellCodec.encodeString("vb")), hiInclusive = true)
    val rows = store.readRows("t", Seq(RowRange.full), Seq(f)).toSeq
    // q1 survives only for rows a,b (values va, vb; "oldX" sorts below "va");
    // q2 cells keep every row alive
    val q1Rows = rows.filter(_.cells.exists(_.qualifier == "q1")).map(_.rowKey)
    assert(q1Rows == Seq("a", "b"))
    assert(rows.map(_.rowKey) == Seq("a", "b", "c", "d", "e"), "other qualifiers pass through")
  }

  test("QualifierValueRange bounds are unsigned-byte, optional on each side") {
    val loOnly = RowFilter.QualifierValueRange(
      "f", "q1", Some(CellCodec.encodeString("vc")), loInclusive = false, None, hiInclusive = false)
    val rows = store.readRows("t", Seq(RowRange.full), Seq(loOnly)).toSeq
    val q1 = rows.flatMap(_.cells.filter(_.qualifier == "q1")).map(c => new String(c.value))
    assert(q1.sorted == Seq("vd", "ve"))
  }

  test("QualifierValueRegex keeps other qualifiers, matches whole value") {
    val f = RowFilter.QualifierValueRegex("f", "q1", "\\Qva\\E|\\Qvd\\E")
    val rows = store.readRows("t", Seq(RowRange.full), Seq(f)).toSeq
    val q1Rows = rows.filter(_.cells.exists(_.qualifier == "q1")).map(_.rowKey)
    assert(q1Rows == Seq("a", "d"))
    assert(rows.size == 5)
  }

  test("value filter after CellsPerColumnLimit: failing latest does NOT resurface older version") {
    // q1 on row 'a' has versions: ts=100 'va' (latest), ts=50 'olda'.
    // Chain latest-then-value('olda'): latest 'va' picked first, fails the
    // value filter -> q1 gone entirely (correct SQL semantics: the row's
    // current value is 'va', predicate q1='olda' must not match).
    val chain = Seq(
      RowFilter.CellsPerColumnLimit(1),
      RowFilter.QualifierValueRange(
        "f", "q1", Some(CellCodec.encodeString("olda")), loInclusive = true,
        hi = Some(CellCodec.encodeString("olda")), hiInclusive = true))
    val rows = store.readRows("t", Seq(RowRange.point("a")), chain).toSeq
    assert(rows.flatMap(_.cells.filter(_.qualifier == "q1")).isEmpty)
    // reversed chain (value first) would wrongly surface 'olda' as latest
    val wrong = store.readRows("t", Seq(RowRange.point("a")), chain.reverse).toSeq
    assert(wrong.flatMap(_.cells.filter(_.qualifier == "q1")).map(c => new String(c.value)) == Seq("olda"))
  }
}
