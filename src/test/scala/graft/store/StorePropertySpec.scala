package graft.store

import graft.model._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized store semantics check: for random cell layouts, range
  * sets, and filter chains, `InMemoryBigtable.readRows` must agree with
  * a brute-force evaluation of the same Bigtable semantics (range
  * membership, in-order filter chain, cell ordering, empty-row
  * elision).
  */
class StorePropertySpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(987654321L)
  private val keys = Vector("a", "aa", "ab", "b", "bb", "c", "d", "dd", "e")
  private val quals = Vector("q1", "q2", "q3")
  private val fams = Vector("f", "g")

  private def randomStore(): (InMemoryBigtable, Map[String, Vector[BtCell]]) = {
    val b = new InMemoryBigtable.Builder
    val truth = scala.collection.mutable.Map.empty[String, Vector[BtCell]]
    keys.foreach { k =>
      if (rnd.nextDouble() < 0.8) {
        val nCells = 1 + rnd.nextInt(5)
        val cells = Vector.fill(nCells)(
          BtCell(fams(rnd.nextInt(fams.size)), quals(rnd.nextInt(quals.size)),
            rnd.nextInt(5).toLong, CellCodec.encodeString(rnd.nextInt(100).toString)))
        cells.foreach(c => b.put("t", k, c))
        truth(k) = cells
      }
    }
    (b.build(), truth.toMap)
  }

  private def randomRanges(): Seq[RowRange] =
    Seq.fill(1 + rnd.nextInt(3)) {
      val a = keys(rnd.nextInt(keys.size))
      val c = keys(rnd.nextInt(keys.size))
      val (lo, hi) = if (RowRange.compareKeys(a, c) <= 0) (a, c) else (c, a)
      rnd.nextInt(3) match {
        case 0          => RowRange.closed(lo, hi)
        case 1 if lo != hi => RowRange.closedOpen(lo, hi)
        case _          => RowRange.point(lo)
      }
    }

  private def randomFilters(): Seq[RowFilter] = {
    val fs = scala.collection.mutable.ArrayBuffer.empty[RowFilter]
    if (rnd.nextBoolean()) fs += RowFilter.FamilyNameRegex(java.util.regex.Pattern.quote(fams(rnd.nextInt(fams.size))))
    if (rnd.nextBoolean()) fs += RowFilter.CellsPerColumnLimit(1 + rnd.nextInt(2))
    if (rnd.nextBoolean()) fs += RowFilter.ColumnQualifierRegex(
      Seq.fill(1 + rnd.nextInt(2))(quals(rnd.nextInt(quals.size))).distinct
        .map(java.util.regex.Pattern.quote).mkString("|"))
    if (rnd.nextBoolean()) {
      // per-qualifier value range with random optional bounds
      val q = quals(rnd.nextInt(quals.size))
      val lo = if (rnd.nextBoolean()) Some(CellCodec.encodeString(rnd.nextInt(100).toString)) else None
      val hi = if (rnd.nextBoolean()) Some(CellCodec.encodeString(rnd.nextInt(100).toString)) else None
      if (lo.isDefined || hi.isDefined)
        fs += RowFilter.QualifierValueRange(fams(rnd.nextInt(fams.size)), q, lo, rnd.nextBoolean(), hi, rnd.nextBoolean())
    }
    if (rnd.nextBoolean()) {
      val q = quals(rnd.nextInt(quals.size))
      val vals = Seq.fill(1 + rnd.nextInt(3))(rnd.nextInt(100).toString).distinct
      fs += RowFilter.QualifierValueRegex(fams(rnd.nextInt(fams.size)), q, vals.map(java.util.regex.Pattern.quote).mkString("|"))
    }
    fs.toSeq
  }

  /** Brute-force reference implementation of the store contract. */
  private def bruteForce(
      truth: Map[String, Vector[BtCell]],
      ranges: Seq[RowRange],
      filters: Seq[RowFilter]
  ): Seq[(String, Seq[(String, String, Long, String)])] =
    keys
      .filter(k => truth.contains(k) && ranges.exists(_.contains(k)))
      .sorted(InMemoryBigtable.keyOrdering)
      .map { k =>
        val kept = filters.foldLeft(truth(k)) { (cs, f) =>
          f match {
            case RowFilter.FamilyNameRegex(re)     => cs.filter(_.family.matches(re))
            case RowFilter.ColumnQualifierRegex(re) => cs.filter(_.qualifier.matches(re))
            case RowFilter.CellsPerColumnLimit(n) =>
              cs.groupBy(c => (c.family, c.qualifier)).valuesIterator
                .flatMap(_.sortBy(-_.timestampMicros).take(n)).toVector
            case RowFilter.QualifierValueRange(fam, q, lo, loInc, hi, hiInc) =>
              cs.filter { c =>
                c.family != fam || c.qualifier != q || {
                  def cmp(b: Array[Byte]) = java.util.Arrays.compareUnsigned(c.value, b)
                  lo.forall(b => if (loInc) cmp(b) >= 0 else cmp(b) > 0) &&
                    hi.forall(b => if (hiInc) cmp(b) <= 0 else cmp(b) < 0)
                }
              }
            case RowFilter.QualifierValueRegex(fam, q, re) =>
              cs.filter(c => c.family != fam || c.qualifier != q || new String(c.value, "UTF-8").matches(re))
          }
        }
        k -> kept.sortBy(c => (c.family, c.qualifier, -c.timestampMicros))
          .map(c => (c.family, c.qualifier, c.timestampMicros, new String(c.value, "UTF-8")))
      }
      .filter(_._2.nonEmpty)

  test("readRows agrees with brute force over 500 random store/range/filter combinations") {
    (1 to 500).foreach { i =>
      val (store, truth) = randomStore()
      val ranges = randomRanges()
      val filters = randomFilters()
      val got = store.readRows("t", ranges, filters).toSeq
        .map(r => r.rowKey -> r.cells.map(c =>
          (c.family, c.qualifier, c.timestampMicros, new String(c.value, "UTF-8"))))
      val want = bruteForce(truth, ranges, filters)
      // cell ordering within equal (family, qualifier, ts) groups can
      // differ when duplicate timestamps exist — compare sorted triples
      val gotCanon = got.map { case (k, cs) => k -> cs.sorted }
      val wantCanon = want.map { case (k, cs) => k -> cs.sorted }
      assert(gotCanon == wantCanon, s"case $i\nranges=$ranges\nfilters=$filters")
    }
  }
}
