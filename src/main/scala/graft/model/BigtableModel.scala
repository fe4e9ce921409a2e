package graft.model

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Core data model for the Bigtable-shaped store.
  *
  * Mirrors the wire surface the reference connector consumes
  * (reference: src/execute_plan.rs:169-190 — `ReadRowsRequest { rows:
  * RowSet{row_ranges}, filter: Chain(row_filters) }` returning
  * `(row_key, Vec[RowCell])` pairs), re-expressed as plain Scala so a
  * real gRPC client or the in-memory emulator can sit behind the same
  * types.
  */

/** One Bigtable cell: (family, qualifier, timestampMicros) -> value bytes.
  * Reference: bigtable RowCell consumed at execute_plan.rs:186-212.
  */
final case class BtCell(
    family: String,
    qualifier: String,
    timestampMicros: Long,
    value: Array[Byte]
) extends Serializable

/** One Bigtable row: key plus its cells (any families/qualifiers/versions). */
final case class BtRow(rowKey: String, cells: Seq[BtCell]) extends Serializable

/** Closed-closed lexicographic row-key range `[startKey, endKey]`.
  *
  * The reference composes only closed ranges: point ranges `[key, key]`
  * and BETWEEN ranges `[prefix#lo, prefix#hi]` (composer.rs:139-161,
  * 88-91). Comparison is on UTF-8 bytes, unsigned, matching Bigtable's
  * key order.
  */
final case class RowRange(startKey: String, endKey: String) extends Serializable {
  def contains(key: String): Boolean =
    RowRange.compareKeys(key, startKey) >= 0 && RowRange.compareKeys(key, endKey) <= 0
}

object RowRange {
  /** Unsigned lexicographic compare over UTF-8 bytes (Bigtable key order). */
  def compareKeys(a: String, b: String): Int = {
    val ab = a.getBytes(StandardCharsets.UTF_8)
    val bb = b.getBytes(StandardCharsets.UTF_8)
    java.util.Arrays.compareUnsigned(ab, bb)
  }
}

/** Server-side row filters — exactly the three variants the reference
  * emits (composer.rs:253-281), chained as logical AND
  * (execute_plan.rs:175-180).
  */
sealed trait RowFilter extends Serializable
object RowFilter {
  /** Restrict to the table's single column family (composer.rs:253-256). */
  final case class FamilyNameRegex(regex: String) extends RowFilter
  /** Keep only the newest N cell versions per column (composer.rs:257-261;
    * the reference always uses N=1).
    */
  final case class CellsPerColumnLimit(n: Int) extends RowFilter
  /** Keep only cells whose qualifier matches `q1|q2|...`
    * (composer.rs:263-281, projection pushdown).
    */
  final case class ColumnQualifierRegex(regex: String) extends RowFilter
}

/** Big-endian Int64 codec for cell values.
  *
  * Reference stores 64-bit signed ints as 8-byte big-endian
  * (execute_plan.rs:287-293, script/insert_rows.py:29-30); everything
  * else is raw UTF-8 (execute_plan.rs:294-301). Improvement over the
  * reference: empty/short bytes decode to null (the reference would
  * panic, execute_plan.rs:264-267 + §1.3 of SURVEY.md).
  */
object CellCodec {
  def encodeLong(v: Long): Array[Byte] =
    ByteBuffer.allocate(8).putLong(v).array() // ByteBuffer defaults to BIG_ENDIAN

  /** None when the cell is missing/malformed (fewer than 8 bytes). */
  def decodeLong(bytes: Array[Byte]): Option[Long] =
    if (bytes == null || bytes.length < 8) None
    else Some(ByteBuffer.wrap(bytes).getLong)

  def encodeString(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)

  def decodeString(bytes: Array[Byte]): Option[String] =
    if (bytes == null) None else Some(new String(bytes, StandardCharsets.UTF_8))
}
