package graft.format

/** Encode-side column representation. A top-level column is a tree; the
  * writer flattens it depth-first into leaf byte streams.
  *
  * Unlike the reference (which shreds nested data into parquet-style
  * rep/def levels, `/root/reference/src/write/common.rs:60-75`), this spec
  * uses Arrow/ClickHouse-style explicit length+validity leaves — equivalent
  * information, O(1) reconstruction, simpler at scale.
  *
  * Leaf layout per column kind (depth-first order):
  *  - LeafCol           -> 1 value leaf
  *  - ListCol(child)    -> 1 I32 "lengths" leaf (carries the list validity;
  *                         null list == length 0 + null bit) ++ leaves(child)
  *  - StructCol(cs)     -> (1 Bool marker leaf iff nullable, values unused)
  *                         ++ leaves(c1) ++ ... (children have one entry per
  *                         struct slot, incl. null-struct slots)
  *  - MapCol(k, v)      -> 1 I32 lengths leaf ++ leaves(k) ++ leaves(v)
  */
sealed trait ColumnTree { def rows: Int }

final case class LeafCol(lane: Int, nullable: Boolean, vec: Vec) extends ColumnTree {
  def rows: Int = vec.n
}
final case class ListCol(nullable: Boolean, lengths: IntVec, child: ColumnTree) extends ColumnTree {
  def rows: Int = lengths.n
}
final case class StructCol(nullable: Boolean, n: Int, nulls: Array[Boolean],
    children: Seq[ColumnTree]) extends ColumnTree {
  def rows: Int = n
}
final case class MapCol(nullable: Boolean, lengths: IntVec, key: ColumnTree,
    value: ColumnTree) extends ColumnTree {
  def rows: Int = lengths.n
}

object ColumnTree {
  /** Number of on-disk leaves a column tree occupies. */
  def leafCount(t: ColumnTree): Int = t match {
    case _: LeafCol => 1
    case l: ListCol => 1 + leafCount(l.child)
    case s: StructCol => (if (s.nullable) 1 else 0) + s.children.map(leafCount).sum
    case m: MapCol => 1 + leafCount(m.key) + leafCount(m.value)
  }
}
