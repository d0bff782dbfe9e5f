package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Runtime helper for [[ZOrder2]]: classic Morton-code bit spreading via
  * parallel-prefix masks — O(1) per value, no loop over bits. */
object ZOrderImpl {
  /** Spread the low 31 bits of v so bit i lands at position 2i. */
  def spread(v: Long): Long = {
    var x = v & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Interleave the low 31 bits of x (even positions) and y (odd
    * positions) into one 62-bit Morton key. Inputs outside [0, 2^31) are
    * masked to their low 31 bits — callers normalize first (the key is a
    * LAYOUT device, not an identity). */
  def compute(x: Long, y: Long): Long =
    spread(x) | (spread(y) << 1)

  /** Decompose the rectangle [xLo,xHi] × [yLo,yHi] into at most
    * `maxRanges` ascending, disjoint `(zLo, zHi)` key intervals whose
    * union COVERS every Morton key inside the rectangle — the read-side
    * rewrite that makes a zorder-clustered layout prunable by anyone, not
    * just its author. Quadtree walk in z-order: a quadrant fully inside
    * the rectangle contributes its whole (contiguous) key range; a
    * partially-overlapping quadrant splits, until either single cells are
    * reached or the work budget is hit — then the quadrant's full range is
    * emitted CONSERVATIVELY. A superset is always safe: the caller
    * re-applies the exact x/y predicates, the ranges only decide which
    * files/row-groups are worth opening (cf. the BIGMIN/LITMAX literature;
    * the budgeted-quadtree form trades a few extra covered keys for
    * strictly bounded range counts). */
  def zRanges(xLo: Long, xHi: Long, yLo: Long, yHi: Long,
      maxRanges: Int = 64): Seq[(Long, Long)] = {
    require(0 <= xLo && xLo <= xHi && xHi < (1L << 31) &&
      0 <= yLo && yLo <= yHi && yHi < (1L << 31),
      s"rectangle out of the 31-bit domain: [$xLo,$xHi]x[$yLo,$yHi]")
    require(maxRanges >= 1, "maxRanges must be >= 1")
    val workBudget = maxRanges.toLong * 4
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def visit(cx: Long, cy: Long, bits: Int): Unit = {
      val size = 1L << bits
      val cxHi = cx + size - 1
      val cyHi = cy + size - 1
      if (cx > xHi || cxHi < xLo || cy > yHi || cyHi < yLo) return
      val inside = cx >= xLo && cxHi <= xHi && cy >= yLo && cyHi <= yHi
      if (inside || bits == 0 || buf.length >= workBudget) {
        val z0 = compute(cx, cy)
        buf += ((z0, z0 + (size * size - 1))) // cell = contiguous z block
      } else {
        val h = size >> 1
        // z-order quadrant visit (x-bit minor) keeps emissions ascending
        visit(cx, cy, bits - 1); visit(cx + h, cy, bits - 1)
        visit(cx, cy + h, bits - 1); visit(cx + h, cy + h, bits - 1)
      }
    }
    visit(0L, 0L, 31)
    // coalesce touching neighbours, then enforce maxRanges by closing the
    // SMALLEST inter-range gaps first (each merge covers few extra keys)
    val merged = buf.foldLeft(List.empty[(Long, Long)]) {
      case ((lo, hi) :: tail, (l, h)) if l <= hi + 1 => (lo, math.max(hi, h)) :: tail
      case (acc, r) => r :: acc
    }.reverse.toIndexedSeq
    if (merged.length <= maxRanges) merged
    else {
      val gaps = merged.sliding(2).zipWithIndex.collect {
        case (Seq((_, h1), (l2, _)), i) => (l2 - h1, i)
      }.toIndexedSeq
      val keep = gaps.sortBy(-_._1).take(maxRanges - 1).map(_._2).toSet
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var cur = merged.head
      for (i <- 1 until merged.length) {
        if (keep(i - 1)) { out += cur; cur = merged(i) }
        else cur = (cur._1, merged(i)._2)
      }
      out += cur
      out.toIndexedSeq
    }
  }
}

/** `zorder2(x, y)` → the 62-bit Morton (Z-order) key interleaving the two
  * dimensions' bits. Sorting/range-partitioning a table by this key gives
  * every aligned power-of-2 square in (x, y) space a CONTIGUOUS key range,
  * so parquet min/max row-group stats prune multi-dimensional range
  * predicates — the data-layout tool for 100 TB scans filtered on two
  * columns at once, where sorting by either column alone leaves the other
  * unpruned. The bit-spread is 12 mask-shift ops per value inside
  * whole-stage codegen (the HOF route —
  * `aggregate(sequence(0,30), ...)` — interprets 31 lambda evaluations
  * per row per dimension).
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // ImplicitCastInputTypes widens INT/SMALLINT/etc. inputs to BIGINT at
  // analysis time (a layout key over a narrow id column is the common
  // call); non-numeric inputs still fail analysis via the inherited check.
  // (Seq[DataType] <: Seq[AbstractDataType] — the parent type itself is
  // private[sql], so the override narrows the covariant return type.)
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderImpl.compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZOrderImpl.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
