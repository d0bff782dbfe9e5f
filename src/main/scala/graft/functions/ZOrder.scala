package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
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
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == LongType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder2 expects (bigint, bigint), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }
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
