package graft.functions

import java.util.{BitSet => JBitSet}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native BITMAP aggregate — ClickHouse's groupBitmap / Druid's
  * "DataSketches minus the approximation": `bitmap_agg(id)` condenses a
  * group's id set into a serialized bitmap (BinaryType), on which
  * [[BitmapCardinality]] and [[BitmapAndCardinality]] answer audience
  * counts and overlaps WITHOUT re-touching the fact table — the
  * segment-overlap serving shape q70 builds manually from 64-bit words,
  * here as one first-class aggregate with map-side partial merge (the
  * TypedImperativeAggregate contract gives partial bitmaps OR-merged at
  * the combiner, so the fact rows cross the wire as bitmaps, not ids).
  *
  * Ids must lie in [0, 2^26) (8 MiB dense worst case — the testdata ids
  * are ≤ ~10^6); out-of-range FAILS LOUDLY rather than aliasing two ids
  * to one bit. A production variant swaps the dense java.util.BitSet for
  * a roaring container; every signature stays the same.
  */
case class BitmapAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JBitSet] with ImplicitCastInputTypes {

  private val maxId = 1 << 26

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bitmap_agg"

  override def createAggregationBuffer(): JBitSet = new JBitSet()

  override def update(buffer: JBitSet, input: InternalRow): JBitSet = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[Long]
      if (id < 0 || id >= maxId) throw new IllegalArgumentException(
        s"bitmap_agg: id $id outside [0, 2^26) — widen the container")
      buffer.set(id.toInt)
    }
    buffer
  }

  override def merge(buffer: JBitSet, input: JBitSet): JBitSet = {
    buffer.or(input)
    buffer
  }

  override def eval(buffer: JBitSet): Any = buffer.toByteArray

  override def serialize(buffer: JBitSet): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): JBitSet = JBitSet.valueOf(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** POPCOUNT of a serialized bitmap — the audience size. */
case class BitmapCardinality(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_cardinality"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"needs BINARY, got $t")
  }
  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    var n = 0L
    var i = 0
    while (i < bytes.length) { n += java.lang.Integer.bitCount(bytes(i) & 0xff); i += 1 }
    n
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** POPCOUNT of the intersection of two serialized bitmaps — the audience
  * overlap, computed bytewise without materializing the AND bitmap.
  * Both popcounts run on |groups|-sized rows, so CodegenFallback costs
  * nothing measurable here. */
case class BitmapAndCardinality(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_and_cardinality"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"needs (BINARY, BINARY), got $t")
    }
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val lim = math.min(x.length, y.length)
    var n = 0L
    var i = 0
    while (i < lim) { n += java.lang.Integer.bitCount(x(i) & y(i) & 0xff); i += 1 }
    n
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
