package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native codegen'd Bloom membership test over a long key:
  * `bloom_might_contain(key, bloomBytes)` where `bloomBytes` is a FOLDABLE
  * binary literal holding a serialized `spark.util.sketch.BloomFilter`
  * (from [[serialize]]). The engine's map-side join prefilters (triangle
  * wedge closure, dd12-style incremental screens) evaluate this on every
  * candidate row — tens of millions per stage — where a Scala UDF pays
  * boxing + a codegen break per call; this stays inside whole-stage
  * codegen as one virtual call on a per-JVM lazily-deserialized filter.
  * False positives are confirmed downstream by the real join; false
  * negatives are impossible for keys the filter was built from.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects a BIGINT key, got ${left.dataType.sql}")
    else if (right.dataType != BinaryType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain expects a foldable BINARY serialized filter")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  // One deserialization per JVM per plan (transient lazy): executors
  // receive the bytes through the broadcast task binary and build the
  // filter on first evaluation.
  @transient private lazy val filter: BloomFilter = {
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  /** Entry point for generated code. */
  def test(key: Long): Boolean = filter.mightContainLong(key)

  override def nullSafeEval(key: Any, ignored: Any): Any =
    test(key.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this,
      classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, (key, _) => s"${ev.value} = $ref.test($key);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {
  /** Serialize a built filter into the binary-literal form the expression
    * consumes. */
  def serialize(bloom: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }
}

/** [[BloomMightContain]] over a BROADCAST filter handle instead of a
  * binary literal — for LONG-LIVED, megabyte-scale filters (the dedup
  * store's 4M-item sidecars are ~3.5 MB each). A literal that size is
  * hashed and compared by Catalyst during analysis/canonicalization on
  * every plan that carries it — measured +2-3 s per store query at
  * sf0.1 — while the broadcast form ships only the handle in the plan
  * and the task binary, and executors fetch the bytes once through the
  * broadcast machinery. Same generated code shape: one virtual call on
  * a lazily-resolved per-JVM filter, inside whole-stage codegen. The
  * literal form remains right for small per-job filters built inside
  * loops (cc07/cc20's edge screens), where broadcast lifecycle
  * management would outweigh the plan-hashing cost. */
case class BloomMightContainBC(child: Expression,
    bloom: org.apache.spark.broadcast.Broadcast[BloomFilter])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain_bc expects a BIGINT key, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_bc"

  @transient private lazy val filter: BloomFilter = bloom.value

  /** Entry point for generated code. */
  def test(key: Long): Boolean = filter.mightContainLong(key)

  override def nullSafeEval(key: Any): Any =
    test(key.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBcExpr", this,
      classOf[BloomMightContainBC].getName)
    nullSafeCodeGen(ctx, ev, key => s"${ev.value} = $ref.test($key);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
