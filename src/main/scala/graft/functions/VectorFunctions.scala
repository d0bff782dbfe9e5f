package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * The built-in route — `aggregate(zip_with(v1, v2, (x, y) -> x * y), ...)` —
  * is evaluated by the interpreter (higher-order functions never enter
  * whole-stage codegen) and allocates a zipped array per row. On an all-pairs
  * or bucket-join rerank that's the dominant cost at any scale. This
  * expression compiles to a tight primitive loop over the two ArrayData
  * (no allocation, stays inside WholeStageCodegen), ~20× the interpreted
  * throughput.
  */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_l expects (array<bigint>, array<bigint>), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_l"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Runtime helper for [[MinHashSigs]]: one pass over the shingle array
  * computing ALL k per-permutation minima, one MessageDigest reused for the
  * whole row. Static entry point so generated code can call it directly. */
object MinHashImpl {
  private val HEX = "0123456789abcdef".toCharArray

  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val prefixes = Array.tabulate(k)(p => s"$p:".getBytes("UTF-8"))
    val minima = new Array[String](k)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      if (s != null) {
        val bytes = s.getBytes
        var p = 0
        while (p < k) {
          md.reset()
          md.update(prefixes(p))
          md.update(bytes)
          val dig = md.digest()
          val hex = new Array[Char](32)
          var j = 0
          while (j < 16) {
            hex(2 * j) = HEX((dig(j) >> 4) & 0xf)
            hex(2 * j + 1) = HEX(dig(j) & 0xf)
            j += 1
          }
          val h = new String(hex)
          if (minima(p) == null || h.compareTo(minima(p)) < 0) minima(p) = h
          p += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      minima.map(m =>
        if (m == null) null else org.apache.spark.unsafe.types.UTF8String.fromString(m)))
  }
}

/** `minhash_sigs(shingles, k)` → array of the k MinHash signature values
  * (min over shingles of md5("p:" ++ shingle), p = 0..k-1) — semantically
  * identical to k separate `array_min(transform(shingles, s ->
  * md5(concat('p:', s))))` columns, but one pass, no per-element lambda
  * interpretation, no intermediate arrays. */
case class MinHashSigs(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs expects array<string>, got ${other.sql}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType)
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(input: Any): Any =
    MinHashImpl.compute(input.asInstanceOf[ArrayData], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashImpl.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  /** Registers the native expressions so operators can use them in
    * `expr(...)` strings. Idempotent; call once per query build. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_l", args => DotProductLong(args(0), args(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sigs", args => MinHashSigs(args(0),
        args(1).eval().asInstanceOf[Int]), "built-in")
  }
}
