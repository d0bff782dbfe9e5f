package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

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
  * computing ALL k per-permutation minima, ONE MD5 per shingle, one
  * MessageDigest reused for the whole row. Static entry point so generated
  * code can call it directly.
  *
  * Permutation scheme (shared verbatim with the DuckDB oracle): the base
  * hash is the first 4 digest bytes of md5(shingle) as an unsigned 32-bit
  * value h; permutation p maps it through the linear congruence
  * `(A(p)·h + B(p)) mod 2147483647`. One digest feeds all k permutations —
  * at 100 TB this is the difference between 1 and k MD5 passes over the
  * corpus — and the signature values are BIGINTs, so band keys downstream
  * are two 8-byte join columns instead of 32-char hex strings. */
object MinHashImpl {
  val Mod: Long = 2147483647L // 2^31 - 1 (prime)
  // Arbitrary fixed odd multipliers/offsets < 2^23 / 2^30: A·h + B stays
  // far below 2^63 for any 32-bit h, so the arithmetic is overflow-free in
  // both Spark (ANSI) and DuckDB.
  val A: Array[Long] = Array(976369L, 1982627L, 2916197L, 3946649L,
    4975303L, 6012269L, 7045003L, 8095789L)
  val B: Array[Long] = Array(178291199L, 282578489L, 378291191L, 477218579L,
    581030603L, 685983289L, 786432001L, 881930311L)

  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val minima = new Array[Long](k)
    java.util.Arrays.fill(minima, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      if (s != null) {
        val dig = md.digest(s.getBytes) // digest() resets the MessageDigest
        val h = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
          ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
        var p = 0
        while (p < k) {
          val v = (A(p) * h + B(p)) % Mod
          if (v < minima(p)) minima(p) = v
          p += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      minima.map(m => if (m == Long.MaxValue) null else java.lang.Long.valueOf(m)))
  }
}

/** `minhash_sigs(shingles, k)` → array of the k MinHash signature values
  * (min over shingles of `(A(p)·h32(md5(shingle)) + B(p)) mod (2^31-1)`,
  * p = 0..k-1) — semantically identical to k separate
  * `array_min(transform(shingles, s -> (A·conv(substring(md5(s),1,8),16,10)
  * + B) % M))` columns, but one MD5 and one pass per shingle, no lambda
  * interpretation, no intermediate arrays. */
case class MinHashSigs(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs expects array<string>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(input: Any): Any =
    MinHashImpl.compute(input.asInstanceOf[ArrayData], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashImpl.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Runtime helper for [[LshBucket]]: the deterministic ±1 hyperplane matrix
  * — w(p)(d) = parity of the first hex digit of md5("p:d"), d 1-based, same
  * arithmetic the DuckDB oracle evaluates — computed once per
  * (numPlanes, dims) and cached process-wide, so per row the work is one
  * primitive multiply-add loop. */
object LshBucketImpl {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Int]]]()

  private[functions] def planes(numPlanes: Int, dims: Int): Array[Array[Int]] =
    cache.computeIfAbsent((numPlanes, dims), { key: (Int, Int) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(key._1) { p =>
        Array.tabulate(key._2) { d0 =>
          md.reset()
          val dig = md.digest(s"$p:${d0 + 1}".getBytes("UTF-8"))
          ((((dig(0) >> 4) & 0xf) % 2) * 2) - 1
        }
      }
    })

  def compute(v: ArrayData, numPlanes: Int): Int = {
    val n = v.numElements()
    val w = planes(numPlanes, n)
    var bucket = 0
    var p = 0
    while (p < numPlanes) {
      val wp = w(p)
      var s = 0L
      var d = 0
      while (d < n) { s += v.getLong(d) * wp(d); d += 1 }
      if (s > 0) bucket |= 1 << p
      p += 1
    }
    bucket
  }
}

/** `lsh_bucket(v, numPlanes)` → the random-hyperplane signature of a
  * quantized vector: bit p set iff Σ_d v[d]·w(p,d) > 0. Semantically the
  * nested `aggregate(sequence(...), aggregate(...))` HOF form, but that runs
  * in the Catalyst interpreter (8×64 lambda evaluations per row); this is a
  * codegen'd primitive loop against a cached plane matrix. */
case class LshBucket(child: Expression, numPlanes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket expects array<bigint>, got ${other.sql}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "lsh_bucket"

  override def nullSafeEval(input: Any): Any =
    LshBucketImpl.compute(input.asInstanceOf[ArrayData], numPlanes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LshBucketImpl.compute($c, $numPlanes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Runtime helper for [[RpProject]]: the FULL Rademacher projection against
  * [[LshBucketImpl]]'s cached ±1 plane matrix — where lsh_bucket keeps only
  * the SIGN of each plane's dot product (1 bit), rp_project keeps the whole
  * integer sum (the Johnson–Lindenstrauss projected coordinate). */
object RpProjectImpl {
  def compute(v: ArrayData, numPlanes: Int): ArrayData = {
    val n = v.numElements()
    val w = LshBucketImpl.planes(numPlanes, n)
    val out = new Array[Any](numPlanes)
    var p = 0
    while (p < numPlanes) {
      val wp = w(p)
      var s = 0L
      var d = 0
      while (d < n) { s += v.getLong(d) * wp(d); d += 1 }
      out(p) = s
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `rp_project(v, numPlanes)` → the dense random projection of a quantized
  * vector: out[p] = Σ_d v[d]·w(p,d) over the same md5-parity ±1 planes as
  * [[LshBucket]]. Codegen'd primitive loop; exact BIGINT output, so both
  * engines agree bit-for-bit. */
case class RpProject(child: Expression, numPlanes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rp_project expects array<bigint>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rp_project"

  override def nullSafeEval(input: Any): Any =
    RpProjectImpl.compute(input.asInstanceOf[ArrayData], numPlanes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RpProjectImpl.compute($c, $numPlanes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Runtime helper for [[NGramHashes]]: one MessageDigest and one
  * StringBuilder reused across every n-gram of the row. */
object NGramHashImpl {
  /** 60-bit md5-prefix hash of each n-token gram of `toks` joined with a
    * single space — bit-identical to the built-in chain
    * `conv(substring(md5(concat_ws(' ', slice(toks, i, n))), 1, 15), 16, 10)`
    * (15 hex chars = digest bytes 0..6 plus the high nibble of byte 7),
    * including concat_ws's null-skipping. Returns one long per gram,
    * empty array when the row has fewer than n tokens. */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val cnt = toks.numElements() - n + 1
    if (cnt <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder(64)
    val out = new Array[Any](cnt)
    var i = 0
    while (i < cnt) {
      sb.setLength(0)
      var first = true
      var j = 0
      while (j < n) {
        val s = toks.getUTF8String(i + j)
        if (s != null) {
          if (!first) sb.append(' ')
          sb.append(s.toString)
          first = false
        }
        j += 1
      }
      val dig = md.digest(sb.toString.getBytes("UTF-8"))
      var h = 0L
      var k = 0
      while (k < 7) { h = (h << 8) | (dig(k) & 0xffL); k += 1 }
      h = (h << 4) | ((dig(7) >> 4) & 0xfL)
      out(i) = h
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `ngram_hashes(toks, n)` → array of 60-bit hashes of the n-token grams —
  * the decontamination/fingerprint hot path. The built-in form
  * (`transform(sequence(...), i -> conv(substring(md5(concat_ws(...)), ...)))`)
  * interprets a lambda and materializes each gram string through four
  * expression nodes per element; this is one codegen'd call reusing a
  * single digest and buffer per row. */
case class NGramHashes(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_hashes expects array<string>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"

  override def nullSafeEval(input: Any): Any =
    NGramHashImpl.compute(input.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NGramHashImpl.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Runtime helper for [[SparseDotLong]]: two-pointer merge over two
  * key-sorted parallel posting arrays — Σ c1[i]·c2[j] over positions with
  * equal keys. Keys must be sorted by Spark's binary string ordering (what
  * `sort_array` over `struct(s, ct)` produces), so equality scans are one
  * linear merge with no hashing and no per-pair allocation. */
object SparseDotImpl {
  def compute(s1: ArrayData, c1: ArrayData, s2: ArrayData, c2: ArrayData): Long = {
    val n1 = s1.numElements()
    val n2 = s2.numElements()
    var i = 0
    var j = 0
    var acc = 0L
    while (i < n1 && j < n2) {
      val c = s1.getUTF8String(i).compareTo(s2.getUTF8String(j))
      if (c == 0) { acc += c1.getLong(i) * c2.getLong(j); i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    acc
  }
}

/** `sparse_dot_l(keys1, cts1, keys2, cts2)` → the sparse dot product of two
  * (key-sorted array<string>, array<bigint>) count-vector encodings:
  * Σ cts1[i]·cts2[j] over matching keys. Semantically the posting-list join
  * `SELECT SUM(a.ct*b.ct) FROM p1 a JOIN p2 b USING (s)` per pair, but as
  * one codegen'd merge over the pair's two arrays — the candidate-verify
  * hot path pays O(|p1|+|p2|) per pair with zero intermediate rows, where
  * the join form materializes |pairs|×|postings-per-doc| rows into a
  * shuffle+aggregate (71.6M rows for 1.12M candidates at sf0.1). */
case class SparseDotLong(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(first, third).forall(_.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) => true
      case _ => false
    }) && Seq(second, fourth).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "sparse_dot_l expects (array<string>, array<bigint>, array<string>, " +
        s"array<bigint>), got (${first.dataType.sql}, ${second.dataType.sql}, " +
        s"${third.dataType.sql}, ${fourth.dataType.sql})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "sparse_dot_l"

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    SparseDotImpl.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData], d.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.functions.SparseDotImpl.compute($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

/** Runtime helper for [[PqAdcLong]]: Σ_m luts[m][codes[m]] over parallel
  * arrays — the PQ asymmetric-distance accumulation. Key lookup is a
  * linear scan of each map's key array (codebooks are dictionary-sized),
  * but in one compiled loop instead of M interpreted element_at lambdas.
  * A missing key yields null, matching
  * `aggregate(zip_with(luts, codes, (mp, cd) -> element_at(mp, cd)), ...)`. */
object PqAdcImpl {
  def compute(luts: ArrayData, codes: ArrayData): Any = {
    // zip_with pads the shorter side with null → element_at → null sum,
    // so ANY length mismatch nulls the HOF form's result; mirror it
    if (luts.numElements() != codes.numElements()) return null
    val m = luts.numElements()
    var acc = 0L
    var i = 0
    while (i < m) {
      val mp = luts.getMap(i)
      val code = codes.getLong(i)
      val keys = mp.keyArray()
      val n = keys.numElements()
      var j = 0
      var found = false
      while (j < n && !found) {
        if (keys.getLong(j) == code) {
          acc += mp.valueArray().getLong(j)
          found = true
        }
        j += 1
      }
      if (!found) return null
      i += 1
    }
    acc
  }
}

/** `pq_adc_l(luts, codes)` ≡
  * `aggregate(zip_with(luts, codes, (mp, cd) -> element_at(mp, cd)), 0L,
  * (acc, x) -> acc + x)` for (array<map<bigint,bigint>>, array<bigint>) —
  * the ADC hot path as one codegen'd loop. The HOF form interprets two
  * lambdas and a per-element map probe for every (query, candidate) row. */
case class PqAdcLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (left.dataType match {
      case ArrayType(org.apache.spark.sql.types.MapType(LongType, LongType, _), _) => true
      case _ => false
    }) && (right.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "pq_adc_l expects (array<map<bigint,bigint>>, array<bigint>), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_l"

  override def nullSafeEval(a: Any, b: Any): Any =
    PqAdcImpl.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
         |Object $r = graft.functions.PqAdcImpl.compute($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $r).longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Runtime helper for [[IntersectSize]]. */
object IntersectSizeImpl {
  /** Count of DISTINCT common elements, null matching null — exactly
    * `size(array_intersect(a, b))` for array<string> inputs, without
    * building the intersection array. */
  def compute(a: ArrayData, b: ArrayData): Int = {
    val right = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var rightNull = false
    var i = 0
    val nb = b.numElements()
    while (i < nb) {
      val s = b.getUTF8String(i)
      if (s == null) rightNull = true else right.add(s)
      i += 1
    }
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var seenNull = false
    var n = 0
    var j = 0
    val na = a.numElements()
    while (j < na) {
      val s = a.getUTF8String(j)
      if (s == null) {
        if (rightNull && !seenNull) { n += 1; seenNull = true }
      } else if (right.contains(s) && seen.add(s)) n += 1
      j += 1
    }
    n
  }
}

/** `intersect_size(a, b)` ≡ `size(array_intersect(a, b))` for two
  * array<string> columns, as one codegen'd hash-probe pass with no
  * intersection-array allocation — the shape of the Jaccard verification
  * hot path, where candidates × array materialization is real memory
  * traffic at scale. Installed automatically by the optimizer rule
  * [[graft.plans.RewriteIntersectSize]]. */
case class IntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"intersect_size expects (array<string>, array<string>), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectSizeImpl.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.IntersectSizeImpl.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Registers the native expressions so operators can use them in
    * `expr(...)` strings. Registration is skipped when the name already
    * exists, so repeated calls (one per query build) stay silent —
    * createOrReplaceTempFunction would WARN-spam the driver log. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def add(name: String)(builder: Seq[Expression] => Expression): Unit =
      if (!reg.functionExists(FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    add("dot_l")(args => DotProductLong(args(0), args(1)))
    add("minhash_sigs")(args =>
      MinHashSigs(args(0), args(1).eval().asInstanceOf[Int]))
    add("lsh_bucket")(args =>
      LshBucket(args(0), args(1).eval().asInstanceOf[Int]))
    add("rp_project")(args =>
      RpProject(args(0), args(1).eval().asInstanceOf[Int]))
    add("intersect_size")(args => IntersectSize(args(0), args(1)))
    add("sparse_dot_l")(args =>
      SparseDotLong(args(0), args(1), args(2), args(3)))
    add("pq_adc_l")(args => PqAdcLong(args(0), args(1)))
    add("ngram_hashes")(args =>
      NGramHashes(args(0), args(1).eval().asInstanceOf[Int]))
    add("zorder2") { args =>
      if (args.length != 2) throw new IllegalArgumentException(
        s"zorder2 expects exactly 2 arguments, got ${args.length}")
      ZOrder2(args(0), args(1))
    }
  }
}
