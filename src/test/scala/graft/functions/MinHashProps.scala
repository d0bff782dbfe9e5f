package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests pinning the native MinHash expression to an independent
  * reference implementation of its definition: per shingle, h = first 8
  * hex digits of md5 as a 32-bit value; signature p = min over shingles of
  * (A(p)·h + B(p)) mod (2^31-1); null shingles skipped; all-null/empty →
  * null signature. */
class MinHashProps extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  /** Deliberately naive reference: hex-string round trip via format+parse. */
  private def referenceSig(shingles: Seq[Option[String]], k: Int): Seq[Option[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until k).map { p =>
      val vals = shingles.flatten.map { s =>
        val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val h = java.lang.Long.parseLong(hex.take(8), 16)
        (MinHashImpl.A(p) * h + MinHashImpl.B(p)) % MinHashImpl.Mod
      }
      if (vals.isEmpty) None else Some(vals.min)
    }
  }

  private def nativeSig(shingles: Seq[Option[String]], k: Int): Seq[Option[Long]] = {
    val arr = new GenericArrayData(
      shingles.map(_.map(UTF8String.fromString).orNull).toArray[Any])
    val out = MinHashImpl.compute(arr, k)
    (0 until k).map(i => if (out.isNullAt(i)) None else Some(out.getLong(i)))
  }

  private val genShingle: Gen[Option[String]] = Gen.frequency(
    9 -> Gen.alphaNumStr.map(s => Some(s.take(40))),
    2 -> Gen.asciiPrintableStr.map(s => Some(s.take(40))),
    1 -> Gen.const(None))

  test("native one-pass sigs equal the per-permutation reference") {
    check(Prop.forAll(Gen.listOfN(30, genShingle)) { shingles =>
      nativeSig(shingles, 8) == referenceSig(shingles, 8)
    })
  }

  test("empty and all-null shingle arrays give all-null signatures") {
    assert(nativeSig(Seq.empty, 8).forall(_.isEmpty))
    assert(nativeSig(Seq(None, None), 8).forall(_.isEmpty))
  }

  test("signatures are permutation-invariant and duplicate-invariant") {
    check(Prop.forAll(Gen.listOfN(20, genShingle)) { shingles =>
      val base = nativeSig(shingles, 8)
      nativeSig(shingles.reverse, 8) == base &&
        nativeSig(shingles ++ shingles, 8) == base
    })
  }
}
