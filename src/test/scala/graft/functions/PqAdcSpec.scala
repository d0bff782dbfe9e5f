package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** pq_adc_l must equal the HOF form it replaced on the ADC hot path:
  * `aggregate(zip_with(luts, codes, (mp, cd) -> element_at(mp, cd)), 0L,
  * (acc, x) -> acc + x)` — Σ_m luts[m][codes[m]], null as soon as any
  * code is missing from its codebook LUT. The HOF form itself is the
  * reference (no rewrite rule touches it), evaluated side by side. */
class PqAdcSpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), p)
    assert(res.passed, res.status.toString)
  }

  private val genRow: Gen[(Seq[Map[Long, Long]], Seq[Long])] = for {
    m <- Gen.choose(1, 5)
    luts <- Gen.listOfN(m, Gen.mapOfN(6,
      Gen.zip(Gen.choose(0L, 7L), Gen.choose(-100L, 100L))))
    // mostly-present codes, sometimes a missing key (the null path)
    codes <- Gen.listOfN(m, Gen.frequency(
      8 -> Gen.choose(0L, 7L), 1 -> Gen.const(99L)))
  } yield (luts.map(l => l: Map[Long, Long]), codes.map(identity))

  test("equals the interpreted aggregate/zip_with/element_at form") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    check(Prop.forAll(Gen.listOfN(5, genRow)) { rows =>
      val df = rows.toDF("mps", "codes")
      val got = df.selectExpr("pq_adc_l(mps, codes)").collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
      val ref = df.selectExpr(
        "aggregate(zip_with(mps, codes, (mp, cd) -> element_at(mp, cd)), " +
          "0L, (acc, x) -> acc + x)").collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
      got.toSeq == ref.toSeq
    })
  }
}
