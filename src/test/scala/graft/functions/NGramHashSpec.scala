package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** ngram_hashes must be bit-identical to the built-in expression chain the
  * DuckDB oracle evaluates:
  * `transform(sequence(1, size-n+1), i ->
  *    conv(substring(md5(concat_ws(' ', slice(toks, i, n))), 1, 15), 16, 10))`
  * — including the fewer-than-n-tokens empty result and concat_ws's
  * null-element skipping.
  */
class NGramHashSpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), p)
    assert(res.passed, res.status.toString)
  }

  private val genToks: Gen[Seq[Option[String]]] =
    Gen.chooseNum(0, 12).flatMap(len =>
      Gen.listOfN(len, Gen.frequency(
        8 -> Gen.oneOf("alpha", "beta", "gamma", "x", "12", "ümlaut", ""),
        1 -> Gen.const(null: String))).map(_.map(Option(_).filter(_ != null))))

  test("matches the built-in md5/conv gram chain bit for bit") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val builtin = """CASE WHEN size(toks) >= 5 THEN
      | transform(sequence(1, size(toks) - 4),
      |   i -> CAST(conv(substring(md5(concat_ws(' ', slice(toks, i, 5))), 1, 15), 16, 10) AS BIGINT))
      |ELSE CAST(array() AS array<bigint>) END""".stripMargin
    check(Prop.forAll(Gen.listOfN(5, genToks)) { rows =>
      val df = rows.map(r => Tuple1(r.map(_.orNull))).toDF("toks")
      val native = df.selectExpr("ngram_hashes(toks, 5)")
        .collect().map(_.getSeq[Long](0).toList).toList
      val reference = df.selectExpr(builtin)
        .collect().map(_.getSeq[Long](0).toList).toList
      native == reference
    })
  }
}
