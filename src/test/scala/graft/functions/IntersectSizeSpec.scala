package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** intersect_size must implement exactly size(array_intersect)'s value:
  * distinct common elements, null element matches null element, null
  * array → null result. Expected values computed independently in plain
  * Scala (the SQL expression itself can't be the reference — the
  * RewriteIntersectSize rule would rewrite it to the unit under test). */
class IntersectSizeSpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, res.status.toString)
  }

  private def expected(a: Option[Seq[Option[String]]],
      b: Option[Seq[Option[String]]]): Option[Int] =
    for (x <- a; y <- b) yield x.toSet.intersect(y.toSet).size

  private val genArr: Gen[Option[Seq[Option[String]]]] = Gen.frequency(
    9 -> Gen.listOfN(8, Gen.frequency(
      6 -> Gen.oneOf("a", "b", "c", "d", "", "x y").map(Option(_)),
      1 -> Gen.const(None))).map(l => Option(l: Seq[Option[String]])),
    1 -> Gen.const(None))

  test("matches an independent set-intersection reference") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    check(Prop.forAll(Gen.listOfN(6, Gen.zip(genArr, genArr))) { rows =>
      val got = rows.toDF("a", "b").selectExpr("intersect_size(a, b)")
        .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
      got.toSeq == rows.map { case (a, b) => expected(a, b) }
    })
  }
}
