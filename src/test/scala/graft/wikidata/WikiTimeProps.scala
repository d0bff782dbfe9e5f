package graft.wikidata

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for WikiTime (SURVEY §5): ordering consistency, carry
  * normalization, parser totality. */
class WikiTimeProps extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  val genTime: Gen[WTime] = for {
    y <- Gen.choose(-5000, 5000)
    mo <- Gen.choose(0, 11); d <- Gen.choose(0, 30)
    h <- Gen.choose(0, 23); mi <- Gen.choose(0, 59); s <- Gen.choose(0, 59)
  } yield WTime(y, mo, d, h, mi, s)

  test("toSortableLong orders exactly like the struct comparison") {
    check(Prop.forAll(genTime, genTime) { (a, b) =>
      (a.compare(b).sign) == (a.toSortableLong.compare(b.toSortableLong).sign)
    })
  }

  test("addSeconds keeps fields in range (normalization invariant)") {
    check(Prop.forAll(genTime, Gen.choose(-10000000, 10000000)) { (t, secs) =>
      val r = t.addSeconds(secs)
      r.month >= 0 && r.month < 12 && r.day >= 0 && r.day < 31 &&
        r.hour >= 0 && r.hour < 24 && r.minute >= 0 && r.minute < 60 &&
        r.second >= 0 && r.second < 60
    })
  }

  test("addSeconds is monotone in the offset") {
    check(Prop.forAll(genTime, Gen.choose(-100000, 100000),
        Gen.choose(0, 100000)) { (t, s, d) =>
      t.addSeconds(s) <= t.addSeconds(s + d)
    })
  }

  test("parse round-trips times the reference can emit") {
    val genParts = for {
      y <- Gen.choose(1, 9999); mo <- Gen.choose(1, 12); d <- Gen.choose(1, 28)
      h <- Gen.choose(0, 23); mi <- Gen.choose(0, 59); s <- Gen.choose(0, 59)
    } yield (y, mo, d, h, mi, s)
    check(Prop.forAll(genParts) { case (y, mo, d, h, mi, s) =>
      WikiTime.parse(f"+$y%04d-$mo%02d-$d%02dT$h%02d:$mi%02d:$s%02dZ", 0)
        .contains(WTime(y, mo - 1, d - 1, h, mi, s))
    })
  }

  test("parse never throws on arbitrary strings") {
    check(Prop.forAll(Gen.asciiPrintableStr, Gen.choose(-1440, 1440)) { (s, tz) =>
      WikiTime.parse(s, tz); true
    })
  }

  test("parseQuantity equals Long parsing after separator strip") {
    check(Prop.forAll(Gen.choose(0L, Long.MaxValue / 2)) { n =>
      WikiTime.parseQuantity(n.toString).contains(n) &&
        WikiTime.parseQuantity(f"+$n%,d").contains(n)
    })
  }
}
