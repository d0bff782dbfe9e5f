package graft.wikidata

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the WikiData time parser and validity predicates —
  * the quirk inventory of /root/reference/src/wiki_time.rs (SURVEY §7.4 #3)
  * and parse_quantity (wiki_data_line.rs:507-523, §7.4 #6). */
class WikiTimeSpec extends AnyFunSuite {

  test("plain date parses with 0-based month and day") {
    assert(WikiTime.parse("+2001-12-31T00:00:00Z", 0)
      .contains(WTime(2001, 11, 30, 0, 0, 0)))
  }

  test("month and day 00 (low precision) saturate to 0, same as 01") {
    assert(WikiTime.parse("+2001-00-00T00:00:00Z", 0)
      .contains(WTime(2001, 0, 0, 0, 0, 0)))
    assert(WikiTime.parse("+2001-01-01T00:00:00Z", 0)
      .contains(WTime(2001, 0, 0, 0, 0, 0)))
  }

  test("negative and long years parse") {
    assert(WikiTime.parse("-0500-01-01T00:00:00Z", 0)
      .contains(WTime(-500, 0, 0, 0, 0, 0)))
    assert(WikiTime.parse("+12001-06-15T12:30:45Z", 0)
      .contains(WTime(12001, 5, 14, 12, 30, 45)))
  }

  test("timezone carry is naive 31-day-month arithmetic") {
    // +60 min at 23:30 on the last (0-based 30th) day of a 0-based month 11
    // rolls year: 2001-11-30T23:30 + 1h -> 2002-00-00T00:30
    assert(WikiTime.parse("+2001-12-31T23:30:00Z", 60)
      .contains(WTime(2002, 0, 0, 0, 30, 0)))
    // negative offset borrows through the 31-day month assumption
    assert(WikiTime.parse("+2001-01-01T00:00:00Z", -1)
      .contains(WTime(2000, 11, 30, 23, 59, 0)))
  }

  test("malformed strings return None like the reference returns Err") {
    assert(WikiTime.parse("2001-12-31", 0).isEmpty)      // no time part
    assert(WikiTime.parse("+2001T00:00:00Z", 0).isEmpty) // no date dash
    assert(WikiTime.parse("+2001-12T00:00:00Z", 0).isEmpty) // too short
    assert(WikiTime.parse("+2001-12-31T00:00Z", 0).isEmpty) // missing seconds
  }

  test("ordering is lexicographic on the struct") {
    val a = WTime(2000, 5, 10, 0, 0, 0)
    val b = WTime(2000, 5, 10, 0, 0, 1)
    val c = WTime(-1, 11, 30, 23, 59, 59)
    assert(a < b); assert(c < a)
    assert(a.toSortableLong < b.toSortableLong)
    assert(c.toSortableLong < a.toSortableLong)
  }

  test("toSortableLong gives every field 6 bits (minute 32 vs hour 1)") {
    // The regression: with a 5-bit minute slot, (h=0, m=32) == (h=1, m=0).
    val m32 = WTime(2000, 0, 0, 0, 32, 0)
    val h1 = WTime(2000, 0, 0, 1, 0, 0)
    assert(m32 < h1)
    assert(m32.toSortableLong < h1.toSortableLong)
    // And the same boundary for seconds vs minutes.
    val s32 = WTime(2000, 0, 0, 0, 0, 32)
    val m1 = WTime(2000, 0, 0, 0, 1, 0)
    assert(s32.toSortableLong < m1.toSortableLong)
  }

  val now = WTime(2026, 7, 11, 0, 0, 0)

  test("startActive tri-state") {
    assert(WikiTime.startActive(hasP580 = false, null, null, null, now).isEmpty)
    // future start -> Some(false)
    assert(WikiTime.startActive(hasP580 = true, "value", "+2030-01-01T00:00:00Z", 0L, now)
      .contains(false))
    // past start -> Some(true)
    assert(WikiTime.startActive(hasP580 = true, "value", "+2000-01-01T00:00:00Z", 0L, now)
      .contains(true))
    // unparseable / non-value snak -> Some(true)
    assert(WikiTime.startActive(hasP580 = true, "value", "garbage", 0L, now).contains(true))
    assert(WikiTime.startActive(hasP580 = true, "somevalue", null, null, now).contains(true))
  }

  test("endActive tri-state") {
    assert(WikiTime.endActive(hasP582 = false, null, null, null, now).isEmpty)
    assert(WikiTime.endActive(hasP582 = true, "value", "+2000-01-01T00:00:00Z", 0L, now)
      .contains(false)) // already ended
    assert(WikiTime.endActive(hasP582 = true, "value", "+2030-01-01T00:00:00Z", 0L, now)
      .contains(true))
  }

  test("parseQuantity strips separators including the dot quirk") {
    assert(WikiTime.parseQuantity("+12,345").contains(12345L))
    assert(WikiTime.parseQuantity("1.5").contains(15L)) // deliberate quirk
    assert(WikiTime.parseQuantity(" 1 234 ").contains(1234L))
    assert(WikiTime.parseQuantity("12345").contains(12345L))
    assert(WikiTime.parseQuantity("-5").isEmpty) // u64 parse fails
    assert(WikiTime.parseQuantity("abc").isEmpty)
    assert(WikiTime.parseQuantity("").isEmpty)
  }
}
