package graft.wikidata

/** WikiData time handling, replicating the reference's semantics exactly
  * (/root/reference/src/wiki_time.rs).
  *
  * Quirks preserved on purpose (SURVEY.md §7.4 #3):
  *  - month and day are stored 0-BASED via saturating subtraction, so both
  *    `"00"` (precision < month) and `"01"` map to 0 (wiki_time.rs:116-121);
  *  - years may be negative or have more than 4 digits (`+2001`, `-0500`);
  *  - the timezone offset (minutes) is added with a naive carry that assumes
  *    31-day months (wiki_time.rs:36-68, "close enough" comment :57);
  *  - comparison is plain lexicographic on (year, month, day, h, m, s) —
  *    NOT TimestampType semantics, which would reject year 0 / month 00.
  */
final case class WTime(year: Int, month: Int, day: Int,
    hour: Int, minute: Int, second: Int) extends Ordered[WTime] {

  def compare(o: WTime): Int = {
    if (year != o.year) return year.compare(o.year)
    if (month != o.month) return month.compare(o.month)
    if (day != o.day) return day.compare(o.day)
    if (hour != o.hour) return hour.compare(o.hour)
    if (minute != o.minute) return minute.compare(o.minute)
    second.compare(o.second)
  }

  /** Naive carry, wiki_time.rs:36-68: 60 s, 60 min, 24 h, 31-day months
    * ("close enough"), 12 months. */
  def addSeconds(seconds: Int): WTime = {
    var y = year; var mo = month; var d = day
    var h = hour; var mi = minute; var s = second + seconds
    @inline def carry(smol: Int, upper: Int): (Int, Int) = {
      var v = smol; var borrow = 0
      while (v < 0) { borrow -= 1; v += upper }
      while (v >= upper) { borrow += 1; v -= upper }
      (v, borrow)
    }
    val (s2, cm) = carry(s, 60); s = s2; mi += cm
    val (mi2, ch) = carry(mi, 60); mi = mi2; h += ch
    val (h2, cd) = carry(h, 24); h = h2; d += cd
    val (d2, cmo) = carry(d, 31); d = d2; mo += cmo
    val (mo2, cy) = carry(mo, 12); mo = mo2; y += cy
    WTime(y, mo, d, h, mi, s)
  }

  /** Sortable encoding for Spark columns: a struct would also work, but a
    * single long keeps window/group comparisons codegen-friendly. Fields are
    * small (month/day/h/m/s < 64) so 6-bit packing is exact; year is offset
    * so negative years order correctly. */
  def toSortableLong: Long = {
    require(month < 64 && day < 64 && hour < 64 && minute < 64 && second < 64)
    // 6 bits per field, disjoint shifts (minute/second are 0-59 and NEED all
    // 6 — a 5-bit slot makes (h=0, m=32) collide with (h=1, m=0)).
    (((year.toLong + 1000000L) << 30)
      | (month.toLong << 24) | (day.toLong << 18)
      | (hour.toLong << 12) | (minute.toLong << 6) | second.toLong)
  }
}

object WikiTime {

  /** Parse `±y+-mm-ddThh:mm:ssZ` + timezone minutes, wiki_time.rs:99-137.
    * Returns None exactly where the reference returns Err (which callers
    * treat as "unparseable → ignore the qualifier"). */
  def parse(datetime: String, tzMinutes: Int): Option[WTime] = {
    val tIdx = datetime.indexOf('T')
    if (tIdx < 0) return None // no time part
    val date = datetime.substring(0, tIdx)
    val time = datetime.substring(tIdx + 1)
    if (date.length < 1) return None
    // skip any sign on the year (first character) when locating the dash
    val dashRel = date.indexOf('-', 1)
    if (dashRel < 0) return None // no date dash
    if (date.length < dashRel + 4) return None // date too short
    if (time.isEmpty) return None
    val timeParts = time.substring(0, time.length - 1).split(":", -1)
    if (timeParts.length < 3) return None
    def u16(s: String): Option[Int] = // Rust u16 parse: digits only (no sign)
      if (s.nonEmpty && s.forall(_.isDigit))
        try Some(s.toInt) catch { case _: NumberFormatException => None }
      else None
    def i32(s: String): Option[Int] = // Rust i32 parse accepts leading +/-
      try Some(s.toInt) catch { case _: NumberFormatException => None }
    for {
      year <- i32(date.substring(0, dashRel))
      monthRaw <- u16(date.substring(dashRel + 1, dashRel + 3))
      dayRaw <- u16(date.substring(dashRel + 4))
      hour <- u16(timeParts(0))
      minute <- u16(timeParts(1))
      second <- u16(timeParts(2))
    } yield WTime(year, math.max(monthRaw - 1, 0), math.max(dayRaw - 1, 0),
      hour, minute, second).addSeconds(tzMinutes * 60)
  }

  /** The reference evaluates validity against wall-clock now (wiki_time.rs:
    * 70-82, 0-based fields). We inject it for reproducibility. */
  def now(): WTime = {
    val n = java.time.ZonedDateTime.now(java.time.ZoneOffset.UTC)
    WTime(n.getYear, n.getMonthValue - 1, n.getDayOfMonth - 1,
      n.getHour, n.getMinute, n.getSecond)
  }

  /** is_object_start_active (wiki_time.rs:139-163): None if no P580
    * qualifier; Some(false) iff P580[0] carries a parseable time in the
    * future; Some(true) otherwise (including unparseable / non-value).
    * Inputs are the pieces of `qualifiers.P580[0]`. */
  def startActive(hasP580: Boolean, snaktype: String, time: String,
      tzMinutes: java.lang.Long, now: WTime): Option[Boolean] = {
    if (!hasP580) return None
    if (snaktype == "value" && time != null && tzMinutes != null) {
      parse(time, tzMinutes.toInt) match {
        case Some(t) if t > now => return Some(false)
        case _ => ()
      }
    }
    Some(true)
  }

  /** is_object_end_active (wiki_time.rs:165-189): symmetric with P582 < now. */
  def endActive(hasP582: Boolean, snaktype: String, time: String,
      tzMinutes: java.lang.Long, now: WTime): Option[Boolean] = {
    if (!hasP582) return None
    if (snaktype == "value" && time != null && tzMinutes != null) {
      parse(time, tzMinutes.toInt) match {
        case Some(t) if t < now => return Some(false)
        case _ => ()
      }
    }
    Some(true)
  }

  /** is_object_active (wiki_time.rs:191-201): true iff no qualifiers object
    * at all, else neither ended nor not-yet-started. */
  def active(hasQualifiers: Boolean,
      hasP580: Boolean, startSnaktype: String, startTime: String, startTz: java.lang.Long,
      hasP582: Boolean, endSnaktype: String, endTime: String, endTz: java.lang.Long,
      now: WTime): Boolean = {
    if (!hasQualifiers) return true
    if (endActive(hasP582, endSnaktype, endTime, endTz, now).contains(false)) return false
    if (startActive(hasP580, startSnaktype, startTime, startTz, now).contains(false)) return false
    true
  }

  /** parse_quantity (wiki_data_line.rs:507-523): strip whitespace plus
    * `,`/`.`/`+`, then parse as unsigned integer. `"1.5"` → 15 — the quirk is
    * load-bearing (SURVEY §7.4 #6). */
  def parseQuantity(n: String): Option[Long] = {
    if (n == null) return None
    val kept = n.filterNot(c => c.isWhitespace || c == ',' || c == '.' || c == '+')
    if (kept.nonEmpty && kept.forall(_.isDigit))
      try Some(java.lang.Long.parseLong(kept)) catch { case _: NumberFormatException => None }
    else None
  }
}
