package graft.wikidata

import graft.SparkSpec

/** The synthetic dump generator's contract: every table count is a CLOSED
  * FORM of n (the branch mix is deterministic per 1000-index block), so the
  * multi-GB ingest measurement is self-verifying — the same formulas this
  * spec pins at n=2000 are re-checked at 5M+ after the timed run. Per block:
  * 1 country, 1 language, 40 TEs, 1 excluded, 1 tombstoned (dropped),
  * 1 exemption-kept city, 1 missing-P17 settlement, 1 dissolved (dropped),
  * 1 POISON line (parse-skipped), 952 plain cities (one of which is the
  * >64 KiB unicode-escape/deep-nesting pathology city) → 953 cities, and
  * the dropped/excluded/poison ids must appear in NO table. */
class DumpGenSpec extends SparkSpec {

  private val n = 2000L

  private lazy val lines = {
    import spark.implicits._
    val nn = n // local copy: the closure must not capture the spec class
    spark.range(0, nn, 1, 4)
      .map(i => DumpGen.entityJson(i, nn)).toDF("value")
  }

  private lazy val tables: Extract.Tables =
    Extract(Extract.parse(lines), ClassSets.seedsOnly,
      WikiTime.parse("+2026-01-01T00:00:00Z", 0).get)

  test("table counts match the generator's closed forms") {
    val blocks = n / 1000
    assert(tables.countries.count() == blocks)
    assert(tables.languages.count() == blocks)
    // 40 plain TEs + 50 dual-typed city+TE entities per block
    assert(tables.territorialEntities.count() == 90 * blocks)
    assert(tables.cities.count() == 953 * blocks)
    assert(tables.missingP17.count() == blocks)
    // each city has exactly one ACTIVE P17 claim (claim [0] is P582-expired)
    assert(tables.citiesCountries.count() == 953 * blocks)
    // countries carry 2 distinct active P37s (the third is P582-expired,
    // blocks ≥ 2 makes la/lb distinct) + each TE (plain 40 + dual 50) one
    // → 92 rows/block; the dual rows are the ones that survive to the
    // final cities_languages table in post
    assert(tables.objectLanguages.count() == 92 * blocks)
  }

  test("the poison budget is exact: PERMISSIVE parse skips 1 line per block, " +
      "and the poison id reaches no table") {
    val blocks = n / 1000
    assert(lines.count() == n)
    assert(Extract.parse(lines).count() == n - blocks,
      "exactly the poison lines must fail the tokenizer")
    val cityIds = tables.cities.collect().map(_.id).toSet
    assert(!cityIds.contains("Q98")) // i=97: the truncated poison line
  }

  test("the pathology city survives intact: >64 KiB line, escaped labels " +
      "decode to the closed-form values, deep nesting is streamed past") {
    import spark.implicits._
    assert(DumpGen.entityJson(1098, n).length > 65536,
      "the m==98 line must exceed the 64 KiB tokenizer comfort zone")
    val e = Extract.parse(lines).filter((e: Entity) =>
      e.id.contains("Q1099")).collect()
    assert(e.length == 1, "the pathology city must parse")
    val labels = tables.objectLabels.filter((r: ObjectLabelRow) => r.id == "Q1099")
      .collect().map(r => r.lang -> r.label).toMap
    assert(labels.get("en").contains("Entity 1098"),
      s"escaped-ascii en label must decode to the plain closed-form value: $labels")
    assert(labels.get("zh-hans").exists(_.startsWith("城市")),
      s"escaped CJK must decode to real codepoints: $labels")
  }

  test("tombstoned/dissolved/excluded indices emit nothing; exemption is kept") {
    val cityIds = tables.cities.collect().map(_.id).toSet
    assert(!cityIds.contains("Q44"))   // i=43: P1366 without P518 — dropped
    assert(!cityIds.contains("Q47"))   // i=46: P576 dissolved — dropped
    assert(!cityIds.contains("Q43"))   // i=42: excluded class
    assert(cityIds.contains("Q45"))    // i=44: P1366 WITH P518 — kept
    assert(cityIds.contains("Q48"))    // i=47: plain city
  }

  test("population argmax picks the dated claim and skips the P518 one") {
    // i=47 ⇒ pop base p, dated 2p, disqualified 100p ⇒ stored 2p·10
    // (quantity parser strips '.'; amounts are integers here so ×10 only
    // applies via parse_quantity's milli-less form — assert relative: the
    // stored population is exactly 2× the base claim, never 100×.)
    val rows = tables.cities.collect().map(r => r.id -> r.population).toMap
    val p48 = rows("Q48")
    assert(p48.isDefined)
    // reconstruct the base from the generator's own mixer
    val h = {
      var z = 47L + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val base = math.abs(h % 1000000L) + 50
    assert(p48.get == 2 * base, s"expected dated 2×$base, got ${p48.get}")
  }
}
