package graft.wikidata

import graft.SparkSpec

/** Golden tests for the extraction pass — automated versions of the
  * reference's `entity` debug subcommand (/root/reference/src/main.rs:236-289)
  * over hand-built fixtures covering the tricky branches (SURVEY §5):
  * tombstones with the applies-to-part exemption, priority 1000+i, population
  * qualifier exclusions, P1705-vs-P1448 fallback, emission-order indexes. */
class ExtractSpec extends SparkSpec {

  val classes: ClassSets = ClassSets(
    territorialEntities = Set("QTE"),
    humanSettlements = Set("QHS"),
    excluded = Set("QPRISON"),
    excludedSettlements = Set("QEXHS"),
    secondLevelAdminDiv = Set("Q2ND"),
    languages = Set("QLANG"))

  val now: WTime = WTime(2026, 7, 11, 0, 0, 0)

  private def idClaim(target: String, quals: String = ""): String =
    s"""{"mainsnak":{"snaktype":"value","datavalue":{"value":{"id":"$target"}}}$quals}"""

  // Fixture entity lines (NDJSON with dump framing: [ , trailing commas, ]).
  val lines: Seq[String] = Seq(
    "[",
    // Q1: country (P297 DE) + TE; official languages L1, L2 (second inactive-ended -> skipped)
    """{"id":"Q1","labels":{"en":{"language":"en","value":"Germany"},"de":{"language":"de","value":"Deutschland"}},"claims":{
      "P31":[{"mainsnak":{"snaktype":"value","datavalue":{"value":{"id":"QTE"}}}}],
      "P297":[{"mainsnak":{"snaktype":"value","datavalue":{"value":"DE"}}}],
      "P37":[{"mainsnak":{"snaktype":"value","datavalue":{"value":{"id":"L1"}}}},
             {"mainsnak":{"snaktype":"value","datavalue":{"value":{"id":"LDEAD"}}},"qualifiers":{"P582":[{"snaktype":"value","datavalue":{"value":{"time":"+2000-01-01T00:00:00Z","timezone":0}}}]}},
             {"mainsnak":{"snaktype":"value","datavalue":{"value":{"id":"L2"}}}}]}},""".replaceAll("\n\\s*", ""),
    // Q2: TE + 2nd-level with ISO; parent edge to Q1
    """{"id":"Q2","labels":{"de":{"language":"de","value":"Bayern"}},"claims":{
      "P31":[{"mainsnak":{"snaktype":"value","datavalue":{"value":{"id":"QTE"}}}},
             {"mainsnak":{"snaktype":"value","datavalue":{"value":{"id":"Q2ND"}}}}],
      "P300":[{"mainsnak":{"snaktype":"value","datavalue":{"value":"DE-BY"}}}],
      "P131":[{"mainsnak":{"snaktype":"value","datavalue":{"value":{"id":"Q1"}}}}]}},""".replaceAll("\n\\s*", ""),
    // Q3: settlement in Q2; population claims exercise B13; native labels P1705
    """{"id":"Q3","labels":{"de":{"language":"de","value":"München"},"en":{"language":"en","value":"Munich"}},"claims":{
      "P31":[{"mainsnak":{"snaktype":"value","datavalue":{"value":{"id":"QHS"}}}}],
      "P17":[{"mainsnak":{"snaktype":"value","datavalue":{"value":{"id":"Q1"}}},"qualifiers":{"P580":[{"snaktype":"value","datavalue":{"value":{"time":"+1949-01-01T00:00:00Z","timezone":0}}}]}}],
      "P131":[{"mainsnak":{"snaktype":"value","datavalue":{"value":{"id":"Q2"}}}}],
      "P625":[{"mainsnak":{"snaktype":"value","datavalue":{"value":{"latitude":48.137,"longitude":11.575}}}}],
      "P1082":[
        {"mainsnak":{"snaktype":"value","datavalue":{"value":{"amount":"+1,400,000","unit":"1"}}},"qualifiers":{"P585":[{"snaktype":"value","datavalue":{"value":{"time":"+2015-00-00T00:00:00Z","timezone":0}}}]}},
        {"mainsnak":{"snaktype":"value","datavalue":{"value":{"amount":"+1,500,000","unit":"1"}}},"qualifiers":{"P585":[{"snaktype":"value","datavalue":{"value":{"time":"+2020-00-00T00:00:00Z","timezone":0}}}]}},
        {"mainsnak":{"snaktype":"value","datavalue":{"value":{"amount":"+9,999,999","unit":"1"}}},"qualifiers":{"P585":[{"snaktype":"value","datavalue":{"value":{"time":"+2024-00-00T00:00:00Z","timezone":0}}}],"P518":[{"snaktype":"value"}]}},
        {"mainsnak":{"snaktype":"value","datavalue":{"value":{"amount":"+777","unit":"1"}}}}],
      "P1705":[{"mainsnak":{"snaktype":"value","datavalue":{"value":{"text":"München","language":"de"}}}}]}},""".replaceAll("\n\\s*", ""),
    // Q4: settlement but excluded (prison)
    """{"id":"Q4","labels":{"en":{"language":"en","value":"Jail"}},"claims":{
      "P31":[{"mainsnak":{"snaktype":"value","datavalue":{"value":{"id":"QHS"}}}},
             {"mainsnak":{"snaktype":"value","datavalue":{"value":{"id":"QPRISON"}}}}],
      "P17":[{"mainsnak":{"snaktype":"value","datavalue":{"value":{"id":"Q1"}}}}]}},""".replaceAll("\n\\s*", ""),
    // Q5: tombstoned (replaced-by, no applies-to-part)
    """{"id":"Q5","claims":{
      "P31":[{"mainsnak":{"snaktype":"value","datavalue":{"value":{"id":"QHS"}}}}],
      "P17":[{"mainsnak":{"snaktype":"value","datavalue":{"value":{"id":"Q1"}}}}],
      "P1366":[{"mainsnak":{"snaktype":"value","datavalue":{"value":{"id":"Q999"}}}}]}},""".replaceAll("\n\\s*", ""),
    // Q6: replaced-by WITH applies-to-part exemption -> processed; P1448 fallback labels (one inactive)
    """{"id":"Q6","labels":{"fr":{"language":"fr","value":"Strasbourg"}},"claims":{
      "P31":[{"mainsnak":{"snaktype":"value","datavalue":{"value":{"id":"QHS"}}}}],
      "P17":[{"mainsnak":{"snaktype":"value","datavalue":{"value":{"id":"Q1"}}}},
             {"mainsnak":{"snaktype":"value","datavalue":{"value":{"id":"QFALLEN"}}},"qualifiers":{"P582":[{"snaktype":"value","datavalue":{"value":{"time":"+1918-11-11T00:00:00Z","timezone":0}}}]}}],
      "P1366":[{"mainsnak":{"snaktype":"value","datavalue":{"value":{"id":"Q998"}}},"qualifiers":{"P518":[{"snaktype":"value"}]}}],
      "P1448":[{"mainsnak":{"snaktype":"value","datavalue":{"value":{"text":"Vieux nom","language":"fr"}}},"qualifiers":{"P582":[{"snaktype":"value","datavalue":{"value":{"time":"+1900-01-01T00:00:00Z","timezone":0}}}]}},
               {"mainsnak":{"snaktype":"value","datavalue":{"value":{"text":"Strasbourg","language":"fr"}}}}]}},""".replaceAll("\n\\s*", ""),
    // Q7: settlement with no P17 at all -> missing_p17, nothing else
    """{"id":"Q7","labels":{"en":{"language":"en","value":"Ghost"}},"claims":{
      "P31":[{"mainsnak":{"snaktype":"value","datavalue":{"value":{"id":"QHS"}}}}],
      "P131":[{"mainsnak":{"snaktype":"value","datavalue":{"value":{"id":"Q2"}}}}]}},""".replaceAll("\n\\s*", ""),
    // Q8: language entity
    """{"id":"Q8","claims":{
      "P31":[{"mainsnak":{"snaktype":"value","datavalue":{"value":{"id":"QLANG"}}}}],
      "P424":[{"mainsnak":{"snaktype":"value","datavalue":{"value":"de"}}}]}},""".replaceAll("\n\\s*", ""),
    "]")

  lazy val tables: Extract.Tables = {
    import spark.implicits._
    Extract(Extract.parse(lines.toDF("value")), classes, now)
  }

  test("tombstone filter drops Q5 but keeps the applies-to-part exemption Q6") {
    val ids = tables.entities.collect().flatMap(_.id).toSet
    assert(!ids.contains("Q5"))
    assert(ids.contains("Q6"))
  }

  test("countries: first active P297 entry, lowercased") {
    assert(tables.countries.collect().toSet == Set(CountryRow("Q1", "de")))
  }

  test("object languages: emission-order index skips inactive claims") {
    val rows = tables.objectLanguages.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // LDEAD ended -> skipped; L2 takes index 1 (B6, SURVEY §7.4 #7)
    assert(rows == Set(("Q1", "L1", 0L), ("Q1", "L2", 1L)))
  }

  test("territorial entities: is_2nd + ISO only for 2nd-level") {
    val rows = tables.territorialEntities.collect().toSet
    assert(rows == Set(
      TERow("Q1", is_2nd = false, None),
      TERow("Q2", is_2nd = true, Some("DE-BY"))))
  }

  test("parent edges from TEs and P17-bearing settlements only") {
    val rows = tables.teParents.collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // Q7 (missing P17) contributes no edge despite having P131
    assert(rows == Set(("Q2", "Q1"), ("Q3", "Q2")))
  }

  test("cities: excluded settlements (Q4 prison) never become cities") {
    val rows = tables.cities.collect().map(r => r.id -> r).toMap
    assert(rows.keySet == Set("Q3", "Q6"))
  }

  test("city Q3 picks the 2020 population, not the P518 2024 or undated one") {
    val q3 = tables.cities.collect().find(_.id == "Q3").get
    assert(q3.population.contains(1500000L))
    assert(q3.lat.contains(48.137) && q3.lon.contains(11.575))
  }

  test("cities_countries: priority i for dated starts, 1000+i otherwise; inactive skipped") {
    val rows = tables.citiesCountries.collect().toSet
    assert(rows == Set(
      CityCountryRow("Q3", 0L, "Q1"),    // has P580 -> priority = index 0
      CityCountryRow("Q6", 1000L, "Q1")  // no qualifiers -> 1000 + 0
    ))
  }

  test("missing P17 side output") {
    assert(tables.missingP17.collect().toSet == Set(MissingP17Row("Q7")))
  }

  test("native labels: P1705 wins; P1448 fallback skips inactive claims") {
    val labels = tables.objectLabels.collect()
    val q3native = labels.filter(l => l.id == "Q3" && l.native_order.isDefined)
    assert(q3native.toSet == Set(ObjectLabelRow("Q3", "de", "München", Some(0L))))
    val q6native = labels.filter(l => l.id == "Q6" && l.native_order.isDefined)
    // the 1900-ended "Vieux nom" is skipped; Strasbourg takes order 0
    assert(q6native.toSet == Set(ObjectLabelRow("Q6", "fr", "Strasbourg", Some(0L))))
  }

  test("languages table") {
    assert(tables.languages.collect().toSet == Set(LanguageRow("Q8", "de")))
  }
}
