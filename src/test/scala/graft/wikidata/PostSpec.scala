package graft.wikidata

import org.apache.spark.sql.Row
import graft.SparkSpec

/** End-to-end test of the post-processing cascade on a synthetic geo world
  * (SURVEY §5: countries / TE graph / cities with known expected labels after
  * the full 4-tier cascade + cleanup). Covers every stage:
  *   X1 native labels · X2 recursive ancestor-language · X3 country-language
  *   merge · X4 Esperanto-fallback survival · X5 unlabeled deletion ·
  *   X6 dead-country deletion · subdivision label tiers via T2/TB.
  */
class PostSpec extends SparkSpec {
  import spark.implicits._

  // the 8 input tables, reused by the full-post result and the split
  // cascade/cleanup (--no-cleanup / --only-cleanup) cases
  lazy val inputs: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val countries = Seq(("C1", "de"), ("C2", "fr")).toDF("id", "iso")
    val languages = Seq(("LDE", "de"), ("LFR", "fr"), ("LEO", "eo"),
      ("LZH", "zh")).toDF("id", "code")
    val objectLanguages = Seq(
      ("C1", "LDE", 0L),
      ("C2", "LFR", 0L), ("C2", "LDE", 1L),
      ("T1", "LZH", 0L),
      ("X1", "LDE", 0L)
    ).toDF("id", "lang_id", "lang_index")
    val tes = Seq(
      ("T1", false, None), ("T2", true, Some("DE-X")),
      ("T3", false, None), ("TB", true, Some("DE-B"))
    ).toDF("id", "is_2nd", "iso")
    val teParents = Seq(
      ("X2", "T1"), ("T1", "T2"), ("T2", "T3"), ("X1", "TB"), ("X3", "T2")
    ).toDF("id", "parent")
    val cities = Seq(
      ("X1", Some(1000L)), ("X2", None), ("X3", None),
      ("X4", None), ("X5", None), ("X6", None)
    ).toDF("id", "population")
      .withColumn("lat", org.apache.spark.sql.functions.lit(null).cast("double"))
      .withColumn("lon", org.apache.spark.sql.functions.lit(null).cast("double"))
    val citiesCountries = Seq(
      ("X1", 0L, "C1"), ("X2", 1000L, "C1"),
      ("X3", 0L, "C2"), ("X3", 1L, "C1"),
      ("X4", 1000L, "C1"), ("X5", 0L, "C1"), ("X6", 1000L, "CDEAD")
    ).toDF("city", "priority", "country")
    val objectLabels = Seq(
      ("X1", "de", "Alpha", None), ("X1", "de", "AlphaNative", Some(0L)),
      ("X1", "en", "AlphaEn", Some(1L)), ("X1", "en", "AlphaOld", Some(2L)),
      ("X2", "zh-hans", "Zhongwen", None), ("X2", "en", "X2En", None),
      ("X3", "fr", "Ville", None), ("X3", "de", "Stadt", None),
      ("X4", "eo", "Urbo", None),
      ("X6", "de", "Tot", None),
      ("T2", "zh", "T2zh", None), ("T2", "eo", "T2eo", None),
      ("T2", "de", "T2de", None),
      ("TB", "de", "TBde", None)
    ).toDF("id", "lang", "label", "native_order")

    (countries, objectLanguages, languages, tes, teParents,
      cities, citiesCountries, objectLabels)
  }

  lazy val result: Post.FinalTables = {
    val (countries, objectLanguages, languages, tes, teParents,
      cities, citiesCountries, objectLabels) = inputs
    Post(countries, objectLanguages, languages, tes, teParents,
      cities, citiesCountries, objectLabels)
  }

  test("--no-cleanup half (cascade): enriched schema, every input city survives " +
      "(pruning is the cleanup's business — main.rs:98-111 flag parity)") {
    val (countries, objectLanguages, languages, tes, teParents,
      cities, citiesCountries, objectLabels) = inputs
    val enriched = Post.cascade(countries, objectLanguages, languages, tes,
      teParents, cities, citiesCountries, objectLabels)
    assert(enriched.columns.toSet == Set("id", "country", "population",
      "lat", "lon", "2nd_id", "native_label", "eo_label",
      "2nd_native_label", "2nd_eo_label", "2nd_iso"), enriched.columns.toSeq)
    val ids = enriched.select("id").collect().map(_.getString(0)).toSet
    assert(ids == Set("X1", "X2", "X3", "X4", "X5", "X6"),
      s"the cascade must keep unlabeled/dead-country cities: $ids")
  }

  test("--only-cleanup half composes: cleanup over the cascade's output equals " +
      "the one-shot post") {
    val (countries, objectLanguages, languages, tes, teParents,
      cities, citiesCountries, objectLabels) = inputs
    val enriched = Post.cascade(countries, objectLanguages, languages, tes,
      teParents, cities, citiesCountries, objectLabels)
    val split = Post.cleanup(countries, objectLanguages, languages,
      objectLabels, enriched)
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    assert(rows(split.cities) == rows(result.cities))
    assert(rows(split.citiesLabels) == rows(result.citiesLabels))
    assert(rows(split.citiesLanguages) == rows(result.citiesLanguages))
  }

  lazy val byId: Map[String, Row] =
    result.cities.collect().map(r => r.getString(0) -> r).toMap

  test("survivors: X5 (no labels) and X6 (dead country) are deleted") {
    assert(byId.keySet == Set("X1", "X2", "X3", "X4"))
  }

  test("country pick: min priority wins and Q-id is repointed to ISO") {
    assert(byId("X1").getString(1) == "de")
    assert(byId("X3").getString(1) == "fr") // priority 0 (C2) beats 1 (C1)
  }

  test("stage 3: native labels, distinct + sorted, ' / ' joined") {
    assert(byId("X1").getString(6) == "AlphaEn / AlphaNative")
  }

  test("stage 4: recursive ancestor-language label (zh-hans matches zh)") {
    assert(byId("X2").getString(6) == "Zhongwen")
  }

  test("stage 5: country-language two-slot merge") {
    assert(byId("X3").getString(6) == "Ville / Stadt")
  }

  test("stage 6: Esperanto-preferred fallback label") {
    assert(byId("X4").isNullAt(6))            // native never found
    assert(byId("X4").getString(7) == "Urbo") // eo wins
    assert(byId("X1").getString(7) == "Alpha") // no eo -> min (lang, label)
    assert(byId("X3").getString(7) == "Stadt") // de sorts before fr
  }

  test("subdivision: deepest is_2nd ancestor and its label cascade") {
    assert(byId("X2").getString(5) == "T2")       // 2nd_id via T1 -> T2
    assert(byId("X3").getString(5) == "T2")
    assert(byId("X1").getString(5) == "TB")
    // T2 has no native/recursive labels -> country tier: de label of T2
    assert(byId("X2").getString(8) == "T2de")
    assert(byId("X3").getString(8) == "T2de")
    // TB via X1's country language de
    assert(byId("X1").getString(8) == "TBde")
    // Esperanto tier: T2 has an eo label, TB only de
    assert(byId("X2").getString(9) == "T2eo")
    assert(byId("X1").getString(9) == "TBde")
    // ISO from the is_2nd TE row
    assert(byId("X2").getString(10) == "DE-X")
    assert(byId("X1").getString(10) == "DE-B")
  }

  test("X4 has no subdivision: all 2nd_* stay null") {
    assert(byId("X4").isNullAt(5) && byId("X4").isNullAt(8) &&
      byId("X4").isNullAt(9) && byId("X4").isNullAt(10))
  }

  test("cities_labels: dedup per (id, lang), plain label preferred") {
    val labels = result.citiesLabels.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(labels == Set(
      ("X1", "de", "Alpha"),   // plain row beats native rows
      ("X1", "en", "AlphaEn"), // min native_order among natives
      ("X2", "zh-hans", "Zhongwen"), ("X2", "en", "X2En"),
      ("X3", "fr", "Ville"), ("X3", "de", "Stadt"),
      ("X4", "eo", "Urbo")))
  }

  test("cities_languages: resolved to codes, only surviving cities") {
    val langs = result.citiesLanguages.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(langs == Set(("X1", "de", 0L)))
  }
}
