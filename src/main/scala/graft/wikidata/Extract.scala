package graft.wikidata

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dump ingest + extraction: the Spark shape of the reference's
  * handle_line pipeline (/root/reference/src/main.rs:123-234 → SURVEY §3.1):
  *
  *   text source → sanitize → from_json(typed schema) → tombstone filter
  *   → classify via broadcast class sets → 9 typed outputs.
  *
  * One pass over the dump: `entities` is cached once, each output is a
  * narrow flatMap over it (no shuffle except the keyed dedups mandated by
  * the reference's PK semantics, SURVEY A13). At cluster scale the dump text
  * source is splittable (bz2/parquet landing), so partition parallelism
  * replaces the reference's rayon fan-out (SURVEY D2).
  */
object Extract {

  /** All nine ingest tables (src/setup.sql:8-75), plus the raw entity view. */
  final case class Tables(
      entities: Dataset[Entity],
      countries: Dataset[CountryRow],
      objectLanguages: DataFrame,
      languages: Dataset[LanguageRow],
      territorialEntities: Dataset[TERow],
      teParents: DataFrame,
      cities: Dataset[CityRow],
      citiesCountries: Dataset[CityCountryRow],
      objectLabels: Dataset[ObjectLabelRow],
      missingP17: Dataset[MissingP17Row])

  val entitySchema = Encoders.product[Entity].schema

  /** Sanitize + parse the dump lines (wiki_data_line.rs:336-350, A6-A8):
    * drop `[`/`]`/empty lines, strip the trailing comma, parse with the
    * explicit minimal schema (PERMISSIVE: bad lines → null id → dropped,
    * mirroring the reference's log-and-skip). */
  def parse(lines: DataFrame): Dataset[Entity] = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines
      .filter(length(col("value")) > 1)
      .select(from_json(
        regexp_replace(col("value"), ",$", ""), entitySchema).as("e"))
      .select(col("e.*"))
      .as[Entity]
      .filter((e: Entity) => e.id.isDefined)
  }

  /** Full extraction over parsed entities. `now` is injected for
    * reproducibility (SURVEY §7.4 #8). */
  def apply(raw: Dataset[Entity], classes: ClassSets, now: WTime): Tables = {
    val spark = raw.sparkSession
    import spark.implicits._

    val bc = spark.sparkContext.broadcast(classes)

    // Tombstone filter (B3) once, then cache: every output scans this.
    val entities = raw.filter((e: Entity) =>
      e.claims.forall(c => !EntityLogic.tombstoned(c))).cache()

    def flags(e: Entity): (Boolean, Boolean, Boolean, Boolean) = {
      val c = e.claims.getOrElse(emptyClaims)
      val cs = bc.value
      val excluded = EntityLogic.isSubclassOf(c, cs.excluded, now)
      val isTe = EntityLogic.isSubclassOf(c, cs.territorialEntities, now) && !excluded
      val isHs = EntityLogic.isSubclassOf(c, cs.humanSettlements, now) && !excluded &&
        !EntityLogic.isSubclassOf(c, cs.excludedSettlements, now)
      val isLang = EntityLogic.isSubclassOf(c, cs.languages, now)
      (isTe, isHs, isLang, excluded)
    }

    val countries = entities.flatMap { e =>
      EntityLogic.country(e.id.get, e.claims.getOrElse(emptyClaims), now)
    }

    // Language rows from the country branch (emitted before the TE branch —
    // branch 0) and the TE branch (branch 1); PK(id, lang_id) is first-wins
    // in the reference (setup.sql:14-20, database.rs:128-137) — replicated
    // deterministically as min (branch, lang_index).
    val countryLangs = entities.flatMap { e =>
      val c = e.claims.getOrElse(emptyClaims)
      if (c.P297.isDefined) EntityLogic.countryLanguages(e.id.get, c, now)
      else Seq.empty[ObjectLanguageRow]
    }.withColumn("branch", lit(0))
    val teLangs = entities.flatMap { e =>
      val (isTe, _, _, _) = flags(e)
      if (isTe) EntityLogic.teLanguages(e.id.get, e.claims.getOrElse(emptyClaims), now)
      else Seq.empty[ObjectLanguageRow]
    }.withColumn("branch", lit(1))
    val olWindow = Window.partitionBy(col("id"), col("lang_id"))
      .orderBy(col("branch"), col("lang_index"))
    val objectLanguages = countryLangs.unionAll(teLangs)
      .withColumn("rn", row_number().over(olWindow))
      .filter(col("rn") === 1)
      .select(col("id"), col("lang_id"), col("lang_index"))

    val languages = entities.flatMap { e =>
      val (_, _, isLang, _) = flags(e)
      if (isLang) EntityLogic.language(e.id.get, e.claims.getOrElse(emptyClaims))
      else None
    }

    val territorialEntities = entities.flatMap { e =>
      val (isTe, _, _, _) = flags(e)
      if (isTe) {
        val c = e.claims.getOrElse(emptyClaims)
        val is2nd = EntityLogic.isSubclassOf(c, bc.value.secondLevelAdminDiv, now)
        Some(EntityLogic.territorialEntity(e.id.get, c, is2nd))
      } else None
    }

    // P131 edges from TEs and from settlements that pass the P17 gate
    // (handle_place is only reached after the missing-P17 early return,
    // wiki_data_line.rs:125-135). PK(id,parent) dedup per A13.
    val teParents = entities.flatMap { e =>
      val (isTe, isHs, _, _) = flags(e)
      val c = e.claims.getOrElse(emptyClaims)
      val fromTe = isTe
      val fromHs = isHs && c.P17.isDefined
      if (fromTe || fromHs) EntityLogic.parentEdges(e.id.get, c, now)
      else Seq.empty[TEParentRow]
    }.dropDuplicates("id", "parent").toDF()

    val settlements = entities.filter { e => flags(e)._2 }

    val missingP17 = settlements.flatMap { e =>
      if (e.claims.getOrElse(emptyClaims).P17.isEmpty) Some(MissingP17Row(e.id.get))
      else None
    }

    val settlementsWithCountry = settlements.filter((e: Entity) =>
      e.claims.getOrElse(emptyClaims).P17.isDefined)

    val cities = settlementsWithCountry.map { e =>
      val c = e.claims.getOrElse(emptyClaims)
      val coords = EntityLogic.coordinates(c)
      CityRow(e.id.get, EntityLogic.population(c, now),
        coords.map(_._1), coords.map(_._2))
    }

    val citiesCountries = settlementsWithCountry.flatMap { e =>
      EntityLogic.cityCountries(e.id.get, e.claims.getOrElse(emptyClaims), now)
    }

    // Labels: TE plain labels, settlement plain labels, settlement native
    // labels — duplicates between the TE and settlement branches are REAL in
    // the reference (NULL native_order never collides in SQLite's PK,
    // SURVEY C17); the cleanup stage dedups later.
    val objectLabels = entities.flatMap { e =>
      val (isTe, isHs, _, _) = flags(e)
      val c = e.claims.getOrElse(emptyClaims)
      val id = e.id.get
      val te = if (isTe) EntityLogic.plainLabels(id, e.labels)
               else Seq.empty[ObjectLabelRow]
      val hs = if (isHs && c.P17.isDefined)
        EntityLogic.plainLabels(id, e.labels) ++ EntityLogic.nativeLabels(id, c, now)
      else Seq.empty[ObjectLabelRow]
      te ++ hs
    }

    Tables(entities, countries, objectLanguages, languages,
      territorialEntities, teParents, cities, citiesCountries,
      objectLabels, missingP17)
  }

  /** Read NDJSON dump files (optionally .bz2 — splittable, A3/A4) and run
    * the full extraction. */
  def fromDump(spark: SparkSession, path: String, classes: ClassSets,
      now: WTime = WikiTime.now()): Tables =
    apply(parse(spark.read.text(path)), classes, now)

  private val emptyClaims = Claims(None, None, None, None, None, None, None,
    None, None, None, None, None, None, None)
}
