package graft.wikidata

import org.apache.spark.sql.types._

/** Explicit StructType for the subset of a WikiData entity the pipeline
  * reads — the Spark equivalent of the reference's "touch only these JSON
  * paths" navigation (/root/reference/src/json.rs:1-42; field inventory in
  * FIXTURES.md §1). Everything is nullable; from_json runs PERMISSIVE so a
  * malformed entity yields nulls rather than killing the job, matching the
  * reference's log-and-skip per line (/root/reference/src/main.rs:183-189).
  *
  * Per-property value payloads differ (entity-id vs string vs monolingual vs
  * coordinate vs quantity), so each claim property gets its own precise
  * element type instead of a generic variant.
  */
object EntitySchema {

  private def snakOf(value: DataType): StructType = StructType(Seq(
    StructField("snaktype", StringType),
    StructField("datavalue", StructType(Seq(
      StructField("value", value))))))

  private val timeValue = StructType(Seq(
    StructField("time", StringType),
    StructField("timezone", LongType)))

  // Qualifier snaks: P580/P582/P585 carry times; P518/P1539/P1540/P1366 are
  // presence-only (the reference only checks [0] exists).
  private val timeQual = ArrayType(snakOf(timeValue))
  private val presenceQual = ArrayType(snakOf(StringType))

  val qualifiers: StructType = StructType(Seq(
    StructField("P580", timeQual),
    StructField("P582", timeQual),
    StructField("P585", timeQual),
    StructField("P518", presenceQual),
    StructField("P1539", presenceQual),
    StructField("P1540", presenceQual),
    StructField("P1366", presenceQual)))

  private def claimOf(value: DataType): ArrayType = ArrayType(StructType(Seq(
    StructField("mainsnak", snakOf(value)),
    StructField("qualifiers", qualifiers))))

  private val entityIdValue = StructType(Seq(StructField("id", StringType)))
  private val monoTextValue = StructType(Seq(
    StructField("text", StringType),
    StructField("language", StringType)))
  private val coordValue = StructType(Seq(
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType)))
  private val quantityValue = StructType(Seq(
    StructField("amount", StringType),
    StructField("unit", StringType)))

  val claims: StructType = StructType(Seq(
    StructField("P31", claimOf(entityIdValue)),    // instance of
    StructField("P131", claimOf(entityIdValue)),   // located in admin TE
    StructField("P17", claimOf(entityIdValue)),    // country
    StructField("P37", claimOf(entityIdValue)),    // official language
    StructField("P2936", claimOf(entityIdValue)),  // language used
    StructField("P1366", claimOf(entityIdValue)),  // replaced by (tombstone)
    StructField("P576", claimOf(timeValue)),       // dissolved (tombstone)
    StructField("P297", claimOf(StringType)),      // ISO 3166-1 alpha-2
    StructField("P300", claimOf(StringType)),      // ISO 3166-2
    StructField("P424", claimOf(StringType)),      // Wikimedia language code
    StructField("P1705", claimOf(monoTextValue)),  // native label
    StructField("P1448", claimOf(monoTextValue)),  // official name
    StructField("P625", claimOf(coordValue)),      // coordinates
    StructField("P1082", claimOf(quantityValue)))) // population

  val entity: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("labels", MapType(StringType, StructType(Seq(
      StructField("language", StringType),
      StructField("value", StringType))))),
    StructField("claims", claims)))
}
