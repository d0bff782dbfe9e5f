package graft.wikidata

import org.apache.spark.sql.SparkSession

/** CLI mirroring the reference's surface (/root/reference/src/main.rs:17-121):
  *
  *   fetch <url> <destFile>                    — resumable dump download
  *   ingest <dumpPath> <outDir> [closureFile]  — dump → 9 parquet tables
  *   post <tablesDir> <outDir>                 — 9 tables → final 3 tables
  *   entity <jsonFile> [closureFile]           — debug: show the 9 outputs
  *                                               for a single-entity file
  *
  * The download runs driver-side, not as a query-engine operator (SURVEY
  * A1/A2): `fetch` lands `latest-all.json.bz2` once (resumable — see
  * [[Fetch]]); bz2 is block-splittable so `spark.read.text` parallelizes the
  * decompress+parse for free (A3/A4).
  */
object Main {
  private val nineTables = Seq("countries", "object_languages", "languages",
    "territorial_entities", "territorial_entities_parents", "cities",
    "cities_countries", "object_labels", "missing_p17")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS",
          Runtime.getRuntime.availableProcessors.toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .appName("geodb-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // D5: 10 s progress/ETA lines + stalled-stage warnings for long runs
    // (reference src/main.rs:192-225, src/post/mod.rs:22-94).
    val progress = new graft.ProgressListener().start(spark)

    args.toList match {
      case "fetch" :: url :: dest :: Nil =>
        // Resumable dump download (A1/A2, reference src/input/http.rs):
        // Range+ETag mid-stream resume, 32×8 s bounded open retries.
        Fetch.download(url, java.nio.file.Paths.get(dest))
      case "ingest" :: dump :: out :: rest =>
        val classes = rest.headOption.map(loadClasses)
          .getOrElse(ClassSets.seedsOnly)
        val t = Extract.fromDump(spark, dump, classes)
        write(t, out)
      case "post" :: in :: out :: Nil =>
        def rd(n: String) = spark.read.parquet(s"$in/$n")
        val f = Post(rd("countries"), rd("object_languages"), rd("languages"),
          rd("territorial_entities"), rd("territorial_entities_parents"),
          rd("cities"), rd("cities_countries"), rd("object_labels"))
        // country-partitioned layout = the reference's cities(country) index
        // (setup.sql:48) as partition pruning
        f.cities.write.mode("overwrite").partitionBy("country")
          .parquet(s"$out/cities")
        f.citiesLabels.write.mode("overwrite").parquet(s"$out/cities_labels")
        f.citiesLanguages.write.mode("overwrite").parquet(s"$out/cities_languages")
      case "entity" :: file :: rest =>
        val classes = rest.headOption.map(loadClasses)
          .getOrElse(ClassSets.seedsOnly)
        val t = Extract.fromDump(spark, file, classes)
        Seq(
          "countries" -> t.countries.toDF(),
          "object_languages" -> t.objectLanguages,
          "languages" -> t.languages.toDF(),
          "territorial_entities" -> t.territorialEntities.toDF(),
          "territorial_entities_parents" -> t.teParents,
          "cities" -> t.cities.toDF(),
          "cities_countries" -> t.citiesCountries.toDF(),
          "object_labels" -> t.objectLabels.toDF(),
          "missing_p17" -> t.missingP17.toDF()
        ).foreach { case (name, df) =>
          println(s"== $name ==")
          df.show(100, truncate = false)
        }
      case _ =>
        System.err.println(
          "usage: fetch <url> <dest> | ingest <dump> <outDir> [closure] | " +
            "post <in> <out> | entity <file> [closure]")
        sys.exit(2)
    }
    progress.stop(spark)
    spark.stop()
  }

  /** Class sets from a closure file, or live from a SPARQL endpoint when
    * the argument is an http(s) URL (A9, wiki_sparql.rs:9-67). */
  private def loadClasses(arg: String): ClassSets =
    if (arg.startsWith("http://") || arg.startsWith("https://"))
      ClassSets.fromSparql(arg)
    else ClassSets.fromClosureFile(arg)

  private def write(t: Extract.Tables, out: String): Unit = {
    // Partition-parallel parquet writes replace the single-writer SQLite
    // sink (A12); keyed dedups already applied upstream (A13).
    Extract.tableMap(t).foreach { case (name, df) =>
      val t0 = System.nanoTime()
      df.write.mode("overwrite").parquet(s"$out/$name")
      println(f"[ingest] wrote $name in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
  }
}
