package graft.wikidata

import java.nio.file.Files

import graft.SparkSpec

/** Drives the streaming dump ingest: NDJSON files landed in a directory are
  * extracted per micro-batch and appended to the 9-table parquet layout —
  * SURVEY A1's `readStream` landing-dir mapping, AvailableNow semantics. */
class StreamIngestSpec extends SparkSpec {

  val classes: ClassSets = ClassSets(
    territorialEntities = Set("QTE"),
    humanSettlements = Set("QHS"),
    excluded = Set.empty,
    excludedSettlements = Set.empty,
    secondLevelAdminDiv = Set.empty,
    languages = Set.empty)

  val now: WTime = WTime(2026, 7, 11, 0, 0, 0)

  private val dumpLines = Seq(
    "[",
    """{"id":"Q1","labels":{"en":{"language":"en","value":"Land"}},"claims":{"P31":[{"mainsnak":{"snaktype":"value","datavalue":{"value":{"id":"QTE"}}}}],"P297":[{"mainsnak":{"snaktype":"value","datavalue":{"value":"DE"}}}]}},""",
    """{"id":"Q3","labels":{"en":{"language":"en","value":"Town"}},"claims":{"P31":[{"mainsnak":{"snaktype":"value","datavalue":{"value":{"id":"QHS"}}}}],"P17":[{"mainsnak":{"snaktype":"value","datavalue":{"value":{"id":"Q1"}}}}]}},""",
    "]")

  test("streamed landing-dir ingest appends the batch extraction's tables") {
    val landing = Files.createTempDirectory("graft-landing").toFile
    val out = Files.createTempDirectory("graft-stream-out").toFile
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toFile
    try {
      Files.write(new java.io.File(landing, "part1.json").toPath,
        String.join("\n", dumpLines: _*).getBytes("UTF-8"))
      val q = Extract.streamIngest(spark, landing.getAbsolutePath,
        out.getAbsolutePath, ckpt.getAbsolutePath, classes, now)
      q.awaitTermination()

      val countries = spark.read.parquet(s"$out/countries")
      assert(countries.collect().map(_.getString(0)).toSeq == Seq("Q1"))
      val cities = spark.read.parquet(s"$out/cities")
      assert(cities.select("id").collect().map(_.getString(0)).toSeq == Seq("Q3"))

      // A second file landed later is picked up incrementally (appends,
      // doesn't reprocess part1 thanks to the checkpoint).
      Files.write(new java.io.File(landing, "part2.json").toPath,
        """{"id":"Q7","labels":{},"claims":{"P31":[{"mainsnak":{"snaktype":"value","datavalue":{"value":{"id":"QHS"}}}}],"P17":[{"mainsnak":{"snaktype":"value","datavalue":{"value":{"id":"Q1"}}}}]}}"""
          .getBytes("UTF-8"))
      val q2 = Extract.streamIngest(spark, landing.getAbsolutePath,
        out.getAbsolutePath, ckpt.getAbsolutePath, classes, now)
      q2.awaitTermination()
      val cities2 = spark.read.parquet(s"$out/cities")
      assert(cities2.select("id").collect().map(_.getString(0)).sorted.toSeq
        == Seq("Q3", "Q7"))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(landing); rm(out); rm(ckpt)
    }
  }
}
