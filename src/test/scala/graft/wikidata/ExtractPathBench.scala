package graft.wikidata

import org.apache.spark.sql.SparkSession

/** Measurement harness for the typed-vs-columnar extraction question
  * (SURVEY §8 / Extract.scala design note): how much of ingest wall time is
  * the JSON parse (which ANY design pays) vs the typed flatMap emit on top.
  * Run: sbt "Test/runMain graft.wikidata.ExtractPathBench <dump.json>" */
object ExtractPathBench {
  def main(args: Array[String]): Unit = {
    val dump = args.headOption.getOrElse("/tmp/g/dump.json")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .appName("extract-path-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val classes = ClassSets.seedsOnly
    val now = WTime(2026, 7, 11, 0, 0, 0)
    def time(label: String)(f: => Long): Unit =
      for (rep <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$label rep$rep: ${(System.nanoTime() - t0) / 1e9}%5.2f s  ($n rows)")
      }
    val lines = spark.read.text(dump)
    time("raw line count    ") { lines.count() }
    time("json parse only   ") { Extract.parse(lines).count() }
    time("parse + emit + 9  ") {
      val t = Extract(Extract.parse(lines), classes, now)
      val n = Extract.tableMap(t).map(_._2.count()).sum
      spark.sqlContext.clearCache() // fresh tagged cache per rep
      n
    }
    spark.stop()
  }
}
