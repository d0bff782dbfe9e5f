package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The conf-first complement to [[Dedup.BloomPrefilter]]: Spark's own
  * runtime row-level filtering (InjectRuntimeFilter, Spark 3.3+) builds a
  * bloom filter from the SELECTIVE side of a shuffle join at runtime and
  * applies it under the other side's shuffle — no broadcast ceiling,
  * because the filter is created by an aggregate over the creation side
  * and shipped as a scalar subquery result. This pins that the injection
  * actually fires on our join shape (parquet scans, shuffle SMJ, selective
  * dim predicate), so at 100 TB the first move is enabling the conf; the
  * manual persisted-bloom store path covers the case where the filter
  * must OUTLIVE the query (incremental dedup's corpus side).
  *
  * Thresholds are lowered to make local[4]-sized tables eligible
  * (creation side < creationSideThreshold is met by default; the app-side
  * 10 GB scan floor is dropped to 0); production keeps defaults.
  */
class RuntimeBloomFilterSpec extends SparkSpec {

  test("InjectRuntimeFilter puts a might_contain probe under the fact-side shuffle") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // shuffle join only
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    val dir = Files.createTempDirectory("runtime-bloom").toFile
    try {
      spark.range(100000).select(
        (col("id") % 1000).as("k"),
        concat(lit("p"), col("id").cast("string")).as("payload"))
        .write.mode("overwrite").parquet(s"$dir/fact")
      spark.range(1000).select(
        col("id").as("dk"), (col("id") % 50).as("attr"))
        .write.mode("overwrite").parquet(s"$dir/dim")
      val fact = spark.read.parquet(s"$dir/fact")
      // attr = 7 keeps 20 of 1000 dim keys — selective enough to inject
      val dim = spark.read.parquet(s"$dir/dim").filter(col("attr") === 7)

      def run(enabled: Boolean): (Long, String) = {
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled",
          enabled.toString)
        val j = fact.join(dim, col("k") === col("dk"))
        (j.count(), j.queryExecution.executedPlan.toString)
      }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val (nOn, planOn) = run(enabled = true)
      val (nOff, _) = run(enabled = false)
      assert(nOn == nOff, s"bloom-filtered join changed the answer: $nOn vs $nOff")
      assert(nOn == 20L * 100, s"expected 2000 rows, got $nOn")
      assert(planOn.contains("might_contain"),
        "expected a runtime bloom probe on the fact side\n" + planOn.take(3000))
    } finally {
      old.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }
}
