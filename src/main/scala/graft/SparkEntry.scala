package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, DedupStore, EventOps, Geo, MatView, Multimodal, Relational, Similarity, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2 re-expressed on the
  * driver testdata, plus the training-data-pipeline surface); `oracleSql` is
  * the DuckDB-equivalent SQL for each. Column names are aliased identically
  * on both sides so the driver's sort-columns-then-hash compare is stable.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q5 shape: revenue by region through a 6-way join with broadcast
    * dims — exercises scan→filter→join(broadcast+shuffle)→agg in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.q12RevenueByRegion(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ EventOps.queries ++ TextOps.queries ++
      Dedup.queries ++ DedupStore.queries ++ Similarity.queries ++
      Multimodal.queries ++ Curation.queries ++ Geo.queries ++ MatView.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ EventOps.oracles ++ TextOps.oracles ++
      Dedup.oracles ++ DedupStore.oracles ++ Similarity.oracles ++
      Multimodal.oracles ++ Curation.oracles ++ Geo.oracles ++ MatView.oracles
}
