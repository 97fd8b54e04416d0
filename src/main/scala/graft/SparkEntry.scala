package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator declared in SURVEY.md §2 registers here: `queries` maps
  * each id to its DataFrame program, `oracleSql` to the equivalent
  * DuckDB-dialect SQL the driver hash-compares against (absent entries are
  * intentionally no-oracle: approximate/hash-seeded ops, checked by
  * ScalaTest golden/property suites instead).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape (q_agg_hash) — the canonical scan→filter→partial-agg→
    * final-agg→sort pipeline. */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.queries("q_agg_hash")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalCore.queries ++
      Aggregates.queries ++
      WindowOps.queries ++
      SortSetOps.queries ++
      ScalarFns.queries ++
      EventsOps.queries ++
      TextOps.queries ++
      VectorOps.queries ++
      ExtendedOps.queries ++
      PipelineOps.queries ++
      AnalyticsOps.queries ++
      GraphSearchOps.queries ++
      CorpusStatsOps.queries ++
      QualityOps.queries ++
      MiningOps.queries ++
      SinkOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    RelationalCore.oracles ++
      Aggregates.oracles ++
      WindowOps.oracles ++
      SortSetOps.oracles ++
      ScalarFns.oracles ++
      EventsOps.oracles ++
      TextOps.oracles ++
      VectorOps.oracles ++
      ExtendedOps.oracles ++
      PipelineOps.oracles ++
      AnalyticsOps.oracles ++
      GraphSearchOps.oracles ++
      CorpusStatsOps.oracles ++
      QualityOps.oracles ++
      MiningOps.oracles ++
      SinkOps.oracles
}
