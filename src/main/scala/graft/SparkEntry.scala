package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from the per-category modules; every entry with
  * an oracle is hash-compared against DuckDB at sf0.01 by the driver.
  */
object SparkEntry {

  /** All declared operator queries, per SURVEY.md §2. */
  def allDefs: Seq[QueryDef] =
    operators.Relational.defs ++
      operators.Aggregates.defs ++
      operators.Joins.defs ++
      operators.Analytics.defs ++
      operators.Windows.defs ++
      functions.Scalars.defs ++
      functions.TextAnalysis.defs ++
      operators.Dedup.defs ++
      operators.Clustering.defs ++
      operators.Sampling.defs ++
      operators.Skew.defs ++
      operators.TypedOps.defs ++
      operators.TimeSeries.defs ++
      operators.Cdc.defs ++
      operators.Layout.defs ++
      operators.TxLog.defs ++
      operators.Incremental.defs ++
      operators.Profiling.defs ++
      operators.Quality.defs ++
      operators.Classifier.defs ++
      functions.Vocab.defs ++
      functions.Ranking.defs ++
      functions.Fuzzy.defs ++
      operators.Similarity.defs ++
      operators.BloomPrune.defs ++
      operators.CorpusPipeline.defs ++
      operators.Multimodal.defs ++
      sources.FileFormats.defs ++
      streaming.StreamingTwins.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_group")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
