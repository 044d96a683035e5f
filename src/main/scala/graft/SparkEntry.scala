package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in graft.queries.*; this object only assembles them.
  */
object SparkEntry {
  /** Every declared query, oracle-SQL kept in lockstep per module. */
  def declared: Seq[DeclaredQuery] =
    graft.queries.TimeSeries.all ++ graft.queries.Relational.all ++
      graft.queries.LlmOps.all ++ graft.operators.Dedup.all ++
      graft.operators.Similarity.all ++ graft.operators.TextAnalysis.all ++
      graft.operators.Multimodal.all ++ graft.queries.Temporal.all ++
      graft.queries.StreamingQueries.all ++ graft.queries.Functions.all ++
      graft.queries.TpcH.all ++ graft.queries.Functions2.all ++
      graft.queries.Pipeline.all ++ graft.operators.Importance.all ++
      graft.operators.BpeTrain.all ++ graft.operators.LanguageModel.all ++
      graft.operators.SubstringDedup.all ++ graft.sources.ClusteredLayout.all ++
      graft.operators.CorpusOps.all ++ graft.queries.WebAnalytics.all ++
      graft.queries.Cohorts.all ++ graft.sources.ExternalFormats.all ++
      graft.queries.Maintenance.all ++ graft.operators.DomainRank.all ++
      graft.queries.Cbo.all ++ graft.sources.BucketedTables.all ++
      graft.operators.GraphOps.all ++ graft.operators.Retrieval.all ++
      graft.queries.Frontier.all ++ graft.queries.Regression.all ++
      graft.queries.Analytics3.all ++ graft.queries.Analytics4.all ++
      graft.queries.Analytics5.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    declared.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    declared.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
