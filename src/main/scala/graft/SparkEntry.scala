package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{Corpus, Dedup, EventAnalytics, Joins, MapReduceQueries, Markup, Pipeline, Relational, Similarity, Sinks, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-module query registries; every oracle-checked operator
  * has a `queries` entry and a matching DuckDB `oracleSql` entry with identical
  * column aliases and deterministic ORDER BY (driver compares by hash).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's own sample workload (char frequency count,
    * `Sample Client/SampleClient.cpp:32-66`) over documents.text.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.charCount(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.all ++ MapReduceQueries.all ++ Joins.all ++ Dedup.all ++
      Similarity.all ++ TextAnalysis.all ++ EventAnalytics.all ++
      Corpus.all ++ Pipeline.all ++ graft.multimodal.Multimodal.all ++ Sinks.all ++ Markup.all ++
      graft.queries.ExactSubstr.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver records rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ MapReduceQueries.oracles ++ Joins.oracles ++ Dedup.oracles ++
      Similarity.oracles ++ TextAnalysis.oracles ++ EventAnalytics.oracles ++
      Corpus.oracles ++ Pipeline.oracles ++ graft.multimodal.Multimodal.oracles ++ Sinks.oracles ++ Markup.oracles ++
      graft.queries.ExactSubstr.oracles
}
