package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Analytics, AnalyticsJoins, Bpe, Classifier, CorpusStats, Dedup, FeatureOps, GraphOps, Growth, HeavyHitters, JoinUtils, Multimodal, OracleVariants, Similarity, Sketches, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Analytics.queries ++ FeatureOps.queries ++ TextAnalysis.queries ++
      Dedup.queries ++ Similarity.queries ++ Multimodal.queries ++
      OracleVariants.queries ++ JoinUtils.queries ++
      AnalyticsJoins.queries ++ CorpusStats.queries ++ GraphOps.queries ++
      Growth.queries ++ Bpe.queries ++ Sketches.queries ++
      HeavyHitters.queries ++ Classifier.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Analytics.oracle ++ FeatureOps.oracle ++ TextAnalysis.oracle ++
      Dedup.oracle ++ Similarity.oracle ++ OracleVariants.oracle ++
      Multimodal.oracle ++ JoinUtils.oracle ++
      AnalyticsJoins.oracle ++ CorpusStats.oracle ++ GraphOps.oracle ++
      Growth.oracle ++ Bpe.oracle ++ Sketches.oracle ++
      HeavyHitters.oracle ++ Classifier.oracle
}
