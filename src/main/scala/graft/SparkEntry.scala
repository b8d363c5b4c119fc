package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2 + north-star
  * LLM-pipeline ops); every entry with a key in `oracleSql` is hash-checked
  * against DuckDB on the same parquet tables at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q03_join_broadcast")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Events.queries ++ Dedup.queries ++
      Similarity.queries ++ TextAnalysis.queries ++ Extras.queries ++
      Sampling.queries ++ Pipeline.queries ++ Corpus.queries ++
      Analytics.queries ++ Clustering.queries ++ Evaluation.queries ++
      Quality.queries ++ GdalQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (LSH/simhash/ANN) get the
    * weaker rows-only check — they are approximate by construction. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Events.oracle ++ Dedup.oracle ++
      Similarity.oracle ++ TextAnalysis.oracle ++ Extras.oracle ++
      Sampling.oracle ++ Pipeline.oracle ++ Corpus.oracle ++
      Analytics.oracle ++ Clustering.oracle ++ Evaluation.oracle ++
      Quality.oracle ++ GdalQueries.oracle
}
