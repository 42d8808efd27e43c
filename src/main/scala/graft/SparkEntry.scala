package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CurationQueries, Etl, Q, Relational, RelationalExtended, Sql, TrainingData}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as a named query
  * over the synthetic tables, with a DuckDB oracle where SQL-expressible.
  */
object SparkEntry {

  /** All registered capability queries, in declaration order. */
  def allQueries: Seq[Q] =
    Relational.all ++ RelationalExtended.all ++ Sql.all ++ Etl.all ++
      TrainingData.all ++ CurationQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q3_join_revenue_by_region")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
