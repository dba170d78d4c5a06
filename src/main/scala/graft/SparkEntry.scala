package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator surface (one entry per implemented operator
  * from SURVEY.md §2 plus the training-data-pipeline extensions);
  * `oracleSql` holds the DuckDB-equivalent SQL for every query that is
  * ANSI-SQL-expressible. Column names/types are aligned on both sides
  * (aggregates rounded to 6 decimals, ints cast to BIGINT, dates formatted
  * as strings) so the driver's sorted-column hash compare is stable.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_join_topk")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
    graft.queries.FlattenQueries.queries ++
    graft.queries.TrainingData.queries

  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
    graft.queries.FlattenQueries.oracle ++
    graft.queries.TrainingData.oracle
}
