package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.flatten.Flattener

/** The flatten operator exposed on the driver's test tables: parse the
  * semi-structured `events.props` JSON into a nested column, then run the
  * full flattening pipeline (ArrayStats + presence pruning + Python-format
  * stringification). The DuckDB oracle reproduces the exact same cells with
  * string functions — Event_id/Event_type pass through PascalCase renaming,
  * `k` becomes `Props_K` with the stringified integer.
  */
object FlattenQueries {

  private def q19(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(
      col("event_id"), col("event_type"),
      from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).as("props"))
    Flattener.flatten(ev)
  }

  private val q19Sql =
    """SELECT CAST(event_id AS VARCHAR) AS Event_id,
       event_type AS Event_type,
       regexp_extract(props, '"k": ([0-9]+)', 1) AS Props_K
       FROM events"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q19_flatten_json" -> q19 _)

  val oracle: Map[String, String] = Map(
    "q19_flatten_json" -> q19Sql)
}
