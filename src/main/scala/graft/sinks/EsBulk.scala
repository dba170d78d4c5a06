package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Elasticsearch `_bulk` NDJSON sink — the WRITE half of the connector
  * story (the read half is the DSv2 export source, the streaming
  * source, and the live `search_after` client): every row renders as
  * the two-line action + source pair the `_bulk` endpoint ingests,
  *
  * {{{
  *   {"index":{"_index":"docs","_id":"42"}}
  *   {"doc_id":42,"text":"..."}
  * }}}
  *
  * written distributed through Spark's text sink — one bulk file per
  * partition, which IS the natural bulk-request granularity: a large
  * export becomes many bounded POST bodies a loader replays against a
  * cluster, none of them driver-materialized. BOTH lines render
  * through `to_json`, so quoting/escaping is the JSON writer's
  * everywhere — a text column, id, or index name with quotes,
  * backslashes, or newlines stays one well-formed line.
  *
  * Reference: the ETL reads FROM Elasticsearch; this closes the round
  * trip so a corpus curated here can be shipped back (e.g. a cleaned
  * index), and the reader stack can re-ingest our own exports.
  */
object EsBulk {

  /** Write `df` as `_bulk` action/source line pairs under `path`.
    * `idCol` becomes `_id` (stringified); all columns — including the
    * id, as ES convention keeps it in `_source` — render into the
    * source line in `df`'s column order.
    */
  def write(df: DataFrame, path: String, index: String,
      idCol: String): Unit = {
    require(df.columns.contains(idCol), s"missing id column $idCol")
    // `index` is the reserved action-struct name [[read]] keys on: a
    // document column of that name would make every round-tripped row
    // carry a non-null `index` field, so read() would classify ALL
    // lines as action lines and silently return zero documents (or a
    // corrupted union schema). Reject it loudly at write time, where
    // the caller can still rename.
    // case-INSENSITIVE: Spark's default resolution is too, so an
    // 'Index' column would collide with the action struct at read time
    // (ambiguous-attribute error) even though it differs in case here
    require(!df.columns.exists(_.equalsIgnoreCase("index")),
      "EsBulk.write: 'index' is a reserved _bulk action field — " +
        "rename the column (read() identifies action lines by a " +
        "non-null 'index' struct, so a document column of that name " +
        "cannot round-trip)")
    // the action line goes through to_json too — an id (or index name)
    // containing quotes, backslashes, or newlines must be writer-escaped
    // exactly like the source line, or the NDJSON framing breaks.
    // A NULL id fails the job: to_json would silently drop _id from
    // the action line, turning an id-keyed idempotent export into ES
    // auto-generated ids that duplicate documents on replay.
    val id = coalesce(col(idCol).cast("string"),
      raise_error(lit(s"EsBulk.write: null $idCol — an id-keyed " +
        "_bulk export cannot index a document without its _id")))
    df.select(concat(
        to_json(struct(struct(
          lit(index).as("_index"),
          id.as("_id")).as("index"))),
        lit("\n"),
        to_json(struct(df.columns.map(col).toIndexedSeq: _*)))
        .as("value"))
      .write.mode("overwrite").text(path)
  }

  /** Read a `_bulk` export back to one row per document. The JSON
    * reader parses BOTH line kinds under one union schema; action
    * lines are exactly the rows whose `index` action struct is
    * non-null, so the filter is schema-driven — no string sniffing.
    * Returns only the source-line columns. (`index` is therefore a
    * reserved document-column name here, as it effectively is for the
    * real `_bulk` wire format.)
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("inferTimestamp", false).option("inferDate", false)
      .json(path)
    require(raw.columns.contains("index"),
      s"$path does not look like a _bulk export (no action lines)")
    raw.filter(col("index").isNull).drop("index")
  }
}
