package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Thin live-Elasticsearch adapter (SURVEY.md §2.1 #1 — the reference's
  * `ES.search` + `search_after` loop, [`ElasticSearch ETL.py:214-267`]).
  *
  * Targets the elasticsearch-hadoop connector BY FORMAT NAME, so this
  * compiles (and the rest of the engine links) with no connector jar on
  * the classpath; at runtime [[read]] fails fast with a clear message when
  * the connector is absent. The connector already parallelizes a live
  * index by shard → partition and pushes the scroll/PIT pagination the
  * reference hand-rolls client-side, so there is no driver-side page loop
  * to port.
  *
  * Both input paths — this adapter and the offline exported-response files
  * ([[EsJson.read]]) — funnel through the SAME envelope contract,
  * [[EsJson.unwrap]]: connector rows arrive already at `_source` level and
  * pass through untouched; exported search responses are unwrapped to one
  * row per hit. Downstream (flatten, EtlJob, ExportStream) cannot tell the
  * difference, which is the point.
  */
object EsLive {

  /** Connection settings mirroring the reference's client construction
    * (`ES = Elasticsearch(...)`, [`ElasticSearch ETL.py:201-210`]).
    *
    * @param nodes     comma-separated host[:port] list
    * @param resource  index (or index pattern) to scan
    * @param query     optional ES query-DSL JSON pushed to the cluster —
    *                  the reference's `search_query` body
    * @param pageSize  scroll page size per task — the reference's `size`
    * @param extra     passthrough for any other `es.*` connector option
    */
  final case class EsConfig(
      nodes: String,
      resource: String,
      query: String = "",
      user: String = null,
      password: String = null,
      pageSize: Int = 1000,
      extra: Map[String, String] = Map.empty)

  /** elasticsearch-hadoop's DataSource implementation class name — public
    * connector coordinates, resolved reflectively at runtime.
    */
  val ConnectorFormat = "org.elasticsearch.spark.sql"

  /** The exact reader options a config produces (pure — unit-testable
    * without a cluster or the connector jar).
    */
  def options(cfg: EsConfig): Map[String, String] = {
    val auth = Seq(
      Option(cfg.user).map("es.net.http.auth.user" -> _),
      Option(cfg.password).map("es.net.http.auth.pass" -> _)).flatten
    val query =
      if (cfg.query.nonEmpty) Seq("es.query" -> cfg.query) else Seq.empty
    (Map(
      "es.nodes" -> cfg.nodes,
      "es.resource" -> cfg.resource,
      "es.scroll.size" -> cfg.pageSize.toString) ++ auth ++ query
      ++ cfg.extra)
  }

  /** Scan a live index as a DataFrame of `_source` documents — the live
    * twin of [[EsJson.read]]. Requires the elasticsearch-hadoop connector
    * on the classpath (integration-only; unit tests cover [[options]] and
    * the shared unwrap contract instead).
    */
  def read(spark: SparkSession, cfg: EsConfig): DataFrame =
    EsJson.unwrap(
      spark.read.format(ConnectorFormat).options(options(cfg)).load())
}
