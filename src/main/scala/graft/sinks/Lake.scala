package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-partitioned parquet lake export — the layout a training-data
  * corpus actually ships in: one directory per partition value, so
  * downstream consumers (mixture sampling per language/source, per-shard
  * training jobs) read only the partitions they ask for. At 100 TB the
  * load-bearing property is partition PRUNING: a `lang = 'en'` filter on
  * the read side becomes a directory listing, not a 100 TB scan —
  * `PlanSpec` pins the `PartitionFilters` evidence.
  *
  * Reference analogue: the TSV export directory of `ElasticSearch
  * ETL.py:247` is the flat single-consumer version of this; the
  * partitioned form is its many-consumer, scale-safe successor.
  */
object Lake {

  /** Write `df` partitioned by `partCol` (hive layout `partCol=value/`). */
  def writePartitioned(df: DataFrame, dir: String, partCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).parquet(dir)

  /** Read a partitioned lake back (partition column recovered from the
    * directory layout; filters on it prune at file-listing time).
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
