package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Filesystem plumbing for the streaming restart discipline — the
  * checkpoint probe and the stale-`batch_id=`-leaf cleanup shared by
  * [[NearDupStream]] and [[PartialAggs]] — resolved through the Hadoop
  * FileSystem API so the "checkpoint and lake are one unit of state"
  * contract holds wherever the lake actually lives: HDFS, S3A, or the
  * local filesystem (which Hadoop serves through the same interface, so
  * local tests exercise the identical code path a cluster runs).
  *
  * Why this matters: the previous `java.nio.file` implementation
  * silently no-opped on any non-local URI — `Files.isDirectory(
  * Paths.get("s3a://bucket/ckpt"))` is simply false — so on the stores
  * a 100 TB deployment actually uses, a fresh-checkpoint restart kept a
  * dead run's `batch_id=` leaves and the merged `basePath` read
  * double-counted every one of them: the exact corruption the cleanup
  * exists to prevent. The Hadoop API is what the repo's other
  * commit-point protocols already use ([[PartialAggs.compactPartials]],
  * [[graft.operators.Similarity.compactIvfLake]]).
  */
private[graft] object StreamFs {

  def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Does `checkpoint` hold at least one committed offset? A null,
    * absent, or empty checkpoint restarts from batch 0 (and must clear
    * stale leaves first); one WITH offsets resumes where it left off
    * (and must keep its leaves).
    */
  def hasCommittedOffsets(spark: SparkSession, checkpoint: String): Boolean = {
    val f = fs(spark, checkpoint)
    val off = new Path(checkpoint, "offsets")
    f.exists(off) && f.getFileStatus(off).isDirectory &&
      f.listStatus(off).nonEmpty
  }

  /** Delete every `batch_id=` leaf directory under `baseDir`. Foreign
    * entries (metadata files, other partition layouts) are untouched.
    */
  def clearBatchLeaves(spark: SparkSession, baseDir: String): Unit = {
    val f = fs(spark, baseDir)
    val base = new Path(baseDir)
    if (f.exists(base) && f.getFileStatus(base).isDirectory)
      f.listStatus(base).foreach { s =>
        if (s.isDirectory && s.getPath.getName.startsWith("batch_id="))
          f.delete(s.getPath, true): Unit
      }
  }

  /** Is there at least one `batch_id=` leaf under `baseDir`? (An empty
    * drained stream writes none — readers must degrade to an empty
    * frame, not a "path does not exist" read failure.)
    */
  def hasBatchLeaves(spark: SparkSession, baseDir: String): Boolean = {
    val f = fs(spark, baseDir)
    val base = new Path(baseDir)
    f.exists(base) && f.getFileStatus(base).isDirectory &&
      f.listStatus(base).exists(s =>
        s.isDirectory && s.getPath.getName.startsWith("batch_id="))
  }
}
