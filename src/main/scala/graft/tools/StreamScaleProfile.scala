package graft.tools

import java.util.UUID

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Scale evidence for the streaming surface: push 10⁵ and 10⁶
  * synthetic events through the REAL Structured-Streaming machinery —
  * file source in bounded micro-batches (`maxFilesPerTrigger`, the
  * production incremental-ingest shape), watermark, event-time
  * tumbling window, stateful aggregation, memory sink — and report
  * sustained events/second and the number of micro-batches. The claims
  * under test:
  *
  *  1. throughput is scan-bound (events/s roughly flat from 10⁵ to
  *     10⁶ — state is O(windows × types), never O(events));
  *  2. the multi-batch path (state carried across triggers) produces
  *     the same aggregate as one batch over the same data — counted
  *     rows must equal the batch groupBy.
  */
object StreamScaleProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    for (n <- Seq(100000L, 1000000L)) {
      // n events over ~12 days, 10 event types, value in cents
      val src = spark.range(n).select(
        col("id").as("event_id"),
        (lit(1704067200000000L) + col("id") * 1000000L)
          .as("us"),
        concat(lit("type"), pmod(col("id"), lit(10))).as("event_type"),
        (pmod(hash(col("id")), lit(10000)).cast("long")).as("cents"))
        .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      val dir = graft.Tables.freshScratchDir("graft_streamprof_", n.toString)
      src.repartition(16).write.parquet(dir.toString)

      val name = "prof_" + UUID.randomUUID().toString.replace("-", "")
      val t0 = System.nanoTime()
      val q = spark.readStream
        .schema(spark.read.parquet(dir.toString).schema)
        .option("maxFilesPerTrigger", 2) // 8 micro-batches of ~n/8 events
        .parquet(dir.toString)
        .withWatermark("ts", "30 days")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable()
      val batches = q.recentProgress.count(_.numInputRows > 0)
      q.stop()
      val sec = (System.nanoTime() - t0) / 1e9
      val got = spark.table(name)
      val nOut = got.count()
      val totalIn = got.agg(sum("n")).as[Long].collect()(0)
      // cross-paradigm check: the streamed aggregate equals the batch one
      val batch = src.groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      val nBatch = batch.count()
      println(f"[stream] n=$n%8d  wall=$sec%6.1f s  " +
        f"events_per_s=${(n / sec).toLong}%8d  microBatches=$batches%2d  " +
        f"outRows=$nOut%5d (batch $nBatch%5d)  totalIn=$totalIn%8d  " +
        f"matches=${nOut == nBatch && totalIn == n}")
      graft.Tables.deleteRecursively(dir)
    }
    spark.stop()
  }
}
