package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale profile for exact substring dedup
  * ([[graft.operators.SubstringDedup]]): 10^5 and 10^6 synthetic
  * documents (~130 chars each) with PLANTED duplication — 1 in 50 docs
  * carries one of 16 fixed 64-char boilerplate blocks; everything else
  * is high-entropy unique filler. Claims under test at 10^6 docs
  * (~1.3e8 characters, ~10^8 anchor windows):
  *
  *  1. no all-pairs blowup — cost is one O(total chars) map pass plus a
  *     map-side-combined count over 8-byte window hashes; wall time
  *     must scale ~linearly from 10^5 to 10^6 docs;
  *  2. the text-carrying candidate stage is DUPLICATE-mass-sized: the
  *     planted blocks touch ~2% of docs, so stage-2 rows (and the spans
  *     found) track the planted count, not the corpus;
  *  3. exactness: every planted block occurrence is recovered as a span
  *     whose length is >= the block length.
  */
object SubstringDedupProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 16 distinct 64-char boilerplate blocks (4 repeats of a 16-char
    // stamp), planted in docs where id % 50 == 0, block = (id/50) % 16
    val block = concat(Seq.fill(4)(
      concat(lit("BOILERPLATE"), lpad(pmod(col("id") / 50, lit(16))
        .cast("string"), 4, "0"), lit("#"))): _*)
    def corpus(nDocs: Long) =
      spark.range(nDocs).select(col("id"),
        concat(
          // ~130 chars of per-doc-unique filler: 8 base-36 hash words
          array_join(transform(sequence(lit(1), lit(8)), i =>
            conv(abs(hash(col("id") * 131 + i * 17)).cast("string"),
              10, 36)), " "),
          when(pmod(col("id"), lit(50)) === 0, block).otherwise(lit("")))
          .as("text"))

    for (n <- Seq(100000L, 1000000L)) {
      val docs = corpus(n).persist()
      docs.count()
      var shuffleBytes = 0L
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            shuffleBytes += e.taskMetrics.shuffleWriteMetrics.bytesWritten
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val spans = graft.operators.SubstringDedup
        .duplicateSpans(docs, "id", "text", minLen = 30)
      val agg = spans.agg(count(lit(1)), sum("span_len"),
        min("span_len")).collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      val planted = (n + 49) / 50
      println(f"SUBDUP n=$n%8d  ${sec}%6.1f s  spans=${agg.getLong(0)}%d " +
        f"(planted $planted%d)  dupChars=${agg.getLong(1)}%d  " +
        f"minSpan=${agg.getLong(2)}%d  shuffle=${shuffleBytes / 1e6}%.0f MB")
      require(agg.getLong(0) >= planted,
        "every planted occurrence must be recovered")
      require(agg.getLong(2) >= 30, "span_len >= minLen")
      docs.unpersist()
    }
    spark.stop()
  }
}
