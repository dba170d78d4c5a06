package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale profile for BPE tokenizer training (q128): 10 merge rounds over
  * 10^5 and 10^6 synthetic documents, tracking wall time and shuffle
  * volume per corpus size. The claims under test:
  *
  *  1. the CORPUS is touched once (the word-frequency scan) — round cost
  *     is a function of the DISTINCT-WORD table, so growing the corpus
  *     10× at fixed vocabulary grows total time far less than 10×;
  *  2. per-round shuffle carries distinct (pair, count) rows (map-side
  *     combined), not pair occurrences — shuffle bytes per round should
  *     be vocabulary-shaped and flat across corpus sizes.
  *
  * Vocabulary is Zipf-ish: 50k distinct synthetic words with frequency
  * ~ 1/rank, the shape real corpora have.
  */
object BpeProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def corpus(nDocs: Long): org.apache.spark.sql.DataFrame =
      spark.range(nDocs).select(
        // 12 words per doc, rank skewed toward small ids (freq ~ 1/rank):
        // word_r spelled in base-26 letters so merges have real structure
        array_join(transform(sequence(lit(1), lit(12)), i =>
          concat(lit("w"), conv(
            (pmod(hash(col("id") * 13 + i), lit(50000)) *
              pmod(hash(col("id") + i * 7), lit(1000)) / lit(1000))
              .cast("long").cast("string"), 10, 26))), " ").as("text"))

    // args: "sequential" / "batched" selects one section (default both)
    val mode = args.headOption.getOrElse("both")

    for (n <- Seq(100000L, 1000000L) if mode != "batched") {
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
      val rules = graft.operators.Bpe.trainMerges(docs, "text", rounds = 10)
        .collect()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      println(f"BPE n=$n%8d  10 rounds  ${sec}%6.1f s  " +
        f"shuffleWrite=${shuffleBytes / 1e6}%8.1f MB  " +
        s"rules=${rules.length} first=${rules.headOption.map(_.toSeq)}")
      docs.unpersist()
    }

    // The scale row the sequential loop cannot reach: a real vocabulary
    // (>= 1024 merges) over >= 10^5 docs via trainMergesBatched — one
    // counting round per BATCH of symbol-disjoint merges, so the Spark
    // job count is merges/maxBatch, not merges.
    // the 4096-merge row turns the "linear in rounds" extrapolation
    // into a measured second point (4× the merges ≈ 4× the rounds)
    for ((n, merges, batch) <- Seq((100000L, 1024, 64),
        (1000000L, 1024, 64), (1000000L, 4096, 64))
        if mode != "sequential") {
      val docs = corpus(n).persist()
      docs.count()
      val t0 = System.nanoTime()
      val rules = graft.operators.Bpe.trainMergesBatched(
        docs, "text", merges = merges, maxBatch = batch).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"BPE-batched n=$n%8d  $merges merges (batch=$batch)  " +
        f"${sec}%6.1f s  learned=${rules.length}")
      Console.flush()
      docs.unpersist()
    }
    spark.stop()
  }
}
