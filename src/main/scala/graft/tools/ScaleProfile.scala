package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-evidence runner for the dedup/cluster/ANN family (VERDICT r3 #3):
  * self-replicates the sf0.1 documents/embeddings tables to ~10^5 and
  * ~10^6 rows and times `minhashLsh → clusters → dedupedCorpus` and
  * `ivfTopK` at each size, printing wall seconds, result cardinalities,
  * and total shuffle bytes so the ~linear scaling claim in PLANS.md is a
  * measurement, not a plan-shape argument.
  *
  * Replication is NOT naive copying: identical copies would all land in
  * the same LSH buckets and manufacture quadratic candidate blocks that
  * no real corpus has. Every replica r of doc i swaps each 7th token for
  * a family-unique salt (distinct families stay far below the Jaccard
  * threshold, sibling replicas of one family land ~0.1 on the Jaccard
  * scale — plausible crawl noise), while each ODD replica differs from
  * its even predecessor by exactly one extra token — a planted near-dup
  * pair per (i, even r), so the detected-duplicate fraction stays ~50%
  * at every scale and the verify/cluster stages do real work.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ScaleProfile"
  */
object ScaleProfile {

  private final class ShuffleBytes extends SparkListener {
    val read = new AtomicLong(0L)
    val written = new AtomicLong(0L)
    // spill evidence: when execution memory is scarce the aggregates /
    // sorts must degrade to disk (graceful), not OOM — these two counters
    // are the proof a constrained run actually exercised that path
    val memSpilled = new AtomicLong(0L)
    val diskSpilled = new AtomicLong(0L)
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead): Unit
        written.addAndGet(m.shuffleWriteMetrics.bytesWritten): Unit
        memSpilled.addAndGet(m.memoryBytesSpilled): Unit
        diskSpilled.addAndGet(m.diskBytesSpilled): Unit
      }
    }
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** ×`reps` the documents table with salted ids and perturbed text. */
  private def replicateDocs(spark: SparkSession, sf: String,
      reps: Int): DataFrame = {
    val base = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    spark.range(reps.toLong).withColumnRenamed("id", "r")
      .join(broadcast(base))
      .select(
        (col("doc_id") * reps + col("r")).as("doc_id"),
        expr(
          // family salt keyed by (doc_id, r - r%2): even/odd siblings
          // share salts; the odd sibling then appends one extra token
          """concat(
               array_join(transform(split(text, ' '), (x, i) ->
                 CASE WHEN i % 7 = 0
                   THEN concat('s', doc_id, '_', r - r % 2)
                   ELSE x END), ' '),
               CASE WHEN r % 2 = 1 THEN concat(' d', r) ELSE '' END)"""
        ).as("text"))
  }

  /** ×`reps` the embeddings table with per-replica vector perturbation. */
  private def replicateVecs(spark: SparkSession, sf: String,
      reps: Int): DataFrame = {
    val base = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    spark.range(reps.toLong).withColumnRenamed("id", "r")
      .join(broadcast(base))
      .select(
        (col("vec_id") * reps + col("r")).as("vec_id"),
        expr(
          """transform(embedding, (x, i) ->
               CAST(x + CAST(pmod(hash(vec_id, r, i), 1000) AS FLOAT)
                 / 50000.0 AS FLOAT))""").as("embedding"))
  }

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // spill-pressure mode: SPARK_GRAFT_MEMORY_FRACTION shrinks the
    // unified memory region (pair with a small driver -Xmx) so the dedup
    // family can be shown degrading to disk spill instead of OOM — the
    // scarce-memory half of the 100 TB story
    val memFraction = sys.env.get("SPARK_GRAFT_MEMORY_FRACTION")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    memFraction.foreach(f => builder.config("spark.memory.fraction", f))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def parseList(i: Int, dflt: Array[Int]): Array[Int] =
      if (args.length > i) {
        // "-" (or empty) skips the phase — sbt runMain cannot pass a
        // literally empty quoted arg through its own tokenizer
        val a = args(i).trim
        if (a.isEmpty || a == "-" || a == "''")
          Array.empty
        else a.split(",").map(_.toInt)
      } else dflt
    val docReps = parseList(0, Array(20, 200)) // 5k docs ×20=1e5, ×200=1e6
    val vecReps = parseList(1, Array(50, 500)) // 2k vecs ×50=1e5, ×500=1e6
    // adversarial-skew phase: "normalReps,spamCopies" — spamCopies
    // IDENTICAL docs planted on top of a replicated normal corpus
    val spamSpec = parseList(2, Array(180, 100000))

    def profileDedup(label: String, docs: DataFrame, extra: String): Unit = {
      val sb = new ShuffleBytes
      spark.sparkContext.addSparkListener(sb)
      val (n, _) = time(docs.count())
      val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val pairs = graft.operators.Dedup.minhashLsh(
        docs, "doc_id", "text", threshold = 0.5).persist(lvl)
      val (nPairs, tPairs) = time(pairs.count())
      val cl = graft.operators.Dedup.clusters(pairs)
      val (nClustered, tCl) = time { cl.persist(lvl); cl.count() }
      val (nKept, tDedup) = time(
        graft.operators.Dedup.dedupedCorpus(docs, "doc_id", cl).count())
      println(f"SCALE $label%s n=$n%d pairs=$nPairs%d clustered=$nClustered%d " +
        f"kept=$nKept%d lsh_s=$tPairs%.1f cluster_s=$tCl%.1f " +
        f"dedup_s=$tDedup%.1f shuffle_read_mb=${sb.read.get / 1e6}%.0f " +
        f"shuffle_write_mb=${sb.written.get / 1e6}%.0f " +
        f"mem_spill_mb=${sb.memSpilled.get / 1e6}%.0f " +
        f"disk_spill_mb=${sb.diskSpilled.get / 1e6}%.0f$extra%s")
      spark.sparkContext.removeSparkListener(sb)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    docReps.foreach { reps =>
      profileDedup("docs", replicateDocs(spark, sf, reps), "")
    }

    // Template-spam corpus: the adversarial shape for banded LSH — a
    // mega-family of byte-identical docs shares every band bucket, so an
    // uncapped self-join would emit O(family²) candidates (10^5 copies →
    // 4×10^10; the job would not finish). The hot-bucket star guard must
    // keep candidates ~O(corpus + family) and the collapsed output must
    // still drop every spam copy but one.
    spamSpec.grouped(2).filter(_.length == 2).foreach { case Array(reps, spamN) =>
      val template = graft.Tables.documents(spark, sf)
        .filter(col("doc_id") === 3L).select(col("text"))
        .first().getString(0)
      val spam = spark.range(spamN.toLong).select(
        (col("id") + 2000000000L).as("doc_id"), lit(template).as("text"))
      val corpus = replicateDocs(spark, sf, reps).unionByName(spam)
      profileDedup("spam", corpus, f" spam_family=$spamN%d")
    }

    // Shared-span dedup (q84 family): the replicated corpus's family
    // salts keep most 8-gram spans family-local (df = 2 siblings), while
    // the unsalted runs between salt positions repeat across ALL
    // replicas of a base doc — exactly the "ubiquitous span" population
    // the df cap must drop for the self-join to stay sub-quadratic.
    // 4th arg: comma list of reps (default 20,200 → 10^5/10^6 docs).
    val spanReps = parseList(3, Array(20, 200))
    spanReps.foreach { reps =>
      val sb = new ShuffleBytes
      spark.sparkContext.addSparkListener(sb)
      val docs = replicateDocs(spark, sf, reps)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = docs.count()
      val (nPairs, tSpan) = time(
        graft.operators.Dedup.sharedSpanPairs(
          docs, "doc_id", "text", n = 8, maxDf = 50, minShared = 3).count())
      println(f"SCALE spans n=$n%d pairs=$nPairs%d span_s=$tSpan%.1f " +
        f"shuffle_read_mb=${sb.read.get / 1e6}%.0f " +
        f"shuffle_write_mb=${sb.written.get / 1e6}%.0f")
      spark.sparkContext.removeSparkListener(sb)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    // Native AS-OF exec vs the union+window twin at scale: synthetic
    // (key, time) streams — left 10× the right side, ~10^3 rows per key —
    // timed over identical inputs. The native merge holds ONE retained
    // row per partition where the window form sorts and scans frames;
    // both pay the same co-partitioning shuffle. 5th arg: comma list of
    // left-row counts (default 1e6,1e7).
    val asofSizes = parseList(4, Array(1000000, 10000000))
    asofSizes.foreach { n =>
      val keys = math.max(1, n / 1000)
      val left = spark.range(n.toLong).select(
        (col("id") % keys).as("k"), (col("id") * 7L % 1000000L).as("t"),
        col("id").as("fact_id"))
      val right = spark.range(n.toLong / 10).select(
        (col("id") % keys).as("k"), (col("id") * 13L % 1000000L).as("t"),
        (col("id") + 5000000000L).as("ver"))
      val sb1 = new ShuffleBytes
      spark.sparkContext.addSparkListener(sb1)
      val (nNative, tNative) = time(
        graft.plans.AsOfJoinNative.asOf(left, right, "k", "t", Seq("ver"))
          .filter(col("ver").isNotNull).count())
      spark.sparkContext.removeSparkListener(sb1)
      val sb2 = new ShuffleBytes
      spark.sparkContext.addSparkListener(sb2)
      val (nWindow, tWindow) = time(
        graft.operators.TemporalJoin.asOf(left, right, "k", "t", Seq("ver"))
          .filter(col("asof.ver").isNotNull).count())
      spark.sparkContext.removeSparkListener(sb2)
      require(nNative == nWindow,
        s"native/window row mismatch: $nNative vs $nWindow")
      println(f"SCALE asof n=$n%d matched=$nNative%d native_s=$tNative%.1f " +
        f"window_s=$tWindow%.1f native_shuffle_mb=${sb1.read.get / 1e6}%.0f " +
        f"window_shuffle_mb=${sb2.read.get / 1e6}%.0f")
    }

    // Threshold-1.0 exact-dup fast path (round 6): the window-marked
    // one-shuffle shape, profiled on a replicated corpus carrying a
    // byte-identical spam family — star edges must keep pairs O(corpus +
    // family) and the window partition buffer must absorb the family
    // without an aggregation-buffer blowup. 6th arg: "reps,spamCopies".
    val exactSpec = parseList(5, Array(200, 100000))
    exactSpec.grouped(2).filter(_.length == 2).foreach { case Array(reps, spamN) =>
      val sb = new ShuffleBytes
      spark.sparkContext.addSparkListener(sb)
      val template = graft.Tables.documents(spark, sf)
        .filter(col("doc_id") === 3L).select(col("text"))
        .first().getString(0)
      val spam = spark.range(spamN.toLong).select(
        (col("id") + 2000000000L).as("doc_id"), lit(template).as("text"))
      val corpus = replicateDocs(spark, sf, reps).unionByName(spam)
      val (n, _) = time(corpus.count())
      val (nPairs, tExact) = time(
        graft.operators.Dedup.minhashLsh(corpus, "doc_id", "text",
          threshold = 1.0).count())
      println(f"SCALE exact1 n=$n%d pairs=$nPairs%d exact_s=$tExact%.1f " +
        f"shuffle_read_mb=${sb.read.get / 1e6}%.0f " +
        f"shuffle_write_mb=${sb.written.get / 1e6}%.0f " +
        f"mem_spill_mb=${sb.memSpilled.get / 1e6}%.0f " +
        f"disk_spill_mb=${sb.diskSpilled.get / 1e6}%.0f spam_family=$spamN%d")
      spark.sparkContext.removeSparkListener(sb)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    vecReps.foreach { reps =>
      val sb = new ShuffleBytes
      spark.sparkContext.addSparkListener(sb)
      val vecs = replicateVecs(spark, sf, reps)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = vecs.count()
      val queries = graft.Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding")).limit(50)
      val dim = graft.Tables.embeddings(spark, sf)
        .selectExpr("size(embedding)").first().getInt(0)
      val (nHits, tIvf) = time(
        graft.operators.Similarity.ivfTopK(
          vecs, queries, "vec_id", "embedding", dim = dim, k = 5).count())
      println(f"SCALE ivf n=$n%d hits=$nHits%d ivf_s=$tIvf%.1f " +
        f"shuffle_read_mb=${sb.read.get / 1e6}%.0f " +
        f"shuffle_write_mb=${sb.written.get / 1e6}%.0f")
      spark.sparkContext.removeSparkListener(sb)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
