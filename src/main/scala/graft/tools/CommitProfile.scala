package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Profiles the versioned-lake commit path (guide §1: measure first).
  * Replays q192's mutate phase — writeIndexLake + 8 appendToIndexLake —
  * under the Bench session conf with a job listener, printing per-append
  * wall, the number of Spark jobs each commit launches, and the summed
  * job time, so driver-side metadata I/O (wall − job time) is separable
  * from job overhead (job count × scheduling floor) and real compute.
  */
object CommitProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", 10000)
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("COMMIT_PROFILE_LIST_THRESHOLD", "32"))
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var jobNanos = 0L
    val verbose = sys.env.get("COMMIT_PROFILE_VERBOSE").contains("1")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = j.stageInfos.map(_.name).mkString(" | ").take(120)
        starts.put(j.jobId, (System.nanoTime(), site)): Unit
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        jobs += 1
        Option(starts.remove(j.jobId)).foreach { case (t0, site) =>
          val d = System.nanoTime() - t0
          jobNanos += d
          if (verbose)
            println(f"    job ${j.jobId}%3d ${d / 1e9}%6.3f s  $site")
        }
      }
    })

    val docs = graft.Tables.documents(spark, sfDir)
    // warm-up: touch the table + codegen paths once
    docs.count(): Unit

    def phase[A](label: String)(f: => A): A = {
      Thread.sleep(50) // let listener events drain
      val (j0, n0) = (jobs, jobNanos)
      val t0 = System.nanoTime()
      val r = f
      Thread.sleep(50)
      val wall = (System.nanoTime() - t0) / 1e9
      val js = jobs - j0
      val jt = (jobNanos - n0) / 1e9
      println(f"$label%-22s wall=$wall%6.2f s  jobs=$js%3d  jobtime=$jt%6.2f s  driver=${wall - jt}%6.2f s")
      r
    }

    val dir = graft.Tables.freshScratchDir("graft_profcommit_", sfDir)
      .toString + "/index"
    phase("writeIndexLake") {
      graft.operators.IndexLake.writeIndexLake(
        docs.filter(col("doc_id") % 9 === 0), "doc_id", "text", dir,
        nBuckets = 16)
    }
    (1 to 8).foreach { m =>
      phase(s"append m=$m") {
        graft.operators.IndexLake.appendToIndexLake(
          docs.filter(col("doc_id") % 9 === m), "doc_id", "text", dir)
      }
    }
    phase("deleteFromIndexLake") {
      graft.operators.IndexLake.deleteFromIndexLake(
        spark, dir, docs.filter(col("doc_id") % 5 === 2).select("doc_id"))
    }
    phase("compactIndexLake") {
      graft.operators.IndexLake.compactIndexLake(spark, dir)
    }
    val qset = Seq(
      1L -> Seq("hash", "join", "dup"),
      2L -> Seq("window", "stream", "agg"),
      3L -> Seq("vector", "scan", "filter", "sort"))
    phase("bm25 search") {
      graft.operators.IndexLake.bm25TopKOverIndex(spark, dir, qset, k = 10)
        .count()
    }
    // plain lake appends too (the q191/q196/q200 shape): small frames,
    // stats on one long column. COMMIT_PROFILE_PLAIN sets the commit
    // count (26+ shows the q201-class long-history tail: anchor writes
    // at v10/v20, checkpoint rewrites trailing them)
    val nPlain = sys.env.getOrElse("COMMIT_PROFILE_PLAIN", "6").toInt
    val dir2 = graft.Tables.freshScratchDir("graft_profcommit_", sfDir)
      .toString + "/lake"
    (0 until nPlain).foreach { m =>
      phase(s"plain append $m") {
        graft.sinks.VersionedLake.commitAppend(spark, dir2,
          docs.filter(col("doc_id") % nPlain === m)
            .select(col("doc_id"), col("text")),
          statsCol = if (m == 0) Some("doc_id") else None)
      }
    }
    // the q184 IVF-sync sequence, phase by phase
    if (sys.env.get("COMMIT_PROFILE_IVF").contains("1")) {
      import graft.sinks.VersionedLake
      import graft.operators.Similarity
      val emb = graft.Tables.embeddings(spark, sfDir)
      emb.count(): Unit
      val qs = emb.filter(col("vec_id") < 10)
      val scratch = graft.Tables.freshScratchDir("graft_profivf_", sfDir)
      val lakeDir = s"$scratch/lake"
      val ivfDir = s"$scratch/ivf"
      val base = emb.filter(col("vec_id") % 7 =!= 6)
        .select(col("vec_id"), col("embedding"))
      phase("emb commitAppend") {
        VersionedLake.commitAppend(spark, lakeDir, base)
      }
      phase("writeIvfLake") {
        Similarity.writeIvfLake(VersionedLake.read(spark, lakeDir), ivfDir,
          "vec_id", "embedding", dim = 64, nCells = 64)
      }
      val updates = emb.as("a")
        .join(emb.as("b"), col("a.vec_id") - 1 === col("b.vec_id"))
        .filter(col("a.vec_id") % 9 === 5 && col("a.vec_id") % 7 =!= 6)
        .select(col("a.vec_id").as("vec_id"),
          col("b.embedding").as("embedding"))
        .unionByName(emb.filter(col("vec_id") % 7 === 6)
          .select(col("vec_id"), col("embedding")))
      phase("commitUpsert") {
        VersionedLake.commitUpsert(spark, lakeDir, "vec_id", updates)
      }
      phase("commitDelete") {
        VersionedLake.commitDelete(spark, lakeDir, "vec_id",
          emb.filter(col("vec_id") % 11 === 3).select("vec_id"))
      }
      val feed = phase("changesBetween (lazy)") {
        VersionedLake.changesBetween(spark, lakeDir, 1L,
          VersionedLake.currentVersion(spark, lakeDir), "vec_id")
      }
      phase("applyChangesToIvf") {
        Similarity.applyChangesToIvfLake(spark, ivfDir, feed,
          "vec_id", "embedding", dim = 64)
      }
      phase("ivf search") {
        Similarity.ivfTopKOverLake(spark, ivfDir, qs, "vec_id",
          "embedding", dim = 64, k = 5, nProbe = 28).count()
      }
      phase("frozen twin") {
        Similarity.ivfTopKFrozen(VersionedLake.read(spark, lakeDir), qs,
          "vec_id", "embedding", dim = 64, k = 5, lakeDir = ivfDir,
          nProbe = 28).count()
      }
    }
    spark.stop()
  }
}
