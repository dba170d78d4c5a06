package graft.sinks

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Small-file compaction: the file census must shrink to the
  * byte-derived target, content must be row-identical through the
  * rewrite + directory swap, pruning must still hold on the compacted
  * layout, a HOT partition must compact in parallel (more than one
  * output file, sized by the byte census — not one straggler file), and
  * the rename-only swap must leave the original data intact on any
  * injected failure.
  */
class LakeCompactionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def parquetFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f)
      else Seq.empty
    walk(new java.io.File(dir))
  }

  test("compaction shrinks the census, preserves rows, keeps pruning") {
    import spark.implicits._
    val dir = Files.createTempDirectory("lake_compact_").toFile
      .getAbsolutePath + "/docs"
    val df = (0 until 2000)
      .map(i => (i.toLong, s"lang${i % 3}", s"text body $i"))
      .toDF("doc_id", "lang", "text")
    // fragment deliberately: 16 slices × 3 langs ≈ 48 small files
    Lake.writePartitioned(df.repartition(16), dir, "lang")
    val (before, bytes) = Lake.fileStats(spark, dir)
    assert(before >= 30L, s"fixture not fragmented: $before files")

    val (reportedBefore, after) = Lake.compact(spark, dir, "lang")
    assert(reportedBefore == before)
    // generous target → one slice per lang → one file per lang directory
    assert(after <= 3L, s"census did not shrink: $before -> $after")
    assert(after < before)

    // content row-identical through rewrite + swap
    val back = Lake.read(spark, dir)
      .select("doc_id", "lang", "text")
      .as[(Long, String, String)].collect().toSet
    val want = df.as[(Long, String, String)].collect().toSet
    assert(back == want)

    // pruning still holds on the compacted layout
    val plan = Lake.read(spark, dir).filter(col("lang") === "lang1")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)

    // no leftover scratch — swap completed and cleaned up after itself
    assert(!new java.io.File(dir + ".compact_tmp").exists())
    assert(!new java.io.File(dir + ".compact_backup").exists())
  }

  test("hot partition compacts in parallel, sliced by the byte census") {
    import spark.implicits._
    val dir = Files.createTempDirectory("lake_skew_").toFile
      .getAbsolutePath + "/docs"
    // one partition holds ~95% of the bytes — the majority-English-corpus
    // shape where repartition(partCol) alone would serialize the rewrite
    // into one straggler task writing one oversized file
    val hot = (0 until 20000)
      .map(i => (i.toLong, "en", s"hot body $i " + ("x" * 200)))
    val cold = (0 until 300)
      .map(i => (100000L + i, s"cold${i % 2}", s"cold body $i"))
    val df = (hot ++ cold).toDF("doc_id", "lang", "text")
    Lake.writePartitioned(df.repartition(8), dir, "lang")

    // target an 8-way split of the lake's bytes: the hot partition's
    // census share (~95%) derives ~8 slices for it, 1 each for the colds
    val (_, bytes) = Lake.fileStats(spark, dir)
    val (_, after) = Lake.compact(spark, dir, "lang",
      targetFileBytes = math.max(1L, bytes / 8))

    // the hot partition must come out as MULTIPLE census-sized files
    // (slice→task assignment is by hash, so allow collisions to merge a
    // few slices — but a single straggler file means the salt is dead)
    val hotFiles = parquetFiles(s"$dir/lang=en")
    assert(hotFiles.size >= 2,
      s"hot partition compacted to ${hotFiles.size} file(s) — no " +
        "parallelism; census-derived slicing is not working")
    // no file should hold the whole hot partition
    val hotBytes = hotFiles.map(_.length()).sum
    assert(hotFiles.map(_.length()).max < hotBytes,
      "one file holds the entire hot partition")
    // cold partitions stay single-file (1 slice each)
    assert(parquetFiles(s"$dir/lang=cold0").size == 1)
    assert(parquetFiles(s"$dir/lang=cold1").size == 1)
    assert(after == hotFiles.size + 2L)

    // content invariant through the skewed rewrite
    val back = Lake.read(spark, dir)
      .select("doc_id", "lang", "text")
      .as[(Long, String, String)].collect().toSet
    assert(back == df.as[(Long, String, String)].collect().toSet)
  }

  test("swap failures leave the original lake intact") {
    import spark.implicits._
    val root = Files.createTempDirectory("lake_swap_").toFile.getAbsolutePath
    val dir = s"$root/docs"
    val df = (0 until 100).map(i => (i.toLong, s"lang${i % 2}", s"t$i"))
      .toDF("doc_id", "lang", "text")
    Lake.writePartitioned(df, dir, "lang")
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    def readBack(): Set[(Long, String, String)] =
      Lake.read(spark, dir).select("doc_id", "lang", "text")
        .as[(Long, String, String)].collect().toSet
    val want = df.as[(Long, String, String)].collect().toSet

    // failure mode 1: the move-aside rename fails (the backup path's
    // parent is a FILE, so neither a native rename nor hadoop's
    // copy-fallback can create it) → swap aborts BEFORE touching live
    val tmp1 = s"$root/tmp1"
    Lake.writePartitioned(df, tmp1, "lang")
    Files.writeString(java.nio.file.Paths.get(s"$root/blocker"), "x")
    intercept[Exception] {
      Lake.swapDirs(fs, new Path(dir), new Path(tmp1),
        new Path(s"$root/blocker/backup"))
    }
    assert(readBack() == want, "live lake damaged by an aborted swap")

    // failure mode 2: the tmp → live rename fails (tmp missing) AFTER the
    // live dir was moved aside → the original must be RESTORED
    val err = intercept[IllegalStateException] {
      Lake.swapDirs(fs, new Path(dir), new Path(s"$root/no_such_tmp"),
        new Path(s"$root/backup2"))
    }
    assert(err.getMessage.contains("original restored"), err.getMessage)
    assert(readBack() == want, "live lake not restored after failed swap")
    assert(!new java.io.File(s"$root/backup2").exists(),
      "restore left the backup behind")
  }
}
