package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Small-file compaction: the file census must shrink to the
  * byte-derived target, content must be row-identical through the
  * rewrite + directory swap, and partition pruning must still hold on
  * the compacted layout.
  */
class LakeCompactionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

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
    // generous target → one output task → one file per lang directory
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

    // no leftover tmp directory — the swap is all-or-nothing
    assert(!new java.io.File(dir + ".compact_tmp").exists())
  }
}
