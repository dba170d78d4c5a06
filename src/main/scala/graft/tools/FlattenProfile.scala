package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.flatten.{Flattener, RenderPass, StatsPass}

/** Stage-by-stage timing of the flatten pipeline on N golden-doc copies —
  * the profiling harness behind the cold-start work and the
  * flatten-at-volume evidence (run with
  * `runMain graft.tools.FlattenProfile [n]`).
  *
  * Volume-safe by construction: the JSONL input is streamed to disk
  * through a buffered writer (one Jackson serialization total — each
  * doc is the golden template with only the claimRequestId digits
  * spliced), and the schema is inferred once from a 10-doc prefix and
  * reused for the full read, which is exactly the schema-reuse path a
  * recurring 100 TB export job would run (the corpus shape is stable;
  * re-inferring per run is the anti-pattern). At n=100000 the input is
  * ~15 GB of 5k-wide JSON.
  */
object FlattenProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one big JSONL file + default 128m maxPartitionBytes = 1-2 parse
    // tasks; small splits let all cores parse/infer
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val golden = "/root/reference/ElasticSearch_Document.json"
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(new java.io.File(golden))
    val src = root.get("hits").get("hits").get(0).get("_source")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    // serialize ONCE; per doc splice fresh digits into the
    // claimRequestId slot so each row is distinct without re-walking
    // the 5k-field tree n times
    src.put("claimRequestId", 1111111111L)
    val template = mapper.writeValueAsString(src)
    val marker = "\"claimRequestId\":1111111111"
    val at = template.indexOf(marker)
    require(at >= 0, "claimRequestId marker not found in template")
    val pre = template.substring(0, at + marker.length - 10)
    val post = template.substring(at + marker.length)
    val in = Files.createTempDirectory("flatprof")
    t("generate JSONL (driver)") {
      val w = Files.newBufferedWriter(
        in.resolve("docs.jsonl"), StandardCharsets.UTF_8)
      try (0 until n).foreach { i =>
        w.write(pre); w.write((1000000000L + i).toString); w.write(post)
        w.write("\n")
      } finally w.close()
    }
    println(s"[profile] docs: $n, input bytes: " +
      Files.size(in.resolve("docs.jsonl")))

    // schema-reuse path: the corpus shape is stable across docs, so
    // infer from a tiny prefix and reuse — what a recurring job does
    val inferred = t("schema inference (10-doc prefix)") {
      val head = Files.newBufferedReader(in.resolve("docs.jsonl"))
      val prefix = try Iterator.continually(head.readLine())
        .takeWhile(_ != null).take(10).toSeq finally head.close()
      import spark.implicits._
      spark.read.json(spark.createDataset(prefix)).schema
    }
    val input = spark.read.schema(inferred)
      .json(in.resolve("docs.jsonl").toString)
    val batch = t("StatsPass.collect")(StatsPass.collect(input))
    val cand = t("candidates (driver)")(
      Flattener.candidates(input.schema, batch.arrays))
    val cols = cand.collect {
      case (name, rawPath, _) if batch.present(rawPath) => name
    }
    println(s"[profile] columns: ${cols.length}")
    val wall0 = System.nanoTime()
    t("render + write") {
      val header = RenderPass.tsvLine(cols.toArray)
      val lines = RenderPass.renderTsvLines(input, batch.arrays, cols, 20)
        .mapPartitions(it => Iterator(header) ++ it)
      import spark.implicits._
      spark.createDataset(lines).write.mode("overwrite")
        .text(in.resolve("tsv").toString)
    }
    val wall = (System.nanoTime() - wall0) / 1e9
    val peakHeapMb = java.lang.management.ManagementFactory
      .getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .map(_.getPeakUsage.getUsed).sum / (1024 * 1024)
    println(f"[profile] render docs/s: ${n / wall}%.1f, " +
      s"peak heap MB: $peakHeapMb")
    spark.stop()
  }
}
