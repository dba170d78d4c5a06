package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.flatten.{Flattener, RenderPass, StatsPass}

/** Stage-by-stage timing of the flatten pipeline on N golden-doc copies —
  * the profiling harness behind the cold-start work (run with
  * `runMain graft.tools.FlattenProfile [n]`).
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

    val golden = "/root/reference/ElasticSearch_Document.json"
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(new java.io.File(golden))
    val src = root.get("hits").get("hits").get(0).get("_source")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val sb = new StringBuilder
    (0 until n).foreach { i =>
      src.put("claimRequestId", 3590021L + i)
      sb.append(mapper.writeValueAsString(src)).append('\n')
    }
    val in = Files.createTempDirectory("flatprof")
    Files.writeString(in.resolve("docs.jsonl"), sb.toString)

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val inferred = t("schema inference") {
      spark.read.json(in.resolve("docs.jsonl").toString).schema
    }
    val df = t("read with known schema") {
      spark.read.schema(inferred).json(in.resolve("docs.jsonl").toString)
    }
    val input = t("persist + materialize") {
      val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count()
      p
    }
    val batch = t("StatsPass.collect")(StatsPass.collect(input))
    val cand = t("candidates (driver)")(
      Flattener.candidates(input.schema, batch.arrays))
    val cols = cand.collect {
      case (name, rawPath, _) if batch.present(rawPath) => name
    }
    println(s"[profile] columns: ${cols.length}")
    t("render + write") {
      val header = RenderPass.tsvLine(cols.toArray)
      val lines = RenderPass.renderTsvLines(input, batch.arrays, cols, 20)
        .mapPartitions(it => Iterator(header) ++ it)
      import spark.implicits._
      spark.createDataset(lines).write.mode("overwrite")
        .text(in.resolve("tsv").toString)
    }
    t("render + write (warm)") {
      val header = RenderPass.tsvLine(cols.toArray)
      val lines = RenderPass.renderTsvLines(input, batch.arrays, cols, 20)
        .mapPartitions(it => Iterator(header) ++ it)
      import spark.implicits._
      spark.createDataset(lines).write.mode("overwrite")
        .text(in.resolve("tsv2").toString)
    }
    t("full flattenToTsv (warm-ish)") {
      Flattener.flattenToTsv(input, in.resolve("tsv3").toString)
    }
    spark.stop()
  }
}
