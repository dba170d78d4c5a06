package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query names (fast local iteration
    // on a subset; the driver always runs the full surface)
    val Array(sfDir, outDir) = args.take(2)
    val only = args.lift(2).map(_.split(',').toSet)
    // drop prior-run scratch (stale lake exports, old verify dumps) but
    // never the dump dir this run is about to write
    Bench.cleanStaleTmp(keep =
      Set(new java.io.File(outDir).getAbsolutePath))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // bounded-buffer TypedImperativeAggregates never need the
      // sort-based fallback; see the Bench.scala note + tools/TopKProfile
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        1 << 20)
      // session-lifetime codegen class cache (see the Bench.scala note:
      // the default 100 entries churns completely across 151 queries)
      .config("spark.sql.codegen.cache.maxEntries", 10000)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // run with the engine's extensions on (custom SQL functions + the
      // levenshtein length-prefilter rule) — results must be invariant
      .withExtensions(new GraftExtensions)
    // SPARK_GRAFT_AQE=false runs the parity sweep proving correctness
    // never leans on adaptive execution (plan shapes are pinned with AQE
    // on; results must be invariant with it off)
    sys.env.get("SPARK_GRAFT_AQE")
      .foreach(v => builder.config("spark.sql.adaptive.enabled", v))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // release operator-internal persists/iterative caches between queries
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
