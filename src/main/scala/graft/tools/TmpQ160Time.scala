package graft.tools
import org.apache.spark.sql.SparkSession
object TmpQ160Time {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (r <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("q160_winnowed_runs")(
        spark, "/root/testdata/sf0.1").count()
      println(f"run$r: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
  }
}
