package graft.tools

import org.apache.spark.sql.SparkSession

/** Flatten a JSONL document file to a single TSV — the Spark half of the
  * cross-language differential test (`tools/differential.py`).
  */
object FlattenDump {
  def main(args: Array[String]): Unit = {
    val Array(in, out) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read
      .option("inferTimestamp", false).option("inferDate", false)
      .json(in)
    graft.sinks.Tsv.writeSingleFile(graft.flatten.Flattener.flatten(df), out)
    spark.stop()
  }
}
