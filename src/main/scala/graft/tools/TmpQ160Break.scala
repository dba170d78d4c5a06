package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{ArrayOps, Text}
object TmpQ160Break {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val base = graft.Tables.documents(spark, d).select(col("doc_id"), col("text"))
    val quotes = base.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 3000000L).as("doc_id"),
        concat_ws(" ", lit("quoted from the original article"),
          array_join(slice(split(col("text"), " "), 1, 12), " "),
          lit("end of quotation block")).as("text"))
    val df = base.unionByName(quotes)
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[brk] $tag: ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    val k = 6; val w = 3; val t = w + k - 1
    val toks = Text.tokens(col("text"))
    val docs = df.select(col("doc_id").cast("long").as("id"),
        ArrayOps.winnow(toks, k, w).as("fp"),
        array_distinct(Text.shingles(toks, t)).as("runs"))
      .filter(size(col("runs")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("docs materialize")(docs.count())
    val fp = docs.select(col("id"), explode(col("fp")).as("f"))
    time("fp count")(println("[brk] fp rows " + fp.count()))
    val fpDf = fp.groupBy(col("f")).agg(count(lit(1)).as("fdf")).filter(col("fdf") > Long.MaxValue)
    val kept = fp.join(broadcast(fpDf.select(col("f"))), Seq("f"), "left_anti")
    val cand = kept.as("x").join(kept.as("y"),
        col("x.f") === col("y.f") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
      .persist()
    time("cand")(println("[brk] cand " + cand.count()))
    val withA = docs.select(col("id").as("id_a"), col("runs").as("runs_a"))
      .join(broadcast(cand), Seq("id_a"))
    val out = docs.select(col("id").as("id_b"), col("runs").as("runs_b"))
      .join(broadcast(withA), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("runs_a"), col("runs_b"))).cast("long").as("n"))
      .filter(col("n") > 0)
    time("verify")(println("[brk] out " + out.count()))
  }
}
