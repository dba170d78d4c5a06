package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cdc

/** Streaming CDC merge invariants: batch-boundary independence (an
  * out-of-order change in a LATER micro-batch loses to the higher-seq
  * row already merged), tombstone retention (a stale upsert cannot
  * resurrect a deleted key), replay idempotency, and the versioned
  * copy-on-write trail.
  */
class CdcStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Writes rows as ONE parquet file at dir/name (file-source glob
    * target — each file becomes its own micro-batch).
    */
  private def oneFile(dir: String, name: String,
      rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
    import spark.implicits._
    val tmp = s"$dir/_stage_$name"
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, Paths.get(dir, name))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  private def fixture(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_cdcspec_").toString
    Seq((1460L, 10.00, "SEED"), (1470L, 20.00, "SEED"),
      (1480L, 30.00, "SEED"), (1490L, 40.00, "SEED"),
      (1500L, 50.00, "SEED"))
      .toDF("c_custkey", "c_acctbal", "c_mktsegment")
      .coalesce(1).write.parquet(s"$dir/customer.parquet")
    // three single-file batches; ts is the NANOSECOND long the raw
    // events feed carries (seq grid = ts div 1000). Out-of-order by
    // construction: the stale changes for keys 1460/1470 arrive in
    // LATER files than the winners they must lose to.
    oneFile(dir, "ev_a.parquet", Seq(
      (1L, 5000L, 10L, "update", 1.11, "{}"),   // 1460 seq 5 — wins
      (2L, 9000L, 20L, "error", 0.0, "{}"),     // 1470 seq 9 — delete wins
      (3L, 2000L, 30L, "update", 2.22, "{}")))  // 1480 seq 2
    oneFile(dir, "ev_b.parquet", Seq(
      (4L, 7000L, 20L, "update", 9.99, "{}")))  // 1470 seq 7 — stale upsert
    oneFile(dir, "ev_c.parquet", Seq(
      (5L, 3000L, 10L, "update", 7.77, "{}"),   // 1460 seq 3 — stale
      (6L, 8000L, 30L, "update", 8.88, "{}"),   // 1480 seq 8 — wins
      (7L, 1000L, 50L, "error", 0.0, "{}")))    // 1500 delete
    dir
  }

  test("multi-batch out-of-order stream converges to the batch CDC result") {
    val dir = fixture()
    val got = CdcStream.mergedSnapshot(spark, dir,
        sourceGlob = "ev_*.parquet", maxFilesPerTrigger = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set(
      (1460L, 111L, "EVENT"),   // later stale seq-3 upsert lost
      (1480L, 888L, "EVENT"),   // later seq-8 upsert won
      (1490L, 4000L, "SEED")),  // untouched snapshot row
      got.toString)              // 1470/1500 stay deleted
    // the copy-on-write trail proves it really merged batch-by-batch:
    // v0 (seed) + one version per single-file micro-batch
    val root = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_cdcstream_" + graft.Tables.scratchKey(dir + "ev_*.parquet"))
    val versions = new java.io.File(root.toString).listFiles()
      .map(_.getName).filter(_.startsWith("v")).sorted
    assert(versions.toSeq == Seq("v0", "v1", "v2", "v3"), versions.mkString(","))
  }

  test("mergeVersioned: stale upsert cannot resurrect a tombstoned key") {
    import spark.implicits._
    val state = Seq((1L, 100L, 9L, "delete"), (2L, 200L, 4L, "upsert"))
      .toDF("k", "v", "seq", "op")
    val stale = Seq((1L, 999L, 7L, "upsert")).toDF("k", "v", "seq", "op")
    val merged = Cdc.mergeVersioned(state, stale, "k", Seq("seq"), "op")
    val row1 = merged.filter(col("k") === 1L).collect().head
    assert(row1.getAs[String]("op") == "delete" && row1.getAs[Long]("seq") == 9L)
  }

  test("mergeVersioned: replaying an applied batch is a no-op") {
    import spark.implicits._
    val state = Seq((1L, 100L, 2L, "upsert"), (2L, 200L, 4L, "upsert"))
      .toDF("k", "v", "seq", "op")
    val batch = Seq((1L, 111L, 5L, "upsert"), (2L, 222L, 3L, "upsert"))
      .toDF("k", "v", "seq", "op")
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    val once = Cdc.mergeVersioned(state, batch, "k", Seq("seq"), "op")
    val twice = Cdc.mergeVersioned(once, batch, "k", Seq("seq"), "op")
    assert(snap(once) == snap(twice))
    assert(snap(once) == Set((1L, 111L, 5L, "upsert"), (2L, 200L, 4L, "upsert")))
  }
}
