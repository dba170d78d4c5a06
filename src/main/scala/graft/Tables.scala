package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All queries receive an `sfDir` like `/root/testdata/sf0.01`; each table is
  * a single parquet file inside it. Filters/projections applied by callers are
  * pushed into the parquet scan by Catalyst (verify with
  * `.explain("formatted")` → `PushedFilters` / `ReadSchema`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped in two driver vintages: parquet
      // TIMESTAMP(NANOS) — which Spark cannot represent natively
      // (PARQUET_TYPE_ILLEGAL) — and plain TIMESTAMP(MICROS). Infer under
      // the legacy nanos-as-long flag (a no-op for micros files), then
      // branch on the inferred type so both vintages come out as the same
      // microsecond TimestampType. The legacy flag is consulted ONLY
      // during schema inference (the returned DataFrame carries its
      // resolved schema; execution clips the file schema against it
      // without re-reading the conf — verified empirically), so it is
      // restored immediately after the read and no query permanently
      // mutates session conf.
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      val raw =
        try spark.read.parquet(s"$sfDir/$name.parquet")
        finally prev match {
          case Some(v) => spark.conf.set(key, v)
          case None    => spark.conf.unset(key)
        }
      raw.schema("ts").dataType match {
        case LongType => // nanos vintage: raw int64 nanos → micros
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          // micros vintage: the NTZ wall-clock IS the UTC instant —
          // reinterpret it under an explicit UTC zone (DST-proof; see
          // [[graft.functions.TimeOps.ntzUtcToInstant]])
          raw.withColumn("ts",
            graft.functions.TimeOps.ntzUtcToInstant(col("ts")))
        case _ => raw
      }
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** Collision-resistant scratch key for a dataset dir: SHA-256 of the
    * path, first 16 hex chars. Queries that materialize per-dataset
    * scratch dirs or catalog tables (q81/q85/q101/q102) key them by this
    * — the previous truncated 32-bit `String.hashCode` could collide two
    * different datasets onto one scratch location.
    */
  def scratchKey(d: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(d.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString

  /** Recursively delete `dir` if present (children before parents). */
  def deleteRecursively(dir: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }

  /** A CLEARED per-dataset scratch location under `java.io.tmpdir`,
    * keyed by [[scratchKey]] — the one idiom behind every query that
    * materializes per-dataset scratch state (media files, partials
    * lakes, ANN lakes). Any leftover content from a previous run is
    * removed; the directory itself is NOT created (sinks that insist on
    * creating their own target, e.g. parquet writers, get a clean
    * slate).
    */
  def freshScratchDir(prefix: String, d: String): java.nio.file.Path = {
    val dir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), prefix + scratchKey(d))
    deleteRecursively(dir)
    dir
  }

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
