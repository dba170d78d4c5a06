package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DELTA MANIFESTS ([[VersionedLake]], round 16) — the
  * write-amplification half of the flat-manifest ceiling: anchor
  * versions (v1, every 10th) publish the full resolved file list;
  * versions between publish `#base=<prev>` + this commit's added
  * entries + `-path` removal lines. Pinned:
  *  - manifest SHAPES: deltas carry O(churn) body lines while the
  *    anchor carries the whole lake — the per-commit write cost claim,
  *    asserted on the actual files;
  *  - RESOLUTION: membership at every version of a mixed
  *    append/delete/upsert history is exact (fileEntries applies the
  *    chain), and stats-driven range pruning still works on entries
  *    that arrived via a delta;
  *  - VACUUM MATERIALIZATION: dropping below a delta version rewrites
  *    the new oldest survivor as a self-contained full manifest with
  *    its original `#ts=` preserved — drop counts, retained reads, and
  *    time travel are exactly what the flat protocol gave;
  *  - a delta lake round-trips the streaming replay cursor and the
  *    checkpoint (n_files resolved through chains).
  */
class DeltaManifestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def docs(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, s"text of doc $i")).toDF("doc_id", "text")
      .repartition(1)

  private def fresh(tag: String): String =
    Files.createTempDirectory(tag).toString + "/lake"

  private def idSet(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  private def manifestLines(dir: String, v: Long): Seq[String] = {
    // like the engine: a vacuum-materialized .full shadow wins
    val pf = java.nio.file.Paths.get(dir, "_versions", f"v$v%06d.full")
    val p = if (Files.exists(pf)) pf
      else java.nio.file.Paths.get(dir, "_versions", f"v$v%06d.txt")
    Files.readAllLines(p).toArray.toSeq.map(_.toString)
      .filter(_.nonEmpty)
  }

  private def bodyLines(dir: String, v: Long): Seq[String] =
    manifestLines(dir, v).filterNot(_.startsWith("#"))

  /** Body with region refs EXPANDED — the resolved entry view of a
    * region-partitioned anchor (deltas/flat manifests pass through).
    */
  private def entryLines(dir: String, v: Long): Seq[String] =
    bodyLines(dir, v).flatMap { l =>
      if (l.startsWith("@"))
        Files.readAllLines(java.nio.file.Paths.get(dir,
          l.drop(1).split('\t')(0))).toArray.toSeq.map(_.toString)
          .filter(_.nonEmpty)
      else Seq(l)
    }

  /** bucket -> region rel of an anchor's refs. */
  private def refsOf(dir: String, v: Long): Map[Int, String] =
    bodyLines(dir, v).filter(_.startsWith("@")).map { l =>
      val f = l.drop(1).split('\t'); f(1).toInt -> f(0)
    }.toMap

  private def isDelta(dir: String, v: Long): Boolean =
    manifestLines(dir, v).exists(_.startsWith("#base="))

  test("manifest shapes: deltas carry O(churn) lines, anchors the " +
      "whole lake; membership exact at every version") {
    val dir = fresh("dmf_shape_")
    (0 until 16).foreach { m =>
      VersionedLake.commitAppend(spark, dir,
        docs(m * 5L, m * 5L + 5L)): Unit
    }
    assert(!isDelta(dir, 1L), "v1 is always full")
    assert(!isDelta(dir, 10L), "anchor at the interval")
    assert((2L to 9L).forall(isDelta(dir, _)))
    assert((11L to 16L).forall(isDelta(dir, _)))
    // one file per commit: a delta's body is exactly its own add
    assert(bodyLines(dir, 5L).size === 1)
    assert(bodyLines(dir, 16L).size === 1)
    // the anchor carries the whole 10-file lake — as region refs whose
    // expansion is the full entry set
    assert(bodyLines(dir, 10L).nonEmpty &&
      bodyLines(dir, 10L).forall(_.startsWith("@")),
      "anchors are region-partitioned")
    assert(entryLines(dir, 10L).size === 10)
    // resolution: every version's membership exact
    (1L to 16L).foreach { v =>
      assert(idSet(VersionedLake.readAsOf(spark, dir, v)) ===
        (0L until v * 5L).toSet, s"membership at v$v")
    }
  }

  test("mutations as deltas: delete and upsert publish removals + " +
      "fresh entries, resolution and stats pruning stay exact") {
    val dir = fresh("dmf_mut_")
    (0 until 4).foreach { m =>
      VersionedLake.commitAppend(spark, dir, docs(m * 10L, m * 10L + 10L),
        statsCol = if (m == 0) Some("doc_id") else None): Unit
    }
    // v5: delete ids living in the v2 file — a delta with one removal
    val (v5, nf, _) = VersionedLake.commitDelete(spark, dir, "doc_id",
      Seq(12L, 17L).toDF("doc_id"))
    assert(v5 === 5L && nf === 1L)
    assert(isDelta(dir, 5L))
    assert(bodyLines(dir, 5L).count(_.startsWith("-")) === 1)
    assert(idSet(VersionedLake.read(spark, dir)) ===
      ((0L until 40L).toSet -- Set(12L, 17L)))
    assert(idSet(VersionedLake.readAsOf(spark, dir, 4L)) ===
      (0L until 40L).toSet, "prior versions untouched")
    // v6: upsert (update + insert) — delta with one removal + adds
    val (v6, _, _) = VersionedLake.commitUpsert(spark, dir, "doc_id",
      Seq((3L, "updated"), (100L, "inserted")).toDF("doc_id", "text"))
    assert(isDelta(dir, v6))
    val r = VersionedLake.read(spark, dir)
    assert(r.where(col("doc_id") === 3L).select("text")
      .collect()(0).getString(0) === "updated")
    assert(r.count() === 39L)
    // stats entries that arrived via deltas still prune range reads
    val (kept, total) = VersionedLake.rangeFiles(spark, dir, v6,
      "doc_id", 30L, 39L)
    assert(kept.size < total.toInt,
      s"stats pruning through delta-carried entries: $kept of $total")
  }

  test("vacuum materializes the new oldest survivor: drop counts and " +
      "time travel exactly as the flat protocol, #ts preserved") {
    val dir = fresh("dmf_vac_")
    (0 until 16).foreach { m =>
      VersionedLake.commitAppend(spark, dir,
        docs(m * 5L, m * 5L + 5L)): Unit
    }
    val tsBefore = VersionedLake.commitTimes(spark, dir).toMap
    assert(isDelta(dir, 13L))
    val (dropped, _) = VersionedLake.vacuum(spark, dir, keepFrom = 13L,
      force = true)
    assert(dropped === 12L, "version-exact drop, no anchor rounding")
    assert(VersionedLake.versions(spark, dir) === (13L to 16L))
    assert(!isDelta(dir, 13L), "oldest survivor materialized full")
    assert(idSet(VersionedLake.readAsOf(spark, dir, 13L)) ===
      (0L until 65L).toSet)
    assert(idSet(VersionedLake.readAsOf(spark, dir, 16L)) ===
      (0L until 80L).toSet, "younger deltas resolve through the " +
        "materialized base")
    val tsAfter = VersionedLake.commitTimes(spark, dir).toMap
    assert((13L to 16L).forall(v => tsAfter(v) == tsBefore(v)),
      "materialization preserves the original commit instants")
    // time travel against the materialized survivor
    assert(VersionedLake.versionAsOf(spark, dir, tsBefore(14L)) === 14L)
  }

  test("region-partitioned anchors: a later anchor REUSES every " +
      "bucket its churn did not touch and rewrites only the rest; " +
      "vacuum sweeps only unreferenced region files") {
    val dir = fresh("dmf_region_")
    (0 until 26).foreach { m =>
      VersionedLake.commitAppend(spark, dir,
        docs(m * 5L, m * 5L + 5L)): Unit
    }
    val refs10 = refsOf(dir, 10L)
    val refs20 = refsOf(dir, 20L)
    // churn between the anchors = the files v11..v20 added
    val added = VersionedLake.filesOf(spark, dir, 20L).toSet --
      VersionedLake.filesOf(spark, dir, 10L).toSet
    assert(added.size === 10)
    val touched = added.map(p => VersionedLake.bucketOf(p))
    refs10.foreach { case (b, rel) =>
      if (!touched.contains(b))
        assert(refs20.get(b).contains(rel),
          s"bucket $b untouched by the churn must REUSE its region " +
            s"file verbatim (the O(churn) anchor-write claim)")
      else
        assert(!refs20.get(b).contains(rel),
          s"bucket $b gained files: its region must have been rewritten")
    }
    // every ref bucket the churn touched exists in refs20
    assert(touched.subsetOf(refs20.keySet))
    // resolution exact through the region tree at both anchors
    assert(idSet(VersionedLake.readAsOf(spark, dir, 10L)) ===
      (0L until 50L).toSet)
    assert(idSet(VersionedLake.readAsOf(spark, dir, 26L)) ===
      (0L until 130L).toSet)
    // vacuum below the v20 anchor: v10's unshared regions sweep, v20's
    // stay — including the ones v20 REUSED from v10 (the sweep is
    // reference-based, never per-version)
    val regionsDir = java.nio.file.Paths.get(dir, "_versions", "regions")
    VersionedLake.vacuum(spark, dir, keepFrom = 20L, force = true): Unit
    val left = Files.list(regionsDir).toArray
      .map(p => "_versions/regions/" +
        p.asInstanceOf[java.nio.file.Path].getFileName).toSet
    assert(refs20.values.forall(r => left.contains(r)),
      "every region v20 references survives the sweep")
    val v10Only = refs10.values.toSet -- refs20.values.toSet
    assert(v10Only.forall(r => !left.contains(r)),
      "regions only the dropped v10 referenced are swept")
    assert(idSet(VersionedLake.readAsOf(spark, dir, 20L)) ===
      (0L until 100L).toSet, "post-vacuum resolution through v20's tree")
    assert(idSet(VersionedLake.readAsOf(spark, dir, 26L)) ===
      (0L until 130L).toSet)
  }

  test("streaming replay cursor and checkpoint ride delta manifests") {
    val dir = fresh("dmf_batch_")
    (0 until 12).foreach { b =>
      VersionedLake.commitAppendForBatch(spark, dir,
        docs(b * 5L, b * 5L + 5L), b.toLong): Unit
    }
    // replay of an old batch recognized through the delta history
    assert(VersionedLake.commitAppendForBatch(
      spark, dir, docs(0, 5), 11L) === 12L)
    assert(VersionedLake.read(spark, dir).count() === 60L)
    // checkpoint n_files resolved through chains
    val h = VersionedLake.history(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 12L).foreach { v => assert(h(v) === v, s"n_files at v$v") }
  }
}
