package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The versioned lake's commit contract under NON-ATOMIC rename — the
  * object-store question the r15 verdict left open, answered with an
  * injected filesystem ([[FlakyRenameFs]], scheme `flaky://`) whose
  * manifest-publish renames are broken the ways real stores break
  * them. Required semantics per store, now PINNED:
  *
  *  - local FS: publish is a HARD LINK — atomic no-replace at the
  *    syscall; rename semantics are irrelevant (VersionedLakeMetaSpec).
  *  - stores whose rename is atomic no-replace (HDFS): the rename IS
  *    the commit; the read-back is a no-op double check.
  *  - stores that EMULATE rename as copy-then-delete (S3A-style):
  *    - a rename that COMPLETES commits correctly (`copy` mode);
  *    - a rename that dies MIDWAY but reports success leaves a torn
  *      manifest: the read-back verify detects the strict byte-prefix,
  *      REMOVES the torn file, and fails with a non-rebase error that
  *      names the store contract — nothing is committed, the lake
  *      stays readable, and a retry lands the same version (`partial`);
  *    - a rename that copies fully but REPORTS failure (crash between
  *      copy and source delete) leaves a complete, durable commit: the
  *      loud error tells the writer to verify before retrying, and the
  *      retry path sees the standard already-committed refusal instead
  *      of forking history (`falseAfterCopy`).
  */
class ObjectStoreContractSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.hadoopConfiguration
      .set("fs.flaky.impl", classOf[FlakyRenameFs].getName)
    s.sparkContext.hadoopConfiguration
      .set("fs.condstore.impl", classOf[CondCreateFs].getName)
    s
  }

  import spark.implicits._

  private def docs(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, s"text of doc $i")).toDF("doc_id", "text")
      .repartition(1)

  private def fresh(tag: String): String =
    "flaky://" + Files.createTempDirectory(tag).toString + "/lake"

  private def withMode[A](m: String)(body: => A): A = {
    FlakyRenameFs.mode = m
    try body finally FlakyRenameFs.mode = "atomic"
  }

  test("copy-then-delete rename that COMPLETES commits correctly") {
    val dir = fresh("oscopy_")
    withMode("copy") {
      assert(VersionedLake.commitAppend(spark, dir, docs(0, 10)) === 1L)
      assert(VersionedLake.commitAppend(spark, dir, docs(10, 20)) === 2L)
    }
    assert(VersionedLake.read(spark, dir).count() === 20L)
    assert(VersionedLake.readAsOf(spark, dir, 1L).count() === 10L)
  }

  test("rename that lands PARTIAL bytes: torn manifest removed, loud " +
      "non-rebase failure, nothing committed, retry lands cleanly") {
    val dir = fresh("ospart_")
    VersionedLake.commitAppend(spark, dir, docs(0, 10)): Unit
    val ex = intercept[IllegalStateException] {
      withMode("partial") {
        VersionedLake.commitAppend(spark, dir, docs(10, 20))
      }
    }
    assert(ex.getMessage.contains("not atomic"))
    // nothing committed, no torn manifest left behind, lake readable
    assert(VersionedLake.currentVersion(spark, dir) === 1L)
    assert(VersionedLake.read(spark, dir).count() === 10L)
    // the failed append's data files are unreferenced orphans a vacuum
    // reclaims; a RETRY is a fresh append that lands the same version
    assert(VersionedLake.commitAppend(spark, dir, docs(10, 20)) === 2L)
    assert(VersionedLake.read(spark, dir).count() === 20L)
  }

  test("rename that copies fully but REPORTS failure: the append " +
      "DETECTS its own durable commit (self-win, via its unique token " +
      "dir in the landed manifest) and succeeds — no duplicate " +
      "entries, no forked history") {
    val dir = fresh("osfalse_")
    VersionedLake.commitAppend(spark, dir, docs(0, 10)): Unit
    val v = withMode("falseAfterCopy") {
      VersionedLake.commitAppend(spark, dir, docs(10, 20))
    }
    assert(v === 2L, "the copy WAS durable: the append owns version 2")
    assert(VersionedLake.read(spark, dir).count() === 20L,
      "entries appear exactly once — a blind rebase would have " +
        "stacked the append's own files a second time")
    assert(VersionedLake.versions(spark, dir) === Seq(1L, 2L))
    withMode("falseAfterCopy") {
      assert(VersionedLake.commitAppend(spark, dir, docs(20, 30)) === 3L)
    }
    assert(VersionedLake.read(spark, dir).count() === 30L)
  }

  test("vacuum materialization under a PARTIAL rename: loud abort, " +
      "NOTHING dropped, the delta chain fully intact; the retry " +
      "completes and drops exactly") {
    val dir = fresh("osvac_")
    (0 until 16).foreach { m =>
      VersionedLake.commitAppend(spark, dir, docs(m * 5L, m * 5L + 5L)): Unit
    }
    val ex = intercept[IllegalStateException] {
      withMode("partial") {
        VersionedLake.vacuum(spark, dir, keepFrom = 13L, force = true)
      }
    }
    assert(ex.getMessage.contains("nothing was dropped"))
    assert(VersionedLake.versions(spark, dir) === (1L to 16L),
      "the aborted vacuum dropped nothing")
    (1L to 16L).foreach { v =>
      assert(VersionedLake.readAsOf(spark, dir, v).count() === v * 5L,
        s"v$v still reads exactly after the aborted vacuum")
    }
    // retry on a healthy store: exact version-based drop, the
    // materialized shadow serves the new oldest survivor
    val (dropped, _) = VersionedLake.vacuum(spark, dir, keepFrom = 13L,
      force = true)
    assert(dropped === 12L)
    assert(VersionedLake.readAsOf(spark, dir, 13L).count() === 65L)
    assert(VersionedLake.read(spark, dir).count() === 80L)
  }

  test("exactly-once batch commit through a falseAfterCopy rename: the " +
      "REPLAY recognizes the durable commit and writes nothing") {
    val dir = fresh("osbatch_")
    VersionedLake.commitAppendForBatch(spark, dir, docs(0, 10), 0L): Unit
    intercept[IllegalArgumentException] {
      withMode("falseAfterCopy") {
        VersionedLake.commitAppendForBatch(spark, dir, docs(10, 20), 1L)
      }
    }
    // foreachBatch re-delivers batch 1 after the "failure": the replay
    // check reads the durable v2 header and returns it, no double write
    assert(VersionedLake.commitAppendForBatch(
      spark, dir, docs(10, 20), 1L) === 2L)
    assert(VersionedLake.read(spark, dir).count() === 20L)
  }

  private def fsBase(dir: String) = {
    val base = new org.apache.hadoop.fs.Path(dir)
    (base.getFileSystem(spark.sparkContext.hadoopConfiguration), base)
  }

  private def manifestBytes(dir: String, v: Long): Array[Byte] =
    Files.readAllBytes(java.nio.file.Paths.get(
      new java.net.URI(dir).getPath, "_versions", f"v$v%06d.txt"))

  test("#writer= token: two manifests with identical entries, headers " +
      "and #ts millisecond are NEVER byte-prefix related — a prefix " +
      "read-back always means our own torn copy, so deleting it can " +
      "never destroy a racer's commit") {
    val dir = fresh("oswriter_")
    val (fs, base) = fsBase(dir)
    val entry = "data/ax/part-00000.parquet"
    VersionedLake.writeManifest(fs, base, 1L, Seq(entry))
    VersionedLake.writeManifest(fs, base, 2L, Seq(entry))
    val a = new String(manifestBytes(dir, 1L), "UTF-8")
    val b = new String(manifestBytes(dir, 2L), "UTF-8")
    def ts(s: String) = s.linesIterator.find(_.startsWith("#ts=")).get
    // force the WORST case — identical #ts milliseconds (a tight race)
    // by rewriting b's stamp to a's: the writer token alone must still
    // force byte divergence
    val bSameTs = b.replace(ts(b), ts(a))
    assert(a != bSameTs, "two publishes must never produce equal bytes")
    val ab = a.getBytes("UTF-8")
    val bb = bSameTs.getBytes("UTF-8")
    def isPrefix(p: Array[Byte], of: Array[Byte]) =
      p.length <= of.length &&
        java.util.Arrays.equals(p, java.util.Arrays.copyOf(of, p.length))
    assert(!isPrefix(ab, bb) && !isPrefix(bb, ab),
      "writer tokens must force divergence inside the fixed-length " +
        "header, whatever the ts and entries")
    // and the tokens are what diverge: same-length uuid lines
    def wr(s: String) = s.linesIterator.find(_.startsWith("#writer=")).get
    assert(wr(a).length === wr(b).length)
    assert(wr(a) !== wr(b))
  }

  test("SIMULTANEOUS complete publishes: the rename store class forks " +
      "(replace-capable rename clobbers the acknowledged winner — the " +
      "documented boundary), the conditional-create store serializes " +
      "the very same schedule") {
    // rename class (flaky://): writer A lands and is acknowledged;
    // writer B's existence probe raced ahead of A's landing
    // (blindProbe), so B renames OVER A and acknowledges too — fork.
    val dirR = fresh("osrace_ren_")
    val (fsR, baseR) = fsBase(dirR)
    VersionedLake.writeManifest(fsR, baseR, 1L, Seq("data/aA/part-0.parquet"))
    withMode("blindProbe") {
      VersionedLake.writeManifest(fsR, baseR, 1L, Seq("data/aB/part-0.parquet"))
    }
    val landedR = new String(manifestBytes(dirR, 1L), "UTF-8")
    assert(landedR.contains("aB") && !landedR.contains("aA"),
      "replace-capable rename cannot serialize simultaneous complete " +
        "copies: B silently replaced acknowledged A — the class hole " +
        "conditional create exists to close")
    // conditional-create class (condstore://): same schedule, but the
    // publish primitive is createExclusive — B is REFUSED, A intact
    val dirC = fresh("osrace_cond_").replace("flaky://", "condstore://")
    val (fsC, baseC) = fsBase(dirC)
    VersionedLake.writeManifest(fsC, baseC, 1L, Seq("data/aA/part-0.parquet"))
    val ex = intercept[IllegalArgumentException] {
      withMode("blindProbe") {
        VersionedLake.writeManifest(fsC, baseC, 1L,
          Seq("data/aB/part-0.parquet"))
      }
    }
    assert(ex.getMessage.contains("conditional create"))
    val landedC = new String(manifestBytes(dirC, 1L), "UTF-8")
    assert(landedC.contains("aA") && !landedC.contains("aB"),
      "the acknowledged winner's bytes survive the racer")
  }

  test("conditional-create store end-to-end: appends, racing appends " +
      "(loser rebases through the refusal), delete, time travel") {
    val dir = "condstore://" +
      Files.createTempDirectory("oscond_").toString + "/lake"
    assert(VersionedLake.commitAppend(spark, dir, docs(0, 10)) === 1L)
    var raced = false
    var vRival = 0L
    val vMine = VersionedLake.commitAppend(spark, dir, docs(10, 20),
      beforePublish = () => if (!raced) {
        raced = true
        vRival = VersionedLake.commitAppend(spark, dir, docs(20, 30))
      })
    assert(vRival === 2L && vMine === 3L, "both racing appends land")
    val (v4, _, nDel) = VersionedLake.commitDelete(spark, dir, "doc_id",
      Seq(5L).toDF("doc_id"))
    assert(v4 === 4L && nDel === 1L)
    assert(VersionedLake.read(spark, dir).count() === 29L)
    assert(VersionedLake.readAsOf(spark, dir, 2L).count() === 20L)
  }
}
