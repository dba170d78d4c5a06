package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TYPED manifest statistics (v3 tagged encodings) — string, double,
  * decimal and timestamp stats columns prune file reads and classify
  * range deletes from the manifest alone, like integral columns always
  * did. Pinned:
  *  - string stats prune reads exactly (per-source files; a BETWEEN on
  *    the string column admits only the covering files) and the
  *    admitted rows equal the full-scan filter;
  *  - TRUNCATED string bounds stay conservative: a 30-byte value's
  *    24-byte truncated max still admits every range its real value
  *    could match, and never admits fewer rows than the full scan;
  *  - double and decimal stats prune; timestamp stats prune under
  *    java.sql.Timestamp bounds;
  *  - KIND SAFETY: bare-long bounds against a string or timestamp
  *    stats column compare as incomparable and prune NOTHING (a
  *    mismatched caller degrades to a full read, never a wrong one);
  *  - UNKNOWN tags (a future writer) read as no-stats: the file is
  *    admitted, never mis-pruned;
  *  - commitDeleteRangeOn: whole-file metadata drops on a string
  *    column demand provable containment + null-freedom, straddlers
  *    rewrite, NULLs survive.
  */
class TypedStatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def fresh(tag: String): String =
    Files.createTempDirectory(tag).toString + "/lake"

  /** One commit per source sN (N = 0..5), one file each, stats on the
    * string column.
    */
  private def sourceLake(tag: String): String = {
    val dir = fresh(tag)
    (0 until 6).foreach { m =>
      val rows = (0 until 5).map(i => (m * 10L + i, s"s$m", i * 1.5))
      VersionedLake.commitAppend(spark, dir,
        rows.toDF("id", "src", "score").repartition(1),
        statsCol = Some("src,score")): Unit
    }
    dir
  }

  test("string stats prune reads exactly; admitted rows == full filter") {
    val dir = sourceLake("tstat_str_")
    val v = VersionedLake.currentVersion(spark, dir)
    val (kept, total) = VersionedLake.rangeFilesOn(spark, dir, v,
      "src", "s2", "s4")
    assert(total === 6L && kept.size === 3,
      s"files for s2,s3,s4 admit, the rest prune (got ${kept.size})")
    val rows = VersionedLake.readAsOfRangeOn(spark, dir, v,
      "src", "s2", "s4").select("id").collect().map(_.getLong(0)).toSet
    assert(rows === (20L until 25L).toSet ++ (30L until 35L) ++
      (40L until 45L))
    // double stats on the second column prune too
    val (keptD, _) = VersionedLake.rangeFilesOn(spark, dir, v,
      "score", 0.0, 6.0)
    assert(keptD.size === 6, "every file's score range [0,6] overlaps")
    val (keptD2, _) = VersionedLake.rangeFilesOn(spark, dir, v,
      "score", 100.5, 200.5)
    assert(keptD2.isEmpty, "no file reaches score 100.5")
  }

  test("KIND SAFETY: mismatched bound types never prune (and unknown " +
      "tags read as no-stats)") {
    val dir = sourceLake("tstat_kind_")
    val v = VersionedLake.currentVersion(spark, dir)
    // long bounds against the STRING stats column: incomparable — all
    // files admit (degrade to a full read, never a wrong one)
    val (kept, total) = VersionedLake.rangeFilesOn(spark, dir, v,
      "src", 0L, 100L)
    assert(kept.size.toLong === total)
    // hand-craft an UNKNOWN value tag on the s0 file's entry: still
    // admitted. v1 is a REGION-PARTITIONED anchor, so its entry lives
    // in the region file its @ref names — doctor that file (the ref's
    // content hash is only compared by anchor WRITERS for reuse, never
    // re-verified on read)
    val vd = java.nio.file.Paths.get(dir, "_versions")
    val v1 = java.nio.file.Paths.get(dir, "_versions", "v000001.txt")
    val regionRel = Files.readAllLines(v1).toArray.toSeq.map(_.toString)
      .filter(_.startsWith("@")).map(_.drop(1).split('\t')(0)).head
    val p = java.nio.file.Paths.get(dir, regionRel)
    val doctored = Files.readAllLines(p).toArray.toSeq.map(_.toString)
      .filter(_.nonEmpty)
      .map { l =>
        val f = l.split('\t')
        (Seq(f(0), "z9future", "z9future", "0") ++ f.drop(4)).mkString("\t")
      }
    Files.writeString(p, doctored.mkString("\n") + "\n")
    Files.deleteIfExists(p.getParent
      .resolve("." + p.getFileName + ".crc")): Unit
    Files.deleteIfExists(vd.resolve("." + v1.getFileName + ".crc")): Unit
    val (kept2, _) = VersionedLake.rangeFilesOn(spark, dir, v,
      "src", "zzz", "zzzz") // disjoint from every real source
    assert(kept2.size === 1,
      "the unknown-tag file must be ADMITTED (no stats, no guess); " +
        "every provably-disjoint real file still prunes")
  }

  test("truncated string bounds stay conservative in both directions") {
    val dir = fresh("tstat_trunc_")
    // 30-char values sharing a 24+ byte prefix: min truncates to a
    // prefix, max truncates UP (last byte incremented)
    val longA = "a" * 30
    val longB = ("a" * 26) + "zzzz" // same 24-byte prefix as longA
    VersionedLake.commitAppend(spark, dir,
      Seq((1L, longA), (2L, longB)).toDF("id", "s").repartition(1),
      statsCol = Some("s")): Unit
    VersionedLake.commitAppend(spark, dir,
      Seq((3L, "m-middle")).toDF("id", "s").repartition(1)): Unit
    val v = VersionedLake.currentVersion(spark, dir)
    // a range the REAL values match must admit the truncated file
    val r1 = VersionedLake.readAsOfRangeOn(spark, dir, v, "s",
      "a" * 25, "b").select("id").collect().map(_.getLong(0)).toSet
    assert(r1 === Set(1L, 2L), "truncation must not lose matching rows")
    // a range past the truncated-up max prunes the file
    val (kept, total) = VersionedLake.rangeFilesOn(spark, dir, v, "s",
      "b", "c")
    assert(total === 2L && kept.isEmpty,
      "the truncated-up max 'a..ab' proves file 1 never reaches 'b', " +
        "and 'm-middle' > 'c' proves file 2 disjoint — both prune")
  }

  test("decimal and timestamp stats prune; long bounds against a " +
      "timestamp column do not") {
    val dir = fresh("tstat_dec_")
    (0 until 4).foreach { m =>
      val rows = (0 until 3).map { i =>
        (m * 10L + i, new java.math.BigDecimal(s"$m$i.25"),
          java.sql.Timestamp.valueOf(f"2024-0${m + 1}%d-10 00:00:0$i%d"))
      }
      VersionedLake.commitAppend(spark, dir,
        rows.toDF("id", "amt", "ts").repartition(1),
        statsCol = Some("amt,ts")): Unit
    }
    val v = VersionedLake.currentVersion(spark, dir)
    val (keptDec, totDec) = VersionedLake.rangeFilesOn(spark, dir, v,
      "amt", new java.math.BigDecimal("10.00"),
      new java.math.BigDecimal("12.99"))
    assert(totDec === 4L && keptDec.size === 1, "one decimal decade admits")
    val rowsDec = VersionedLake.readAsOfRangeOn(spark, dir, v, "amt",
      new java.math.BigDecimal("10.00"), new java.math.BigDecimal("12.99"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(rowsDec === Set(10L, 11L, 12L))
    val (keptTs, _) = VersionedLake.rangeFilesOn(spark, dir, v, "ts",
      java.sql.Timestamp.valueOf("2024-02-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-02-28 00:00:00"))
    assert(keptTs.size === 1, "one month-file admits")
    val rowsTs = VersionedLake.readAsOfRangeOn(spark, dir, v, "ts",
      java.sql.Timestamp.valueOf("2024-02-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-02-28 00:00:00"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(rowsTs === Set(10L, 11L, 12L))
    // a bare long can never half-match micros-encoded timestamp stats
    val (keptL, totL) = VersionedLake.rangeFilesOn(spark, dir, v,
      "ts", 0L, 1L)
    assert(keptL.size.toLong === totL,
      "long bounds vs t-tagged stats are incomparable: admit everything")
  }

  test("commitDeleteRangeOn (string): metadata-only whole-file drop, " +
      "straddler rewrite, NULLs survive") {
    val dir = fresh("tstat_del_")
    // file 1: sources s0/s1 (inside the delete range, null-free)
    VersionedLake.commitAppend(spark, dir,
      Seq((1L, "s0"), (2L, "s1")).toDF("id", "src").repartition(1),
      statsCol = Some("src")): Unit
    // file 2: straddles the boundary (s1 inside, s5 outside) + a NULL
    VersionedLake.commitAppend(spark, dir,
      Seq((3L, "s1"), (4L, "s5"), (5L, null.asInstanceOf[String]))
        .toDF("id", "src").repartition(1)): Unit
    // file 3: disjoint (s8)
    VersionedLake.commitAppend(spark, dir,
      Seq((6L, "s8")).toDF("id", "src").repartition(1)): Unit
    val (v, dropped, rewritten, removed) =
      VersionedLake.commitDeleteRangeOn(spark, dir, "src", "s0", "s2")
    assert(dropped === 1L, "file 1 drops by name (inside + null-free)")
    assert(rewritten === 1L, "file 2 rewrites (straddler with a NULL)")
    assert(removed === 3L)
    val left = VersionedLake.readAsOf(spark, dir, v)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(left === Set(4L, 5L, 6L),
      "outside rows, the NULL row and the disjoint file survive")
  }

  /** Raw manifest body lines of a DELTA version (entries inline). */
  private def manifestBody(dir: String, v: Long): Seq[String] =
    java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(dir, "_versions", f"v$v%06d.txt"))
      .toArray.toSeq.map(_.toString)
      .filter(l => l.nonEmpty && !l.startsWith("#") && !l.startsWith("@"))

  test("footer-derived stats match the scan semantics on every edge: " +
      "NaN fallback, truncated strings, oversized-stat fallback, " +
      "all-null, negative decimals") {
    val dir = fresh("tstat_footer_")
    // v1 anchors (region refs); commit a throwaway v1 so the probed
    // versions are deltas whose entries sit inline in the manifest body
    VersionedLake.commitAppend(spark, dir,
      Seq((0L, "seed", 0.0, BigDecimal("0.0000"))).toDF(
        "id", "s", "d", "dec")
        .withColumn("dec", col("dec").cast("decimal(20,4)"))
        .repartition(1),
      statsCol = Some("s,d,dec")): Unit
    // v2: NaN double (parquet drops float stats -> scan fallback must
    // still stamp Spark's NaN-as-largest max), a 30-byte string (footer
    // value exact -> engine-side 24-byte truncation applies), and a
    // negative decimal
    val s30 = "m" * 30
    VersionedLake.commitAppend(spark, dir,
      Seq((1L, s30, Double.NaN, BigDecimal("-0.0001")),
        (2L, "alpha", 1.5, BigDecimal("12345.6789"))).toDF(
        "id", "s", "d", "dec")
        .withColumn("dec", col("dec").cast("decimal(20,4)"))
        .repartition(1)): Unit
    val v2 = manifestBody(dir, 2L)
    assert(v2.size === 1)
    val f2 = v2.head.split('\t')
    // fields: path, s-lo, s-hi, s-nn, d-lo, d-hi, d-nn, dec-lo, dec-hi,
    // dec-nn
    assert(f2(1) === "salpha", s"string min (got ${f2(1)})")
    assert(f2(2) === "s" + "m" * 23 + "n",
      "30-byte max truncates to 24 with the last byte incremented")
    assert(f2(4) === "f1.5" && f2(5) === "fNaN",
      s"NaN rides as Spark's largest (got ${f2(4)}, ${f2(5)})")
    assert(f2(7) === "c-0.0001" && f2(8) === "c12345.6789",
      s"decimal plain strings (got ${f2(7)}, ${f2(8)})")
    // v3: >4 KB string (parquet omits the stats entirely -> scan
    // fallback), an all-null decimal, and a some-null string column
    val huge = "ÿ" * 3000 // 6 KB UTF-8
    VersionedLake.commitAppend(spark, dir,
      Seq((3L, huge, 2.0, Option.empty[java.math.BigDecimal]),
        (4L, null.asInstanceOf[String], 3.0,
          Option.empty[java.math.BigDecimal])).toDF(
        "id", "s", "d", "dec")
        .withColumn("dec", col("dec").cast("decimal(20,4)"))
        .repartition(1)): Unit
    val f3 = manifestBody(dir, 3L).head.split('\t')
    // scan fallback still truncates the huge min/max to 24 bytes
    assert(f3(1).startsWith("s%c3%bf") && f3(3) === "1",
      s"huge-string stats survive via scan fallback (got ${f3(1)})")
    assert(f3(7) === "-" && f3(8) === "-" && f3(9) === "2",
      "all-null column records the explicit marker + null count")
    // and the typed prune still reads exactly across all three commits
    val v = VersionedLake.currentVersion(spark, dir)
    val (kept, total) = VersionedLake.rangeFilesOn(spark, dir, v,
      "s", "alpha", "alpha")
    assert(total === 3L && kept.size === 1,
      "seed + huge-string files prune by their string mins; only the " +
        "alpha-holding file admits")
  }

  test("multi-row-group file with stats dropped in ONE group (NaN) " +
      "falls back to the scan — bounds cover every group's rows") {
    val dir = fresh("tstat_multirg_")
    // v1 anchors (region refs) — commit a throwaway v1 so the probed
    // version is a delta whose entry sits inline in the manifest body
    VersionedLake.commitAppend(spark, dir,
      Seq((1000L, 1.6)).toDF("id", "d").repartition(1),
      statsCol = Some("d")): Unit
    // force several row groups per file: tiny block size, and >100 rows
    // (parquet-mr only checks the group size every 100 records)
    val hconf = spark.sparkContext.hadoopConfiguration
    val oldBlock = hconf.get("parquet.block.size")
    hconf.set("parquet.block.size", "1024")
    try {
      // group 1 (first ~100 rows): holds a NaN AND the value 100.0 —
      // parquet drops min/max for the NaN-bearing group but its rows
      // are NOT all-null; later groups carry valid stats in [1.5, 2.0].
      // A footer path that skips the statless group would emit
      // max=2.0 and a [50, 200] range read would silently prune the
      // file holding 100.0.
      val rows = (0 until 300).map { i =>
        val d = if (i == 0) Double.NaN
                else if (i == 1) 100.0
                else 1.5 + (i % 2) * 0.5
        (i.toLong, d)
      }
      VersionedLake.commitAppend(spark, dir,
        rows.toDF("id", "d").repartition(1), statsCol = Some("d")): Unit
    } finally {
      if (oldBlock == null) hconf.unset("parquet.block.size")
      else hconf.set("parquet.block.size", oldBlock)
    }
    // the file must have ended up multi-row-group, or this pins nothing
    val dataFile = manifestBody(dir, 2L).head.split('\t')(0)
    val p = new org.apache.hadoop.fs.Path(dir, dataFile)
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      p, spark.sessionState.newHadoopConf())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    val nGroups = try r.getFooter.getBlocks.size finally r.close()
    assert(nGroups > 1, s"expected a multi-row-group file (got $nGroups)")
    // manifest bounds must reflect the SCAN fallback (NaN-as-largest
    // max), covering the statless group's 100.0 row
    val f2 = manifestBody(dir, 2L).head.split('\t')
    assert(f2(2) === "fNaN",
      s"scan-fallback max must be NaN-as-largest (got ${f2(2)}) — a " +
        "footer max of f2.0 means the statless group was skipped")
    val got = VersionedLake.readAsOfRangeOn(spark, dir, 2L,
      "d", 50.0, 200.0).select("id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L),
      "the [50,200] range read must admit the file and find 100.0")
  }

  test("MERGE/delete candidate skip: id-stats prune the matched-file " +
      "scan without changing outcomes; provably-disjoint files are " +
      "never opened") {
    val dir = fresh("tstat_merge_")
    // three id-disjoint files with stats on the id column
    Seq(0L, 100L, 200L).foreach { lo =>
      val rows = (lo until lo + 10).map(i => (i, s"v$i"))
      VersionedLake.commitAppend(spark, dir,
        rows.toDF("id", "payload").repartition(1),
        statsCol = Some("id")): Unit
    }
    // CANARY: physically remove the [0,9] file — its id range is
    // provably disjoint from every probe below, so no upsert/delete
    // may ever open it; without the candidate skip the matched-file
    // scan would read it and fail loudly
    val v3files = VersionedLake.filesOf(spark, dir, 3L)
    val low = v3files.find { f =>
      val p = java.nio.file.Paths.get(dir, f)
      // identify by content range via the manifest entry instead: the
      // first commit's file is the only one whose name v1 carries
      VersionedLake.filesOf(spark, dir, 1L).contains(f)
    }.get
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, low))
    // upsert touching only the [100,109] file (+ one insert)
    val ups = Seq((100L, "UP100"), (105L, "UP105"), (300L, "NEW300"))
      .toDF("id", "payload")
    val (v4, nRw, nUp) = VersionedLake.commitUpsert(spark, dir, "id", ups)
    assert(nRw === 1L && nUp === 2L,
      s"only the [100,109] file holds matches (got rw=$nRw up=$nUp)")
    // delete touching only the [200,209] file
    val (v5, nDrop, nDel) = VersionedLake.commitDelete(spark, dir, "id",
      Seq(205L, 206L, 999L).toDF("id"))
    assert(nDrop === 1L && nDel === 2L,
      s"only the [200,209] file holds matches (got drop=$nDrop del=$nDel)")
    assert(v4 === 4L && v5 === 5L)
    // dup refusal still fires from the fused probe — including on a
    // doubled NULL id
    val dup = intercept[IllegalArgumentException] {
      VersionedLake.commitUpsert(spark, dir, "id",
        Seq((400L, "a"), (400L, "b")).toDF("id", "payload"))
    }
    assert(dup.getMessage.contains("more than once"))
    val nullDup = intercept[IllegalArgumentException] {
      VersionedLake.commitUpsert(spark, dir, "id",
        Seq((Option.empty[Long], "a"), (Option.empty[Long], "b"))
          .toDF("id", "payload"))
    }
    assert(nullDup.getMessage.contains("more than once"))
    // all-NULL-id updates: a pure insert — zero candidates, zero
    // rewrites, and the rows still land
    val (v6, nRw2, nUp2) = VersionedLake.commitUpsert(spark, dir, "id",
      Seq((Option.empty[Long], "null-row")).toDF("id", "payload"))
    assert(nRw2 === 0L && nUp2 === 0L && v6 === 6L)
    // survivors + updates + insert all present (read only the files
    // that still exist: skip the canary-deleted one)
    val live = VersionedLake.filesOf(spark, dir, v6)
      .filterNot(_ == low)
      .map(f => java.nio.file.Paths.get(dir, f).toString)
    val back = spark.read.parquet(live: _*)
      .collect().map(r => (r.isNullAt(0), if (r.isNullAt(0)) -1L
        else r.getLong(0), r.getString(1)))
    val byId = back.filterNot(_._1).map(t => t._2 -> t._3).toMap
    assert(byId(100L) === "UP100" && byId(105L) === "UP105" &&
      byId(300L) === "NEW300" && byId(101L) === "v101")
    assert(!byId.contains(205L) && !byId.contains(206L))
    assert(back.count(_._1) === 1, "the NULL-id insert landed")
  }
}
