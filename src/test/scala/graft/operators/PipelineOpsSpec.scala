package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Bloom, CountMin}

/** Unit laws for the round-5 pipeline operators: Count-Min (over-estimate
  * + merge laws), Bloom (no false negatives, bounded false positives),
  * CDC changelog semantics, funnel subsequence matching, Z-order layout.
  */
class PipelineOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // --- CountMin ---------------------------------------------------------------

  test("count-min: estimate >= exact for every key; exact when collision-free") {
    import spark.implicits._
    val items = (0 until 1000).map(i => s"k${i % 37}").toDF("item")
    val sk = CountMin.sketch(items, "item")
    val probes = (0 until 37).map(i => s"k$i").toDF("item")
    val est = CountMin.estimate(sk, probes, "item")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = items.groupBy("item").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"$k: CMS ${est(k)} underestimates exact $c")
    }
    // d=4 rows of 256 buckets on 37 keys: some row is collision-free for
    // every key with overwhelming probability, making the min exact
    assert(est == exact, "37 keys in 4x256 sketch should estimate exactly")
  }

  test("count-min: merge of split sketches == sketch of union; absent key -> 0") {
    import spark.implicits._
    val a = (0 until 400).map(i => s"k${i % 19}").toDF("item")
    val b = (0 until 600).map(i => s"k${i % 23}").toDF("item")
    val merged = CountMin.merge(
      CountMin.sketch(a, "item"), CountMin.sketch(b, "item"))
    val whole = CountMin.sketch(a.unionAll(b), "item")
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty,
      "merge law violated")
    val zero = CountMin.estimate(whole, Seq("nope").toDF("item"), "item")
      .collect().head.getLong(1)
    assert(zero == 0L, s"absent key estimated $zero, want 0")
  }

  // --- Bloom ------------------------------------------------------------------

  test("bloom: zero false negatives, false-positive rate within bound") {
    import spark.implicits._
    val inserted = (0 until 4000).map(i => s"in$i").toDF("item")
    val bits = Bloom.build(inserted, "item")
    val fn = inserted.filter(!Bloom.mightContain(bits, col("item"))).count()
    assert(fn == 0L, s"$fn false negatives — Bloom contract broken")
    // disjoint probe set: fp rate ~ (1 - e^{-kn/m})^k ≈ 0.7% here; 5%
    // leaves ~10 sigma of headroom without flaking
    val probes = (0 until 4000).map(i => s"out$i").toDF("item")
    val fp = probes.filter(Bloom.mightContain(bits, col("item"))).count()
    assert(fp < 200, s"$fp/4000 false positives — rate far above design")
  }

  // --- Cdc --------------------------------------------------------------------

  test("cdc: latest-wins upsert, delete, insert, delete-of-absent, order ties") {
    import spark.implicits._
    val snap = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "name", "bal")
    val changes = Seq(
      // id 1: upsert then (later) delete -> gone
      (1L, 1L, 1L, "upsert", "a2", 11L),
      (1L, 2L, 1L, "delete", "", 0L),
      // id 2: delete then (later seq within same ts) upsert -> updated
      (2L, 5L, 1L, "delete", "", 0L),
      (2L, 5L, 2L, "upsert", "b2", 22L),
      // id 9: insert of a key absent from the snapshot
      (9L, 7L, 1L, "upsert", "new", 99L),
      // id 8: delete of a key that never existed -> no-op
      (8L, 8L, 1L, "delete", "", 0L))
      .toDF("id", "ts", "seq", "op", "name", "bal")
    val out = Cdc.applyChangelog(snap, changes, "id",
        Seq("ts", "seq"), "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(out == Set((2L, "b2", 22L), (3L, "c", 30L), (9L, "new", 99L)),
      s"got $out")
  }

  // --- Funnel -----------------------------------------------------------------

  test("funnel: subsequence matches with interleaving, order matters") {
    import spark.implicits._
    val ev = Seq(
      // user 1: a .. b .. c with noise -> converted
      (1L, 1L, "a"), (1L, 2L, "x"), (1L, 3L, "b"), (1L, 4L, "x"),
      (1L, 5L, "c"),
      // user 2: all steps present but out of order -> not converted
      (2L, 1L, "c"), (2L, 2L, "b"), (2L, 3L, "a"),
      // user 3: missing middle step -> not converted
      (3L, 1L, "a"), (3L, 2L, "c"))
      .toDF("u", "t", "s")
    val out = Funnel.converted(ev, "u", "s", Seq("t"), Seq("a", "b", "c"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(out(1L) == (5L, true) && out(2L) == (3L, false) &&
      out(3L) == (2L, false), s"got $out")
  }

  test("funnel: rejects steps that are substrings of each other") {
    import spark.implicits._
    val ev = Seq((1L, 1L, "view")).toDF("u", "t", "s")
    assertThrows[IllegalArgumentException] {
      Funnel.converted(ev, "u", "s", Seq("t"), Seq("view", "view_item"))
    }
  }

  // --- Skew.saltedJoin --------------------------------------------------------

  test("salted join == plain inner join, including duplicate and missing keys") {
    import spark.implicits._
    val large = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (1L, "e"))
      .toDF("k", "lv")
    val small = Seq((1L, "X"), (1L, "Y"), (2L, "Z"), (9L, "W"))
      .toDF("k", "sv")
    val salted = Skew.saltedJoin(large, small, "k", salts = 4)
      .select("k", "lv", "sv").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    val plain = large.join(small, Seq("k"))
      .select("k", "lv", "sv").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(salted.sameElements(plain),
      s"salted ${salted.toSeq} != plain ${plain.toSeq}")
  }

  // --- Chunking ---------------------------------------------------------------

  test("chunking: strided windows cover the doc; short docs yield one chunk") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e"), (2L, "x y")).toDF("id", "text")
    val out = Chunking.chunkByTokens(docs, "id", "text",
        chunkSize = 3, stride = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(out == Set(
      (1L, 0L, 3L, "a b c"), (1L, 1L, 3L, "c d e"),
      (2L, 0L, 2L, "x y")), s"got $out")
  }

  // --- Layout -----------------------------------------------------------------

  test("z-order: known interleavings and file-level clustering") {
    import spark.implicits._
    // x=3 (bits 0,1 -> z bits 0,2 = 5), y=5 (bits 0,2 -> z bits 1,5 = 34)
    val z = Seq((3L, 5L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).cast("long")).head.getLong(0)
    assert(z == 39L, s"z(3,5) = $z, want 39")
    val zs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).cast("long"))
      .collect().map(_.getLong(0)).toSeq
    assert(zs == Seq(0L, 1L, 2L, 3L), s"unit square order $zs")

    val dir = java.nio.file.Files.createTempDirectory("graft_zorder_").toString
    val df = spark.range(4096).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    Layout.writeZOrdered(df, "x", "y", dir, numFiles = 8)
    // per-file z ranges must not overlap: range partitioning by z makes
    // every file a contiguous z slice = a tight (x,y) rectangle
    val perFile = spark.read.parquet(dir)
      .select(input_file_name().as("f"),
        Layout.zValue(col("x"), col("y")).cast("long").as("z"))
      .groupBy("f").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(perFile.length > 1, "expected multiple files")
    perFile.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"file z ranges overlap: $perFile")
      case _ =>
    }
  }

  test("training shuffle: partition-invariant, stride-free, writable") {
    import spark.implicits._
    val ids = (0L until 800L).toDF("id")
    def assign(df: org.apache.spark.sql.DataFrame) =
      Layout.trainingShuffle(df, "id", 16, 7L)
        .select("id", "shard", "pos").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // the permutation is a pure function of the id: input partitioning,
    // parallelism, and row order must not move a single row
    val a = assign(ids.repartition(1))
    val b = assign(ids.repartition(13).sortWithinPartitions(col("id").desc))
    assert(a == b)
    // every shard populated; positions are 1..size within each shard
    val byShard = a.values.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted)
    assert(byShard.keySet == (0L until 16L).toSet)
    byShard.foreach { case (s, ps) =>
      assert(ps == (1L to ps.size.toLong), s"shard $s positions $ps")
    }
    // the squaring round kills the consecutive-id stride: neighbor ids
    // land in the same shard at ~1/16, nowhere near the affine chain's
    // measured 69%
    val sameNeighbor = (0L until 799L)
      .count(i => a(i)._1 == a(i + 1)._1).toDouble / 799
    assert(sameNeighbor < 0.2, s"neighbor-same-shard rate $sameNeighbor")

    // write path: one file per shard dir, rows inside in training order
    val dir = java.nio.file.Files.createTempDirectory("graft_shuf_").toString
    Layout.writeShuffled(ids, "id", 16, 7L, dir)
    val files = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col("shard"))
      .distinct().groupBy("shard").count().collect()
    assert(files.length == 16 && files.forall(_.getLong(1) == 1L),
      "expected exactly one file per shard dir")
    // partition-dir columns read back with inferred (int) type — cast
    val back = spark.read.parquet(dir)
      .select(col("id"), col("shard").cast("long"), col("pos"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(back == a)
  }

  // --- shared-span dedup ------------------------------------------------------

  test("span dedup: ubiquitous-span guard drops boilerplate, keeps real copies") {
    import spark.implicits._
    // 10 docs all carry the same boilerplate 3-gram; docs 1 and 2
    // additionally share a real copied span ("copy one two three four"
    // -> three shared 3-grams). Unique u{i}* filler keeps boundary grams
    // per-doc.
    val docs = (1 to 10).map { i =>
      val base = s"alpha beta gamma u${i}a u${i}b u${i}c"
      (i.toLong, if (i <= 2) s"$base copy one two three four" else base)
    }.toDF("doc_id", "text")
    // guard ON (maxDf=5 < 10): boilerplate span is dropped, only the
    // genuine copy pair survives, with exactly its 3 shared spans
    val guarded = Dedup.sharedSpanPairs(docs, "doc_id", "text",
        n = 3, maxDf = 5, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(guarded.toSeq == Seq((1L, 2L, 3L)), guarded.mkString(","))
    // guard OFF (maxDf >= corpus): boilerplate makes every pair a
    // candidate — the quadratic fan-out the df cap exists to stop
    val unguarded = Dedup.sharedSpanPairs(docs, "doc_id", "text",
      n = 3, maxDf = 100, minShared = 1).count()
    assert(unguarded == 45L, s"expected all C(10,2) pairs, got $unguarded")
  }
}
