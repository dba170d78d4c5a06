package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{SimHash, Text}

/** Oracle tests for the sketch-based training-data ops that are not
  * SQL-expressible (MinHash LSH, SimHash, LSH-ANN): planted near-duplicates
  * must be found, brute-force ground truth bounds the ANN recall.
  */
class TrainingOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def wordsDoc(seed: Int, n: Int = 60): String = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima",
      "mike", "november", "oscar", "papa", "quebec", "romeo")
    Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
  }

  private lazy val planted = {
    import spark.implicits._
    val base = wordsDoc(1)
    val nearDup = {
      val w = base.split(" "); w(5) = "zulu"; w(40) = "yankee"
      w.mkString(" ")
    }
    val exactDup = base
    val others = (10 to 29).map(wordsDoc(_))
    (Seq((1L, base), (2L, nearDup), (3L, exactDup)) ++
      others.zipWithIndex.map { case (t, i) => ((10 + i).toLong, t) })
      .toDF("doc_id", "text")
  }

  test("exact dedup collapses identical texts to the min id") {
    val out = Dedup.exact(planted, "doc_id", "text")
    val dup = out.filter(col("n_copies") > 1).collect()
    assert(dup.length == 1)
    assert(dup(0).getAs[Long]("keep_id") == 1L)
    assert(dup(0).getAs[Long]("n_copies") == 2L)
  }

  test("cross-source dup matrix: pairs from shared groups only, NULLs excluded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared text one", Option("crawl")),
      (2L, "shared text one", Option("wiki")),   // crawl↔wiki group 1
      (3L, "shared text one", Option("forum")),  // 3 sources, 1 group
      (4L, "shared text two", Option("crawl")),
      (5L, "shared text two", Option("wiki")),   // crawl↔wiki group 2
      (6L, "unique text", Option("crawl")),      // not duplicated → no pair
      (7L, "null prov", None),
      (8L, "null prov", Option("wiki")),         // dup, but partner is NULL
      (9L, "same src dup", Option("forum")),
      (10L, "same src dup", Option("forum")))    // single-source → no pair
    val m = Dedup.crossSourceDupMatrix(docs.toDF("doc_id", "text", "source"),
        "doc_id", "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(m === Set(
      ("crawl", "wiki", 2L),   // both shared-text groups
      ("crawl", "forum", 1L), ("forum", "wiki", 1L)), m.toString)
  }

  test("minhash LSH finds planted near-duplicates, no spurious pairs") {
    val pairs = Dedup.minhashLsh(planted, "doc_id", "text",
      threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ids = pairs.map(p => (p._1, p._2)).toSet
    assert(ids.contains((1L, 3L)), s"exact pair missing from $ids")
    assert(ids.contains((1L, 2L)) && ids.contains((2L, 3L)),
      s"near-dup pair missing from $ids")
    // nothing else clears a 0.5 shingle-jaccard bar
    assert(ids == Set((1L, 2L), (1L, 3L), (2L, 3L)), ids.toString)
    val exact = pairs.find(p => (p._1, p._2) == (1L, 3L)).get
    assert(exact._3 == 1.0)
  }

  test("simhash: identical docs collide, near-dups are close, others far") {
    import spark.implicits._
    val sk = planted.select(col("doc_id"),
        SimHash.simhash(Text.tokens(col("text"))).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sk(1L) == sk(3L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sk(1L), sk(2L)) <= 12, s"near-dup hamming ${ham(sk(1L), sk(2L))}")
    val pairs = Dedup.simhashPairs(planted, "doc_id", "text", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L)))
  }

  test("LSH-ANN recall vs brute force on the real embeddings table") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(emb, q, "vec_id", "embedding",
        dim = 64, k = 5) // default 4 planes x 3 tables: measured 0.88 here
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"LSH-ANN recall@5 (4 planes x 3 tables, multi-probe hamming<=1): $recall")
    assert(recall >= 0.8, s"recall $recall below floor")
    // approximate neighbors must never beat brute force's rank-1 (sanity:
    // any (q,id) in approx must exist in the full corpus)
    assert(approx.forall { case (qid, id) => qid != id })
  }

  test("hard negatives: top-k cross-label only, = brute force minus same-label") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    val neg = Similarity.hardNegatives(emb, q, "vec_id", "embedding",
      "label", k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // full top-5 per query, ranks dense
    assert(neg.groupBy(_._1).forall { case (_, rs) =>
      rs.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L) })
    // no negative shares its query's label
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(neg.forall { case (qid, id, _) => labels(qid) != labels(id) })
    // equals brute-force ranking over the cross-label candidate set:
    // oversample exact top-k, drop same-label, take first 5 — a
    // negative ranked there must appear here in the same order
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding",
      k = 60).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val expect = exact.map { case (qid, rs) =>
      qid -> rs.sortBy(_._3).map(_._2)
        .filter(id => labels(id) != labels(qid)).take(5).toSeq
    }
    val got = neg.groupBy(_._1).map { case (qid, rs) =>
      qid -> rs.sortBy(_._3).map(_._2).toSeq }
    assert(got === expect)
  }

  test("hard negatives: NULL labels are excluded on both sides") {
    import spark.implicits._
    // pinned contract (scaladoc): a NULL-label corpus row is never
    // mined (unknown class could be a same-class false negative) and a
    // NULL-label query yields zero rows. Vectors chosen so the
    // NULL-label corpus row (id 9) would be every query's top hit if
    // NULL counted as "differs".
    val rows = Seq(
      (1L, Array(1f, 0f), Option(0)),  // query, label 0
      (2L, Array(0.9f, 0.1f), Option(0)), // same label — not a negative
      (3L, Array(0.8f, 0.2f), Option(1)), // cross label — minable
      (9L, Array(1f, 0f), None),          // NULL label — never minable
      (10L, Array(0f, 1f), None))         // NULL-label query side
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(df, df.filter(col("vec_id") <= 1),
      "vec_id", "embedding", "label", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet === Set((1L, 3L)), out.mkString(","))
    val nullQ = Similarity.hardNegatives(df,
      df.filter(col("vec_id") === 10), "vec_id", "embedding", "label",
      k = 3)
    assert(nullQ.count() === 0L)
  }

  test("IVF-ANN recall vs brute force beats the floor, deterministic") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def run() = Similarity.ivfTopK(emb, q, "vec_id", "embedding",
        dim = 64, k = 5, nCells = 64, nProbe = 28) // q50's measured point
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = run()
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"IVF-ANN recall@5 (64 cells, 28 probes): $recall")
    assert(recall >= 0.8, s"recall $recall below floor")
    assert(approx.forall { case (qid, id) => qid != id })
    assert(run() == approx, "IVF result not deterministic")
  }

  test("IVF auto defaults: 4·√n cells at 8% probes, recall on structured geometry") {
    // the auto defaults are sized for corpora WITH neighbor structure
    // (tools/IvfScaleSweep: recall 1.0 at ≤10% scan on the clustered 10⁶
    // profile); this pins the same property at spec scale — 25 planted
    // clusters of 20 near-copies each, so every query's true top-5 sits
    // inside its own cluster and auto probing must find it
    import spark.implicits._
    val base = (0 until 25).map(c =>
      Array.tabulate(64)(i => (((c * 64 + i) * 2654435761L % 1000).toFloat
        / 500f) - 1f))
    val rows = for (c <- 0 until 25; j <- 0 until 20) yield
      (c.toLong * 20 + j,
        base(c).zipWithIndex.map { case (v, i) =>
          v + ((j * 64 + i) % 97).toFloat / 9700f })
    val emb = rows.toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") % 20 === 0).limit(10)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(emb, q, "vec_id", "embedding",
        dim = 64, k = 5) // auto: 4·√500 ≈ 89 cells, 8% ≈ 7 probes
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"IVF auto-default recall@5 on planted clusters: $recall")
    assert(recall >= 0.9, s"recall $recall below structured floor")
  }

  test("multimodal fake decoder is deterministic and length-correct") {
    val media = Multimodal.mediaTable(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 500)
    val f0 = feats.find(_.id == 0L).get
    val doc0 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") === 0).select("text").collect()(0).getString(0)
    assert(f0.n_bytes == doc0.getBytes("UTF-8").length.toLong)
    val again = Multimodal.extractFeatures(media).collect()
      .find(_.id == 0L).get
    assert(again == f0)
  }

  test("dedup pipeline: pairs -> clusters -> collapsed corpus") {
    val pairs = Dedup.minhashLsh(planted, "doc_id", "text", threshold = 0.5)
    val cl = Dedup.clusters(pairs)
    val byId = cl.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 1,2,3 form one cluster with survivor 1
    assert(byId(1L) == 1L && byId(2L) == 1L && byId(3L) == 1L)
    val kept = Dedup.dedupedCorpus(planted, "doc_id", cl)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L) && !kept.contains(2L) && !kept.contains(3L))
    assert(kept.size == planted.count() - 2)
  }

  test("simhash pairs on real documents: reported hamming is exact, dups never missed") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // plant one exact duplicate (id 900000 copies doc 3): identical texts
    // have identical sketches -> every band collides -> can never be missed
    val clone = real.filter(col("doc_id") === 3L)
      .withColumn("doc_id", lit(900000L))
    val docs = real.unionByName(clone)
    val reported = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(reported.nonEmpty)
    val sk = docs.select(col("doc_id"),
        SimHash.simhash(Text.tokens(col("text"))).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    reported.foreach { case (a, b, h) =>
      val exact = java.lang.Long.bitCount(sk(a) ^ sk(b))
      assert(h == exact && h <= 8, s"pair ($a,$b): reported $h actual $exact")
    }
    val ids = reported.map(p => (p._1, p._2)).toSet
    assert(ids.contains((3L, 900000L)), s"planted exact-dup pair missed: $ids")
  }

  test("minhash pairs on real documents: jaccard matches an independent kernel") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val reported = Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(reported.nonEmpty)
    // independent second layer: string shingles + Spark's own
    // array_intersect/array_union, no ArrayOps code shared
    val shingled = docs.filter("size(split(text, ' ')) >= 3")
      .selectExpr("doc_id",
        """array_distinct(transform(
             sequence(0, size(split(text, ' ')) - 3),
             i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3)))) AS sh""")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    reported.foreach { case (a, b, j) =>
      val (sa, sb) = (shingled(a), shingled(b))
      val exact = BigDecimal((sa & sb).size.toDouble / (sa | sb).size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(j == exact && j >= 0.1, s"pair ($a,$b): reported $j exact $exact")
    }
  }

  test("clusters: 10^5-edge planted chains converge distributed (no collect)") {
    import spark.implicits._
    // 1000 chains of 100 edges each: node ids chain*1000 + pos, so every
    // component's min (= survivor) is chain*1000. Chains maximize the
    // path-halving rounds the large-star/small-star loop must run.
    val edges = spark.range(100000L).select(
      ((col("id") / 100).cast("long") * 1000 + col("id") % 100).as("id_a"),
      ((col("id") / 100).cast("long") * 1000 + col("id") % 100 + 1).as("id_b"))
    val cl = Dedup.clusters(edges)
    val got = cl.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == 101000) // 1000 chains x 101 nodes
    assert(got.forall { case (id, surv) => surv == id - (id % 1000) },
      got.find { case (id, surv) => surv != id - (id % 1000) }.toString)
  }

  test("clusters: empty pair set yields empty mapping") {
    import spark.implicits._
    val none = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.clusters(none).count() == 0)
  }

  test("ngram jaccard hot-block guard routes oversized blocks through LSH") {
    import spark.implicits._
    // one oversized block (60 docs incl. an exact-dup pair) + one small
    // block; cap at 20 forces the big block onto the banded-LSH path
    val bigBlock = (0 until 60).map(i =>
      (i.toLong, if (i == 59) wordsDoc(107) else wordsDoc(100 + i), "big"))
    val smallBlock = Seq(
      (200L, wordsDoc(7), "small"), (201L, wordsDoc(7), "small"),
      (202L, wordsDoc(500), "small"))
    val df = (bigBlock ++ smallBlock).toDF("doc_id", "text", "source")
    val out = Dedup.ngramJaccardPairs(df, "doc_id", "text", "source",
        n = 3, minJaccard = 0.9, maxBlockSize = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ids = out.map(p => (p._1, p._2)).toSet
    // exact path (small block): planted identical pair
    assert(ids.contains((200L, 201L)), ids.toString)
    // LSH path (big block): identical docs share every band -> always found
    assert(ids.contains((7L, 59L)), ids.toString)
    assert(out.forall(_._3 >= 0.9), out.mkString(","))
    // guard must not invent sub-threshold pairs
    assert(ids == Set((200L, 201L), (7L, 59L)), ids.toString)
  }

  test("threshold-1.0 fast path: all pairs per group, zero joins, star cap above the bucket bound") {
    import spark.implicits._
    // groups: {1,3,5} identical, {7,8} identical, {9} unique — the fast
    // path must emit ALL within-group pairs (q43's oracle is all-pairs),
    // every pair at exactly jaccard 1.0
    val docs = Seq(
      (1L, wordsDoc(10)), (5L, wordsDoc(10)), (3L, wordsDoc(10)),
      (7L, wordsDoc(20)), (8L, wordsDoc(20)),
      (9L, wordsDoc(30))).toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", threshold = 1.0)
    val got = pairs.select(col("id_a"), col("id_b"))
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 3L), (1L, 5L), (3L, 5L), (7L, 8L)), got.toString)
    assert(pairs.filter(col("jaccard") =!= 1.0).count() == 0L)
    // the whole point of the short-cut: ONE groupBy shuffle, NO self-join,
    // no banding — the physical plan must contain no join operator at all
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"threshold-1.0 path planned a join:\n$plan")

    // oversized identical group: same star-edge cap as the banded guard —
    // exactly n-1 edges, all rooted at the group minimum
    val spam = spark.range(5000L).select(
      col("id").as("doc_id"), lit(wordsDoc(1)).as("text"))
    val star = Dedup.minhashLsh(spam, "doc_id", "text",
      threshold = 1.0, maxBucketSize = 4096)
    assert(star.count() == 4999L)
    assert(star.filter(col("id_a") =!= 0L).count() == 0L)
  }

  test("hot-bucket guard: 10^5 identical docs complete via star edges, dedup output intact") {
    import spark.implicits._
    // template-spam corpus: 100k docs with IDENTICAL text land every band
    // in ONE (band, hash) bucket. All-pairs would emit ~5*10^9 candidates
    // (the job would not finish); the star guard emits exactly n-1.
    val template = wordsDoc(1)
    val spam = spark.range(100000L).select(
      col("id").as("doc_id"), lit(template).as("text"))
    val uniques = (0 until 5).map(i => (200000L + i, wordsDoc(300 + i)))
      .toDF("doc_id", "text")
    val corpus = spam.unionByName(uniques)
    val t0 = System.nanoTime()
    val pairs = Dedup.minhashLsh(corpus, "doc_id", "text",
      threshold = 0.5, maxBucketSize = 4096)
    // exactly the n-1 star edges rooted at the bucket-min (doc 0), all
    // verified at jaccard 1.0 — NOT the quadratic all-pairs set
    assert(pairs.count() == 99999L)
    val cl = Dedup.clusters(pairs)
    val kept = Dedup.dedupedCorpus(corpus, "doc_id", cl)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"minhash hot-bucket pipeline on 10^5 spam docs: $secs%.1f s")
    // one survivor for the spam family + the 5 uniques, bit-identical to
    // what all-pairs would collapse to
    assert(kept == (Set(0L) ++ (0 until 5).map(i => 200000L + i)), kept.toString)
    assert(secs < 300, f"hot-bucket path too slow: $secs%.1f s")

    // simhash path: identical sketches collide on all 4 bands; star guard
    // caps candidates at n-1 with hamming 0
    val sp = Dedup.simhashPairs(corpus, "doc_id", "text",
      maxDist = 3, maxBucketSize = 4096)
    assert(sp.count() == 99999L)
    assert(sp.filter(col("hamming") =!= 0).count() == 0L)

    // embedding path: 50k IDENTICAL vectors share one hyperplane bucket;
    // star guard emits exactly n-1 pairs at cosine 1.0
    val vec = (0 until 16).map(i => 0.1f * (i % 5 + 1)).toArray
    val spamVecs = spark.range(50000L).select(
      col("id").as("vec_id"),
      typedLit(vec).as("embedding"))
    val ep = Dedup.embeddingNearDups(spamVecs, "vec_id", "embedding",
      dim = 16, threshold = 0.99, maxBucketSize = 4096)
    assert(ep.count() == 49999L)
  }

  test("length-bucketed batching: assignment, padding, beats hash order") {
    import spark.implicits._
    // hand case: lens 10,11,12,13 in bucket 0 (width 64), batchSize 2
    // -> batches (10,11) and (12,13); padding 1 and 1
    val tiny = Seq((1L, 10L), (2L, 11L), (3L, 12L), (4L, 13L))
      .toDF("id", "len")
    val got = Packing.lengthBucketedBatches(tiny, "id", "len",
        batchSize = 2, bucketWidth = 64L)
      .orderBy("bucket", "batch")
      .select("batch", "n_docs", "max_len", "sum_len", "padding")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got === Array((0L, 2L, 11L, 21L, 1L), (1L, 2L, 13L, 25L, 1L)))
    // measured claim: bucketing pads less than hash-ordered batching
    // on a skewed length distribution
    val rnd = new scala.util.Random(7)
    val docs = (1 to 4000)
      .map(i => (i.toLong, (math.pow(rnd.nextDouble(), 3) * 900).toLong + 5))
      .toDF("id", "len")
    def pad(assign: org.apache.spark.sql.DataFrame): Long = assign
      .groupBy("batch").agg(
        (org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)) *
          org.apache.spark.sql.functions.max($"len") -
          org.apache.spark.sql.functions.sum($"len")).as("p"))
      .agg(org.apache.spark.sql.functions.sum($"p")).as[Long].head()
    val bucketed = Packing.lengthBucketedBatches(docs, "id", "len",
        batchSize = 16, bucketWidth = 32L)
      .agg(org.apache.spark.sql.functions.sum($"padding")).as[Long].head()
    val hashOrdered = pad(docs.withColumn("batch",
      org.apache.spark.sql.functions.expr(
        "(row_number() OVER (ORDER BY hash(id), id) - 1) div 16")))
    info(s"padding: bucketed=$bucketed hash-ordered=$hashOrdered")
    assert(bucketed < hashOrdered / 4,
      s"bucketed=$bucketed not << hash-ordered=$hashOrdered")
    // every doc in exactly one batch
    assert(Packing.lengthBucketedBatches(docs, "id", "len", 16, 32L)
      .agg(org.apache.spark.sql.functions.sum($"n_docs")).as[Long].head()
      === 4000L)
  }

  test("packByBudget: cumulative-quotient packs, exact and deterministic") {
    import spark.implicits._
    // lang a: token counts 3,4,5,2 with budget 6 -> cum_before 0,3,7,12
    // -> packs 0,0,1,2; lang b independent
    val df = Seq(
      (1L, "a", "w w w"), (2L, "a", "w w w w"), (3L, "a", "w w w w w"),
      (4L, "a", "w w"), (10L, "b", "w w w w w w w")).toDF("doc_id", "lang", "text")
    val got = Packing.packByBudget(df, "doc_id", "text", "lang", budget = 6L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1L, "a", 3L, 0L), (2L, "a", 4L, 0L),
      (3L, "a", 5L, 1L), (4L, "a", 2L, 2L), (10L, "b", 7L, 0L)), got.toString)
    // packs never skip: every pack id up to the max is inhabited per lang
    val packsA = got.filter(_._2 == "a").map(_._4).distinct.sorted
    assert(packsA == (0L to packsA.max).toSeq)
  }

  test("packOffsets: per-pack start offsets, straddlers carry their tail") {
    import spark.implicits._
    // same corpus/budget as the packByBudget test: lang a packs
    // {1,2}->0, {3}->1, {4}->2; offsets restart per pack, and doc 2
    // (cum_before 3) starts at offset 3 of pack 0 even though it
    // straddles past budget 6 (the loader wraps)
    val df = Seq(
      (1L, "a", 3L), (2L, "a", 4L), (3L, "a", 5L),
      (4L, "a", 2L), (10L, "b", 7L)).toDF("doc_id", "lang", "n_tokens")
    val got = Packing.packOffsets(df, "doc_id", "lang", "n_tokens",
        budget = 6L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      1L -> ((0L, 0L)), 2L -> ((0L, 3L)),
      3L -> ((1L, 0L)), 4L -> ((2L, 0L)),
      10L -> ((0L, 0L))), got.toString)
  }

  test("incremental dedup finds delta-vs-corpus pairs only, corpus never self-paired") {
    import spark.implicits._
    val corpusDocs = (10 to 29).map(i => (i.toLong, wordsDoc(i)))
    // delta: one exact clone of corpus doc 12, one near-dup of corpus doc
    // 15 (2 token edits), one fresh doc; corpus also contains an internal
    // exact pair (28 == 29's text) that must NOT be reported
    val near15 = { val w = wordsDoc(15).split(" "); w(3) = "zulu"; w(50) = "yankee"; w.mkString(" ") }
    val corpus = (corpusDocs :+ ((29L, wordsDoc(28)))).toDF("doc_id", "text")
    val delta = Seq((100L, wordsDoc(12)), (101L, near15), (102L, wordsDoc(999)))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalNearDups(corpus, delta, "doc_id", "text",
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ids = got.map(p => (p._1, p._2)).toSet
    assert(ids.contains((12L, 100L)), s"exact clone missed: $ids")
    assert(ids.contains((15L, 101L)), s"near-dup missed: $ids")
    assert(got.find(p => (p._1, p._2) == (12L, 100L)).get._3 == 1.0)
    // every reported pair is (corpus, delta): corpus-internal dup invisible
    assert(got.forall(p => p._1 < 100L && p._2 >= 100L), got.mkString(","))
    assert(!ids.exists(p => p._2 == 102L), "fresh delta doc must match nothing")

    // threshold 1.0 fast path (broadcast hset-equality join, no banding):
    // only the EXACT clone qualifies; the near-dup and fresh docs do not,
    // corpus-internal dups stay invisible, and no join appears for the
    // delta bands because there are none — the plan is one broadcast join
    val exact = Dedup.incrementalNearDups(corpus, delta, "doc_id", "text",
      threshold = 1.0)
    val exactGot = exact.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2))).toSet
    assert(exactGot == Set((12L, 100L, 1.0)), exactGot.toString)
    val plan = exact.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("embedding near-dup blocking keeps identical vectors together") {
    import spark.implicits._
    val base = (0 until 64).map(i => (i % 7).toFloat / 7f).toArray
    val near = base.clone(); near(0) = near(0) + 0.001f
    val far = (0 until 64).map(i => ((i * 31) % 13).toFloat / 13f - 0.5f).toArray
    val df = Seq((1L, base), (2L, near), (3L, far))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(df, "vec_id", "embedding",
      dim = 64, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), pairs.toString)
  }

  test("multimodal resize and frame sampling: deterministic shapes") {
    val media = Multimodal.mediaTable(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    val resized = Multimodal.resizeAll(media, 64, 64).collect()
    assert(resized.length == 500)
    assert(resized.forall(r => r.meta.width == 64 && r.meta.height == 64))
    assert(resized.forall(_.media.nonEmpty))
    // deterministic: same input -> same bytes
    val again = Multimodal.resizeAll(media, 64, 64).collect()
      .map(r => r.id -> r.media.toSeq).toMap
    assert(resized.forall(r => again(r.id) == r.media.toSeq))

    val frames = Multimodal.sampleFrames(media, frameBytes = 32, stride = 2)
      .collect()
    assert(frames.nonEmpty)
    // one media row fans out to ceil(len/32)/2-ish frames, strided
    val f0 = frames.filter(_.id == 0L).map(_.frame_no).sorted
    assert(f0.headOption.contains(0))
    assert(f0.forall(_ % 2 == 0))
  }

  test("stratified quota: exact per-stratum counts, deterministic") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("lang"))
    def run() = Sampling.stratifiedQuota(docs, "lang", "doc_id", 30)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val got = run()
    val perLang = got.groupBy(_._2).map { case (l, s) => l -> s.size }
    assert(perLang.values.forall(_ == 30), perLang.toString)
    assert(got == run(), "quota sample not deterministic")
    // quota above the stratum size returns the whole stratum
    val all = Sampling.stratifiedQuota(docs, "lang", "doc_id", 100000)
    assert(all.count() == docs.count())
    // fraction sampler: sane size, per-stratum
    val frac = Sampling.stratifiedFraction(docs, "lang", 0.2, seed = 7L)
    assert(frac.count() > 0 && frac.count() < docs.count())
    // cardinality guard: a doc-id-like stratum column must fail fast
    // (bounded collect), not OOM the driver building the sampleBy map
    val err = intercept[IllegalArgumentException] {
      Sampling.stratifiedFraction(docs, "doc_id", 0.2, maxStrata = 100)
    }
    assert(err.getMessage.contains("not a stratum column"), err.getMessage)
  }

  test("normalize and scrubPii transform as specified") {
    import spark.implicits._
    val df = Seq(
      ("Hello, World!!  Mixed-CASE  42x", "a@b.co and 12345678 end",
        1L)).toDF("t1", "t2", "id")
    val out = df.select(
      Text.normalize(col("t1")).as("n"),
      Text.scrubPii(col("t2")).as("s")).collect()(0)
    assert(out.getString(0) == "hello world mixed case 42x", out.getString(0))
    assert(out.getString(1) == "<EMAIL> and <NUM> end", out.getString(1))
    // short digit runs (< 7) survive scrubbing
    val keep = df.select(Text.scrubPii(lit("order 123456 ok")).as("s"))
      .collect()(0).getString(0)
    assert(keep == "order 123456 ok")
  }

  test("language-ID heuristic picks marker-matching language") {
    import spark.implicits._
    val df = Seq(
      ("d1", "der hund und die katze und der vogel"),
      ("e1", "the cat of the house and a dog"),
      ("u1", "xyzzy plugh quux")).toDF("id", "text")
    val got = df.select(col("id"), Text.langId(col("text")).as("l"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("d1") == "de")
    assert(got("e1") == "en")
    assert(got("u1") == "und")
  }
}
