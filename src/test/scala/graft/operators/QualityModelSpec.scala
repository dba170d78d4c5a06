package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hashed log-odds quality distillation: hand-computed weights on a
  * tiny corpus, the margin-0 tie convention, determinism under
  * adversarial repartitioning, and that distillation actually learns
  * its weak label on the real corpus (the bar the earlier batch
  * perceptron failed — it oscillated to majority class).
  */
class QualityModelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def micro(x: Double): Long = math.round(math.log(x) * 1e6)

  test("hand-computed log-odds on a two-doc corpus") {
    val docs = Seq(
      (1L, "good fine", true),   // features {b(good), b(fine)}
      (2L, "bad", false)         // features {b(bad)}
    ).toDF("doc_id", "text", "y")
    val out = QualityModel.distill(docs, "doc_id", "text", col("y"))
      .collect().map(r => (r.getLong(0),
        (r.getBoolean(1), r.getLong(2), r.getBoolean(3)))).toMap
    // pos=1, neg=1. Weights (present-vs-absent log-ratio):
    //   w(good) = w(fine) = µln((2·2)/(1·1)) = µln4
    //   w(bad)  = µln((1·1)/(2·2)) = µln(1/4)
    // Absent terms: good/fine −µln2 each, bad +µln2 → adjusted prior
    //   = µln(2/2) + (−µln2 −µln2 +µln2) = −µln2
    // doc1 = −µln2 + 2µln4 ; doc2 = −µln2 + µln(1/4)
    val ln2 = micro(2.0)
    assert(out(1L) === ((true, -ln2 + 2 * micro(4.0), true)))
    assert(out(2L) === ((false, -ln2 + micro(0.25), false)))
  }

  test("empty-feature doc scores the prior; margin 0 predicts negative") {
    // balanced corpus → prior 0; the empty doc's margin is exactly 0,
    // and the tie convention says negative
    val docs = Seq(
      (1L, "alpha beta", true),
      (2L, "gamma delta", false),
      (3L, "", true)
    ).toDF("doc_id", "text", "y")
    // pos=2, neg=1 → prior = round(1e6·ln(3/2)) ≠ 0; rebuild balanced:
    val bal = docs.filter(col("doc_id") < 3L)
      .unionByName(Seq((3L, "", true), (4L, "", false))
        .toDF("doc_id", "text", "y"))
    val out = QualityModel.distill(bal, "doc_id", "text", col("y"))
      .collect().map(r => (r.getLong(0), (r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out(3L) === ((0L, false)))
    assert(out(4L) === ((0L, false)))
  }

  test("NULL text gets an empty feature set, not a NULL margin") {
    val docs = Seq((1L, Option("alpha beta"), true),
        (2L, Option.empty[String], false))
      .toDF("doc_id", "text", "y")
    val out = QualityModel.distill(docs, "doc_id", "text", col("y"))
      .collect().map(r => (r.getLong(0), r.isNullAt(2))).toMap
    assert(out(1L) === false)
    assert(out(2L) === false) // margin = prior, never NULL
  }

  test("training is partitioning-independent (integer count sums)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val label = length(col("text")) > 400L
    def run(parts: Int) =
      QualityModel.distill(docs.repartition(parts), "doc_id", "text",
        label).collect().map(_.toSeq).toSet
    assert(run(3) === run(17))
  }

  test("train offline, score a STREAM online — margins identical") {
    // the production deployment shape: the model is a weight-map
    // literal, so scoring is a stateless map-side projection that drops
    // into any micro-batch unchanged
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(100)
    val label = length(col("text")) > 400L
    val f = QualityModel.featurize(docs, "doc_id", "text", label)
    val (w, prior) = QualityModel.trainBernoulliNb(f)
    val batchMargins = f
      .select(col("id"), QualityModel.marginCol(col("feats"), w, prior)
        .as("margin"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    val in = java.nio.file.Files.createTempDirectory("qm_stream_in")
    docs.select(col("doc_id"), col("text")).coalesce(1)
      .write.mode("overwrite").json(in.toString)
    val got = collection.mutable.Map.empty[Long, Long]
    val q = spark.readStream.schema("doc_id LONG, text STRING")
      .json(in.toString)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) =>
          val scored = QualityModel.featurize(batch, "doc_id", "text",
              lit(false))
            .select(col("id"),
              QualityModel.marginCol(col("feats"), w, prior).as("margin"))
            .collect()
          got.synchronized {
            scored.foreach(r => got(r.getLong(0)) = r.getLong(1))
          }
          ()
      }.start()
    try q.awaitTermination() finally q.stop()
    assert(got.toMap === batchMargins)
  }

  test("distributed training + join scoring == driver-table training + literal scoring") {
    val docs = Seq(
      (1L, "good fine words here and more", true),
      (2L, "bad awful terrible", false),
      (3L, "good words", true),
      (4L, "", false),
      (5L, "awful fine mixed bag", false)
    ).toDF("doc_id", "text", "y")
    val f = QualityModel.featurize(docs, "doc_id", "text", col("y"))
    val (wMap, priorMap) = QualityModel.trainBernoulliNb(f)
    val model = QualityModel.trainBernoulliNbDf(f)
    try {
      assert(model.prior === priorMap)
      val wDf = model.weights.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(wDf === wMap)
      val viaJoin = QualityModel.scoreViaJoin(f, model)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaLiteral = f
        .select(col("id"),
          QualityModel.marginCol(col("feats"), wMap, priorMap).as("m"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaJoin === viaLiteral)
      // the empty-feats doc scores the bare prior through BOTH paths
      assert(viaJoin(4L) === priorMap)
    } finally model.release()
  }

  test("property: margins match an independent in-test reimplementation") {
    import org.scalacheck.Gen
    def samples[T](g: Gen[T], n: Int): Seq[T] =
      (1 to n).map(i => g.pureApply(Gen.Parameters.default,
        org.scalacheck.rng.Seed(7000 + i.toLong)))
    def bucketOf(tok: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(("f:" + tok).getBytes("UTF-8"))
      d.take((QualityModel.DefaultHexChars + 1) / 2)
        .map(b => f"${b & 0xff}%02x").mkString
        .take(QualityModel.DefaultHexChars)
    }
    val word = Gen.listOfN(3, Gen.oneOf('x', 'y', 'z', 'w')).map(_.mkString)
    val doc = for {
      nw <- Gen.choose(0, 6)
      ws <- Gen.listOfN(nw, word)
      y <- Gen.oneOf(true, false)
    } yield (ws.mkString(" "), y)
    val corpusGen = Gen.choose(2, 8).flatMap(n => Gen.listOfN(n, doc))
    for (c <- samples(corpusGen, 6)) {
      val rows = c.zipWithIndex.map { case ((t, y), i) => (i.toLong, t, y) }
      val docs = rows.toDF("doc_id", "text", "y")
      val got = QualityModel.distill(docs, "doc_id", "text", col("y"))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      // independent reimplementation: sets, counts, and the exact
      // micro-log formulas in plain Scala
      def mu(x: Double) = math.round(math.log(x) * 1e6)
      val feats = rows.map { case (id, t, y) =>
        (id, y, t.split(" ").filter(_.nonEmpty).map(bucketOf).toSet)
      }
      val pos = feats.count(_._2).toLong
      val neg = feats.size - pos
      val buckets = feats.flatMap(_._3).distinct
      val w = buckets.map { b =>
        val pb = feats.count(f => f._2 && f._3(b)).toLong
        val nb = feats.count(f => !f._2 && f._3(b)).toLong
        b -> mu(((pb + 1.0) * (neg - nb + 1.0)) /
          ((nb + 1.0) * (pos - pb + 1.0)))
      }.toMap
      val prior = mu((pos + 1.0) / (neg + 1.0)) + buckets.map { b =>
        val pb = feats.count(f => f._2 && f._3(b)).toLong
        val nb = feats.count(f => !f._2 && f._3(b)).toLong
        mu(((pos - pb + 1.0) * (neg + 2.0)) /
          ((neg - nb + 1.0) * (pos + 2.0)))
      }.sum
      val want = feats.map { case (id, _, fs) =>
        id -> (prior + fs.toSeq.map(w).sum)
      }.toMap
      assert(got === want, s"corpus $c")
    }
  }

  test("distillation learns the weak label better than majority class") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val label = length(col("text")) > 400L
    val out = QualityModel.distill(docs, "doc_id", "text", label).persist()
    val n = out.count().toDouble
    val acc = out.filter(col("predicted") === col("label")).count() / n
    val majority = math.max(
      out.filter(col("label")).count(),
      out.filter(!col("label")).count()) / n
    info(f"accuracy=$acc%.3f majority=$majority%.3f")
    assert(acc > majority,
      s"learned model ($acc) must beat the majority class ($majority)")
    out.unpersist(blocking = false)
  }
}
