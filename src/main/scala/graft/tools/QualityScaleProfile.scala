package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.QualityModel

/** Scale evidence for the distilled quality classifier: featurize +
  * train + score at 10⁵ and 10⁶ synthetic documents, local[16]. The
  * claims under test:
  *
  *  1. training cost is ONE aggregation over the feature table — the
  *     shuffle after map-side combine carries ≤ 257 rows whatever the
  *     corpus, so train wall should grow far slower than 10×;
  *  2. scoring is map-side (weight-map literal + one `aggregate` per
  *     row) — no join appears in the scored plan.
  *
  * Docs are 5–60 words from a 10k-word Zipf-ish vocabulary; the label
  * is a length cut, the shape the spec's beats-majority floor uses.
  */
object QualityScaleProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def corpus(n: Long) = spark.range(n).select(
      col("id").as("doc_id"),
      array_join(transform(
        sequence(lit(1), (pmod(hash(col("id")), lit(56)) + lit(5))),
        i => concat(lit("w"), pmod(hash(col("id") * 31 + i), lit(10000)))),
        " ").as("text"))

    // "sweep" mode: the CAPACITY sweep — hexChars × bigram features at
    // 10⁶ docs, measuring accuracy vs the weak label and the margin
    // separation (mean margin of true-label-positive minus
    // true-label-negative docs, micro units). This is the evidence
    // behind the operator's default capacity.
    if (args.headOption.contains("sweep")) {
      val docs = corpus(1000000L).persist()
      docs.count()
      val label = length(col("text")) > 150L
      for (hex <- Seq(2, 3, 4); big <- Seq(false, true)) {
        val t0 = System.nanoTime()
        val f = QualityModel.featurize(docs, "doc_id", "text", label,
          hexChars = hex, bigrams = big).persist()
        f.count()
        val (w, prior) = QualityModel.trainBernoulliNb(f)
        val m = f.select(col("y"),
          QualityModel.marginCol(col("feats"), w, prior).as("m"))
        val r = m.agg(
          avg(when(col("y") === (col("m") > 0), 1d).otherwise(0d)).as("acc"),
          avg(when(col("y"), col("m"))).as("mpos"),
          avg(when(!col("y"), col("m"))).as("mneg")).collect()(0)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[qsweep] n=1000000 hex=$hex big=$big%-5s " +
          f"acc=${r.getDouble(0)}%.4f  sep=${
            (r.getDouble(1) - r.getDouble(2)) / 1e6}%10.3f  " +
          f"weights=${w.size}%6d  ${sec}%6.1f s")
        f.unpersist()
      }
      docs.unpersist()
      spark.stop()
      return
    }

    // "joinpath" mode: the capacity regime PAST the dense-literal cap —
    // hexChars=6 (16.7M bucket space) + bigrams at 10⁶ docs through
    // trainBernoulliNbDf (weights never collected) + scoreViaJoin
    // (broadcast weight join). The measured evidence that the ladder's
    // top rung works at scale, not just in the spec.
    if (args.headOption.contains("joinpath")) {
      val docs = corpus(1000000L).persist()
      docs.count()
      val label = length(col("text")) > 150L
      val t0 = System.nanoTime()
      val f = QualityModel.featurize(docs, "doc_id", "text", label,
        hexChars = 6, bigrams = true).persist()
      f.count()
      val model = QualityModel.trainBernoulliNbDf(f)
      val m = f.join(QualityModel.scoreViaJoin(f, model), "id")
      val r = m.agg(
        avg(when(col("y") === (col("margin") > 0), 1d).otherwise(0d))
          .as("acc"),
        avg(when(col("y"), col("margin"))).as("mpos"),
        avg(when(!col("y"), col("margin"))).as("mneg"),
        count(lit(1)).as("n")).collect()(0)
      val nw = model.weights.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[qjoin] n=1000000 hex=6 big=true  " +
        f"acc=${r.getDouble(0)}%.4f  sep=${
          (r.getDouble(1) - r.getDouble(2)) / 1e6}%10.3f  " +
        f"weights=$nw%8d  ${sec}%6.1f s")
      model.release()
      f.unpersist(); docs.unpersist()
      spark.stop()
      return
    }

    for (n <- Seq(100000L, 1000000L)) {
      val docs = corpus(n).persist()
      docs.count()
      val label = length(col("text")) > 150L
      var t0 = System.nanoTime()
      val f = QualityModel.featurize(docs, "doc_id", "text", label)
        .persist()
      f.count()
      val tFeat = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val (w, prior) = QualityModel.trainBernoulliNb(f)
      val tTrain = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val scored = f.select(col("y"),
        (QualityModel.marginCol(col("feats"), w, prior) > 0).as("p"))
        .persist()
      val total = scored.count()
      val tScore = (System.nanoTime() - t0) / 1e9
      val acc = scored.filter(col("y") === col("p")).count().toDouble / total
      // claim 2: the scored plan must not contain a join
      val plan = f.select(
        QualityModel.marginCol(col("feats"), w, prior).as("m"))
        .queryExecution.executedPlan.toString
      val joined = plan.contains("Join")
      println(f"[qprof] n=$n%8d featurize=$tFeat%6.2f s  train=$tTrain%6.2f s  " +
        f"score=$tScore%6.2f s  acc=$acc%.3f  weights=${w.size}  scorePlanHasJoin=$joined")
      scored.unpersist(); f.unpersist(); docs.unpersist()
    }
    spark.stop()
  }
}
