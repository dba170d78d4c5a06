package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ArrayOps
import graft.operators.{Quantization, Similarity}

/** ANN compression-ladder scale evidence at 10⁶ × 64-dim.
  *
  * Two regimes on the same corpus:
  *  - AMORTIZED (the production shape): codes are encoded ONCE and
  *    stored; each query scans the stored codes. The scan is what runs
  *    per-query at 100 TB — encode cost is paid once per ingest.
  *  - INLINE (what the one-shot operators do): encode + scan fused.
  *
  * Corpus geometry is CLUSTERED (1024 seeded centers + small noise) —
  * real embedding corpora cluster; uniform random 64-dim vectors at
  * 10⁶ have no meaningful nearest neighbors (concentration of measure)
  * and every sublinear/compressed method degrades to noise on them.
  * A --uniform run is kept to document exactly that.
  *
  * Usage: AnnScaleProfile [nVectors] [nQueries] [uniform]
  */
object AnnScaleProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nQ = args.lift(1).map(_.toInt).getOrElse(8)
    val uniform = args.lift(2).contains("uniform")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[annprof] $label%-26s $s%8.2f s")
      (r, s)
    }

    def unit(seedA: org.apache.spark.sql.Column,
        scale: Double)(i: org.apache.spark.sql.Column) =
      ((pmod(xxhash64(seedA, i), lit(2000000L)) - lit(1000000L))
        .cast("double") / lit(1000000.0 / scale)).cast("float")
    // clustered: center(id % 1024) + 5% noise(id); uniform: noise alone
    val vec =
      if (uniform)
        transform(sequence(lit(0), lit(63)), i => unit(col("id"), 1.0)(i))
      else transform(sequence(lit(0), lit(63)), i =>
        (unit(pmod(col("id"), lit(1024L)) + lit(7000000L), 1.0)(i) +
          unit(col("id"), 0.05)(i)).cast("float"))
    val corpus = spark.range(n)
      .select(col("id").as("vec_id"), vec.as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("materialize corpus")(corpus.count())
    val queries = corpus.filter(col("vec_id") < nQ)

    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def topk(scored: org.apache.spark.sql.DataFrame) = {
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("sim").desc, col("id").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5).select(col("q_id"), col("id"))
    }

    // --- baseline: float scan every query --------------------------------
    val (exact, tBrute) = time("float brute scan") {
      ids(Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5))
    }

    // --- amortized int8: encode once, scan stored codes ------------------
    val (int8Codes, tEnc8) = time("int8 encode+persist") {
      val c = Quantization.int8(corpus, "embedding")
        .filter(col("q_scale") > 0d)
        .select(col("vec_id").as("id"), col("q_vec"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count(); c
    }
    val q8 = Quantization.int8(queries, "embedding")
      .select(col("vec_id").as("q_id"), col("q_vec").as("q_codes"))
    val (int8, tInt8) = time("int8 stored-code scan") {
      ids(topk(int8Codes.join(broadcast(q8), col("q_id") =!= col("id"))
        .select(col("q_id"), col("id"),
          ArrayOps.cosineInt8(col("q_codes"), col("q_vec")).as("sim"))))
    }

    // --- amortized PQ: encode once, ADC-scan stored codes ----------------
    val (m, ksub, subDim) = (16, 16, 4)
    val sample = corpus.select(col("vec_id").as("id"), col("embedding"))
      .orderBy(col("id")).limit(2048)
      .collect().map(_.getSeq[Float](1).toArray)
    val cb = Similarity.trainPqCodebooks(sample, m, ksub, subDim, 10, 42L)
    val cbLit = ArrayOps.packedFloatLit(cb)
    val (pqCodes, tEncPq) = time("pq encode+persist") {
      val c = corpus.select(col("vec_id").as("id"),
        ArrayOps.pqEncodeF(col("embedding"), cbLit, m, ksub, subDim)
          .as("codes"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count(); c
    }
    val qLut = queries.select(col("vec_id").as("q_id"),
      ArrayOps.pqLutF(col("embedding"), cbLit, m, ksub, subDim).as("lut"))
    val (adc, tAdc) = time("pq ADC stored-code scan") {
      ids(topk(pqCodes.join(broadcast(qLut), col("q_id") =!= col("id"))
        .select(col("q_id"), col("id"),
          ArrayOps.pqAdcF(col("lut"), col("codes"), ksub).as("sim"))))
    }

    // --- ADC + exact refine over the stored codes ------------------------
    // PQ's blind spot is INTRA-cell resolution: every same-cell vector
    // ties in ADC, so the shortlist must cover the cell population or
    // the re-rank never sees the true neighbors (the faiss sizing rule
    // for IndexRefineFlat). cellMates estimates the tie-group size; the
    // covering run sizes refine·k past it, the refine=4 run shows what
    // an undersized shortlist costs.
    val cellMates = n / 1024 // one PQ cell ≈ one generator cluster here
    def adcRefine(shortK: Int) = {
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("sim").desc, col("id").asc)
      val short = pqCodes.join(broadcast(qLut), col("q_id") =!= col("id"))
        .select(col("q_id"), col("id"),
          ArrayOps.pqAdcF(col("lut"), col("codes"), ksub).as("sim"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= shortK).select("q_id", "id")
      val qf = queries.select(col("vec_id").as("q_id"),
        col("embedding").as("q_vec"))
      ids(topk(corpus.select(col("vec_id").as("id"), col("embedding"))
        .join(broadcast(short), Seq("id"))
        .join(broadcast(qf), Seq("q_id"))
        .select(col("q_id"), col("id"),
          ArrayOps.cosineF(col("q_vec"), col("embedding")).as("sim"))))
    }
    val (ref4, tRef4) = time("ADC refine k*4")(adcRefine(20))
    val coverK = (cellMates * 13 / 10).toInt
    val (refCover, tRefCover) =
      time(s"ADC refine cover=$coverK")(adcRefine(coverK))

    def recall(got: Set[(Long, Long)]) = got.count(exact).toDouble / exact.size
    val geom = if (uniform) "uniform" else "clustered"
    println(f"[annprof] n=$n nQ=$nQ geometry=$geom")
    println(f"[annprof] recall   int8=${recall(int8)}%.3f  adc=${recall(adc)}%.3f  refine20=${recall(ref4)}%.3f  refineCover=${recall(refCover)}%.3f")
    println(f"[annprof] scan     brute=$tBrute%.2f  int8=$tInt8%.2f  adc=$tAdc%.2f  refine20=$tRef4%.2f  refineCover=$tRefCover%.2f")
    println(f"[annprof] encode1x int8=$tEnc8%.2f  pq=$tEncPq%.2f")
    spark.stop()
  }
}
