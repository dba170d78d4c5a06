package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Greedy k-center selection checked against an independent in-test
  * replay of Gonzalez's farthest-first traversal on the same quantized
  * integers: the exact pick sequence (including id tie-breaks), the
  * nonincreasing coverage-radius property, duplicate-heavy corpora
  * (the tie-break must never re-pick a chosen center), the k > n edge,
  * and partition-invariance.
  */
class CoresetSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val S = 1000000L

  // Independent reference: the textbook greedy loop over quantized longs.
  private def refGreedy(pts: Seq[(Long, Seq[Float])], k: Int): Seq[(Long, Long, Long)] = {
    val q = pts.map { case (id, v) =>
      id -> v.map(x => Math.round(x.toDouble * S)).toArray }
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map { i => val d = a(i) - b(i); d * d }.sum
    val seed = q.minBy(_._1)
    val chosen = scala.collection.mutable.ArrayBuffer[(Long, Long)]((seed._1, 0L))
    val centers = scala.collection.mutable.ArrayBuffer(seed._2)
    while (chosen.size < math.min(k, q.size)) {
      val cand = q.filterNot(p => chosen.exists(_._1 == p._1))
        .map { case (id, v) => (id, centers.map(c => l2(v, c)).min) }
      val best = cand.minBy { case (id, d) => (-d, id) }
      chosen += best
      centers += q.find(_._1 == best._1).get._2
    }
    chosen.toSeq.zipWithIndex.map { case ((id, d), i) => ((i + 1).toLong, id, d) }
  }

  private val pts: Seq[(Long, Seq[Float])] = Seq(
    (5L, Seq(0.0f, 0.0f)),   // smallest id -> seed
    (6L, Seq(10.0f, 0.0f)),
    (7L, Seq(0.0f, 10.0f)),
    (8L, Seq(10.0f, 10.0f)),
    (9L, Seq(5.0f, 5.0f)),
    (10L, Seq(0.1f, 0.1f)),
    (11L, Seq(9.9f, 10.0f))
  )

  test("pick sequence equals the brute-force greedy, across partitionings") {
    val want = refGreedy(pts, 5)
    for (parts <- Seq(1, 3, 17)) {
      val df = pts.toDF("id", "vec").repartition(parts)
      val got = Coreset.kCenterGreedy(df, "id", "vec", k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        .sortBy(_._1)
      assert(got === want, s"parts=$parts")
    }
  }

  test("coverage radius is nonincreasing after the seed; seed is smallest id at dist 0") {
    val got = Coreset.kCenterGreedy(pts.toDF("id", "vec"), "id", "vec", k = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.head == ((1L, 5L, 0L)))
    val dists = got.drop(1).map(_._3)
    assert(dists.zip(dists.drop(1)).forall { case (a, b) => a >= b },
      s"coverage radii must be nonincreasing: ${dists.mkString(",")}")
  }

  test("exact-duplicate corpus: never re-picks a center, ties break to smallest id") {
    // every point identical -> all residual distances are 0; the pick
    // order must be pure ascending id with no repeats
    val dup = (1L to 5L).map(id => (id, Seq(1.0f, 2.0f)))
    val got = Coreset.kCenterGreedy(dup.toDF("id", "vec"), "id", "vec", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got === Seq((1L, 1L, 0L), (2L, 2L, 0L), (3L, 3L, 0L), (4L, 4L, 0L)))
  }

  test("per-round scan plans as TakeOrderedAndProject over the packed-literal kernel") {
    // the shape each of the k rounds executes: distance to the chosen
    // set via one kernel call against a packed literal, argmax via a
    // bounded top-1 — never a global sort, never a join, never a shuffle
    import org.apache.spark.sql.functions._
    val qdf = pts.toDF("id", "vec").select(col("id"),
      Clustering.quantizeF(col("vec"), 1000000L).as("qv"))
    val flat = pts.head._2.map(x => Math.round(x.toDouble * 1000000L)).toArray
    val round = qdf.filter(!col("id").isin(5L))
      .select(col("id"),
        Centroids.nearestOfLit(col("qv"), flat, 2).getItem(1).as("dist"))
      .orderBy(col("dist").desc, col("id").asc).limit(1)
    val p = round.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("TakeOrderedAndProject"),
      s"round argmax fell into a global sort:\n$p")
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"round scan must be map-side only:\n$p")
  }

  test("k larger than the corpus returns every row exactly once") {
    val got = Coreset.kCenterGreedy(pts.take(3).toDF("id", "vec"),
      "id", "vec", k = 100).collect()
    assert(got.length == 3)
    assert(got.map(_.getLong(1)).toSet == Set(5L, 6L, 7L))
  }
}
