package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the integer-mass PageRank contract: exact hand-computed ranks
  * on a 3-node star (every truncating division lands where the scaladoc
  * says it does), and bit-identical results under adversarial
  * repartitioning — the reproducibility claim the q117 oracle proves
  * cross-engine but cannot prove cross-partitioning.
  */
class GraphSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("hand-computed ranks on the A<->{B,C} star after 3 rounds") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
      .toDF("src", "dst")
    val out = Graph.pageRank(edges, iters = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // r1: A = .15e9 + 2·.85e9 = 1,850,000,000; B = C = .15e9 + .85e9/2
    // r2: A ships (1.85e9·85 div 100) div 2 = 786,250,000 …
    // r3: A = .15e9 + 2·((936,250,000·85 div 100)) … every step exact.
    assert(out == Map(1L -> 1741625000L, 2L -> 629187500L, 3L -> 629187500L),
      s"got $out")
  }

  test("parallel edges collapse before degree counting") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    val out = Graph.pageRank(edges, iters = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // Collapsed: both nodes outdeg 1 → stationary at 1e9 each. If the
    // duplicate edge survived, node 2 would receive two shares.
    assert(out == Map(1L -> 1000000000L, 2L -> 1000000000L), s"got $out")
  }

  test("label propagation: hand-computed bounded rounds on a chain") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = Graph.minLabelPropagation(edges, rounds = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // Labels flow one hop per round: node 3 reaches 1 in two hops,
    // node 4 only reaches 2 — NOT converged, and that's the contract.
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L), s"got $out")
  }

  test("label propagation equals connected components once rounds cover the diameter") {
    import spark.implicits._
    val undirected = Seq((1L, 2L), (2L, 5L), (5L, 9L), // component min 1
      (3L, 7L), (7L, 8L))                              // component min 3
    val edges = (undirected ++ undirected.map(_.swap)).toDF("src", "dst")
    val out = Graph.minLabelPropagation(edges, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 9L -> 1L,
      3L -> 3L, 7L -> 3L, 8L -> 3L), s"got $out")
  }

  test("label propagation: identical labels at every materialization " +
      "cadence (the static-seed recurrence is cadence-independent)") {
    import spark.implicits._
    // asymmetric digraph: a 6-chain (labels flow one hop per round, so
    // 5 rounds do NOT converge it), a cycle, a dst-only sink and a
    // src-only source — every seed/union edge case at once
    val edges = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L),
      (14L, 15L), (20L, 21L), (21L, 20L), (30L, 31L), (32L, 31L),
      (40L, 41L)).toDF("src", "dst")
    def run(every: Int): Map[Long, Long] =
      Graph.minLabelPropagation(edges, rounds = 5,
        materializeEvery = every).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
    val lazyAll = run(100) // one action, 5 lazy rounds
    assert(lazyAll === run(1), "per-round materialization must not " +
      "change a single label")
    assert(lazyAll === run(2))
    assert(lazyAll(15L) === 10L && lazyAll(14L) === 10L &&
      lazyAll(31L) === 30L && lazyAll(41L) === 40L &&
      lazyAll(20L) === 20L && lazyAll(21L) === 20L, s"got $lazyAll")
  }

  test("ranks are bit-identical across adversarial partitionings") {
    val o = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val l = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    import org.apache.spark.sql.functions._
    val pairs = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk")).distinct()
    def edges = pairs
      .select((col("ck") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
      .unionByName(pairs
        .select((col("sk") * 2 + 1).as("src"), (col("ck") * 2).as("dst")))
    def run(parts: Int): Set[(Long, Long)] =
      Graph.pageRank(edges.repartition(parts), iters = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = run(1)
    val b = run(13)
    assert(a == b && a.nonEmpty,
      "integer PageRank must not depend on partitioning")
  }
}
