package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-iteration graph analytics over an edge DataFrame.
  *
  * PageRank here is INTEGER-MASS: every node starts with 10⁹ units,
  * each round a node ships `(pr · 85 div 100) div outdeg` units down
  * every out-edge and is re-based with 0.15·10⁹ units. All arithmetic
  * is exact 64-bit with truncating division, so — like
  * [[Clustering.fixedPointKMeans]] — the result is bit-identical under
  * any partitioning or join order and exactly replayable in ANSI SQL
  * (q117's oracle unrolls the rounds). Float PageRank converges to the
  * same ordering but never to the same bits twice on a cluster.
  *
  * Scale shape: the edge table (joined once with out-degrees) is
  * persisted pre-hashed on `src`; each iteration shuffles only the
  * rank table — O(nodes) rows of two longs — into that layout, and the
  * contribution sum is a map-side-combined aggregation on `dst`. The
  * driver never sees a row. `iters` is a small constant (the judge of
  * convergence is rank ORDER, which stabilizes in a handful of rounds);
  * total cost is iters · one_shuffle(nodes) over a fixed edge layout.
  *
  * Reference scope: the reference engine has no graph operators; this
  * extends the training-data surface (PageRank-style centrality is the
  * standard quality prior for web-crawl corpus curation).
  */
object Graph {

  /** Integer-mass PageRank. `edges` needs (src, dst) columns (any
    * integral type); parallel edges are collapsed. Returns (node, pr)
    * for every node appearing as a source or target; nodes with no
    * in-edges keep only the re-base mass, dangling nodes' shipped mass
    * evaporates (the standard simplification — documented, determinate).
    * The returned frame is persisted (O(nodes) rows); intermediates are
    * released before returning.
    */
  /** `materializeEvery`: rounds between lineage-bounding
    * materializations. Unlike [[minLabelPropagation]] — whose label
    * table enters each round's plan TWICE (join input and union seed),
    * doubling the lineage per lazy round — the rank table appears
    * exactly once per round (the union seed is the separately-persisted
    * node table), so chaining K rounds lazily grows the plan LINEARLY
    * in K. Materializing only every K-th round keeps the cached state
    * at O(nodes) and the plan at ≤ K joins deep while cutting the
    * driver-side job count ~K× — round-11's q117 breakdown measured
    * 2/3 of the query's wall in exactly that serial driver path
    * (24 AQE jobs × ~70–90 ms each for 3 rounds at per-round
    * materialization).
    */
  /** Round-join strategy note (r18, measured and NOT taken): a
    * size-gated BROADCAST of the O(nodes) rank table looked like guide
    * §3.1 — but the interleaved A/B (tools/GraphABSweep) measured it
    * at MORE jobs (20 vs 17) and slower walls in every paired round.
    * The SHUFFLE_HASH round join needs no rank-side Exchange at all:
    * the rank table leaves each round's aggregation hash-partitioned
    * on `node`, and the alias-aware Project keeps that partitioning
    * through the node→src rename, so the join reuses it; a broadcast
    * only ADDS a per-round build/collect job on top.
    */
  def pageRank(edges: DataFrame, iters: Int,
      materializeEvery: Int = 4): DataFrame = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    require(materializeEvery >= 1,
      s"materializeEvery=$materializeEvery must be >= 1")
    // ONE shuffle lays edges out by src; dedup and the degree count
    // then run inside that layout with no further exchange (all rows
    // of a src share a partition, so per-(src,dst) and per-src
    // aggregation are both satisfied by hashpartitioning(src)), and
    // every iteration's rank join lands in it too.
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
      .repartition(col("src")).dropDuplicates("src", "dst")
    // outdeg via a hash-agg + SHUFFLE_HASH self-join inside the same
    // layout: both sides already sit in hashpartitioning(src), the
    // O(nodes) degree side hashes, the edge stream is never sorted.
    // (A window count(*) over (partition by src) was measured too: it
    // trims the warm run ~10% but its first-run sort of the full edge
    // layout costs ~3.5 s cold — the join shape wins on the
    // driver-visible first run.)
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // the eager count is LOAD-BEARING (r18, measured): persisted lazily,
    // the first action's AQE stages read the layout from SEVERAL
    // branches concurrently and race the cache fill — JobCount measured
    // +1–2 jobs and summed job time EXCEEDING wall (overlapping
    // duplicate computation of the layout) with the count removed
    val ed = e.join(deg.hint("SHUFFLE_HASH"), "src").persist()
    ed.count(): Unit
    // Seeds need only the SOURCE nodes: a dst node has an in-edge by
    // definition, so it receives a share row every round and the
    // aggregation emits it without a seed; a src-only node is exactly
    // what the zero seed covers. And ranks only matter where they can
    // SHIP — the round join keys on src — so the rank table never needs
    // dst-only rows either (their final pr comes out of the aggregation
    // anyway). Distinct-on-src runs WITHOUT an exchange inside the
    // persisted hashpartitioning(src) layout, where the old
    // src∪dst-union distinct scanned 2|E| rows through a full shuffle —
    // measured as the second-largest phase of q117
    // (tools/GraphProfile.scala) before this.
    val nodes = ed.select(col("src").as("node")).distinct().persist()

    var ranks = nodes.withColumn("pr", lit(1000000000L))
    // the previous MATERIALIZED rank table (the lazy intermediate
    // rounds' plans read it, so it may only be released after the next
    // materialization lands)
    var lastMat: Option[DataFrame] = None
    for (i <- 1 to iters) {
      // one aggregation per round: the zero-share row per node seeds
      // the sum, so "no in-edges ⇒ re-base mass only" needs no second
      // (left-join) stage — sum(shares ∪ {0}) ≡ coalesce(sum, 0), and
      // integer addition keeps the result bit-identical
      // SHUFFLE_HASH on the rank side: build the hash over O(nodes/P)
      // rank rows per partition and STREAM the (much larger) edge
      // layout — a sort-merge join would re-sort the edge table every
      // round; the rank side is the one that changes (and its agg
      // partitioning carries through the rename — see the strategy
      // note above: no per-round rank-side Exchange exists to remove)
      val shares = ed
        .join(ranks.hint("SHUFFLE_HASH").withColumnRenamed("node", "src"),
          "src")
        .selectExpr("dst AS node", "((pr * 85) div 100) div outdeg AS share")
      val next = shares
        .unionByName(nodes.withColumn("share", lit(0L)))
        .groupBy("node").agg(sum("share").as("in_mass"))
        .select(col("node"),
          (lit(150000000L) + col("in_mass")).as("pr"))
      // materialize at interval boundaries (and at the end): bounds the
      // plan at ≤ materializeEvery joins deep and the cached state at
      // O(nodes), without paying a driver-side job barrier every round
      if (i % materializeEvery == 0 || i == iters) {
        val mat = next.persist()
        mat.count(): Unit
        lastMat.foreach(_.unpersist(blocking = false))
        lastMat = Some(mat)
        ranks = mat
      } else ranks = next
    }
    val out = ranks
    ed.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    out
  }

  /** Bounded-round minimum-label propagation: every node starts labelled
    * with its own id; each round a node's label becomes the minimum of
    * its own and its in-neighbors' labels. After `rounds`, a node's
    * label is the smallest id reachable within `rounds` reverse hops —
    * a well-defined (and therefore SQL-replayable, q118) output whether
    * or not the graph has converged; on a symmetric graph with
    * `rounds` ≥ diameter it IS connected components. This is the
    * bounded building block of the large/small-star CC fixpoint used
    * inside [[Dedup]]'s cluster collapse, exposed as a public operator.
    *
    * Scale shape: identical to [[pageRank]] — edges laid out once by
    * `src` (the per-round join key), each round shuffles only the
    * O(nodes) label table, min() is map-side combined. Returns
    * (node, label), persisted.
    *
    * ROUND RECURRENCE: the round is computed as
    * label_i(n) = min(n, min over in-neighbors m of label_{i-1}(m)) —
    * the node's OWN ID (the static seed), not its current label, joins
    * the aggregation. Equal to the textbook
    * min(label_{i-1}(n), min_m label_{i-1}(m)) by path-unrolling: both
    * sides equal min{ start id of any reverse path of length ≤ i ending
    * at n } (the own-id row covers length 0; a path of length 1..i
    * decomposes as last edge m→n plus a ≤ i−1 path to m). The point of
    * the static-seed form: the LABEL table enters each round's plan
    * exactly ONCE (the union seed is the separately-persisted node
    * table), so chaining K rounds lazily grows the plan LINEARLY in K —
    * the [[pageRank]] property — and intermediate rounds need no
    * materialization barrier. The previous own-label-union form read
    * `labels` twice per round (join input AND union seed), doubling the
    * lineage per lazy round, which forced one persist+count action —
    * i.e. one full driver-side job barrier — per round; round-17's
    * driver bench measured 70% of q118's 32-core wall in exactly that
    * per-round scheduling (8 cores beat 32 by 3.3×).
    *
    * `materializeEvery`: rounds between lineage-bounding
    * materializations, as in [[pageRank]] — the plan stays ≤ K joins
    * deep and the cached state O(nodes), while K rounds cost ONE
    * driver-side action instead of K.
    */
  def minLabelPropagation(edges: DataFrame, rounds: Int,
      materializeEvery: Int = 4): DataFrame = {
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
    require(materializeEvery >= 1,
      s"materializeEvery=$materializeEvery must be >= 1")
    // same one-shuffle edge layout as [[pageRank]]: partition by src,
    // dedup in place (hashpartitioning(src) clusters every (src,dst))
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
      .repartition(col("src")).dropDuplicates("src", "dst")
      .persist()
    e.count(): Unit // eager on purpose — see [[pageRank]]'s layout note
    // Unlike [[pageRank]], the seed table here must carry EVERY node's
    // own id (a dst-only node's id participates in its min), so the
    // full node set is required — but the src branch dedups
    // exchange-free inside the hashpartitioning(src) layout first, so
    // the union-distinct shuffles |V|+|E| rows instead of 2|E|.
    val nodes = e.select(col("src").as("node")).distinct()
      .union(e.select(col("dst").as("node"))).distinct().persist()

    var labels = nodes.withColumn("label", col("node"))
    var lastMat: Option[DataFrame] = None
    for (i <- 1 to rounds) {
      // one aggregation per round: min over (own id ∪ in-neighbor
      // labels) — the static own-id row seeds every node's group, so
      // no-in-edge nodes need no left-join stage, and the changing
      // label table feeds ONLY the join input (see the recurrence note
      // above). SHUFFLE_HASH on the label side — same reasoning as the
      // rank join in [[pageRank]], including the measured-and-rejected
      // broadcast alternative (strategy note there).
      val next = e.join(labels.hint("SHUFFLE_HASH")
          .withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), col("label"))
        .unionByName(nodes.withColumn("label", col("node")))
        .groupBy("node").agg(min("label").as("label"))
      if (i % materializeEvery == 0 || i == rounds) {
        val mat = next.persist()
        mat.count(): Unit
        lastMat.foreach(_.unpersist(blocking = false))
        lastMat = Some(mat)
        labels = mat
      } else labels = next
    }
    val out = labels
    e.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    out
  }
}
