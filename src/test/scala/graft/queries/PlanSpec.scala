package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Physical-plan regression tests — the properties that decide whether the
  * engine survives a 100×/1000× scale-up: filters and column pruning reach
  * the parquet scan, small dimensions broadcast (no fact-side shuffle),
  * top-k plans as TakeOrderedAndProject (no global sort materialization),
  * aggregates are partial (map-side combine) before the exchange.
  */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)

  test("q02: predicates and projection are pushed into the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("l_discount"), "discount filter not pushed")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), "shipdate not pushed")
    // pruned read schema: no unused lineitem columns fetched
    assert(!p.contains("l_returnflag"), "read schema not pruned")
  }

  test("q03/q04/q13: dimension joins broadcast (no fact-side shuffle)") {
    Seq("q03_join_topk", "q04_star_join", "q13_case_agg").foreach { q =>
      assert(plan(q).contains("BroadcastHashJoin"), s"$q lacks broadcast join")
    }
  }

  test("q09: global top-k plans as TakeOrderedAndProject") {
    assert(plan("q09_sort_limit").contains("TakeOrderedAndProject"))
  }

  test("q01: aggregation is partial before the exchange") {
    val p = plan("q01_agg_fullscan")
    val firstAgg = p.indexOf("HashAggregate")
    val lastAgg = p.lastIndexOf("HashAggregate")
    assert(firstAgg >= 0 && lastAgg > firstAgg,
      "expected partial+final HashAggregate pair")
  }

  test("q05/q06: semi/anti joins stay semi/anti in the physical plan") {
    assert(plan("q05_semi_join").contains("LeftSemi"))
    assert(plan("q06_anti_join").contains("LeftAnti"))
  }

  test("q46: as-of join is ONE exchange + window — no range join anywhere") {
    val p = plan("q46_asof_join")
    assert(p.contains("Window"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), "as-of fell into NLJ")
    assert(!p.contains("CartesianProduct"), "as-of fell into cartesian")
    // exactly one shuffle: the window partitioning on the key (tree nodes
    // print as "Exchange (n)"; details print "(n) Exchange" — count trees)
    val exchanges = "(?<!Broadcast)Exchange \\(\\d+\\)".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 shuffle exchange, plan:\n$p")
  }

  test("q47: range join executes as an equi-join on (key, bin)") {
    val p = plan("q47_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), "range join fell into NLJ")
    assert(!p.contains("CartesianProduct"), "range join fell into cartesian")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"), s"no hash/merge join in plan:\n$p")
  }

  test("q60: sequence export is ONE shuffle; rank<=10 prunes BEFORE it") {
    val p = plan("q60_event_sequences")
    // WindowGroupLimit BELOW the exchange = each task keeps only its local
    // top-10 per user before anything moves — the property that makes a
    // per-user sequence export survive a 100 TB event log. The tree
    // renders children below parents, so the partial (pre-shuffle)
    // WindowGroupLimit must appear at a LARGER index than the Exchange.
    val exchange = "(?<!Broadcast)Exchange \\(\\d+\\)".r.findAllMatchIn(p).toSeq
    assert(exchange.length == 1, s"expected 1 shuffle, plan:\n$p")
    val limits = "WindowGroupLimit".r.findAllMatchIn(p).toSeq
    assert(limits.exists(_.start > exchange.head.start),
      s"no WindowGroupLimit below (before) the exchange — rank<=10 no " +
        s"longer prunes pre-shuffle:\n$p")
  }

  test("q61: vocab head broadcasts; the token stream is never shuffled for membership") {
    val p = plan("q61_oov_rate")
    assert(p.contains("TakeOrderedAndProject"),
      "vocab cut should be TakeOrderedAndProject, not a global sort")
    assert(p.contains("BroadcastHashJoin"), "vocab membership join not broadcast")
    // shuffles: ONE for the vocab build's partial agg, ONE for the final
    // per-lang agg — none for the exploded token stream itself
    val exchanges = "(?<!Broadcast)Exchange \\(\\d+\\)".r.findAllIn(p).length
    assert(exchanges == 2, s"expected 2 shuffles (vocab agg + lang agg):\n$p")
  }

  test("q68: packing is ONE shuffle (the stratum window)") {
    val p = plan("q68_pack_sequences")
    val exchanges = "(?<!Broadcast)Exchange \\(\\d+\\)".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 shuffle exchange, plan:\n$p")
    assert(p.contains("Window"), p)
  }

  test("q69: incremental dedup never shuffles the corpus") {
    val p = plan("q69_incremental_dedup")
    // the corpus side must reach every join by broadcast: the only
    // allowed shuffle exchange is the delta-sized candidate distinct()
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    val exchanges = "(?<!Broadcast)Exchange \\(\\d+\\)".r.findAllIn(p).length
    assert(exchanges <= 1,
      s"corpus-scale shuffle crept into incremental dedup:\n$p")
  }

  test("q70: count-min sketch aggregates partially and broadcasts to probes") {
    val p = plan("q70_countmin")
    // corpus -> sketch is a partial+final HashAggregate pair (map-side
    // combine bounds the shuffle at d*w rows per partition)...
    val firstAgg = p.indexOf("HashAggregate")
    val lastAgg = p.lastIndexOf("HashAggregate")
    assert(firstAgg >= 0 && lastAgg > firstAgg, p)
    // ...and probing never shuffles the sketch
    assert(p.contains("BroadcastHashJoin"), s"sketch not broadcast:\n$p")
  }

  test("q71: bloom prefilter runs corpus-side before any join or shuffle") {
    val p = plan("q71_bloom_decontaminate")
    // the membership test is a plain Filter over the exploded gram stream
    // (codegen'd shift/mask over a literal array — no UDF, no shuffle)
    assert(p.contains("BroadcastHashJoin"), s"verify join not broadcast:\n$p")
    assert(!p.toLowerCase.contains("batchevalpython"), "python udf in plan")
    val exchanges = "(?<!Broadcast)Exchange \\(\\d+\\)".r.findAllIn(p).length
    // allowed shuffles: bench-gram distinct + final per-doc count — the
    // corpus gram stream itself must not appear in an exchange
    assert(exchanges <= 2, s"corpus gram shuffle crept in:\n$p")
  }

  test("q72: cdc compacts the delta with ONE shuffle; snapshot is never shuffled") {
    val p = plan("q72_cdc_upsert")
    // delta compaction = partial+final max_by pair; snapshot reaches the
    // anti-join by broadcast of the compacted (tiny) delta key set
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"), s"snapshot join not broadcast:\n$p")
    val exchanges = "(?<!Broadcast)Exchange \\(\\d+\\)".r.findAllIn(p).length
    assert(exchanges <= 2, s"snapshot-scale shuffle in CDC apply:\n$p")
  }

  test("q73: funnel is ONE shuffle (unordered collect_list, no window sort)") {
    val p = plan("q73_funnel")
    val exchanges = "(?<!Broadcast)Exchange \\(\\d+\\)".r.findAllIn(p).length
    assert(exchanges == 1, s"expected exactly the groupBy shuffle:\n$p")
    assert(!p.contains("Window"), "funnel must not pay a window sort")
  }

  test("q74: z-order top-k plans as TakeOrderedAndProject") {
    assert(plan("q74_zorder").contains("TakeOrderedAndProject"))
  }

  test("q78: salted join actually partitions on (key, salt)") {
    val p = plan("q78_salted_join")
    assert(p.contains("__salt"),
      s"salt column absent — hot keys would still funnel to one task:\n$p")
  }

  test("q80: grouping sets plan through Expand (one scan, no self-union)") {
    val p = plan("q80_grouping_sets")
    assert(p.contains("Expand"), s"expected Expand-based grouping sets:\n$p")
    // formatted explain lists each node twice (tree + details): one scan = 2
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans <= 2, s"grouping sets should scan orders once, saw $scans/2")
  }

  test("q93: bucket table broadcasts; the token stream is never shuffled for the lookup") {
    val p = plan("q93_lm_quality")
    assert(p.contains("BroadcastHashJoin"),
      s"frequency-bucket lookup not broadcast:\n$p")
    // ONE shuffle for the vocabulary frequency agg, ONE for the per-doc
    // agg — the exploded token stream itself never moves
    val exchanges = "(?<!Broadcast)Exchange \\(\\d+\\)".r.findAllIn(p).length
    assert(exchanges <= 2, s"token-stream shuffle crept in:\n$p")
  }

  test("q89: SCD-2 point-in-time join stays window-shaped (no range join)") {
    val p = plan("q89_scd2_pit_join")
    assert(p.contains("Window"), s"as-of window missing:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), "PIT fell into NLJ")
    assert(!p.contains("CartesianProduct"), "PIT fell into cartesian")
  }

  test("AQE skew join: a planted hot key is split at runtime (skew=true)") {
    // the runtime complement to q78's manual salting: when stats ARE
    // visible to AQE (storage-level skew, not mid-stage explosions), the
    // engine itself must split the straggler partition
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    s2.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    import org.apache.spark.sql.functions.{col, lit, when}
    // 200k rows on ONE key + a uniform tail; right side is tiny per key
    val left = s2.range(220000).select(
      when(col("id") < 200000, lit(1L)).otherwise(col("id")).as("k"),
      col("id").as("v"))
    val right = s2.range(20000).select(col("id").as("k"),
      (col("id") * 2).as("w"))
    val joined = left.join(right, "k")
    // k=1 matches its single right row 200k times; tail keys ≥ 200000
    // have no right match. Drive THIS queryExecution (count() would plan
    // a separate one and leave this AQE plan un-finalized)
    assert(joined.queryExecution.toRdd.count() == 200000L,
      "unexpected join cardinality")
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("skew=true"),
      s"AQE did not mark the hot partition as skewed:\n${p.take(2000)}")
  }

  test("lake export: a partition-column filter prunes, not scans") {
    val dir = java.nio.file.Files.createTempDirectory("lake_planspec")
      .resolve("docs").toString
    graft.sinks.Lake.writePartitioned(
      graft.Tables.documents(spark, sf), dir, "lang")
    val filtered = graft.sinks.Lake.read(spark, dir)
      .filter(org.apache.spark.sql.functions.col("lang") === "en")
    val p = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PartitionFilters: [isnotnull(lang") ||
      p.contains("PartitionFilters: [(lang"),
      s"lang filter did not become a partition filter:\n$p")
    // and the filter is NOT a post-scan data filter on a read column
    assert(!p.contains("PushedFilters: [IsNotNull(lang"),
      "lang treated as a data column, not a partition column")
  }

  test("q81: bucketed join's only exchange is the final 3-group agg") {
    val s2 = spark.newSession()
    // disable broadcast so the plan shows the 100 TB shape: the bucket
    // layout, not AQE's small-SF broadcast, must make the join local
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val p = SparkEntry.queries("q81_bucketed_join")(s2, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
      !p.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed q81 join still shuffles a fact side:\n$p")
    val exchanges = "(?<!Broadcast)Exchange \\(\\d+\\)".r.findAllIn(p).length
    assert(exchanges == 1,
      s"expected only the o_orderstatus agg exchange:\n$p")
    // (the per-side Sorts stay: Spark 3+ scans don't propagate bucket sort
    // order by default — they're bucket-LOCAL, no exchange, cheap; the
    // property that matters at 100 TB is the absent join shuffle above)
  }

  test("bucketed co-located join: no shuffle exchange on either side") {
    // the 100 TB pattern: pre-bucket both fact tables on the join key ->
    // repeated joins are exchange-free (only broadcast of tiny dims would
    // appear; here neither side shuffles at all)
    val s2 = spark.newSession()
    // at sf0.001 every table broadcasts; disable that so the plan shows
    // what matters at 100 TB — the bucket-aligned sort-merge join
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s2.sql("DROP TABLE IF EXISTS orders_b")
    s2.sql("DROP TABLE IF EXISTS customer_b")
    // stale dirs from an aborted run survive a fresh catalog
    Seq("orders_b", "customer_b").foreach { t =>
      val dir = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(dir)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    graft.Tables.orders(s2, sf)
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_b")
    graft.Tables.customer(s2, sf)
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_b")
    val joined = s2.table("orders_b").join(s2.table("customer_b"),
      org.apache.spark.sql.functions.col("o_custkey") ===
        org.apache.spark.sql.functions.col("c_custkey"))
      .groupBy("c_mktsegment")
      .count()
    val p = joined.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val shuffleBeforeAgg = p.split("HashAggregate").head
    assert(p.contains("SortMergeJoin"), p)
    assert(!shuffleBeforeAgg.contains("Exchange hashpartitioning(o_custkey") &&
      !shuffleBeforeAgg.contains("Exchange hashpartitioning(c_custkey"),
      s"bucketed join still shuffles:\n$p")
    // result parity with the unbucketed join
    val expect = graft.Tables.orders(s2, sf).join(
        graft.Tables.customer(s2, sf),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .groupBy("c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
    s2.sql("DROP TABLE IF EXISTS orders_b")
    s2.sql("DROP TABLE IF EXISTS customer_b")
  }

  test("q115: k-means assignment is a map-only pass (no exchange, native kernel)") {
    // the corpus is never shuffled for assignment: centroids travel to the
    // data as a packed broadcast literal, and the per-row argmin is ONE
    // static-invoke kernel call — at 100 TB the only cost is the scan
    val p = plan("q115_kmeans_fixedpoint")
    assert(!p.contains("Exchange"),
      s"k-means assignment shuffled the corpus:\n$p")
    assert(!p.contains("Window") && !p.contains("Sort ("),
      s"k-means assignment sorts:\n$p")
    assert(p.contains("nearestCentroidL2"),
      s"assignment is not the packed-matrix kernel:\n$p")
    assert("Scan parquet".r.findAllIn(p).length == 2, // tree + detail entry
      s"expected exactly one corpus scan:\n$p")
  }

  test("q119: top-k heap aggregate combines map-side (partial before the exchange)") {
    // the shuffle carries at most k pairs per (group, mapper), not the
    // row set — the window form this replaces sorts EVERY group's full
    // rows through the exchange
    val p = plan("q119_topk_agg")
    assert(p.contains("partial_topk_pairs"),
      s"heap aggregate is not map-side combined:\n$p")
    assert(!p.contains("Window"),
      s"q119 fell back to a window sort:\n$p")
    val partialAt = p.indexOf("partial_topk_pairs")
    val exchangeAt = p.indexOf("hashpartitioning(l_suppkey")
    assert(partialAt >= 0 && exchangeAt >= 0 && partialAt < exchangeAt,
      s"partial heap does not precede the l_suppkey exchange:\n$p")
  }

  test("q140: exact decontamination broadcasts both the bench grams and the hits") {
    val p = plan("q140_decontaminate")
    // corpus grams flow map-side into a broadcast LEFT-SEMI; the flag
    // join back onto the corpus broadcasts the hit table — the corpus
    // itself is never exchanged
    assert(p.contains("LeftSemi"), s"gram membership not a semi join:\n$p")
    val bhj = "BroadcastHashJoin".r.findAllIn(p).length
    assert(bhj >= 2, s"expected 2 broadcast joins (semi + flag):\n$p")
    val exchanges = "(?<!Broadcast)Exchange \\(\\d+\\)".r.findAllIn(p).length
    // allowed shuffles: bench-gram distinct + per-doc hit count
    assert(exchanges <= 2, s"corpus-scale shuffle crept in:\n$p")
  }

  test("q141: repetition stats are a pure projection — zero shuffles") {
    val p = plan("q141_repetition_filters")
    val exchanges = "(?<!Broadcast)Exchange \\(\\d+\\)".r.findAllIn(p).length
    assert(exchanges == 0, s"doc-local stat shuffled:\n$p")
    assert(!p.contains("Generate"), s"kernel replaced by an explode:\n$p")
    // FormattedMode marks whole-stage-codegen'd operators with
    // "[codegen id : N]" rather than the word WholeStageCodegen
    assert(p.contains("[codegen id :"), s"projection not codegen'd:\n$p")
  }

  test("q149: length-bucketed batching is ONE shuffle with a 2-column scan") {
    val p = plan("q149_length_batches")
    val exchanges = "(?<!Broadcast)Exchange \\(\\d+\\)".r.findAllIn(p).length
    assert(exchanges == 1, s"expected exactly the bucket exchange:\n$p")
    // only (doc_id, n_chars) leave the scan — never the text
    assert(p.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"),
      s"read schema not pruned to the two batching columns:\n$p")
  }

  test("q150: DSIR selection plans as TakeOrderedAndProject (k-heap per task)") {
    val p = plan("q150_dsir_resample")
    assert(p.contains("TakeOrderedAndProject"),
      s"Gumbel top-k fell into a global sort:\n$p")
    // scoring is map-side through the dense weight literal: no join,
    // no aggregation exchange anywhere in the scoring pass
    assert(!p.contains("Join"), s"scoring pass joined:\n$p")
    val exchanges = "(?<!Broadcast)Exchange \\(\\d+\\)".r.findAllIn(p).length
    assert(exchanges == 0, s"scoring pass shuffled:\n$p")
  }

  test("q151: grouped split is a pure projection — zero shuffles, zero joins") {
    val p = plan("q151_grouped_split")
    val exchanges = "(?<!Broadcast)Exchange \\(\\d+\\)".r.findAllIn(p).length
    assert(exchanges == 0 && !p.contains("Join"),
      s"split decision must be a map-side projection:\n$p")
  }

  test("q154: centroids broadcast back; exactly 2 group-sized shuffles; heap top-k partial") {
    val p = plan("q154_centroid_outliers")
    // member scoring joins the corpus to the centroid table by BROADCAST
    // — the corpus is never exchanged for the join
    assert(p.contains("BroadcastHashJoin"), s"centroid join not broadcast:\n$p")
    // allowed shuffles: the centroid aggregate + the top-k aggregate,
    // both one row per (group × partition)
    val exchanges = "(?<!Broadcast)Exchange \\(\\d+\\)".r.findAllIn(p).length
    assert(exchanges == 2, s"corpus-scale shuffle crept in:\n$p")
    assert(p.contains("partial_topk_pairs"),
      s"top-k heap must combine map-side before the exchange:\n$p")
    assert(!p.contains("Window"), s"outlier rank fell into a window sort:\n$p")
  }

  test("q155: contamination report never shuffles the corpus") {
    val p = plan("q155_contamination_report")
    // hit resolution and the report join ride broadcasts; allowed
    // shuffles: source totals, bench-gram distinct, per-doc hit count,
    // per-source contaminated count — all group/hit-sized
    assert(!p.contains("SortMergeJoin"), s"corpus-side shuffle join:\n$p")
    val exchanges = "(?<!Broadcast)Exchange \\(\\d+\\)".r.findAllIn(p).length
    assert(exchanges <= 4, s"corpus-scale shuffle crept in:\n$p")
  }

  test("q156: novelty runs the bloom prefilter before the exact-verify join") {
    val p = plan("q156_ngram_novelty")
    // the bloom membership test is a codegen'd shift/mask Filter over a
    // literal word array — batch grams that miss never reach the join
    assert(p.contains("shiftright(element_at("),
      s"bloom prefilter missing from the plan:\n$p")
    assert(!p.toLowerCase.contains("batchevalpython"), "python udf in plan")
    // allowed shuffles: per-doc totals, ref-gram distinct, per-doc seen
    // count (the exact-verify join itself is free to go SMJ at scale)
    val exchanges = "(?<!Broadcast)Exchange \\(\\d+\\)".r.findAllIn(p).length
    assert(exchanges <= 3, s"unexpected extra shuffle:\n$p")
  }

  test("q159: line dedup reuses the (line, doc) reduction instead of re-exploding") {
    // ReuseExchange fires at physical planning with AQE off (with AQE
    // on the same dedup happens in the runtime stage cache, invisible
    // to a static explain) — pin the non-adaptive plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = plan("q159_line_dedup")
      assert(p.contains("ReusedExchange"),
        s"perDoc reduction not shared across consumers:\n$p")
      val explodes = "Generate \\(\\d+\\)".r.findAllIn(p).length
      assert(explodes <= 2, s"line stream re-derived per consumer:\n$p")
      assert(!p.contains("Window"), s"winner rule fell into a window:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q160: winnowed run pairs — candidates broadcast into the verify joins, no window, no cartesian") {
    val p = plan("q160_winnowed_runs")
    val bhj = "BroadcastHashJoin".r.findAllIn(p).length
    assert(bhj >= 3, s"guard anti-join + 2 verify joins should broadcast:\n$p")
    assert(p.contains("LeftAnti"), s"hot-fingerprint guard missing:\n$p")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      s"winnowing fell into a window/cartesian:\n$p")
  }

  test("q161: rare-sequence screen is two linear aggregates, no window over the gram stream") {
    val p = plan("q161_rare_sequences")
    assert(!p.contains("Window"), s"df computed via a corpus window:\n$p")
    val exchanges = "(?<!Broadcast)Exchange \\(\\d+\\)".r.findAllIn(p).length
    // df aggregate + per-doc rollup (+ the gram-key join exchange at
    // scale); at sf0.001 the join side broadcasts
    assert(exchanges <= 3, s"unexpected extra shuffle:\n$p")
    val firstAgg = p.indexOf("HashAggregate")
    val lastAgg = p.lastIndexOf("HashAggregate")
    assert(firstAgg >= 0 && lastAgg > firstAgg,
      "expected partial+final aggregate pairs")
  }

  test("q165: temperature shares — ONE corpus scan, count shuffle + domain-cardinality window") {
    val p = plan("q165_temp_shares")
    // count the "(n) Scan parquet" detail entries — the tree line and
    // its detail header would double-count each scan
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"totals branch re-scanned the corpus:\n$p")
    val exchanges = "(?<!Broadcast)Exchange \\(\\d+\\)".r.findAllIn(p).length
    // the per-domain count's exchange + the single-partition window
    // exchange over the domain-cardinality counts frame
    assert(exchanges <= 2, s"extra shuffle:\n$p")
    val firstAgg = p.indexOf("HashAggregate")
    val lastAgg = p.lastIndexOf("HashAggregate")
    assert(firstAgg >= 0 && lastAgg > firstAgg,
      "count not partial-combined before the exchange")
  }

  test("q166: centroid drift — two partial-combined centroid aggs, no window, no corpus-row join") {
    val p = plan("q166_centroid_drift")
    assert(!p.contains("Window"), s"drift fell into a window:\n$p")
    assert(p.contains("FullOuter") || p.contains("full_outer"),
      s"one-sided vintages must survive (full outer join):\n$p")
    // the join runs on GROUP-cardinality frames: every HashAggregate
    // pairs partial+final, so only dim+1 longs per group reach any
    // exchange — never corpus rows
    val aggs = "HashAggregate".r.findAllIn(p).length
    assert(aggs >= 4, s"expected partial+final pairs per vintage:\n$p")
  }

  test("q167: distribution drift — windowless ECDFs, partial-combined, full-outer survives") {
    val p = plan("q167_dist_drift")
    assert(!p.contains("Window"), s"ECDF fell into a window sort:\n$p")
    assert(p.contains("FullOuter") || p.contains("full_outer"),
      s"one-sided groups must survive:\n$p")
    val aggs = "HashAggregate".r.findAllIn(p).length
    assert(aggs >= 4, s"expected partial+final ECDF agg pairs:\n$p")
  }

  test("q168: quota selection — heap aggregate, no per-domain window sort, broadcast quota trim") {
    val p = plan("q168_quota_select")
    // exactly ONE Window: q165's domain-cardinality totals window
    // inside the broadcast quota branch — the CORPUS ranking itself
    // must ride the bounded heap, never a per-domain window sort
    val windows = "Window \\(\\d+\\)".r.findAllIn(p).length
    assert(windows == 1, s"corpus ranking fell into a window sort:\n$p")
    assert(p.contains("ObjectHashAggregate"),
      s"bounded-heap rank missing:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"quota table not broadcast:\n$p")
  }

  test("q158: keepBest is ONE shuffle — partial+final argmax, no window") {
    val p = plan("q158_keepbest_dedup")
    val exchanges = "(?<!Broadcast)Exchange \\(\\d+\\)".r.findAllIn(p).length
    assert(exchanges == 1, s"policy dedup must shuffle once:\n$p")
    // struct max falls to SortAggregate — it must still be the
    // partial+final pair (map-side combine), never a global window
    val aggs = "SortAggregate".r.findAllIn(p).length
    assert(aggs >= 2, s"argmax not partial-combined before the exchange:\n$p")
    assert(!p.contains("Window"), s"keepBest fell into a window sort:\n$p")
  }
}
