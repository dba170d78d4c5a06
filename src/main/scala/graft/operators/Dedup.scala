package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{SimHash, Text}

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard.
  *
  * Scale design (100 TB):
  *  - exact dedup groups on a 128-bit content hash, so the shuffle carries
  *    (hash, id) pairs — never document bodies;
  *  - MinHash signatures are computed row-locally with higher-order
  *    functions (no explode of shingles); only (band, bandHash, id) tuples
  *    — a few dozen bytes per doc — are exploded and shuffled for LSH
  *    bucketing. Candidate verification joins the (small) candidate-pair
  *    set back to the shingle sets, not all-pairs;
  *  - SimHash is one 64-bit sketch per doc; banding shuffles (band16, id).
  */
object Dedup {

  /** Exact dedup: one survivor (min id) per identical content. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Policy-driven exact dedup — [[exact]]'s keep-the-smallest-id rule
    * replaced by an explicit REPRESENTATIVE POLICY: within each
    * exact-content group, keep the copy that ranks first under the
    * caller's preference columns (descending), ids breaking ties
    * ascending. This is the production form of exact dedup — pipelines
    * keep the best-scored / freshest / canonical-source copy, not the
    * accidental minimum id (the metadata of the kept copy propagates
    * downstream, so which copy survives matters even though the text is
    * identical). Output: (content_hash, keep_id, n_copies).
    *
    * Scale shape: identical to [[exact]] — ONE map-side-combined shuffle
    * on the content hash. The argmax rides a single `max(struct(...))`
    * aggregate (preference columns, then the NEGATED id so ascending-id
    * tie-break survives the max); struct max plans as a partial+final
    * SortAggregate pair (a struct buffer can't hash-aggregate), so the
    * cost over [[exact]] is a partition-LOCAL pre-combine sort — the
    * exchange still carries one row per (group × partition), never the
    * corpus, and there is no global window sort or second pass.
    */
  def keepBest(df: DataFrame, idCol: String, textCol: String,
      prefer: Seq[Column]): DataFrame = {
    require(prefer.nonEmpty, "keepBest needs at least one preference column")
    // the negated-id tie-break is numeric arithmetic; a string id would
    // silently cast to double (NULL for non-numeric ids) — fail loudly
    val idType = df.select(col(idCol)).schema.head.dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"keepBest needs a numeric id column for its tie-break; " +
        s"'$idCol' is $idType (use exact() or pre-map the id)")
    val ranked = struct(
      prefer.map(c => c) :+ (-col(idCol)).as("neg_id"): _*)
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(max(ranked).as("best"), count(lit(1)).as("n_copies"))
      .select(col("content_hash"),
        (-col("best.neg_id")).as("keep_id"), col("n_copies"))
  }

  /** Duplication-mass profile — the governance histogram curation
    * papers report before deciding dedup policy (cf. Raffel et al.
    * 2020 §2.2's duplication analysis; Lee et al. 2022 §4's dup-count
    * distributions): for each exact-duplicate group SIZE, how many
    * groups have it and how much document mass they carry, plus the
    * removable mass (all but one survivor per group). Answers "is
    * duplication a long tail of pairs or a few huge families" — which
    * decides whether exact dedup alone recovers most of the budget.
    * Output: (n_copies, n_groups, n_docs, n_removable), one row per
    * distinct group size including 1 (the unduplicated mass line).
    *
    * Scale shape: [[exact]]'s one content-hash shuffle, then a
    * map-side-combined rollup on the group size — the second exchange
    * carries one row per DISTINCT SIZE (dozens), and nothing anywhere
    * is proportional to duplication.
    */
  def duplicationProfile(df: DataFrame, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"))
      .groupBy(col("n_copies"))
      .agg(count(lit(1)).as("n_groups"),
        (count(lit(1)) * col("n_copies")).as("n_docs"),
        (count(lit(1)) * (col("n_copies") - 1)).as("n_removable"))

  /** Global LINE-level dedup + boilerplate-line removal — the C4 rule
    * (Raffel et al. 2020, arXiv:1910.10683 §2.2: "we discarded all but
    * one of any three-sentence span occurring more than once") at line
    * granularity, plus the boilerplate complement: a line appearing in
    * more than `maxDocFreq` distinct documents (cookie banners, nav
    * headers, subscribe prompts) is dropped from EVERY document,
    * including its first occurrence. Each surviving distinct line is
    * kept exactly once corpus-wide — at its first occurrence under
    * (id ASC, position ASC) — and every document is reassembled from
    * its kept lines in original order. Output: (idCol, clean_text,
    * n_lines, n_kept) for EVERY input document (fully-boilerplate docs
    * come back with clean_text = "" and n_kept = 0 — the visibility a
    * curation report needs). Ids are cast to long (the first-occurrence
    * order is numeric).
    *
    * Scale shape (100 TB): line occurrences reduce ONCE to one row per
    * (line, doc) — earliest in-doc position plus an occurrence count —
    * in a map-side-combined hash aggregate, and every downstream
    * consumer (per-line winner/doc-freq stats, the keep join, per-doc
    * occurrence totals) reads that reduction, never the raw line
    * stream: the three uses share an identical exchange subtree, so
    * ReuseExchange materializes the explode + (line, doc) shuffle once
    * instead of re-scanning the corpus per consumer. The winner pass
    * shuffles one row per distinct line; the keep decision joins the
    * reduction to per-line stats on the line itself — exact, no
    * hash-collision risk — and reassembly is ONE groupBy(id) with an
    * in-group array sort (never a window over the corpus). Nothing is
    * collected; every shuffle is linear in distinct (line, doc) pairs
    * or docs.
    */
  def lineDedup(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n", maxDocFreq: Long = Long.MaxValue): DataFrame = {
    val lines = df.select(col(idCol).cast("long").as("id"),
        posexplode(split(col(textCol),
          java.util.regex.Pattern.quote(sep))))
      .select(col("id"), col("pos").cast("long").as("pos"),
        col("col").as("line"))
    // the single occurrence-level reduction everything else reads
    val perDoc = lines.groupBy(col("line"), col("id"))
      .agg(min(col("pos")).as("minpos"), count(lit(1)).as("cnt"))
    // per-line winner (smallest id, then its earliest position) and
    // doc frequency — count(1) over the already doc-distinct rows
    val stats = perDoc.groupBy(col("line"))
      .agg(min(struct(col("id"), col("minpos"))).as("win"),
        count(lit(1)).as("doc_df"))
    val kept = perDoc.join(stats, Seq("line"))
      .filter(col("id") === col("win.id") &&
        col("minpos") === col("win.minpos") &&
        col("doc_df") <= maxDocFreq)
      .select(col("id"), col("minpos").as("pos"), col("line"))
    val rebuilt = kept.groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("line"))))
        .as("ps"), count(lit(1)).as("n_kept"))
      .select(col("id"),
        array_join(transform(col("ps"), _.getField("line")), sep)
          .as("clean_text"),
        col("n_kept"))
    val totals = perDoc.groupBy(col("id"))
      .agg(sum(col("cnt")).as("n_lines"))
    totals.join(rebuilt, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_lines"), coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Winnowed verbatim-run detection (Schleimer et al. 2003 — the MOSS
    * fingerprinting scheme): all document pairs sharing at least one
    * verbatim run of t = w+k−1 tokens, with the count of distinct
    * shared t-grams. Candidates come from winnowing-fingerprint
    * collisions — by the winnowing guarantee every qualifying pair
    * collides, while only ~2/(w+1) of gram positions are ever emitted —
    * and every candidate is exactly verified on the t-gram STRING sets,
    * so hash collisions vanish and the output equals the exact t-gram
    * self-join byte-for-byte. Output: (id_a, id_b, n_shared_runs) with
    * id_a < id_b.
    *
    * Scale shape (100 TB): the self-join runs on the winnowed
    * fingerprint stream (a ~2/(w+1) sample of gram positions, each one
    * (id, hash) row), never the full gram stream — the same report via
    * a raw t-gram self-join ships every gram of every doc into the
    * shuffle. Fingerprints in more than `maxDocFreq` docs are dropped
    * before the self-join (the [[sharedSpanPairs]] boilerplate rule and
    * the quadratic-fanout guard in one — runs whose every fingerprint
    * is ubiquitous are template text, not plagiarism).
    *
    * The verify strategy is MEASURED, not assumed: candidate-pair
    * volume is proportional to REAL duplication in the corpus, so on
    * the adversarial case this operator exists for (a crawl where a
    * large fraction of docs have verbatim twins) candidates ≈
    * O(corpus) and a mandatory broadcast — of pairs, and worse of
    * candidate docs CARRYING their full t-gram string sets — would
    * die on the first real run. The candidate set is therefore
    * persisted and counted (it is consumed twice either way), and the
    * verify joins broadcast only when the count is at most
    * `broadcastCandLimit`; above it they fall back to shuffled joins
    * keyed on the candidate ids — linear in candidates + candidate
    * docs, no single-node materialization anywhere (the same
    * measured-guard discipline as [[minhashLsh]]'s hot-bucket star).
    * Both strategies produce identical output (HeavyDupSpec pins it).
    */
  def winnowedRunPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 5,
      maxDocFreq: Long = 4096L,
      broadcastCandLimit: Long = 2000000L): DataFrame = {
    require(k >= 1 && w >= 1, s"k=$k and w=$w must be >= 1")
    val t = w + k - 1
    val toks = Text.tokens(col(textCol))
    // the tokenize→winnow→shingle projection is the expensive pass and
    // FIVE consumers read it (df guard, both self-join sides, both
    // verify sides) — persisted once, the minhashLsh `base` discipline;
    // the scored harness releases operator persists between queries
    val docs = df.select(col(idCol).cast("long").as("id"),
        graft.functions.ArrayOps.winnow(toks, k, w).as("fp"),
        array_distinct(Text.shingles(toks, t)).as("runs"))
      .filter(size(col("runs")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fp = docs.select(col("id"), explode(col("fp")).as("f"))
    // boilerplate/fanout guard: one map-side-combined df aggregate; the
    // surviving fingerprint stream self-joins on the hash value. The
    // broadcast guard frame is single longs bounded by construction at
    // (total fingerprint occurrences)/maxDocFreq — hotness requires
    // >maxDocFreq carriers each — the hot-bucket-star bound class;
    // corpora pathological enough to break THAT bound break on the
    // candidate set first, which the gate below measures.
    val fpDf = fp.groupBy(col("f")).agg(count(lit(1)).as("fdf"))
      .filter(col("fdf") > maxDocFreq)
    val kept = fp.join(broadcast(fpDf.select(col("f"))), Seq("f"),
      "left_anti")
    val cand = kept.as("x").join(kept.as("y"),
        col("x.f") === col("y.f") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // exact verify on t-gram strings — strategy picked by MEASURING the
    // candidate set (it feeds both verify joins, so the persist+count
    // costs one action, not a second self-join). Small candidate sets
    // (normal corpora: bounded real duplication) broadcast, so the
    // gram-set-laden doc rows never shuffle; a heavy-duplication corpus
    // falls back to shuffled joins on the candidate ids, where broadcast
    // of O(corpus) pairs — and then of candidate docs carrying their
    // t-gram sets — would exceed any broadcast budget.
    val nCand = cand.count()
    val runsA = docs.select(col("id").as("id_a"), col("runs").as("runs_a"))
    val runsB = docs.select(col("id").as("id_b"), col("runs").as("runs_b"))
    val verified =
      if (nCand <= broadcastCandLimit) {
        val withA = runsA.join(broadcast(cand), Seq("id_a"))
        runsB.join(broadcast(withA), Seq("id_b"))
      } else {
        // shuffle path: pin SORT-MERGE on both joins — the planner's
        // stats can estimate the candidate frame small enough to
        // broadcast even when the measured count says otherwise, and a
        // shuffled-hash build over gram-set-laden doc rows has its own
        // memory exposure; SMJ is the strategy that degrades gracefully
        val withA = runsA.join(cand.hint("merge"), Seq("id_a"))
        runsB.join(withA.hint("merge"), Seq("id_b"))
      }
    verified
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("runs_a"), col("runs_b")))
          .cast("long").as("n_shared_runs"))
      .filter(col("n_shared_runs") > 0)
  }

  /** Cross-source duplication matrix — the data-governance report
    * behind corpus curation: for every pair of sources, how many
    * distinct duplicated documents (exact-content groups with ≥ 2
    * copies) both sources carry. This is how a pipeline answers "which
    * crawls/aggregators republish each other" before deciding dedup
    * priority order. Output: (source_a, source_b, n_shared_groups)
    * with source_a < source_b; NULL-source docs are excluded (no
    * provenance, no pair).
    *
    * Scale shape: ONE shuffle on the content hash (exactly [[exact]]'s
    * cost); each group then carries a collect_set of its sources —
    * bounded by SOURCE CARDINALITY, not group size — and the pair
    * explode is ≤ S² rows per group. Callers with a high-cardinality
    * source column (URLs) should pre-map it to its governance granule
    * (domain/crawl) first; the matrix is only meaningful at that
    * granularity anyway. That contract is ENFORCED, not advised: any
    * group collecting more than `maxSources` distinct sources fails
    * the job loudly with a named error (a per-group `raise_error` —
    * zero extra shuffle, zero cost on conforming input) instead of
    * silently fanning out an S² explode; the offending group's set
    * does materialize once in its agg buffer before the error fires,
    * so the guard bounds the EXPLODE and names the misuse rather than
    * capping collect_set itself. `maxSources` defaults to 10k: far
    * above any domain/crawl-granule registry, far below the URL
    * cardinality the guard exists to reject.
    */
  def crossSourceDupMatrix(df: DataFrame, idCol: String, textCol: String,
      srcCol: String, maxSources: Int = 10000): DataFrame = {
    val g = df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(collect_set(col(srcCol)).as("srcs"),
        count(lit(1)).as("n_copies"))
      .filter(col("n_copies") >= 2)
      .withColumn("srcs",
        when(size(col("srcs")) > maxSources,
          raise_error(lit("crossSourceDupMatrix: a duplicate " +
            s"group carries > $maxSources distinct sources — srcCol " +
            s"'$srcCol' looks like URL-granularity provenance; pre-map " +
            "it to its governance granule (domain/crawl) first"))
            .cast(org.apache.spark.sql.types.ArrayType(
              df.schema(srcCol).dataType).sql))
          .otherwise(col("srcs")))
    g.select(explode(col("srcs")).as("source_a"), col("srcs"))
      .select(col("source_a"), explode(col("srcs")).as("source_b"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_shared_groups"))
  }

  /** Deterministic MinHash permutation parameters (seeded). Coefficients
    * stay below 2^31 so `a*x+b` with a 31-bit-reduced shingle hash fits a
    * long under ANSI overflow checking (a·x + b < 2^62 + 2^31).
    */
  private def perms(k: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(k)(((math.abs(rnd.nextLong()) % Mersenne31) | 1L,
      math.abs(rnd.nextLong()) % Mersenne31))
  }
  private val Mersenne31 = (1L << 31) - 1

  /** MinHash signature over a shingle-array column: array<long> of k
    * per-permutation minima, all computed row-locally. The base shingle
    * hash is computed ONCE (not once per permutation) — permutations are
    * affine transforms of the 31-bit-reduced base hashes.
    */
  def minhashSignature(shingleSets: Column, k: Int = 32,
      seed: Long = 42L): Column =
    minhashFromHashes(baseHashes(shingleSets), k, seed)

  /** 31-bit-reduced base hashes of a shingle set (compute once, feed to
    * [[minhashFromHashes]] — Catalyst CSE across 32 nested lambdas is not
    * guaranteed, so callers materialize this as its own column).
    */
  def baseHashes(shingleSets: Column): Column =
    transform(shingleSets, s => pmod(xxhash64(s), lit(Mersenne31)))

  def minhashFromHashes(hashes: Column, k: Int = 32,
      seed: Long = 42L): Column = {
    val ps = perms(k, seed)
    array(ps.map { case (a, b) =>
      coalesce(
        array_min(transform(hashes,
          h => pmod(h * a + b, lit(Mersenne31)))),
        lit(Mersenne31)) // empty shingle set → sentinel
    }: _*)
  }

  /** Candidate near-duplicate pairs via banded LSH over the signature, then
    * exact shingle-Jaccard verification (over 64-bit shingle hashes — equal
    * to string-set Jaccard up to negligible collision probability).
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    *
    * The compact per-doc projection (id, sorted hash set, signature) is
    * persisted (memory-then-disk) because three plan branches reuse it
    * (band explode + both sides of the verification join); recomputing it
    * would re-shingle the corpus 4×. At 100 TB this projection is ~1-2% of
    * corpus bytes and spills cleanly.
    *
    * Hot-bucket guard: a real crawl's template spam can land millions of
    * near-identical docs in ONE (band, bandHash) bucket, and the bucket
    * self-join then emits O(B²) candidates — the one scale-killer in a
    * banded LSH join. Buckets larger than `maxBucketSize` therefore emit
    * STAR candidates (bucket-min id, other) instead of all pairs: for
    * dedup the candidates feed [[clusters]] (connectivity, not all-pairs
    * enumeration), and a star rooted at the bucket minimum keeps every
    * member reachable while cutting candidates to O(B). Buckets at or
    * below the cap keep exact all-pairs semantics, so the verified pair
    * set on non-adversarial corpora is unchanged. Trade-off (documented):
    * if an oversized bucket mixes several distinct near-dup families
    * (band collision), star pairs rooted outside a family fail Jaccard
    * verification and that family's edges are lost for this band — each
    * of the other `bands-1` bands still gets an independent shot, which
    * is the standard recall argument banding already rests on.
    *
    * The guard is fully LAZY: the returned DataFrame always carries the
    * anti-join + star shape, and no Spark job runs until the caller
    * acts. When no bucket is hot the guard degenerates to a broadcast
    * anti-join against an EMPTY set (a streamed pass-through) plus an
    * empty star side — near-zero cost — while the hot aggregate itself
    * is persisted so its two consumers (anti-join, star join) compute it
    * once. Construction stays cheap however many frames a caller builds
    * up front, and the guard decision binds to the data as of
    * EXECUTION, not construction. The same shape applies to
    * [[simhashPairs]] and [[embeddingNearDups]].
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 32, bands: Int = 8,
      threshold: Double = 0.5, maxBucketSize: Int = 4096): DataFrame = {
    val sets = df.select(
      col(idCol).as("id"),
      graft.functions.ArrayOps.ngramHashes(
        Text.tokens(col(textCol)), shingleN).as("hset"))
      // shingle-less docs (< n tokens) can never clear a Jaccard threshold
      // (empty union → 0.0), but they all share the sentinel signature and
      // would band-collide into one quadratic bucket — drop them up front
      .filter(size(col("hset")) > 0)

    // threshold >= 1.0 asks for EXACT duplicates only (Jaccard 1.0 ⇔
    // set-equal shingles): banded LSH is overkill — every qualifying pair
    // shares the whole signature, so grouping on the shingle set itself
    // finds all groups in ONE shuffle with no self-join, no banding, no
    // hot-bucket machinery. Grouping on the full hset (not a re-hash of
    // it) adds zero collision exposure beyond the 64-bit shingle kernel
    // the fractional path already rests on. Oversized groups (template
    // spam) emit the same O(B) star edges as the banded path's guard.
    // SEMANTICS: threshold 1.0 means STRICT shingle-set equality. The
    // fractional path verifies with Jaccard rounded HALF_UP to 6
    // decimals, so a pair whose true Jaccard is in [0.9999995, 1) —
    // multi-million-shingle docs differing by one shingle — would pass a
    // banded `>= 1.0` filter but is NOT an exact duplicate and is
    // excluded here; that is the contract callers asking for 1.0 want.
    if (threshold >= 1.0) return minhashExactDups(sets, maxBucketSize)

    val rowsPerBand = k / bands
    val base = sets
      .withColumn("sig", graft.functions.ArrayOps.minhash(col("hset"), k))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val banded = base.select(
      col("id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          hash(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))
            .as("bh"))
      }: _*)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bh"))

    // Hot-bucket detection via a map-side-combined aggregate, NOT a
    // window: the partial aggregation compresses the shuffle to ~one row
    // per distinct bucket, and after the size filter only the hot buckets
    // survive — bounded by n·bands/maxBucketSize rows (a normal corpus
    // has zero), so it broadcasts. A window over (band, bh) would instead
    // shuffle AND sort the full banded set once per consuming branch.
    val hot = banded.groupBy(col("band"), col("bh"))
      .agg(count(lit(1)).as("bn"), min(col("id")).as("mid"))
      .filter(col("bn") > maxBucketSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // the guard shape is emitted unconditionally and stays LAZY: with no
    // hot buckets the anti-join broadcasts an empty set (pass-through)
    // and the star side is empty, so the only real cost in the common
    // case is the hot aggregate itself — persisted, because both the
    // anti-join and the star join consume it (without the persist an
    // adversarial corpus re-aggregates its full banded explode twice —
    // measured 3× end-to-end on the 10^6-doc spam profile)
    val smallB = banded.join(
      broadcast(hot.select(col("band"), col("bh"))),
      Seq("band", "bh"), "left_anti")
    // oversized buckets: O(B) star edges rooted at the bucket minimum
    val starPairs = banded
      .join(broadcast(hot), Seq("band", "bh"))
      .filter(col("id") =!= col("mid"))
      .select(col("mid").as("id_a"), col("id").as("id_b"))
    val cand = smallB.as("x").join(smallB.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .union(starPairs)
      .distinct()

    val proj = base.select(col("id"), col("hset"))
    cand
      .join(proj.as("sa"), col("id_a") === col("sa.id"))
      .join(proj.as("sb"), col("id_b") === col("sb.id"))
      .select(col("id_a"), col("id_b"),
        graft.functions.ArrayOps.jaccardSorted(
          col("sa.hset"), col("sb.hset")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact-duplicate (Jaccard 1.0) pairs in one shuffle: group on the
    * shingle-hash set itself — all pairs within groups of at most
    * `maxBucketSize` docs (row-local expansion, no self-join), star edges
    * rooted at the group minimum above it (the same template-spam cap as
    * the banded guard). Semantically identical to the banded path at
    * threshold 1.0 (identical sets collide in EVERY band and verify at
    * exactly 1.0) at a fraction of its cost; grouping on the full hset —
    * not a re-hash of it — adds zero collision exposure beyond the
    * 64-bit shingle kernel.
    */
  private def minhashExactDups(sets: DataFrame,
      maxBucketSize: Int): DataFrame = {
    // group sizes and minima come from a WINDOW over the shingle set, not
    // a collect_list aggregate: window partition buffers SPILL to disk
    // (ExternalAppendOnlyUnsafeRowArray), while a single aggregation
    // group's buffer must fit in memory — an uncapped collect_list would
    // reintroduce exactly the unbounded-family exposure the banded
    // guard's star edges exist to prevent (a 10^8-copy spam family is an
    // ~800 MB single buffer). After the window, every row knows its
    // group's size and minimum in O(1) payload.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("hset"))
    val marked = sets
      .withColumn("bn", count(lit(1)).over(w))
      .withColumn("mn", min(col("id")).over(w))
      .filter(col("bn") > 1)
      // normal corpora leave only the duplicated docs here (tiny); an
      // adversarial family is disk-backed — persisted so the two regime
      // branches below don't re-shuffle and re-window the corpus
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // oversized groups: each member row emits its own star edge — the
    // family never materializes in one buffer anywhere
    val star = marked.filter(col("bn") > maxBucketSize)
      .filter(col("id") =!= col("mn"))
      .select(col("mn").as("id_a"), col("id").as("id_b"))
    // bounded groups: collect_list is capped by construction (bn filter
    // precedes it), then two streamed explodes expand all pairs
    val allPairs = marked.filter(col("bn") <= maxBucketSize)
      .groupBy(col("hset"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
    allPairs.union(star)
      .select(col("id_a"), col("id_b"), lit(1.0).as("jaccard"))
  }

  /** Incremental ingestion dedup: near-duplicate pairs BETWEEN a small
    * new batch (`delta`) and the existing corpus — the 100 TB ingestion
    * shape. Re-running all-pairs LSH over corpus ∪ delta for every daily
    * crawl would re-shuffle petabytes that cannot have produced new pairs;
    * here the delta's banded signature keys are BROADCAST and the banded
    * corpus streams against them, so the corpus is scanned but NEVER
    * shuffled — the candidate set and both verification joins are
    * delta-sized. Returns (corpus_id, delta_id, jaccard) with
    * jaccard >= threshold. Corpus and delta are expected disjoint on
    * `idCol` (identical ids are dropped defensively); delta-internal
    * duplicates are [[minhashLsh]] over the delta alone.
    */
  def incrementalNearDups(corpus: DataFrame, delta: DataFrame,
      idCol: String, textCol: String, shingleN: Int = 3, k: Int = 32,
      bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    // threshold >= 1.0 asks for exact cross-set duplicates only: one
    // broadcast equality join on the shingle sets themselves — no
    // signatures, no banding, the corpus still never shuffled (the same
    // fast-path rationale as minhashLsh's, in the delta-vs-corpus shape)
    if (threshold >= 1.0) {
      def sets(df: DataFrame, side: String): DataFrame = df.select(
          col(idCol).as(s"${side}_id"),
          graft.functions.ArrayOps.ngramHashes(
            Text.tokens(col(textCol)), shingleN).as(s"${side}_hset"))
        .filter(size(col(s"${side}_hset")) > 0)
      return sets(corpus, "corpus")
        .join(broadcast(sets(delta, "delta")),
          col("corpus_hset") === col("delta_hset"))
        .filter(col("corpus_id") =!= col("delta_id"))
        .select(col("corpus_id"), col("delta_id"), lit(1.0).as("jaccard"))
    }
    // the corpus projection feeds its banding scan AND the verification
    // scan (same ~1-2%-of-corpus persist rationale as minhashLsh —
    // re-shingling the corpus twice costs more). The streaming shape
    // ([[graft.streaming.NearDupStream]]) persists this same projection
    // to parquet ONCE instead, and every micro-batch reads it.
    val c = nearDupState(corpus, idCol, textCol, shingleN, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    nearDupsAgainstState(c, delta, idCol, textCol, shingleN, k,
      bands, threshold)
  }

  /** The corpus-side projection [[nearDupsAgainstState]] matches
    * against: (corpus_id, corpus_hset, corpus_sig) — shingle-hash set
    * for exact verification plus the MinHash signature for banding.
    * This IS the "persisted corpus LSH state" of a streaming ingest
    * pipeline: compute it once per corpus vintage, write it to parquet,
    * and every arriving batch scans it (never shuffles it). Shingle-less
    * docs are dropped (they can never clear a Jaccard threshold — the
    * minhashLsh rule).
    */
  def nearDupState(corpus: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 32): DataFrame =
    corpus.select(
        col(idCol).as("corpus_id"),
        graft.functions.ArrayOps.ngramHashes(
          Text.tokens(col(textCol)), shingleN).as("corpus_hset"))
      .filter(size(col("corpus_hset")) > 0)
      .withColumn("corpus_sig",
        graft.functions.ArrayOps.minhash(col("corpus_hset"), k))

  /** Takedown from a persisted near-dup corpus state
    * ([[nearDupState]]'s parquet, the lake
    * [[graft.streaming.NearDupStream]] matches every micro-batch
    * against): deleted documents must stop producing near-dup pairs, or
    * the ingest pipeline keeps rejecting fresh crawls as "duplicates of"
    * content the corpus no longer holds. The state is rewritten minus
    * the ids (one anti-join pass over the signature lake — ~1-2% of
    * corpus bytes by construction, the cheap side of the takedown) and
    * swapped in with the rename-only discipline of
    * [[graft.sinks.Lake.swapDirs]]: the original state survives every
    * single-step failure. Untouched rows keep their exact signature
    * bytes, so post-delete matching EQUALS matching against a state
    * rebuilt from the surviving corpus (q171 pins it). Returns the
    * number of state rows removed.
    */
  def deleteFromNearDupState(spark: org.apache.spark.sql.SparkSession,
      stateDir: String, ids: DataFrame): Long = {
    import org.apache.hadoop.fs.Path
    val idc = ids.columns.head
    // the id set feeds the removed-count semi-join AND the rewrite
    // anti-join — persist once (delete-request-sized) instead of
    // re-executing the caller's plan per consumer
    val dels = ids.select(col(idc).as("corpus_id")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // a previous takedown killed between swapDirs' two renames parked
      // the state whole at the backup name — restore before reading
      graft.sinks.Lake.recoverSwap(
        new Path(stateDir).getFileSystem(
          spark.sparkContext.hadoopConfiguration),
        new Path(stateDir), new Path(stateDir + ".takedown_backup"))
      val state = spark.read.parquet(stateDir)
      // no broadcast hint: a takedown set is usually tiny (AQE will
      // broadcast it), but a court-ordered bulk removal need not be —
      // the join must survive either way
      val removed = state.join(dels, Seq("corpus_id"), "left_semi")
        .count()
      if (removed == 0L) return 0L
      val tmp = stateDir + ".takedown_tmp"
      state.join(dels, Seq("corpus_id"), "left_anti")
        .write.mode("overwrite").parquet(tmp)
      val live = new Path(stateDir)
      val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
      graft.sinks.Lake.swapDirs(fs, live, new Path(tmp),
        new Path(stateDir + ".takedown_backup"))
      removed
    } finally dels.unpersist(blocking = false): Unit
  }

  /** Near-duplicate pairs between a small delta and an ALREADY-PREPPED
    * corpus state ([[nearDupState]]'s schema) — the shared core of
    * [[incrementalNearDups]] and the micro-batch streaming shape: the
    * delta's banded signature keys are broadcast, the state streams
    * against them (scanned twice — banding + verification — never
    * shuffled), and the candidate set plus both verification joins are
    * delta-sized. `shingleN`/`k` must match the values the state was
    * built with (the signature is as good as its parameters); `k` must
    * be divisible by `bands`.
    */
  def nearDupsAgainstState(state: DataFrame, delta: DataFrame,
      idCol: String, textCol: String, shingleN: Int = 3, k: Int = 32,
      bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    val rowsPerBand = k / bands
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    def band(df: DataFrame, side: String): DataFrame = df.select(
        col(s"${side}_id"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            hash(slice(col(s"${side}_sig"), b * rowsPerBand + 1, rowsPerBand))
              .as("bh"))
        }: _*)).as("bb"))
      .select(col(s"${side}_id"), col("bb.band"), col("bb.bh"))

    // the delta projection feeds its band explode AND the verification
    // join — persisted (it is the SMALL side by contract)
    val d = delta.select(
        col(idCol).as("delta_id"),
        graft.functions.ArrayOps.ngramHashes(
          Text.tokens(col(textCol)), shingleN).as("delta_hset"))
      .filter(size(col("delta_hset")) > 0)
      .withColumn("delta_sig",
        graft.functions.ArrayOps.minhash(col("delta_hset"), k))
      .persist(lvl)

    val cand = band(state, "corpus")
      .join(broadcast(band(d, "delta")), Seq("band", "bh"))
      .filter(col("corpus_id") =!= col("delta_id"))
      .select(col("corpus_id"), col("delta_id"))
      .distinct()

    state.select(col("corpus_id"), col("corpus_hset"))
      .join(broadcast(cand), Seq("corpus_id"))
      .join(broadcast(d.select(col("delta_id"), col("delta_hset"))),
        Seq("delta_id"))
      .select(col("corpus_id"), col("delta_id"),
        graft.functions.ArrayOps.jaccardSorted(
          col("corpus_hset"), col("delta_hset")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact Jaccard over two (distinct-element) array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val union = size(array_union(a, b))
    when(union === 0, 0.0).otherwise(
      round(size(array_intersect(a, b)).cast("double") /
        union.cast("double"), 6))
  }

  /** SimHash near-duplicates: 4×16-bit-band blocking, Hamming-distance
    * verification. Returns (id_a, id_b, hamming) with hamming <= maxDist.
    *
    * Carries the same hot-bucket guard as [[minhashLsh]]: a 16-bit band
    * bucket holding more than `maxBucketSize` sketches (template spam —
    * near-identical docs share all four bands) emits star candidates
    * rooted at the bucket-min doc instead of O(B²) all-pairs; the min
    * doc's sketch rides along via min_by so Hamming verification stays
    * a pure column expression.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3, maxBucketSize: Int = 4096): DataFrame = {
    // 9 bytes/doc (id + one 64-bit sketch): persisted because the banded
    // set now feeds four plan branches (hot-bucket aggregate, both sides
    // of the self-join, star join) — without it each branch re-tokenizes
    // and re-sketches the corpus
    val sk = df.select(col(idCol).as("id"),
      SimHash.simhash(Text.tokens(col(textCol))).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sk.select(col("id"), col("sh"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"), SimHash.band16(col("sh"), b).as("bv"))
      ): _*)).as("bb"))
      .select(col("id"), col("sh"), col("bb.band"), col("bb.bv"))
    // hot buckets via map-side-combined aggregate (see minhashLsh); the
    // bucket-min doc's sketch rides along via min_by so the star pairs'
    // Hamming verification stays a pure column expression
    val hot = banded.groupBy(col("band"), col("bv"))
      .agg(count(lit(1)).as("bn"),
        min_by(struct(col("id"), col("sh")), col("id")).as("m"))
      .filter(col("bn") > maxBucketSize)
      .select(col("band"), col("bv"),
        col("m.id").as("mid"), col("m.sh").as("msh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // same lazy guard shape as minhashLsh: empty hot set → pass-through
    // anti-join + empty star side; the persist keeps an adversarial
    // corpus from re-aggregating for the two hot consumers
    val smallB = banded.join(
      broadcast(hot.select(col("band"), col("bv"))),
      Seq("band", "bv"), "left_anti")
    val starPairs = banded
      .join(broadcast(hot), Seq("band", "bv"))
      .filter(col("id") =!= col("mid"))
      .select(col("mid").as("id_a"), col("id").as("id_b"),
        SimHash.hamming(col("msh"), col("sh")).as("hamming"))
    smallB.as("x").join(smallB.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        SimHash.hamming(col("x.sh"), col("y.sh")).as("hamming"))
      .union(starPairs)
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Embedding-cosine near-duplicates: hyperplane-LSH blocking (corpus
    * bucketed once), pairwise cosine only within a bucket, keep pairs with
    * similarity >= threshold. Multi-probe is unnecessary for DEDUP (unlike
    * top-k search): true near-duplicates have cosine ≈ 1, so their sign
    * bits agree on almost every plane and same-bucket blocking retains
    * them with high probability.
    *
    * Same hot-bucket star guard as [[minhashLsh]]: embedding-level
    * template spam (one asset re-embedded millions of times) lands every
    * copy in ONE hyperplane bucket — buckets over `maxBucketSize` emit
    * star candidates rooted at the bucket-min vector instead of O(B²)
    * all-pairs.
    */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double = 0.9, nPlanes: Int = 8,
      maxBucketSize: Int = 4096): DataFrame = {
    import graft.functions.ArrayOps
    // persisted for the same reason as minhashLsh's base / simhashPairs'
    // sketches: the bucketed projection feeds the hot-bucket aggregate,
    // both sides of the self-join, and the star join — without it each
    // branch re-buckets the corpus
    val b = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", ArrayOps.hyperplaneBucketF(col("vec"), nPlanes))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hot = b.groupBy(col("bucket"))
      .agg(count(lit(1)).as("bn"),
        min_by(struct(col("id"), col("vec")), col("id")).as("m"))
      .filter(col("bn") > maxBucketSize)
      .select(col("bucket"), col("m.id").as("mid"), col("m.vec").as("mvec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // same lazy guard shape as minhashLsh: empty hot set → pass-through
    // anti-join + empty star side, nothing runs until the caller acts
    val small = b.join(broadcast(hot.select(col("bucket"))),
      Seq("bucket"), "left_anti")
    val starPairs = b.join(broadcast(hot), Seq("bucket"))
      .filter(col("id") =!= col("mid"))
      .select(col("mid").as("id_a"), col("id").as("id_b"),
        round(ArrayOps.cosineF(col("mvec"), col("vec")), 6).as("cosine"))
    small.as("x").join(small.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        round(ArrayOps.cosineF(col("x.vec"), col("y.vec")), 6).as("cosine"))
      .union(starPairs)
      .filter(col("cosine") >= threshold)
  }

  /** Collapse near-duplicate pairs into clusters (connected components)
    * and pick one survivor (min id) per cluster. Returns (id, survivor_id)
    * for every node that appears in the pair set (roots map to themselves).
    *
    * Fully distributed: alternating large-star / small-star min-label
    * propagation over the pair DataFrame (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14) — converges in
    * O(log n) rounds to a star forest rooted at each component's minimum
    * id. Nothing is ever collected to the driver, so a near-dup-heavy
    * 100 TB crawl (pair sets of O(corpus) edges) streams through shuffles
    * instead of OOM-ing the driver the way a collect()-based union-find
    * would. Each round is two groupBy-min + join stages keyed on node id;
    * `localCheckpoint` truncates the iterative lineage.
    */
  def clusters(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b"): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // canonical directed edges: larger id -> smaller id, deduped. The
    // iteration itself runs on an RDD (the GraphX-style idiom for
    // fixpoint graph loops): a single HashPartitioner is reused across
    // every round's reduceByKey/join so co-partitioned stages stay
    // narrow, each round is ONE action, and the previous round's cache
    // is explicitly dropped — a DataFrame loop reshuffles per round and
    // can neither pin the partitioning nor release checkpoint storage.
    val raw = pairs.select(
        greatest(col(idA).cast("long"), col(idB).cast("long")).as("u"),
        least(col(idA).cast("long"), col(idB).cast("long")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .as[(Long, Long)].rdd
    val part = new org.apache.spark.HashPartitioner(
      math.max(raw.getNumPartitions, 1))
    var edges = raw.persist(lvl)
    // multiset fingerprint (size, xor of mixed pair-hashes): one action
    // materializes the round AND decides convergence; xor is
    // order/partition-independent and the sets are distinct by
    // construction, so equal fingerprints mean equal edge sets (whp)
    def fingerprint(e: org.apache.spark.rdd.RDD[(Long, Long)]): (Long, Long) =
      e.map { case (u, v) =>
        (1L, graft.functions.ArrayOps.mixPub(u * 0x9E3779B97F4A7C15L + v))
      }.fold((0L, 0L))((a, b) => (a._1 + b._1, a._2 ^ b._2))
    var fp = fingerprint(edges)
    var round = 0
    while (fp._1 != 0L && round < 64) {
      // large-star: connect every strictly-larger neighbor of each node
      // to the minimum of its closed neighborhood
      val sym = edges.flatMap { case (u, v) => Iterator((u, v), (v, u)) }
      val closedMin = sym.reduceByKey(part, math.min(_: Long, _: Long))
        .mapPartitions(_.map { case (u, mn) => (u, math.min(u, mn)) },
          preservesPartitioning = true)
      val large = sym.join(closedMin, part)
        .flatMap { case (u, (v, m)) =>
          if (v > u && v != m) Iterator((v, m)) else Iterator.empty
        }
        .distinct(part.numPartitions)
      // small-star: all edges now point large -> small; re-hang each
      // node's smaller neighbors (and the node itself) off the
      // neighborhood min
      val hubMin = large.reduceByKey(part, math.min(_: Long, _: Long))
      val next = large.join(hubMin, part)
        .flatMap { case (u, (v, m)) =>
          val self = Iterator.single((u, m))
          if (v != m) Iterator((v, m)) ++ self else self
        }
        .filter { case (a, b) => a != b }
        .distinct(part.numPartitions)
        .persist(lvl)
      val fpNext = fingerprint(next) // materializes next
      edges.unpersist(blocking = false)
      val done = fpNext == fp
      edges = next
      fp = fpNext
      round += 1
      if (done) round = 64
    }
    // fixpoint is a star forest rooted at each component's min: emit every
    // member -> root, plus root -> itself
    edges.flatMap { case (u, v) => Iterator((u, v), (v, v)) }
      .distinct(part.numPartitions)
      .toDF("id", "survivor_id")
  }

  /** The end deliverable: the corpus with near-duplicates collapsed to one
    * survivor per cluster. The loser set's size is proportional to REAL
    * duplication — tiny on a clean corpus, O(corpus) on the heavy-dup
    * crawl dedup exists for — so the anti-join strategy is MEASURED,
    * never assumed: the loser ids (longs, 8 bytes each) are persisted
    * and counted, and only a set within `broadcastLoserLimit` is
    * broadcast (corpus filtered in place, never shuffled); above the
    * limit the anti-join shuffles on the id — linear, no single-node
    * materialization (HeavyDupSpec pins both strategies equal). The
    * count re-evaluates `pairClusters` once; [[clusters]] output comes
    * off a persisted fixpoint RDD, so that replay is a cheap projection.
    */
  def dedupedCorpus(df: DataFrame, idCol: String,
      pairClusters: DataFrame,
      broadcastLoserLimit: Long = 5000000L): DataFrame = {
    val losers = pairClusters
      .filter(col("id") =!= col("survivor_id")).select(col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val joined =
      if (losers.count() <= broadcastLoserLimit) broadcast(losers)
      else losers.hint("merge") // see winnowedRunPairs: stats can still
                                // say "broadcast" when the count said no
    df.join(joined, df(idCol) === losers("id"), "left_anti")
  }

  /** All-pairs n-gram Jaccard within a blocking key (e.g. same source) —
    * the exact, oracle-checkable member of the dedup family.
    *
    * Pair comparison runs on sorted 64-bit shingle hashes with a linear
    * merge ([[graft.functions.ArrayOps]]): shingle strings are hashed and
    * sorted once per document, the O(pairs) inner loop touches only packed
    * longs. Results equal exact string-set Jaccard up to 2^-64-probability
    * hash collisions.
    *
    * Hot-block guard: the within-block self-join is O(|block|²), which one
    * skewed block (a crawl where half the corpus shares a source) turns
    * into the whole job. Blocks with more than `maxBlockSize` documents
    * are therefore routed through banded MinHash-LSH candidate generation
    * (still block-scoped, still verified with the same exact Jaccard
    * kernel) instead of all-pairs — exact results for bounded blocks,
    * bounded cost with high-recall approximation for pathological ones.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      blockCol: String, n: Int = 3, minJaccard: Double = 0.05,
      maxBlockSize: Int = 10000): DataFrame = {
    val rawSets = df.select(col(blockCol).as("blk"), col(idCol).as("id"),
      graft.functions.ArrayOps.ngramHashes(Text.tokens(col(textCol)), n)
        .as("s"))
      .filter(size(col("s")) > 0)
    // block cardinalities are tiny relative to the corpus ((blk, count)
    // rows); the join below shuffles on blk — the same key the pair join
    // needs anyway
    val counts = rawSets.groupBy(col("blk"))
      .agg(count(lit(1)).as("blk_n"))
    val sets = rawSets.join(counts, "blk")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val small = sets.filter(col("blk_n") <= maxBlockSize)
    val exact = small.as("x").join(small.as("y"),
        col("x.blk") === col("y.blk") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        graft.functions.ArrayOps.jaccardSorted(col("x.s"), col("y.s"))
          .as("jaccard"))
      .filter(col("jaccard") >= minJaccard)

    // oversized blocks: LSH-banded candidates within (blk, band, bandHash)
    // buckets, then the identical exact-Jaccard verification
    val big = sets.filter(col("blk_n") > maxBlockSize)
    val k = 32
    val bands = 16 // 2-row bands: high recall down to modest thresholds
    val rowsPerBand = k / bands
    val sig = big.withColumn("sig",
      graft.functions.ArrayOps.minhash(col("s"), k))
    val banded = sig.select(col("blk"), col("id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          hash(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("bh"))
      }: _*)).as("bb"))
      .select(col("blk"), col("id"), col("bb.band"), col("bb.bh"))
    // the routed block is itself > maxBlockSize docs, so an all-identical
    // block puts its whole size in one (blk, band, bh) bucket — the same
    // O(B²) exposure minhashLsh guards; star edges cap it the same way
    val hotB = banded.groupBy(col("blk"), col("band"), col("bh"))
      .agg(count(lit(1)).as("bn"), min(col("id")).as("mid"))
      .filter(col("bn") > maxBlockSize)
    val coldBanded = banded.join(
      broadcast(hotB.select(col("blk"), col("band"), col("bh"))),
      Seq("blk", "band", "bh"), "left_anti")
    val allCand = coldBanded.as("x").join(coldBanded.as("y"),
        col("x.blk") === col("y.blk") && col("x.band") === col("y.band") &&
        col("x.bh") === col("y.bh") && col("x.id") < col("y.id"))
      .select(col("x.blk").as("blk"), col("x.id").as("id_a"),
        col("y.id").as("id_b"))
    val starCand = banded.join(broadcast(hotB), Seq("blk", "band", "bh"))
      .filter(col("id") =!= col("mid"))
      .select(col("blk"), col("mid").as("id_a"), col("id").as("id_b"))
    val cand = allCand.union(starCand).distinct()
    val bigSets = big.select(col("blk"), col("id"), col("s"))
    val approx = cand
      .join(bigSets.as("sa"),
        cand("blk") === col("sa.blk") && cand("id_a") === col("sa.id"))
      .join(bigSets.as("sb"),
        cand("blk") === col("sb.blk") && cand("id_b") === col("sb.id"))
      .select(col("id_a"), col("id_b"),
        graft.functions.ArrayOps.jaccardSorted(col("sa.s"), col("sb.s"))
          .as("jaccard"))
      .filter(col("jaccard") >= minJaccard)

    exact.union(approx)
  }

  /** Exact-substring span dedup: document pairs sharing at least
    * `minShared` distinct word-n-gram spans — near-verbatim partial
    * copies (quote farms, mirrored paragraphs) that whole-document
    * Jaccard can miss. Spans shared by more than `maxDf` documents are
    * dropped FIRST: boilerplate taglines carry no copy signal and would
    * fan the self-join out quadratically — the dedup-literature
    * "ubiquitous shingle" rule and the scale guard in one. The surviving
    * rare-span self-join is bounded by df² ≤ maxDf² per span. Gram
    * hashing reuses the FNV shingle kernel (equal to string n-grams up
    * to negligible collision probability — the q27/q43/q64 precedent).
    */
  def sharedSpanPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, maxDf: Int = 50, minShared: Int = 3): DataFrame = {
    val spans = df.select(
      col(idCol).as("id"),
      explode(graft.functions.ArrayOps.ngramHashes(
        Text.tokens(col(textCol)), n)).as("g"))
    val rare = spans.groupBy(col("g"))
      .agg(count(lit(1)).as("span_df"))
      .filter(col("span_df") <= maxDf)
    val keyed = spans.join(rare, "g")
    keyed.select(col("g"), col("id").as("id_a"))
      .join(keyed.select(col("g"), col("id").as("id_b")), "g")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared_spans"))
      .filter(col("n_shared_spans") >= minShared)
  }
}
