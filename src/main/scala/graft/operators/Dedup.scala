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
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 32, bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    val rowsPerBand = k / bands
    val base = df.select(
      col(idCol).as("id"),
      graft.functions.ArrayOps.ngramHashes(
        Text.tokens(col(textCol)), shingleN).as("hset"))
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

    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()

    val sets = base.select(col("id"), col("hset"))
    cand
      .join(sets.as("sa"), col("id_a") === col("sa.id"))
      .join(sets.as("sb"), col("id_b") === col("sb.id"))
      .select(col("id_a"), col("id_b"),
        graft.functions.ArrayOps.jaccardSorted(
          col("sa.hset"), col("sb.hset")).as("jaccard"))
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
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val sk = df.select(col(idCol).as("id"),
      SimHash.simhash(Text.tokens(col(textCol))).as("sh"))
    val banded = sk.select(col("id"), col("sh"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"), SimHash.band16(col("sh"), b).as("bv"))
      ): _*)).as("bb"))
      .select(col("id"), col("sh"), col("bb.band"), col("bb.bv"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        SimHash.hamming(col("x.sh"), col("y.sh")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Embedding-cosine near-duplicates: hyperplane-LSH blocking (corpus
    * bucketed once), pairwise cosine only within a bucket, keep pairs with
    * similarity >= threshold. Multi-probe is unnecessary for DEDUP (unlike
    * top-k search): true near-duplicates have cosine ≈ 1, so their sign
    * bits agree on almost every plane and same-bucket blocking retains
    * them with high probability.
    */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double = 0.9, nPlanes: Int = 8): DataFrame = {
    import graft.functions.ArrayOps
    val b = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", ArrayOps.hyperplaneBucketF(col("vec"), nPlanes))
    b.as("x").join(b.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        round(ArrayOps.cosineF(col("x.vec"), col("y.vec")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Collapse near-duplicate pairs into clusters (connected components)
    * and pick one survivor (min id) per cluster. The pair set is orders of
    * magnitude smaller than the corpus (it only contains near-duplicates),
    * so a driver-side union-find is the right tool at any corpus scale —
    * the corpus itself is never collected. Returns (id, survivor_id).
    */
  def clusters(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b"): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs.select(col(idA).cast("long"), col(idB).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) {
        val nxt = parent(c); parent(c) = r; c = nxt
      }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = edges.flatMap(e => Seq(e._1, e._2)).distinct
    members.map(m => (m, find(m))).toSeq.toDF("id", "survivor_id")
  }

  /** The end deliverable: the corpus with near-duplicates collapsed to one
    * survivor per cluster (broadcast anti-join against the small loser
    * set — the corpus is filtered in place, never shuffled).
    */
  def dedupedCorpus(df: DataFrame, idCol: String,
      pairClusters: DataFrame): DataFrame = {
    val losers = pairClusters
      .filter(col("id") =!= col("survivor_id")).select(col("id"))
    df.join(broadcast(losers), df(idCol) === losers("id"), "left_anti")
  }

  /** All-pairs n-gram Jaccard within a blocking key (e.g. same source) —
    * the exact, oracle-checkable member of the dedup family.
    *
    * Pair comparison runs on sorted 64-bit shingle hashes with a linear
    * merge ([[graft.functions.ArrayOps]]): shingle strings are hashed and
    * sorted once per document, the O(pairs) inner loop touches only packed
    * longs. Results equal exact string-set Jaccard up to 2^-64-probability
    * hash collisions.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      blockCol: String, n: Int = 3, minJaccard: Double = 0.05): DataFrame = {
    val sets = df.select(col(blockCol).as("blk"), col(idCol).as("id"),
      graft.functions.ArrayOps.ngramHashes(Text.tokens(col(textCol)), n)
        .as("s"))
      .filter(size(col("s")) > 0)
    sets.as("x").join(sets.as("y"),
        col("x.blk") === col("y.blk") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        graft.functions.ArrayOps.jaccardSorted(col("x.s"), col("y.s"))
          .as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }
}
