package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing: assign every document to a fixed-budget
  * training shard ("pack") — the export shape LLM pre-training consumes,
  * where a loader concatenates each pack's documents into one ~budget-token
  * sequence. (Beyond-reference training-data operator; the reference's only
  * export shape is the flat TSV, `ElasticSearch ETL.py:247-257`.)
  */
object Packing {

  /** Lay documents out in ascending `idCol` order within each `partCol`
    * stratum and assign pack k to the document whose PRECEDING cumulative
    * token count has consumed k full budgets (cumulative-quotient packing:
    * a document straddling a boundary belongs to the pack its first token
    * falls in). Pure integer window arithmetic over a total order —
    * deterministic and engine-portable, so an interrupted export re-run
    * reproduces identical shards.
    *
    * Scale: ONE shuffle (on partCol). At 100 TB pass a composite stratum
    * (e.g. lang + hash(id) % 1024) so no single window partition
    * serializes — packing is intra-stratum by construction, so sharding
    * strata changes pack boundaries, never validity.
    */
  def packByBudget(df: DataFrame, idCol: String, textCol: String,
      partCol: String, budget: Long = 2048L): DataFrame =
    packByCounts(
      df.select(col(idCol), col(partCol),
        size(graft.functions.Text.tokens(col(textCol)))
          .cast("long").as("n_tokens")),
      idCol, partCol, "n_tokens", budget)

  /** Packing over a PRECOMPUTED per-document token-count column — the
    * form a real pipeline runs once a learned tokenizer prices each
    * document ([[Bpe.tokenCounts]]): whitespace counts mis-size packs
    * by whatever the tokenizer's fertility is, so the budget must be
    * measured in the same tokens the trainer will consume. Same
    * cumulative-quotient integer window math, same single shuffle.
    */
  def packByCounts(df: DataFrame, idCol: String, partCol: String,
      nTokensCol: String, budget: Long = 2048L): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(col(partCol)).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), col(partCol), col(nTokensCol).as("n_tokens"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      // integer `div`, not double /: exact past 2^53 cumulative tokens
      .select(col(idCol), col(partCol), col("n_tokens"),
        expr(s"cum_before div ${budget}L").as("pack_id"))
  }

  /** The loader-facing boundary table: [[packByCounts]] plus each
    * document's token START OFFSET within its pack — what a training
    * loader needs to reset attention masks (and loss masks) at document
    * boundaries inside a concatenated pack. A document's offset is its
    * stratum-cumulative token count minus the pack's first document's —
    * one extra window over the (stratum, pack) key the packing already
    * shuffled by, so the layout costs no additional exchange. Straddling
    * documents (cumulative-quotient rule) simply carry an offset near
    * the budget; the loader wraps.
    */
  def packOffsets(df: DataFrame, idCol: String, partCol: String,
      nTokensCol: String, budget: Long = 2048L): DataFrame = {
    val packed = packByCounts(df, idCol, partCol, nTokensCol, budget)
    val wp = Window.partitionBy(col(partCol), col("pack_id"))
      .orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    packed
      .withColumn("start_offset",
        coalesce(sum(col("n_tokens")).over(wp), lit(0L)))
      .select(col(idCol), col(partCol), col("n_tokens"),
        col("pack_id"), col("start_offset"))
  }

  /** Length-bucketed batching — the INFERENCE-side layout twin of
    * packing: a batch of B documents pads every one to the batch max,
    * so random batching wastes ~(max−mean) tokens per document, and at
    * corpus scale padding is often a third of all compute. Grouping
    * near-equal lengths first makes the padding collapse.
    *
    * The distributed shape deliberately avoids the textbook global
    * sort: documents land in a length BUCKET (`len div bucketWidth` —
    * a projection), and batches form inside each bucket by the (len,
    * id) window order — ONE shuffle on the bucket key, every bucket's
    * window independent, and the assignment is deterministic and
    * engine-portable (no sampled range boundaries, which would make
    * batch membership vary run to run). Coarser `bucketWidth` trades
    * padding for fewer, fuller strata; ragged tail batches (< B docs)
    * exist per bucket, bounded by the bucket count.
    *
    * Output is the per-batch audit a serving planner consumes:
    * (bucket, batch, n_docs, max_len, sum_len, padding) with
    * padding = n_docs·max_len − sum_len — integer-exact, so the
    * padding-efficiency claim is measurable, not asserted
    * (`PackingSpec` measures it against hash-ordered batching).
    */
  def lengthBucketedBatches(df: DataFrame, idCol: String,
      lenCol: String, batchSize: Int, bucketWidth: Long = 64L)
      : DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col(lenCol).asc, col(idCol).asc)
    df.select(col(idCol), col(lenCol).cast("long").as(lenCol))
      .withColumn("bucket", expr(s"$lenCol div ${bucketWidth}L"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("batch", expr(s"(rn - 1) div ${batchSize}L"))
      .groupBy(col("bucket"), col("batch"))
      .agg(count(lit(1)).as("n_docs"),
        max(col(lenCol)).as("max_len"),
        sum(col(lenCol)).as("sum_len"))
      .withColumn("padding",
        col("n_docs") * col("max_len") - col("sum_len"))
  }
}
