package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window document chunking: split each document into overlapping
  * fixed-size token windows — the shape retrieval indexes and
  * long-document training consume (a 100k-token document cannot enter a
  * 4k context; it enters as strided chunks). (Beyond-reference operator;
  * the reference exports whole documents only.)
  *
  * Scale: zero shuffles — tokenize, compute the chunk-start sequence, and
  * explode, all row-local (the cheapest 100 TB pass: read, fan out,
  * write). Chunk count uses pure integer arithmetic
  * (`(n − size + stride − 1) div stride + 1`, floored at 1) so both
  * engines derive identical chunk grids; a document shorter than `size`
  * yields exactly one chunk of itself.
  */
object Chunking {

  /** One row per (document, window): (idCol, chunk_id, n_chunk_tokens,
    * chunk). Windows start at 0, stride, 2·stride, …; the last window is
    * clipped to the document end (no padding — training loaders pad).
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(stride >= 1 && stride <= chunkSize,
      s"stride must be in [1, chunkSize], got $stride (chunkSize $chunkSize)")
    val toks = graft.functions.Text.tokens(col(textCol))
    df.select(col(idCol), toks.as("w"), size(toks).cast("long").as("n"))
      .withColumn("n_chunks",
        greatest(lit(1L),
          expr(s"(n - ${chunkSize}L + ${stride}L - 1) div ${stride}L") + 1L))
      .select(col(idCol), col("w"), col("n"),
        explode(sequence(lit(0L), col("n_chunks") - 1L)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        least(lit(chunkSize.toLong),
          col("n") - col("chunk_id") * stride).as("n_chunk_tokens"),
        array_join(
          slice(col("w"), (col("chunk_id") * stride + 1).cast("int"),
            lit(chunkSize)), " ").as("chunk"))
  }
}
