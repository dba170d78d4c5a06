package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-vector symmetric int8 quantization of an embedding column — the
  * standard 4× compression step before ANN indexing at corpus scale
  * (scan 100 TB of float32 vectors once, store int8 + one scale per
  * vector, rank candidates on the cheap integer kernel, re-rank the
  * short list on float). (Beyond-reference: the reference pipeline,
  * `ElasticSearch ETL.py`, has no vector surface at all.)
  *
  * Everything here is built from codegen'd higher-order functions
  * (`transform`/`zip_with`/`aggregate`/`filter`) — no UDFs, so the
  * quantize stays inside whole-stage codegen and the scan it rides on.
  *
  * Scheme: `scale = max(|x_i|)/127`, `q_i = clamp(round(x_i/scale),
  * -127, 127)` — symmetric around zero (no zero-point), so the int8
  * dot product needs only one multiply by `scale_a*scale_b` at the
  * end. All-zero vectors quantize to all-zero with scale 0 (guarded —
  * no division by zero).
  */
object Quantization {

  /** max(|x_i|)/127 as double — the per-vector quantization step. */
  def int8Scale(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double")))) / lit(127.0)

  /** Adds `scaleCol` (double) and `qCol` (array<tinyint>, values in
    * [-127, 127]) to `df`. Row-local, shuffle-free; the clamp covers
    * the round-up edge (`round(maxabs/scale)` can hit exactly ±127
    * but never past — the clamp is belt-and-braces for NaN-free data
    * and required for the scale-0 guard path).
    */
  def int8(df: DataFrame, vecCol: String, scaleCol: String = "q_scale",
      qCol: String = "q_vec"): DataFrame =
    df.withColumn(scaleCol, int8Scale(col(vecCol)))
      .withColumn(qCol, transform(col(vecCol), x =>
        when(col(scaleCol) === 0d, lit(0d))
          .otherwise(greatest(least(round(x.cast("double") / col(scaleCol)),
            lit(127d)), lit(-127d)))
          .cast("tinyint")))

  /** Reconstruction-quality audit per vector: rounded scale, exact
    * integer checksum of the quantized vector (`sum_q`, `n_zero` —
    * engine-portable integer invariants), and max/mean absolute
    * dequantization error rounded to 6 decimals. Zero-scale vectors
    * (all-zero embeddings) are excluded — they carry no signal and
    * their relative error is undefined.
    */
  def int8Stats(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val errs = zip_with(
      transform(col(vecCol), x => x.cast("double")),
      col("q_vec"),
      (x, qi) => abs(x - qi.cast("double") * col("q_scale")))
    int8(df, vecCol)
      .filter(col("q_scale") > 0d)
      .select(col(idCol),
        round(col("q_scale"), 6).as("scale6"),
        aggregate(col("q_vec"), lit(0L), (a, x) => a + x.cast("long"))
          .as("sum_q"),
        size(filter(col("q_vec"), _ === 0)).cast("long").as("n_zero"),
        round(array_max(errs), 6).as("max_err6"),
        round(aggregate(errs, lit(0d), _ + _) /
          size(col(vecCol)).cast("double"), 6).as("mean_err6"))
  }
}
