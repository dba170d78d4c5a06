package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter grouping keys.
  *
  * AQE handles skewed *joins* at runtime (`spark.sql.adaptive.skewJoin`),
  * but a `groupBy` on a low-cardinality/heavy-hitter key still funnels each
  * hot key through one reducer. [[saltedAgg]] is the classic two-phase
  * rewrite: aggregate on (key, salt) first — spreading each hot key over
  * `salts` reducers — then combine the partials on key alone. Correct for
  * any algebraic aggregate expressed as (partial, combine) pairs.
  *
  * At 1000 executors this is the difference between one straggler task
  * processing a hot key's billions of rows and `salts` parallel tasks each
  * processing 1/salts of them; the second shuffle moves only
  * |keys| × salts pre-aggregated rows.
  */
object Skew {

  /** A salted two-phase count+sum aggregation.
    *
    * @param partials (outputName, partialExprOverRows, combineExprOverPartials)
    */
  def saltedAgg(df: DataFrame, key: Column, keyName: String,
      partials: Seq[(String, Column, String => Column)],
      salts: Int = 16): DataFrame = {
    val salted = df
      .withColumn("__salt", pmod(spark_partition_id()
        + monotonically_increasing_id(), lit(salts)))
      .groupBy(key.as(keyName), col("__salt"))
      .agg(partials.head._2.as(s"p_${partials.head._1}"),
        partials.tail.map(p => p._2.as(s"p_${p._1}")): _*)
    salted.groupBy(col(keyName))
      .agg(partials.head._3(s"p_${partials.head._1}").as(partials.head._1),
        partials.tail.map(p => p._3(s"p_${p._1}").as(p._1)): _*)
  }

  /** Salted count + decimal-exact sum per key (the common shape). */
  def saltedCountSum(df: DataFrame, key: Column, keyName: String,
      value: Column, salts: Int = 16): DataFrame =
    saltedAgg(df, key, keyName, Seq(
      ("n", count(lit(1)), (p: String) => sum(col(p))),
      ("total", sum(value), (p: String) => sum(col(p)))),
      salts)

  /** Salted INNER equi-join for hot join keys AQE can't save (e.g. the
    * skewed side is the output of an aggregation, or runtime skew stats
    * miss a mid-stage explosion): every `large` row takes one of `salts`
    * salt values, `small` is replicated `salts`× so each (key, salt)
    * slice holds a full copy — a hot key's rows land on `salts` reducers
    * instead of one. Result == the unsalted inner join (each row pair
    * meets in exactly one salt slice); the cost is `salts`× the small
    * side's shuffle volume, the win is no straggler task. Inner joins
    * only: outer semantics would need null-extension once per key, not
    * per slice.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val saltedLarge = large.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(salts)).cast("long"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    saltedLarge.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
