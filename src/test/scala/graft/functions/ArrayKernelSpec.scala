package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The static-invoke array kernels' edge semantics: the codegen'd
  * [[ArrayOps.l2sqL]] must agree with the `aggregate(zip_with(...))`
  * form it replaced — including its NULL results for malformed
  * (ragged / null-holding) vectors, which silently truncated to a
  * finite prefix distance before round 9.
  */
class ArrayKernelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("l2sqL: exact integer distance on well-formed vectors") {
    import spark.implicits._
    val df = Seq((Seq(1L, 2L, 3L), Seq(4L, 0L, 3L))).toDF("a", "b")
    val got = df.select(ArrayOps.l2sqL(col("a"), col("b"))).collect()
    assert(got.head.getLong(0) === 9L + 4L) // 3² + 2² + 0²
  }

  test("l2sqL: NULL (not a prefix distance) for ragged or null-holding vectors") {
    val df = spark.sql(
      """SELECT * FROM VALUES
           (array(1L, 2L), array(1L, 2L, 3L)),
           (array(1L, CAST(NULL AS BIGINT)), array(1L, 2L)),
           (array(1L, 2L), array(1L, NULL))
         AS t(a, b)""")
    val got = df.select(ArrayOps.l2sqL(col("a"), col("b")).as("d")).collect()
    assert(got.forall(_.isNullAt(0)),
      "malformed embeddings must yield NULL, matching aggregate(zip_with(...))")
    // and the filter shape used by semanticDedup drops them
    assert(df.filter(ArrayOps.l2sqL(col("a"), col("b")) <= 1000000L)
      .count() === 0L)
  }
}
