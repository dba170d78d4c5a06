package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Rare-sequence exposure screen: a unique run flags its document, a
  * republished document is safe (rarity, not duplication, is the
  * signal), short docs vanish, and the stats (n_grams, min_df, n_rare)
  * are exact against hand counts.
  */
class RareSequenceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("unique runs flag; duplicated content does not; counts exact") {
    val shared = (1 to 10).map(i => s"c$i").mkString(" ") // 10 tokens, 3 8-grams
    val docs = Seq(
      (1L, shared),                       // df 3 via docs 1,2,3
      (2L, shared),
      (3L, s"$shared"),
      // doc 4: 9 tokens -> 2 grams, both unique -> risky, min_df 1
      (4L, "s1 s2 s3 s4 s5 s6 s7 s8 s9"),
      // doc 5: 8 tokens of which the single gram is unique
      (5L, "p1 p2 p3 p4 p5 p6 p7 p8"),
      (6L, "too short to have grams")     // 5 tokens -> absent
    ).toDF("doc_id", "text")
    val got = Curation.rareSequenceScreen(docs, "doc_id", "text",
        n = 8, minDf = 2L)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(got === Map(
      1L -> ((3L, 3L, 0L, false)),
      2L -> ((3L, 3L, 0L, false)),
      3L -> ((3L, 3L, 0L, false)),
      4L -> ((2L, 1L, 2L, true)),
      5L -> ((1L, 1L, 1L, true))))
  }

  test("minDf tunes the bar: at minDf=4 even the 3-copy content is rare") {
    val shared = (1 to 10).map(i => s"c$i").mkString(" ")
    val docs = Seq((1L, shared), (2L, shared), (3L, shared))
      .toDF("doc_id", "text")
    val got = Curation.rareSequenceScreen(docs, "doc_id", "text",
        n = 8, minDf = 4L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(got === Map(1L -> true, 2L -> true, 3L -> true))
  }
}
