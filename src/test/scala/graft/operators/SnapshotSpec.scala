package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot diff: the four change classes, null-safe modification
  * detection (value↔NULL transitions are modifications, NULL↔NULL is
  * not), multi-column compare, and the rollup.
  */
class SnapshotSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("added / removed / modified / unchanged, null-safe") {
    val old = Seq(
      (1L, Some("a"), "en"),  // unchanged
      (2L, Some("b"), "en"),  // text modified
      (3L, Some("c"), "en"),  // removed
      (4L, None, "en"),       // NULL -> NULL: unchanged
      (5L, Some("e"), "en"))  // value -> NULL: modified
      .toDF("id", "text", "lang")
    val nw = Seq(
      (1L, Some("a"), "en"),
      (2L, Some("B"), "en"),
      (4L, None, "en"),
      (5L, None, "en"),
      (6L, Some("f"), "en"))  // added
      .toDF("id", "text", "lang")
    val got = Snapshot.diff(old, nw, "id", Seq("text", "lang"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(got === Array(
      1L -> "unchanged", 2L -> "modified", 3L -> "removed",
      4L -> "unchanged", 5L -> "modified", 6L -> "added"))
    val counts = Snapshot.diffCounts(old, nw, "id", Seq("text", "lang"))
      .as[(String, Long)].collect().toMap
    assert(counts === Map("unchanged" -> 2L, "modified" -> 2L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("NULL-id rows classify by side presence, not id nullness") {
    // null ids never join (=== is null-rejecting): an old-only NULL-id
    // row must read as removed (it was present and is gone), not as
    // added via its own NULL o_id; symmetric for the new side
    val old = Seq((Option(1L), "a"), (None, "ghost-old"))
      .toDF("id", "text")
    val nw = Seq((Option(1L), "a"), (None, "ghost-new"))
      .toDF("id", "text")
    val got = Snapshot.diff(old, nw, "id", Seq("text"))
      .select("change").as[String].collect().sorted
    assert(got === Array("added", "removed", "unchanged"))
  }

  test("columns outside compareCols never flag a modification") {
    val old = Seq((1L, "a", "meta1")).toDF("id", "text", "meta")
    val nw = Seq((1L, "a", "meta2")).toDF("id", "text", "meta")
    val got = Snapshot.diff(old, nw, "id", Seq("text"))
      .as[(Long, String)].collect()
    assert(got === Array(1L -> "unchanged"))
  }
}
