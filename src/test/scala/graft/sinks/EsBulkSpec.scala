package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** _bulk sink: the exact two-line wire format, escaping of hostile
  * text, id stringification, and the write→read round trip.
  */
class EsBulkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def scratch(): java.nio.file.Path = {
    val p = Files.createTempDirectory("esbulk_spec_")
    p.toFile.deleteOnExit()
    p
  }

  test("wire format: alternating action/source lines, escaped text") {
    val dir = scratch().resolve("out").toString
    val docs = Seq((42L, "plain"), (7L, "quote \" and\nnewline"))
      .toDF("doc_id", "text").repartition(1)
    EsBulk.write(docs, dir, "docs", "doc_id")
    val lines = spark.read.textFile(dir).collect()
    assert(lines.length === 4, lines.mkString("|"))
    val byId = lines.grouped(2).map { case Array(action, source) =>
      assert(action.startsWith("""{"index":{"_index":"docs","_id":""""),
        action)
      val id = action.split("\"_id\":\"")(1).takeWhile(_ != '"')
      id -> source
    }.toMap
    assert(byId.keySet === Set("42", "7"))
    // the hostile doc stays ONE source line, JSON-escaped
    assert(byId("7").contains("\\n") && byId("7").contains("\\\""),
      byId("7"))
  }

  test("round trip preserves rows and types") {
    val dir = scratch().resolve("rt").toString
    val docs = Seq(
      (1L, "alpha beta", 10L), (2L, "gamma \"q\"", 9L),
      (3L, "multi\nline", 10L))
      .toDF("doc_id", "text", "n")
    EsBulk.write(docs, dir, "docs", "doc_id")
    val back = EsBulk.read(spark, dir)
      .select("doc_id", "text", "n").as[(Long, String, Long)]
      .collect().sortBy(_._1)
    assert(back === Array(
      (1L, "alpha beta", 10L), (2L, "gamma \"q\"", 9L),
      (3L, "multi\nline", 10L)))
  }

  test("hostile string ids stay one well-formed action line") {
    // an id with quotes, a backslash, and a newline must be writer-
    // escaped in the ACTION line too — string-concat assembly would
    // emit invalid JSON / split the line, and read() would then pass
    // the corrupt action row through as a phantom document
    val dir = scratch().resolve("hostile").toString
    val docs = Seq(("he said \"hi\"\\\nbye", 1L), ("plain", 2L))
      .toDF("key", "n")
    EsBulk.write(docs, dir, "docs", "key")
    val lines = spark.read.textFile(dir).collect()
    assert(lines.length === 4, lines.mkString("|"))
    // every line parses as standalone JSON (the framing survived)
    val parsed = spark.read.json(spark.createDataset(lines.toIndexedSeq))
    assert(!parsed.columns.contains("_corrupt_record"),
      parsed.columns.mkString(","))
    val back = EsBulk.read(spark, dir)
      .select("key", "n").as[(String, Long)].collect().sortBy(_._2)
    assert(back === Array(("he said \"hi\"\\\nbye", 1L), ("plain", 2L)))
  }

  test("a NULL id fails the write loudly instead of dropping _id") {
    // to_json's ignoreNullFields would silently omit _id from the
    // action line, turning an id-keyed idempotent export into ES
    // auto-generated ids that duplicate documents on replay
    val dir = scratch().resolve("nullid").toString
    val docs = Seq((Option(1L), "a"), (None, "b")).toDF("doc_id", "text")
    val e = intercept[Throwable] {
      EsBulk.write(docs, dir, "docs", "doc_id")
    }
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(chain.contains("null doc_id"), chain)
  }

  test("read refuses a directory with no action lines") {
    val dir = scratch().resolve("plain").toString
    Seq((1L, "x")).toDF("doc_id", "text").write.json(dir)
    val e = intercept[IllegalArgumentException](EsBulk.read(spark, dir))
    assert(e.getMessage.contains("_bulk"))
  }

  test("write rejects a document column named 'index' (reserved)") {
    // read() keys on a non-null `index` struct to find action lines; a
    // document column of that name would make every round-tripped row
    // look like an action line and silently drop all documents — the
    // write must refuse up front, not corrupt downstream
    val dir = scratch().resolve("reserved").toString
    val docs = Seq((1L, "a", 3L)).toDF("doc_id", "text", "index")
    val e = intercept[IllegalArgumentException] {
      EsBulk.write(docs, dir, "docs", "doc_id")
    }
    assert(e.getMessage.contains("reserved"), e.getMessage)
    assert(!Files.exists(java.nio.file.Paths.get(dir)),
      "guard must fire before any output lands")
    // case-insensitive, like Spark's default column resolution: an
    // 'Index' column would collide with the action struct at read time
    val mixed = Seq((1L, "a", 3L)).toDF("doc_id", "text", "Index")
    intercept[IllegalArgumentException] {
      EsBulk.write(mixed, dir, "docs", "doc_id")
    }
  }
}
