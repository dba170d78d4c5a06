package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Per-batch schema semantics (quirk Q6): each export file becomes one
  * micro-batch with its OWN column union — different files may produce
  * TSVs with different widths, exactly like the reference's per-page
  * flattening. (The batch EtlJob computes one global schema instead.)
  */
class ExportStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("one TSV per export file, per-batch column union, batch naming") {
    val in = Files.createTempDirectory("exports").toString
    val out = Files.createTempDirectory("tsvs").toString
    Files.writeString(Paths.get(s"$in/page1.jsonl"),
      """{"claimRequestId": 1, "alpha": "x"}
        |{"claimRequestId": 2, "alpha": "y", "beta": 5}
        |""".stripMargin)
    Files.writeString(Paths.get(s"$in/page2.jsonl"),
      """{"claimRequestId": 3, "gamma": [1.5, 2.5]}
        |""".stripMargin)

    val res = ExportStream.run(spark, in, out, filePrefix = "claims")
    assert(res.length == 2)
    assert(res.map(_.rows).sum == 3)
    // reference naming parity: {prefix}_{lastClaimId}_{utcTimestamp}.tsv
    val nameRe = """claims_(\d+)_\d{8}_\d{6}\.tsv""".r
    val tags = res.map { r =>
      val n = Paths.get(r.file).getFileName.toString
      nameRe.findFirstMatchIn(n)
        .getOrElse(fail(s"file name $n does not match reference shape"))
        .group(1).toLong
    }
    assert(tags.toSet == Set(2L, 3L), tags.toString) // per-page max claim id
    val headers = res.map { r =>
      scala.io.Source.fromFile(r.file).getLines().next().split("\t").toSet
    }
    // per-batch schemas differ: one page has Alpha/Beta, the other Gamma
    val all = headers.flatten.toSet
    assert(all == Set("ClaimRequestId", "Alpha", "Beta", "Gamma"))
    assert(headers.exists(h => h == Set("ClaimRequestId", "Alpha", "Beta")))
    assert(headers.exists(h => h == Set("ClaimRequestId", "Gamma")))
  }

  test("known-schema mode: same rows, no per-batch inference") {
    val in = Files.createTempDirectory("exports3").toString
    val out = Files.createTempDirectory("tsvs3").toString
    Files.writeString(Paths.get(s"$in/page1.jsonl"),
      """{"claimRequestId": 5, "alpha": "x"}
        |{"claimRequestId": 6, "alpha": "y"}
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("claimRequestId",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("alpha",
        org.apache.spark.sql.types.StringType)))
    val res = ExportStream.run(spark, in, out, filePrefix = "claims",
      docSchema = schema)
    assert(res.length == 1 && res.head.rows == 2)
    val header = scala.io.Source.fromFile(res.head.file)
      .getLines().next().split("\t").toSet
    assert(header == Set("ClaimRequestId", "Alpha"))
    assert(res.head.file.contains("claims_6_")) // claim-id tag still applies
  }

  test("checkpoint restart: already-committed pages are not reprocessed") {
    val in = Files.createTempDirectory("exports2").toString
    val out = Files.createTempDirectory("tsvs2").toString
    val ckpt = Files.createTempDirectory("ckpt2").toString
    Files.writeString(Paths.get(s"$in/page1.jsonl"),
      "{\"claimRequestId\": 1}\n")
    val first = ExportStream.run(spark, in, out, checkpointDir = ckpt)
    assert(first.map(_.rows).sum == 1)
    // new page arrives; restart with the SAME checkpoint
    Files.writeString(Paths.get(s"$in/page2.jsonl"),
      "{\"claimRequestId\": 2}\n{\"claimRequestId\": 3}\n")
    val second = ExportStream.run(spark, in, out, checkpointDir = ckpt)
    // only the new file is processed
    assert(second.map(_.rows).sum == 2, second.toString)
  }
}
