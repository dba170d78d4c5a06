package graft.sinks

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame

/** TSV sink (SURVEY.md §2.1 #12): tab-separated, header row, empty string
  * for empty cells — the reference's `df.to_csv(path, sep='\t', index=False)`
  * [`ElasticSearch ETL.py:253`].
  */
object Tsv {

  /** Distributed write: one part-file per partition (the scale path).
    * Options pin the reference's TSV conventions (pandas to_csv): standard
    * doubled-quote escaping (Spark defaults to backslash), and whitespace
    * preserved verbatim (Spark trims trailing whitespace by default).
    */
  def write(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite")
      .option("sep", "\t").option("header", "true")
      .option("emptyValue", "")
      .option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(dir)

  /** Single-file write with a reference-style batch file name
    * (`rta_claim_headers_{id}_{ts}.tsv` shape [`ETL.py:247-257`]) — only for
    * small batch parity; large outputs should use [[write]].
    */
  def writeSingleFile(df: DataFrame, outFile: String): Unit = {
    val tmp = outFile + ".spark-tmp"
    df.coalesce(1).write.mode("overwrite")
      .option("sep", "\t").option("header", "true")
      .option("emptyValue", "")
      .option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(tmp)
    val part = Files.list(Paths.get(tmp)).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .find(_.getFileName.toString.startsWith("part-"))
      .getOrElse(sys.error(s"no part file written under $tmp"))
    Files.move(part, Paths.get(outFile), StandardCopyOption.REPLACE_EXISTING)
    // clean up the temp dir (part crc files etc.)
    Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
  }
}
